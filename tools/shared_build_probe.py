"""Measure the shared-edge-build path for the co-purchase graph family
(VERDICT r8 item 6).

The five graph keys (``item_cooccurrence``, ``pagerank_copurchase``,
``triangle_count``, ``node_jaccard_linkpred``, ``khop_reach``) each
rebuild the support-counted basket-pair relation
(``queries/affinity._copurchase_pairs``) from lineitem on every
invocation — the intended *benchmark* shape, since every registry key is
a self-contained (spark, sf_dir) -> DataFrame query with its own DuckDB
oracle. In a real pipeline that edge set is materialized once and the
family reads it as a table. This probe records what that path costs:

1. warm per-key timings, from-scratch (the benchmark shape);
2. build + localCheckpoint the pair relation ONCE, monkeypatch the
   builder to return it, re-time each key (the pipeline shape).

Monkeypatching — instead of a bench-visible mode — is deliberate: the
probe must not change any query's rule-(a) fingerprint, and the
downstream plans are identical either way (the checkpoint just replaces
the scan+groupBy subtree).

Usage: python tools/shared_build_probe.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

KEYS = [
    "item_cooccurrence",
    "pagerank_copurchase",
    "triangle_count",
    "node_jaccard_linkpred",
    "khop_reach",
]


def main(argv: list[str] | None = None) -> None:
    from _probe_cli import parse_probe_args

    sf_dir, reps = parse_probe_args(
        "shared_build_probe.py",
        "Time the co-purchase graph family from-scratch vs over a "
        "shared checkpointed edge relation.",
        argv,
    )

    from imperio_patitas_etl_spark.session import get_spark
    from imperio_patitas_etl_spark.sources.parquet import load_table
    from imperio_patitas_etl_spark.queries import affinity

    spark = get_spark()
    qs = {k: affinity.QUERIES[k] for k in KEYS}

    def time_key(fn) -> float:
        best = float("inf")
        for _ in range(reps):
            t0 = time.monotonic()
            fn(spark, sf_dir).count()
            best = min(best, time.monotonic() - t0)
        return round(best, 3)

    # one JIT warmup pass so both shapes measure warm
    for k in KEYS:
        qs[k](spark, sf_dir).count()

    scratch = {k: time_key(qs[k]) for k in KEYS}

    li = load_table(spark, sf_dir, "lineitem")
    t0 = time.monotonic()
    pairs = affinity._copurchase_pairs(li).localCheckpoint()
    build_s = round(time.monotonic() - t0, 3)

    orig = affinity._copurchase_pairs
    affinity._copurchase_pairs = lambda _li: pairs
    try:
        shared = {k: time_key(qs[k]) for k in KEYS}
    finally:
        affinity._copurchase_pairs = orig
        pairs.unpersist()

    out = {
        "sf_dir": sf_dir,
        "reps": reps,
        "edge_build_s": build_s,
        "scratch": scratch,
        "shared": shared,
        "scratch_total": round(sum(scratch.values()), 3),
        "shared_total": round(sum(shared.values()), 3),
        "shared_total_with_build": round(sum(shared.values()) + build_s, 3),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
