"""Measure the materialized-shingle-table path for the ngram-dedup
family (VERDICT r10 item 4), through the SHIPPED product API.

The four family keys (``ngram_jaccard_dedup``, ``dup_clusters``,
``dup_clusters_star``, ``corpus_keep_list``) each rebuild + checkpoint
the shingled relation per invocation — the intended *benchmark* shape.
The pipeline shape writes the relation once
(``text.materialize_shingle_table``) and derives the whole family from
the table (``text.ngram_family_from_shingles``), sharing one min-label
CC run between clusters and the keep list. Unlike
``shared_build_probe.py`` (which predates the co-purchase product API
and monkeypatches the builder), this probe runs the real shipped path.

Timing notes: ``ngram_family_from_shingles`` runs both
connected-components loops EAGERLY at dict-build time (registry
semantics), so the pipeline numbers report build+consume per key plus
the one-off materialize cost. Each result is executed to completion
through a noop write (the bench.py convention — count() can prune).

Usage: python tools/shingle_family_probe.py [sf_dir] [reps]
r11 measurement at sf0.1 (quiet box): registry 15.0 s family total vs
9.5 s pipeline total (materialize 1.1); keep list alone 4.9 -> 1.3 s
(recorded in BASELINE.md §r11).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

KEYS = [
    "ngram_jaccard_dedup",
    "dup_clusters",
    "dup_clusters_star",
    "corpus_keep_list",
]


def main(argv: list[str] | None = None) -> None:
    from _probe_cli import parse_probe_args

    sf_dir, reps = parse_probe_args(
        "shingle_family_probe.py",
        "Time the ngram-dedup family from-scratch vs over the "
        "materialized shingle product table (the shipped API).",
        argv,
    )

    from imperio_patitas_etl_spark.session import get_spark
    from imperio_patitas_etl_spark.queries import text

    spark = get_spark("shingle_family_probe")
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # one JIT warmup pass so both shapes measure warm
    for k in KEYS:
        noop(text.QUERIES[k](spark, sf_dir))

    scratch: dict[str, float] = {}
    for k in KEYS:
        best = float("inf")
        for _ in range(reps):
            t0 = time.monotonic()
            noop(text.QUERIES[k](spark, sf_dir))
            best = min(best, time.monotonic() - t0)
        scratch[k] = round(best, 3)

    # pipeline shape: materialize once, family from the table. The CC
    # loops run at dict-build time, so a rep times build + all consumes.
    table = os.path.join(tempfile.mkdtemp(prefix="shingle_probe_"), "sh")
    t0 = time.monotonic()
    text.materialize_shingle_table(spark, sf_dir, table)
    mat_s = round(time.monotonic() - t0, 3)

    best_family = float("inf")
    pipeline: dict[str, float] = {}
    for _ in range(reps):
        t0 = time.monotonic()
        fam = text.ngram_family_from_shingles(spark, sf_dir, table)
        per = {}
        for k in KEYS:
            t1 = time.monotonic()
            noop(fam[k])
            per[k] = round(time.monotonic() - t1, 3)
        total = time.monotonic() - t0
        # every consumer has run — reclaim the build's checkpoint blocks
        # so each rep starts from the same block-manager state (the
        # OwnedFamily contract; without this, reps accumulate dead
        # generations and later reps measure scheduling around them)
        fam.release()
        if total < best_family:
            best_family, pipeline = total, per

    out = {
        "sf_dir": sf_dir,
        "reps": reps,
        "materialize_s": mat_s,
        "scratch": scratch,
        "pipeline_consume": pipeline,
        "scratch_total": round(sum(scratch.values()), 3),
        "pipeline_family_s": round(best_family, 3),
        "pipeline_total_with_materialize": round(best_family + mat_s, 3),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
