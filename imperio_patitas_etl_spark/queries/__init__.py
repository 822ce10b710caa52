"""Driver-facing query registry.

Each query key from SURVEY.md §2 maps to a PySpark callable
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) an ANSI-SQL
oracle string DuckDB runs on the same parquet tables. Column names are
aliased identically on both sides — the driver sorts columns by name and
hash-compares values.

Rotation discipline (ADVICE r3; mechanized in r8 per VERDICT r7 item 8):
the external driver certifies the FIRST 50 keys of this registry per
round, so the order encodes the verification rotation:

  (a) every key whose implementation or oracle changed — or that is
      NEW — this round sits inside the sampled window;
  (b) the rest of the window refreshes the keys whose most recent
      driver row is oldest;
  (c) keys green in recent rounds with unchanged code rotate out.

The bookkeeping is GENERATED, not narrated: ``certification.py`` (written
by ``python tools/rotation.py``) records each key's last green driver
round,
and tests/test_rotation.py enforces rule (a) against git — a static
implementation fingerprint per key (transitive function/constant closure
+ oracle expression, docstrings stripped) is compared between the last
round-boundary commit and the worktree; changed keys must sit in the
window. Wave-by-wave displacement rationale lives in git history
(the r1-r7 narrative was removed from this file in r8).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from imperio_patitas_etl_spark.queries import (
    affinity,
    analytics,
    core,
    corpus,
    entity,
    multimodal_ops,
    streaming_ops,
    text,
    tpch,
    vector,
)

QueryFn = Callable[[SparkSession, str], DataFrame]


_MODULES = (
    affinity,
    streaming_ops,
    text,
    corpus,
    analytics,
    vector,
    tpch,
    entity,
    multimodal_ops,
    core,
)

# Round-18 window (exactly the 50 keys the driver samples). Rule (a):
# four keys changed implementation this round — the ngram-Jaccard
# family again (VERDICT r17 item 1, extended in r18: the cluster
# consumers now run connected components over the REP graph only via
# `_clusters_via_rep_cc`, not the pair list's C(b,2) cliques;
# plus the ADVICE r17 tagger hardenings — row-preserving gid join-back,
# NULL-element fp sentinel — which touch the shared closure of all
# four keys) — and lead the window. The rest is rule-(b) refresh per
# --plan-next after folding CORRECTNESS_r17 into certification.py: the
# stalest cohort is the r14-latest rows (hll_distinct_sketch …
# window_running_sum), then the oldest r15 rows.
_R18_FRONT = (
    # -- rule (a): implementation changed this round (4)
    "corpus_keep_list",
    "dup_clusters",
    "dup_clusters_star",
    "ngram_jaccard_dedup",
    # -- rule (b) refresh: stalest driver rows (46)
    "hll_distinct_sketch",
    "hll_merge_audit",
    "incremental_agg_merge",
    "interval_concurrency",
    "key_skew_audit",
    "quality_gopher",
    "quantile_sketch",
    "range_join",
    "salted_join_skew",
    "semi_anti_membership",
    "sessionize_events",
    "sessionize_sharded",
    "stream_tumbling_window",
    "topk_per_group",
    "tpch_q13",
    "tpch_q15",
    "tpch_q16",
    "tpch_q19",
    "tpch_q20",
    "tpch_q22",
    "tpch_q7",
    "tpch_q9",
    "triangle_count",
    "unigram_logprob",
    "union_except",
    "upsert_latest_wins",
    "upsert_merge",
    "window_lag_rank",
    "window_range_rolling",
    "window_running_sum",
    "ann_ivf",
    "ann_ivf_trained",
    "ann_lsh_bucketed",
    "ann_topk_bruteforce",
    "arith_derived",
    "asof_join",
    "casts",
    "coalesce_defaults",
    "cube_rollup",
    "date_window",
    "decontaminate_ngram",
    "dedup_exact",
    "dedup_first",
    "dedup_simhash",
    "delete_insert_antijoin",
    "derived_cost_coalesce",
)
assert len(_R18_FRONT) == 50, len(_R18_FRONT)

# Single importable alias for the current window (VERDICT r14 item 3):
# tests consume CURRENT_FRONT so a rotation renames exactly one
# identifier in exactly one file. The round-numbered literal above stays
# because the external driver's window-sampling contract is stated in
# terms of `_R{N}_FRONT`; tests/test_rotation.py pins the convention
# (the literal's round number must be certification-table max + 1).
CURRENT_FRONT = _R18_FRONT


def all_queries() -> dict[str, QueryFn]:
    merged: dict[str, QueryFn] = {}
    for mod in _MODULES:
        merged.update(mod.QUERIES)
    out = {k: merged[k] for k in CURRENT_FRONT}
    out.update({k: f for k, f in merged.items() if k not in out})
    return out


def all_oracles() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _MODULES:
        merged.update(mod.ORACLE)
    order = all_queries()
    return {k: merged[k] for k in order if k in merged}
