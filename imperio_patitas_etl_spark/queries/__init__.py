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
# 24 keys changed implementation this round (the r18 OPTIMIZATION pass,
# fingerprint-detected by tools/rotation.py): the ngram-Jaccard cluster
# family now runs connected components over the REP graph only
# (`_clusters_via_rep_cc`); quality_gopher/gopher_filter moved to the
# exact Arrow repetition kernel; the prefix-scan consumers read the
# Python boundary once; and a dozen keys gained bounded localCheckpoints
# at multiply-referenced cut points (khop/triangle/node-jaccard/pagerank
# edges, the PCA Gram table, the recall brute-force table, the minhash
# fingerprint relation, basket/unigram/tf/relevance aggregates).
# upsert_merge carries the inherited partition-skip MERGE. All 24 lead
# the window; the rest is the rule-(b) stalest cohort carried over from
# the pre-optimization window draft.
_R18_FRONT = (
    # -- rule (a): implementation changed this round (24)
    "ann_recall",
    "bigram_logprob",
    "bm25_topk",
    "corpus_keep_list",
    "dedup_minhash_lsh",
    "dq_anomaly_mad",
    "dup_clusters",
    "dup_clusters_star",
    "equi_depth_histogram",
    "gopher_filter",
    "group_quantiles_exact",
    "item_cooccurrence",
    "khop_reach",
    "ndcg_eval",
    "ngram_jaccard_dedup",
    "node_jaccard_linkpred",
    "pagerank_copurchase",
    "pmi_collocations",
    "power_iteration_pc",
    "pps_systematic_sample",
    "quality_gopher",
    "tfidf_weights",
    "triangle_count",
    "upsert_merge",
    # -- rule (b) refresh: stalest driver rows (26)
    "hll_distinct_sketch",
    "hll_merge_audit",
    "incremental_agg_merge",
    "interval_concurrency",
    "key_skew_audit",
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
    "unigram_logprob",
    "union_except",
    "upsert_latest_wins",
    "window_lag_rank",
    "window_range_rolling",
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
