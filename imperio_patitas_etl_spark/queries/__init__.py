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

# Round-14 window (exactly the 50 keys the driver samples). r14 is a
# maintenance round (VERDICT r13). No rule-(a) keys: `tools/rotation.py`
# reports 0 changed keys since boundary 91532de84. The window is pure
# rule-(b) refresh per --plan-next after folding CORRECTNESS_r13 into
# certification.py: the 25 remaining r10-latest rows plus the 25 oldest
# r11 rows. After this window lands, no key's latest driver row is
# older than r11.
_R14_FRONT = (
    # -- rule (b) refresh: all remaining r10-latest rows (25)
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
    # -- rule (b) fill: oldest r11 rows (25)
    "ann_recall",
    "attribution_last_touch",
    "bloom_prefilter_join",
    "bm25_topk",
    "bpe_pair_merge",
    "chunk_sequences",
    "cm_sketch_topk",
    "corpus_keep_list",
    "cosine_dedup_recall",
    "count_by_flag",
    "count_star",
    "dedup_minhash_lsh",
    "domain_mixture",
    "domain_mixture_sample",
    "dq_anomaly_mad",
    "dq_profile",
    "dup_clusters",
    "dup_clusters_star",
    "group_quantiles_exact",
    "grouping_sets",
    "hll_distinct_sketch",
    "hll_merge_audit",
    "incremental_agg_merge",
    "interval_concurrency",
    "key_skew_audit",
)
assert len(_R14_FRONT) == 50, len(_R14_FRONT)


def all_queries() -> dict[str, QueryFn]:
    merged: dict[str, QueryFn] = {}
    for mod in _MODULES:
        merged.update(mod.QUERIES)
    out = {k: merged[k] for k in _R14_FRONT}
    out.update({k: f for k, f in merged.items() if k not in out})
    return out


def all_oracles() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _MODULES:
        merged.update(mod.ORACLE)
    order = all_queries()
    return {k: merged[k] for k in order if k in merged}
