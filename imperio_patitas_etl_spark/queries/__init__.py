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

# Round-10 window (exactly the 50 keys the driver samples). r10 is the
# certification-hygiene round (VERDICT r9 item 1). Rule (a) covers the
# co-purchase family extraction (VERDICT r9 item 5: the five graph keys'
# downstream logic moved into `_*_from_pairs` helpers shared with the new
# `materialize_edge_table` / `copurchase_family_from_edges` pipeline API —
# result-identical, asserted in tests/test_affinity_edge_table.py); the
# rest is rule (b) refresh per `tools/rotation.py --plan-next` after
# regenerating certification.py from CORRECTNESS_r09 — the 33 r6-latest
# keys plus the 12 oldest r7 rows.
_R10_FRONT = (
    # -- rule (a), changed in r10: co-purchase family extraction
    "item_cooccurrence",
    "pagerank_copurchase",
    "triangle_count",
    "node_jaccard_linkpred",
    "khop_reach",
    # -- rule (b) refresh: all remaining r6-latest rows (33)
    "fk_orphans_antijoin",
    "gopher_filter",
    "join_cost_left",
    "join_price_broadcast",
    "kmv_distinct_sketch",
    "multi_join_star",
    "multimodal_decode_stub",
    "multimodal_feature_extract",
    "percentile_agg",
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
    "unigram_logprob",
    "union_except",
    "upsert_latest_wins",
    "upsert_merge",
    "window_lag_rank",
    "window_range_rolling",
    "window_running_sum",
    # -- rule (b) fill: oldest r7 rows (12)
    "ab_test_summary",
    "bigram_logprob",
    "bom_rollup",
    "cdc_apply",
    "cusum_changepoint",
    "dow_seasonal_residual",
    "entity_resolution_blocked",
    "equi_depth_histogram",
    "feature_scale",
    "funnel_time_bounded",
    "group_corr",
    "group_linear_fit",
)

assert len(_R10_FRONT) == 50, len(_R10_FRONT)


def all_queries() -> dict[str, QueryFn]:
    merged: dict[str, QueryFn] = {}
    for mod in _MODULES:
        merged.update(mod.QUERIES)
    out = {k: merged[k] for k in _R10_FRONT}
    out.update({k: f for k, f in merged.items() if k not in out})
    return out


def all_oracles() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _MODULES:
        merged.update(mod.ORACLE)
    order = all_queries()
    return {k: merged[k] for k in order if k in merged}
