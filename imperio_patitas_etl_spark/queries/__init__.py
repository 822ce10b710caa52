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

# Round-13 window (exactly the 50 keys the driver samples). r13 is a
# maintenance round (VERDICT r12). No rule-(a) keys: `tools/rotation.py`
# reports 0 changed keys since boundary 9c43085. The window is pure
# rule-(b) refresh per --plan-next after folding CORRECTNESS_r12 into
# certification.py: the 25 remaining r9-latest rows plus the 25 oldest
# r10 rows. After this window lands, no key's latest driver row is
# older than r10.
_R13_FRONT = (
    # -- rule (b) refresh: all remaining r9-latest rows (25)
    "explode_details",
    "explode_variants",
    "filter_project_client",
    "filter_project_detail",
    "filter_project_document",
    "filter_project_product",
    "json_extract",
    "lang_id",
    "quality_score",
    "regex_email",
    "regex_rut",
    "simhash_near_dup",
    "stratified_sample",
    "stream_dedup",
    "stream_session_window",
    "stream_sliding_window",
    "string_cleanup",
    "tf_vectorize",
    "timestamp_from_unix",
    "token_count",
    "tpch_q10",
    "tpch_q12",
    "tpch_q14",
    "tpch_q21",
    "tpch_q6",
    # -- rule (b) fill: oldest r10 rows (25)
    "ab_test_summary",
    "bigram_logprob",
    "bom_rollup",
    "cdc_apply",
    "cusum_changepoint",
    "dow_seasonal_residual",
    "entity_resolution_blocked",
    "equi_depth_histogram",
    "feature_scale",
    "fk_orphans_antijoin",
    "funnel_time_bounded",
    "gopher_filter",
    "group_corr",
    "group_linear_fit",
    "item_cooccurrence",
    "join_cost_left",
    "join_price_broadcast",
    "khop_reach",
    "kmv_distinct_sketch",
    "multi_join_star",
    "multimodal_decode_stub",
    "multimodal_feature_extract",
    "node_jaccard_linkpred",
    "pagerank_copurchase",
    "percentile_agg",
)

assert len(_R13_FRONT) == 50, len(_R13_FRONT)


def all_queries() -> dict[str, QueryFn]:
    merged: dict[str, QueryFn] = {}
    for mod in _MODULES:
        merged.update(mod.QUERIES)
    out = {k: merged[k] for k in _R13_FRONT}
    out.update({k: f for k, f in merged.items() if k not in out})
    return out


def all_oracles() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _MODULES:
        merged.update(mod.ORACLE)
    order = all_queries()
    return {k: merged[k] for k in order if k in merged}
