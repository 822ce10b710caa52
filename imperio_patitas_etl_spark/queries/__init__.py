"""Driver-facing query registry.

Each query key from SURVEY.md §2 maps to a PySpark callable
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) an ANSI-SQL
oracle string DuckDB runs on the same parquet tables. Column names are
aliased identically on both sides — the driver sorts columns by name and
hash-compares values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from imperio_patitas_etl_spark.queries import (
    core,
    entity,
    multimodal_ops,
    streaming_ops,
    text,
    tpch,
    vector,
)

QueryFn = Callable[[SparkSession, str], DataFrame]


_MODULES = (streaming_ops, text, vector, tpch, entity, multimodal_ops, core)

# Registry insertion order. External correctness tooling samples a PREFIX
# of this registry, so the order follows the rotation discipline
# (ADVICE.md r3, documented each round): (a) every key whose
# implementation or oracle changed — or that is NEW — this round sits
# inside the sampled window; (b) the rest of the window refreshes the
# keys whose most recent driver row is oldest; (c) keys verified green in
# the latest rounds with unchanged code rotate out. Round 6 window
# (first 50): the timestamp-NTZ-affected keys + the 20 r6-new keys
# (four waves: promoted library operators, corpus-filter stage,
# remaining TPC-H plan families, clustering/sketch) + the
# quality_gopher rewrite, then the r2-stale multimodal/tumbling keys and
# most of core (last driver rows r3 — core was not sampled in r5 at
# all); the seven most trivial core keys yield their slots to the new
# keys and rotate next round. Every key outside the window is r4/r5
# driver-green with code unchanged since, and the whole registry is
# locally green at sf0.01 AND sf0.1 (tools/check.py, BASELINE.md).
_R6_FRONT = (
    # changed or new this round
    "sessionize_sharded",
    "sessionize_events",
    "range_join",
    "asof_join",
    "tfidf_weights",
    "dup_clusters_star",
    "minhash_incremental",
    "quality_gopher",
    "cosine_dedup_recall",
    "tpch_q19",
    "tpch_q20",
    "window_range_rolling",
    # stale: last driver rows r2
    "multimodal_decode_stub",
    "multimodal_feature_extract",
    "stream_tumbling_window",
    # new this round (third wave: remaining TPC-H plan families)
    "tpch_q7",
    "tpch_q8",
    "tpch_q9",
    "tpch_q13",
    "tpch_q15",
    "tpch_q16",
    "tpch_q22",
    # new this round (fourth wave)
    "embedding_dup_clusters",
    "quantile_sketch",
    # stale: last driver rows r3 (core module; the seven most trivial
    # keys — scan_parquet/limit/sort_limit/count_star/count_by_flag/
    # groupby_avg/exists_any_agg — yield their slots to the new keys
    # above and rotate next round)
    "dedup_first",
    "topk_per_group",
    "cube_rollup",
    "explode_variants",
    "explode_details",
    "join_price_broadcast",
    "join_cost_left",
    "derived_cost_coalesce",
    "semi_anti_membership",
    "fk_orphans_antijoin",
    "multi_join_star",
    "upsert_latest_wins",
    "delete_insert_antijoin",
    "upsert_merge",
    "distinct_agg",
    "percentile_agg",
    "kmv_distinct_sketch",
    "salted_join_skew",
    "union_except",
    "window_running_sum",
    "window_lag_rank",
    "date_window",
    # new this round (second wave)
    "gopher_filter",
    "decontaminate_ngram",
    "unigram_logprob",
    "corpus_keep_list",
)


def all_queries() -> dict[str, QueryFn]:
    merged: dict[str, QueryFn] = {}
    for mod in _MODULES:
        merged.update(mod.QUERIES)
    out = {k: merged[k] for k in _R6_FRONT}
    out.update({k: f for k, f in merged.items() if k not in out})
    return out


def all_oracles() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _MODULES:
        merged.update(mod.ORACLE)
    order = all_queries()
    return {k: merged[k] for k in order if k in merged}
