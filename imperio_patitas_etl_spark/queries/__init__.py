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

# Round-8 window (exactly the 50 keys the driver samples). r8 is the
# certification-consolidation round (VERDICT r7 items 1-2): the window is
# spent burning verification debt to zero, not on new keys.
_R8_FRONT = (
    # -- rule (a), changed in r8: broadcast pins on the seven single-row
    #    scalar crossJoins (VERDICT r7 item 7)
    "kmv_join_cardinality",
    "ann_recall",
    "cosine_dedup_recall",
    "power_iteration_pc",
    "ndcg_eval",
    "join_strategy_advisor",
    "srm_check",
    # -- rule (a), carried from r7: the five keys whose shingle-path
    #    helpers changed in r7 commit 01ffa76 AFTER their last driver
    #    rows (VERDICT r7 item 2) — driver rows on the current text
    "dedup_minhash_lsh",
    "ngram_jaccard_dedup",
    "dup_clusters",
    "dup_clusters_star",
    "minhash_incremental",
    # -- never driver-sampled (28): the r7 overflow — corpus-assembly
    #    tier, affinity remainder, analytics remainder, §2.7
    #    pivot/unpivot/histogram, sql_interface (VERDICT r7 item 1)
    "chunk_sequences",
    "pack_sequences",
    "span_dedup",
    "pii_redact",
    "domain_mixture",
    "domain_mixture_sample",
    "bpe_pair_merge",
    "intra_doc_dedup",
    "item_cooccurrence",
    "node_jaccard_linkpred",
    "pagerank_copurchase",
    "bm25_topk",
    "dq_anomaly_mad",
    "event_transition_matrix",
    "attribution_last_touch",
    "retention_cohorts",
    "bloom_prefilter_join",
    "cm_sketch_topk",
    "scd2_incremental",
    "scd2_asof_lookup",
    "event_funnel",
    "dq_profile",
    "pareto_frontier_2d",
    "zorder_layout_audit",
    "unpivot_long",
    "pivot_wide",
    "histogram_fixed",
    "sql_interface",
    # -- stale r3 rows (7): the trivial core keys deferred since r6/r7,
    #    promised to r8 (VERDICT r7 item 1)
    "scan_parquet",
    "limit",
    "sort_limit",
    "count_star",
    "count_by_flag",
    "groupby_avg",
    "exists_any_agg",
    # -- rule (b) refresh (3): oldest remaining rows (r5 tier)
    "tpch_q3",
    "tpch_q4",
    "tpch_q5",
)

assert len(_R8_FRONT) == 50, len(_R8_FRONT)


def all_queries() -> dict[str, QueryFn]:
    merged: dict[str, QueryFn] = {}
    for mod in _MODULES:
        merged.update(mod.QUERIES)
    out = {k: merged[k] for k in _R8_FRONT}
    out.update({k: f for k, f in merged.items() if k not in out})
    return out


def all_oracles() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _MODULES:
        merged.update(mod.ORACLE)
    order = all_queries()
    return {k: merged[k] for k in order if k in merged}
