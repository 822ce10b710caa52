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

# Round-16 window (exactly the 50 keys the driver samples). r16 is a
# scale-evidence round (VERDICT r15). Rule (a): five keys changed
# implementation this round — the bloom bitmap probe and the
# shingle-set pre-collapse shared by the ngram-Jaccard family
# (`tools/rotation.py` fingerprint diff vs boundary 70fcaea81) —
# and lead the window. The rest is rule-(b) refresh per --plan-next
# after folding CORRECTNESS_r15 into certification.py: all 25
# remaining r12-latest rows (incl. the stalest cohort VERDICT r15
# item 7 names: scan_parquet, limit, sort_limit) plus the oldest
# r13 rows.
_R16_FRONT = (
    # -- rule (a): implementation changed this round (5)
    "bloom_prefilter_join",
    "corpus_keep_list",
    "dup_clusters",
    "dup_clusters_star",
    "ngram_jaccard_dedup",
    # -- rule (b) refresh: stalest driver rows (45)
    "histogram_fixed",
    "intra_doc_dedup",
    "join_strategy_advisor",
    "kmv_join_cardinality",
    "limit",
    "minhash_incremental",
    "ndcg_eval",
    "pack_sequences",
    "pareto_frontier_2d",
    "pii_redact",
    "pivot_wide",
    "power_iteration_pc",
    "retention_cohorts",
    "scan_parquet",
    "scd2_asof_lookup",
    "scd2_incremental",
    "sort_limit",
    "span_dedup",
    "sql_interface",
    "srm_check",
    "tpch_q3",
    "tpch_q4",
    "tpch_q5",
    "unpivot_long",
    "zorder_layout_audit",
    "ab_test_summary",
    "bigram_logprob",
    "bom_rollup",
    "cdc_apply",
    "cusum_changepoint",
    "dow_seasonal_residual",
    "entity_resolution_blocked",
    "equi_depth_histogram",
    "explode_details",
    "explode_variants",
    "feature_scale",
    "filter_project_client",
    "filter_project_detail",
    "filter_project_document",
    "filter_project_product",
    "fk_orphans_antijoin",
    "funnel_time_bounded",
    "gopher_filter",
    "group_corr",
    "group_linear_fit",
)
assert len(_R16_FRONT) == 50, len(_R16_FRONT)

# Single importable alias for the current window (VERDICT r14 item 3):
# tests consume CURRENT_FRONT so a rotation renames exactly one
# identifier in exactly one file. The round-numbered literal above stays
# because the external driver's window-sampling contract is stated in
# terms of `_R{N}_FRONT`; tests/test_rotation.py pins the convention
# (the literal's round number must be certification-table max + 1).
CURRENT_FRONT = _R16_FRONT


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
