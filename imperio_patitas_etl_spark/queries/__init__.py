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

# Round-12 window (exactly the 50 keys the driver samples). r12 is a
# maintenance round (VERDICT r11). No rule-(a) keys: the round's code
# changes (the shared provenance helper `operators/provenance.py` and
# the NgramFamily release handle, VERDICT r11 item 4 / ADVICE r11) live
# entirely in the materialize/consume pipeline APIs, which sit OUTSIDE
# every registry key's fingerprint closure — `tools/rotation.py`
# reports 0 changed keys since boundary 5c1a83e. The window is pure
# rule-(b) refresh per --plan-next after folding CORRECTNESS_r11 into
# certification.py: the 29 remaining r8-latest rows plus the 21 oldest
# r9 rows. After this window lands, no key's latest driver row is
# older than r9.
_R12_FRONT = (
    # -- rule (b) refresh: all remaining r8-latest rows (29)
    "event_funnel",
    "event_transition_matrix",
    "exists_any_agg",
    "groupby_avg",
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
    # -- rule (b) fill: oldest r9 rows (21)
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
    "distinct_agg",
    "doc_fingerprint",
    "dq_flags",
    "embedding_cosine_dedup",
    "embedding_dup_clusters",
)

assert len(_R12_FRONT) == 50, len(_R12_FRONT)


def all_queries() -> dict[str, QueryFn]:
    merged: dict[str, QueryFn] = {}
    for mod in _MODULES:
        merged.update(mod.QUERIES)
    out = {k: merged[k] for k in _R12_FRONT}
    out.update({k: f for k, f in merged.items() if k not in out})
    return out


def all_oracles() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _MODULES:
        merged.update(mod.ORACLE)
    order = all_queries()
    return {k: merged[k] for k in order if k in merged}
