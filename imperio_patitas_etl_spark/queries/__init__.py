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

# Round-15 window (exactly the 50 keys the driver samples). r15 is a
# maintenance round (VERDICT r14). No rule-(a) keys: `tools/rotation.py`
# reports 0 changed keys since boundary 67fcb6daf. The window is pure
# rule-(b) refresh per --plan-next after folding CORRECTNESS_r14 into
# certification.py: the 25 remaining r11-latest rows plus the 25 oldest
# r12 rows. After this window lands, no key's latest driver row is
# older than r12.
_R15_FRONT = (
    # -- rule (b) refresh: all remaining r11-latest rows (25)
    "lag_features",
    "multimodal_frame_sample",
    "multimodal_resize_stub",
    "ngram_jaccard_dedup",
    "pmi_collocations",
    "pps_systematic_sample",
    "resample_ffill",
    "rolling_distinct_users",
    "rolling_median_daily",
    "scd2_history",
    "scd2_time_weighted",
    "session_path_trigrams",
    "snapshot_diff",
    "stream_interval_join",
    "stream_rolling_distinct",
    "table_checksum_blocks",
    "tfidf_weights",
    "tpch_q1",
    "tpch_q11",
    "tpch_q17",
    "tpch_q18",
    "tpch_q2",
    "tpch_q8",
    "trimmed_mean",
    "weighted_sample_aes",
    # -- rule (b) fill: oldest r12 rows (25)
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
    "event_funnel",
    "event_transition_matrix",
    "exists_any_agg",
    "groupby_avg",
)
assert len(_R15_FRONT) == 50, len(_R15_FRONT)

# Single importable alias for the current window (VERDICT r14 item 3):
# tests consume CURRENT_FRONT so a rotation renames exactly one
# identifier in exactly one file. The round-numbered literal above stays
# because the external driver's window-sampling contract is stated in
# terms of `_R{N}_FRONT`; tests/test_rotation.py pins the convention
# (the literal's round number must be certification-table max + 1).
CURRENT_FRONT = _R15_FRONT


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
