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

# Round-17 window (exactly the 50 keys the driver samples). r17 is the
# polish-and-re-certify round VERDICT r16 prescribed. Rule (a): four
# keys changed implementation this round — the ngram-Jaccard family,
# whose collapse window key became a fixed 16-byte injective netstring
# digest instead of the full sorted shingle array (VERDICT r16 item 2;
# `tools/rotation.py` fingerprint diff vs boundary f3dd4a146) — and
# lead the window. The rest is rule-(b) refresh per --plan-next after
# folding CORRECTNESS_r16 into certification.py: the remaining
# r13-latest rows (incl. the stalest cohort VERDICT r16 item 4 names:
# ab_test_summary…cusum_changepoint went green in r16; next-stalest is
# the item_cooccurrence…tpch_q6 cohort) plus the oldest r14 rows.
_R17_FRONT = (
    # -- rule (a): implementation changed this round (4)
    "corpus_keep_list",
    "dup_clusters",
    "dup_clusters_star",
    "ngram_jaccard_dedup",
    # -- rule (b) refresh: stalest driver rows (46)
    "item_cooccurrence",
    "join_cost_left",
    "join_price_broadcast",
    "json_extract",
    "khop_reach",
    "kmv_distinct_sketch",
    "lang_id",
    "multi_join_star",
    "multimodal_decode_stub",
    "multimodal_feature_extract",
    "node_jaccard_linkpred",
    "pagerank_copurchase",
    "percentile_agg",
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
    "ann_recall",
    "attribution_last_touch",
    "bm25_topk",
    "bpe_pair_merge",
    "chunk_sequences",
    "cm_sketch_topk",
    "cosine_dedup_recall",
    "count_by_flag",
    "count_star",
    "dedup_minhash_lsh",
    "domain_mixture",
    "domain_mixture_sample",
    "dq_anomaly_mad",
    "dq_profile",
    "group_quantiles_exact",
    "grouping_sets",
)
assert len(_R17_FRONT) == 50, len(_R17_FRONT)

# Single importable alias for the current window (VERDICT r14 item 3):
# tests consume CURRENT_FRONT so a rotation renames exactly one
# identifier in exactly one file. The round-numbered literal above stays
# because the external driver's window-sampling contract is stated in
# terms of `_R{N}_FRONT`; tests/test_rotation.py pins the convention
# (the literal's round number must be certification-table max + 1).
CURRENT_FRONT = _R17_FRONT


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
