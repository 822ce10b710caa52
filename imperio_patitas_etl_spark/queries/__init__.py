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

# Round-9 window (exactly the 50 keys the driver samples). r9 is the
# optimization round (VERDICT r8): rule (a) covers the ngram-family
# restructure (shared shingle checkpoint + PPJoin positional bound),
# then the whole r5-latest tier is refreshed, r6 rows as fill.
_R9_FRONT = (
    # -- rule (a), changed in r9: the ngram-Jaccard family restructure
    #    (_ngram_pair_build shared stage, shingle localCheckpoint with
    #    caller-owned release, positional prefix refinement)
    "corpus_keep_list",
    "dup_clusters",
    "dup_clusters_star",
    "ngram_jaccard_dedup",
    # -- rule (b) refresh (35): the entire r5-latest tier — ann family,
    #    entity filter/project + cleaning tier, text r5 keys, stream r5
    #    keys, tpch stale-r5 remainder (VERDICT r8 item 2)
    "ann_ivf",
    "ann_ivf_trained",
    "ann_lsh_bucketed",
    "ann_topk_bruteforce",
    "arith_derived",
    "casts",
    "coalesce_defaults",
    "dedup_exact",
    "dedup_simhash",
    "doc_fingerprint",
    "dq_flags",
    "embedding_cosine_dedup",
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
    # -- rule (b) fill (11): oldest r6 rows
    "asof_join",
    "cube_rollup",
    "date_window",
    "decontaminate_ngram",
    "dedup_first",
    "delete_insert_antijoin",
    "derived_cost_coalesce",
    "distinct_agg",
    "embedding_dup_clusters",
    "explode_details",
    "explode_variants",
)

assert len(_R9_FRONT) == 50, len(_R9_FRONT)


def all_queries() -> dict[str, QueryFn]:
    merged: dict[str, QueryFn] = {}
    for mod in _MODULES:
        merged.update(mod.QUERIES)
    out = {k: merged[k] for k in _R9_FRONT}
    out.update({k: f for k, f in merged.items() if k not in out})
    return out


def all_oracles() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _MODULES:
        merged.update(mod.ORACLE)
    order = all_queries()
    return {k: merged[k] for k in order if k in merged}
