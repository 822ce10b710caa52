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

# Round-11 window (exactly the 50 keys the driver samples). r11 is a
# maintenance round (VERDICT r10). Rule (a) covers the ngram-dedup family
# extraction (VERDICT r10 item 4: the pair build and the keep-list mask
# moved into `_pairs_from_shingled` / `_keep_list_from_clusters` helpers
# shared with the new `materialize_shingle_table` /
# `ngram_family_from_shingles` pipeline API — result-identical, asserted
# in tests/test_shingle_table.py); the rest is rule (b) refresh per
# `tools/rotation.py --plan-next` after regenerating certification.py
# from CORRECTNESS_r10: the 31 r7-latest keys plus the 15 oldest r8 rows
# (4 displaced to r12 by the rule-(a) front-load). After this window
# lands, no key's latest driver row is older than r8.
_R11_FRONT = (
    # -- rule (a), changed in r11: ngram-dedup family extraction
    "ngram_jaccard_dedup",
    "dup_clusters",
    "dup_clusters_star",
    "corpus_keep_list",
    # -- rule (b) refresh: all remaining r7-latest rows (31)
    "group_quantiles_exact",
    "grouping_sets",
    "hll_distinct_sketch",
    "hll_merge_audit",
    "incremental_agg_merge",
    "interval_concurrency",
    "key_skew_audit",
    "lag_features",
    "multimodal_frame_sample",
    "multimodal_resize_stub",
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
    # -- rule (b) fill: oldest r8 rows (15)
    "ann_recall",
    "attribution_last_touch",
    "bloom_prefilter_join",
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
)

assert len(_R11_FRONT) == 50, len(_R11_FRONT)


def all_queries() -> dict[str, QueryFn]:
    merged: dict[str, QueryFn] = {}
    for mod in _MODULES:
        merged.update(mod.QUERIES)
    out = {k: merged[k] for k in _R11_FRONT}
    out.update({k: f for k, f in merged.items() if k not in out})
    return out


def all_oracles() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _MODULES:
        merged.update(mod.ORACLE)
    order = all_queries()
    return {k: merged[k] for k in order if k in merged}
