"""End-to-end training-corpus pipeline composition.

The LLM-data operators are registry queries individually; this test
composes them the way a real 100 TB corpus build would — quality gate →
duplicate-cluster canonicalization → stratified downsample → TF
vectorization — and pins the invariants of the composition (each stage
only ever removes documents; vectors exist exactly for the surviving
docs). Every stage is the same DataFrame-in/DataFrame-out plan the driver
checks in isolation, so this is plumbing proof, not re-verification.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from imperio_patitas_etl_spark.queries.text import (
    q_dup_clusters,
    q_quality_gopher,
    q_stratified_sample,
    q_tf_vectorize,
)


def test_corpus_pipeline_stages_compose(spark, sf_dir):
    total = spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    # 1. quality gate: drop the most repetitive tail
    quality = q_quality_gopher(spark, sf_dir)
    kept_q = quality.filter(F.col("dup_token_bp") <= 9000).select("doc_id")
    n_q = kept_q.count()
    assert 0 < n_q <= total

    # 2. dedup: keep only cluster canonicals (doc_id == cluster_id)
    clusters = q_dup_clusters(spark, sf_dir)
    canonicals = clusters.filter(F.col("doc_id") == F.col("cluster_id")).select("doc_id")
    survivors = kept_q.join(canonicals, "doc_id")
    n_s = survivors.count()
    assert 0 < n_s <= n_q

    # 3. stratified downsample intersected with survivors
    sample = q_stratified_sample(spark, sf_dir).select("doc_id")
    sampled = survivors.join(sample, "doc_id")
    n_smp = sampled.count()
    assert n_smp <= n_s

    # 4. vectorize: every emitted vector row belongs to a sampled doc,
    # and every sampled doc with at least one vocab token gets rows
    tf = q_tf_vectorize(spark, sf_dir).join(sampled, "doc_id")
    docs_with_vec = tf.select("doc_id").distinct().count()
    assert 0 < docs_with_vec <= n_smp
    # tf counts are positive and vocabulary ids are within range
    agg = tf.agg(
        F.min("tf").alias("min_tf"),
        F.min("term_id").alias("min_id"),
        F.max("term_id").alias("max_id"),
    ).first()
    assert agg.min_tf >= 1 and agg.min_id >= 0 and agg.max_id < 64
