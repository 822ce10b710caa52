"""The MinHash band-index storage layout, proven: materializing the
corpus (band_idx, band_sig) → doc_id index once and probing it with a
signed batch yields EXACTLY the candidates the inline incremental path
generates, with the index side of the probe join Exchange-free. The test
behind the incremental docstring's "materialized band index" claim.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from imperio_patitas_etl_spark.queries.text import (
    MINHASH_BATCH_MOD,
    MINHASH_BATCH_REMAINDER,
    _minhash_sigs,
    _sig_bands,
    materialize_band_index,
    probe_band_index,
)


def test_band_index_probe_matches_inline_and_never_shuffles(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    is_new = F.col("doc_id") % MINHASH_BATCH_MOD == MINHASH_BATCH_REMAINDER
    batch, corpus = d.filter(is_new), d.filter(~is_new)

    spark.sql("DROP TABLE IF EXISTS band_index")
    try:
        materialize_band_index(corpus, "band_index")

        got = probe_band_index(spark, batch, "band_index")
        plan = got._jdf.queryExecution().executedPlan().toString()
        # the index side must reach the join as a direct scan — only the
        # (tiny) batch side may move, via broadcast. The only permitted
        # hash Exchange is the candidate-pair dedup AFTER the join
        # (bounded by candidates, never corpus-sized): no Exchange may
        # carry band keys
        assert "BroadcastHashJoin" in plan
        for line in plan.splitlines():
            if "Exchange hashpartitioning" in line:
                tail = line.split("Exchange", 1)[1]
                assert "band_sig" not in tail and "band_idx" not in tail, line

        inline = (
            _sig_bands(_minhash_sigs(corpus))
            .alias("c")
            .join(
                _sig_bands(_minhash_sigs(batch)).alias("n"),
                (F.col("c.band_idx") == F.col("n.band_idx"))
                & (F.col("c.band_sig") == F.col("n.band_sig")),
            )
            .select(
                F.col("n.doc_id").alias("doc_new"),
                F.col("c.doc_id").alias("doc_corpus"),
            )
            .dropDuplicates(["doc_new", "doc_corpus"])
        )
        a = {tuple(r) for r in got.collect()}
        b = {tuple(r) for r in inline.collect()}
        assert a == b and len(a) > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS band_index")
