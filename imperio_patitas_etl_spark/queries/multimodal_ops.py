"""Oracle-checked probe of the multimodal (binary + Pandas UDF) path.

The media operators (operators/multimodal.py) run on synthetic binary
content; the driver's tables have no binary column, so the oracle-checked
probe materializes one — ``encode(text)`` on ``documents`` — and runs the
REAL plumbing: an Arrow-batched ``mapInPandas`` computing per-asset byte
stats in Python. DuckDB replicates the stats on the same UTF-8 bytes
(ASCII corpus, so ``ascii()`` equals the first byte).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from imperio_patitas_etl_spark.sources.parquet import load_table

_OUT = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("head_byte", T.IntegerType()),
    ]
)


def q_multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode plumbing over a real table: text → binary →
    mapInPandas byte stats (the same batch shape decode_media uses)."""
    # coalesce: the documents table is small relative to the executor
    # count — 4 Arrow batches beat 32 near-empty Python workers. At real
    # scale the equivalent sizing lever is arrow.maxRecordsPerBatch.
    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.encode(F.col("text"), "UTF-8").alias("content"))
        .coalesce(4)
    )

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raw = [bytes(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(b) for b in raw],
                    "head_byte": [b[0] if b else None for b in raw],
                }
            )

    return d.mapInPandas(_stats, _OUT)


ORACLE_MULTIMODAL = """
    SELECT doc_id,
           octet_length(encode(text))::BIGINT AS n_bytes,
           ascii(text) AS head_byte
    FROM documents
"""


def q_multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction plumbing over a real table: text → binary →
    mapInPandas byte-histogram features (operators/multimodal.py:
    extract_features). dim=4 buckets bytes at 0x40 boundaries; the corpus
    is ASCII, so bucket 0 = bytes < 0x40 and bucket 1 = bytes ≥ 0x40, which
    DuckDB replicates with regexp character-class counts. The division
    count/len is the same IEEE double op in both engines — no rounding
    needed."""
    from imperio_patitas_etl_spark.operators.multimodal import extract_features

    d = (
        load_table(spark, sf_dir, "documents")
        .select(
            F.col("doc_id").alias("asset_id"),
            F.encode(F.col("text"), "UTF-8").alias("content"),
        )
        .coalesce(4)
    )
    feats = extract_features(d, dim=4)
    return feats.select(
        F.col("asset_id").alias("doc_id"),
        F.element_at("features", 1).alias("f_low"),
        F.element_at("features", 2).alias("f_high"),
    )


ORACLE_FEATURES = r"""
    SELECT doc_id,
           (length(text) - length(regexp_replace(text, '[\x00-\x3F]', '', 'g')))::DOUBLE
               / length(text) AS f_low,
           length(regexp_replace(text, '[\x00-\x3F]', '', 'g'))::DOUBLE
               / length(text) AS f_high
    FROM documents
"""


QUERIES = {
    "multimodal_decode_stub": q_multimodal_decode_stub,
    "multimodal_feature_extract": q_multimodal_feature_extract,
}
ORACLE = {
    "multimodal_decode_stub": ORACLE_MULTIMODAL,
    "multimodal_feature_extract": ORACLE_FEATURES,
}
