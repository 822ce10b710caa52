"""Sparse-vector weighting on top of the TF triples.

``tfidf`` turns the (doc_id, term_id, tf) output of
`queries/text.py:q_tf_vectorize` into L2-normalized TF-IDF weights — the
vectorization a bag-of-words retrieval / clustering stage consumes.
Smooth IDF (sklearn convention): idf = ln((1+n)/(1+df)) + 1.

Scale shape: document frequency is one combinable groupBy over the
triples (output ≤ vocabulary rows, broadcast back); the L2 norm is a
per-doc window sum reusing the doc_id partitioning. Floats appear only
here — downstream consumers compare scores, not exact hashes — and every
operation is IEEE double (ln, sqrt, division), so results are still
deterministic and reproducible across runs and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def tfidf(tf: DataFrame, n_docs: int) -> DataFrame:
    """(doc_id, term_id, tf) → (doc_id, term_id, weight) with smooth-IDF
    weighting and per-document L2 normalization."""
    df_counts = tf.groupBy("term_id").agg(F.count("*").alias("df"))
    idf = F.log((1.0 + F.lit(float(n_docs))) / (1.0 + F.col("df"))) + 1.0
    raw = (
        tf.join(F.broadcast(df_counts), "term_id")
        .select("doc_id", "term_id", (F.col("tf") * idf).alias("w"))
    )
    norm = Window.partitionBy("doc_id")
    return raw.select(
        "doc_id",
        "term_id",
        (F.col("w") / F.sqrt(F.sum(F.col("w") * F.col("w")).over(norm))).alias(
            "weight"
        ),
    )
