"""Fixture tests for the blocked near-dedup operators.

These pin semantics the sf-scale oracle can't see on synthetic random data:
``embedding_cosine_dedup`` must find a KNOWN near-dup pair (its sf0.01
oracle result used to pass vacuously on 0 rows), and the lossless
length-bucket blocking in ``ngram_jaccard_dedup`` must still find pairs
whose shingle counts straddle a bucket boundary — including the exact
2×-size / j=0.5 edge the losslessness proof hinges on — while counting
same-bucket pairs exactly once.
"""

from __future__ import annotations

import pytest

from imperio_patitas_etl_spark.queries.text import q_ngram_jaccard_dedup
from imperio_patitas_etl_spark.queries.vector import (
    COS_DEDUP_T,
    q_embedding_cosine_dedup,
)


def test_ngram_blocking_lossless_and_exactly_once(spark, tmp_path):
    docs = [
        # 2 shingles (bucket 2) vs 4 shingles (bucket 3), A ⊂ B:
        # j = 2/4 = 0.5 exactly — the cross-bucket losslessness edge.
        (1, "en", "w1 w2 w3 w4"),
        (2, "en", "w1 w2 w3 w4 w5 w6"),
        # identical twins in the SAME bucket: both emit blocks {2, 3} —
        # the pair must come out once, not twice.
        (3, "en", "x1 x2 x3 x4"),
        (4, "en", "x1 x2 x3 x4"),
        # same bucket as doc 1, zero overlap: no row.
        (5, "en", "z1 z2 z3 z4 z5"),
    ]
    spark.createDataFrame(docs, "doc_id long, lang string, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = q_ngram_jaccard_dedup(spark, str(tmp_path))
    pairs = sorted((r.doc_a, r.doc_b, r.jaccard_bp) for r in out.collect())
    assert pairs == [(1, 2, 5000), (3, 4, 10000)]


def test_cosine_dedup_finds_near_dups_and_prefilters_by_bucket(spark, tmp_path):
    # 4-dim fixture; vec_id 1-4 are the fixed hyperplane normals
    # (PLANE_PRED), so buckets are just sign bits per axis.
    rows = [
        (1, "p", [1.0, 0.0, 0.0, 0.0]),
        (2, "p", [0.0, 1.0, 0.0, 0.0]),
        (3, "p", [0.0, 0.0, 1.0, 0.0]),
        (4, "p", [0.0, 0.0, 0.0, 1.0]),
        # exact near-dups (same direction, different scale): cosine = 1.0,
        # identical sign pattern → same bucket → MUST be found.
        (10, "a", [1.0, 1.0, 0.0, 0.0]),
        (11, "a", [2.0, 2.0, 0.0, 0.0]),
        # cosine vs 10/11 ≈ 0.707 ≥ threshold, but the second axis sign
        # flips the bucket → the LSH prefilter must exclude the pair.
        (12, "a", [1.0, -0.001, 0.0, 0.0]),
    ]
    spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<float>"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))
    out = q_embedding_cosine_dedup(spark, str(tmp_path))
    got = {(r.vec_a, r.vec_b): r.cosine for r in out.collect()}
    assert got[(10, 11)] == pytest.approx(1.0)
    assert (10, 12) not in got and (11, 12) not in got
    assert all(c >= COS_DEDUP_T for c in got.values())
