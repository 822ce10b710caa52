"""The ngram-dedup materialized-shingle path (VERDICT r10 item 4):
``materialize_shingle_table`` + ``ngram_family_from_shingles`` must
return EXACTLY the four registry-key results — the pipeline shape
(shingle the corpus once, write it, read it as a table) mirrors the
co-purchase edge-table promotion (tests/test_affinity_edge_table.py),
and this test is what makes it safe: only the shingle-build subtree may
differ between the two paths.
"""

from __future__ import annotations

import pytest

from imperio_patitas_etl_spark.queries import text

FAMILY = {
    "ngram_jaccard_dedup",
    "dup_clusters",
    "dup_clusters_star",
    "corpus_keep_list",
}


def test_family_from_shingles_matches_registry(spark, sf_dir, tmp_path):
    shingle_path = str(tmp_path / "shingles")
    text.materialize_shingle_table(spark, sf_dir, shingle_path)

    fam = text.ngram_family_from_shingles(spark, sf_dir, shingle_path)
    assert set(fam) == FAMILY
    for key, df in fam.items():
        registry_df = text.QUERIES[key](spark, sf_dir)
        assert df.columns == registry_df.columns, key
        got = sorted(tuple(r) for r in df.collect())
        want = sorted(tuple(r) for r in registry_df.collect())
        assert got == want and len(got) > 0, key


def test_shingle_table_schema_is_the_shingled_relation(spark, sf_dir, tmp_path):
    """The layout carries per-doc distinct word-3-gram arrays with the
    language partition key — the write-once AllPairs index relation; every
    family member (and a future consumer with a different threshold)
    derives from this one table."""
    shingle_path = str(tmp_path / "shingles")
    text.materialize_shingle_table(spark, sf_dir, shingle_path)
    s = spark.read.parquet(shingle_path)
    assert set(s.columns) == {"doc_id", "lang", "shingles"}
    assert dict(s.dtypes)["shingles"] == "array<string>"
    # doc_id is the relation's key: one row per document
    from pyspark.sql import functions as F

    assert s.groupBy("doc_id").count().filter(F.col("count") > 1).count() == 0
    assert s.count() > 0


def test_family_from_shingles_rejects_mismatched_source(
    spark, sf_dir, tmp_path
):
    """The cluster/keep-list consumers mix the shingle relation with
    document, quality, and decontamination relations rebuilt from sf_dir;
    a shingle table materialized from a DIFFERENT source must be refused,
    not silently blended (same contract as the co-purchase edge table)."""
    shingle_path = str(tmp_path / "shingles")
    text.materialize_shingle_table(spark, sf_dir, shingle_path)

    # same source, trailing slash: normalized, accepted
    fam = text.ngram_family_from_shingles(spark, sf_dir + "/", shingle_path)
    assert set(fam) == FAMILY

    other = str(tmp_path / "definitely_not_the_source_sf_dir")
    with pytest.raises(ValueError, match="materialized from"):
        text.ngram_family_from_shingles(spark, other, shingle_path)


def test_family_from_shingles_rejects_untagged_table(spark, sf_dir, tmp_path):
    """A shingled relation written outside materialize_shingle_table
    carries no provenance tag — refuse it rather than guess."""
    shingle_path = str(tmp_path / "plain_shingles")
    text._shingled(spark, sf_dir).write.mode("overwrite").parquet(shingle_path)
    with pytest.raises(ValueError, match="materialized from"):
        text.ngram_family_from_shingles(spark, sf_dir, shingle_path)


def test_materialize_shingle_table_is_idempotent(spark, sf_dir, tmp_path):
    """Re-materializing over an existing path must CONVERGE (overwrite
    semantics) — the repo-wide idempotent-writer contract."""
    shingle_path = str(tmp_path / "shingles")
    text.materialize_shingle_table(spark, sf_dir, shingle_path)
    first = sorted(
        (r["doc_id"], tuple(r["shingles"]))
        for r in spark.read.parquet(shingle_path).collect()
    )
    text.materialize_shingle_table(spark, sf_dir, shingle_path)
    second = sorted(
        (r["doc_id"], tuple(r["shingles"]))
        for r in spark.read.parquet(shingle_path).collect()
    )
    assert first == second and len(first) > 0
