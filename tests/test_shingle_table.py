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


def test_set_fingerprint_separator_adversarial_grouping(spark):
    """The r17 collapse key (VERDICT r16 item 2): ``_member_map``
    groups on a 32-byte netstring-encoded sha2-256 of the sorted shingle
    array instead of the array itself. This pins grouping EQUIVALENCE
    with exact array equality on the token shapes that break every naive
    separator join — tokens containing the ':' delimiter, empty tokens,
    and tokens starting with digits (which attack the length prefix
    itself). Each adversarial pair below collides under at least one
    naive encoding; none may collide under the netstring fingerprint."""
    from pyspark.sql import functions as F

    rows = [
        # (doc_id, lang, shingles) — pairs crafted to collide naively:
        # colon-join collision: "a:b"+"c" vs "a"+"b:c" both join to "a:b:c"
        (1, "es", ["a:b", "c"]),
        (2, "es", ["a", "b:c"]),
        # empty-separator collision: "ab"+"" vs "a"+"b" both concat to "ab"
        (3, "es", ["ab", ""]),
        (4, "es", ["a", "b"]),
        # length-prefix attack: token starting with "digits:" — netstring
        # "3:1:a" vs "1:12::a" stay distinct
        (5, "es", ["1:a"]),
        (6, "es", [":a", "1"]),
        # true duplicates: same set, different element order and dup doc
        (7, "es", ["x y z", "y z w"]),
        (8, "es", ["y z w", "x y z"]),
        (9, "es", ["x y z", "y z w"]),
        # same set, different lang → different group
        (10, "en", ["x y z", "y z w"]),
        # empty sets collapse together (excluded from cliques downstream)
        (11, "es", []),
        (12, "es", []),
    ]
    s = spark.createDataFrame(
        rows, "doc_id long, lang string, shingles array<string>"
    )
    got = {
        r["doc_id"]: r["gid"]
        for r in text._member_map(text._narrow_of(s)).collect()
    }
    # exact-equality reference grouping, computed driver-side
    ref_gid: dict[tuple, int] = {}
    want = {}
    for doc_id, lang, sh in rows:
        key = (lang, tuple(sorted(sh)))
        ref_gid.setdefault(key, doc_id)
        want[doc_id] = ref_gid[key]
    assert got == want
    # and the fingerprint column itself is injective on these sets
    fps = [
        r[0]
        for r in s.select(text._shingle_set_fp("shingles")).collect()
    ]
    by_set: dict[tuple, bytes] = {}
    for (doc_id, lang, sh), fp in zip(rows, fps):
        key = tuple(sorted(sh))
        if key in by_set:
            assert by_set[key] == fp, (doc_id, key)
        else:
            assert fp not in by_set.values(), (doc_id, key)
            by_set[key] = fp
    assert len(fps[0]) == 32  # fixed 32-byte (sha2-256) group key
