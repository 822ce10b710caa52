"""Rep-graph connected components vs the full pair-list cliques
(VERDICT r17 item 1, extended in r18): the cluster consumers
(``dup_clusters`` / ``dup_clusters_star`` / ``corpus_keep_list``) run CC
over the REPRESENTATIVE graph only (``_labels_from_rep_cc`` — near-dup
rep pairs as the loop's edge set, members labeled through their gid by
one join outside the loop), instead of feeding the loop
``_pairs_from_grouped``'s C(b,2) cliques (r16) or per-member star edges
(r17), which only the pair-LIST key (``ngram_jaccard_dedup``)
contractually needs. These tests pin the equivalence proof on the regime
that motivates it: a mass-duplication fixture with a ≥1,000-copy
duplicate class.

Also pins the two r17 ADVICE hardenings on the tagger path:
the member map stays one row per doc_id even for a (contract-violating)
duplicated input doc_id, and the shingle-set fingerprint encodes NULL
array elements with an explicit sentinel instead of silently dropping
the length prefix.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from imperio_patitas_etl_spark.queries import text
from imperio_patitas_etl_spark.queries.text import (
    _labels_from_rep_cc,
    _member_map,
    _narrow_of,
    _pairs_from_grouped,
    _pairs_from_shingled,
    _shingle_set_fp,
    _shingled,
    connected_components,
)

# mass-duplication corpus: one 1,200-copy boilerplate class, a 3-copy
# near-duplicate of it (Jaccard vs the boilerplate = 3/4 ≥ 0.5: shingle
# sets {a b c, b c d, c d e} vs + {d e f}), an unrelated singleton, an
# empty text, and a NULL-lang duplicate pair (excluded from the member
# map by the qualifying filter / from rep pairs by the lang equi-join).
BOILER = "a b c d e"
NEAR = "a b c d e f"
N_BOILER = 1_200


def _fixture(spark):
    rows = [(i, "en", BOILER) for i in range(N_BOILER)]
    rows += [(2_000 + i, "en", NEAR) for i in range(3)]
    rows += [(3_000, "en", "x y z w v u t"), (3_001, "en", "")]
    rows += [(4_000, None, "p q r s t"), (4_001, None, "p q r s t")]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def _grouped(spark, docs):
    """(groups, member_map) via the r19 grouped build over a synthetic
    corpus — the same checkpointed shapes ``_grouped_build`` produces."""
    s = docs.select(
        "doc_id", "lang", F.split("text", " ").alias("__t")
    ).select(
        "doc_id", "lang", F.expr(text._shingles_of("__t")).alias("shingles")
    ).localCheckpoint()
    member_map = _member_map(_narrow_of(s)).localCheckpoint()
    groups = s.join(
        member_map.filter(F.col("doc_id") == F.col("gid")).select("doc_id"),
        "doc_id",
    ).localCheckpoint()
    return groups, member_map


def test_rep_cc_gives_identical_components_on_mass_duplication(spark):
    docs = _fixture(spark)
    groups, member_map = _grouped(spark, docs)
    ids = docs.select("doc_id")

    clique = connected_components(
        ids, _pairs_from_grouped(groups, member_map).select("doc_a", "doc_b")
    )
    rep = _labels_from_rep_cc(
        ids,
        member_map.filter("qual").select("doc_id", "gid"),
        _pairs_from_shingled(groups)
        .select("doc_a", "doc_b")
        .localCheckpoint(),
        connected_components,
    )

    got = sorted(tuple(r) for r in rep.collect())
    want = sorted(tuple(r) for r in clique.collect())
    assert got == want
    # sanity on the fixture: boilerplate + near-dup collapse to ONE
    # cluster labeled by the minimum doc_id; NULL-lang docs and the
    # empty text stay singletons.
    labels = dict(got)
    assert labels[0] == 0 and labels[N_BOILER - 1] == 0 and labels[2_001] == 0
    assert labels[3_000] == 3_000 and labels[3_001] == 3_001
    assert labels[4_000] == 4_000 and labels[4_001] == 4_001


def test_rep_graph_loop_input_is_constant_in_class_size(spark):
    """The CC loop's edge input is ONE rep pair (boilerplate rep 0 —
    near-dup rep 2000) regardless of the b=1,200 class size, where the
    pair list carries its C(1200,2)=719,400 clique and the r17 star
    build carried b−1 member edges per class through every round. The
    member map is one skinny row per qualifying doc, touched once
    outside the loop. Exact counts pinned so a regression that
    reintroduces per-member rows into the CC path cannot pass
    silently."""
    docs = _fixture(spark)
    groups, member_map = _grouped(spark, docs)

    rep_pairs = _pairs_from_shingled(groups)
    members = member_map.filter("qual").select("doc_id", "gid")
    pair_edges = _pairs_from_grouped(groups, member_map)

    assert rep_pairs.count() == 1
    # 1200 boilerplate + 3 near-dup + 1 qualifying singleton
    assert members.count() == N_BOILER + 3 + 1
    # the WIDE checkpointed relation is one row per distinct (lang,
    # shingle-set) group — boilerplate, near-dup, singleton, empty,
    # NULL-lang — not one per member (r19: the r16-r18 tagged build
    # materialized every member's full shingle array)
    assert groups.count() == 5
    # clique: C(1200,2) + C(3,2) intra + 1200·3 cross expansion
    expected_clique = (
        N_BOILER * (N_BOILER - 1) // 2 + 3 + N_BOILER * 3
    )
    assert pair_edges.count() == expected_clique


def test_member_map_is_row_unique_on_duplicated_doc_id(spark):
    """ADVICE r17: the member map aggregates to EXACTLY one row per
    doc_id, so a duplicated doc_id in an externally materialized shingle
    table cannot multiply rows through the downstream pair-expansion
    joins (2 input rows → 4 output pairs)."""
    s = spark.createDataFrame(
        [
            (1, "en", ["a", "b"]),
            (1, "en", ["a", "b"]),  # contract-violating duplicate key
            (2, "en", ["a", "b"]),
        ],
        "doc_id long, lang string, shingles array<string>",
    )
    mm = _member_map(_narrow_of(s))
    assert mm.count() == 2  # one row per DISTINCT doc_id
    # both docs carry the single group gid and qualify
    rows = {r.doc_id: (r.gid, r.qual) for r in mm.collect()}
    assert rows == {1: (1, True), 2: (1, True)}
    # and the intra-group clique is emitted exactly once
    groups = s.join(
        mm.filter(F.col("doc_id") == F.col("gid")).select("doc_id"),
        "doc_id",
    ).dropDuplicates(["doc_id"])
    pairs = sorted(
        tuple(r) for r in _pairs_from_grouped(groups, mm).collect()
    )
    assert pairs == [(1, 2, 10000)]


def test_fp_encodes_null_elements_explicitly(spark):
    """ADVICE r17: a NULL array element encodes as the '~' sentinel, so
    injectivity holds without the no-NULL-element input contract; the
    sentinel is distinct from every real netstring (those start with a
    decimal digit), and non-NULL encodings are unchanged."""
    rows = [
        (1, [None]),
        (2, [""]),  # "0:"  — the nearest non-NULL neighbour
        (3, []),  # empty stream
        (4, ["a", None]),
        (5, ["a"]),
        (6, ["~"]),  # a literal tilde TOKEN: "1:~", not the sentinel
    ]
    df = spark.createDataFrame(rows, "doc_id long, shingles array<string>")
    fps = {
        r.doc_id: bytes(r.fp)
        for r in df.select(
            "doc_id", _shingle_set_fp("shingles").alias("fp")
        ).collect()
    }
    assert len(set(fps.values())) == len(fps), "fingerprints must be distinct"


def test_registry_cluster_keys_share_components_with_pair_list(spark, sf_dir):
    """End-to-end on real data: the registry cluster key (rep-graph CC)
    equals CC over the full pair list — the clique-vs-rep equivalence on
    the actual corpus, not just the synthetic fixture."""
    groups, _gids, member_map, _mids = text._grouped_build(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    want = sorted(
        tuple(r)
        for r in connected_components(
            docs,
            _pairs_from_grouped(groups, member_map).select("doc_a", "doc_b"),
        ).collect()
    )
    got = sorted(
        tuple(r) for r in text.q_dup_clusters(spark, sf_dir).collect()
    )
    assert got == want and len(got) > 0
