"""Unit tests for the affinity/reconciliation/retrieval tier
(queries/affinity.py, operators/graph.py:pagerank_fixed,
operators/reconcile.py). Toy-graph expectations are hand-computed with
the same integer recurrence; oracle parity at sf scale is tools/check.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from imperio_patitas_etl_spark.operators.graph import pagerank_fixed
from imperio_patitas_etl_spark.operators.reconcile import classify_snapshot_diff
from imperio_patitas_etl_spark.queries import affinity


# --------------------------------------------------------------------------
# co-purchase pairs
# --------------------------------------------------------------------------


def _baskets_df(spark, baskets):
    rows = [
        (ok, pk) for ok, parts in baskets.items() for pk in parts
    ]
    return spark.createDataFrame(rows, "l_orderkey long, l_partkey long")


def test_copurchase_pairs_support(spark):
    li = _baskets_df(
        spark, {1: [10, 20, 30], 2: [10, 20], 3: [10, 20], 4: [30]}
    )
    got = {
        (r.part_a, r.part_b): r.pair_cnt
        for r in affinity._copurchase_pairs(li).collect()
    }
    assert got == {(10, 20): 3, (10, 30): 1, (20, 30): 1}


def test_copurchase_pairs_dedups_repeated_lines(spark):
    # the same part on two lineitem rows of one order counts ONCE
    li = _baskets_df(spark, {1: [10, 10, 20], 2: [10, 20]})
    got = {
        (r.part_a, r.part_b): r.pair_cnt
        for r in affinity._copurchase_pairs(li).collect()
    }
    assert got == {(10, 20): 2}


def test_cooccurrence_plan_broadcasts_counts(spark, sf_dir):
    plan = (
        affinity.q_item_cooccurrence(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


# --------------------------------------------------------------------------
# pagerank_fixed
# --------------------------------------------------------------------------


def _pagerank_reference(edges, iterations, unit=1_000_000_000, damping=85):
    """Pure-python twin of the integer recurrence."""
    nbrs: dict[int, set[int]] = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    teleport = unit * (100 - damping) // 100
    rank = {v: unit for v in nbrs}
    for _ in range(iterations):
        inbound = {v: 0 for v in nbrs}
        for u, vs in nbrs.items():
            c = rank[u] // len(vs)
            for v in vs:
                inbound[v] += c
        rank = {v: teleport + (damping * s) // 100 for v, s in inbound.items()}
    return rank


def test_pagerank_matches_integer_reference_on_path(spark):
    edges = [(1, 2), (2, 3)]
    e = spark.createDataFrame(edges, "part_a long, part_b long")
    got = {r.part: r.rank_units for r in pagerank_fixed(e, 3).collect()}
    assert got == _pagerank_reference(edges, 3)


def test_pagerank_star_hub_dominates_and_mass_bounded(spark):
    edges = [(1, k) for k in range(2, 8)]  # star: hub 1, six leaves
    e = spark.createDataFrame(edges, "part_a long, part_b long")
    got = {r.part: r.rank_units for r in pagerank_fixed(e, 3).collect()}
    assert got == _pagerank_reference(edges, 3)
    hub = got[1]
    assert all(hub > v for k, v in got.items() if k != 1)
    # integer div only LOSES mass; teleport only ADDS 0.15·unit per node
    n, unit = len(got), 1_000_000_000
    assert sum(got.values()) <= n * unit
    assert all(v >= unit * 15 // 100 for v in got.values())


def test_pagerank_iteration_lineage_is_truncated(spark):
    # the edge derivation must not re-enter each iteration's plan: the
    # checkpointed edge list shows up as a scan, not the upstream joins
    e = spark.createDataFrame([(1, 2), (2, 3)], "part_a long, part_b long")
    plan = pagerank_fixed(e, 3)._jdf.queryExecution().toString()
    assert "ExistingRDD" in plan or "LocalTableScan" in plan


# --------------------------------------------------------------------------
# snapshot reconciliation
# --------------------------------------------------------------------------


def _state_df(spark, rows):
    df = spark.createDataFrame(rows, "l_orderkey long, n_lines long, qty long")
    return df.withColumn(
        "fp", F.md5(F.concat_ws("|", "n_lines", "qty"))
    )


def test_classify_snapshot_diff_statuses(spark):
    a = _state_df(spark, [(1, 2, 5), (2, 1, 1), (3, 4, 9)])
    b = _state_df(spark, [(1, 3, 7), (2, 1, 1), (4, 1, 2)])
    got = {r.l_orderkey: r for r in classify_snapshot_diff(a, b, "l_orderkey").collect()}
    assert set(got) == {1, 3, 4}  # 2 is unchanged and drops out
    assert got[1].status == "changed"
    assert (got[1].n_lines_old, got[1].n_lines_new) == (2, 3)
    assert got[3].status == "removed" and got[3].n_lines_new is None
    assert got[4].status == "added" and got[4].n_lines_old is None


def test_snapshot_diff_monotone_corpus_has_no_removed(spark, sf_dir):
    statuses = {
        r.status
        for r in affinity.q_snapshot_diff(spark, sf_dir)
        .select("status")
        .distinct()
        .collect()
    }
    assert statuses <= {"added", "changed"}


def test_order_state_fingerprint_reflects_state(spark, sf_dir):
    from imperio_patitas_etl_spark.sources.parquet import load_table

    li = load_table(spark, sf_dir, "lineitem")
    st = affinity._order_state(li, affinity.SNAP_D2)
    # fingerprint is a pure function of (n_lines, qty, price_cents):
    # equal tuples ⇒ equal fp, and fp count == distinct tuple count
    agg = st.agg(
        F.countDistinct("fp").alias("fps"),
        F.countDistinct("n_lines", "qty", "price_cents").alias("tuples"),
    ).collect()[0]
    assert agg.fps == agg.tuples


# --------------------------------------------------------------------------
# bm25
# --------------------------------------------------------------------------


def test_bm25_topk_invariants(spark, sf_dir):
    rows = affinity.q_bm25_topk(spark, sf_dir).collect()
    assert 0 < len(rows) <= affinity.BM25_TOPK
    scores = [r.score_unat for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(r.score_unat > 0 for r in rows)
    assert all(1 <= r.n_terms_hit <= len(affinity.BM25_TERMS) for r in rows)


def test_bm25_rewards_tf_on_controlled_corpus(spark, tmp_path):
    # two docs, same length; doc 0 has more 'vector' occurrences → must
    # outrank doc 1 for any positive idf
    docs = [
        (0, "vector vector vector pad pad pad", "en", "s", 1),
        (1, "vector pad pad pad pad pad", "en", "s", 1),
        (2, "pad pad pad pad pad pad", "en", "s", 1),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = affinity.q_bm25_topk(spark, str(tmp_path)).collect()
    assert [r.doc_id for r in rows] == [0, 1]  # doc 2 never matches
    assert rows[0].score_unat > rows[1].score_unat
