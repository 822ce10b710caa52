"""Star-contraction connected components: correctness vs union-find, and
the logarithmic-rounds property that motivates it — a 60-node path (the
min-label algorithm's worst case, beyond its 30-round cap) must converge
well inside the star algorithm's round budget.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from imperio_patitas_etl_spark.operators.graph import connected_components_star

_edge = st.tuples(
    st.integers(min_value=0, max_value=9), st.integers(min_value=0, max_value=9)
).filter(lambda e: e[0] != e[1])


def _union_find_labels(nodes, edges):
    parent = {i: i for i in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    comp_min = {}
    for i in nodes:
        r = find(i)
        comp_min[r] = min(comp_min.get(r, i), i)
    return {i: comp_min[find(i)] for i in nodes}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(edges=st.lists(_edge, max_size=14))
def test_star_cc_matches_union_find(spark, edges):
    nodes = list(range(10))
    docs = spark.createDataFrame([(i,) for i in nodes], "doc_id long")
    e = (
        spark.createDataFrame(edges, "doc_a long, doc_b long")
        if edges
        else spark.createDataFrame([], "doc_a long, doc_b long")
    )
    got = {
        r.doc_id: r.cluster_id for r in connected_components_star(docs, e).collect()
    }
    assert got == _union_find_labels(nodes, edges)


def test_star_cc_long_path_converges_logarithmically(spark):
    """A 60-node path has diameter 59 — past min-label propagation's
    30-round cap; star contraction collapses it in O(log n) rounds."""
    n = 60
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    out = connected_components_star(docs, edges)
    labels = {r.doc_id: r.cluster_id for r in out.collect()}
    assert labels == {i: 0 for i in range(n)}
