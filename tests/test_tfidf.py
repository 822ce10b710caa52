"""TF-IDF weighting vs a pure-Python oracle (same IEEE double ops), plus
the unit-norm invariant."""

from __future__ import annotations

import math

from imperio_patitas_etl_spark.operators.vectorize import tfidf


def test_tfidf_matches_python_and_is_unit_norm(spark):
    triples = [
        (1, 0, 2), (1, 1, 1),
        (2, 0, 1), (2, 2, 3),
        (3, 2, 1),
    ]
    n_docs = 3
    tf = spark.createDataFrame(triples, "doc_id long, term_id long, tf long")
    got = {(r.doc_id, r.term_id): r.weight for r in tfidf(tf, n_docs).collect()}

    df = {}
    for _, t, _c in triples:
        df[t] = df.get(t, 0) + 1
    raw = {
        (d, t): c * (math.log((1.0 + n_docs) / (1.0 + df[t])) + 1.0)
        for d, t, c in triples
    }
    norms = {}
    for (d, _t), w in raw.items():
        norms[d] = norms.get(d, 0.0) + w * w
    expected = {k: w / math.sqrt(norms[k[0]]) for k, w in raw.items()}

    assert set(got) == set(expected)
    for k in expected:
        assert got[k] == expected[k], k  # bit-exact IEEE agreement

    # per-doc L2 norm is 1 (within fp accumulation noise)
    for d in (1, 2, 3):
        s = sum(w * w for (dd, _), w in got.items() if dd == d)
        assert abs(s - 1.0) < 1e-12
