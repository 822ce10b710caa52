"""Registry contract smoke: every queries() entry runs at sf0.001 and
returns a stable non-empty schema; oracle keys line up with query keys;
column names are driver-compare-safe (no duplicate names after sort)."""

from __future__ import annotations

import pytest

from imperio_patitas_etl_spark.queries import all_oracles, all_queries

QS = all_queries()
OR = all_oracles()


def test_every_query_has_oracle_or_is_declared_rows_only():
    # every oracle key must reference a real query
    assert set(OR) <= set(QS)


@pytest.mark.parametrize("key", sorted(QS))
def test_query_runs_and_has_schema(spark, sf_dir, key):
    df = QS[key](spark, sf_dir)
    cols = df.columns
    assert len(cols) > 0
    assert len(set(cols)) == len(cols), f"duplicate column names in {key}: {cols}"
    # driver collects: must not raise
    df.limit(5).collect()


def test_sampled_window_prefix_invariants():
    """External tooling samples the FIRST 50 registry keys; the rotation
    discipline (queries/__init__.py) requires the explicit front list to
    be exactly that prefix, 50 unique keys, with oracles in the same
    order — a silent drift here would rotate a changed key OUT of the
    verification window."""
    from imperio_patitas_etl_spark.queries import CURRENT_FRONT

    assert len(CURRENT_FRONT) == 50
    assert len(set(CURRENT_FRONT)) == 50
    assert list(QS)[:50] == list(CURRENT_FRONT)
    assert list(OR) == list(QS)
