"""Upsert semantics (J6/J7/K2/K3): MERGE equivalence, idempotence,
column-subset updates (the documento MERGE updates only 4 of 8 columns,
etl_service.py:452-457 — SURVEY.md §7 hard-part 1)."""

from __future__ import annotations

from imperio_patitas_etl_spark.operators.upsert import delete_insert, upsert_latest_wins


def _tables(spark):
    target = spark.createDataFrame(
        [(1, "old", 10.0), (2, "keep", 20.0)], "k int, name string, amt double"
    )
    source = spark.createDataFrame(
        [(1, "new", 11.0), (3, "ins", 30.0)], "k int, name string, amt double"
    )
    return target, source


def _as_dict(df):
    return {r["k"]: (r["name"], r["amt"]) for r in df.collect()}


def test_upsert_latest_wins(spark):
    target, source = _tables(spark)
    out = _as_dict(upsert_latest_wins(target, source, "k"))
    assert out == {1: ("new", 11.0), 2: ("keep", 20.0), 3: ("ins", 30.0)}


def test_upsert_idempotent(spark):
    target, source = _tables(spark)
    once = upsert_latest_wins(target, source, "k")
    twice = upsert_latest_wins(once, source, "k")
    assert _as_dict(once) == _as_dict(twice)
    assert once.count() == twice.count() == 3


def test_delete_insert_equivalent(spark):
    target, source = _tables(spark)
    assert _as_dict(delete_insert(target, source, "k")) == _as_dict(
        upsert_latest_wins(target, source, "k")
    )


def test_column_subset_update(spark):
    # matched rows: only amt updated, name keeps target value;
    # inserted rows: all columns from source.
    target, source = _tables(spark)
    out = _as_dict(upsert_latest_wins(target, source, "k", update_cols=["amt"]))
    assert out == {1: ("old", 11.0), 2: ("keep", 20.0), 3: ("ins", 30.0)}


def test_column_subset_update_assigns_null(spark):
    # MERGE SET assigns even NULL source values on match.
    target = spark.createDataFrame([(1, "old", 10.0)], "k int, name string, amt double")
    source = spark.createDataFrame([(1, "new", None)], "k int, name string, amt double")
    out = _as_dict(upsert_latest_wins(target, source, "k", update_cols=["amt"]))
    assert out == {1: ("old", None)}
