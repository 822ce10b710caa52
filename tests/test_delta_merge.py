"""Delta ``MERGE INTO`` path (operators/upsert.py:merge_into_delta).

This container ships plain parquet only (no delta-spark), so the real
MERGE test self-skips; what must hold everywhere is the DECLINE contract:
merge_into_delta returns False — without throwing — for a missing library
and for a non-Delta target, so ``ParquetWarehouse.upsert`` always reaches
its latest-wins fallback.

The skip-marked test needs a Delta-enabled session (spark.sql.extensions +
catalog), which can't be retrofitted onto the shared session fixture; in a
delta environment run it in isolation: ``pytest tests/test_delta_merge.py``.
"""

from __future__ import annotations

import pytest

from imperio_patitas_etl_spark.operators.upsert import merge_into_delta

try:
    import delta  # type: ignore  # noqa: F401

    _HAS_DELTA = True
except Exception:
    _HAS_DELTA = False


def test_declines_on_plain_parquet_target(spark, tmp_path):
    """A parquet warehouse dir must never be handed to DeltaTable.forPath:
    with delta absent the import gate declines; with delta present the
    isDeltaTable gate declines. Either way: False, no exception."""
    p = str(tmp_path / "plain_parquet")
    spark.range(3).write.parquet(p)
    assert merge_into_delta(spark, p, spark.range(2), "id") is False


@pytest.mark.skipif(not _HAS_DELTA, reason="delta-spark not installed in this container")
def test_delta_merge_executes(tmp_path):
    """Real MERGE INTO: matched rows take the source's update_cols subset,
    unmatched rows insert. Runs only where delta-spark is installed."""
    from delta import configure_spark_with_delta_pip
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master("local[2]")
        .appName("delta-merge-test")
        .config("spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension")
        .config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
    )
    s = configure_spark_with_delta_pip(builder).getOrCreate()
    p = str(tmp_path / "delta_table")
    s.createDataFrame(
        [(1, "old", 10.0), (2, "keep", 20.0)], "id long, name string, v double"
    ).write.format("delta").save(p)
    src = s.createDataFrame(
        [(1, "renamed", 99.0), (3, "new", 30.0)], "id long, name string, v double"
    )
    assert merge_into_delta(s, p, src, "id", update_cols=["v"]) is True
    rows = {r["id"]: r for r in s.read.format("delta").load(p).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["v"] == 99.0
    assert rows[1]["name"] == "old"  # outside update_cols: target wins
    assert rows[3]["name"] == "new"
