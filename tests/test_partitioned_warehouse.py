"""Partitioned-warehouse tests: date-partition layout, partition-scoped
upsert (only touched date directories rewritten), pruned incremental
reads, and public-schema stability."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from imperio_patitas_etl_spark.sinks.warehouse import ParquetWarehouse


def _docs(spark, rows):
    return spark.createDataFrame(
        [
            (i, cust, None, folio, ts, 100.0, 19.0, total, ts)
            for (i, cust, folio, ts, total) in rows
        ],
        "id_documento long, id_cliente long, id_tipo_documento long, folio long, "
        "fecha_emision string, monto_neto double, monto_iva double, "
        "monto_total double, fecha_creacion string",
    ).withColumn("fecha_emision", F.to_timestamp("fecha_emision")).withColumn(
        "fecha_creacion", F.to_timestamp("fecha_creacion")
    )


@pytest.fixture()
def wh(spark, tmp_path):
    return ParquetWarehouse(spark, str(tmp_path / "wh"), partitioned=True)


D1, D2, D3 = "2024-01-01 10:00:00", "2024-01-02 10:00:00", "2024-01-03 10:00:00"


def test_partition_layout_and_public_schema(wh, spark):
    wh.overwrite("documento_venta", _docs(spark, [(1, 10, 7, D1, 119.0), (2, 11, 8, D2, 119.0)]))
    dirs = sorted(
        d for d in os.listdir(wh.path("documento_venta")) if d.startswith("fecha_dia=")
    )
    assert dirs == ["fecha_dia=2024-01-01", "fecha_dia=2024-01-02"]
    # public read hides the partition column
    assert "fecha_dia" not in wh.read("documento_venta").columns
    assert wh.read("documento_venta").count() == 2


def test_partition_scoped_upsert(wh, spark):
    wh.overwrite(
        "documento_venta",
        _docs(spark, [(1, 10, 7, D1, 119.0), (2, 11, 8, D2, 119.0), (3, 12, 9, D3, 119.0)]),
    )
    p = wh.path("documento_venta")
    untouched = os.path.join(p, "fecha_dia=2024-01-01")
    before = sorted(os.listdir(untouched))
    # upsert touching only day 2 (update doc 2) and day 3 (new doc 4)
    wh.upsert(
        "documento_venta",
        _docs(spark, [(2, 99, 8, D2, 238.0), (4, 13, 10, D3, 119.0)]),
    )
    after = sorted(os.listdir(untouched))
    assert before == after  # day-1 partition files untouched
    rows = {r["id_documento"]: r for r in wh.read("documento_venta").collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[2]["id_cliente"] == 99          # updated (in UPDATE_COLS)
    assert rows[2]["monto_total"] == 238.0      # updated
    assert rows[2]["folio"] == 8                # column-subset: target wins
    assert rows[1]["id_cliente"] == 10


def test_partition_scoped_upsert_idempotent(wh, spark):
    wh.overwrite("documento_venta", _docs(spark, [(1, 10, 7, D1, 119.0)]))
    src = _docs(spark, [(1, 20, 7, D1, 200.0), (2, 30, 8, D2, 119.0)])
    wh.upsert("documento_venta", src)
    snap1 = sorted(map(tuple, wh.read("documento_venta").collect()))
    wh.upsert("documento_venta", src)
    snap2 = sorted(map(tuple, wh.read("documento_venta").collect()))
    assert snap1 == snap2


def test_read_window_prunes_partitions(wh, spark):
    wh.overwrite(
        "documento_venta",
        _docs(spark, [(1, 10, 7, D1, 119.0), (2, 11, 8, D2, 119.0), (3, 12, 9, D3, 119.0)]),
    )
    win = wh.read_window("documento_venta", "2024-01-02")
    assert {r["id_documento"] for r in win.collect()} == {2, 3}
    # the physical plan must prune at the partition level, not post-filter:
    # the predicate shows up as a PartitionFilter on the scan (file-listing
    # level), not a data Filter above it
    plan = win._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "fecha_dia" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]


def test_detalle_partitioned_roundtrip(wh, spark):
    det = spark.createDataFrame(
        [(1, 10, 101, 2.0, 50.0, 0.0, 100.0, D1), (2, 10, 102, 1.0, 10.0, 0.0, 10.0, D2)],
        "id_detalle long, id_documento long, id_producto long, cantidad double, "
        "precio_neto_unitario double, descuento_porcentual double, "
        "monto_total_linea double, fecha_creacion string",
    ).withColumn("fecha_creacion", F.to_timestamp("fecha_creacion"))
    wh.upsert("detalle_documento", det)
    assert wh.read("detalle_documento").count() == 2
    assert sorted(
        d for d in os.listdir(wh.path("detalle_documento")) if d.startswith("fecha_dia=")
    ) == ["fecha_dia=2024-01-01", "fecha_dia=2024-01-02"]


def test_null_partition_rows_survive_upsert(wh, spark):
    """A NULL timestamp lands in __HIVE_DEFAULT_PARTITION__; an upsert whose
    source also carries NULL-partition rows must MERGE with the existing
    ones, not replace the directory with source-only rows (the isin(days)
    read never matched NULL, so the old rows weren't in the merge input)."""
    wh.overwrite(
        "documento_venta",
        _docs(spark, [(1, 10, 7, None, 119.0), (2, 11, 8, D1, 119.0)]),
    )
    # source: one NEW null-partition row + one dated row
    wh.upsert(
        "documento_venta",
        _docs(spark, [(3, 12, 9, None, 119.0), (4, 13, 10, D2, 119.0)]),
    )
    rows = {r["id_documento"]: r for r in wh.read("documento_venta").collect()}
    assert set(rows) == {1, 2, 3, 4}  # doc 1 (null partition) survived
    assert rows[1]["fecha_creacion"] is None
    # and updates inside the null partition still apply
    wh.upsert("documento_venta", _docs(spark, [(1, 99, 7, None, 238.0)]))
    rows = {r["id_documento"]: r for r in wh.read("documento_venta").collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[1]["id_cliente"] == 99 and rows[1]["monto_total"] == 238.0
