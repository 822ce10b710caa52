"""Snapshot retention (time travel), vacuum, and small-file compaction
on the parquet warehouse.

The swap already guaranteed all-or-nothing visibility; keep_history=True
upgrades it to an immutable version chain (_history/<table>/v<N>) that
read_version() can query — the Iceberg/Delta snapshot idea expressed at
directory level. Compaction rewrites through the same swap, so it both
benefits from and contributes to the chain.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from imperio_patitas_etl_spark.sinks.warehouse import ParquetWarehouse


def _clients(spark, rows):
    return (
        spark.createDataFrame(
            rows, "id_cliente long, nombre string, rut string, email string"
        )
        .withColumn("apellido", F.lit(None).cast("string"))
        .withColumn("telefono", F.lit(None).cast("string"))
        .withColumn("direccion", F.lit(None).cast("string"))
        .withColumn("fecha_creacion", F.to_timestamp(F.lit("2024-01-01 00:00:00")))
    )


@pytest.fixture()
def wh(spark, tmp_path):
    return ParquetWarehouse(spark, str(tmp_path / "wh"), keep_history=True)


def test_time_travel_reads_each_version(wh, spark):
    wh.overwrite("cliente", _clients(spark, [(1, "ana", "1-9", "a@x.cl")]))
    wh.upsert("cliente", _clients(spark, [(1, "ana maria", "1-9", "a@x.cl")]))
    wh.upsert("cliente", _clients(spark, [(2, "ben", "2-7", "b@x.cl")]))

    # three swaps happened (ensure_table's initial empty write is not
    # retained — only REPLACED directories enter history)
    versions = wh.snapshots("cliente")
    assert len(versions) >= 2
    # v-latest-1: after the first upsert — ana renamed, ben absent
    prev = wh.read_version("cliente", versions[-1])
    assert prev.count() == 1
    assert prev.filter(F.col("nombre") == "ana maria").count() == 1
    # current: both rows
    assert wh.read("cliente").count() == 2
    # a version before the rename still shows the original name
    first = wh.read_version("cliente", versions[0])
    assert first.filter(F.col("nombre") == "ana").count() == first.count()


def test_vacuum_retention(wh, spark):
    wh.overwrite("cliente", _clients(spark, [(1, "a", "1-9", "a@x.cl")]))
    for i in range(3):
        wh.upsert("cliente", _clients(spark, [(10 + i, f"n{i}", "3-3", "c@x.cl")]))
    versions = wh.snapshots("cliente")
    assert len(versions) >= 3
    dropped = wh.vacuum("cliente", keep_last=1)
    assert dropped == versions[:-1]
    assert wh.snapshots("cliente") == versions[-1:]
    with pytest.raises(FileNotFoundError):
        wh.read_version("cliente", dropped[0])


def test_history_off_keeps_swap_destructive(spark, tmp_path):
    wh = ParquetWarehouse(spark, str(tmp_path / "wh2"))
    wh.overwrite("cliente", _clients(spark, [(1, "a", "1-9", "a@x.cl")]))
    wh.upsert("cliente", _clients(spark, [(2, "b", "2-7", "b@x.cl")]))
    assert wh.snapshots("cliente") == []


def test_compact_reduces_files_preserves_rows(wh, spark):
    # many small appends -> many small files
    for i in range(5):
        wh.append("cliente", _clients(spark, [(i, f"n{i}", "1-9", "x@x.cl")]))
    before_rows = wh.read("cliente").count()
    files_before, files_after = wh.compact("cliente")
    assert files_before >= 5
    assert files_after == 1
    assert wh.read("cliente").count() == before_rows
    # compaction itself is a swap: the pre-compaction state is a snapshot
    assert len(wh.snapshots("cliente")) >= 1


def test_compact_partitioned_keeps_layout(spark, tmp_path):
    wh = ParquetWarehouse(
        spark, str(tmp_path / "wh3"), partitioned=True, keep_history=False
    )
    df = spark.createDataFrame(
        [
            (i, 10, None, i, f"2024-01-0{1 + i % 2} 10:00:00", 100.0, 19.0, 119.0,
             "2024-01-01 00:00:00")
            for i in range(6)
        ],
        "id_documento long, id_cliente long, id_tipo_documento long, folio long, "
        "fecha_emision string, monto_neto double, monto_iva double, "
        "monto_total double, fecha_creacion string",
    ).withColumn("fecha_emision", F.to_timestamp("fecha_emision")).withColumn(
        "fecha_creacion", F.to_timestamp("fecha_creacion")
    )
    for i in range(3):
        wh.append("documento_venta", df.filter(F.col("id_documento") % 3 == i))
    rows = wh.read("documento_venta").count()
    files_before, files_after = wh.compact("documento_venta")
    assert files_after <= 2  # one file per date partition
    assert files_after < files_before
    assert wh.read("documento_venta").count() == rows
    import os
    dirs = {d for d in os.listdir(wh.path("documento_venta")) if d.startswith("fecha_dia=")}
    assert dirs == {"fecha_dia=2024-01-01", "fecha_dia=2024-01-02"}
