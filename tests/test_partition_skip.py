"""Partition-skip MERGE tests (SCALE.md §r18, VERDICT r17 item 2): with
``merge_skip_unchanged=True`` the partition-scoped upsert digests each
touched partition's merged content against the on-disk partition and
skips the dynamic-overwrite commit when the row multisets are equal —
the dominant case on idempotent re-syncs, whose wall the r17 A/B
isolated to ~2,405 no-op per-partition commits.

File-listing assertions are the skip evidence: a dynamic overwrite
always writes fresh part-file names, so an unchanged sorted listing
proves the commit was skipped, not merely that the bytes round-tripped."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from imperio_patitas_etl_spark.sinks.warehouse import ParquetWarehouse

from tests.test_partitioned_warehouse import D1, D2, D3, _docs


@pytest.fixture()
def wh(spark, tmp_path):
    return ParquetWarehouse(
        spark, str(tmp_path / "wh"), partitioned=True, merge_skip_unchanged=True
    )


def _listing(wh, table="documento_venta"):
    p = wh.path(table)
    return {
        d: sorted(os.listdir(os.path.join(p, d)))
        for d in os.listdir(p)
        if os.path.isdir(os.path.join(p, d))
    }


def test_idempotent_reupsert_commits_nothing(wh, spark):
    src = _docs(spark, [(1, 10, 7, D1, 119.0), (2, 11, 8, D2, 119.0)])
    wh.upsert("documento_venta", src)
    before = _listing(wh)
    snap1 = sorted(map(tuple, wh.read("documento_venta").collect()))
    wh.upsert("documento_venta", src)  # byte-equivalent re-sync
    assert _listing(wh) == before  # every partition commit skipped
    assert sorted(map(tuple, wh.read("documento_venta").collect())) == snap1


def test_only_changed_partition_rewritten(wh, spark):
    wh.upsert(
        "documento_venta",
        _docs(spark, [(1, 10, 7, D1, 119.0), (2, 11, 8, D2, 119.0), (3, 12, 9, D3, 119.0)]),
    )
    before = _listing(wh)
    # day-1 row re-sent identical (no-op), day-2 row really updated
    wh.upsert(
        "documento_venta",
        _docs(spark, [(1, 10, 7, D1, 119.0), (2, 99, 8, D2, 238.0)]),
    )
    after = _listing(wh)
    assert after["fecha_dia=2024-01-01"] == before["fecha_dia=2024-01-01"]
    assert after["fecha_dia=2024-01-03"] == before["fecha_dia=2024-01-03"]
    assert after["fecha_dia=2024-01-02"] != before["fecha_dia=2024-01-02"]
    rows = {r["id_documento"]: r for r in wh.read("documento_venta").collect()}
    assert rows[2]["id_cliente"] == 99 and rows[2]["monto_total"] == 238.0
    assert rows[1]["id_cliente"] == 10 and rows[3]["id_cliente"] == 12


def test_new_partition_still_written_when_others_skip(wh, spark):
    wh.upsert("documento_venta", _docs(spark, [(1, 10, 7, D1, 119.0)]))
    before = _listing(wh)
    wh.upsert(
        "documento_venta",
        _docs(spark, [(1, 10, 7, D1, 119.0), (4, 13, 10, D3, 119.0)]),
    )
    after = _listing(wh)
    assert after["fecha_dia=2024-01-01"] == before["fecha_dia=2024-01-01"]
    assert "fecha_dia=2024-01-03" in after
    assert wh.read("documento_venta").count() == 2


def test_null_partition_bucket_skips_and_updates(wh, spark):
    # NULL fecha_emision lands in __HIVE_DEFAULT_PARTITION__; the digest
    # compare must key that bucket correctly in both directions
    src = _docs(spark, [(1, 10, 7, None, 119.0), (2, 11, 8, D2, 119.0)])
    wh.upsert("documento_venta", src)
    before = _listing(wh)
    assert "fecha_dia=__HIVE_DEFAULT_PARTITION__" in before
    wh.upsert("documento_venta", src)  # idempotent: null bucket skipped too
    assert _listing(wh) == before
    # real change inside the null bucket is still applied
    wh.upsert("documento_venta", _docs(spark, [(1, 55, 7, None, 300.0)]))
    after = _listing(wh)
    assert (
        after["fecha_dia=__HIVE_DEFAULT_PARTITION__"]
        != before["fecha_dia=__HIVE_DEFAULT_PARTITION__"]
    )
    rows = {r["id_documento"]: r for r in wh.read("documento_venta").collect()}
    assert rows[1]["id_cliente"] == 55 and rows[1]["monto_total"] == 300.0


def test_skip_path_equals_default_path(spark, tmp_path):
    """End-to-end equivalence: the same upsert sequence through a
    skip-enabled and a default warehouse produces identical tables."""
    whs = ParquetWarehouse(
        spark, str(tmp_path / "a"), partitioned=True, merge_skip_unchanged=True
    )
    whd = ParquetWarehouse(spark, str(tmp_path / "b"), partitioned=True)
    steps = [
        _docs(spark, [(1, 10, 7, D1, 119.0), (2, 11, 8, D2, 119.0)]),
        _docs(spark, [(1, 10, 7, D1, 119.0), (2, 11, 8, D2, 119.0)]),
        _docs(spark, [(2, 99, 8, D2, 238.0), (4, 13, 10, D3, 119.0)]),
    ]
    for s in steps:
        whs.upsert("documento_venta", s)
        whd.upsert("documento_venta", s)
    a = whs.read("documento_venta")
    b = whd.read("documento_venta")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_digest_distinguishes_duplicate_row_copies(spark, tmp_path):
    """Unit-level: the multiset digest must flag a partition that gained
    a second copy of an existing row (count differs) and a partition
    where one hash-cancelling pair differs — the XOR-folding failure
    modes the sum folding exists to avoid."""
    wh = ParquetWarehouse(
        spark, str(tmp_path / "wh"), partitioned=True, merge_skip_unchanged=True
    )
    one = _docs(spark, [(1, 10, 7, D1, 119.0)]).withColumn(
        "fecha_dia", F.date_format("fecha_emision", "yyyy-MM-dd")
    )
    two = one.unionAll(one)
    assert wh._changed_partition_values(one, one, "fecha_dia") == []
    assert wh._changed_partition_values(two, one, "fecha_dia") == ["2024-01-01"]
    # row-order permutation digests equal (order-insensitive)
    pair = _docs(
        spark, [(1, 10, 7, D1, 119.0), (9, 12, 8, D1, 50.0)]
    ).withColumn("fecha_dia", F.date_format("fecha_emision", "yyyy-MM-dd"))
    flipped = pair.orderBy(F.desc("id_documento"))
    assert wh._changed_partition_values(pair, flipped, "fecha_dia") == []
