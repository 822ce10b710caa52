"""Unit tests for the scalar layer (C1-C13, SURVEY.md §2.6).

Edge-case tables mirror the reference's per-row logic in
app/services/etl_service.py (sentinel normalization :30-75, RUT :203-215,
email :217-222, bool cast :103, unix timestamps :336-338).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from imperio_patitas_etl_spark.functions import cleaning as c


def _vals(spark, col, data, in_type="string"):
    df = spark.createDataFrame([(v,) for v in data], schema=f"x {in_type}")
    return [r[0] for r in df.select(col(F.col("x")).alias("y")).collect()]


def test_normalize_sentinels(spark):
    data = ["  hi  ", "", "   ", "null", "NULL", "None", "Sin Nombre", "sin nombre ", "ok", None]
    out = _vals(spark, c.normalize_sentinels, data)
    assert out == ["hi", None, None, None, None, None, None, None, "ok", None]


def test_blank_to_null(spark):
    out = _vals(spark, c.blank_to_null, ["  a ", "", "   ", None])
    assert out == ["a", None, None, None]


def test_rut_regex_accept_reject(spark):
    accept = ["12345678-9", "1234567-k", "1234567-K", "12345678", "12.345.678-9", "12 345 678-9", "123456789"]
    reject = ["1234567890", "123456", "12345678-99", "abc", "12345678-x", ""]
    out = _vals(spark, c.is_valid_rut, accept + reject)
    assert out == [True] * len(accept) + [False] * len(reject)


def test_email_regex_accept_reject(spark):
    accept = ["a@b.c", "first.last@sub.domain.org"]
    reject = ["a@b", "@b.c", "a@.b@c", "plain", ""]
    out = _vals(spark, c.is_valid_email, accept + reject)
    assert out == [True] * len(accept) + [False] * len(reject)


def test_bool_to_int(spark):
    out = _vals(spark, c.bool_to_int, [True, False, None], in_type="boolean")
    assert out == [1, 0, 0]


def test_ts_from_unix(spark):
    out = _vals(spark, c.ts_from_unix, [0, 1700000000, None], in_type="long")
    assert out[0] == datetime(1970, 1, 1, 0, 0)
    assert out[1] == datetime(2023, 11, 14, 22, 13, 20)
    assert out[2] is None


def test_round2_exact_half_cent_ties(spark):
    # 4-decimal values exactly at the half-cent boundary must round HALF-UP
    # deterministically (0.125 → 0.13), where double round() is banker's.
    data = [0.125, 0.135, 1.005, 2.675, -0.0, 10.0]
    out = _vals(spark, lambda x: c.round2_exact(x), data, in_type="double")
    assert out == [0.13, 0.14, 1.01, 2.68, 0.0, 10.0]


def test_avg2_exact(spark):
    df = spark.createDataFrame([(1, 0.05), (1, 0.10), (2, 1.0)], "k int, v double")
    out = {
        r["k"]: r["avg"]
        for r in df.groupBy("k")
        .agg(c.avg2_exact(F.sum("v"), F.count("v")).alias("avg"))
        .collect()
    }
    # (0.05+0.10)/2 = 0.075 → half-up → 0.08
    assert out == {1: 0.08, 2: 1.0}


def test_sum2_exact_order_independent(spark):
    rows = [(i % 7, round(0.0001 * i, 4)) for i in range(1000)]
    df = spark.createDataFrame(rows, "k int, v double").repartition(8)
    got = {
        r["k"]: r["s"]
        for r in df.groupBy("k").agg(c.sum2_exact(F.col("v")).alias("s")).collect()
    }
    import collections

    exact = collections.defaultdict(int)
    for k, v in rows:
        exact[k] += round(v * 10000)
    for k, units in exact.items():
        assert got[k] == ((units + 50) // 100) / 100.0


def test_consistency_flag(spark):
    df = spark.createDataFrame([(1.0, 1.005), (1.0, 1.02)], "a double, b double")
    out = [r[0] for r in df.select(c.consistency_flag(F.col("a"), F.col("b")).alias("f")).collect()]
    assert out == [False, True]
