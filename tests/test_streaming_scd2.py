"""Streaming SCD2 maintenance end-to-end: stream the orders change feed
as date-ordered micro-batches through the foreachBatch sink and assert
the resulting history is ROW-IDENTICAL to the batch rebuild — versions,
closed intervals, and open rows all line up. This closes the loop
streaming → warehouse maintenance → analytics on one shared operator
(operators/scd2.py)."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from imperio_patitas_etl_spark.operators.scd2 import SCD2_COLS, scd2_from_orders
from imperio_patitas_etl_spark.sources.parquet import load_table
from imperio_patitas_etl_spark.streaming.scd2_sink import foreach_batch_scd2


def test_streaming_scd2_equals_batch_rebuild(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")

    # lay the feed out as three date-range files, written oldest-first so
    # the file stream (oldest modification first) replays them in the
    # date order scd2_apply requires
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    cuts = ["1997-01-01", "1999-01-01"]
    slices = [
        orders.filter(F.col("o_orderdate") < cuts[0]),
        orders.filter(
            (F.col("o_orderdate") >= cuts[0]) & (F.col("o_orderdate") < cuts[1])
        ),
        orders.filter(F.col("o_orderdate") >= cuts[1]),
    ]
    for i, s in enumerate(slices):
        s.coalesce(1).write.parquet(f"{feed}/batch_{i}")
        time.sleep(1.1)  # distinct mtimes -> deterministic replay order

    stream = (
        spark.readStream.schema(orders.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{feed}/batch_*")
    )
    hist_path = str(tmp_path / "scd2_history")
    q = foreach_batch_scd2(stream, hist_path, str(tmp_path / "ck"))
    q.awaitTermination(120)

    got = spark.read.parquet(hist_path).select(*SCD2_COLS)
    want = scd2_from_orders(orders).select(*SCD2_COLS)
    assert got.count() == orders.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

    # restart with the SAME checkpoint: every file is already committed,
    # so re-attaching must apply nothing (exactly-once across restarts —
    # the property the checkpoint + atomic swap combination exists for)
    q2 = foreach_batch_scd2(
        spark.readStream.schema(orders.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{feed}/batch_*"),
        hist_path,
        str(tmp_path / "ck"),
    )
    q2.awaitTermination(60)
    again = spark.read.parquet(hist_path).select(*SCD2_COLS)
    assert again.count() == orders.count()
    assert again.exceptAll(want).count() == 0
