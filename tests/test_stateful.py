"""Custom stateful operator test: state must accumulate across multiple
micro-batches and the final per-user totals must equal the batch answer."""

from __future__ import annotations

from pyspark.sql import functions as F

from imperio_patitas_etl_spark.sources.parquet import load_table
from imperio_patitas_etl_spark.streaming.stateful import running_user_totals


def test_stateful_totals_across_batches(spark, sf_dir, tmp_path):
    # split events into 4 files so availableNow + maxFilesPerTrigger=1
    # yields 4 micro-batches — state must survive between them
    src_dir = str(tmp_path / "events_split")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    raw.repartition(4).write.parquet(src_dir)

    stream = (
        spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("t_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert q.lastProgress["batchId"] >= 3  # really ran multiple batches

    # last emitted row per user = final state
    emitted = spark.table("t_state").toPandas()
    final = emitted.groupby("user_id").last()

    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .toPandas()
        .set_index("user_id")
    )
    assert len(final) == len(batch)
    for uid, row in batch.iterrows():
        assert final.loc[uid, "n_events"] == row["n_events"]
        assert abs(final.loc[uid, "total_value"] - row["total_value"]) < 0.05
