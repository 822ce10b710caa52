"""Semantic invariants of the r7 warehouse-analytics tier
(queries/analytics.py): interval integrity for SCD2, monotone funnel
stages, cohort-triangle conservation, and the bloom filter's
no-false-negative guarantee.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from imperio_patitas_etl_spark.queries.analytics import (
    q_bloom_prefilter_join,
    q_event_funnel,
    q_retention_cohorts,
    q_scd2_history,
)


def test_scd2_intervals_partition_each_key(spark, sf_dir):
    h = q_scd2_history(spark, sf_dir)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    # one version per source row, exactly one open (current) interval
    # per key, and consecutive versions chain valid_to -> next valid_from
    assert h.count() == orders.count()
    per_key = h.groupBy("custkey").agg(
        F.sum(F.when(F.col("is_current"), 1).otherwise(0)).alias("n_open"),
        F.count("*").alias("n_versions"),
        F.max("version").alias("max_v"),
    )
    assert per_key.filter(
        (F.col("n_open") != 1) | (F.col("max_v") != F.col("n_versions"))
    ).count() == 0

    nxt = h.alias("a").join(
        h.alias("b"),
        (F.col("a.custkey") == F.col("b.custkey"))
        & (F.col("a.version") + 1 == F.col("b.version")),
    )
    assert nxt.filter(F.col("a.valid_to") != F.col("b.valid_from")).count() == 0
    # closed intervals are well-formed (valid_from <= valid_to; equal
    # timestamps only if two orders share a date, which the orderkey
    # tie-break still orders deterministically)
    assert h.filter(
        F.col("valid_to").isNotNull() & (F.col("valid_to") < F.col("valid_from"))
    ).count() == 0


def test_event_funnel_is_monotone(spark, sf_dir):
    row = q_event_funnel(spark, sf_dir).collect()[0]
    assert (
        row["n_users"]
        >= row["n_viewed"]
        >= row["n_clicked_after_view"]
        >= row["n_purchased_after_click"]
        >= 0
    )
    # with 4k+ events over 150 users every stage should convert somebody
    assert row["n_purchased_after_click"] > 0


def test_retention_cohorts_triangle(spark, sf_dir):
    r = q_retention_cohorts(spark, sf_dir)
    # offset-0 row per cohort counts the whole cohort (everyone is active
    # in their own first week), and no offset is negative
    assert r.filter(F.col("week_offset") < 0).count() == 0
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    cohort_sizes = first.groupBy("cohort_week").agg(F.count("*").alias("n"))
    week0 = r.filter(F.col("week_offset") == 0).select(
        "cohort_week", F.col("n_active").alias("n0")
    )
    j = cohort_sizes.join(week0, "cohort_week", "left")
    assert j.filter(
        F.col("n0").isNull() | (F.col("n0") != F.col("n"))
    ).count() == 0
    # retention never exceeds cohort size at any offset
    full = r.join(cohort_sizes, "cohort_week")
    assert full.filter(F.col("n_active") > F.col("n")).count() == 0


def test_bloom_has_no_false_negatives(spark, sf_dir):
    row = q_bloom_prefilter_join(spark, sf_dir).collect()[0]
    # every true match passes the bloom (no false negatives) and the
    # pass set is exactly matches + false positives
    assert row["n_bloom_pass"] == row["n_match"] + row["n_false_pos"]
    assert row["n_match"] <= row["n_bloom_pass"] <= row["n_probe"]
    # 3 hashes over 2^16 slots with a KB-scale build side: the filter
    # must actually filter (pass rate well under 50% of probes)
    assert row["n_bloom_pass"] < row["n_probe"] / 2
