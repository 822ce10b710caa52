"""Distributed exact prefix sums (two-phase scan).

``partitioned_prefix_sum`` computes, for every row, the inclusive running
sum of an integer column in a total order — per stratum — WITHOUT a
per-stratum Window sort. A ``Window.partitionBy(stratum)`` running sum
serializes each stratum into one task; with a handful of strata over
100 TB that is a one-executor bottleneck. The classic fix is the
two-phase parallel scan (Blelloch, "Prefix Sums and Their Applications",
1990), expressed here on DataFrames:

1. range-partition by ``(stratum, *order_cols)`` and sort within
   partitions — every partition holds a contiguous slice of the global
   order, so a stratum can span MANY partitions (that is the point);
2. phase A: one tiny aggregate of per-``(partition, stratum)`` totals —
   at most ``num_partitions × strata_touching_boundaries`` rows — is
   collected and turned into an exclusive offset per (partition,
   stratum) on the driver (bounded by partition count, never by data);
3. phase B: a single Arrow-batched ``mapInPandas`` pass adds the local
   running sum to the broadcast offset. No further shuffle; the scan's
   ordered layout is reused by both phases.

The input is ``localCheckpoint``-ed after the range shuffle so phases A
and B observe the identical partitioning (and the shuffle runs once).
On a cluster the same role is played by persisting the sorted layout —
which a warehouse keeps anyway when the order matches the table's sort
key (SCALE.md: the Z-order/bucketed layouts make this scan shuffle-free).

Used by ``queries/corpus.py:pps_systematic_sample`` (per-stratum
cumulative weights) and ``queries/core.py:equi_depth_histogram`` (exact
global row numbers without a single-task Window).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def partitioned_prefix_sum(
    df: DataFrame,
    stratum_col: str,
    order_cols: list[str],
    value_col: str,
    out_col: str,
    num_partitions: int = 32,
) -> DataFrame:
    """Inclusive per-stratum running sum of ``value_col`` (int64) in
    ``(stratum_col, *order_cols)`` order, as column ``out_col``.

    The (stratum, order) key must be unique per row for the order to be
    total; ties would make the prefix sum well-defined only up to tie
    permutation (same caveat as any ORDER BY).
    """
    cols = [stratum_col, *order_cols]
    ranged = (
        df.repartitionByRange(num_partitions, *cols)
        .sortWithinPartitions(*cols)
        .localCheckpoint()
    )
    with_pid = ranged.withColumn("_pid", F.spark_partition_id())

    # Phase A: per-(partition, stratum) totals -> exclusive offsets.
    # Bounded by num_partitions x (strata crossing that partition), tiny.
    totals = (
        with_pid.groupBy("_pid", stratum_col)
        .agg(F.sum(value_col).alias("_tot"))
        .collect()
    )
    acc: dict[object, int] = {}
    offsets: dict[tuple[int, object], int] = {}
    for row in sorted(totals, key=lambda r: r["_pid"]):
        key = row[stratum_col]
        offsets[(row["_pid"], key)] = acc.get(key, 0)
        acc[key] = acc.get(key, 0) + int(row["_tot"])

    # Fresh StructType — StructType.add mutates in place, and the schema
    # object is the DataFrame's cached one.
    out_schema = StructType(
        list(with_pid.schema.fields) + [StructField(out_col, LongType(), False)]
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: dict[object, int] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            pid = int(pdf["_pid"].iloc[0])
            local = pdf.groupby(stratum_col, sort=False)[value_col].cumsum()
            base = pdf[stratum_col].map(
                lambda s: carry.get(s, 0) + offsets.get((pid, s), 0)
            )
            pdf = pdf.assign(**{out_col: (local + base).astype("int64")})
            for s, tot in (
                pdf.groupby(stratum_col, sort=False)[value_col].sum().items()
            ):
                carry[s] = carry.get(s, 0) + int(tot)
            yield pdf

    return with_pid.mapInPandas(scan, schema=out_schema).drop("_pid")
