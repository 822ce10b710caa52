"""The IVF storage-layout step, proven: writing the corpus partitioned
by cell turns probes into partition-pruned reads that return EXACTLY the
in-plan q_ann_ivf results. This is the test behind SCALE.md's "at 100 TB
the corpus would be written bucketed by cell" claim — not just a note.
"""

from __future__ import annotations

from imperio_patitas_etl_spark.queries.vector import (
    ann_ivf_from_layout,
    materialize_cell_layout,
    q_ann_ivf,
)


def test_cell_layout_prunes_partitions_and_matches_inplan(spark, sf_dir, tmp_path):
    layout = str(tmp_path / "ivf_layout")
    materialize_cell_layout(spark, sf_dir, layout)

    pruned = ann_ivf_from_layout(spark, sf_dir, layout)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the probe-cell list must reach the scan as PartitionFilters
    # (df.inputFiles() ignores pruning — assert on the plan, per the
    # repo verify notes)
    assert "PartitionFilters: [" in plan
    assert "cell" in plan.split("PartitionFilters:", 1)[1][:200]

    inplan = q_ann_ivf(spark, sf_dir)
    a = {tuple(r) for r in pruned.collect()}
    b = {tuple(r) for r in inplan.collect()}
    assert a == b and len(a) > 0


def test_layout_rejects_mismatched_or_untagged_source(spark, sf_dir, tmp_path):
    """ann_ivf_from_layout re-derives the coarse quantizer from sf_dir;
    a layout materialized from a different corpus must be refused, not
    silently probed with foreign centroids (same provenance contract as
    the co-purchase edge table and the shingle table)."""
    import pytest

    layout = str(tmp_path / "ivf_layout")
    materialize_cell_layout(spark, sf_dir, layout)

    # same source, trailing slash: normalized, accepted
    assert ann_ivf_from_layout(spark, sf_dir + "/", layout).count() > 0

    other = str(tmp_path / "definitely_not_the_source_sf_dir")
    with pytest.raises(ValueError, match="materialized from"):
        ann_ivf_from_layout(spark, other, layout)

    # an untagged layout (written outside materialize_cell_layout) —
    # metadata survives read->write round-trips, so clear it explicitly
    plain = str(tmp_path / "plain_layout")
    spark.read.parquet(layout).withMetadata("vec_id", {}).write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(plain)
    with pytest.raises(ValueError, match="materialized from"):
        ann_ivf_from_layout(spark, sf_dir, plain)


def test_allpairs_count_blocked_matches_naive(spark):
    """The blocked numpy ground-truth counter equals a naive python count
    on a corpus that straddles blocks (n > RECALL_BLOCKS), including
    intra-block id ordering and the >= threshold boundary."""
    import itertools
    import math

    from pyspark.sql import functions as F

    from imperio_patitas_etl_spark.queries.vector import (
        RECALL_BLOCKS,
        _allpairs_count_blocked,
    )

    vecs = {
        i: [(i * 7 + j * 3) % 11 - 5 for j in range(4)] for i in range(20)
    }
    rows = [(i, v, sum(x * x for x in v)) for i, v in vecs.items()]
    v = spark.createDataFrame(
        rows, "vec_id long, ivec array<long>, norm2 long"
    )
    t = 0.45
    naive = sum(
        1
        for a, b in itertools.combinations(sorted(vecs), 2)
        if sum(x * y for x, y in zip(vecs[a], vecs[b]))
        / math.sqrt(float(sum(x * x for x in vecs[a])) * sum(x * x for x in vecs[b]))
        >= t
    )
    got = (
        _allpairs_count_blocked(v, t)
        .agg(F.sum("partial").alias("n"))
        .collect()[0]
        .n
    )
    assert 20 > RECALL_BLOCKS  # corpus straddles blocks by construction
    assert got == naive > 0
