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
