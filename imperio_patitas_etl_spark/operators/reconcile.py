"""Snapshot reconciliation (CDC diff) between two keyed state tables.

The standard "did the backfill change anything" audit between two
warehouse loads: aggregate each snapshot to one fingerprinted row per
key, full-outer join on the key, compare FINGERPRINTS (16 bytes per key
crosses the wire, not the row), and emit only added/removed/changed.
Same family as the reference's MERGE reconciliation
(app/services/etl_service.py:252-325) but non-destructive: it reports
the delta instead of applying it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def classify_snapshot_diff(
    snap_a: DataFrame, snap_b: DataFrame, key: str
) -> DataFrame:
    """Full-outer join ``snap_a``/``snap_b`` on ``key`` and classify every
    key as added / removed / changed by comparing the ``fp`` fingerprint
    column; unchanged keys drop out (the CDC contract). Non-key, non-fp
    columns come back suffixed ``_old`` / ``_new``.

    Scale shape: both sides shuffle once on the key (zero shuffles under
    a bucketed layout); the comparison payload is the fingerprint."""
    payload = [c for c in snap_a.columns if c not in (key, "fp")]
    j = snap_a.alias("a").join(
        snap_b.alias("b"), F.col(f"a.{key}") == F.col(f"b.{key}"), "full_outer"
    )
    status = (
        F.when(F.col(f"a.{key}").isNull(), F.lit("added"))
        .when(F.col(f"b.{key}").isNull(), F.lit("removed"))
        .when(F.col("a.fp") != F.col("b.fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    cols = [
        F.coalesce(F.col(f"a.{key}"), F.col(f"b.{key}")).alias(key),
        status.alias("status"),
    ]
    for c in payload:
        cols.append(F.col(f"a.{c}").alias(f"{c}_old"))
        cols.append(F.col(f"b.{c}").alias(f"{c}_new"))
    return j.select(*cols).filter(F.col("status") != "unchanged")
