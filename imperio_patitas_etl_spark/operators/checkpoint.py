"""Explicit release of superseded ``localCheckpoint`` blocks.

``DataFrame.localCheckpoint`` persists the materialized RDD in the block
manager, and PySpark exposes no handle to unpersist it — the blocks are
freed only when the JVM-side RDD object is garbage-collected and the
ContextCleaner gets around to it. Inside an iterative operator (connected
components, label propagation) every round checkpoints a new generation,
so a long-lived session — the 143-key bench sweep, a notebook, a
multi-query driver — accumulates dead generations and every later job
schedules around their blocks. Measured on this box: the same query runs
2-3× slower late in a sweep than in a fresh JVM purely from this
accumulation.

The fix uses the public ``SparkContext.getPersistentRDDs`` registry:
snapshot the persisted-RDD ids before creating a checkpoint, diff after,
and ``unpersist`` a generation's ids once the NEXT generation is
materialized and every action that reads the old one has run. This is
the DataFrame-layer equivalent of what GraphX's Pregel does with
``materialize``/``unpersist`` between supersteps.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def persistent_rdd_ids(spark: SparkSession) -> set[int]:
    """Ids of all currently persisted RDDs (includes localCheckpoint
    storage)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


def release_rdds(spark: SparkSession, ids: set[int]) -> None:
    """Unpersist (non-blocking) every persisted RDD whose id is in
    ``ids``. Ids no longer present are skipped silently."""
    if not ids:
        return
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for k in jmap.keySet().toArray():
        if int(k) in ids:
            jmap.get(k).unpersist(False)


class OwnedFamily(dict):
    """A family of result DataFrames keyed by registry name, plus
    ownership of every checkpoint block their shared build left
    persisted.

    The materialized-table pipeline APIs (``ngram_family_from_shingles``,
    ``copurchase_family_from_edges``) build several results from shared
    eagerly-checkpointed state; the blocks must outlive the build (the
    returned plans read them) but a long-lived session needs a way to
    reclaim them once every consumer has run. Construction contract: the
    builder snapshots ``persistent_rdd_ids`` immediately before the
    build, runs ONLY eager checkpointing (no lazy ``.persist()`` whose
    RDD could first register later — the CheckpointGenerations contract),
    and passes the post-build diff here, so ownership is complete by
    construction — UNDER the single-driver assumption (ADVICE r13): the
    snapshot diff attributes EVERY RDD persisted on the shared
    SparkSession during the build window to the family, so no other
    thread may persist/checkpoint on the same session while a family
    builds, or its blocks would be claimed and freed by this family's
    ``release()``. Both in-repo builders run on the driver thread with
    nothing concurrent; a caller embedding a builder in a multi-threaded
    driver must serialize family builds against any other persisting
    work.

    ``release()`` is idempotent and non-blocking; call it only after
    every action that reads the family's DataFrames has run — the plans
    reference the checkpointed RDDs and would recompute nothing (the
    blocks are gone, the lineage was truncated), failing instead. A
    caller that never releases gets session-lifetime behavior — bounded
    per invocation, but additive across invocations (the accumulation
    ADVICE r11/r12 flagged)."""

    def __init__(
        self, results: dict, spark: SparkSession, checkpoint_ids: set[int]
    ) -> None:
        super().__init__(results)
        self._spark = spark
        self.checkpoint_ids = frozenset(checkpoint_ids)

    def release(self) -> None:
        """Free every checkpoint block the family build persisted."""
        release_rdds(self._spark, set(self.checkpoint_ids))


class CheckpointGenerations:
    """Tracks localCheckpoint block ids per loop generation and frees a
    generation once it is superseded.

    Usage::

        gens = CheckpointGenerations(spark)
        cur = df.localCheckpoint(); gens.mark()
        while ...:
            nxt = step(cur).localCheckpoint(); gens.mark()
            ... every action reading `cur` ...
            gens.release_previous()   # cur's blocks are now dead
            cur = nxt

    CONTRACT: every relation the loop body reads must be fully
    materialized (checkpointed) BEFORE the first ``mark()``. ``mark()``
    attributes ALL newly-persisted RDD ids to the current generation —
    it cannot tell a checkpoint from a lazily-materialized
    ``.persist()`` cache whose RDD first registers during the same job.
    Such a cache would be unpersisted by ``release_previous()``
    mid-loop, and because the CacheManager still routes
    plan-equivalent frames through the now-empty InMemoryRelation,
    every later read — in this call and in every later plan-matching
    call in the session — silently recomputes the cached pipeline
    (measured: 8 s → 23 s on the second dup_clusters run before
    queries/text.py:connected_components switched its edge relation
    from persist() to an up-front localCheckpoint).
    """

    def __init__(self, spark: SparkSession) -> None:
        self._spark = spark
        self._seen = persistent_rdd_ids(spark)
        self._gens: list[set[int]] = []

    def mark(self) -> None:
        now = persistent_rdd_ids(self._spark)
        self._gens.append(now - self._seen)
        self._seen = now

    def release_previous(self) -> None:
        """Free every tracked generation except the newest."""
        while len(self._gens) > 1:
            release_rdds(self._spark, self._gens.pop(0))
