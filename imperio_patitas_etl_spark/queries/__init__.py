"""Driver-facing query registry.

Each query key from SURVEY.md §2 maps to a PySpark callable
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) an ANSI-SQL
oracle string DuckDB runs on the same parquet tables. Column names are
aliased identically on both sides — the driver sorts columns by name and
hash-compares values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from imperio_patitas_etl_spark.queries import (
    core,
    entity,
    multimodal_ops,
    streaming_ops,
    text,
    tpch,
    vector,
)

QueryFn = Callable[[SparkSession, str], DataFrame]


# Module order controls registry insertion order. External correctness
# tooling samples a prefix of this registry, so ordering follows two rules
# (ADVICE.md r3): (a) any key whose implementation or oracle changed — or
# that is NEW — this round must sit inside the sampled window: r4 adds
# sessionize_events (streaming_ops), quality_gopher / stratified_sample /
# tf_vectorize / dup_clusters (text), tpch q6/q12/q14/q17; (b) keys never
# yet driver-checked come next (stream_dedup gets its first driver row
# this round; entity keys last saw one in r2). streaming+text+vector+
# tpch+entity fill the 50-key window exactly; multimodal_ops and core are
# unchanged with green r2/r3 rows and rotate out.
_MODULES = (streaming_ops, text, vector, tpch, entity, multimodal_ops, core)


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLE)
    return out
