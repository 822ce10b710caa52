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
# tooling samples a prefix of this registry, so modules whose keys have not
# yet been externally verified (text, tpch, vector) come first; the
# previously-verified core/entity/multimodal/streaming keys follow.
_MODULES = (text, tpch, vector, core, entity, multimodal_ops, streaming_ops)


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
