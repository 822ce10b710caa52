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
# (ADVICE.md r3): (a) any key whose implementation or oracle CHANGED this
# round must sit inside the sampled window — streaming_ops (asof dedup),
# text (simhash bands, minhash pre-dedup, jaccard prefixes), vector
# (adaptive planes, fixed-K IVF), tpch (new Q4/Q21); (b) keys never yet
# driver-checked come next (stream_dedup is in streaming_ops; entity keys
# last saw a driver row in r2). The unchanged, r3-green core module goes
# last: its first few keys still land in the window, the long-verified
# tail rotates out.
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
