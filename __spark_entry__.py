"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship star-join query on sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 for the driver's DuckDB-oracle correctness check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from imperio_patitas_etl_spark.queries import all_oracles, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the warehouse star join
    (lineitem → orders → customer → nation → region) with revenue rollup —
    the F/J/A core of SURVEY.md §7 phase 0."""
    from imperio_patitas_etl_spark.queries.core import q_multi_join_star

    return q_multi_join_star(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent per query key."""
    return all_oracles()
