"""Shared Spark fixture for the unit-test suite.

Small local session (4 threads, 4 shuffle partitions) — unit tests run on
tiny inline DataFrames; the sf-scale correctness gate is tools/check.py.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

#: Spark/JVM startup markers, shared by the CLI fast-path tests
#: (test_check_cli, test_tool_clis): a subprocess whose combined output
#: carries none of these never spun up a SparkSession — the structural
#: form of "the guard ran before Spark" (ADVICE r14: no wall-clock
#: bounds). One copy here so a Spark upgrade that changes a marker
#: string is fixed in one place.
SPARK_STARTUP_MARKERS = (
    "Setting default log level",
    "NativeCodeLoader",
    "SparkContext",
    "SparkSession",
)


def assert_no_spark_startup(stdout: str, stderr: str = "") -> None:
    combined = stdout + stderr
    for marker in SPARK_STARTUP_MARKERS:
        assert marker not in combined, (
            f"Spark spun up during argument handling: {marker!r}"
        )


@pytest.fixture(scope="session")
def spark():
    import tempfile

    from imperio_patitas_etl_spark.session import get_spark

    s = get_spark(
        "tests",
        master="local[4]",
        shuffle_partitions=4,
        # saveAsTable targets (bucketed-join tests) land in a scratch dir,
        # not ./spark-warehouse inside the repo
        extra_conf={"spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="sparkwh_")},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
