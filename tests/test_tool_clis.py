"""CLI guard rails for the tools/ commands (VERDICT r14 hygiene family:
check.py r13, sweep_batch r13, rotation/retag r15, dump_plans/make_sf1
and the two probes r15; the r16 scale-evidence tools — pipeline_bench,
ngram_candidate_probe, scaling_curve — join the same rails below).

The pre-r15 parsing in these four was hand-rolled ``sys.argv`` slicing:

- ``dump_plans.py --ful`` silently produced the SUMMARY dump where the
  caller asked for the full one (the typo'd flag was dropped from the
  positional list and never compared);
- ``make_sf1.py out 0`` crashed with IndexError deep in the build
  (``parts[0]`` on an empty list) instead of an argument error, and
  nothing stopped an ``out_dir`` inside the read-only testdata tree
  from being hit with overwrite-mode writes;
- both probes accepted stray extra positionals silently and turned a
  non-integer ``reps`` into a raw ValueError traceback.

All four now parse via argparse with the same deferred-import shape as
retag.py: every case below exits during argument handling, before any
pyspark import or SparkSession — asserted structurally by the absence
of Spark startup markers (ADVICE r14: no wall-clock bounds).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

from conftest import assert_no_spark_startup

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(tool: str, *argv: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", tool), *argv],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=240,
    )


def assert_no_spark(res: subprocess.CompletedProcess) -> None:
    assert_no_spark_startup(res.stdout, res.stderr)


ALL_TOOLS = [
    "dump_plans.py",
    "make_sf1.py",
    "shared_build_probe.py",
    "shingle_family_probe.py",
    "pipeline_bench.py",
]

#: r16 tools with VARIADIC positionals by design (N sf_dirs / N keys) —
#: they share the help/typo'd-flag rails but not the arity test
VARIADIC_TOOLS = [
    "ngram_candidate_probe.py",
    "scaling_curve.py",
]


@pytest.mark.parametrize("tool", ALL_TOOLS + VARIADIC_TOOLS)
def test_help_is_fast_path(tool):
    res = run_cli(tool, "--help")
    assert res.returncode == 0
    assert "usage:" in res.stdout
    assert_no_spark(res)


@pytest.mark.parametrize("tool", ALL_TOOLS + VARIADIC_TOOLS)
def test_typoed_flag_is_an_error(tool):
    res = run_cli(tool, "--ful")
    assert res.returncode != 0
    assert "unrecognized arguments" in res.stderr
    assert_no_spark(res)


@pytest.mark.parametrize("tool", ALL_TOOLS)
def test_stray_extra_positional_is_an_error(tool):
    # every tool takes at most two positionals
    res = run_cli(tool, "/tmp", "3", "stray", "extra")
    assert res.returncode != 0
    assert "unrecognized arguments" in res.stderr or "invalid" in res.stderr
    assert_no_spark(res)


@pytest.mark.parametrize(
    "tool",
    [
        "dump_plans.py",
        "shared_build_probe.py",
        "shingle_family_probe.py",
        "pipeline_bench.py",
        "ngram_candidate_probe.py",
    ],
)
def test_missing_sf_dir_is_an_argument_error(tool):
    res = run_cli(tool, "/no/such/sf_dir")
    assert res.returncode != 0
    assert "no such sf_dir" in res.stderr
    assert_no_spark(res)


@pytest.mark.parametrize(
    "tool", ["shared_build_probe.py", "shingle_family_probe.py"]
)
def test_non_integer_reps_is_an_argument_error(tool):
    res = run_cli(tool, "/tmp", "three")
    assert res.returncode != 0
    assert "invalid int value" in res.stderr
    assert_no_spark(res)


@pytest.mark.parametrize(
    "tool", ["shared_build_probe.py", "shingle_family_probe.py"]
)
def test_zero_reps_is_an_argument_error(tool):
    res = run_cli(tool, "/tmp", "0")
    assert res.returncode != 0
    assert "reps must be >= 1" in res.stderr
    assert_no_spark(res)


def test_make_sf1_zero_copies_is_an_argument_error():
    # pre-argparse this crashed as parts[0] IndexError mid-build
    res = run_cli("make_sf1.py", "/tmp/sf1_test_nowrite", "0")
    assert res.returncode != 0
    assert "copies must be >= 1" in res.stderr
    assert_no_spark(res)
    assert not os.path.exists("/tmp/sf1_test_nowrite")


@pytest.mark.parametrize(
    "out_dir", ["/root/testdata", "/root/testdata/sf0.1", "/root/testdata/new"]
)
def test_make_sf1_refuses_out_dir_inside_testdata(out_dir):
    # the testdata tree is read-only by contract; overwrite-mode writes
    # must never be pointed at it
    res = run_cli("make_sf1.py", out_dir)
    assert res.returncode != 0
    assert "outside /root/testdata" in res.stderr
    assert_no_spark(res)


def test_dump_plans_full_flag_equals_value_is_rejected():
    # --full takes no value; the = spelling must be a parse error, not
    # a silently-summary run (the r13 check.py convention)
    res = run_cli("dump_plans.py", "--full=yes")
    assert res.returncode != 0
    assert_no_spark(res)


def test_scaling_curve_invalid_key_is_an_argument_error():
    # key membership is validated against the registry BEFORE any
    # SparkSession exists — a typo'd key must not cost a JVM boot and
    # a KeyError mid-sweep
    res = run_cli("scaling_curve.py", "no_such_query_key")
    assert res.returncode != 0
    assert "invalid query key" in res.stderr
    assert_no_spark(res)


def test_scaling_curve_zero_reps_is_an_argument_error():
    res = run_cli("scaling_curve.py", "--reps", "0")
    assert res.returncode != 0
    assert "reps must be >= 1" in res.stderr
    assert_no_spark(res)
