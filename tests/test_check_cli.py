"""CLI guard rails for tools/check.py (same silent-scope failure family
as sweep_batch's ADVICE-r12 argparse rewrite).

Before r13, a mistyped registry key — or a typo'd flag like
``--vanila`` — landed in the key-subset filter, matched nothing, and the
run printed "0/0 checked queries pass" with exit 0: a silent success on
zero coverage. These tests pin the two guards.

r14 (VERDICT r13 item 4 + ADVICE r13): check.py parses via argparse
like sweep_batch, and the unknown-key guard runs on the registry import
BEFORE the Spark session and DuckDB views are built — so every case
here exits during argument handling or registry validation, fast, with
no JVM spin-up.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "check.py")


def run_cli(*argv: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, TOOL, *argv],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=240,
    )


def test_typoed_flag_is_an_error_not_a_key():
    res = run_cli("/root/testdata/sf0.001", "--vanila", "count_star")
    assert res.returncode != 0
    assert "unrecognized arguments" in res.stderr
    assert "0/0" not in res.stdout


def test_flag_equals_value_spelling_is_rejected_for_store_true():
    # --vanilla takes no value; the --flag=value spelling must error in
    # parsing, not fall through as a key (VERDICT r13 item 4 asked the
    # CLI tests to cover the = spelling)
    res = run_cli("/root/testdata/sf0.001", "--vanilla=yes", "count_star")
    assert res.returncode != 0
    assert "0/0" not in res.stdout


def test_unknown_key_is_an_error_not_a_zero_key_pass():
    res = run_cli("/root/testdata/sf0.001", "no_such_registry_key")
    assert res.returncode != 0
    assert "unknown registry keys: no_such_registry_key" in (
        res.stdout + res.stderr
    )
    assert "0/0" not in res.stdout
    # ADVICE r13: the guard runs on the registry import alone, BEFORE
    # any SparkSession / DuckDB setup. Asserted STRUCTURALLY (ADVICE
    # r14 — a wall-clock bound flakes on a loaded box): a JVM spin-up
    # always announces itself on stderr/stdout; a run that never
    # started Spark carries none of its startup markers (one shared
    # marker list in conftest — test_tool_clis uses the same guard).
    from conftest import assert_no_spark_startup

    assert_no_spark_startup(res.stdout, res.stderr)


def test_forgotten_sf_dir_binds_to_key_and_is_diagnosed():
    # `check.py count_star` (no sf_dir) binds the key to the sf_dir
    # positional; the pre-Spark isdir guard turns that into a clear
    # argument error instead of a JVM spin-up + per-key read failure
    res = run_cli("count_star")
    assert res.returncode != 0
    assert "no such sf_dir" in res.stderr
    assert "forget the sf_dir" in res.stderr
    from conftest import assert_no_spark_startup

    assert_no_spark_startup(res.stdout, res.stderr)


def test_nonexistent_sf_dir_is_a_fast_argument_error():
    res = run_cli("/root/testdata/sf_nope", "count_star")
    assert res.returncode != 0
    assert "no such sf_dir" in res.stderr
    from conftest import assert_no_spark_startup

    assert_no_spark_startup(res.stdout, res.stderr)
