"""CLI guard rails for tools/check.py (same silent-scope failure family
as sweep_batch's ADVICE-r12 argparse rewrite).

Before r13, a mistyped registry key — or a typo'd flag like
``--vanila`` — landed in the key-subset filter, matched nothing, and the
run printed "0/0 checked queries pass" with exit 0: a silent success on
zero coverage. These tests pin the two guards.

The stray-flag test exits during argument handling (fast, no Spark).
The unknown-key test reaches the registry lookup, which boots a local
SparkSession first (~20 s) — kept anyway because it pins the guard that
actually closes the 0/0 hole.
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
    assert "unknown flag" in res.stdout + res.stderr
    assert "0/0" not in res.stdout


def test_unknown_key_is_an_error_not_a_zero_key_pass():
    res = run_cli("/root/testdata/sf0.001", "no_such_registry_key")
    assert res.returncode != 0
    assert "unknown registry keys: no_such_registry_key" in (
        res.stdout + res.stderr
    )
    assert "0/0" not in res.stdout
