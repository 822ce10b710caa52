"""Rotation-discipline enforcement (VERDICT r7 items 1-2 and 8).

The driver certifies the first 50 registry keys per round, so the
registry order IS the verification rotation. These tests mechanize the
rules that were previously narrative comments:

- rule (a): every key whose implementation or oracle changed since the
  last round boundary — or that is new — must sit inside the sampled
  window. "Changed" is decided by a static per-key fingerprint over the
  transitive closure of package functions/constants plus the oracle
  expression (tools/rotation.py), which catches helper-level changes
  (the r7 shingle-path miss) while ignoring docstring/comment churn.
- the certification table (queries/certification.py) is generated, and
  must stay in sync with both the registry and the CORRECTNESS_r*.json
  artifacts.
"""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import rotation  # noqa: E402

from imperio_patitas_etl_spark.queries import _MODULES, CURRENT_FRONT, all_queries  # noqa: E402
from imperio_patitas_etl_spark.queries.certification import LAST_DRIVER_ROUND  # noqa: E402


def test_window_is_exactly_the_sampled_prefix():
    keys = list(all_queries())
    assert len(CURRENT_FRONT) == 50
    assert keys[:50] == list(CURRENT_FRONT)
    assert len(set(keys)) == len(keys)


def test_window_literal_follows_round_convention():
    """The driver's window-sampling contract is stated in terms of a
    round-numbered `_R{N}_FRONT` literal where N is one past the newest
    round in the certification table. CURRENT_FRONT must alias exactly
    that literal so the two can never drift (VERDICT r14 item 3)."""
    import imperio_patitas_etl_spark.queries as q

    newest = max(r for r in LAST_DRIVER_ROUND.values() if r is not None)
    name = f"_R{newest + 1}_FRONT"
    assert hasattr(q, name), (
        f"certification table covers r{newest}; expected window literal {name}"
    )
    assert getattr(q, name) is CURRENT_FRONT


def test_certification_table_in_sync():
    """The generated table covers exactly the registry and matches a fresh
    recomputation from the CORRECTNESS artifacts it has seen —
    regenerating after a driver round is part of the round ritual
    (python tools/rotation.py). Artifacts from rounds NEWER than the
    table's coverage are tolerated (the driver writes CORRECTNESS_r{N}
    before the next session regenerates), so a fresh driver drop never
    reads as a broken build."""
    assert set(LAST_DRIVER_ROUND) == set(all_queries())
    covered = max((r for r in LAST_DRIVER_ROUND.values() if r is not None), default=None)
    assert LAST_DRIVER_ROUND == rotation.last_certified(max_round=covered)


def test_rotation_module_list_matches_registry():
    got = {m.__name__ for m in _MODULES}
    assert got == set(rotation.QUERY_MODULES)


def test_rule_a_changed_keys_inside_window():
    """Keys changed since the last round-boundary commit must be inside
    the driver's 50-key window. If a round legitimately changes more than
    50 keys (a shared-helper change), the window must at least be spent
    ENTIRELY on changed keys."""
    boundary = rotation.round_boundary_commit()
    if boundary is None:
        pytest.skip("no round-boundary commit in history")
    changed = rotation.changed_keys_since(boundary)
    window = set(CURRENT_FRONT)
    if len(changed) <= len(window):
        out_of_window = changed - window
        assert not out_of_window, (
            "rule (a): these keys changed since the round boundary but sit "
            f"outside the sampled window: {sorted(out_of_window)}"
        )
    else:
        not_changed = window - changed
        assert not not_changed, (
            "more keys changed than the window holds; the window must be "
            f"spent entirely on changed keys, not: {sorted(not_changed)}"
        )


def test_fingerprints_cover_registry():
    fps = rotation.key_fingerprints(rotation.PackageIndex(rotation.worktree_source))
    assert set(fps) == set(all_queries())


def test_fingerprint_ignores_docstrings_catches_helpers(tmp_path):
    """The fingerprint must ignore docstring-only edits and flag
    helper-body edits — the two behaviors rule (a) hinges on."""
    base = {
        "pkg/mod.py": (
            "CONST = 3\n"
            "def helper(x):\n"
            '    """doc"""\n'
            "    return x + CONST\n"
            "def q_one(spark, sf):\n"
            '    """doc"""\n'
            "    return helper(1)\n"
            'QUERIES = {"one": q_one}\n'
            'ORACLE = {"one": "SELECT 1"}\n'
        )
    }

    def fp(files):
        idx = rotation.PackageIndex(lambda p: files.get(p))
        mods = ("pkg.mod",)
        orig = rotation.QUERY_MODULES
        rotation.QUERY_MODULES = mods
        try:
            return rotation.key_fingerprints(idx)["one"]
        finally:
            rotation.QUERY_MODULES = orig

    f0 = fp(base)
    doc_only = {"pkg/mod.py": base["pkg/mod.py"].replace('"""doc"""', '"""other"""')}
    assert fp(doc_only) == f0
    helper_edit = {"pkg/mod.py": base["pkg/mod.py"].replace("x + CONST", "x * CONST")}
    assert fp(helper_edit) != f0
    const_edit = {"pkg/mod.py": base["pkg/mod.py"].replace("CONST = 3", "CONST = 4")}
    assert fp(const_edit) != f0
    oracle_edit = {"pkg/mod.py": base["pkg/mod.py"].replace("SELECT 1", "SELECT 2")}
    assert fp(oracle_edit) != f0
