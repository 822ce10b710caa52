"""CLI contract for tools/sweep_batch.py (ADVICE r12).

The r12 flag parsing silently ignored the ``--keys=a,b`` spelling (the
token starts with ``--`` so it was dropped from positionals, but the
``"--keys" in sys.argv`` membership test was False), which made the
sweep silently run the FULL registry — exactly the silent-scope failure
the flag was added to eliminate. These tests pin the argparse rewrite:
every flag spelling is honored, malformed invocations exit non-zero
with a diagnostic, and a stray bare positional is an error rather than
a silent no-op.

No SparkSession is needed: every case here exits during argument
handling or the registry-key validation step, before any sweep batch is
launched.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "sweep_batch.py")


def run_cli(*argv: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, TOOL, *argv],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=120,
    )


def test_keys_equals_spelling_is_parsed_not_ignored():
    # The r12 bug: `--keys=...` fell through to a FULL-registry sweep.
    # Reaching the unknown-key diagnostic proves the value was parsed.
    res = run_cli("/tmp/nope", "/tmp/nope.log", "--keys=no_such_registry_key")
    assert res.returncode != 0
    assert "unknown registry keys: no_such_registry_key" in (
        res.stdout + res.stderr
    )


def test_keys_space_spelling_is_parsed():
    res = run_cli("/tmp/nope", "/tmp/nope.log", "--keys", "no_such_registry_key")
    assert res.returncode != 0
    assert "unknown registry keys" in res.stdout + res.stderr


def test_stray_positional_is_an_error():
    res = run_cli("/tmp/nope", "/tmp/nope.log", "stray_key_positional")
    assert res.returncode != 0
    assert "unrecognized arguments" in res.stderr


def test_flag_missing_value_is_an_error_not_indexerror():
    for flag in ("--keys", "--budget", "--batch"):
        res = run_cli("/tmp/nope", "/tmp/nope.log", flag)
        assert res.returncode != 0, flag
        assert "expected one argument" in res.stderr, flag
        assert "IndexError" not in res.stderr, flag


def test_unknown_flag_is_an_error():
    res = run_cli("/tmp/nope", "/tmp/nope.log", "--bogus")
    assert res.returncode != 0
    assert "unrecognized arguments" in res.stderr


def test_flag_value_colliding_with_positional_text_is_unambiguous(tmp_path):
    # r12 stripped flag values from positionals by string equality, so a
    # log file literally named "10" with `--batch 10` removed the wrong
    # token. argparse binds by position; a pre-satisfied --keys subset
    # (the log already holds the key's ok line) means zero work, so this
    # returns immediately with remaining=0 without launching a batch.
    log = tmp_path / "10"
    log.write_text("ok   count_star: 1 rows match (0.1s)\n")
    res = run_cli(str(tmp_path), str(log), "--batch", "10", "--keys=count_star")
    assert res.returncode == 0, res.stderr
    assert "remaining=0" in res.stdout


def test_empty_keys_is_an_error_not_a_silent_noop(tmp_path):
    # ADVICE r13: `--keys ''` / `--keys ,` filtered to an empty want
    # list and exited 0 with remaining=0 having swept NOTHING — the
    # same silent-scope family the argparse rewrite was meant to close.
    for spelling in ("--keys=", "--keys=,"):
        res = run_cli(str(tmp_path), str(tmp_path / "x.log"), spelling)
        assert res.returncode != 0, spelling
        assert "--keys given but empty" in res.stdout + res.stderr, spelling
        assert "remaining=0" not in res.stdout, spelling


def test_bad_sf_dir_exits_before_any_batch(tmp_path):
    # r15: without the guard, the resume loop re-spawned check.py (fast-
    # failing on the bad dir, stderr DEVNULL'd) against the same chunk
    # until the whole budget burned, then printed remaining=<all>
    res = run_cli("/no/such/sf_dir", str(tmp_path / "sweep.log"))
    assert res.returncode != 0
    assert "no such sf_dir" in res.stdout + res.stderr
    assert not (tmp_path / "sweep.log").exists()


def test_attempted_keys_counts_ok_and_fail_markers(tmp_path, monkeypatch):
    # the no-progress abort keys off ANY verdict marker: a FAIL keeps the
    # retry-until-budget resume semantics; a zero-marker batch aborts
    monkeypatch.syspath_prepend(os.path.join(REPO, "tools"))
    from sweep_batch import attempted_keys, done_keys

    log = tmp_path / "sweep.log"
    log.write_text(
        "ok   count_star: 5 rows match (0.1s)\r\n"
        "FAIL groupby_avg: spark error: boom\n"
        "some unrelated line\n"
    )
    assert attempted_keys(str(log)) == {"count_star", "groupby_avg"}
    assert done_keys(str(log)) == {"count_star"}


def test_attempted_keys_offset_sees_only_the_appended_region(tmp_path, monkeypatch):
    # the abort is judged from the PRE-BATCH file size: a retried chunk
    # whose keys already carry markers from an earlier batch must be
    # judged only on what this batch appended — old markers satisfying
    # the progress check would mask a dead check.py, and (the reviewed
    # bug) old markers being subtracted as "already seen" would falsely
    # abort every retry of a FAILed key even when the retry just passed
    monkeypatch.syspath_prepend(os.path.join(REPO, "tools"))
    from sweep_batch import attempted_keys

    log = tmp_path / "sweep.log"
    log.write_text("FAIL groupby_avg: spark error: boom\n")
    offset = os.path.getsize(log)

    # batch appended nothing -> no verdicts past the offset (dead tool)
    assert attempted_keys(str(log), offset) == set()
    # retry appends a fresh verdict for the same key -> progress, even
    # though the key already had a marker before the offset
    with open(log, "a") as f:
        f.write("ok   groupby_avg: 25 rows match (0.2s)\n")
    assert attempted_keys(str(log), offset) == {"groupby_avg"}
    # full-file parse still sees both generations
    assert attempted_keys(str(log)) == {"groupby_avg"}
