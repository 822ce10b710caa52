"""Resumable batcher for long full-registry oracle sweeps.

The full `tools/check.py` sweep at sf0.1 takes ~30-40 minutes — longer
than this environment's shell command cap — so it must run as a series
of fresh short-lived processes that append to a cumulative log. Each
invocation reads the log, figures out which registry keys already passed
(``ok   <key>:`` lines), and runs check.py on the next keys under a
wall-clock budget, one batch-sized subprocess at a time. Re-invoke until
it prints ``remaining=0``. A key that FAILED in a previous batch is
retried (only ``ok`` lines mark completion) — a persistent failure shows
up in the log every batch.

Usage: python tools/sweep_batch.py <sf_dir> <log_file> [--vanilla]
           [--budget SECONDS] [--batch N] [--keys k1,k2,...]

``--keys`` restricts the sweep to a comma-separated subset (registry
order preserved) — the window-vanilla gate shape. Unknown key names
abort immediately rather than silently sweeping the full registry
(the r12 lesson: extra positionals used to be ignored).
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


#: check.py verdict markers: "ok   <key>: ..." / "FAIL <key>: ..."
_OK_RE = re.compile(r"ok\s+(\S+):")
_VERDICT_RE = re.compile(r"(?:ok|FAIL)\s+(\S+):")


def _keys_in(text: str, rx: re.Pattern) -> set[str]:
    out: set[str] = set()
    # Spark progress bars embed \r — split on both line endings
    for line in re.split(r"[\r\n]+", text):
        m = rx.match(line.strip())
        if m:
            out.add(m.group(1))
    return out


def done_keys(log_path: str) -> set[str]:
    if not os.path.exists(log_path):
        return set()
    with open(log_path, errors="replace") as f:
        return _keys_in(f.read(), _OK_RE)


def attempted_keys(path: str, offset: int = 0) -> set[str]:
    """Keys with ANY verdict — ok or FAIL — in the log from byte
    ``offset`` on. The zero-progress abort passes the pre-batch file
    size so a RETRIED chunk (whose keys already carry markers from an
    earlier batch or run) is judged only on what this batch appended:
    a fresh FAIL keeps the retry-until-budget resume semantics; a batch
    that appended no verdict at all means check.py died before
    checking, which must abort rather than re-spin all budget."""
    if not os.path.exists(path):
        return set()
    with open(path, "rb") as f:
        f.seek(offset)
        return _keys_in(f.read().decode(errors="replace"), _VERDICT_RE)


def main() -> None:
    # argparse so every flag spelling works (`--keys a,b` AND `--keys=a,b`),
    # missing values error cleanly, and a stray bare key positional — the
    # pre-r12 silent-scope hazard — is rejected rather than ignored.
    parser = argparse.ArgumentParser(
        description="resumable full-registry oracle sweep batcher",
        allow_abbrev=False,
    )
    parser.add_argument("sf_dir")
    parser.add_argument("log_file")
    parser.add_argument("--vanilla", action="store_true")
    parser.add_argument("--budget", type=float, default=480.0)
    parser.add_argument("--batch", type=int, default=10)
    parser.add_argument(
        "--keys",
        help="comma-separated registry-key subset (registry order preserved); "
        "bare key positionals are an error, not a silent full sweep",
    )
    ns = parser.parse_args()
    sf_dir, log_path = ns.sf_dir, ns.log_file
    vanilla, budget, batch = ns.vanilla, ns.budget, ns.batch
    from imperio_patitas_etl_spark.queries import all_queries

    order = list(all_queries())
    if ns.keys is not None:
        want = [k for k in ns.keys.split(",") if k]
        # ADVICE r13: `--keys ''` / `--keys ,` filtered to an empty want
        # list and exited 0 with remaining=0 having swept NOTHING — the
        # same silent-scope family the argparse rewrite closed.
        if not want:
            sys.exit("--keys given but empty: no keys to sweep")
        unknown = [k for k in want if k not in order]
        if unknown:
            sys.exit(f"unknown registry keys: {' '.join(unknown)}")
        keep = set(want)
        order = [k for k in order if k in keep]
    if not os.path.isdir(sf_dir):
        # pre-Spark like check.py's guard (check.py orders sf_dir first;
        # here it comes after key validation because the CLI contract
        # tests pin the unknown-key diagnostics with placeholder dirs —
        # both orders exit during argument handling): without this the
        # resume loop below re-spawns check.py (which fails fast on the
        # bad dir, to a DEVNULL'd stderr) against the same chunk until
        # the whole budget burns, then reports remaining=<all> with no
        # clue
        sys.exit(f"no such sf_dir: {sf_dir}")
    t0 = time.monotonic()
    while True:
        remaining = [k for k in order if k not in done_keys(log_path)]
        if not remaining or time.monotonic() - t0 > budget:
            break
        chunk = remaining[:batch]
        cmd = [sys.executable, os.path.join(REPO, "tools", "check.py"), sf_dir]
        if vanilla:
            cmd.append("--vanilla")
        cmd += chunk
        offset = os.path.getsize(log_path) if os.path.exists(log_path) else 0
        with open(log_path, "a") as log:
            subprocess.run(cmd, stdout=log, stderr=subprocess.DEVNULL, cwd=REPO)
        if not attempted_keys(log_path, offset) & set(chunk):
            # THIS batch appended neither an ok nor a FAIL for any of
            # its keys: check.py died before checking (import error,
            # OOM, env). A genuine oracle FAIL appends a fresh marker
            # every retry — judged from the pre-batch offset so a
            # RETRIED chunk whose keys already carry old markers keeps
            # the retry-until-budget resume semantics; a zero-append
            # batch would loop the same chunk for the whole budget.
            repro = f"python tools/check.py {sf_dir}"
            if vanilla:
                repro += " --vanilla"
            sys.exit(
                "batch made no progress on "
                f"{' '.join(chunk[:3])}{'...' if len(chunk) > 3 else ''}; "
                f"check.py is dying before checking — run it directly: "
                f"{repro} {chunk[0]}"
            )
    remaining = [k for k in order if k not in done_keys(log_path)]
    print(f"remaining={len(remaining)}")
    if remaining:
        print("next:", " ".join(remaining[:batch]))


if __name__ == "__main__":
    main()
