"""Shared ``[sf_dir] [reps]`` argument handling for the two probe tools
(shared_build_probe, shingle_family_probe) — one copy of the argparse
block so a validation fix lands in both (the check.py / sweep_batch
silent-scope family, r15)."""

from __future__ import annotations

import argparse
import os


def parse_probe_args(
    prog: str,
    description: str,
    argv: list[str] | None = None,
    *,
    default_sf_dir: str = "/root/testdata/sf0.1",
    default_reps: int = 3,
) -> tuple[str, int]:
    ap = argparse.ArgumentParser(
        prog=prog,
        allow_abbrev=False,
        description=description,
    )
    ap.add_argument(
        "sf_dir",
        nargs="?",
        default=default_sf_dir,
        help="parquet tables directory (default: %(default)s)",
    )
    ap.add_argument(
        "reps",
        nargs="?",
        type=int,
        default=default_reps,
        help="warm repetitions per key, min taken (default: %(default)s)",
    )
    args = ap.parse_args(argv)
    if args.reps < 1:
        ap.error(f"reps must be >= 1, got {args.reps}")
    if not os.path.isdir(args.sf_dir):
        ap.error(f"no such sf_dir: {args.sf_dir}")
    return args.sf_dir, args.reps
