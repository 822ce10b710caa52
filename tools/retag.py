"""One-time legacy-tag upgrade for materialized product tables.

Tables materialized BEFORE r12 carry the raw ``sf_dir.rstrip('/')`` as
their provenance tag; the strict realpath compare (the default since
r14, ADVICE r13) refuses them unless the consumer opts in with
``allow_legacy_tag=True``. This command is the documented exit path
from that flag (VERDICT r14 item 4): validate the legacy tag, rebuild
the table once through its own materializer, verify the strict tag —
then the consumer drops the flag. Idempotent: an already-strict table
is a no-op (exit 0, "already strict"); a genuinely mismatched table is
refused (exit 2) — re-tagging must never launder a real source
mismatch.

Usage:

    python tools/retag.py {shingles|edges|layout} <sf_dir> <path>
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: swap sibling suffixes — MUST equal operators/provenance.py's
#: RETAG_TMP_SUFFIX / RETAG_OLD_SUFFIX (repeated here because importing
#: provenance would pay the pyspark import this CLI's fast paths avoid;
#: tests/test_retag.py pins the two copies equal)
TMP_SUFFIX = ".retag.tmp"
OLD_SUFFIX = ".retag.old"

#: kind -> dotted module + retag function name (import deferred so
#: --help and arg errors never pay the pyspark import)
KINDS = {
    "shingles": ("imperio_patitas_etl_spark.queries.text", "retag_shingle_table"),
    "edges": ("imperio_patitas_etl_spark.queries.affinity", "retag_edge_table"),
    "layout": ("imperio_patitas_etl_spark.queries.vector", "retag_cell_layout"),
}


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="retag.py",
        allow_abbrev=False,
        description=(
            "Upgrade a pre-r12 raw-string-tagged product table to the "
            "strict realpath provenance tag by rebuilding it once from "
            "sf_dir."
        ),
    )
    ap.add_argument("kind", choices=sorted(KINDS), help="which product table")
    ap.add_argument("sf_dir", help="the source directory the table was built from")
    ap.add_argument("path", help="the materialized table's parquet path")
    args = ap.parse_args(argv)

    if not os.path.isdir(args.sf_dir):
        # pre-Spark like every other tools/ CLI: a typo'd sf_dir would
        # otherwise pay the JVM spin-up and then be misdiagnosed as a
        # "genuine source mismatch" on a healthy table
        ap.error(f"no such sf_dir: {args.sf_dir}")
    base = os.path.normpath(args.path)
    if not os.path.isdir(base) and not (
        os.path.lexists(base + TMP_SUFFIX) or os.path.lexists(base + OLD_SUFFIX)
    ):
        # lexists on BOTH siblings: any debris shape admits the run so
        # retag_table can recover or sweep-and-refuse cleanly (exit 2)
        # a missing path IS valid when swap-crash debris exists — the
        # rerun of this same command is the documented recovery path
        # (retag_table self-recovers from .retag.tmp / .retag.old)
        ap.error(
            f"no table at {args.path} (and no {TMP_SUFFIX}/{OLD_SUFFIX} "
            "debris to recover)"
        )

    import importlib

    mod_name, fn_name = KINDS[args.kind]
    retag = getattr(importlib.import_module(mod_name), fn_name)

    from imperio_patitas_etl_spark.session import get_spark

    spark = get_spark("retag")
    try:
        rebuilt = retag(spark, args.sf_dir, args.path)
    except ValueError as e:
        print(f"refused: {e}", file=sys.stderr)
        return 2
    print(
        f"{args.kind} at {args.path}: "
        + ("re-tagged (strict tag verified)" if rebuilt else "already strict, no-op")
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
