"""Materialize an sf1-scale dataset by replicating sf0.1 with shifted keys.

The driver testdata stops at sf0.1 (~600 k lineitem); the sf1 smoke
(BASELINE.md) wants one order of magnitude closer to target scale to
surface memory/skew surprises the small SFs can't. This tool builds
~6 M-lineitem tables OUTSIDE the read-only testdata tree by unioning the
sf0.1 tables ``COPIES``× with disjoint key ranges:

- key-shift strides are computed ONCE PER KEY DOMAIN from the domain's
  primary-key table and shared by every referencing column (an FK column
  shifted with a stride derived from its own observed max could diverge
  from its PK's stride — e.g. customers with no orders pulling the two
  maxima across a power of 10 — silently orphaning every FK in copies
  ≥ 1 and shrinking join results 10×);
- non-key distributions (dates, amounts, texts, embeddings) repeat
  10×, which is exactly how TPC-H dbgen scales dimension content too;
- region/nation stay fixed (they are fixed-cardinality in TPC-H), so
  joins through nationkey fan out 10× — same as real scale growth.

Usage:  python tools/make_sf1.py [out_dir] [copies]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
COPIES = 10

#: key domain -> (primary-key table, primary-key column)
DOMAINS = {
    "custkey": ("customer", "c_custkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "partkey": ("part", "p_partkey"),
    "orderkey": ("orders", "o_orderkey"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}

#: table -> {column: key domain} for every PK and FK that must shift
SHIFT_COLS: dict[str, dict[str, str]] = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
    # fixed-cardinality dims replicate once, unshifted
    "region": {},
    "nation": {},
}


def _stride(df, col: str) -> int:
    mx = df.selectExpr(f"max({col})").first()[0] or 0
    s = 1
    while s <= mx:
        s *= 10
    return s


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(
        prog="make_sf1.py",
        allow_abbrev=False,
        description=(
            "Replicate the sf0.1 tables COPIES x with disjoint key "
            "ranges into out_dir (outside the read-only testdata tree)."
        ),
    )
    ap.add_argument(
        "out_dir",
        nargs="?",
        default="/tmp/sf1",
        help="destination directory (default: %(default)s)",
    )
    ap.add_argument(
        "copies",
        nargs="?",
        type=int,
        default=COPIES,
        help="replication factor (default: %(default)s)",
    )
    args = ap.parse_args(argv)
    if args.copies < 1:
        ap.error(f"copies must be >= 1, got {args.copies}")
    # the testdata tree is read-only by contract; refuse to point the
    # overwrite-mode writes at it (the docstring promises "outside the
    # read-only testdata tree" — enforce it)
    if os.path.realpath(args.out_dir).startswith(
        os.path.realpath("/root/testdata") + os.sep
    ) or os.path.realpath(args.out_dir) == os.path.realpath("/root/testdata"):
        ap.error(f"out_dir must be outside /root/testdata, got {args.out_dir}")
    if not os.path.isdir(SRC):
        ap.error(f"source sf0.1 tables missing at {SRC}")
    out_dir, copies = args.out_dir, args.copies

    from pyspark.sql import functions as F

    from imperio_patitas_etl_spark.session import get_spark
    from imperio_patitas_etl_spark.sources.parquet import load_table

    spark = get_spark("make_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)

    domain_stride = {
        d: _stride(load_table(spark, SRC, tbl), col)
        for d, (tbl, col) in DOMAINS.items()
    }
    print(f"domain strides: {domain_stride}")

    for name, keys in SHIFT_COLS.items():
        df = load_table(spark, SRC, name)
        if not keys:
            df.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
            print(f"{name}: copied unshifted")
            continue
        parts = []
        for i in range(copies):
            c = df
            for col, domain in keys.items():
                c = c.withColumn(col, F.col(col) + F.lit(i * domain_stride[domain]))
            parts.append(c)
        union = parts[0]
        for p in parts[1:]:
            union = union.unionByName(p)
        union.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
        print(f"{name}: x{copies}, domains {keys}")


if __name__ == "__main__":
    main()
