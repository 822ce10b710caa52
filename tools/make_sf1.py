"""Materialize an sf1-scale dataset by replicating sf0.1 with shifted keys.

The driver testdata stops at sf0.1 (~600 k lineitem); the sf1 smoke
(BASELINE.md) wants one order of magnitude closer to target scale to
surface memory/skew surprises the small SFs can't. This tool builds
~6 M-lineitem tables OUTSIDE the read-only testdata tree by unioning the
sf0.1 tables ``COPIES``× with disjoint key ranges:

- every primary key (and its foreign-key references) is shifted by
  ``copy_index * stride`` where stride = 10^ceil(log10(max_key)) — key
  spaces stay disjoint and join selectivity per copy is preserved, so a
  query's work scales linearly with COPIES, matching a real sf1;
- non-key distributions (dates, amounts, texts, embeddings) repeat
  10×, which is exactly how TPC-H dbgen scales dimension content too;
- region/nation stay fixed (they are fixed-cardinality in TPC-H), so
  joins through nationkey fan out 10× — same as real scale growth.

Usage:  python tools/make_sf1.py [out_dir] [copies]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
COPIES = 10

#: table -> columns to shift (primary keys + FKs into other shifted tables)
SHIFT_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    # fixed-cardinality dims replicate once, unshifted
    "region": [],
    "nation": [],
}


def _stride(df, col: str) -> int:
    mx = df.selectExpr(f"max({col})").first()[0] or 0
    s = 1
    while s <= mx:
        s *= 10
    return s


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else COPIES

    from pyspark.sql import functions as F

    from imperio_patitas_etl_spark.session import get_spark
    from imperio_patitas_etl_spark.sources.parquet import load_table

    spark = get_spark("make_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)

    for name, keys in SHIFT_COLS.items():
        df = load_table(spark, SRC, name)
        if not keys:
            df.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
            print(f"{name}: copied unshifted")
            continue
        strides = {k: _stride(df, k) for k in keys}
        parts = []
        for i in range(copies):
            c = df
            for k, s in strides.items():
                c = c.withColumn(k, F.col(k) + F.lit(i * s))
            parts.append(c)
        union = parts[0]
        for p in parts[1:]:
            union = union.unionByName(p)
        union.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
        print(f"{name}: x{copies}, strides {strides}")


if __name__ == "__main__":
    main()
