"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet tables, then compares row count, sorted column names,
and an order-insensitive value multiset (floats rounded, timestamps
normalized). Usage:

    python tools/check.py [sf_dir] [key ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
from datetime import date, datetime
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

FLOAT_DECIMALS = 6


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, FLOAT_DECIMALS)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        out.append(tuple(_norm_cell(r[i]) for i in order))
    return sorted(out, key=lambda t: tuple(str(x) for x in t)), [colnames[i] for i in order]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as m
    from imperio_patitas_etl_spark.session import get_spark

    spark = get_spark("check")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = m.queries(), m.oracle_sql()
    failures = []
    n_checked = 0
    for key, fn in sorted(qs.items()):
        if only and key not in only:
            continue
        n_checked += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(key)
            print(f"FAIL {key}: spark error: {e}")
            continue
        if key not in oracles:
            print(f"ok   {key}: rows-only ({len(s_rows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            cur = con.execute(oracles[key])
            d_cols = [d[0] for d in cur.description]
            d_rows = cur.fetchall()
        except Exception as e:
            failures.append(key)
            print(f"FAIL {key}: duckdb error: {e}")
            continue
        s_norm, s_sorted_cols = _normalize(s_rows, s_cols)
        d_norm, d_sorted_cols = _normalize(d_rows, d_cols)
        if s_sorted_cols != d_sorted_cols:
            failures.append(key)
            print(f"FAIL {key}: columns differ spark={s_sorted_cols} duck={d_sorted_cols}")
            continue
        if len(s_norm) != len(d_norm):
            failures.append(key)
            print(f"FAIL {key}: rowcount spark={len(s_norm)} duck={len(d_norm)}")
            continue
        if s_norm != d_norm:
            failures.append(key)
            diff = [(a, b) for a, b in zip(s_norm, d_norm) if a != b][:3]
            print(f"FAIL {key}: values differ; first diffs {diff}")
            continue
        print(f"ok   {key}: {len(s_norm)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{n_checked - len(failures)}/{n_checked} checked queries pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
