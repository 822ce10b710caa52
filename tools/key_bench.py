"""Per-key min-of-N micro-bench for optimization work (r18).

The r18 box shows minute-scale noise spikes (a pure-JVM key can read
4 s or 13 s on identical code minutes apart), so single-shot sweep
numbers cannot validate an optimization. This harness times each
requested key N times in one session through the same noop sink as
bench.py and reports min/median — the min is the intrinsic-cost
estimate the round's A/B claims use (both sides measured the same way,
same box). First-run (cold: Catalyst + codegen) and warm times are
reported separately because the driver's sweep pays cold per key.

Usage:
    python tools/key_bench.py [sf_dir] key [key ...] [--reps N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(prog="key_bench.py", allow_abbrev=False)
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    opts = ap.parse_args(argv)

    from imperio_patitas_etl_spark.session import get_spark
    from imperio_patitas_etl_spark.queries import all_queries

    spark = get_spark("key_bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    qs["count_star"](spark, opts.sf_dir).collect()
    spark.range(0, 64, 1, 32).mapInPandas(lambda it: it, "id long").count()

    out: dict[str, dict[str, float]] = {}
    for key in opts.keys:
        ts = []
        for _ in range(opts.reps):
            t0 = time.perf_counter()
            qs[key](spark, opts.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(round(time.perf_counter() - t0, 3))
        # With --reps 1 there is no warm measurement: report null rather
        # than letting the cold (Catalyst+codegen) time masquerade as warm.
        warm = sorted(ts[1:])
        out[key] = {
            "cold": ts[0],
            "warm_min": warm[0] if warm else None,
            "warm_med": warm[len(warm) // 2] if warm else None,
        }
        print(f"{key}\tcold={ts[0]}\twarm={ts[1:]}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
