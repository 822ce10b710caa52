"""Candidate-count audit for ``ngram_jaccard_dedup`` (VERDICT r15 item 1).

The BASELINE.md 10×-data table shows the key at 7.5× wall sf0.1→sf1 — the
largest superlinear row. This probe decides whether that growth is
PLAN-INDUCED (a loose prefix filter admitting avoidable candidates) or
DATA-INTRINSIC (the corpus's duplicate/shingle-frequency structure
genuinely produces superlinearly many candidate pairs that any lossless
AllPairs/PPJoin index must at least enumerate).

Per scale factor it instruments every stage of the pipeline in
``queries/text._pairs_from_shingled``:

  n_docs          documents
  n_postings      exploded (doc, shingle) postings
  n_prefix        postings surviving the rare-first prefix cut
                  (rn ≤ n/2 + 1)
  cand_bound      Σ_(lang,tok) C(prefix_df, 2) — the equi-join's raw
                  pair output BEFORE the PPJoin positional bound; the
                  theoretical floor for ANY prefix-index plan with this
                  prefix length and token order
  n_cand_pos      candidate pairs after the positional bound
                  (pre-dedup — actual rows the join emits downstream)
  n_cand          distinct candidate pairs entering the verify join
  n_pairs         verified pairs (jaccard ≥ 0.5) — the result size

Interpretation: if n_cand grows ~like cand_bound and cand_bound grows
superlinearly, the growth is data-intrinsic (the filter is already at
the AllPairs floor); if n_cand_pos ≫ cand-floor or verify admits a
vanishing fraction, the plan has slack to tighten.

Usage: python tools/ngram_candidate_probe.py [sf_dir ...]
(default: sf0.01, sf0.1, /tmp/sf1). Prints one JSON line per sf_dir.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_DIRS = (
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
    "/tmp/sf1",
)


def probe(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from imperio_patitas_etl_spark.queries.text import (
        JACCARD_T3,
        _shingled,
    )

    t0 = time.time()
    s = _shingled(spark, sf_dir).localCheckpoint()
    n_docs = s.count()
    ex = s.select(
        "doc_id",
        "lang",
        F.size("shingles").alias("n_sh"),
        F.explode("shingles").alias("tok"),
    )
    n_postings = ex.count()
    freq = ex.groupBy("lang", "tok").agg(F.count("*").alias("df"))
    pw = Window.partitionBy("doc_id").orderBy("df", "tok")
    pref = (
        ex.join(freq, ["lang", "tok"])
        .withColumn("rn", F.row_number().over(pw))
        .filter(F.expr("rn <= n_sh div 2 + 1"))
        .select("doc_id", "lang", "tok", "rn", "n_sh")
    ).localCheckpoint()
    n_prefix = pref.count()
    # the raw equi-join floor: per (lang, tok), C(prefix_df, 2) pairs
    # F.sum over zero rows is NULL — a corpus of <3-token docs has an
    # empty prefix set and must report 0, not crash int(None)
    cand_bound = (
        pref.groupBy("lang", "tok")
        .agg(F.count("*").alias("pdf"))
        .agg(F.sum(F.expr("pdf * (pdf - 1) div 2")).alias("cb"))
        .first()["cb"]
    ) or 0
    a = pref.alias("a")
    b = pref.alias("b")
    pos_ok = (
        F.lit(1)
        + F.least(
            F.col("a.n_sh") - F.col("a.rn"), F.col("b.n_sh") - F.col("b.rn")
        )
    ) >= F.expr("(a.n_sh + b.n_sh + 2) div 3")
    joined = a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.tok") == F.col("b.tok"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    n_cand_pos = joined.filter(pos_ok).count()
    cand = (
        joined.filter(pos_ok)
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .dropDuplicates()
    ).localCheckpoint()
    n_cand = cand.count()
    docs = s.select("doc_id", "shingles")
    sh_a = docs.select(
        F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")
    )
    sh_b = docs.select(
        F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")
    )
    n_pairs = (
        cand.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .select(
            F.size(F.array_intersect("sh_a", "sh_b")).cast("long").alias(
                "n_inter"
            ),
            F.size("sh_a").cast("long").alias("n_a"),
            F.size("sh_b").cast("long").alias("n_b"),
        )
        .filter(F.expr(JACCARD_T3))
        .count()
    )
    return {
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "n_postings": n_postings,
        "n_prefix": n_prefix,
        "cand_bound": int(cand_bound),
        "n_cand_pos": n_cand_pos,
        "n_cand": n_cand,
        "n_pairs": n_pairs,
        "probe_sec": round(time.time() - t0, 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser(
        prog="ngram_candidate_probe.py",
        allow_abbrev=False,
        description=(
            "Instrument the AllPairs candidate pipeline stage counts per "
            "sf_dir; prints one JSON line each."
        ),
    )
    ap.add_argument(
        "sf_dirs",
        nargs="*",
        default=None,
        help=f"scale-point directories (default: {' '.join(DEFAULT_DIRS)}; "
        "explicitly-passed directories must exist, default ones are "
        "skipped with a note when absent)",
    )
    args = ap.parse_args()
    if args.sf_dirs:
        for d in args.sf_dirs:
            if not os.path.isdir(d):
                ap.error(f"no such sf_dir: {d}")
        dirs = list(args.sf_dirs)
    else:
        dirs = list(DEFAULT_DIRS)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for d in dirs:
        if not os.path.isdir(d):
            print(json.dumps({"sf_dir": d, "skipped": "missing"}))
            continue
        print(json.dumps(probe(spark, d)))
    spark.stop()


if __name__ == "__main__":
    main()
