"""Delimited / JSON-lines file sources (SURVEY.md §2.1 "another source
format": the landing formats an ingest tier actually receives before the
warehouse converts them to parquet).

Design rules, in order of importance at 100 TB:

- **Explicit schema always.** Schema inference is a full extra pass over
  the data (and a different result per sample) — both readers REQUIRE a
  schema string, so the scan is single-pass and the contract is pinned
  in code.
- **Corrupt rows are data, not exceptions.** PERMISSIVE mode with a
  declared ``_corrupt_record`` column routes unparseable lines into the
  frame; ``split_corrupt`` partitions them off so the pipeline can land
  good rows and quarantine bad ones in one pass (the reference's
  lenient-mode foot-gun — discard everything on any error — inverted
  into an auditable quarantine).
- **CSV needs its escape hatches declared** (header, quoting, nullValue)
  — defaults differ across producers and silent coercion is how bad
  data enters a warehouse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: str) -> str:
    return f"{schema}, {CORRUPT_COL} string"


def load_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    sep: str = ",",
    null_value: str = "",
) -> DataFrame:
    """CSV scan with declared schema + quarantine column. PERMISSIVE:
    a malformed line yields NULLs for the data columns and the raw line
    in ``_corrupt_record`` instead of failing the job (FAILFAST) or
    silently vanishing (DROPMALFORMED)."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("header", header)
        .option("sep", sep)
        .option("nullValue", null_value)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def load_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """JSON-lines scan with declared schema + quarantine column — the
    interchange format crawl/annotation pipelines deliver."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good_rows_without_quarantine_col, quarantined_full_rows).

    The parsed frame is CACHED first — Spark refuses to re-derive the
    internal corrupt column through a pruned re-scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN; the parse
    result must be materialized before corrupt-only predicates), and
    one materialized parse feeding both branches is also the efficient
    plan. At 100 TB "cache" becomes "write the parsed landing table,
    then split" — same shape, durable storage instead of executor
    memory. The quarantine branch keeps the FULL row (data columns
    NULL, raw line in ``_corrupt_record``) — what replay wants."""
    df = df.cache()
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    return good, bad
