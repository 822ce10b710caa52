"""Sinks: warehouse parquet datasets with declared schemas + idempotent
upsert (K1-K7, SURVEY.md §2.2)."""

from imperio_patitas_etl_spark.sinks.warehouse import (  # noqa: F401
    MERGE_KEYS,
    UPDATE_COLS,
    WAREHOUSE_SCHEMAS,
    ParquetWarehouse,
)
