"""Sources: parquet table catalog, nested-JSON reader, rate-limited REST."""

from imperio_patitas_etl_spark.sources.parquet import load_table, load_tables

__all__ = ["load_table", "load_tables"]
