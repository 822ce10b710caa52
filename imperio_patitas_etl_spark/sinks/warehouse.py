"""Warehouse sink (K1-K7, SURVEY.md §2.2): the 4 warehouse tables as
managed parquet datasets with declared schemas and idempotent upsert.

The reference loads into BigQuery — streaming inserts (bigquery_client.py:
28-43), batched MERGE SQL (etl_service.py:252-293), DELETE+INSERT fallback
(:296-325), DELETE WHERE TRUE truncate (endpoints.py:29-32), and
ensure-table DDL (bigquery_client.py:58-133). Here the same operations are
DataFrame writes against a parquet directory layout:

- schemas are declared ``StructType``s (never inferred at the sink);
- ``upsert`` is one shuffle by the merge key (latest-wins over
  target ∪ source), then an atomic directory swap — the plain-parquet
  equivalent of a transactional MERGE. When delta-spark is installed the
  same call routes to a real ``MERGE INTO`` (operators/upsert.py);
- writes default to snappy parquet; at 100 TB the tables would be
  date-partitioned (``partition_cols``) so incremental upserts rewrite only
  the touched partitions and readers prune by date.

The atomic swap (write to ``_tmp`` + rename) mirrors what a table format's
commit protocol gives for free; it keeps readers from ever observing a
half-written table in plain-parquet mode.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from imperio_patitas_etl_spark.operators.upsert import (
    delete_insert,
    upsert_latest_wins,
)

#: Warehouse schemas — exact mapping of bigquery_client.py:80-128
#: (INTEGER→long, STRING→string, FLOAT→double, TIMESTAMP→timestamp).
WAREHOUSE_SCHEMAS: dict[str, T.StructType] = {
    "cliente": T.StructType(
        [
            T.StructField("id_cliente", T.LongType(), nullable=False),
            T.StructField("nombre", T.StringType()),
            T.StructField("apellido", T.StringType()),
            T.StructField("rut", T.StringType()),
            T.StructField("email", T.StringType()),
            T.StructField("telefono", T.StringType()),
            T.StructField("direccion", T.StringType()),
            T.StructField("fecha_creacion", T.TimestampType()),
        ]
    ),
    "producto": T.StructType(
        [
            T.StructField("id_producto", T.LongType(), nullable=False),
            T.StructField("nombre", T.StringType()),
            T.StructField("descripcion", T.StringType()),
            T.StructField("codigo_sku", T.StringType()),
            T.StructField("codigo_barras", T.StringType()),
            T.StructField("controla_stock", T.IntegerType()),
            T.StructField("precio_neto", T.DoubleType()),
            T.StructField("costo_neto", T.DoubleType()),
            T.StructField("estado", T.IntegerType()),
            T.StructField("fecha_creacion", T.TimestampType()),
        ]
    ),
    "documento_venta": T.StructType(
        [
            T.StructField("id_documento", T.LongType(), nullable=False),
            T.StructField("id_cliente", T.LongType()),
            T.StructField("id_tipo_documento", T.LongType()),
            T.StructField("folio", T.LongType()),
            T.StructField("fecha_emision", T.TimestampType()),
            T.StructField("monto_neto", T.DoubleType()),
            T.StructField("monto_iva", T.DoubleType()),
            T.StructField("monto_total", T.DoubleType()),
            T.StructField("fecha_creacion", T.TimestampType()),
        ]
    ),
    "detalle_documento": T.StructType(
        [
            T.StructField("id_detalle", T.LongType(), nullable=False),
            T.StructField("id_documento", T.LongType()),
            T.StructField("id_producto", T.LongType()),
            T.StructField("cantidad", T.DoubleType()),
            T.StructField("precio_neto_unitario", T.DoubleType()),
            T.StructField("descuento_porcentual", T.DoubleType()),
            T.StructField("monto_total_linea", T.DoubleType()),
            T.StructField("fecha_creacion", T.TimestampType()),
        ]
    ),
}

#: Merge key per table (etl_service.py:358,400,451,488).
MERGE_KEYS = {
    "cliente": "id_cliente",
    "producto": "id_producto",
    "documento_venta": "id_documento",
    "detalle_documento": "id_detalle",
}

#: Column-subset MERGE updates: documento_venta updates only these on match
#: (etl_service.py:452-457); None ⇒ update all columns.
UPDATE_COLS: dict[str, list[str] | None] = {
    "cliente": None,
    "producto": None,
    "documento_venta": ["id_cliente", "monto_neto", "monto_iva", "monto_total"],
    "detalle_documento": None,
}


class ParquetWarehouse:
    """The 4-table warehouse rooted at a directory, one parquet dataset per
    table. All mutating operations end in an atomic swap so a concurrent
    reader sees either the old or the new table, never a partial write."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        p = self.path(table)
        return os.path.isdir(p) and any(
            f.endswith(".parquet") or f == "_SUCCESS" for f in os.listdir(p)
        )

    # -- K6: DDL / ensure-table ------------------------------------------
    def ensure_table(self, table: str) -> None:
        """Create the table with its declared schema iff missing
        (bigquery_client.py:58-73)."""
        if not self.exists(table):
            empty = self.spark.createDataFrame([], WAREHOUSE_SCHEMAS[table])
            empty.write.mode("overwrite").parquet(self.path(table))

    def ensure_all(self) -> None:
        """Called at every sync start (etl_service.py:511,555,657)."""
        for t in WAREHOUSE_SCHEMAS:
            self.ensure_table(t)

    def read(self, table: str) -> DataFrame:
        self.ensure_table(table)
        # read with declared schema: empty datasets keep exact types
        return self.spark.read.schema(WAREHOUSE_SCHEMAS[table]).parquet(self.path(table))

    def _conform(self, table: str, df: DataFrame) -> DataFrame:
        """Cast/reorder the incoming frame to the declared schema — the
        sink-side analog of the reference's fixed column lists in its MERGE
        builders (etl_service.py:328-503)."""
        schema = WAREHOUSE_SCHEMAS[table]
        return df.select(
            *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
        )

    def _swap_in(self, table: str, df: DataFrame) -> None:
        """Materialize ``df`` then atomically replace the table directory.

        The tmp-write is required even for plain overwrite: ``df`` may read
        from the very directory being replaced (upsert reads target), and
        Spark's lazy evaluation would otherwise clobber its own input.
        """
        tmp = self.path(table) + "_tmp"
        df.write.mode("overwrite").parquet(tmp)
        final = self.path(table)
        if os.path.isdir(final):
            shutil.rmtree(final)
        os.rename(tmp, final)

    # -- K1: append -------------------------------------------------------
    def append(self, table: str, df: DataFrame) -> None:
        """Streaming-insert analog (bigquery_client.py:28-43)."""
        self.ensure_table(table)
        self._conform(table, df).write.mode("append").parquet(self.path(table))

    # -- K4: truncate / overwrite ----------------------------------------
    def overwrite(self, table: str, df: DataFrame) -> None:
        self._swap_in(table, self._conform(table, df))

    def truncate(self, table: str) -> None:
        """DELETE ... WHERE TRUE (endpoints.py:29-32)."""
        empty = self.spark.createDataFrame([], WAREHOUSE_SCHEMAS[table])
        self._swap_in(table, empty)

    def truncate_all(self) -> None:
        for t in WAREHOUSE_SCHEMAS:
            self.truncate(t)

    # -- K2 (+K3 fallback semantics): upsert ------------------------------
    def upsert(self, table: str, source: DataFrame) -> None:
        """MERGE ON key: matched → UPDATE (column subset per UPDATE_COLS),
        not matched → INSERT. Idempotent — re-running with the same source
        yields the same table (the reference's whole incremental story
        hinges on this, scheduler_endpoints.py:71-125).

        Tries a real Delta ``MERGE INTO`` first (operators/upsert.py:
        merge_into_delta); plain-parquet mode computes latest-wins and swaps.
        """
        self.ensure_table(table)
        key = MERGE_KEYS[table]
        src = self._conform(table, source)
        from imperio_patitas_etl_spark.operators.upsert import merge_into_delta

        if merge_into_delta(self.spark, self.path(table), src, key):
            return
        merged = upsert_latest_wins(self.read(table), src, key, UPDATE_COLS[table])
        self._swap_in(table, merged)

    # -- K3: delete+insert ------------------------------------------------
    def delete_and_insert(self, table: str, source: DataFrame) -> None:
        """The reference's MERGE fallback (etl_service.py:296-325)."""
        self.ensure_table(table)
        src = self._conform(table, source)
        self._swap_in(table, delete_insert(self.read(table), src, MERGE_KEYS[table]))

    # -- K5: full-refresh export (Sheets analog) --------------------------
    def export_stringified(self, table: str) -> list[list[str]]:
        """Sheets mirror: header row + every cell stringified with '' for
        NULL (sheets_sync.py:24-47). Driver-side egress — only sane for
        small dims; errors here must stay non-fatal to the sync
        (etl_service.py:737-741), which is the caller's contract."""
        df = self.read(table)
        header = list(df.columns)
        body = [
            ["" if v is None else str(v) for v in row]
            for row in df.collect()
        ]
        return [header] + body

    # -- K7: raw SQL ------------------------------------------------------
    def sql(self, query: str) -> DataFrame:
        """Run SQL against the warehouse tables registered as temp views."""
        for t in WAREHOUSE_SCHEMAS:
            self.read(t).createOrReplaceTempView(t)
        return self.spark.sql(query)
