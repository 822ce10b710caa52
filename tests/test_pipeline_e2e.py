"""End-to-end entity-pipeline tests (SURVEY.md §5.3): Bsale-shaped nested
JSON fixtures → full pipeline → warehouse parquet tables, re-run to prove
upsert idempotence. Fixture cases follow FIXTURES.md §1."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from imperio_patitas_etl_spark.plans.pipeline import EtlPipeline
from imperio_patitas_etl_spark.sinks.warehouse import ParquetWarehouse

CLIENT_SCHEMA = (
    "id long, firstName string, lastName string, code string, email string, "
    "phone string, address string, creationDate long"
)

RAW_CLIENTS = [
    (1, "Ana", "Soto", "12345678-9", "ana@x.cl", "+56 9", "Calle 1", 1700000000),
    (2, "  ", None, None, None, None, None, 1700000000),          # sentinel name → reject
    (3, "Bob", "Rey", "ABC", None, None, None, 1700000000),       # bad RUT → reject
    (4, "Cara", "Paz", None, "not-an-email", None, None, None),   # bad email → warn only
    (None, "Dani", None, None, None, None, None, 1700000000),     # no id → reject
]

PRODUCT_SCHEMA = (
    "product_order long, id long, name string, description string, creationDate long, "
    "variants struct<items: array<struct<id:long, code:string, barCode:string, "
    "state:int, track:boolean>>>"
)

RAW_PRODUCTS = [
    # p1: first variant valid → kept, second never reached
    (0, 1, "Collar", "d1", 1700000000,
     ([(101, "SKU101", "B101", 0, True), (102, "SKU102", None, 0, False)],)),
    # p2: zero variants → dropped by inner explode
    (1, 2, "Vacio", None, 1700000000, ([],)),
    # p3: first variant inactive, second valid → second kept
    (2, 3, "Correa", None, 1700000000,
     ([(301, "SKU301", None, 1, True), (302, "SKU302", None, 0, True)],)),
    # p4: duplicate variant id 101 (already processed) then a valid one
    (3, 4, "Dup", None, 1700000000,
     ([(101, "SKU101", None, 0, True), (401, "SKU401", None, 0, True)],)),
    # p5: variant with no price row → product aborted at that variant
    (4, 5, "SinPrecio", None, 1700000000,
     ([(501, "SKU501", None, 0, True), (502, "SKU502", None, 0, True)],)),
    # p6: missing SKU → invalid, no fallback variant
    (5, 6, "SinSku", None, 1700000000, ([(601, None, None, 0, True)],)),
    # p7: FIRST active variant invalid (no SKU), second valid — the
    # reference breaks on the validation failure (etl_service.py:626-633),
    # so the whole product drops and 702 is never considered
    (6, 7, "PrimeraInvalida", None, 1700000000,
     ([(701, None, None, 0, True), (702, "SKU702", None, 0, True)],)),
]

PRICE_SCHEMA = "variantid long, variantValue double"
RAW_PRICES = [
    (101, 9990.0), (102, 5990.0), (302, 7990.0), (401, 3990.0),
    (502, 1000.0), (601, 2000.0), (701, 1500.0), (702, 1600.0),
    # 501 missing on purpose (price-abort case)
]

COSTS_SCHEMA = (
    "variant_id long, averageCost double, history array<struct<cost:double>>"
)
RAW_COSTS = [
    (101, 4000.0, [(4000.0,)]),        # real history → averageCost
    (302, 3500.0, [(0.0,)]),           # all-zero history → price × 0.65
    (401, None, None),                 # no history → price × 0.65
    (601, 900.0, [(900.0,)]),
]

DOC_SCHEMA = (
    "id long, emissionDate long, number long, client struct<id:long>, "
    "documentType struct<id:long>, netAmount double, taxAmount double, "
    "totalAmount double, details struct<items: array<struct<id:long, "
    "variant:struct<id:long>, quantity:double, netUnitValue:double, "
    "discount:double, netTotal:double>>>"
)

RAW_DOCS = [
    # valid doc, 2 valid lines
    (10, 1700000000, 7, (1,), (5,), 1000.0, 190.0, 1190.0,
     ([(91, (101,), 2.0, 500.0, 0.0, 1000.0), (92, (302,), 1.0, 100.0, 0.0, 100.0)],)),
    # valid doc, zero lines (header survives)
    (11, 1700000500, 8, (None,), (5,), 500.0, 95.0, 595.0, ([],)),
    # negative net → reject header AND its lines never load
    (12, 1700001000, 9, (1,), (5,), -10.0, 0.0, 10.0,
     ([(93, (101,), 1.0, 10.0, 0.0, 10.0)],)),
    # missing emissionDate → reject
    (13, None, 10, (1,), (5,), 10.0, 1.9, 11.9, ([],)),
    # valid doc with one bad line (qty 0) and one good line
    (14, 1700002000, 11, (2,), (5,), 300.0, 57.0, 357.0,
     ([(94, (401,), 0.0, 10.0, 0.0, 0.0), (95, (401,), 3.0, 100.0, 0.0, 300.0)],)),
]


@pytest.fixture()
def pipeline(spark, tmp_path):
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    sources = {
        "clients": lambda: spark.createDataFrame(RAW_CLIENTS, CLIENT_SCHEMA),
        "products": lambda: spark.createDataFrame(RAW_PRODUCTS, PRODUCT_SCHEMA),
        "price_list": lambda: spark.createDataFrame(RAW_PRICES, PRICE_SCHEMA),
        "costs": lambda: spark.createDataFrame(RAW_COSTS, COSTS_SCHEMA),
        "documents": lambda: spark.createDataFrame(RAW_DOCS, DOC_SCHEMA),
    }
    return EtlPipeline(spark=spark, warehouse=wh, sources=sources)


def test_sync_clients(pipeline):
    assert pipeline.sync_clients() == 2
    rows = {r["id_cliente"]: r for r in pipeline.warehouse.read("cliente").collect()}
    assert set(rows) == {1, 4}
    assert rows[1]["rut"] == "12345678-9"
    assert rows[4]["email"] == "not-an-email"  # warned, not dropped
    assert rows[4]["fecha_creacion"] is None


def test_sync_products_branches(pipeline):
    pipeline.sync_products()
    rows = {r["id_producto"]: r for r in pipeline.warehouse.read("producto").collect()}
    # p1 → 101 (first active), p3 → 302 (first ACTIVE), p4 → 401
    # (101 deduped), p5 → nothing (price abort), p6 → nothing (no SKU),
    # p2 → nothing (no variants), p7 → nothing (first active variant
    # invalid drops the product; 702 never reached — reference break)
    assert set(rows) == {101, 302, 401}
    assert rows[101]["costo_neto"] == 4000.0          # real history → averageCost
    assert rows[302]["costo_neto"] == round(7990.0 * 0.65, 6)  # zero history
    assert rows[401]["costo_neto"] == round(3990.0 * 0.65, 6)  # no history row
    assert rows[101]["controla_stock"] == 1
    assert rows[101]["estado"] == 1


def test_sync_documents_headers_and_lines(pipeline):
    pipeline.sync_documents()
    docs = {r["id_documento"] for r in pipeline.warehouse.read("documento_venta").collect()}
    assert docs == {10, 11, 14}  # 12 negative net, 13 no emission date
    lines = {r["id_detalle"]: r for r in pipeline.warehouse.read("detalle_documento").collect()}
    assert set(lines) == {91, 92, 95}  # 93 under rejected doc, 94 qty≤0
    # dangling FK allowed: doc 11 has NULL id_cliente
    hdr = {r["id_documento"]: r for r in pipeline.warehouse.read("documento_venta").collect()}
    assert hdr[11]["id_cliente"] is None


def test_sync_all_idempotent(pipeline):
    pipeline.sync("all")
    snap1 = {
        t: sorted(map(tuple, pipeline.warehouse.read(t).collect()))
        for t in ("cliente", "producto", "documento_venta", "detalle_documento")
    }
    pipeline.sync("all")  # re-run: upsert must be a no-op
    snap2 = {
        t: sorted(map(tuple, pipeline.warehouse.read(t).collect()))
        for t in ("cliente", "producto", "documento_venta", "detalle_documento")
    }
    assert snap1 == snap2


def test_clean_and_reload(pipeline):
    pipeline.sync("all")
    pipeline.clean_and_reload()
    assert pipeline.warehouse.read("cliente").count() == 2


def test_incremental_date_filter(pipeline, spark):
    # cutoff after doc 10/11 but before 14 → only 14 re-synced
    pipeline.sync_documents(start_date="2023-11-14")
    docs = {r["id_documento"] for r in pipeline.warehouse.read("documento_venta").collect()}
    # 1700002000 = 2023-11-14T22:46:40Z ≥ 2023-11-14; 1700000000/1700000500
    # are also 2023-11-14 UTC — all pass
    assert docs == {10, 11, 14}
    pipeline.sync_documents(start_date="2023-11-15")
    docs2 = {r["id_documento"] for r in pipeline.warehouse.read("documento_venta").collect()}
    assert docs2 == {10, 11, 14}  # upsert: earlier rows persist


def test_report(pipeline):
    pipeline.sync("all")
    rep = {r["entity"]: (r["valid"], r["invalid"]) for r in pipeline.report().collect()}
    assert rep["cliente"] == (2, 3)
    assert rep["documento_venta"] == (3, 2)
    assert rep["detalle_documento"] == (3, 1)


def test_column_subset_update_documento(pipeline, spark):
    """documento MERGE updates only id_cliente/monto_* on match
    (etl_service.py:452-457): folio changes in the source must NOT
    overwrite the stored folio."""
    pipeline.sync_documents()
    wh = pipeline.warehouse
    changed = wh.read("documento_venta").filter(F.col("id_documento") == 10).select(
        "id_documento",
        F.lit(999).cast("long").alias("id_cliente"),
        "id_tipo_documento",
        F.lit(12345).cast("long").alias("folio"),
        "fecha_emision",
        F.lit(2000.0).alias("monto_neto"),
        "monto_iva",
        "monto_total",
        "fecha_creacion",
    )
    wh.upsert("documento_venta", changed)
    row = wh.read("documento_venta").filter(F.col("id_documento") == 10).first()
    assert row["id_cliente"] == 999      # updated column
    assert row["monto_neto"] == 2000.0   # updated column
    assert row["folio"] == 7             # NOT in update set → target wins
