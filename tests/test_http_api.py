"""HTTP trigger surface (api/http.py) driven end-to-end with Flask's test
client over the same fixture pipeline as tests/test_pipeline_e2e.py — the
route surface the reference exposes via FastAPI
(endpoints.py:17-106, scheduler_endpoints.py:19-206)."""

from __future__ import annotations

import pytest

from imperio_patitas_etl_spark.api import create_app
from imperio_patitas_etl_spark.plans.pipeline import EtlPipeline
from imperio_patitas_etl_spark.sinks.warehouse import ParquetWarehouse

from tests.test_pipeline_e2e import (
    CLIENT_SCHEMA,
    COSTS_SCHEMA,
    DOC_SCHEMA,
    PRICE_SCHEMA,
    PRODUCT_SCHEMA,
    RAW_CLIENTS,
    RAW_COSTS,
    RAW_DOCS,
    RAW_PRICES,
    RAW_PRODUCTS,
)


@pytest.fixture()
def client(spark, tmp_path):
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    sources = {
        "clients": lambda: spark.createDataFrame(RAW_CLIENTS, CLIENT_SCHEMA),
        "products": lambda: spark.createDataFrame(RAW_PRODUCTS, PRODUCT_SCHEMA),
        "price_list": lambda: spark.createDataFrame(RAW_PRICES, PRICE_SCHEMA),
        "costs": lambda: spark.createDataFrame(RAW_COSTS, COSTS_SCHEMA),
        "documents": lambda: spark.createDataFrame(RAW_DOCS, DOC_SCHEMA),
    }
    pipeline = EtlPipeline(spark=spark, warehouse=wh, sources=sources)
    app = create_app(pipeline)
    app.config["TESTING"] = True
    return app.test_client(), pipeline


def test_health(client):
    c, _ = client
    r = c.get("/scheduler/health")
    assert r.status_code == 200
    assert r.get_json()["status"] == "healthy"


def test_sync_entity_loads_warehouse(client):
    c, pipeline = client
    r = c.post("/etl/sync/clients")
    assert r.status_code == 200
    assert r.get_json() == {"status": "sincronización completada", "entity": "clients"}
    assert pipeline.warehouse.read("cliente").count() == 2


def test_sync_unknown_entity_404(client):
    c, _ = client
    r = c.post("/etl/sync/nope")
    assert r.status_code == 404
    assert "no encontrada" in r.get_json()["detail"]


def test_sync_all_and_clean_reload(client):
    c, pipeline = client
    assert c.post("/etl/sync/all").status_code == 200
    first = {
        t: pipeline.warehouse.read(t).count()
        for t in ("cliente", "producto", "documento_venta", "detalle_documento")
    }
    assert all(n > 0 for n in first.values())
    # clean-and-reload converges to the same state (truncate + resync)
    assert c.post("/etl/clean-and-reload").status_code == 200
    after = {t: pipeline.warehouse.read(t).count() for t in first}
    assert after == first


def test_sync_documents_start_date_filter(client):
    c, pipeline = client
    # all fixture docs are at epoch ~1700000000 (2023-11); a 2024 cutoff
    # must load zero documents but still 200 (F6 empty-guard, not error)
    r = c.post("/etl/sync/documents?start_date=2024-06-01")
    assert r.status_code == 200
    assert pipeline.warehouse.read("documento_venta").count() == 0


def test_incremental_days_validation(client):
    c, _ = client
    assert c.post("/scheduler/etl/incremental?days=oops").status_code == 400
    # fixture docs are far older than any trailing window → loads nothing,
    # still a success response with the window length echoed
    r = c.post("/scheduler/etl/incremental?days=3")
    assert r.status_code == 200
    body = r.get_json()
    assert body["status"] == "success" and body["days_processed"] == 3


def test_daily_route(client):
    c, pipeline = client
    r = c.post("/scheduler/etl/daily")
    assert r.status_code == 200
    assert r.get_json()["status"] == "success"
    # daily = full sync with trailing doc window: dims load, docs windowed out
    assert pipeline.warehouse.read("cliente").count() == 2
    assert pipeline.warehouse.read("producto").count() > 0


def test_error_maps_to_500(client):
    c, pipeline = client
    pipeline.sources["clients"] = lambda: (_ for _ in ()).throw(RuntimeError("boom"))
    r = c.post("/etl/sync/clients")
    assert r.status_code == 500
    assert "boom" in r.get_json()["detail"]


def test_test_sample_stringified(client):
    c, _ = client
    r = c.get("/scheduler/test-sample?n=2")
    assert r.status_code == 200
    body = r.get_json()
    assert set(body) == {"clients", "products", "price_list", "costs", "documents"}
    assert len(body["clients"]) == 2
    assert all(isinstance(v, str) for v in body["clients"][0].values())


def test_test_sample_n_validation(client):
    """Malformed/negative n is a client error, matching the days route
    (ADVICE r8) — not a 500 from the generic pipeline handler."""
    c, _ = client
    assert c.get("/scheduler/test-sample?n=oops").status_code == 400
    assert c.get("/scheduler/test-sample?n=-1").status_code == 400
