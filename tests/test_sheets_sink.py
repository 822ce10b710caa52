"""Sheets mirror egress (sinks/sheets.py) against a recorded API double —
the worksheet-replacement call sequence of sheets_sync.py:24-47, and the
non-fatal wiring through EtlPipeline.mirror_all."""

from __future__ import annotations

from imperio_patitas_etl_spark.sinks.sheets import SheetsMirror


class _FakeWorksheet:
    def __init__(self, title, log):
        self.title = title
        self.log = log

    def update(self, rng, values):
        self.log.append(("update", self.title, rng, values))


class _FakeSpreadsheet:
    """Duck-typed client double implementing the documented contract."""

    def __init__(self, existing=()):
        self.log: list = []
        self.sheets = {t: _FakeWorksheet(t, self.log) for t in existing}

    def worksheet(self, title):
        self.log.append(("worksheet", title))
        if title not in self.sheets:
            raise KeyError(title)
        return self.sheets[title]

    def del_worksheet(self, ws):
        self.log.append(("del_worksheet", ws.title))
        del self.sheets[ws.title]

    def add_worksheet(self, title, rows, cols):
        self.log.append(("add_worksheet", title, rows, cols))
        ws = _FakeWorksheet(title, self.log)
        self.sheets[title] = ws
        return ws


VALUES = [["id", "name"], ["1", "Ana"], ["2", ""]]


def test_creates_worksheet_when_absent():
    sh = _FakeSpreadsheet()
    SheetsMirror(sh).upsert_table("cliente", VALUES)
    assert sh.log == [
        ("worksheet", "cliente"),
        ("add_worksheet", "cliente", len(VALUES) + 10, 2),
        ("update", "cliente", "A1", VALUES),
    ]


def test_recreates_existing_worksheet():
    sh = _FakeSpreadsheet(existing=("cliente",))
    SheetsMirror(sh).upsert_table("cliente", VALUES)
    assert ("del_worksheet", "cliente") in sh.log
    assert sh.log[-1] == ("update", "cliente", "A1", VALUES)


def test_empty_export_is_noop():
    """Header-only (or empty) exports skip the API entirely — the
    reference skips empty tables rather than clearing them
    (sheets_sync.py:29-31)."""
    sh = _FakeSpreadsheet(existing=("cliente",))
    SheetsMirror(sh).upsert_table("cliente", [["id", "name"]])
    SheetsMirror(sh).upsert_table("cliente", [])
    assert sh.log == []


def test_connect_gspread_without_dep_raises():
    """In this environment gspread is absent: the seam must fail loudly
    with the pointer to the duck-typed contract, not an AttributeError
    later."""
    import importlib.util

    import pytest as _pytest

    if importlib.util.find_spec("gspread") is not None:
        _pytest.skip("gspread present; decline path not reachable")
    from imperio_patitas_etl_spark.sinks.sheets import connect_gspread

    with _pytest.raises(ImportError, match="documented contract"):
        connect_gspread("/tmp/creds.json", "sheet-123")


def test_connect_gspread_contract(monkeypatch):
    """Execute the live-connection seam against an injected gspread API
    double (the Delta-branch pattern): service-account auth, open by key,
    and the WorksheetNotFound → KeyError mapping the adapter's duck-typed
    contract requires."""
    import sys
    import types

    log: list = []

    class _WorksheetNotFound(Exception):
        pass

    class _Sheet:
        def worksheet(self, title):
            log.append(("worksheet", title))
            if title == "missing":
                raise _WorksheetNotFound(title)
            return _FakeWorksheet(title, log)

        def del_worksheet(self, ws):
            log.append(("del_worksheet", ws.title))

        def add_worksheet(self, title, rows, cols):
            log.append(("add_worksheet", title, rows, cols))
            return _FakeWorksheet(title, log)

    class _Client:
        def open_by_key(self, key):
            log.append(("open_by_key", key))
            return _Sheet()

    fake = types.ModuleType("gspread")
    fake.service_account = lambda filename: (
        log.append(("service_account", filename)) or _Client()
    )
    fake.exceptions = types.SimpleNamespace(WorksheetNotFound=_WorksheetNotFound)
    monkeypatch.setitem(sys.modules, "gspread", fake)

    from imperio_patitas_etl_spark.sinks.sheets import connect_gspread

    mirror = connect_gspread("/tmp/creds.json", "sheet-123")
    assert log[:2] == [("service_account", "/tmp/creds.json"), ("open_by_key", "sheet-123")]
    # absent worksheet → KeyError (contract mapping), so upsert creates it
    mirror.upsert_table("missing", VALUES)
    assert ("add_worksheet", "missing", len(VALUES) + 10, 2) in log
    # present worksheet → deleted then recreated, wrapped del/add paths run
    log.clear()
    mirror.upsert_table("cliente", VALUES)
    assert [e[0] for e in log] == [
        "worksheet",
        "del_worksheet",
        "add_worksheet",
        "update",
    ]


def test_exporter_plugs_into_pipeline_mirror(spark, tmp_path):
    """End-to-end: warehouse table → stringified export → mirror double,
    via the pipeline's exporter hook; one worksheet per table, and a
    failing sheet stays non-fatal (mirror_all returns False, sync state
    untouched)."""
    from imperio_patitas_etl_spark.plans.pipeline import EtlPipeline
    from imperio_patitas_etl_spark.sinks.warehouse import (
        WAREHOUSE_SCHEMAS,
        ParquetWarehouse,
    )

    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    wh.ensure_all()
    cliente = spark.createDataFrame(
        [(1, "Ana", "Soto", "12345678-9", None, None, None, None)],
        WAREHOUSE_SCHEMAS["cliente"],
    )
    wh.upsert("cliente", cliente)

    sh = _FakeSpreadsheet()
    mirror = SheetsMirror(sh)
    pipeline = EtlPipeline(spark=spark, warehouse=wh, exporter=mirror.exporter())
    assert pipeline.mirror_all() is True
    updates = [e for e in sh.log if e[0] == "update"]
    assert [u[1] for u in updates] == ["cliente"]  # only non-empty tables
    header, first = updates[0][3][0], updates[0][3][1]
    assert header[0] == "id_cliente" and first[0] == "1"
    assert "" in first  # NULL → empty string, stringified contract

    def boom(table, values):
        raise RuntimeError("quota")

    failing = EtlPipeline(spark=spark, warehouse=wh, exporter=boom)
    assert failing.mirror_all() is False  # non-fatal by contract
