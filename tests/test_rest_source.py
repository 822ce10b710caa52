"""Paginated REST source tests (S1 semantics): pagination, termination,
lenient vs fail-fast error handling, declared-schema materialization."""

from __future__ import annotations

import pytest

from pyspark.sql import types as T

from imperio_patitas_etl_spark.sources.rest import PaginatedRestSource


def _fake_api(n_rows: int):
    def fetch(endpoint: str, params: dict) -> dict:
        off, lim = params["offset"], params["limit"]
        items = [{"id": i, "name": f"r{i}"} for i in range(off, min(off + lim, n_rows))]
        return {"items": items}

    return fetch


def test_pagination_and_termination():
    src = PaginatedRestSource(_fake_api(25), page_size=10, delay_s=0)
    rows = src.fetch_all("things.json")
    assert [r["id"] for r in rows] == list(range(25))


def test_empty_first_page():
    src = PaginatedRestSource(_fake_api(0), page_size=10, delay_s=0)
    assert src.fetch_all("things.json") == []


def test_fail_fast_raises():
    def boom(endpoint, params):
        if params["offset"] >= 10:
            raise ConnectionError("502")
        return {"items": [{"id": i} for i in range(10)]}

    with pytest.raises(ConnectionError):
        PaginatedRestSource(boom, page_size=10, delay_s=0).fetch_all("x")


def test_lenient_error_discards_everything():
    """Reference behavior (bsale_client.py:57-63): ANY page error returns
    [] — the rows already fetched are discarded, not returned partially."""

    def boom(endpoint, params):
        if params["offset"] >= 10:
            raise ConnectionError("502")
        return {"items": [{"id": i} for i in range(10)]}

    rows = PaginatedRestSource(boom, page_size=10, delay_s=0, lenient=True).fetch_all("x")
    assert rows == []


def test_short_page_does_not_skip_rows():
    """The offset must advance by rows RECEIVED (bsale_client.py:55): an
    endpoint that returns short-but-non-empty pages yields every row."""

    def short_pages(endpoint, params):
        off = params["offset"]
        # server caps every response at 7 rows regardless of limit=10
        items = [{"id": i} for i in range(off, min(off + 7, 20))]
        return {"items": items}

    src = PaginatedRestSource(short_pages, page_size=10, delay_s=0)
    rows = src.fetch_all("things.json")
    assert [r["id"] for r in rows] == list(range(20))


def test_to_dataframe_declared_schema(spark):
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("name", T.StringType()),
         T.StructField("missing", T.StringType())]
    )
    src = PaginatedRestSource(_fake_api(7), page_size=5, delay_s=0)
    df = src.to_dataframe(spark, "things.json", schema)
    assert df.schema == schema
    assert df.count() == 7
    assert df.filter("missing IS NULL").count() == 7
