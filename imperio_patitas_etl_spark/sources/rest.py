"""Rate-limited paginated REST source (S1-S3, SURVEY.md §2.1).

The reference extracts via offset pagination — 100 rows/page, 0.2 s sleep
between pages, empty page terminates, ``[]`` on any HTTP error
(bsale_client.py:35-65, a silent-data-loss foot-gun) — plus per-row
secondary lookups (the N+1 pattern, etl_service.py:589,600).

Spark design decisions:

- extraction stays **driver-side**: the bottleneck is the remote API's rate
  limit, not compute, so distributing the HTTP calls buys nothing and
  multiplies failure modes. The driver materializes pages into an Arrow
  -backed DataFrame and everything downstream is distributed;
- the N+1 per-row lookups DISAPPEAR: bulk-load the price/cost endpoints
  once each and broadcast-join (operators/joins.py:broadcast_lookup);
- error handling is explicit (SURVEY.md §7 hard-part 3): ``lenient=True``
  reproduces the reference exactly — ANY page error discards every
  accumulated row and returns ``[]`` (bsale_client.py:57-63); the default
  raises on the first failed page so partial extracts can't masquerade as
  complete (or as empty);
- ``fetch`` is injectable (any ``(endpoint, params) -> dict``), which keeps
  the source testable without network and lets production plug in auth,
  retries, and real rate-limit backoff.

For a fully declarative form, Spark 4's Python DataSource API could wrap
this as ``spark.read.format("paginated-rest")``; that buys nothing here
because pagination is inherently sequential — the driver loop IS the
physical plan.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FetchFn = Callable[[str, dict], dict | None]


class PaginatedRestSource:
    """Offset-paginated collection reader with a fixed inter-page delay."""

    def __init__(
        self,
        fetch: FetchFn,
        page_size: int = 100,
        delay_s: float = 0.2,
        lenient: bool = False,
        max_pages: int | None = None,
    ):
        self.fetch = fetch
        self.page_size = page_size
        self.delay_s = delay_s
        self.lenient = lenient
        self.max_pages = max_pages

    def fetch_all(self, endpoint: str, params: dict | None = None) -> list[dict]:
        """All pages of ``endpoint`` (bsale_client.py:35-65 semantics:
        ``limit``/``offset`` params, empty ``items`` page terminates)."""
        rows: list[dict] = []
        offset, page = 0, 0
        while self.max_pages is None or page < self.max_pages:
            q = dict(params or {})
            q.update({"limit": self.page_size, "offset": offset})
            try:
                payload = self.fetch(endpoint, q)
            except Exception:
                if self.lenient:
                    # reference behavior (bsale_client.py:57-63): any error
                    # discards ALL accumulated rows and yields an empty
                    # extract — silent but total, never partial
                    return []
                raise
            items = (payload or {}).get("items") or []
            if not items:
                break
            rows.extend(items)
            # advance by rows RECEIVED (bsale_client.py:55), not by
            # page_size: a short-but-non-empty page must not skip rows
            offset += len(items)
            page += 1
            if self.delay_s:
                time.sleep(self.delay_s)
        return rows

    def to_dataframe(
        self,
        spark: SparkSession,
        endpoint: str,
        schema: T.StructType,
        params: dict | None = None,
    ) -> DataFrame:
        """Materialize an endpoint as a DataFrame with a DECLARED schema —
        source JSON is dynamically typed (dict.get with defaults everywhere
        in the reference), so inference is forbidden at this boundary."""
        rows = self.fetch_all(endpoint, params)
        return spark.createDataFrame(
            [tuple(r.get(f.name) for f in schema.fields) for r in rows], schema
        )
