"""Sharded sessionization ≡ plain sessionization ≡ a pure-Python oracle.

The chain case matters most: a session that stays active across SEVERAL
shard boundaries (events every 20 min, 1-hour shards) must stitch through
a chain of boundary merges, which the summary-level gaps-and-islands pass
handles by construction.
"""

from __future__ import annotations

from datetime import datetime, timezone

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from imperio_patitas_etl_spark.operators.sessionize import (
    sessionize,
    sessionize_sharded,
)

GAP_US = 30 * 60 * 1_000_000
HOUR_US = 3600 * 1_000_000


def _mk_events(spark, rows):
    # rows: (event_id, user_id, minute)
    data = [
        (eid, datetime(2024, 1, 1, m // 60, m % 60, tzinfo=timezone.utc), uid)
        for eid, uid, m in rows
    ]
    return spark.createDataFrame(data, "event_id long, ts timestamp, user_id long")


def _python_sessions(rows, gap_min=30):
    by_user = {}
    for eid, uid, m in rows:
        by_user.setdefault(uid, []).append((m, eid))
    out = {}
    for uid, evs in by_user.items():
        evs.sort()
        no = 0
        prev = None
        for m, _ in evs:
            if prev is None or m - prev >= gap_min:
                no += 1
                out[(uid, no)] = [0, m, m]
            out[(uid, no)][0] += 1
            out[(uid, no)][2] = m
            prev = m
    return {k: tuple(v) for k, v in out.items()}


def _collect(df):
    return {
        (r.user_id, r.session_no): (
            r.n_events,
            r.first_ts.hour * 60 + r.first_ts.minute,
            r.last_ts.hour * 60 + r.last_ts.minute,
        )
        for r in df.collect()
    }


def test_session_chain_across_many_shards(spark):
    # one user, events every 20 min for 4 hours: ONE session spanning 5
    # hourly shards — the boundary stitch must chain
    rows = [(i, 1, 20 * i) for i in range(13)]
    ev = _mk_events(spark, rows)
    plain = _collect(sessionize(ev, GAP_US))
    sharded = _collect(sessionize_sharded(ev, GAP_US, HOUR_US))
    assert plain == sharded == {(1, 1): (13, 0, 240)}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=999),  # event_id (dedup'd below)
            st.integers(min_value=1, max_value=3),    # user_id
            st.integers(min_value=0, max_value=600),  # minute over 10 h
        ),
        min_size=1,
        max_size=25,
        unique_by=lambda r: r[0],
    )
)
def test_sharded_equals_plain_equals_oracle(spark, rows):
    ev = _mk_events(spark, rows)
    expected_counts = {
        k: v[0] for k, v in _python_sessions(rows).items()
    }
    plain = _collect(sessionize(ev, GAP_US))
    sharded = _collect(sessionize_sharded(ev, GAP_US, HOUR_US))
    assert plain == sharded
    assert {k: v[0] for k, v in plain.items()} == expected_counts
