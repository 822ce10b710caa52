"""Fixture tests for batch sessionization and TF vectorization.

Sessionization is pinned on hand-computed event times (gap exactly AT the
30-minute threshold starts a new session — the ≥ convention shared with
``session_window``); TF vectorization on a corpus where the vocabulary
rank has count ties, which must break by token so term ids are
deterministic.
"""

from __future__ import annotations

from datetime import datetime

from imperio_patitas_etl_spark.queries.streaming_ops import q_sessionize_events
from imperio_patitas_etl_spark.queries.text import q_tf_vectorize


def _ts(minute: int) -> datetime:
    return datetime(2024, 1, 1, minute // 60, minute % 60)


def test_sessionize_hand_computed(spark, tmp_path):
    rows = [
        # user 1: events at 0, 29, 59 min → one session (gaps 29, 30? no:
        # 29 and 30 — the 59-min event is exactly 30 min after 29 → NEW
        # session by the ≥ convention. So sessions {0,29} and {59}.
        (0, _ts(0), 1, "click", 1.0, "{}"),
        (1, _ts(29), 1, "click", 1.0, "{}"),
        (2, _ts(59), 1, "click", 1.0, "{}"),
        # user 2: single event → single session
        (3, _ts(10), 2, "view", 1.0, "{}"),
        # user 1 again much later → third session
        (4, _ts(200), 1, "click", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    out = {
        (r.user_id, r.session_no): (r.n_events, r.first_ts, r.last_ts)
        for r in q_sessionize_events(spark, str(tmp_path)).collect()
    }
    assert out == {
        (1, 1): (2, _ts(0), _ts(29)),
        (1, 2): (1, _ts(59), _ts(59)),
        (1, 3): (1, _ts(200), _ts(200)),
        (2, 1): (1, _ts(10), _ts(10)),
    }


def test_tf_vocab_ties_break_by_token(spark, tmp_path):
    docs = [
        (1, "en", "src", "b a b a", 7),   # a:2 b:2 — tied counts
        (2, "en", "src", "c a", 3),       # a:3 total, b:2, c:1
    ]
    spark.createDataFrame(
        docs, "doc_id long, lang string, source string, text string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = {(r.doc_id, r.term_id): r.tf for r in q_tf_vectorize(spark, str(tmp_path)).collect()}
    # global counts: a=3, b=2, c=1 → ids a=0, b=1, c=2
    assert out == {
        (1, 0): 2, (1, 1): 2,
        (2, 0): 1, (2, 2): 1,
    }
