"""Custom stateful streaming operator: ``applyInPandasWithState``.

The built-in windows (streaming/events.py) cover time-bucketed state; this
module is the escape hatch for state machines Spark has no operator for.
``running_user_totals`` keeps one (count, sum) state row per user across
micro-batches and emits the updated totals every time the user appears — a
minimal but complete example of the GroupState API (binary state, update
mode, per-key Arrow batches) that a real feature-store accumulator or
per-entity CDC reconciler would follow.

Scale notes: state lives in the state store partitioned by the grouping
key — one shuffle per micro-batch on user_id; state size is O(distinct
users), independent of event volume. For unbounded key spaces add a
timeout (``GroupStateTimeout.ProcessingTimeTimeout``) and drop idle keys.

Not SQL-expressible as one query (state spans micro-batches), so this is
exercised by tests/test_stateful.py rather than a DuckDB oracle: the
stream's final per-user totals must equal the batch groupBy on the same
input.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, v double"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (event count, value sum) across micro-batches."""

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, v = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            v += float(pdf["value"].sum())
        state.update((n, v))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(v, 2)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
