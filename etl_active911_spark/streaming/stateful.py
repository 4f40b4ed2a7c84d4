"""Custom stateful streaming operator via ``applyInPandasWithState``
(N-12 extension; the "custom stateful operator" path the built-in window
aggregations can't express).

Keeps per-user running statistics (event count, value sum, last event time)
across micro-batches; every batch emits the updated totals per user seen in
that batch. State lives in the state store keyed by user_id, bounded by
``GroupStateTimeout`` in production (left to NoTimeout here — the fixture
stream is finite).
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, last_ts timestamp"
STATE_SCHEMA = "n_events long, total_value double, last_ts timestamp"


def _update_user_stats(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, last_ts = state.get
    else:
        n, total, last_ts = 0, 0.0, None
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        last_ts = batch_max if last_ts is None else max(last_ts, batch_max)
    state.update((n, total, last_ts))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total], "last_ts": [last_ts]}
    )


def user_running_stats(events: DataFrame) -> DataFrame:
    """Stateful per-user running stats over a stream (or a batch DataFrame
    in tests via the same grouping — streaming path exercised in
    tests/test_streaming.py)."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
