"""X-6 over streams: stateful sliding-window pattern matching via
``applyInPandasWithState``.

The batch form (operators/timeseries.py) uses a rows-frame window; a stream
can't look back across micro-batches with window frames, so state carries
the last WINDOW-1 values per user. Each batch appends its (time-ordered)
events to the tail, recomputes z-normalized correlation against PATTERN for
every complete window, and stores only the tail — state size is
O(users × WINDOW), independent of stream length.
"""

from __future__ import annotations

import math
from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from etl_active911_spark.operators.timeseries import PATTERN, WINDOW

OUTPUT_SCHEMA = "user_id long, event_id long, corr double"
STATE_SCHEMA = "vals array<double>, eids array<long>"

_PAT_SD = math.sqrt(sum(p * p for p in PATTERN) / WINDOW)


def _corr(window_vals: list[float]) -> float | None:
    # mirrors the batch flat formulation term-for-term (same op order →
    # bit-identical floats; the parity test compares exact rounded values):
    # one-pass sd, uncentered dot (Σ PATTERN ≈ 0)
    mean = sum(window_vals, 0.0) / WINDOW
    ssq = sum((v * v for v in window_vals), 0.0)
    var = ssq / WINDOW - mean * mean
    if not var > 0:
        return None
    sd = math.sqrt(var)
    s = 0.0
    for x, p in zip(window_vals, PATTERN):
        s = s + x * p
    return s / (WINDOW * sd * _PAT_SD)


def _match_patterns(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    tail_vals, tail_eids = state.get if state.exists else ([], [])
    tail_vals, tail_eids = list(tail_vals), list(tail_eids)
    out_eids, out_corrs = [], []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for eid, val in zip(pdf["event_id"], pdf["value"]):
            tail_vals.append(float(val))
            tail_eids.append(int(eid))
            if len(tail_vals) > WINDOW:
                tail_vals.pop(0)
                tail_eids.pop(0)
            if len(tail_vals) == WINDOW:
                # threshold on the rounded value, matching the batch body's
                # F.round(...) filter (canonical policy 4) bit-for-bit
                r = _corr(tail_vals)
                if r is not None and abs(round(r, 6)) >= 0.6:
                    out_eids.append(tail_eids[-1])
                    out_corrs.append(round(r, 6))
    state.update((tail_vals[-(WINDOW - 1):], tail_eids[-(WINDOW - 1):]))
    yield pd.DataFrame(
        {"user_id": [user_id] * len(out_eids), "event_id": out_eids, "corr": out_corrs}
    )


def pattern_match_stream(events: DataFrame) -> DataFrame:
    """Streaming X-6: emits (user_id, event_id, corr) whenever the trailing
    WINDOW values of a user correlate with PATTERN at |r| ≥ 0.6."""
    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _match_patterns,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
