"""Streaming form of N-17 (as-of join) via ``applyInPandasWithState``:
per-key state is just the LATEST purchase seen (id, value, ts); each click
in a micro-batch emits enriched with that state. This is the canonical
temporal-join state layout — O(1) per key, no buffered stream history —
and the reason the as-of operator scales where a buffered stream-stream
range join would not.

Like the streaming pattern matcher, correctness assumes micro-batches
arrive in event-time order (file source ordered by modification time);
batch≡stream parity with the registered ``n17_asof_join`` body is
asserted in tests/test_streaming.py on exactly that arrangement.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, click_id long, purchase_id long, last_value double"
STATE_SCHEMA = "p_id long, p_val double, p_ts timestamp"


def _asof_update(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    p_id, p_val = (state.get[0], state.get[1]) if state.exists else (None, None)
    p_ts = state.get[2] if state.exists else None
    chunks = [pdf for pdf in pdfs if len(pdf)]
    rows = (
        pd.concat(chunks, ignore_index=True).sort_values(["ts", "tag", "event_id"])
        if chunks
        else pd.DataFrame(columns=["ts", "tag", "event_id", "value"])
    )
    clicks, pids, vals = [], [], []
    for r in rows.itertuples():
        if r.tag == 0:  # purchase: advance state
            p_id, p_val, p_ts = int(r.event_id), float(r.value), r.ts
        else:  # click: emit current as-of state (same tie rule as batch:
            # a same-instant purchase sorts first, so it is visible here)
            clicks.append(int(r.event_id))
            pids.append(p_id)
            vals.append(None if p_val is None else round(p_val, 2))
    state.update((p_id, p_val, p_ts))
    yield pd.DataFrame(
        {
            "user_id": [user_id] * len(clicks),
            "click_id": clicks,
            "purchase_id": pids,
            "last_value": vals,
        }
    )


def asof_join_stream(events: DataFrame) -> DataFrame:
    """events stream (click/purchase rows with TIMESTAMP ts) → enriched
    clicks. State per user: one (purchase_id, value, ts) triple."""
    tagged = events.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "ts",
        F.when(F.col("event_type") == "purchase", 0).otherwise(1).alias("tag"),
        "event_id",
        "value",
    )
    return tagged.groupBy("user_id").applyInPandasWithState(
        _asof_update,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
