"""Streaming form of the X-8 packing family: INCREMENTAL shard assignment
via ``applyInPandasWithState`` — the landing-zone continuation of
``sampling.assign_shards``.

Batch packing is a prefix sum over the whole corpus; a continuously-fed
corpus cannot recompute it per arrival. The streaming form keys state by
``source`` and keeps ONE number per key — the running byte offset — so
each micro-batch extends that source's shard sequence exactly where the
previous batch left off: O(1) state per key, no history buffered, and the
emitted (doc_id → shard_id) assignments never change once emitted
(append-only manifest, the property a training loader needs from a live
corpus feed).

Correctness contract (asserted in tests/test_streaming.py): when
micro-batches arrive in doc_id order per source, the streamed assignment
is IDENTICAL to the batch grouped two-phase prefix sum
(``_two_phase_prefix_sum(group_cols=('source',))``) — the same
batch ≡ stream discipline as the as-of join and the pattern matcher.

Scale note: state parallelism is the number of sources. That is the right
granularity for a landing zone (each source is an independent append
stream with its own shard sequence); a single colossal source would use
sub-source feed partitions as the key, trading one global sequence for
per-partition sequences exactly like the batch operator's range split.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from etl_active911_spark.operators.sampling import TARGET_SHARD_BYTES

PACK_OUTPUT_SCHEMA = (
    "source string, doc_id long, n_bytes long, start_off long, shard_id long"
)
PACK_STATE_SCHEMA = "next_off long"


def _pack_update(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (source,) = key
    off = int(state.get[0]) if state.exists else 0
    chunks = [pdf for pdf in pdfs if len(pdf)]
    rows = (
        pd.concat(chunks, ignore_index=True).sort_values("doc_id")
        if chunks
        else pd.DataFrame(columns=["doc_id", "n_bytes"])
    )
    starts = []
    for n in rows["n_bytes"]:
        starts.append(off)
        off += int(n)
    state.update((off,))
    yield pd.DataFrame(
        {
            "source": [source] * len(rows),
            "doc_id": rows["doc_id"].astype("int64"),
            "n_bytes": rows["n_bytes"].astype("int64"),
            "start_off": pd.Series(starts, dtype="int64"),
            "shard_id": pd.Series(
                [s // TARGET_SHARD_BYTES for s in starts], dtype="int64"
            ),
        }
    )


def shard_assign_stream(docs: DataFrame) -> DataFrame:
    """docs stream with (source, doc_id, text) → append-only
    (source, doc_id, n_bytes, start_off, shard_id) rows; per-source state
    is the single running byte offset."""
    sized = docs.select(
        "source", "doc_id", F.octet_length("text").cast("long").alias("n_bytes")
    )
    return sized.groupBy("source").applyInPandasWithState(
        _pack_update,
        PACK_OUTPUT_SCHEMA,
        PACK_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
