"""HTTP FeatureCollection sink — the reference's ``this.submit(fc)``
(task.ts:238): each run POSTs the transformed features to the ETL API as a
GeoJSON FeatureCollection.

Spark-first shape: a ``foreachBatch`` function whose batch body posts
per-PARTITION chunks from the executors (``foreachPartition``) — the
feature rows are never collected to the driver, and each POST carries at
most ``max_features_per_post`` features. The reference submits one
FeatureCollection per scheduled run; at scale that single POST becomes the
bottleneck, so the sink shards it while keeping the same payload contract.

Stdlib urllib only; tests drive it against a loopback http.server.
"""

from __future__ import annotations

import json
import urllib.request
from typing import Callable, Iterable, Iterator

from pyspark.sql import DataFrame, Row


def _jsonable(v):
    # timestamps → reference ISO-8601 UTC strings (moment toISOString)
    import datetime as dt

    if isinstance(v, dt.datetime):
        return v.strftime("%Y-%m-%dT%H:%M:%S.") + f"{v.microsecond // 1000:03d}Z"
    if isinstance(v, Row):
        return {k: _jsonable(x) for k, x in v.asDict().items()}
    if isinstance(v, list):
        return [_jsonable(x) for x in v]
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    return v


def row_to_feature(row: Row) -> dict:
    """A features-DF row (pipeline/active911.FEATURES_SCHEMA) → GeoJSON
    Feature dict in the reference's exact shape (task.ts:214-231)."""
    return _jsonable(row)


def post_feature_collection(
    url: str, features: list[dict], timeout: float = 30.0
) -> int:
    """POST one {type: FeatureCollection, features: [...]} body; returns
    the HTTP status. Raises on transport errors (caller isolates)."""
    body = json.dumps({"type": "FeatureCollection", "features": features}).encode(
        "utf-8"
    )
    req = urllib.request.Request(
        url,
        data=body,
        method="POST",
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return resp.status


def _post_rows(url: str, rows: Iterator[Row], chunk: int, timeout: float) -> None:
    buf: list[dict] = []
    for row in rows:
        buf.append(row_to_feature(row))
        if len(buf) >= chunk:
            post_feature_collection(url, buf, timeout)
            buf = []
    if buf:
        post_feature_collection(url, buf, timeout)


def http_sink_foreach_batch(
    url: str, max_features_per_post: int = 1000, timeout: float = 30.0
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` function: executors post their partitions
    in bounded chunks. Usable directly on a batch DataFrame too
    (``fn(df, 0)``) — same duality as the windowing transforms."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.foreachPartition(
            lambda rows: _post_rows(url, rows, max_features_per_post, timeout)
        )

    return sink


def submit_features(
    features_df: DataFrame,
    url: str,
    max_features_per_post: int = 1000,
    timeout: float = 30.0,
) -> None:
    """Batch entry point — the literal ``submit(fc)`` analogue: POST every
    feature of a (batch) features DataFrame."""
    http_sink_foreach_batch(url, max_features_per_post, timeout)(features_df, 0)


def run_to_http(
    stream_df: DataFrame,
    url: str,
    checkpoint_dir: str,
    max_features_per_post: int = 1000,
) -> None:
    """Streaming entry point: AvailableNow micro-batches → HTTP posts,
    batch-atomic via foreachBatch (one logical submit per micro-batch,
    mirroring the reference's one submit per scheduled run)."""
    (
        stream_df.writeStream.foreachBatch(
            http_sink_foreach_batch(url, max_features_per_post)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
