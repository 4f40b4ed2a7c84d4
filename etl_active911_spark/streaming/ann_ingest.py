"""Streaming ANN ingest (X-3, r10 — VERDICT r09 item 6).

The live-index regime ``x3_ann_ivf_add`` reports on, as an actual stream:
new / re-ingested vectors arrive in micro-batches, each batch is assigned
to the index's FIXED centroids (``operators.similarity.argmax_cells`` —
the same body the registered batch query ``x3_ann_stream_ingest`` folds
over the full corpus), and the per-vector assignment is maintained by the
keyed upsert sink (``streaming.jobs.upsert_sink``, last-write-wins on
vec_id) so a re-ingested vector MOVES cells instead of double-counting.
Per-cell occupancy is then one groupBy over the sink table.

Composition, not new machinery: IVF add assignment + the N-14/O-7 upsert
sink + the batch≡stream parity harness
(tests/test_streaming.py::test_ann_ingest_stream_matches_batch).

Scale shape: per micro-batch, one batch-sized scan × broadcast bounded
centroid table + a vec_id-keyed argmax window; the sink rewrites only the
hash buckets the batch's keys touch. Centroid REFITS stay a batch job
(``x3_ann_ivf_lloyd1``) — the stream never mutates centroids, matching
how production ANN services separate serving-path adds from rebuilds.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

from etl_active911_spark.operators.similarity import argmax_cells
from etl_active911_spark.streaming.jobs import upsert_sink

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession


def ann_ingest_sink(seeds: "DataFrame", out_dir: str, n_buckets: int = 8):
    """foreachBatch body: assign the micro-batch to the fixed centroids,
    upsert per-vector rows (vec_id, cell, cos) into the bucketed sink."""
    base = upsert_sink(out_dir, "vec_id", n_buckets)

    def sink(batch_df: "DataFrame", batch_id: int) -> None:
        base(argmax_cells(batch_df, seeds), batch_id)

    return sink


def run_ann_ingest_stream(
    stream_vectors: "DataFrame",
    seeds: "DataFrame",
    out_dir: str,
    checkpoint_dir: str,
    n_buckets: int = 8,
) -> None:
    """Drain all available micro-batches of (vec_id, embedding) rows into
    the assignment table. Idempotent per (checkpoint, batch_id) like every
    upsert-sink job; re-running after more files land continues from the
    checkpoint."""
    (
        stream_vectors.writeStream.foreachBatch(
            ann_ingest_sink(seeds, out_dir, n_buckets)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def cell_occupancy(spark: "SparkSession", out_dir: str) -> "DataFrame":
    """Per-cell occupancy of the live assignment table: (cell, n_vectors,
    mean_cos) — the maintainer's view after any number of ingests."""
    t = spark.read.parquet(out_dir)
    return t.groupBy("cell").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.round(F.sum("cos") / F.count(F.lit(1)), 6).alias("mean_cos"),
    )
