"""Structured Streaming jobs (SURVEY.md §7 Phase 3).

The reference's ingestion model — scheduled pull of an overlapping 6-hour
window, one batched submit per run (task.ts:81,134-135,238) — maps to:
file/readStream source → event-time watermark → windowed aggregation or
keyed dedup → ``foreachBatch`` sink (batch-atomic, like the single
FeatureCollection submit). ``Trigger.AvailableNow`` gives the same
catch-up-then-stop behavior as a scheduled Lambda run.

The transform bodies are shared with batch (streaming/windows.py), so the
oracle-checked batch results ARE the streaming results — asserted by the
parity tests in tests/test_streaming.py.
"""

from __future__ import annotations

import os

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_active911_spark.streaming.windows import tumbling_counts

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """File-based micro-batch source over a directory of parquet parts.

    At scale this is the landing zone written by the ingestion tier; new
    files become micro-batches. ``maxFilesPerTrigger`` bounds batch size.
    """
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(events_dir)
    )


def windowed_counts_stream(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """N-11 streaming: watermarked tumbling counts. Late rows beyond the
    watermark are dropped; state is bounded by watermark horizon."""
    return tumbling_counts(events.withWatermark("ts", watermark))


def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """N-12 streaming: keyed dedup within the watermark horizon — the
    streaming analogue of the reference's overlapping-window re-pull dedup
    (alert ids resubmitted within 6h collapse to one feature)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_to_parquet(
    stream_df: DataFrame, out_dir: str, checkpoint_dir: str, mode: str = "append"
) -> None:
    """O-7 analogue: batch-atomic sink via foreachBatch (one 'submit' per
    micro-batch, mirroring task.ts:238's single FeatureCollection POST)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode(mode).parquet(os.path.join(out_dir, f"batch={batch_id}"))

    (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def run_complete_to_memory(stream_df: DataFrame, name: str) -> None:
    """Test helper: run an aggregation stream to a memory sink in complete
    mode with AvailableNow (process-everything-then-stop)."""
    (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def run_control_stream(
    spark: SparkSession,
    submit_url: str,
    checkpoint_dir: str,
    source_options: dict | None = None,
    max_features_per_post: int = 1000,
) -> None:
    """The reference's COMPLETE lifecycle (task.ts:98-243) as ONE streaming
    job: authenticated windowed source pulls → dead-letter routing →
    alert→Feature transform → deduplicated FeatureCollection POSTs.

    Mapping, stage by stage:
    - source: the ``active911`` streaming reader (one partition per agency,
      window pushed into the fetch) — task.ts:124-148;
    - error routing: ``_error`` rows are diverted, not fatal — task.ts:123;
    - transform: ``to_features`` (zero-shuffle array-native links);
    - dedup: overlapping pull windows re-emit alerts; stable feature ids
      collapse them per micro-batch before the POST — the TAK sink
      semantics of task.ts:238;
    - sink: per-partition chunked FeatureCollection POSTs (streaming/
      http_sink.py), batch-atomic via foreachBatch.
    """
    from etl_active911_spark.pipeline.active911 import to_features
    from etl_active911_spark.sources import active911_source
    from etl_active911_spark.streaming.http_sink import http_sink_foreach_batch

    active911_source.register(spark)
    reader = spark.readStream.format("active911")
    for k, v in (source_options or {}).items():
        reader = reader.option(k, v)
    alerts = reader.load()
    post = http_sink_foreach_batch(submit_url, max_features_per_post)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        good = batch_df.filter(F.col("_error").isNull())
        features = to_features(good.drop("agency_id", "_error")).dropDuplicates(["id"])
        post(features, batch_id)

    (
        alerts.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def run_upsert_to_parquet(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    key_col: str,
    n_buckets: int = 8,
) -> None:
    """MERGE-style keyed upsert sink via foreachBatch: last-write-wins per
    key across micro-batches, materialized as a hash-bucketed parquet table.

    Each micro-batch rewrites ONLY the bucket directories its keys hash
    into (read-modify-replace of affected buckets; untouched buckets keep
    their files) — the partition-overwrite trick that stands in for a real
    MERGE INTO on plain parquet. At 100 TB, n_buckets scales with key
    cardinality so a rewrite touches data proportional to the batch, not
    the table; swapping this sink for Delta/Iceberg MERGE changes nothing
    upstream. Idempotent per (checkpoint, batch_id): replaying a batch
    rewrites the same buckets to the same state — exercised by the
    crash/restart test in tests/test_streaming.py.
    """
    (
        stream_df.writeStream.foreachBatch(upsert_sink(out_dir, key_col, n_buckets))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def upsert_sink(out_dir: str, key_col: str, n_buckets: int = 8):
    """The foreachBatch body of ``run_upsert_to_parquet``, exposed so tests
    can wrap it (e.g. crash injection between batches)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        spark = batch_df.sparkSession
        batch = batch_df.withColumn(
            "__bucket", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")
        )
        touched = [r["__bucket"] for r in batch.select("__bucket").distinct().collect()]
        if not touched:
            return
        try:
            existing = spark.read.parquet(out_dir).filter(
                F.col("__bucket").isin(touched)
            )
            # last-write-wins: keys present in this batch replace old rows
            keep = existing.join(
                batch.select(F.col(key_col)).distinct(), key_col, "left_anti"
            )
            merged = keep.unionByName(batch)
        except AnalysisException as e:
            # ONLY path-not-found means "first batch: nothing materialized
            # yet". Any other read failure (transient FS error, corrupt
            # footer, permissions) must abort the batch — treating it as
            # first-batch would dynamic-overwrite the touched buckets with
            # batch-only rows and silently drop stored keys (ADVICE r02).
            if "PATH_NOT_FOUND" not in str(e.getErrorClass() or "") and not isinstance(
                getattr(e, "cause", None), FileNotFoundError
            ):
                raise
            merged = batch
        merged = merged.localCheckpoint(eager=True)  # cut self-referencing lineage
        (
            merged.write.mode("overwrite")
            .partitionBy("__bucket")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(out_dir)
        )

    return sink
