"""Streaming curation ingest (X-9, r10): the curation pipeline as a
continuously-fed job — per micro-batch, the IDENTICAL Gopher quality gate
the batch pipeline runs (``textual.gopher_stats``, factored for arbitrary
frames), then cross-batch EXACT dedup by content hash through the keyed
upsert sink (last-writer-wins: a re-sent document replaces its earlier
copy instead of double-counting — the landing-zone behavior a crawler
feed needs).

Composition, not new machinery: the X-4 gate + the O-7/N-14 upsert sink;
batch ≡ stream pinned in
tests/test_streaming.py::test_curation_ingest_stream_matches_batch, and
the batch fold is the registered oracle query ``x9_stream_curation``.

Scale shape: the gate is per-doc aggregates over the micro-batch (two
doc_id-keyed explode aggregates); the sink rewrites only the hash buckets
the batch touches. Quality thresholds are corpus-independent constants,
so gating per batch is EXACTLY the batch semantics — no cross-batch state
beyond the sink's keys.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_active911_spark.operators.dedup import normalized_text
from etl_active911_spark.streaming.jobs import upsert_sink

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession


def _gated_rows(batch_df: "DataFrame") -> "DataFrame":
    """(h, doc_id, source, n_words) for the batch's quality-passing docs,
    pre-collapsed to ONE row per content hash (last-wins by doc_id) so
    the upsert key is unique within the batch."""
    from etl_active911_spark.operators.textual import gopher_stats

    st = gopher_stats(batch_df.select("doc_id", "text"))
    kept = batch_df.join(
        st.filter(F.col("keep")).select("doc_id", "n_words"), "doc_id"
    ).select(
        F.sha2(normalized_text(F.col("text")), 256).alias("h"),
        "doc_id",
        "source",
        "n_words",
    )
    w = Window.partitionBy("h").orderBy(F.col("doc_id").desc())
    return kept.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    ).drop("rn")


def curation_sink(out_dir: str, n_buckets: int = 8):
    """foreachBatch body: gate the micro-batch, upsert kept docs by
    content hash (re-ingested content replaces its earlier row)."""
    base = upsert_sink(out_dir, "h", n_buckets)

    def sink(batch_df: "DataFrame", batch_id: int) -> None:
        base(_gated_rows(batch_df), batch_id)

    return sink


def run_curation_ingest_stream(
    stream_docs: "DataFrame",
    out_dir: str,
    checkpoint_dir: str,
    n_buckets: int = 8,
) -> None:
    """Drain all available micro-batches of (doc_id, source, text) rows
    into the curated, content-deduped landing table."""
    (
        stream_docs.writeStream.foreachBatch(curation_sink(out_dir, n_buckets))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def curated_report(spark: "SparkSession", out_dir: str) -> "DataFrame":
    """Per-source survival report over the landing table — the streaming
    twin of the ``x9_stream_curation`` batch fold's output."""
    t = spark.read.parquet(out_dir)
    return t.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("total_words"),
    )
