"""Event-time windowing operators (N-11/N-12, SURVEY.md §2.5).

Each transform is written against a plain DataFrame so the *same function*
serves batch (oracle-checked below) and Structured Streaming (wired in
streaming/jobs.py with ``readStream`` + watermark; parity asserted in
tests/test_streaming.py). This batch/stream duality is the Spark-native
rendering of the reference's overlapping 6-hour pull windows
(task.ts:134-135): recomputation-safe, dedup-by-key, event-time driven.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_active911_spark.io import read_table
from etl_active911_spark.plans.registry import query


def tumbling_counts(events: DataFrame) -> DataFrame:
    """15-minute tumbling windows per event_type: count + sum(value)."""
    return (
        events.groupBy(
            F.window("ts", "15 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(events: DataFrame) -> DataFrame:
    """1-hour windows sliding every 15 minutes (each event lands in 4)."""
    return (
        events.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session_counts(events: DataFrame) -> DataFrame:
    """30-minute-gap session windows per user: start = first event,
    end = last event + gap (Spark session_window semantics)."""
    return (
        events.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "n11_tumbling_window",
    """
    SELECT time_bucket(INTERVAL '15 minutes', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def n11_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-11: tumbling event-time windows (epoch-aligned, = time_bucket)."""
    return tumbling_counts(read_table(spark, sf_dir, "events"))


@query(
    "n11_sliding_window",
    """
    SELECT time_bucket(INTERVAL '15 minutes', ts) - (o.k * INTERVAL '15 minutes')
               AS window_start,
           COUNT(*) AS n_events
    FROM events, (SELECT UNNEST([0, 1, 2, 3]) AS k) o
    GROUP BY 1
    """,
)
def n11_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-11: sliding windows — each event contributes to 4 overlapping
    1-hour windows; oracle replicates via the shift-and-bucket identity."""
    return sliding_counts(read_table(spark, sf_dir, "events"))


@query(
    "n12_session_window",
    """
    WITH gaps AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         >= INTERVAL '30 minutes'
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS is_new_session
        FROM events
    ),
    sessions AS (
        SELECT *, SUM(is_new_session) OVER (PARTITION BY user_id ORDER BY ts
                                            ROWS UNBOUNDED PRECEDING) AS session_no
        FROM gaps
    )
    SELECT user_id, MIN(ts) AS session_start,
           COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
    FROM sessions GROUP BY user_id, session_no
    """,
)
def n12_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-12: 30-minute-gap session windows vs the classic gaps-and-islands
    SQL (lag + cumulative sum) — pinning Spark's session_window start
    semantics (start = first event in session)."""
    return session_counts(read_table(spark, sf_dir, "events"))


@query(
    "n12_stateful_dedup",
    """
    SELECT user_id, event_type, COUNT(*) AS n_kept
    FROM (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type,
                                  time_bucket(INTERVAL '1 hour', ts)
                                  ORDER BY ts, event_id) AS rn
        FROM events
    )
    WHERE rn = 1
    GROUP BY user_id, event_type
    """,
)
def n12_stateful_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-12: keyed dedup within an event-time horizon — the batch analogue
    of ``dropDuplicatesWithinWatermark`` (first event per key per hour),
    which is exactly how the reference's overlapping 6-hour re-pulls
    (task.ts:134-135) dedup alerts by id at the sink."""
    events = read_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy(
        "user_id", "event_type", F.window("ts", "1 hour")
    ).orderBy("ts", "event_id")
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )


TRENDING_K = 3


def trending_counts(events: DataFrame) -> DataFrame:
    """Shared batch/stream BODY of the trending operator: 1-hour tumbling
    counts per (window, event_type). This aggregation is the streaming
    half — the per-window rank happens AFTER window finalization (rank is
    not a streaming-supported operator, and semantically a window's
    trending list is only meaningful once the watermark closes it)."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def rank_trending(counts: DataFrame, k: int = TRENDING_K) -> DataFrame:
    """Finalized window counts → top-k per window with the canonical
    deterministic tie-break (count DESC, event_type ASC). In streaming
    this runs per finalized batch (foreachBatch / on the sink table)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), F.col("event_type")
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
    )


@query(
    "n11_trending_topk",
    f"""
    WITH c AS (
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
               event_type, CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1, 2
    )
    SELECT window_start, event_type, n_events, CAST(rnk AS INT) AS rnk FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY window_start
                                     ORDER BY n_events DESC, event_type) AS rnk
        FROM c
    ) t WHERE rnk <= {TRENDING_K}
    """,
)
def n11_trending_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-11 (r6): per-window TRENDING top-k — the classic streaming
    analytics shape (dashboard 'top event types this hour'): tumbling
    window counts, then top-{TRENDING_K} per window. The windowed count
    is the watermark-able streaming aggregation (``trending_counts``,
    shared body); the rank runs on finalized windows (``rank_trending``)
    — batch ≡ stream parity asserted in tests/test_streaming.py with an
    append-mode AvailableNow run. Per-window rank rides the
    WindowGroupLimit pushdown; window keys are bounded (hours × types),
    so the final rank never funnels the corpus."""
    ev = read_table(spark, sf_dir, "events")
    return rank_trending(
        trending_counts(ev).withColumn(
            "n_events", F.col("n_events").cast("bigint")
        )
    )
