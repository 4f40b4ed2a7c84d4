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


# ---------------------------------------------------------------------------
# N-11 (r11): watermark planner — out-of-orderness accounting
# ---------------------------------------------------------------------------

#: candidate watermark delays (seconds) to cost out
WM_GRID = (10, 60, 300, 3600)
#: synthesized ingest-delay window (seconds): the fixture's event_id order
#: IS event-time order (zero measured lateness — a degenerate dial), so a
#: deterministic per-event network delay hash(event_id) % WM_DELAY_MAX is
#: added to form the ARRIVAL sequence, the standard delay model and the
#: same clean-fixture injection idiom as x4_unicode_anomaly
WM_DELAY_MAX = 600


def _wm_oracle() -> str:
    from etl_active911_spark.operators.dedup import sql_hash60

    h = sql_hash60("CAST(event_id AS STRING)")
    return f"""
    WITH arr AS (
        SELECT event_id, ts,
               ts + to_seconds(CAST(({h}) % {WM_DELAY_MAX} AS BIGINT))
                   AS arrival
        FROM events
    ),
    lat AS (
        SELECT ts,
               MAX(ts) OVER (ORDER BY arrival, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS seen
        FROM arr
    ),
    d AS (
        SELECT CASE WHEN seen IS NULL OR seen <= ts THEN 0
                    ELSE date_diff('microsecond', ts, seen) // 1000000
               END AS late_s
        FROM lat
    ),
    grid AS (SELECT unnest([{", ".join(str(g) for g in WM_GRID)}]) AS delay_s)
    SELECT CAST(g.delay_s AS BIGINT) AS delay_s,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN d.late_s > g.delay_s THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dropped,
           CAST((2 * SUM(CASE WHEN d.late_s > g.delay_s THEN 1 ELSE 0 END)
                 * 1000000 + COUNT(*)) // (2 * COUNT(*)) AS BIGINT)
               / 1000000.0 AS drop_rate
    FROM grid g CROSS JOIN d
    GROUP BY g.delay_s
    """


@query("n11_watermark_planner", _wm_oracle())
def n11_watermark_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-11 (r11): WATERMARK PLANNER — the design dial every streaming
    job sets blind: for each candidate ``withWatermark`` delay, how many
    events would arrive LATER than it and be dropped from stateful
    aggregation? Lateness of an event = how far the maximum event time
    already ingested has run ahead of it when it arrives — exactly the
    quantity Spark's global watermark tracks. Arrival order is the event
    time plus a deterministic hash(event_id) %% WM_DELAY_MAX seconds network
    delay (the fixture's ingest order is perfectly time-sorted, which
    would read 0 at every delay — injection note on ``WM_DELAY_MAX``).
    The output table (delay → dropped count + micro-exact drop rate) is
    read directly against an SLA: pick the smallest delay whose drop
    rate clears it, instead of folklore defaults.

    Determinism: the delay is the rule-10 cross-engine md5 hash; tie
    order is (arrival, event_id) with unique event_id; lateness is an
    exact integer-microsecond difference floored to seconds; the rate is
    the rule-26b half-up micro division; all timestamps stay NTZ
    (ordering and date_trunc are session-independent, rule 3).

    Scale shape: the global running max is computed TWO-PHASE, never as
    one unpartitioned window over the corpus: (1) slice = date_trunc
    hour of arrival, per-slice MAX(ts) via hash aggregate; (2) a running
    max over the slice summaries (one row per hour — tiny); (3) the
    per-event prefix max WITHIN its slice (window partitioned by slice)
    merged with the broadcast prior-slice max. The grid fan-out is a
    4-row literal explode into one hash aggregate. Same discipline as
    the x8 prefix-sum family (SCALE.md invariant 9)."""
    from pyspark.sql import Window

    from etl_active911_spark.io import spread
    from etl_active911_spark.operators.dedup import token_hash60
    from etl_active911_spark.plans.cache import scoped_persist

    # spread BEFORE the per-row md5 (rule 2: single-file fixture = one
    # partition), keyed by event_id so downstream keyed work reuses it
    ev = spread(
        read_table(spark, sf_dir, "events").select("event_id", "ts"),
        "event_id",
    )
    delay = token_hash60(F.col("event_id").cast("string")) % WM_DELAY_MAX
    # arr feeds BOTH the slice-max (broadcast) leg and the probe leg — a
    # broadcast self-join re-evaluates the subtree per side (rule 18), so
    # the hashed-arrival pass is persisted once (rule 17)
    arr = scoped_persist(
        "n11_watermark_planner.arr",
        ev.select(
            "event_id",
            "ts",
            (
                F.col("ts")
                + F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), delay)
            ).alias("arrival"),
        ).withColumn("slice", F.date_trunc("hour", F.col("arrival"))),
    )
    smax = arr.groupBy("slice").agg(F.max("ts").alias("smax"))
    ws = Window.orderBy("slice").rowsBetween(Window.unboundedPreceding, -1)
    prev = smax.select("slice", F.max("smax").over(ws).alias("prev_max"))
    wrow = (
        Window.partitionBy("slice")
        .orderBy("arrival", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    j = (
        arr.join(F.broadcast(prev), "slice")
        .withColumn("inb", F.max("ts").over(wrow))
        .withColumn("seen", F.greatest("prev_max", "inb"))
    )
    late_s = F.when(
        F.col("seen").isNull() | (F.col("seen") <= F.col("ts")), F.lit(0)
    ).otherwise(
        F.floor(
            F.expr("timestampdiff(MICROSECOND, ts, seen)") / F.lit(1000000)
        )
    )
    d = j.select(late_s.cast("bigint").alias("late_s"))
    grid = F.explode(
        F.array(*[F.lit(g) for g in WM_GRID])
    ).alias("delay_s")
    agg = (
        d.select("late_s", grid)
        .groupBy("delay_s")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.when(F.col("late_s") > F.col("delay_s"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_dropped"),
        )
    )
    return agg.select(
        F.col("delay_s").cast("bigint").alias("delay_s"),
        "n_events",
        "n_dropped",
        (
            F.expr(
                "CAST((2 * n_dropped * 1000000 + n_events)"
                " div (2 * n_events) AS BIGINT)"
            ).cast("double")
            / 1000000.0
        ).alias("drop_rate"),
    )
