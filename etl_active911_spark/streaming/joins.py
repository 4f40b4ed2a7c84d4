"""N-14: stream-stream joins (the last big Structured Streaming surface):
event-time range join between two event streams with watermarks.

The batch body (registered as ``n14_stream_stream_join``) and the streaming
form share one join builder, so the driver's DuckDB oracle checks the exact
semantics the stream executes; batch/stream parity is asserted in
tests/test_streaming.py. In a stream-stream inner join Spark buffers both
sides in state; the watermark + the time-range condition bound that state —
each click can only match purchases up to 30 minutes later, so rows older
than (watermark - 30 min) are evicted. At 100 TB/day the state size is
O(rate × window), independent of stream history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_active911_spark.io import read_table
from etl_active911_spark.plans.registry import query

ATTRIBUTION_WINDOW = "30 minutes"


def _split_roles(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value"),
    )
    return clicks, purchases


def _attribution_join(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """Shared body: purchases attributed to a same-user click within the
    attribution window. Output carries no timestamps (CLAUDE.md rule 3)."""
    cond = (
        (F.col("c_user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {ATTRIBUTION_WINDOW}"))
    )
    return clicks.join(purchases, cond).select(
        F.col("c_user_id").alias("user_id"),
        "click_id",
        "purchase_id",
        F.round("value", 2).alias("purchase_value"),
    )


@query(
    "n14_stream_stream_join",
    """
    SELECT a.user_id, a.event_id AS click_id, b.event_id AS purchase_id,
           ROUND(b.value, 2) AS purchase_value
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'click' AND b.event_type = 'purchase'
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL '30 minutes'
    """,
)
def n14_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-14 batch body: click→purchase attribution range join. In batch
    this is a plain range-bounded equi-join on user_id (the equi key
    carries the shuffle; the time range is a post-join filter Catalyst
    keeps in the join condition)."""
    clicks, purchases = _split_roles(read_table(spark, sf_dir, "events"))
    return _attribution_join(clicks, purchases)


def attribution_stream(clicks: DataFrame, purchases: DataFrame,
                       watermark: str = "1 hour") -> DataFrame:
    """Streaming form: both sides watermarked; the time-range condition
    lets Spark bound the join state (clicks evict once the purchase-side
    watermark passes click_ts + window)."""
    return _attribution_join(
        clicks.withWatermark("click_ts", watermark),
        purchases.withWatermark("purchase_ts", watermark),
    )


@query(
    "n14_stream_static_join",
    """
    SELECT e.event_id, e.user_id, c.c_mktsegment AS segment,
           ROUND(e.value, 2) AS value
    FROM events e JOIN customer c ON c.c_custkey = e.user_id + 1
    WHERE e.event_type = 'purchase'
    """,
)
def n14_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-14b batch body: dimension enrichment — purchases joined to the
    (static) customer dim. In the streaming form the dim is the broadcast
    build side of every micro-batch join; no state store is involved, so
    this is the cheap join flavor (vs the stateful stream-stream join
    above) and the one to prefer whenever one side is slowly-changing."""
    events = read_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    customer = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        events.join(
            F.broadcast(customer), F.col("c_custkey") == F.col("user_id") + 1
        ).select(
            "event_id",
            "user_id",
            F.col("c_mktsegment").alias("segment"),
            F.round("value", 2).alias("value"),
        )
    )


def enrichment_stream(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Streaming form of n14_stream_static_join: stream-static broadcast
    join, stateless (the dim is re-broadcast per micro-batch, picking up
    slowly-changing updates for free)."""
    return (
        events.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(customer), F.col("c_custkey") == F.col("user_id") + 1)
        .select(
            "event_id",
            "user_id",
            F.col("c_mktsegment").alias("segment"),
            F.round("value", 2).alias("value"),
        )
    )


@query(
    "n14_stream_stream_left_join",
    """
    SELECT a.user_id, a.event_id AS click_id, b.event_id AS purchase_id,
           ROUND(b.value, 2) AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') a
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL '30 minutes'
    """,
)
def n14_stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-14c batch body: LEFT OUTER click→purchase attribution — clicks
    with no purchase inside the window survive with NULL purchase
    columns (the conversion-funnel denominator an inner join silently
    drops). In the streaming form this is the semantically interesting
    outer join: Spark can only emit the NULL row once the watermark
    proves no matching purchase can still arrive — the null side of an
    outer stream-stream join is generated AT STATE EVICTION, so outer
    results trail the watermark horizon (asserted end-to-end in
    tests/test_streaming.py)."""
    clicks, purchases = _split_roles(read_table(spark, sf_dir, "events"))
    cond = (
        (F.col("c_user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {ATTRIBUTION_WINDOW}"))
    )
    return clicks.join(purchases, cond, "left").select(
        F.col("c_user_id").alias("user_id"),
        "click_id",
        "purchase_id",
        F.round("value", 2).alias("purchase_value"),
    )


def attribution_stream_outer(clicks: DataFrame, purchases: DataFrame,
                             watermark: str = "1 hour") -> DataFrame:
    """Streaming form of the LEFT OUTER attribution join: both sides
    watermarked; unmatched clicks are emitted with NULLs only when the
    purchase-side watermark passes click_ts + window (state eviction is
    what generates the null row)."""
    c = clicks.withWatermark("click_ts", watermark)
    p = purchases.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("c_user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {ATTRIBUTION_WINDOW}"))
    )
    return c.join(p, cond, "leftOuter").select(
        F.col("c_user_id").alias("user_id"),
        "click_id",
        "purchase_id",
        F.round("value", 2).alias("purchase_value"),
    )
