"""N-18: slowly-changing-dimension (SCD type 2) build — compress a keyed
event stream into effective-dated dimension rows: one row per state RUN
(consecutive identical states collapse), with [valid_from, valid_to) ranges
and an is_current flag. This is the batch half of every warehouse's
dimension pipeline; the keyed upsert sink (streaming/jobs.py) is the
incremental half.

Gaps-and-islands on one key-partitioned window: mark run starts via LAG,
keep start rows, close each range with LEAD. Two window passes over ONE
shuffle on the key (both windows share the user_id partitioning — Spark
reuses the exchange+sort). No joins, no self-aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_active911_spark.io import read_table
from etl_active911_spark.plans.registry import query


@query(
    "n18_scd2_intervals",
    """
    WITH ordered AS (
        SELECT user_id, ts, event_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_state
        FROM events
    ),
    starts AS (
        SELECT user_id, event_type AS state, ts AS valid_from, event_id
        FROM ordered
        WHERE prev_state IS NULL OR prev_state <> event_type
    )
    SELECT user_id, state, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from, event_id) AS valid_to,
           LEAD(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from, event_id) IS NULL AS is_current
    FROM starts
    """,
)
def n18_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-18: each user's event_type stream → effective-dated state rows.
    Ties at identical timestamps order by event_id in BOTH engines, so run
    boundaries are deterministic."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    starts = (
        ev.withColumn("prev_state", F.lag("event_type").over(wo))
        .filter(
            F.col("prev_state").isNull()
            | (F.col("prev_state") != F.col("event_type"))
        )
        .select(
            "user_id",
            F.col("event_type").alias("state"),
            F.col("ts").alias("valid_from"),
            "event_id",
        )
    )
    wv = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    valid_to = F.lead("valid_from").over(wv)
    return starts.select(
        "user_id",
        "state",
        "valid_from",
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )
