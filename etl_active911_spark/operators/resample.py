"""X-6d: time-series resampling — regularize each user's irregular event
stream onto a fixed 2-hour grid with forward-fill (the preprocessing step
every training pipeline runs before feeding sequence models; pandas
``resample().ffill()`` at cluster scale).

Spark-first: the grid is generated with ``sequence()`` + ``explode`` from
each user's bucket bounds (no driver loop, no UDF), and the fill is the
same union-scan as-of pattern as ``n17_asof_join`` — observations (tag 0)
unioned with grid points (tag 1), ``last(value, ignorenulls)`` over one
key-partitioned window. All timestamp math stays in wall-time NTZ space
(``window()`` bucketing + interval arithmetic), so the result is
session-timezone-independent (CLAUDE.md rule 3).

The DuckDB oracle builds the grid arithmetically (``unnest(range(...))``
over bucket counts — rule 13) and fills via a ranked LEFT JOIN — a
different algorithm, so parity checks semantics, not plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_active911_spark.io import read_table
from etl_active911_spark.plans.registry import query

STEP = "2 hours"
STEP_SEC = 7200


@query(
    "x6_resample_ffill",
    f"""
    WITH bounds AS (
        SELECT user_id,
               time_bucket(INTERVAL '{STEP}', MIN(ts)) AS b0,
               time_bucket(INTERVAL '{STEP}', MAX(ts)) AS b1
        FROM events GROUP BY user_id
    ),
    grid AS (
        SELECT user_id, b0 + k * INTERVAL '{STEP}' AS grid_ts
        FROM (
            SELECT user_id, b0,
                   unnest(range(0, CAST(FLOOR((epoch(b1) - epoch(b0)) / {STEP_SEC}) AS BIGINT) + 1)) AS k
            FROM bounds
        ) t
    ),
    ranked AS (
        SELECT g.user_id, g.grid_ts, o.value,
               ROW_NUMBER() OVER (PARTITION BY g.user_id, g.grid_ts
                                  ORDER BY o.ts DESC, o.event_id DESC) AS rn
        FROM grid g
        LEFT JOIN events o ON o.user_id = g.user_id AND o.ts <= g.grid_ts
    )
    SELECT user_id, grid_ts, ROUND(value, 2) AS value
    FROM ranked WHERE rn = 1
    """,
)
def x6_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6d: per-user 2-hour grid spanning [bucket(min ts), bucket(max ts)],
    each grid point carrying the last observed value at-or-before it
    (same-instant ties resolve to max event_id, exactly like n17). Grid
    points before the first observation keep NULL — the leading gap is
    data, not an error."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    bucket = F.window("ts", STEP)["start"]
    bounds = ev.select("user_id", bucket.alias("b")).groupBy("user_id").agg(
        F.min("b").alias("b0"), F.max("b").alias("b1")
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence("b0", "b1", F.expr(f"INTERVAL {STEP}"))
        ).alias("grid_ts"),
    )
    obs = ev.select(
        "user_id",
        "ts",
        F.lit(0).alias("tag"),
        "event_id",
        "value",
        F.lit(None).cast(grid.schema["grid_ts"].dataType).alias("grid_ts"),
    )
    g = grid.select(
        "user_id",
        F.col("grid_ts").alias("ts"),
        F.lit(1).alias("tag"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("double").alias("value"),
        "grid_ts",
    )
    # (ts, tag, event_id): same-instant observations sort before the grid
    # point and the last one (max event_id) wins — NULL event_ids exist
    # only among tag-1 rows, whose mutual order is irrelevant
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = F.last(
        F.when(F.col("tag") == 0, F.col("value")), ignorenulls=True
    ).over(w)
    return (
        obs.unionByName(g)
        .withColumn("v", filled)
        .filter(F.col("tag") == 1)
        .select("user_id", "grid_ts", F.round("v", 2).alias("value"))
    )
