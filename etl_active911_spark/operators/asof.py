"""N-17: as-of (point-in-time) join — the time-series operator Spark has
no native keyword for (kdb ``aj``, Flink temporal join, pandas
``merge_asof``). Each left row (click) is enriched with the most recent
right row (purchase) at-or-before its event time, per key.

Spark-first realization: NOT a range join (whose candidate set per click
is unbounded and explodes at scale) but the union-scan trick — tag both
sides, union, and run ``last(value, ignorenulls=True)`` over a
(key)-partitioned window ordered by (ts, tag). That is ONE shuffle on the
join key followed by an in-partition sort: the same plan a native as-of
join would pick, state bounded by the window frame, no pairwise blowup.
The right side is pre-deduped to one row per (key, ts) — max event_id
wins — so tie behavior is deterministic and engine-independent.

The DuckDB oracle is deliberately a DIFFERENT algorithm (correlated
MAX-subquery lookup), so parity checks semantics, not a shared plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_active911_spark.io import read_table
from etl_active911_spark.plans.registry import query

_PURCHASES_CTE = """
    purchases AS (
        SELECT user_id, ts, event_id AS purchase_id, value FROM (
            SELECT user_id, ts, event_id, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                      ORDER BY event_id DESC) AS rn
            FROM events WHERE event_type = 'purchase'
        ) d WHERE rn = 1
    ),
    clicks AS (
        SELECT user_id, event_id AS click_id, ts
        FROM events WHERE event_type = 'click'
    )
"""


def _tagged_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases (tag 0) unioned with clicks (tag 1). No pre-dedup pass:
    the main window orders by (ts, tag, event_id), so ``last()`` already
    resolves same-(user, ts) purchase ties to the max event_id — the same
    rule the oracle's ROW_NUMBER dedup encodes — without spending a second
    shuffle on a (user_id, ts)-partitioned window."""
    ev = read_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(0).alias("tag"),
        F.col("event_id").alias("purchase_id"),
        "value",
        F.lit(None).cast("long").alias("click_id"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(1).alias("tag"),
        F.lit(None).cast("long").alias("purchase_id"),
        F.lit(None).cast("double").alias("value"),
        F.col("event_id").alias("click_id"),
    )
    return purchases.unionByName(clicks)


def asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared body: each click row carries the as-of purchase id/value/ts
    (NULLs when no purchase precedes it)."""
    return asof_core(_tagged_union(spark, sf_dir))


def asof_core(tagged: DataFrame) -> DataFrame:
    """The union-scan as-of over an already-tagged frame (columns:
    user_id, ts, tag 0=right/1=left, purchase_id, value, click_id) —
    split out so property tests can drive it with synthetic frames."""
    # (ts, tag, event_id) order puts a same-instant purchase BEFORE the
    # click (ties included in "at-or-before") and resolves same-instant
    # purchase ties to max event_id; clicks never contribute non-null
    # purchase columns, so tie order among clicks is irrelevant.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", F.coalesce("purchase_id", "click_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p_id = F.last(F.when(F.col("tag") == 0, F.col("purchase_id")), ignorenulls=True)
    p_val = F.last(F.when(F.col("tag") == 0, F.col("value")), ignorenulls=True)
    p_ts = F.last(F.when(F.col("tag") == 0, F.col("ts")), ignorenulls=True)
    return (
        tagged.withColumn("asof_purchase_id", p_id.over(w))
        .withColumn("asof_value", p_val.over(w))
        .withColumn("asof_ts", p_ts.over(w))
        .filter(F.col("tag") == 1)
    )


@query(
    "n17_asof_join",
    f"""
    WITH {_PURCHASES_CTE}
    SELECT c.user_id, c.click_id, p.purchase_id,
           ROUND(p.value, 2) AS last_value
    FROM clicks c
    LEFT JOIN purchases p
      ON p.user_id = c.user_id
     AND p.ts = (SELECT MAX(p2.ts) FROM purchases p2
                 WHERE p2.user_id = c.user_id AND p2.ts <= c.ts)
    """,
)
def n17_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-17: plain as-of — every click, the most recent purchase at-or-
    before it (LEFT semantics: clicks before any purchase keep NULLs)."""
    return asof_enrich(spark, sf_dir).select(
        "user_id",
        "click_id",
        F.col("asof_purchase_id").alias("purchase_id"),
        F.round("asof_value", 2).alias("last_value"),
    )


@query(
    "n17_asof_tolerance",
    f"""
    WITH {_PURCHASES_CTE}
    SELECT c.user_id, c.click_id, p.purchase_id,
           ROUND(p.value, 2) AS last_value
    FROM clicks c
    LEFT JOIN purchases p
      ON p.user_id = c.user_id
     AND p.ts = (SELECT MAX(p2.ts) FROM purchases p2
                 WHERE p2.user_id = c.user_id AND p2.ts <= c.ts
                   AND p2.ts >= c.ts - INTERVAL 2 HOUR)
    """,
)
def n17_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-17b: as-of with a lookback tolerance — the match lapses when the
    last purchase is older than 2 hours (pandas merge_asof(tolerance=...)
    semantics). Same single-shuffle body; the tolerance is a post-window
    predicate on the carried as-of timestamp, not a second join."""
    out = asof_enrich(spark, sf_dir)
    fresh = F.col("asof_ts") >= F.col("ts") - F.expr("INTERVAL 2 HOURS")
    return out.select(
        "user_id",
        "click_id",
        F.when(fresh, F.col("asof_purchase_id")).alias("purchase_id"),
        F.when(fresh, F.round("asof_value", 2)).alias("last_value"),
    )
