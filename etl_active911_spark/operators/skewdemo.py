"""N-23: hot-key skew mitigation as *registered, oracle-checked* queries.

``plans/skew.py`` holds the two mechanisms AQE cannot cover — two-phase
salted aggregation (AQE only splits *join* partitions, not aggregation
hash buckets) and salt-and-explode joins for non-broadcastable skewed
keys. These queries run both helpers against the plain single-phase
DuckDB answer, proving the rewrites are semantics-preserving: salting
must never change a result, only the shuffle layout. At 100 TB the
difference is one straggler reducer pinned on the hottest key vs
``n_salts`` even slices; here the difference must be exactly zero rows.

Reference parity: the reference (task.ts) has no skew machinery — it is a
single-node connector — so N-23 sits in the beyond-survey band with the
other scale operators (bloom prefilter, data-skipping layout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_active911_spark.io import read_table
from etl_active911_spark.plans.registry import query
from etl_active911_spark.plans.skew import salted_agg, salted_join

N_SALTS = 16


@query(
    "n23_salted_agg",
    """
    SELECT user_id,
           ROUND(SUM(value), 2) AS sum_value,
           COUNT(event_id)      AS count_event_id
    FROM events
    GROUP BY user_id
    """,
)
def n23_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-23a: per-user totals through the two-phase salted aggregate.

    Phase 1 spreads each user's rows over 16 (user, salt) groups; phase 2
    merges partials per user. The oracle is the ordinary one-phase GROUP
    BY — equality proves the decomposition (sum-of-sums, sum-of-counts)
    is exact. Float policy: money-ish doubles rounded to 2dp AFTER the
    final merge (CLAUDE.md rule 4); partial-sum ordering already varies
    run-to-run in plain Spark hash aggregation, so salting adds no new
    rounding risk class.
    """
    ev = read_table(spark, sf_dir, "events").select("user_id", "event_id", "value")
    out = salted_agg(ev, "user_id", {"value": "sum", "event_id": "count"}, n_salts=N_SALTS)
    return out.select(
        "user_id",
        F.round("sum_value", 2).alias("sum_value"),
        F.col("count_event_id"),
    )


@query(
    "n23_salted_join",
    """
    SELECT o.o_orderpriority AS priority,
           COUNT(*)          AS n_items,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def n23_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-23b: lineitem ⋈ orders through the salt-and-explode join.

    The fact side gets a random salt in [0, 16); the dimension side is
    exploded 16× so every (key, salt) pair finds its match — the shape
    used when the dimension is too big to broadcast but the fact key
    distribution is pathological. The oracle is the plain equi-join:
    row-for-row equality proves the explode introduces no duplicates and
    the salt drops no rows. (At this SF Catalyst would happily broadcast
    orders — the point here is semantics; `plans/skew.py` documents when
    to reach for it.)
    """
    li = (
        read_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("okey"), "l_extendedprice", "l_discount")
    )
    orders = (
        read_table(spark, sf_dir, "orders")
        .select(F.col("o_orderkey").alias("okey"), "o_orderpriority")
    )
    joined = salted_join(li, orders, "okey", n_salts=N_SALTS)
    return (
        joined.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        )
    )
