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


# ---------------------------------------------------------------------------
# N-23c (r14): the skew PROFILER — the diagnostic an operator runs BEFORE
# reaching for the salting mechanisms above
# ---------------------------------------------------------------------------

#: per-task row target for the salt recommendation: a key whose row count
#: exceeds this gets ceil(max_key_rows / target) salt buckets
SKEW_TARGET_ROWS = 500

#: (label, table, key column) — the join/aggregate keys the engine's own
#: queries shuffle on
_SKEW_KEYS = (
    ("lineitem.l_suppkey", "lineitem", "l_suppkey"),
    ("lineitem.l_partkey", "lineitem", "l_partkey"),
    ("orders.o_custkey", "orders", "o_custkey"),
)


def _skew_leg_sql(label: str, table: str, col: str) -> str:
    return f"""
    SELECT '{label}' AS key_name,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(MAX(n) AS BIGINT) AS max_key_rows,
           CAST(MAX(CASE WHEN rn = CAST(CEIL(0.99 * nk) AS BIGINT) THEN n END)
                AS BIGINT) AS p99_key_rows,
           CAST((2::HUGEINT * MAX(n) * COUNT(*) * 1000000 + SUM(n))
                // (2::HUGEINT * SUM(n)) AS BIGINT) AS skew_ratio_micro,
           CAST((MAX(n) + {SKEW_TARGET_ROWS} - 1) // {SKEW_TARGET_ROWS}
                AS BIGINT) AS salt_buckets,
           CAST(CASE WHEN MAX(n) > {SKEW_TARGET_ROWS} THEN 1 ELSE 0 END
                AS INTEGER) AS needs_salt
    FROM (
        SELECT n, key,
               ROW_NUMBER() OVER (ORDER BY n, key) AS rn,
               COUNT(*) OVER () AS nk
        FROM (SELECT {col} AS key, CAST(COUNT(*) AS BIGINT) AS n
              FROM {table} GROUP BY 1) k
    ) t
    """


_SKEW_PROFILE_ORACLE = " UNION ALL ".join(
    _skew_leg_sql(*leg) for leg in _SKEW_KEYS
)


@query("n23_skew_profile", _SKEW_PROFILE_ORACLE)
def n23_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-23c (r14): JOIN-KEY SKEW PROFILER — per shuffle key, the
    distribution facts that decide WHETHER the salted rewrites above are
    worth their extra exchange: total rows, distinct keys, the hottest
    key's row count, the exact 0.99-quantile key size (disc percentile
    via identical rank arithmetic in both engines — no engine quantile
    function whose interpolation could differ), the max/mean skew ratio
    (integer half-up micro-division in 128-bit space, rule 27:
    max·n_keys·10⁶ leaves int64 well inside 100 TB key populations),
    and the recommended salt-bucket count at SKEW_TARGET_ROWS rows per
    task. On the fixture, lineitem.l_suppkey recommends salting and the
    other keys do not — both polarities pinned.

    Scale shape: per key, ONE hash aggregate (map-side combine) to the
    key-grain table (≪ rows), one rank window over key-grain rows, one
    scalar rollup. Nothing beyond key cardinality ever shuffles."""
    legs = []
    for label, table, col in _SKEW_KEYS:
        k = (
            read_table(spark, sf_dir, table)
            .groupBy(F.col(col).alias("key"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        )
        from pyspark.sql import Window

        w_rank = Window.orderBy(F.col("n"), F.col("key"))
        w_all = Window.partitionBy()
        t = k.select(
            "n",
            F.row_number().over(w_rank).alias("rn"),
            F.count(F.lit(1)).over(w_all).alias("nk"),
        )
        agg = t.agg(
            F.sum("n").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.max("n").cast("bigint").alias("max_key_rows"),
            F.max(
                F.when(
                    F.col("rn") == F.ceil(F.lit(0.99) * F.col("nk")).cast("bigint"),
                    F.col("n"),
                )
            )
            .cast("bigint")
            .alias("p99_key_rows"),
        )
        legs.append(
            agg.select(
                F.lit(label).alias("key_name"),
                "n_rows",
                "n_keys",
                "max_key_rows",
                "p99_key_rows",
                F.expr(
                    "CAST((2 * CAST(max_key_rows AS DECIMAL(38,0)) * n_keys * 1000000"
                    " + n_rows) div (2 * CAST(n_rows AS DECIMAL(38,0))) AS BIGINT)"
                ).alias("skew_ratio_micro"),
                F.expr(
                    f"CAST((max_key_rows + {SKEW_TARGET_ROWS} - 1)"
                    f" div {SKEW_TARGET_ROWS} AS BIGINT)"
                ).alias("salt_buckets"),
                F.when(F.col("max_key_rows") > SKEW_TARGET_ROWS, 1)
                .otherwise(0)
                .cast("int")
                .alias("needs_salt"),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out
