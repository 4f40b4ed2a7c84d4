"""Relational core: N-1…N-10 from SURVEY.md §2.5 + the flagship query.

All Spark built-ins — Catalyst handles pushdown, join selection (broadcast
vs SMJ via AQE), partial+final aggregation, and whole-stage codegen. The
work here is oracle parity: stable aliases, explicit casts, deterministic
tie-breaks, and a documented rounding policy for floating aggregates
(plans/canonical.py).

Reference parity note: the reference implements NONE of these (SURVEY.md
§2.5 — single-file ETL, no joins/aggregates); they are the "new surface,
Spark-built-in" relational core mandated by the driver contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_active911_spark.io import read_table, spread
from etl_active911_spark.plans.registry import query


def flagship_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by European nation for 1996 orders.

    lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region with filter + group +
    sum + sort + limit (N-1, N-2, N-4, N-8 in one plan). nation/region are
    tiny => Catalyst broadcasts them; the lineitem⋈orders join is the only
    real shuffle, on the join key, after the date filter is pushed to the
    parquet scan.
    """
    lineitem = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")

    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
        .limit(10)
    )


FLAGSHIP_ORACLE = """
SELECT n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
LIMIT 10
"""

query("flagship_revenue_by_nation", FLAGSHIP_ORACLE)(flagship_revenue_by_nation)


@query(
    "n1_filter_project",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
           l_extendedprice * (1 - l_discount) AS disc_price,
           l_returnflag
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1997-07-01'
      AND l_quantity < 10
    """,
)
def n1_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-1: filter + projection; predicate and column pruning reach the scan.

    No aggregation — the per-row double product is IEEE-exact in both
    engines, so no rounding is needed.
    """
    return (
        read_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1997-07-01")
            & (F.col("l_quantity") < 10)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
            "l_returnflag",
        )
    )


@query(
    "n2_join_broadcast_agg",
    """
    SELECT n_name,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY n_name
    """,
)
def n2_join_broadcast_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-2/N-4: equi inner join with an explicitly broadcast dim + hash agg."""
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    nation = read_table(spark, sf_dir, "nation")
    return (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
        )
    )


@query(
    "n2_join_semi",
    """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_custkey IN (
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '2001-01-01'
    )
    """,
)
def n2_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-2: left-semi join (customers with a 2001+ order)."""
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "2001-01-01")
    return customer.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name", "c_acctbal")


@query(
    "n2_join_anti",
    """
    SELECT c_custkey, c_name, c_nationkey
    FROM customer
    WHERE c_custkey NOT IN (
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    """,
)
def n2_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-2: left-anti join (customers who never placed an urgent order —
    restricted so the fixture yields a non-empty result)."""
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return customer.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name", "c_nationkey")


@query(
    "n3_range_join",
    """
    SELECT s_nationkey AS nationkey,
           COUNT(*) AS n_pairs,
           ROUND(SUM(c_acctbal - s_acctbal), 2) AS total_gap
    FROM supplier
    JOIN customer ON s_nationkey = c_nationkey AND c_acctbal > s_acctbal
    GROUP BY s_nationkey
    """,
)
def n3_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-3: equi + non-equi (theta) join condition.

    The equi part keys the shuffle; the inequality is evaluated post-match,
    so this stays a hash/sort-merge join rather than a BNLJ — the shape that
    survives at scale.
    """
    supplier = read_table(spark, sf_dir, "supplier")
    customer = read_table(spark, sf_dir, "customer")
    return (
        supplier.join(
            customer,
            (F.col("s_nationkey") == F.col("c_nationkey"))
            & (F.col("c_acctbal") > F.col("s_acctbal")),
        )
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.sum(F.col("c_acctbal") - F.col("s_acctbal")), 2).alias("total_gap"),
        )
    )


@query(
    "n4_agg_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(AVG(l_quantity), 6) AS avg_qty,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def n4_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-4: TPC-H Q1-style hash aggregate (Catalyst does partial+final)."""
    return (
        read_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= "2000-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "n5_count_distinct",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS distinct_parts,
           COUNT(DISTINCT l_suppkey) AS distinct_supps
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def n5_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-5: exact count-distinct (expand + two-phase agg under the hood)."""
    return (
        read_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("distinct_parts"),
            F.countDistinct("l_suppkey").alias("distinct_supps"),
        )
    )


@query(
    "n4_percentiles",
    """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.95), 6) AS p95,
           ROUND(MIN(l_extendedprice), 2) AS min_price,
           ROUND(MAX(l_extendedprice), 2) AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def n4_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-4: exact percentiles (continuous interpolation — same definition
    as DuckDB's quantile_cont) + min/max."""
    return (
        read_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_extendedprice", F.lit(0.5)), 6).alias("p50"),
            F.round(F.percentile("l_extendedprice", F.lit(0.95)), 6).alias("p95"),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        )
    )


@query("n4_approx_percentiles")  # t-digest-style sketch — rows-only
def n4_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-4: approx_percentile — the sketch-based variant that scales to
    100 TB without a per-group sort; accuracy bound set by the last arg."""
    return (
        read_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000)).alias("p50_approx")
        )
    )


@query("n5_approx_count_distinct")  # HLL sketch — not bit-comparable to DuckDB: rows-only
def n5_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-5: approx distinct via HyperLogLog++ — the 100 TB-scale variant.

    rsd=0.01 keeps the sketch small enough to broadcast-merge; exactness is
    checked in tests against countDistinct within tolerance, not by oracle.
    """
    return (
        read_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"))
    )


#: Rank-slack for the percentile-sketch bound check: percentile_approx
#: at accuracy 10000 guarantees rank error ≤ n/10000 (1e-4 of the group);
#: the check brackets the sketch value between the EXACT 0.495/0.505
#: quantiles — 50× that guarantee, so the row is deterministic-green for
#: any sketch that honors its contract, and red only on a real defect.
N4_BOUND_EPS = 0.005

#: Relative-error margin for the HLL bound check: rsd=0.01 is one
#: standard deviation; 5σ makes the flag deterministic-true for any
#: correctly-functioning sketch on fixed data (HLL++ is deterministic
#: given the input set — no runtime randomness).
N5_BOUND_RSD_MULT = 5.0


@query(
    "n4_percentile_error_bound",
    f"""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, {0.5 - N4_BOUND_EPS}), 6) AS lo_bound,
           ROUND(quantile_cont(l_extendedprice, {0.5 + N4_BOUND_EPS}), 6) AS hi_bound,
           CAST(1 AS INTEGER) AS within_bound
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def n4_percentile_error_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-4 companion (VERDICT r11 item 5): an ORACLED check on the
    rows-only percentile sketch — per group, the approx p50
    (``percentile_approx``, accuracy 10000) must land inside the EXACT
    [q(0.495), q(0.5+0.005)] value bracket (50× the sketch's rank-error
    guarantee). The oracle computes the same exact bracket and asserts
    ``within_bound = 1``: a misbehaving sketch emits 0 on the Spark side
    and the driver's value hash goes red. Spark's exact ``percentile``
    matches DuckDB's ``quantile_cont`` definition (proven by
    ``n4_percentiles``' green row); the flag itself compares UNROUNDED
    values, the published bracket rounds for display only."""
    return (
        read_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile_approx(
                "l_extendedprice", F.lit(0.5), F.lit(10000)
            ).alias("approx"),
            F.percentile("l_extendedprice", F.lit(0.5 - N4_BOUND_EPS)).alias("lo"),
            F.percentile("l_extendedprice", F.lit(0.5 + N4_BOUND_EPS)).alias("hi"),
        )
        .select(
            "l_returnflag",
            F.round("lo", 6).alias("lo_bound"),
            F.round("hi", 6).alias("hi_bound"),
            (
                (F.col("approx") >= F.col("lo")) & (F.col("approx") <= F.col("hi"))
            ).cast("int").alias("within_bound"),
        )
    )


@query(
    "n5_acd_error_bound",
    """
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(1 AS INTEGER) AS within_bound
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def n5_acd_error_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-5 companion (VERDICT r11 item 5): an ORACLED check on the
    rows-only HLL sketch — per group, ``approx_count_distinct``
    (rsd=0.01) must sit within 5σ relative error of the exact
    ``countDistinct``. The oracle recomputes the exact count and asserts
    ``within_bound = 1``; HLL++ is deterministic for a fixed input set,
    so the flag cannot flap — it goes red only if the sketch (or a
    fixture regeneration) breaks the bound for real."""
    return (
        read_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .select(
            "l_returnflag",
            F.col("exact_parts").cast("bigint").alias("exact_parts"),
            (
                F.abs(F.col("approx_parts") - F.col("exact_parts"))
                <= F.lit(N5_BOUND_RSD_MULT * 0.01) * F.col("exact_parts")
            ).cast("int").alias("within_bound"),
        )
    )


@query(
    "n6_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def n6_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-6: rollup (grouping-sets family)."""
    return (
        read_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "n6_cube",
    """
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def n6_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-6: cube over two low-cardinality dimensions."""
    return (
        read_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@query(
    "n7_window_rank",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rnk
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rnk
        FROM orders
    )
    WHERE rnk <= 3
    """,
)
def n7_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-7/N-8: rank window + top-k per group (single shuffle on o_custkey)."""
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    return (
        read_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice", F.rank().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 3)
    )


@query(
    "n7_window_lag",
    """
    SELECT o_custkey, o_orderkey, o_orderdate,
           LAG(o_totalprice) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS prev_price,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS running_total
    FROM orders
    WHERE o_custkey < 100
    """,
)
def n7_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-7: lag + running-sum rows-frame; tie-broken by o_orderkey so the
    frame order is deterministic across engines."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 100)
        .select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.lag("o_totalprice").over(w).alias("prev_price"),
            F.round(
                F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2
            ).alias("running_total"),
        )
    )


@query(
    "n8_global_topk",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def n8_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-8: global top-k — Spark plans TakeOrderedAndProject (per-partition
    heap + driver merge), no full sort even at 100 TB."""
    return (
        read_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


@query(
    "n9_set_ops",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal < 0
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_nationkey = 5
    """,
)
def n9_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-9: UNION (distinct) then EXCEPT (distinct) set semantics."""
    customer = read_table(spark, sf_dir, "customer")
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    negative = customer.filter(F.col("c_acctbal") < 0).select("c_custkey")
    nation5 = customer.filter(F.col("c_nationkey") == 5).select("c_custkey")
    return building.union(negative).distinct().subtract(nation5)


@query(
    "n9_intersect",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def n9_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-9: INTERSECT (distinct)."""
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderstatus") == "F")
        .select("o_custkey")
        .intersect(orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey"))
    )


@query(
    "n10_scalar_suite",
    """
    SELECT event_id,
           UPPER(event_type) AS type_upper,
           SUBSTR(event_type, 1, 2) AS type_prefix,
           CONCAT(event_type, ':', CAST(user_id AS VARCHAR)) AS type_user,
           CAST(YEAR(ts) AS INT) AS yr,
           CAST(MONTH(ts) AS INT) AS mo,
           CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
           CAST(REGEXP_EXTRACT(props, '"k": (\\d+)', 1) AS INT) AS k,
           value * 2.0 AS value_x2,
           ABS(value - 50.0) AS value_dist,
           CAST(FLOOR(value / 10.0) AS BIGINT) AS value_bucket
    FROM events
    WHERE event_type IN ('click', 'purchase')
    """,
)
def n10_scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-10: scalar function suite — string/date/math/regex/JSON-in-string.

    ``props`` holds JSON in a string column (same "documents hiding inside
    scalar columns" pattern as the reference's `responses`, task.ts:121);
    extraction via regexp keeps both engines on identical semantics.
    """
    return (
        read_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select(
            "event_id",
            F.upper("event_type").alias("type_upper"),
            F.substring("event_type", 1, 2).alias("type_prefix"),
            F.concat_ws(":", "event_type", F.col("user_id").cast("string")).alias("type_user"),
            F.year("ts").cast("int").alias("yr"),
            F.month("ts").cast("int").alias("mo"),
            F.date_trunc("day", "ts").cast("date").alias("day"),
            F.regexp_extract("props", r'"k": (\d+)', 1).cast("int").alias("k"),
            (F.col("value") * 2.0).alias("value_x2"),
            F.abs(F.col("value") - 50.0).alias("value_dist"),
            F.floor(F.col("value") / 10.0).cast("bigint").alias("value_bucket"),
        )
    )


@query(
    "n6_pivot",
    """
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
    FROM events
    GROUP BY user_id
    """,
)
def n6_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-6 family: pivot (wide aggregation) — explicit value list so the
    plan needs no extra distinct-values job (required at scale)."""
    pivoted = (
        read_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .count()
    )
    return pivoted.select(
        "user_id",
        *[F.coalesce(F.col(c), F.lit(0)).cast("bigint").alias(c)
          for c in ["click", "view", "purchase", "signup", "error"]],
    )


@query(
    "n2_correlated_subquery",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > (
        SELECT 2 * AVG(o2.o_totalprice) FROM orders o2
        WHERE o2.o_custkey = o.o_custkey
    )
    """,
)
def n2_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-2 family: correlated scalar subquery (Catalyst decorrelates it into
    an aggregate + join — no per-row re-execution)."""
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_cs")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders_cs o
        WHERE o_totalprice > (
            SELECT 2 * AVG(o2.o_totalprice) FROM orders_cs o2
            WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


@query(
    "n10_json_struct",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(REGEXP_EXTRACT(props, '"k": (\\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MIN(REGEXP_EXTRACT(props, '"k": (\\d+)', 1)) AS INT) AS min_k_str
    FROM events
    GROUP BY event_type
    """,
)
def n10_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-10: from_json into a typed struct, then aggregate on the parsed
    field — the Catalyst-native path for O-3-style JSON-in-column data."""
    parsed = (
        read_table(spark, sf_dir, "events")
        .withColumn("props_struct", F.from_json("props", "k INT"))
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("props_struct.k").cast("bigint")).alias("sum_k"),
        F.min(F.col("props_struct.k").cast("string")).cast("int").alias("min_k_str"),
    )


# ---------------------------------------------------------------------------
# Classic TPC-H-shaped breadth queries (round 2): the canonical plan shapes
# a user of a general analytics engine runs daily — multi-way joins with
# selective filters, ratio-of-sums, HAVING on aggregates, dual-dim joins.
# All Spark built-ins; oracle parity follows plans/canonical.py policies
# (round(2) money, round(6) ratios, rank/filter on rounded values).
# ---------------------------------------------------------------------------


@query(
    "tpch_q3_shipping_priority",
    """
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(o_orderdate AS DATE) AS order_date,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate  > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: segment filter + 3-way join + grouped revenue + top-N.
    Both date predicates push to the scans; customer is the broadcast side
    after its segment filter; TakeOrderedAndProject caps the sort."""
    customer = read_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-06-01"
    )
    lineitem = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-06-01"
    )
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "tpch_q7_nation_volume",
    """
    SELECT supp_nation, cust_nation, yr, ROUND(SUM(volume), 2) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(YEAR(l_shipdate) AS INT) AS yr,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    )
    GROUP BY supp_nation, cust_nation, yr
    """,
)
def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: the dual-dimension join — nation joined TWICE under
    different roles (supplier's vs customer's), disjunctive pair filter,
    yearly rollup. Both nation sides broadcast; the fact-side shuffles are
    keyed by the join keys only."""
    lineitem = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    supplier = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        supplier.join(lineitem, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("yr"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "tpch_q12_priority_by_status",
    """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    """,
)
def tpch_q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: conditional counting (CASE inside SUM) after a selective
    fact-side filter — the filter prunes at the lineitem scan BEFORE the
    join, so the shuffle carries only the surviving year."""
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@query(
    "tpch_q14_promo_revenue",
    """
    SELECT ROUND(
        100.0 * SUM(CASE WHEN p_type = 'PROMO'
                         THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
              / SUM(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate <  TIMESTAMP '1997-10-01'
    """,
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: ratio of conditional to total aggregate in one pass —
    one month of lineitem joined to the part dim (broadcast), no
    second scan for the denominator. round(6) per ratio policy."""
    lineitem = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    part = read_table(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "tpch_q18_large_orders",
    """
    SELECT c_name, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
           ROUND(o_totalprice, 2) AS total_price,
           ROUND(SUM(l_quantity), 2) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_name, o_orderkey, o_orderdate, o_totalprice
    HAVING ROUND(SUM(l_quantity), 2) > 300
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 20
    """,
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: HAVING on an aggregate (large-quantity orders) + top-N.
    The boundary decision uses the ROUNDED sum (canonical policy 4) so
    both engines agree on threshold-straddling float sums."""
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
        .select(
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            F.round("o_totalprice", 2).alias("total_price"),
            "total_qty",
        )
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@query(
    "tpch_q4_order_priority",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01'
      AND o_orderdate <  TIMESTAMP '1997-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: EXISTS decorrelated to a left-semi join, then a tiny
    grouped count. The quarter filter prunes the orders scan; the semi
    join's right side carries only (l_orderkey) for returned lines —
    no lineitem payload ever shuffles. (No l_commitdate/receiptdate in
    the slim fixture schema; l_returnflag='R' is the stand-in predicate.)
    """
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-07-01") & (F.col("o_orderdate") < "1997-10-01")
    )
    returned = (
        read_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("order_count"))
    )


@query(
    "tpch_q10_returned_items",
    """
    SELECT c_custkey, c_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           ROUND(c_acctbal, 2) AS acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-10-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: lost-revenue ranking of customers who returned items —
    quarter + returnflag filters at the scans, nation broadcast, one
    grouped shuffle keyed by customer, TakeOrderedAndProject top-20.
    Ranking orders by the ROUNDED revenue (canonical policy 4) with
    c_custkey as the unique tie-break."""
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-10-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    lineitem = read_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = read_table(spark, sf_dir, "nation")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "tpch_q13_order_histogram",
    """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
        SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def tpch_q13_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: outer join preserved through TWO aggregation levels —
    per-customer order counts (left join keeps order-less customers at 0),
    then the distribution of those counts. The second aggregate's input is
    one row per customer, so the second shuffle is tiny. (The classic
    comment-pattern exclusion becomes an o_orderpriority filter in the
    slim schema — pushed into the JOIN CONDITION, not a WHERE, to keep
    outer-join semantics.)"""
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
    )


@query(
    "tpch_q17_small_qty_revenue",
    """
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = p_partkey)
    """,
)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: correlated scalar subquery (per-part average quantity)
    decorrelated to a grouped aggregate joined back to the fact — the
    classic two-pass plan Catalyst would also produce for the subquery.
    The brand-filtered part dim broadcasts; the threshold comparison is
    exact on both engines because integer-valued quantities sum exactly
    in doubles (no rounding needed at the boundary)."""
    lineitem = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    per_part_avg = lineitem.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part_avg, F.col("l_partkey") == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "tpch_q21_waiting_suppliers",
    """
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders    ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: the hardest decorrelation in the suite — one EXISTS and
    one NOT EXISTS against the same fact, both correlated on the join key
    WITH an inequality on a second column. Each becomes a semi/anti join
    whose right side is a 2-column projection of lineitem keyed by
    l_orderkey — the heavy columns never reach either shuffle. (Adapted to
    the slim schema: 'kept waiting' = sole returned-line supplier on a
    finished multi-supplier order.)"""
    supplier = read_table(spark, sf_dir, "supplier")
    lineitem = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = lineitem.filter(F.col("l_returnflag") == "R")
    other = lineitem.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    other_returned = (
        lineitem.filter(F.col("l_returnflag") == "R")
        .select(
            F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("o3_suppkey")
        )
    )
    return (
        l1.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            other,
            (F.col("o2_orderkey") == F.col("l_orderkey"))
            & (F.col("o2_suppkey") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            other_returned,
            (F.col("o3_orderkey") == F.col("l_orderkey"))
            & (F.col("o3_suppkey") != F.col("l_suppkey")),
            "left_anti",
        )
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(10)
    )


@query(
    "tpch_q22_idle_customers",
    """
    WITH ab AS (
        SELECT ROUND(AVG(c_acctbal), 2) AS a FROM customer WHERE c_acctbal > 0.0
    )
    SELECT n_name, CAST(COUNT(*) AS BIGINT) AS numcust,
           ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey, ab
    WHERE c_acctbal > ab.a
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY n_name
    """,
)
def tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: scalar aggregate threshold (global average) feeding a
    filter + anti join. The one-row average broadcasts via crossJoin; the
    threshold is the ROUNDED average (canonical policy 4) so an engine
    last-bit difference in the float mean can't flip a boundary customer.
    (Slim-schema adaptation: 'idle' = no urgent orders; nation stands in
    for the phone country code.)"""
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    urgent = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    avg_bal = customer.filter(F.col("c_acctbal") > 0.0).agg(
        F.round(F.avg("c_acctbal"), 2).alias("a")
    )
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(urgent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@query(
    "n6_grouping_sets",
    """
    SELECT n_name, o_orderpriority,
           CAST(GROUPING(n_name) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((n_name), (o_orderpriority), ())
    """,
)
def n6_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-6 (explicit GROUPING SETS): arbitrary grouping combinations in one
    pass — Spark expands to a single Expand + hash aggregate, not one scan
    per set. grouping_id disambiguates the NULL-as-ALL rows exactly like
    the rollup/cube queries (same Expand machinery, user-chosen sets)."""
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    joined = (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupingSets(
            [["n_name"], ["o_orderpriority"], []], "n_name", "o_orderpriority"
        )
        .agg(
            (F.grouping("n_name") * 2 + F.grouping("o_orderpriority"))
            .cast("bigint")
            .alias("gid"),
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select("n_name", "o_orderpriority", "gid", "n_orders", "total")
    )


@query(
    "n7_window_range_frame",
    """
    SELECT o_orderkey,
           CAST(COUNT(*) OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice
               RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_close,
           ROUND(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice
               RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW), 2) AS sum_close
    FROM orders
    """,
)
def n7_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-7 (RANGE frame): value-based window bounds — peers within $1000
    below the current order's total, per customer. Unlike ROWS frames the
    bound is a predicate on the ORDER BY value, so ties (peer rows) enter
    the frame together on both engines."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, Window.currentRow)
    )
    orders = read_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_close"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("sum_close"),
    )


@query(
    "n7_window_distribution",
    """
    SELECT o_orderkey,
           CAST(NTILE(4) OVER w AS INT) AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def n7_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-7 (distribution functions): ntile/percent_rank/cume_dist over a
    deterministic total order (unique o_orderkey tie-break, canonical
    policy 4). One shuffle keyed by the partition column; the rank math is
    pure per-partition streaming."""
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "n2_join_full_outer",
    """
    SELECT COALESCE(c.c_custkey, -1) AS cust_key,
           COALESCE(o.n_orders, 0) AS n_orders,
           CASE WHEN c.c_custkey IS NULL THEN 'order_only'
                WHEN o.n_orders IS NULL THEN 'customer_only'
                ELSE 'both' END AS side
    FROM (SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0) c
    FULL OUTER JOIN (
        SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders WHERE o_custkey % 2 = 0 GROUP BY o_custkey
    ) o ON c.c_custkey = o.o_custkey
    """,
)
def n2_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-2 (full outer): both sides preserved — the join flavor the
    rest of the suite doesn't exercise. Deliberately mismatched filters
    (mod-3 customers vs mod-2 order keys) so all three row classes
    (both / customer_only / order_only) appear. Full outer cannot
    broadcast — always a shuffle join keyed by the equi key, which is the
    correct 100 TB plan too."""
    customer = (
        read_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 3 == 0)
        .select("c_custkey")
    )
    orders = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % 2 == 0)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    )
    side = (
        F.when(F.col("c_custkey").isNull(), "order_only")
        .when(F.col("n_orders").isNull(), "customer_only")
        .otherwise("both")
    )
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "full_outer")
        .select(
            F.coalesce(F.col("c_custkey"), F.lit(-1)).alias("cust_key"),
            F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
            side.alias("side"),
        )
    )


@query(
    "n9_except_all",
    """
    SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_quantity < 30
    EXCEPT ALL
    SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_quantity < 10
    """,
)
def n9_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-9 (bag semantics): EXCEPT ALL keeps multiplicities — each
    (flag, status) row survives (count_left − count_right) times, unlike
    the set-semantics `n9_set_ops`. Spark plans this as a counted
    hash aggregate + generate, one shuffle on the row value."""
    li = read_table(spark, sf_dir, "lineitem")
    left = li.filter(F.col("l_quantity") < 30).select("l_returnflag", "l_linestatus")
    right = li.filter(F.col("l_quantity") < 10).select("l_returnflag", "l_linestatus")
    return left.exceptAll(right)


# One SQL text, two engines: restricted to the shared Spark∩DuckDB dialect
# (CLAUDE.md rule 5 — CAST AS STRING, CASE, %, no date formatting).
_SHARED_SQL = """
    WITH buckets AS (
        SELECT o_orderpriority,
               CASE WHEN o_totalprice >= 200000 THEN 'large'
                    WHEN o_totalprice >= 50000 THEN 'mid'
                    ELSE 'small' END AS size_class,
               CAST(o_orderkey % 2 AS STRING) AS parity
        FROM orders
    )
    SELECT o_orderpriority, size_class, parity,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM buckets
    GROUP BY o_orderpriority, size_class, parity
    """


@query("n15_sql_api", _SHARED_SQL)
def n15_sql_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-15 (SQL entry point): the registered query IS the oracle text —
    one statement in the shared Spark∩DuckDB dialect, executed via
    ``spark.sql`` over a temp view. Demonstrates the engine's second API
    surface (ANSI SQL on Catalyst) with literally zero translation: any
    dialect drift between the engines would fail this query's hash check.
    """
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_SHARED_SQL)


def _dup_closure_sql(edges_sql: str) -> str:
    """Shared recursion over a (doc_a < doc_b) edge list: walk every node
    downward to smaller ids (strictly decreasing → UNION ALL terminates),
    take MIN reached. The result is the MINIMUM ID REACHABLE VIA STRICTLY
    DECREASING PATHS — not, in general, the connected-component root: for
    edges (1,3),(2,3) node 2 has no decreasing path to 1, so it keeps
    root 2 while 1 and 3 get root 1 (ADVICE r02). Spark 4.1 only allows
    UNION ALL in recursive CTEs (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE),
    so an exact symmetric-closure fixpoint is not expressible here; use
    ``x2_dup_clusters`` (clustering.py) for true cluster assignment. Same
    text runs on Spark 4's native WITH RECURSIVE and on DuckDB."""
    return f"""
    WITH RECURSIVE edges AS ({edges_sql}),
    nodes AS (
        SELECT DISTINCT doc_a AS doc_id FROM edges
        UNION
        SELECT DISTINCT doc_b FROM edges
    ),
    walk(doc_id, reach) AS (
        SELECT doc_id, doc_id FROM nodes
        UNION ALL
        SELECT w.doc_id, e.doc_a
        FROM walk w JOIN edges e ON w.reach = e.doc_b
    )
    SELECT doc_id, MIN(reach) AS cluster_root
    FROM walk GROUP BY doc_id
    """


@query(
    "n16_recursive_cte",
    None,  # oracle injected below — needs the x2 edge SQL
)
def n16_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-16: Spark 4's native ``WITH RECURSIVE`` (SPARK-24497) — a
    decreasing-path walk over the near-dup edge graph, assigning each
    document the smallest doc_id reachable via strictly decreasing hops
    (NOT the connected-component root — see ``_dup_closure_sql``; use
    ``x2_dup_clusters`` for cluster assignment). The edge list comes from
    the registered ``x2_ngram_jaccard`` DataFrame via a temp view, so the
    recursion composes with the operator library; the walk only ever steps
    to strictly smaller ids, so UNION ALL terminates in ≤ chain-length
    iterations without fixpoint dedup. Contrast with ``x2_dup_clusters``:
    that is the hand-built distributed label-propagation loop (a true
    fixpoint); this demonstrates the declarative engine feature."""
    from etl_active911_spark.operators.dedup import x2_ngram_jaccard

    x2_ngram_jaccard(spark, sf_dir).createOrReplaceTempView("n16_dup_edges")
    return spark.sql(
        _dup_closure_sql("SELECT doc_a, doc_b FROM n16_dup_edges")
    )


# oracle: the SAME recursion text over DuckDB's replica of the edge query.
# Importing dedup here (relational loads first in load_all) makes its
# x2_ngram_jaccard oracle available; the later load_all import is a no-op.
import etl_active911_spark.operators.dedup  # noqa: E402, F401
from etl_active911_spark.plans import registry as _registry  # noqa: E402

_registry.ORACLES["n16_recursive_cte"] = _dup_closure_sql(
    f"SELECT doc_a, doc_b FROM ({_registry.ORACLES['x2_ngram_jaccard']}) je"
)


# ---------------------------------------------------------------------------
# N-6+: unpivot / melt (wide → long)
# ---------------------------------------------------------------------------


@query(
    "n6_unpivot",
    """
    SELECT 'l_quantity' AS measure, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(l_quantity), 2) AS total
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', CAST(COUNT(*) AS BIGINT), ROUND(SUM(l_extendedprice), 2)
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', CAST(COUNT(*) AS BIGINT), ROUND(SUM(l_discount), 2)
    FROM lineitem
    UNION ALL
    SELECT 'l_tax', CAST(COUNT(*) AS BIGINT), ROUND(SUM(l_tax), 2)
    FROM lineitem
    """,
)
def n6_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-6: the inverse of pivot — ``DataFrame.unpivot`` melts the four
    lineitem measures into (measure, value) rows, then one hash aggregate
    per measure name. Catalyst expands unpivot to a generator (no
    shuffle); the only shuffle is the 4-group aggregate. The oracle states
    the same result as per-column aggregates, so the unpivot semantics
    (column name → label, value carried) are what's actually checked."""
    li = read_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=["l_orderkey"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="value",
    )
    return long.groupBy("measure").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total")
    )


# ---------------------------------------------------------------------------
# N-20: single-pass table profiling (describe/summarize surface)
# ---------------------------------------------------------------------------


@query(
    "n20_data_profile",
    """
    SELECT 'o_orderkey' AS col_name,
           CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           ROUND(MIN(o_orderkey), 2) AS min_num, ROUND(MAX(o_orderkey), 2) AS max_num,
           CAST(NULL AS STRING) AS min_str, CAST(NULL AS STRING) AS max_str
    FROM orders
    UNION ALL
    SELECT 'o_custkey',
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
           ROUND(MIN(o_custkey), 2), ROUND(MAX(o_custkey), 2), NULL, NULL
    FROM orders
    UNION ALL
    SELECT 'o_totalprice',
           CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
           ROUND(MIN(o_totalprice), 2), ROUND(MAX(o_totalprice), 2), NULL, NULL
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus',
           CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
           NULL, NULL, MIN(o_orderstatus), MAX(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority',
           CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
           NULL, NULL, MIN(o_orderpriority), MAX(o_orderpriority)
    FROM orders
    """,
)
def n20_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-20: data profiling (the describe()/summary() surface as a real
    query): null count, exact distinct count, and typed min/max for five
    orders columns — in ONE scan. All per-column metrics are computed in a
    single aggregate row (Catalyst plans the multi-distinct via expand),
    then exploded into the long (col_name, metrics...) shape. The oracle
    spells the same result as five per-column aggregate scans — at 100 TB
    the single-pass shape reads the table once instead of five times."""
    o = read_table(spark, sf_dir, "orders")

    def nulls(c: str) -> Column:
        return F.sum(F.col(c).isNull().cast("long"))

    num_cols = ["o_orderkey", "o_custkey", "o_totalprice"]
    str_cols = ["o_orderstatus", "o_orderpriority"]
    aggs = []
    for c in num_cols + str_cols:
        aggs += [nulls(c).alias(f"nn_{c}"), F.countDistinct(c).alias(f"nd_{c}")]
    for c in num_cols:
        aggs += [
            F.round(F.min(c).cast("double"), 2).alias(f"mn_{c}"),
            F.round(F.max(c).cast("double"), 2).alias(f"mx_{c}"),
        ]
    for c in str_cols:
        aggs += [F.min(c).alias(f"mns_{c}"), F.max(c).alias(f"mxs_{c}")]
    row = o.agg(*aggs)
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    structs = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col(f"nn_{c}").alias("n_nulls"),
            F.col(f"nd_{c}").alias("n_distinct"),
            F.col(f"mn_{c}").alias("min_num"),
            F.col(f"mx_{c}").alias("max_num"),
            null_s.alias("min_str"),
            null_s.alias("max_str"),
        )
        for c in num_cols
    ] + [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col(f"nn_{c}").alias("n_nulls"),
            F.col(f"nd_{c}").alias("n_distinct"),
            null_d.alias("min_num"),
            null_d.alias("max_num"),
            F.col(f"mns_{c}").alias("min_str"),
            F.col(f"mxs_{c}").alias("max_str"),
        )
        for c in str_cols
    ]
    return row.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


# ---------------------------------------------------------------------------
# N-21: funnel analysis (staged event-sequence conversion)
# ---------------------------------------------------------------------------


@query(
    "n21_funnel",
    """
    WITH v AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t1
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM events e JOIN c ON c.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t2
        GROUP BY e.user_id
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_view,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_view_click,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_view_click_purchase
    """,
)
def n21_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-21: ordered-funnel conversion — users whose first 'view' is later
    followed by a 'click', then a 'purchase' after that click
    (MATCH_RECOGNIZE-lite; the product-analytics staple). Each stage is a
    keyed MIN aggregate semi-joined forward into the next — three
    aggregates on the SAME user_id key, so at scale the shuffle
    partitioning is computed once and reused (Exchange reuse), and no
    per-user event list is ever materialized (unlike a collect_list
    sequence scan). Only timestamps are compared, never emitted — session
    TZ cannot leak into the result."""
    ev = read_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t1")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_view_click_purchase")))
    )


# ---------------------------------------------------------------------------
# N-22: data-quality constraint checks
# ---------------------------------------------------------------------------


@query(
    "n22_dq_checks",
    """
    SELECT
        (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
         WHERE NOT EXISTS (SELECT 1 FROM customer c
                           WHERE c.c_custkey = o.o_custkey)) AS n_orphan_orders,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM (
            SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1
        ) d) AS n_dup_orderkeys,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
         WHERE o_totalprice <= 0 OR o_totalprice IS NULL) AS n_bad_price,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
         WHERE o_orderdate >= TIMESTAMP '2001-08-01') AS n_future_orders
    """,
)
def n22_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-22: the data-quality gate a production pipeline runs before
    publishing a partition — referential integrity (orders without a
    customer: broadcast ANTI join), key uniqueness (duplicate orderkey
    groups), domain checks (non-positive/null price), and freshness bounds
    (dates at/after the known horizon) — emitted as ONE row of violation
    counts. The three orders-side checks share one scan pass each as plain
    aggregates; nothing here materializes violating rows (at 100 TB you
    count first, fetch examples only on failure)."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer").select("c_custkey")
    orphans = orders.join(
        F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"], "anti"
    ).agg(F.count(F.lit(1)).alias("n_orphan_orders"))
    dups = (
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.count(F.lit(1)).alias("n_dup_orderkeys"))
    )
    scans = orders.agg(
        F.sum(
            (F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0)).cast("long")
        ).alias("n_bad_price"),
        F.sum((F.col("o_orderdate") >= "2001-08-01").cast("long")).alias(
            "n_future_orders"
        ),
    )
    return orphans.crossJoin(dups).crossJoin(scans)


# ---------------------------------------------------------------------------
# N-25 (r7): interval overlap join (grid-bucketed)
# ---------------------------------------------------------------------------

_IV_GRID = 135  # bucket width > max interval length (30 + 6*15 = 120)
_IV_SQL = """
    iv AS (
        SELECT user_id, event_id,
               CAST((event_id * 37) % 100000 AS BIGINT) AS s,
               CAST((event_id * 37) % 100000 + 30 + (event_id % 7) * 15 AS BIGINT) AS e
        FROM events
    )
"""


@query(
    "n25_interval_join",
    f"""
    WITH {_IV_SQL},
    a AS (SELECT * FROM iv WHERE event_id % 2 = 0),
    b AS (SELECT * FROM iv WHERE event_id % 2 = 1)
    SELECT a.user_id, a.event_id AS event_a, b.event_id AS event_b,
           CAST(LEAST(a.e, b.e) - GREATEST(a.s, b.s) AS BIGINT) AS overlap_s
    FROM a JOIN b
      ON a.user_id = b.user_id AND a.s < b.e AND b.s < a.e
    """,
)
def n25_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-25 (r7): INTERVAL OVERLAP JOIN — pair up overlapping intervals
    (half-open [s, e)) across two sets, with the overlap length: the
    shape behind session/visit correlation, downtime attribution, and
    any "which A intervals intersect which B intervals" question. The
    oracle is the naive theta join; the engine plans the SCALABLE form —
    the 1-D twin of the geo grid-bucket join (``x7_geo_bucket_join``):
    with bucket width ≥ the maximum interval length, every interval
    covers ≤ 2 buckets, so expanding both sides to covered buckets and
    EQUI-joining on (user, bucket) enumerates a superset of overlapping
    pairs with ≤ 2× fan-out and ZERO theta-join operators; a distinct
    collapses double-bucket matches and the exact predicate filters.
    Intervals here derive deterministically from event ids (pure int
    axis) so both engines join identical inputs.

    At 100 TB: shuffle keys are (user, bucket) ints; fan-out is bounded
    by interval-length/bucket-width, never data volume; a long-tail
    interval set picks the bucket width per the documented max-duration
    rule (or splits oversized intervals into per-bucket fragments —
    same join, still exact)."""
    iv = read_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        ((F.col("event_id") * 37) % 100000).cast("bigint").alias("s"),
        ((F.col("event_id") * 37) % 100000 + 30 + (F.col("event_id") % 7) * 15)
        .cast("bigint")
        .alias("e"),
    )
    cells = iv.select(
        "user_id",
        "event_id",
        "s",
        "e",
        F.explode(
            F.sequence(F.floor(F.col("s") / _IV_GRID), F.floor((F.col("e") - 1) / _IV_GRID))
        ).alias("cell"),
    )
    a = cells.filter(F.col("event_id") % 2 == 0).select(
        "user_id", "cell", F.col("event_id").alias("event_a"),
        F.col("s").alias("sa"), F.col("e").alias("ea"),
    )
    b = cells.filter(F.col("event_id") % 2 == 1).select(
        "user_id", "cell", F.col("event_id").alias("event_b"),
        F.col("s").alias("sb"), F.col("e").alias("eb"),
    )
    return (
        a.join(b, ["user_id", "cell"])
        .filter((F.col("sa") < F.col("eb")) & (F.col("sb") < F.col("ea")))
        .select(
            "user_id", "event_a", "event_b",
            (F.least("ea", "eb") - F.greatest("sa", "sb")).cast("bigint").alias("overlap_s"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# N-21b (r10): last-touch revenue attribution
# ---------------------------------------------------------------------------

TOUCH_TYPES = ("click", "view")  # attributable marketing touches


@query(
    "n21_attribution",
    f"""
    WITH seq AS (
        SELECT user_id, event_type, value,
               LAST_VALUE(CASE WHEN event_type IN ('click', 'view')
                               THEN event_type END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS touch
        FROM events
    ),
    p AS (
        SELECT COALESCE(touch, 'direct') AS channel,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM seq WHERE event_type = 'purchase'
    ),
    byc AS (
        SELECT channel,
               CAST(COUNT(*) AS BIGINT) AS n_purchases,
               CAST(SUM(cents) AS BIGINT) AS cents
        FROM p GROUP BY channel
    )
    SELECT channel, n_purchases,
           ROUND(CAST(cents AS DOUBLE) / 100.0, 2) AS revenue,
           ROUND(CAST(cents AS DOUBLE)
                 / CAST(SUM(cents) OVER () AS DOUBLE), 6) AS revenue_share
    FROM byc
    """,
)
def n21_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-21b (r10): LAST-TOUCH REVENUE ATTRIBUTION — every purchase's
    value credited to the user's most recent PRIOR marketing touch
    (click/view), 'direct' when none precedes it: the companion of
    ``n21_funnel`` (the funnel says where users drop; attribution says
    which touch the revenue that survived should thank). The carry is
    the classic frame-bounded ``last(..., ignorenulls)`` over
    ``ROWS UNBOUNDED PRECEDING .. 1 PRECEDING`` — strictly-before
    semantics, so a purchase row's own type can never self-attribute.

    Determinism: money quantizes to exact integer CENTS before any sum
    (pre-rounded fixed point — the order-exact-sum discipline); revenue
    and its share are each ONE terminal double division over exact
    integers, rounded 2dp / 6dp.

    Scale shape: one user_id-keyed window (the carry), one hash
    aggregate keyed by channel (alphabet-bounded), and a share window
    over the ≤|channels|-row RESULT — nothing global touches row-scale
    data."""
    ev = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type").isin(*TOUCH_TYPES), F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    p = (
        ev.select("user_id", "event_type", "value", touch.alias("touch"))
        .filter(F.col("event_type") == "purchase")
        .select(
            F.coalesce(F.col("touch"), F.lit("direct")).alias("channel"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
    )
    byc = p.groupBy("channel").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
        F.sum("cents").cast("bigint").alias("cents"),
    )
    tot = F.sum("cents").over(Window.partitionBy())
    return byc.select(
        "channel",
        "n_purchases",
        F.round(F.col("cents").cast("double") / F.lit(100.0), 2).alias("revenue"),
        F.round(F.col("cents").cast("double") / tot.cast("double"), 6).alias(
            "revenue_share"
        ),
    )


# ---------------------------------------------------------------------------
# N-26 (r11): JSONL ingest with dead-letter routing (semi-structured scan)
# ---------------------------------------------------------------------------

_JSONL_ORACLE = """
    WITH j AS (
        SELECT source,
               CASE WHEN doc_id % 9 = 4 THEN '#' ELSE '' END
               || '{"doc_id": ' || CAST(doc_id AS STRING)
               || ', "source": "'
               || CASE WHEN doc_id % 11 = 5 THEN 'rogue' ELSE source END
               || '", "n": ' || CAST(n_chars AS STRING) || '}' AS raw
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN json_valid(raw) THEN 1 ELSE 0 END) AS BIGINT)
               AS n_good,
           CAST(SUM(CASE WHEN json_valid(raw) THEN 0 ELSE 1 END) AS BIGINT)
               AS n_dead,
           CAST(SUM(CASE WHEN json_valid(raw)
                          AND json_extract_string(raw, '$.source') = source
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_source_match,
           CAST(SUM(CASE WHEN json_valid(raw)
                         THEN CAST(json_extract_string(raw, '$.n') AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS n_chars_total,
           CAST((2 * SUM(CASE WHEN json_valid(raw) THEN 0 ELSE 1 END) * 1000000
                 + COUNT(*)) // (2 * COUNT(*)) AS BIGINT) / 1000000.0
               AS dead_rate
    FROM j GROUP BY source
    """


@query("n26_jsonl_deadletter", _JSONL_ORACLE)
def n26_jsonl_deadletter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-26 (r11): SEMI-STRUCTURED JSONL INGEST WITH DEAD-LETTER ROUTING —
    the landing-zone scan every event pipeline starts with: parse each
    line as JSON (Spark: ``from_json``, the engine's PERMISSIVE
    semi-structured path — a malformed line yields a NULL struct instead
    of failing the job), route unparseable lines to the dead-letter
    accounting instead of silently dropping them, and reconcile the
    parsed payload against the envelope (``n_source_match`` — parsed
    source field == file-level source; the ``doc_id % 11 = 5`` slice
    embeds a contradicting source in VALID JSON so the reconciliation
    genuinely discriminates). Completes the O-4 error-router
    story for file scans: the reference dead-letters failed HTTP
    results; this dead-letters failed semi-structured rows.

    Fixture JSONL lines are synthesized by identical string concat in
    both engines (rule-5 portable pieces only) with a '#'-prefix
    corruption on the ``doc_id % 9 = 4`` slice — unambiguously invalid
    JSON under any parser, so Jackson (Spark) and DuckDB's JSON cannot
    disagree about validity. Dead rate is the rule-26b half-up micro
    division. Every output is an exact BIGINT or the micro-rate.

    Scale shape: one per-row projection (string build + one JSON parse)
    feeding a |sources|-group hash aggregate — scan-bound; the map-side
    partial reduces each executor to |sources| rows. No joins, no UDFs;
    from_json runs in the JVM inside whole-stage codegen."""
    docs = spread(read_table(spark, sf_dir, "documents"), "doc_id")
    line = F.concat(
        F.lit('{"doc_id": '),
        F.col("doc_id").cast("string"),
        F.lit(', "source": "'),
        # rogue-source slice: VALID JSON whose payload contradicts the
        # envelope — makes n_source_match a real extraction check, not an
        # identity with n_good (the mismatch a mis-routed upload produces)
        F.when(F.col("doc_id") % 11 == 5, F.lit("rogue")).otherwise(
            F.col("source")
        ),
        F.lit('", "n": '),
        F.col("n_chars").cast("string"),
        F.lit("}"),
    )
    raw = F.when(
        F.col("doc_id") % 9 == 4, F.concat(F.lit("#"), line)
    ).otherwise(line)
    parsed = F.from_json(raw, "doc_id BIGINT, source STRING, n BIGINT")
    j = docs.select("source", parsed.alias("p"))
    good = F.col("p.doc_id").isNotNull()
    agg = j.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum(F.when(good, 1).otherwise(0)).cast("bigint").alias("n_good"),
        F.sum(F.when(good, 0).otherwise(1)).cast("bigint").alias("n_dead"),
        F.sum(F.when(good & (F.col("p.source") == F.col("source")), 1).otherwise(0))
        .cast("bigint")
        .alias("n_source_match"),
        F.sum(F.when(good, F.col("p.n")).otherwise(0))
        .cast("bigint")
        .alias("n_chars_total"),
    )
    return agg.select(
        "source",
        "n_lines",
        "n_good",
        "n_dead",
        "n_source_match",
        "n_chars_total",
        (
            F.expr(
                "CAST((2 * n_dead * 1000000 + n_lines) div (2 * n_lines)"
                " AS BIGINT)"
            ).cast("double")
            / 1000000.0
        ).alias("dead_rate"),
    )


# ---------------------------------------------------------------------------
# X-9 (r11): k-anonymity / l-diversity release audit
# ---------------------------------------------------------------------------

K_ANON_MIN = 5   # minimum equivalence-class size (k-anonymity)
L_DIV_MIN = 3    # minimum distinct sensitive values per class (l-diversity)

_KANON_ORACLE = f"""
    WITH cls AS (
        SELECT c_nationkey AS nation,
               CAST(FLOOR(c_acctbal / 2000.0) AS BIGINT) AS acctbal_band,
               COUNT(*) AS k,
               COUNT(DISTINCT c_mktsegment) AS l
        FROM customer
        GROUP BY 1, 2
    )
    SELECT nation,
           acctbal_band,
           CAST(k AS BIGINT) AS k,
           CAST(l AS BIGINT) AS l,
           CAST(CASE WHEN k < {K_ANON_MIN} THEN 1 ELSE 0 END AS INTEGER)
               AS viol_k,
           CAST(CASE WHEN l < {L_DIV_MIN} THEN 1 ELSE 0 END AS INTEGER)
               AS viol_l
    FROM cls
    WHERE k < {K_ANON_MIN} OR l < {L_DIV_MIN}
    """


@query("x9_k_anonymity_audit", _KANON_ORACLE)
def x9_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-9 (r11): K-ANONYMITY / L-DIVERSITY RELEASE AUDIT (Sweeney,
    IJUFKS 2002; Machanavajjhala et al., TKDD 2007) — the privacy gate a
    dataset release runs before publishing joinable records: group the
    table by its quasi-identifier projection (here nation × account-
    balance band — the attributes an adversary can link from outside)
    and flag every equivalence class that is re-identifying (k <
    K_ANON_MIN members) or sensitive-value-homogeneous (fewer than
    L_DIV_MIN distinct market segments — l-diversity guards the case
    where a class is large but everyone in it shares the sensitive
    value). Emits the violating classes with their k and l so the
    release pipeline can suppress or generalize exactly those rows —
    the companion gate to ``x4_pii_redact`` (which scrubs direct
    identifiers; this audits indirect ones).

    Determinism: the balance band is FLOOR(acctbal / 2000.0) on the
    double — floor semantics agree across engines for negative balances
    (integer ``div`` would not: rule 28 — Spark truncates toward zero
    where DuckDB floors, so the band expression deliberately stays in
    double floor); counts are exact BIGINTs.

    Scale shape: ONE hash aggregate keyed by the QI projection
    (map-side partial combine; class count ≪ rows) + a per-row filter.
    No joins, no windows — scan-bound at any table size."""
    return kanon_violations(read_table(spark, sf_dir, "customer"))


def kanon_violations(cust: DataFrame) -> DataFrame:
    """Core of ``x9_k_anonymity_audit`` over an arbitrary
    (c_nationkey, c_acctbal, c_mktsegment) frame — split out so crafted
    class structures and the negative-balance floor pin exercise the
    SHIPPED expressions in pytest (the cdc_fold pattern)."""
    cls = cust.groupBy(
        F.col("c_nationkey").alias("nation"),
        F.floor(F.col("c_acctbal") / F.lit(2000.0))
        .cast("bigint")
        .alias("acctbal_band"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.countDistinct("c_mktsegment").cast("bigint").alias("l"),
    )
    return cls.filter(
        (F.col("k") < K_ANON_MIN) | (F.col("l") < L_DIV_MIN)
    ).select(
        "nation",
        "acctbal_band",
        "k",
        "l",
        F.when(F.col("k") < K_ANON_MIN, 1).otherwise(0).cast("int").alias("viol_k"),
        F.when(F.col("l") < L_DIV_MIN, 1).otherwise(0).cast("int").alias("viol_l"),
    )


# ---------------------------------------------------------------------------
# X-9 (r14): recursive (c,l)-diversity — the skew-robust strengthening
# between distinct-l and t-closeness
# ---------------------------------------------------------------------------

RC_LDIV_L = 3   # the l of recursive (c,l)-diversity (matches L_DIV_MIN)
RC_LDIV_C = 2   # the c: r1 must not exceed c · Σ_{i≥l} r_i

_RCLDIV_ORACLE = f"""
    WITH cl AS (
        SELECT CAST(c_nationkey AS BIGINT) AS nation,
               CAST(FLOOR(c_acctbal / 2000.0) AS BIGINT) AS acctbal_band,
               c_mktsegment AS seg,
               CAST(COUNT(*) AS BIGINT) AS ncs
        FROM customer GROUP BY 1, 2, 3
    ),
    r AS (
        SELECT nation, acctbal_band, ncs,
               ROW_NUMBER() OVER (PARTITION BY nation, acctbal_band
                                  ORDER BY ncs DESC, seg) AS rk
        FROM cl
    ),
    agg AS (
        SELECT nation, acctbal_band,
               CAST(SUM(ncs) AS BIGINT) AS k,
               CAST(COUNT(*) AS BIGINT) AS m,
               CAST(MAX(CASE WHEN rk = 1 THEN ncs END) AS BIGINT) AS r1,
               CAST(SUM(CASE WHEN rk >= {RC_LDIV_L} THEN ncs ELSE 0 END)
                    AS BIGINT) AS tail_sum
        FROM r GROUP BY 1, 2
    )
    SELECT nation, acctbal_band, k, m, r1, tail_sum,
           CAST(CASE WHEN m < {RC_LDIV_L} THEN 1 ELSE 0 END AS INTEGER)
               AS viol_m,
           CAST(CASE WHEN m >= {RC_LDIV_L} AND r1 > {RC_LDIV_C} * tail_sum
                     THEN 1 ELSE 0 END AS INTEGER) AS viol_c
    FROM agg
    WHERE m < {RC_LDIV_L} OR r1 > {RC_LDIV_C} * tail_sum
    """


@query("x9_recursive_ldiversity", _RCLDIV_ORACLE)
def x9_recursive_ldiversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-9 (r14): RECURSIVE (c,l)-DIVERSITY audit (Machanavajjhala et
    al., TKDD 2007 §4) — the skew-robust rung between the distinct-l
    check inside ``x9_k_anonymity_audit`` and ``x9_t_closeness``:
    distinct-l is satisfied by one dominant sensitive value plus l−1
    token occurrences, so an adversary still learns the dominant value
    with high confidence. The recursive form sorts each equivalence
    class's sensitive-value counts r_1 ≥ … ≥ r_m and requires
    r_1 ≤ c · (r_l + … + r_m): the head cannot dominate the tail.
    Emits the violating classes (same nation × balance-band QI
    projection as the sibling audits) with k, m, r_1, the tail sum, and
    which condition failed — exactly the rows a release pipeline must
    suppress or generalize.

    Determinism: counts are exact BIGINTs; the sort rank breaks count
    ties by segment name, but r1/tail_sum are TIE-INSENSITIVE (r1 is
    the max count; the tail sum over ranks ≥ l depends only on the
    multiset of counts — any tie straddling the l boundary contributes
    the same total either way), so no rounded-rank hazard exists.

    Scale shape: one hash aggregate keyed by (QI, segment), one
    class-partitioned window over class×segment rows (≪ corpus), one
    class-keyed aggregate. No joins against the fact table."""
    cl = (
        read_table(spark, sf_dir, "customer")
        .groupBy(
            F.col("c_nationkey").cast("bigint").alias("nation"),
            F.floor(F.col("c_acctbal") / F.lit(2000.0))
            .cast("bigint")
            .alias("acctbal_band"),
            F.col("c_mktsegment").alias("seg"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("ncs"))
    )
    w = Window.partitionBy("nation", "acctbal_band").orderBy(
        F.col("ncs").desc(), F.col("seg")
    )
    r = cl.select("nation", "acctbal_band", "ncs", F.row_number().over(w).alias("rk"))
    agg = r.groupBy("nation", "acctbal_band").agg(
        F.sum("ncs").cast("bigint").alias("k"),
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.max(F.when(F.col("rk") == 1, F.col("ncs"))).cast("bigint").alias("r1"),
        F.sum(F.when(F.col("rk") >= RC_LDIV_L, F.col("ncs")).otherwise(0))
        .cast("bigint")
        .alias("tail_sum"),
    )
    return agg.filter(
        (F.col("m") < RC_LDIV_L) | (F.col("r1") > RC_LDIV_C * F.col("tail_sum"))
    ).select(
        "nation",
        "acctbal_band",
        "k",
        "m",
        "r1",
        "tail_sum",
        F.when(F.col("m") < RC_LDIV_L, 1).otherwise(0).cast("int").alias("viol_m"),
        F.when(
            (F.col("m") >= RC_LDIV_L) & (F.col("r1") > RC_LDIV_C * F.col("tail_sum")),
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("viol_c"),
    )


# ---------------------------------------------------------------------------
# X-9 (r14): differential-privacy budget accountant — the rung ABOVE the
# syntactic ladder (k-anon / l-div / t-closeness audit a single release;
# DP composition accounts for a SEQUENCE of releases)
# ---------------------------------------------------------------------------

#: per-release ε in micro-units, derived from doc_id via a Knuth
#: multiplicative mixer so the distribution is prefix-stable across SFs
#: (a plain ``doc_id % m`` would give small SFs a truncated ε range and
#: no fixed cap could split channels at every SF — scouted r14).
#: doc_id is reduced mod 29000 BEFORE the multiply (ADVICE r14 item 3):
#: ((doc_id % m)·C) % m ≡ (doc_id·C) % m for doc_id ≥ 0, so the values
#: are bit-identical, while the product stays ≤ 28999·C ≈ 7.7e13 —
#: a bare doc_id·C would silently wrap plain BIGINT in Spark (and error
#: in DuckDB) for doc_id above ~3.47e9, plausible at 100 TB (rule 27).
DP_EPS_SQL = "CAST(5000 + ((doc_id % 29000) * 2654435761) % 29000 AS BIGINT)"
#: per-release ε allowance (micro): channel over-cap iff Σε > k·allowance.
DP_ALLOW_MICRO = 19_500
#: δ' for the advanced-composition term: 1e-6 ⇒ ln(1/δ') = ln(1e6).
DP_LN_INV_DELTA = "ln(1000000.0)"

_DP_BUDGET_ORACLE = f"""
    WITH rel AS (
        SELECT source, {DP_EPS_SQL} AS eps_micro FROM documents
    ),
    ch AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(eps_micro) AS BIGINT) AS basic_micro,
               CAST(MAX(eps_micro) AS BIGINT) AS eps_max_micro
        FROM rel GROUP BY source
    )
    SELECT source, k, basic_micro, eps_max_micro,
           ROUND((eps_max_micro / 1000000.0)
                     * sqrt(2 * k * {DP_LN_INV_DELTA})
                 + k * (eps_max_micro / 1000000.0)
                     * (exp(eps_max_micro / 1000000.0) - 1), 6) AS adv_eps,
           ROUND(LEAST(basic_micro / 1000000.0,
                       (eps_max_micro / 1000000.0)
                           * sqrt(2 * k * {DP_LN_INV_DELTA})
                       + k * (eps_max_micro / 1000000.0)
                           * (exp(eps_max_micro / 1000000.0) - 1)), 6)
               AS chosen_eps,
           CAST(CASE WHEN basic_micro > k * {DP_ALLOW_MICRO}
                     THEN 1 ELSE 0 END AS INTEGER) AS over_cap
    FROM ch
    """


@query("x9_dp_budget", _DP_BUDGET_ORACLE)
def x9_dp_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-9 (r14): DIFFERENTIAL-PRIVACY BUDGET ACCOUNTANT (Dwork & Roth
    2014, Thm 3.16/3.20) — the governance rung ABOVE the syntactic
    ladder: k-anonymity / (c,l)-diversity / t-closeness audit ONE
    release; a data platform issuing a SEQUENCE of per-channel releases
    must track cumulative privacy loss. Per source channel (each doc =
    one ε-DP release, ε derived deterministically per release): release
    count k, exact basic composition Σε (integer micro-units), the
    homogeneous advanced-composition bound at the channel's worst ε —
    ε_max·√(2k·ln(1/δ')) + k·ε_max·(e^{{ε_max}}−1), the k-large regime
    where it beats Σε — the accountant's chosen bound (least of the
    two), and the over-cap flag a release gate reads.

    Determinism: Σε and the flag are EXACT integers (the flag compares
    basic_micro to k·allowance — never a float); the advanced bound is
    transcendental (√, ln, exp) so its terminal ROUND(...,6) is
    tie-free (CLAUDE.md rule 26b), and its inputs (ε_max/10⁶, k) are
    bit-identical doubles in both engines. The ε mixer is
    prefix-stable (Knuth multiplicative) so the over-cap population
    splits both ways at EVERY SF — pinned in tests.

    Scale shape: one hash aggregate keyed by channel (map-side combine)
    over a scan; the bound arithmetic runs on the ~20-row channel
    table. At 100 TB of release logs this stays scan-bound."""
    rel = read_table(spark, sf_dir, "documents").select(
        "source", F.expr(DP_EPS_SQL).alias("eps_micro")
    )
    ch = rel.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("eps_micro").cast("bigint").alias("basic_micro"),
        F.max("eps_micro").cast("bigint").alias("eps_max_micro"),
    )
    eps_max = F.col("eps_max_micro") / F.lit(1000000.0)
    adv_raw = eps_max * F.sqrt(2 * F.col("k") * F.log(F.lit(1000000.0))) + F.col(
        "k"
    ) * eps_max * (F.exp(eps_max) - 1)
    basic_raw = F.col("basic_micro") / F.lit(1000000.0)
    return ch.select(
        "source",
        "k",
        "basic_micro",
        "eps_max_micro",
        F.round(adv_raw, 6).alias("adv_eps"),
        F.round(F.least(basic_raw, adv_raw), 6).alias("chosen_eps"),
        F.when(F.col("basic_micro") > F.col("k") * DP_ALLOW_MICRO, 1)
        .otherwise(0)
        .cast("int")
        .alias("over_cap"),
    )


# ---------------------------------------------------------------------------
# X-9 (r13): t-closeness — the third rung of the privacy ladder
# (k-anonymity → l-diversity → t-closeness)
# ---------------------------------------------------------------------------

#: maximum tolerated distance (micro-units) between a class's sensitive
#: distribution and the global one — 0.4 splits the fixture's 150
#: classes 121/29, so both polarities are populated (scouted r13)
T_CLOSE_MAX_MICRO = 400_000

_TCLOSE_ORACLE = f"""
    WITH g AS (
        SELECT c_mktsegment AS seg, CAST(COUNT(*) AS BIGINT) AS gs
        FROM customer GROUP BY 1
    ),
    nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM customer),
    cl AS (
        SELECT CAST(c_nationkey AS BIGINT) AS nation,
               CAST(FLOOR(c_acctbal / 2000.0) AS BIGINT) AS acctbal_band,
               c_mktsegment AS seg,
               CAST(COUNT(*) AS BIGINT) AS ncs
        FROM customer GROUP BY 1, 2, 3
    ),
    kk AS (
        SELECT nation, acctbal_band, CAST(SUM(ncs) AS BIGINT) AS k
        FROM cl GROUP BY 1, 2
    ),
    s AS (
        SELECT cl.nation, cl.acctbal_band, ANY_VALUE(kk.k) AS k,
               ANY_VALUE(nt.n) AS n,
               CAST(SUM(ABS(cl.ncs * nt.n - g.gs * kk.k)) AS BIGINT) AS sp,
               CAST(SUM(g.gs) AS BIGINT) AS gpres
        FROM cl
        JOIN g USING (seg)
        JOIN kk ON kk.nation = cl.nation AND kk.acctbal_band = cl.acctbal_band
        CROSS JOIN nt
        GROUP BY 1, 2
    ),
    t AS (
        SELECT nation, acctbal_band, k,
               CAST((2::HUGEINT * (sp + (n - gpres) * k) * 1000000
                     + 2::HUGEINT * k * n)
                    // (4::HUGEINT * k * n) AS BIGINT) AS t_micro
        FROM s
    )
    SELECT nation, acctbal_band, k, t_micro,
           CAST(CASE WHEN t_micro > {T_CLOSE_MAX_MICRO} THEN 1 ELSE 0 END
                AS INTEGER) AS viol_t
    FROM t
    """


@query("x9_t_closeness", _TCLOSE_ORACLE)
def x9_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-9 (r13): T-CLOSENESS release audit (Li, Li & Venkatasubramanian,
    ICDE 2007) — the third rung of the privacy ladder the repo's
    ``x9_k_anonymity_audit`` starts (k-anonymity, l-diversity): a class
    can be large (k OK) and sensitive-value-diverse (l OK) and STILL
    leak — if its sensitive-value DISTRIBUTION differs sharply from the
    global one, membership itself is informative. Per equivalence class
    (the same nation × balance-band quasi-identifier projection), the
    variation distance between the class's market-segment distribution
    and the corpus-wide one — for a categorical attribute under unit
    ground distance, the EMD of the t-closeness paper reduces exactly to
    total variation: t = ½·Σ_s |n_cs/k − g_s/N|.

    Determinism (rule 26b/27/28): everything is exact integers — the TV
    sum runs over the common denominator k·N (S = Σ|n_cs·N − g_s·k|,
    with absent segments folded closed-form as (N − Σ_present g_s)·k
    instead of a class×segment cross join), and t_micro is the integer
    HALF-UP division S·10⁶ / (2kN) computed in 128-bit space (HUGEINT /
    DECIMAL(38,0)): k·N·10⁶ passes int64 at ~4.6e12 customer-rows-
    squared, i.e. well inside 100 TB territory. Operands non-negative,
    so ``div`` ≡ ``//``.

    Scale shape: ONE hash aggregate keyed by the (QI, segment)
    projection (map-side combine; class×segment ≪ rows), then
    class-grain joins (≪ rows) against the broadcast 5-row segment
    table and the 1-row total. No windows, no corpus joins — scan-bound
    at any table size."""
    return tcloseness_classes(read_table(spark, sf_dir, "customer"))


def tcloseness_classes(cust: DataFrame) -> DataFrame:
    """Core of ``x9_t_closeness`` over an arbitrary (c_nationkey,
    c_acctbal, c_mktsegment) frame — split out so crafted distributions
    (a class exactly mirroring the global mix ⇒ t = 0; a single-segment
    class ⇒ t = 1 − g_s/N) pin the shipped expressions in pytest (the
    ``kanon_violations`` pattern)."""
    g = cust.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.count(F.lit(1)).cast("bigint").alias("gs")
    )
    nt = cust.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    cl = cust.groupBy(
        F.col("c_nationkey").cast("bigint").alias("nation"),
        F.floor(F.col("c_acctbal") / F.lit(2000.0)).cast("bigint").alias("acctbal_band"),
        F.col("c_mktsegment").alias("seg"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("ncs"))
    kk = cl.groupBy("nation", "acctbal_band").agg(
        F.sum("ncs").cast("bigint").alias("k")
    )
    s = (
        cl.join(F.broadcast(g), "seg")
        .join(kk, ["nation", "acctbal_band"])
        .crossJoin(F.broadcast(nt))
        .groupBy("nation", "acctbal_band")
        .agg(
            F.first("k").alias("k"),
            F.first("n").alias("n"),
            F.sum(F.abs(F.col("ncs") * F.col("n") - F.col("gs") * F.col("k")))
            .cast("bigint")
            .alias("sp"),
            F.sum("gs").cast("bigint").alias("gpres"),
        )
    )
    t = s.select(
        "nation",
        "acctbal_band",
        "k",
        F.expr(
            "CAST((2 * CAST(sp + (n - gpres) * k AS DECIMAL(38,0)) * 1000000"
            " + 2 * CAST(k AS DECIMAL(38,0)) * n)"
            " div (4 * CAST(k AS DECIMAL(38,0)) * n) AS BIGINT)"
        ).alias("t_micro"),
    )
    return t.select(
        "nation",
        "acctbal_band",
        "k",
        "t_micro",
        F.when(F.col("t_micro") > T_CLOSE_MAX_MICRO, 1)
        .otherwise(0)
        .cast("int")
        .alias("viol_t"),
    )


# ---------------------------------------------------------------------------
# N-21c (r12): retention cohorts — the third event-analytics staple
# (funnel, attribution, retention)
# ---------------------------------------------------------------------------


@query(
    "n21_retention_cohorts",
    """
    WITH ev AS (SELECT user_id, ts FROM events),
    firsts AS (
        SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
        FROM ev GROUP BY user_id
    ),
    active AS (
        SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS w
        FROM ev
    ),
    cells AS (
        SELECT f.cohort_week,
               CAST(date_diff('day', f.cohort_week, a.w) // 7 AS BIGINT) AS week_offset,
               CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active_users
        FROM active a JOIN firsts f ON a.user_id = f.user_id
        GROUP BY 1, 2
    ),
    sizes AS (
        SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size
        FROM firsts GROUP BY cohort_week
    )
    SELECT c.cohort_week, c.week_offset, c.n_active_users, s.cohort_size,
           CAST((2 * c.n_active_users * 1000000 + s.cohort_size)
                // (2 * s.cohort_size) AS BIGINT) AS retention_micro
    FROM cells c JOIN sizes s ON c.cohort_week = s.cohort_week
    """,
)
def n21_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-21 (r12): COHORT RETENTION — the third event-analytics staple
    beside the funnel and the attribution split: users cohorted by the
    ISO week of their FIRST event; each (cohort, week-offset) cell
    counts the cohort members active that week, with retention as an
    exact half-up micro ratio against the cohort size (rule 26 — no
    float division). Week offsets are integer DAY differences div 7:
    both endpoints are Monday-truncated DATEs, so the difference is an
    exact multiple of 7 and non-negative (Spark ``div`` == DuckDB
    ``//``, rule 28 n/a). All date work happens on the NTZ timestamps
    ``read_table`` produces (rule 7) and emits DATE — no session-TZ
    surface anywhere.

    Scale shape: two user-keyed aggregates (first-seen + distinct
    active weeks) off one scan; the cells join is user-keyed against
    the ≪-corpus firsts table; the sizes join keys on the tiny cohort
    dimension. The offset-0 diagonal is every cohort's 100%-retention
    row by construction — a cheap sanity pin."""
    ev = read_table(spark, sf_dir, "events").select("user_id", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("w")
    ).distinct()
    cells = (
        active.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            # integer division, not float-divide-then-truncate (ADVICE
            # r12): both endpoints are Monday-truncated so the diff is a
            # multiple of 7 today, but `div` keeps any future drift exact
            F.expr("datediff(w, cohort_week) div 7")
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_active_users"))
    )
    sizes = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    out = cells.join(sizes, "cohort_week")
    return out.select(
        "cohort_week",
        "week_offset",
        "n_active_users",
        "cohort_size",
        F.expr(
            "CAST((2 * n_active_users * 1000000 + cohort_size)"
            " div (2 * cohort_size) AS BIGINT)"
        ).alias("retention_micro"),
    )
