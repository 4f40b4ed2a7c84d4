"""TPC-H completion set (round 3): the 11 queries relational.py didn't
cover — q2, q5, q6, q8, q9, q11, q15, q16, q19, q20 (q1 is n4's pricing
summary). The driver fixtures carry no ``partsupp`` table, so the five
partsupp-dependent queries (q2/q9/q11/q16/q20) are SHAPE-FAITHFUL
adaptations that derive the part↔supplier association from lineitem —
each docstring states exactly what was substituted. Everything else is
the standard query over the reduced schema.

Scale notes apply throughout: nation/region are broadcast always;
part/supplier scale with SF and join on their keys (shuffle-keyed, never
broadcast); all money aggregates follow canonical policy (round(2) money,
round(6) ratios; thresholds compared on deterministic values — MIN/MAX
and integer-valued quantity sums are order-insensitive, hence bit-exact
across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_active911_spark.io import read_table
from etl_active911_spark.plans.registry import query


@query(
    "tpch_q5_local_supplier_volume",
    """
    SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 (faithful): revenue from LOCAL supply chains — the supplier join
    carries the extra c_nationkey = s_nationkey condition, the classic
    non-key equi-predicate riding a key join. Region/nation broadcast;
    customer/orders/lineitem/supplier shuffle on their join keys only."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    customer = read_table(spark, sf_dir, "customer")
    supplier = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "tpch_q6_forecast_revenue",
    """
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 (faithful): the pure scan-side query — every predicate and both
    columns push into the parquet scan; the whole plan is one codegen
    stage ending in a single-row partial+final sum."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "tpch_q8_market_share",
    """
    SELECT o_year,
           ROUND(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / SUM(volume), 6) AS mkt_share
    FROM (
        SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
    ) t
    GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 (faithful on the reduced schema): national market share — the
    widest join in the suite (7 tables, nation twice under different
    roles) feeding a conditional-share ratio. Part is filtered before the
    join so the fact stream shrinks at the scan."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supplier = read_table(spark, sf_dir, "supplier")
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    t = (
        part.join(li, F.col("p_partkey") == F.col("l_partkey"))
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "nation",
        )
    )
    return t.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(0.0))
            / F.sum("volume"),
            6,
        ).alias("mkt_share")
    )


@query(
    "tpch_q9_product_profit",
    """
    SELECT nation, o_year, ROUND(SUM(amount), 2) AS sum_profit
    FROM (
        SELECT n_name AS nation,
               CAST(YEAR(o_orderdate) AS INT) AS o_year,
               l_extendedprice * (1 - l_discount)
                 - 0.6 * p_retailprice * l_quantity AS amount
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
    ) t
    GROUP BY nation, o_year
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 ADAPTED: the fixtures have no partsupp, so ``ps_supplycost`` is
    substituted by the deterministic surrogate ``0.6 * p_retailprice``
    (same join shape, same group-by, same LIKE-filtered part scan). The
    arithmetic replicates the SQL's IEEE op order term-for-term
    (CLAUDE.md rule 11): ``(0.6 * p_retailprice) * l_quantity``."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supplier = read_table(spark, sf_dir, "supplier")
    orders = read_table(spark, sf_dir, "orders")
    nation = read_table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - (
        F.lit(0.6) * F.col("p_retailprice")
    ) * F.col("l_quantity")
    return (
        part.join(li, F.col("p_partkey") == F.col("l_partkey"))
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).alias("sum_profit"))
    )


@query(
    "tpch_q2_min_cost_supplier",
    """
    WITH assoc AS (
        SELECT l_partkey, l_suppkey,
               MIN(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eur AS (
        SELECT s_suppkey, s_acctbal, s_name, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    ),
    cand AS (
        SELECT p_partkey, s_acctbal, s_name, n_name, unit_cost,
               MIN(unit_cost) OVER (PARTITION BY p_partkey) AS mn
        FROM assoc
        JOIN eur  ON l_suppkey = s_suppkey
        JOIN part ON p_partkey = l_partkey
        WHERE p_size = 15 AND p_type = 'STANDARD'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey,
           ROUND(unit_cost, 6) AS unit_cost
    FROM cand WHERE unit_cost = mn
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 ADAPTED: no partsupp, so the part↔supplier association (and its
    cost) derives from lineitem — ``MIN(l_extendedprice / l_quantity)``
    per (part, supplier) stands in for ps_supplycost. The shape is intact:
    min-cost-per-part via the correlated minimum, realized as a window MIN
    (one shuffle) instead of a rejoin. The equality filter compares EXACT
    doubles: one IEEE division + order-insensitive MIN is bit-identical
    across engines, so no rounding is needed before the comparison."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    supplier = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    assoc = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    eur = (
        supplier.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    cand = (
        assoc.join(eur, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
        .withColumn("mn", F.min("unit_cost").over(Window.partitionBy("p_partkey")))
    )
    return (
        cand.filter(F.col("unit_cost") == F.col("mn"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            F.round("unit_cost", 6).alias("unit_cost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@query(
    "tpch_q11_important_parts",
    """
    WITH pv AS (
        SELECT l_partkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS value
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_7'
        GROUP BY l_partkey
    )
    SELECT l_partkey AS partkey, value
    FROM pv
    WHERE value > (SELECT ROUND(SUM(value) * 0.001, 2) FROM pv)
    """,
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 ADAPTED: part "stock value" per nation derives from lineitem
    revenue (no partsupp availqty/supplycost). The shape is intact: a
    grouped value, thresholded against a scalar fraction of the total —
    realized as a 1-row broadcast cross join, NOT a driver collect, so
    the same plan works when pv has a billion parts."""
    li = read_table(spark, sf_dir, "lineitem")
    supplier = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    pv = (
        li.join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "value"
            )
        )
    )
    thr = pv.agg(F.round(F.sum("value") * 0.001, 2).alias("thr"))
    return (
        pv.crossJoin(F.broadcast(thr))
        .filter(F.col("value") > F.col("thr"))
        .select(F.col("l_partkey").alias("partkey"), "value")
    )


@query(
    "tpch_q15_top_supplier",
    """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 (faithful): the view-then-max pattern. The max is taken over
    ROUNDED revenues (canonical policy 4) so the equality filter is
    deterministic cross-engine; the scalar max rides a 1-row broadcast.
    All suppliers achieving the max are returned (TPC-H allows ties)."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    supplier = read_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        supplier.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "tpch_q16_part_supplier_counts",
    """
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) a
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5' AND p_type <> 'MEDIUM'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def tpch_q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 ADAPTED: the part↔supplier association is the DISTINCT
    (l_partkey, l_suppkey) projection of lineitem (no partsupp), and the
    original 'complaints' supplier exclusion becomes the deterministic
    negative-acctbal predicate. Shape intact: distinct-pair build, dim
    filter, anti-join exclusion, count-distinct rollup."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "MEDIUM")
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    bad_supp = read_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    assoc = li.select("l_partkey", "l_suppkey").distinct()
    return (
        assoc.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(bad_supp, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q19_discounted_revenue",
    """
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#2' AND p_size >= 1 AND p_size <= 5
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#13' AND p_size >= 1 AND p_size <= 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#24' AND p_size >= 1 AND p_size <= 15
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape (reduced schema: brand/size/quantity triplets instead of
    container/shipmode): the OR-of-ANDs predicate that straddles both join
    sides — Catalyst pushes the per-side conjuncts it can derive
    (p_brand IN (...), l_quantity ranges) below the join and keeps the
    disjunction as the join-time filter."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#24")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "tpch_q20_promotion_suppliers",
    """
    WITH shipped AS (
        SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l_partkey, l_suppkey
    ),
    tot AS (SELECT l_partkey AS t_partkey, SUM(qty) AS total_qty
            FROM shipped GROUP BY l_partkey),
    cand AS (
        SELECT DISTINCT sh.l_suppkey
        FROM shipped sh
        JOIN part ON p_partkey = sh.l_partkey
        JOIN tot  ON t_partkey = sh.l_partkey
        WHERE p_name LIKE 'small%' AND sh.qty > 0.5 * total_qty
    )
    SELECT s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_4'
      AND s_suppkey IN (SELECT l_suppkey FROM cand)
    """,
)
def tpch_q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 ADAPTED: 'suppliers with excess availability' becomes 'suppliers
    who shipped more than half a part's yearly volume' — the association
    and quantities come from lineitem (no partsupp availqty). The
    correlated half-of-total threshold compares EXACT values: l_quantity
    is integer-valued, so its sums are exact in doubles regardless of
    order. Shape intact: grouped build, correlated threshold, semi-join
    into the nation-filtered supplier dim."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    part = read_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    supplier = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_4")
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(F.sum("l_quantity").alias("qty"))
    tot = shipped.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("qty").alias("total_qty")
    )
    cand = (
        shipped.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(tot, F.col("t_partkey") == F.col("l_partkey"))
        .filter(F.col("qty") > 0.5 * F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supplier.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(cand, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "n_name")
    )
