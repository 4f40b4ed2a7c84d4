"""Layout-driven data skipping: hard plan evidence that (a) a
partition-keyed layout prunes whole directories before any task launches
and (b) a sort-clustered layout pushes min/max range predicates into the
parquet scan. At 100 TB these two knobs — partition column choice and
within-partition sort order — decide whether a selective query reads
gigabytes or the whole lake; SCALE.md invariant 8 records the policy,
these tests pin the mechanism.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_active911_spark.io import read_table
from tests.conftest import SF_SMOKE


def _scan_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _scan_metrics(df) -> dict[str, int]:
    """SQL metrics of the (single) scan leaf AFTER the frame itself has
    been executed via .collect() — Dataset.count() would build a separate
    plan and leave these at zero."""
    leaf = df._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
    out: dict[str, int] = {}
    it = leaf.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        out[kv._1()] = kv._2().value()
    return out


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Reading one l_returnflag from a flag-partitioned layout must show a
    PartitionFilter (directory pruning, no file of other flags opened) and
    match the unpartitioned filter result exactly."""
    li = read_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    out = str(tmp_path / "li_by_flag")
    li.write.partitionBy("l_returnflag").parquet(out)

    got = spark.read.parquet(out).filter(F.col("l_returnflag") == "R")
    plan = _scan_plan(got)
    assert "PartitionFilters" in plan and "l_returnflag" in plan.split("PartitionFilters")[1][:200], (
        plan[:3000]
    )
    # Directory pruning is visible in the executed scan's metrics: of the
    # three l_returnflag partitions written, exactly one is read.
    rows = got.collect()
    metrics = _scan_metrics(got)
    assert metrics["numPartitions"] == 1, metrics
    assert len(rows) == li.filter(F.col("l_returnflag") == "R").count()


def test_sorted_layout_pushes_range_predicate(spark, tmp_path):
    """A range-partitioned + sorted-within-partitions layout clusters
    l_orderkey so parquet row-group min/max stats line up with range
    predicates; the scan must show the pushed filters (PushedFilters) and
    with them prune most input — the mechanism behind 'sort your fact
    table on the dominant filter key'."""
    li = read_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    out = str(tmp_path / "li_sorted")
    (
        li.repartitionByRange(8, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.parquet(out)
    )

    hi = li.agg(F.max("l_orderkey")).collect()[0][0]
    got = spark.read.parquet(out).filter(F.col("l_orderkey") > hi - 10)
    plan = _scan_plan(got)
    pushed = plan.split("PushedFilters")[1][:200] if "PushedFilters" in plan else ""
    assert "GreaterThan(l_orderkey" in pushed, plan[:3000]
    assert got.count() == li.filter(F.col("l_orderkey") > hi - 10).count()


def test_bucketed_join_plans_no_exchange(spark, tmp_path):
    """io.write_bucketed: joining two tables bucketed on the same key with
    the same bucket count must plan with ZERO shuffle exchanges on the
    join (the repeated-join amortization story in SCALE.md) — and the
    join result must equal the plain-parquet join."""
    from etl_active911_spark.io import write_bucketed

    orders = read_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice")
    li = read_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    try:
        write_bucketed(
            orders, "t_orders_b", "o_orderkey", 8, path=str(tmp_path / "ob")
        )
        write_bucketed(
            li.withColumnRenamed("l_orderkey", "o_orderkey"),
            "t_lineitem_b",
            "o_orderkey",
            8,
            path=str(tmp_path / "lb"),
        )
        a = spark.table("t_orders_b")
        b = spark.table("t_lineitem_b")
        joined = a.join(b, "o_orderkey")
        # at fixture size the planner prefers broadcast (which ignores the
        # bucket spec); disable it to expose the shape a TB-scale join
        # takes — the one bucketing exists for
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan, plan[:3000]
            assert "Exchange hashpartitioning" not in plan, plan[:3000]
            assert "Bucketed: true" in plan, plan[:3000]
            want = orders.join(
                li.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
            ).count()
            assert joined.count() == want
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
