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
