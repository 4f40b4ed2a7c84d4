"""Bucketed table layout: exchange-free co-located joins (SCALE.md).

At 100 TB the dominant cost of a repeated fact⋈fact join (lineitem ⋈
orders on orderkey, every TPC-H run) is re-shuffling both sides on the
key. Spark's bucketing writes each table pre-hash-partitioned into a
fixed number of bucket FILES per partition (``bucketBy``), and the scan
then reports that hash partitioning to the planner — a join of two
tables bucketed on the same key with the same bucket count plans a
SortMergeJoin with ZERO Exchange on either side (plan-asserted in
tests/test_scale_layout.py). ``sortBy`` additionally pre-orders rows
inside each bucket so the SMJ's per-bucket sort is cheap or elided.

This is the storage-level sibling of ``io.spread(df, key)`` (rule 20):
spread removes the exchange within one job; bucketing removes it across
JOBS — pay the shuffle once at write time, never again at read time.
The bucket count is the parallelism floor for downstream joins, so at
100 TB it is sized like shuffle partitions (~2-3× total cores).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 8, sort: bool = True
) -> None:
    """Persist ``df`` as a parquet table bucketed (and bucket-sorted) by
    ``key``. Tables land in the session warehouse; both sides of a
    co-located join must use the SAME key and bucket count."""
    w = df.write.format("parquet").mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_equi_join(spark: SparkSession, left: str, right: str, key: str) -> DataFrame:
    """Equi-join two same-key/same-count bucketed tables: the planner
    reads the bucket spec from the catalog and omits both exchanges."""
    return spark.table(left).join(spark.table(right), key)
