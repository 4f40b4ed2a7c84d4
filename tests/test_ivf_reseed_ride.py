"""Index-riding IVF maintenance (r15, VERDICT r14 item 3): the reseed
planner that reads the PERSISTED ``ivf_write_index2`` layout must (1)
reproduce the refit planner's output bit-for-bit on the fixture, (2)
show partition-pruned, column-pruned index reads in its physical plan,
and (3) pay inventory-sized work — no Lloyd refit, no embedding math.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def index_path(spark, tmp_path_factory):
    from etl_active911_spark.operators.similarity import ivf_write_index2

    path = str(tmp_path_factory.mktemp("ivf2") / "index")
    ivf_write_index2(spark, SF_ORACLE, path)
    return path


def test_ride_equals_refit(spark, index_path):
    """THE pin the verdict asked for: riding the index == re-fitting
    from raw embeddings, every column, every row."""
    from etl_active911_spark.operators.similarity import (
        ivf_reseed_plan_from_index,
        x3_ann_ivf_reseed_plan,
    )

    ride = {tuple(r) for r in ivf_reseed_plan_from_index(spark, index_path).collect()}
    refit = {tuple(r) for r in x3_ann_ivf_reseed_plan(spark, SF_ORACLE).collect()}
    assert ride == refit
    assert len(ride) > 0


def test_ride_plan_is_pruned(spark, index_path):
    """Plan evidence: the donor-cell scan carries the ``cell IN (...)``
    predicate in PartitionFilters (file skipping — only RESEED_Q of the
    16 cell directories are read) and its ReadSchema excludes the
    embedding column (column pruning — the maintenance pass never moves
    vector payloads)."""
    from etl_active911_spark.operators.similarity import ivf_reseed_plan_from_index

    plan = (
        ivf_reseed_plan_from_index(spark, index_path)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    m = re.search(r"PartitionFilters: \[[^\]]*cell#?\d* IN \([^\)]*\)", plan)
    assert m, plan[:4000]
    # every scan in the plan prunes the embedding payload column
    for rs in re.findall(r"ReadSchema: ([^\n]*)", plan):
        assert "embedding" not in rs, rs


def test_ride_reads_no_embeddings_table(spark, index_path):
    """The maintenance pass touches ONLY the index layout: no scan of
    the raw embeddings parquet appears anywhere in the plan."""
    from etl_active911_spark.operators.similarity import ivf_reseed_plan_from_index

    plan = (
        ivf_reseed_plan_from_index(spark, index_path)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "embeddings.parquet" not in plan, plan[:4000]


def test_layout_stores_rounded_assignment_scores(spark, index_path):
    """The stored cos is the assignment window's own 6dp rounding — the
    property that lets the ride's plain ORDER BY cos reproduce the
    refit's ORDER BY ROUND(cos, 6) exactly."""
    idx = spark.read.parquet(index_path)
    bad = idx.filter(F.col("cos") != F.round(F.col("cos"), 6)).count()
    assert bad == 0
    # one row per vector, conservation vs the source table
    from etl_active911_spark.io import read_table

    n_vec = read_table(spark, SF_ORACLE, "embeddings").count()
    assert idx.count() == n_vec
    assert idx.select("vec_id").distinct().count() == n_vec


def test_centroids_sit_beside_the_data(spark, index_path):
    """`_centroids` is readable and bounded (IVF_N_CELLS rows), and is
    invisible to the main layout's partition discovery."""
    from etl_active911_spark.operators.similarity import IVF_N_CELLS

    cent = spark.read.parquet(f"{index_path}/_centroids")
    assert cent.count() == IVF_N_CELLS
    assert set(cent.columns) == {"cell", "centroid"}
    idx_cols = set(spark.read.parquet(index_path).columns)
    assert idx_cols == {"vec_id", "cell", "cos", "embedding"}
