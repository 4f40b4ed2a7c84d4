"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``etl_active911_spark``; this file only adapts the
registry (etl_active911_spark/plans/registry.py) to the driver's API.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_active911_spark.plans import registry as _registry

_registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (revenue-by-nation 5-table join+agg) on sf0.001."""
    from etl_active911_spark.operators.relational import flagship_revenue_by_nation

    return flagship_revenue_by_nation(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so the
    driver's 50-row scoring window covers every operator family (see
    registry.PRIORITY)."""
    return _registry.ordered_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query."""
    ordered = _registry.ordered_queries()
    return {n: _registry.ORACLES[n] for n in ordered if n in _registry.ORACLES}
