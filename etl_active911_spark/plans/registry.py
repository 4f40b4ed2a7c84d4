"""Query registry: the single source of truth behind ``__spark_entry__.py``.

Every operator from SURVEY.md §2 registers here as a named query
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a DuckDB oracle
SQL string. The driver compares Spark vs DuckDB results by row-count,
schema, and order-insensitive value hash — so builders must emit stable
column aliases and deterministic values (see plans/canonical.py).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[["SparkSession", str], "DataFrame"]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query builder, optionally with its DuckDB oracle SQL.

    ``oracle=None`` marks a genuinely non-SQL-expressible op; the driver
    then records a weaker rows-only check.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import etl_active911_spark.operators.relational  # noqa: F401
    import etl_active911_spark.operators.dedup  # noqa: F401
    import etl_active911_spark.operators.similarity  # noqa: F401
    import etl_active911_spark.operators.textual  # noqa: F401
    import etl_active911_spark.operators.multimodal  # noqa: F401
    import etl_active911_spark.operators.timeseries  # noqa: F401
    import etl_active911_spark.operators.clustering  # noqa: F401
    import etl_active911_spark.operators.geo  # noqa: F401
    import etl_active911_spark.operators.sampling  # noqa: F401
    import etl_active911_spark.operators.udfs  # noqa: F401
    import etl_active911_spark.pipeline.queries  # noqa: F401
    import etl_active911_spark.pipeline.control  # noqa: F401
    import etl_active911_spark.streaming.windows  # noqa: F401
    import etl_active911_spark.streaming.joins  # noqa: F401
