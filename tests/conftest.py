from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"
#: The bench-scale fixture dir; tests that compare growth across scale
#: factors should reference this (with ``skip_if_no_bench_sf``) instead of
#: hard-coding the path (ADVICE r04).
SF_BENCH = "/root/testdata/sf0.1"


def skip_if_no_bench_sf():
    if not os.path.isdir(SF_BENCH):
        pytest.skip(f"bench-scale fixtures not present at {SF_BENCH}")


@pytest.fixture(scope="session")
def spark():
    from etl_active911_spark.session import get_spark

    spark = get_spark("etl-active911-spark-tests")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with fixture views registered, mirroring the driver."""
    import duckdb

    con = duckdb.connect()
    # Session-scoped connection shared by ~300 oracle executions: DuckDB's
    # default memory_limit is ~80% of system RAM, which lets its buffer
    # pool grow against the long-lived Spark JVM until a malloc fails
    # mid-suite (observed once: a 266 KB allocation OOM'd during the TZ
    # sweep after the r10 oracle additions). Cap it far above any single
    # sf0.01 oracle's need and give it a spill directory.
    con.execute("SET memory_limit='12GB'")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    from etl_active911_spark.io import TABLES

    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_ORACLE}/{name}.parquet')"
        )
    yield con
    con.close()
