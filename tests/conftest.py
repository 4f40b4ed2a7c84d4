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
    from etl_active911_spark.io import TABLES

    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_ORACLE}/{name}.parquet')"
        )
    yield con
    con.close()
