"""Driver-replica gate: every oracle-backed query must match DuckDB exactly
at sf0.01, and every rows-only query must at least run and return a stable
schema."""

from __future__ import annotations

import pytest

from etl_active911_spark.plans import registry
from tests.conftest import SF_ORACLE
from tests.parity import compare, fetch_df

registry.load_all()

ORACLE_KEYS = sorted(registry.ORACLES)
ROWS_ONLY_KEYS = sorted(set(registry.QUERIES) - set(registry.ORACLES))


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_oracle_parity(spark, duck, name):
    spark_df = registry.QUERIES[name](spark, SF_ORACLE)
    duck_df = fetch_df(duck, registry.ORACLES[name])
    problems = compare(spark_df, duck_df)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY_KEYS)
def test_rows_only_runs(spark, name):
    df = registry.QUERIES[name](spark, SF_ORACLE)
    assert df.columns, f"{name}: no columns"
    df.limit(5).collect()  # must execute without error
