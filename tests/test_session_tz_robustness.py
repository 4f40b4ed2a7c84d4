"""The driver runs queries with ITS SparkSession, whose timezone we don't
control. Every oracle-checked timestamp query must therefore be
session-timezone-independent: this sweep re-checks the time-sensitive
queries under a hostile non-UTC session zone."""

from __future__ import annotations

import pytest

from etl_active911_spark.plans import registry
from tests.conftest import SF_ORACLE
from tests.parity import compare

registry.load_all()

TIME_SENSITIVE = [
    "n10_scalar_suite",
    "n11_tumbling_window",
    "n11_sliding_window",
    "n12_session_window",
    "n12_stateful_dedup",
    "x6_ts_znorm_stats",
    "x6_ts_pattern_match",
    "n14_stream_stream_join",
    "tpch_q4_order_priority",
    "tpch_q10_returned_items",
    "o15_time_parse",
    "o13_response_extract",
    "a911_pipeline_flat",
    # r6: features_nested serializes parse_alert_time output (the instant
    # construction changed this round); the two new event-time queries
    "a911_features_nested",
    "x6_forecast_eval",
    "n11_trending_topk",
]


@pytest.fixture()
def tokyo_session(spark):
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    yield spark
    spark.conf.set("spark.sql.session.timeZone", prev)


@pytest.mark.parametrize("name", TIME_SENSITIVE)
def test_parity_under_non_utc_session(tokyo_session, duck, name):
    spark_df = registry.QUERIES[name](tokyo_session, SF_ORACLE)
    problems = compare(spark_df, duck.execute(registry.ORACLES[name]).df())
    assert not problems, f"{name} under Asia/Tokyo: " + "; ".join(problems[:2])
