"""The driver runs queries with ITS SparkSession, whose timezone we don't
control. Every oracle-checked timestamp query must therefore be
session-timezone-independent: this sweep re-checks the time-sensitive
queries under hostile non-UTC session zones — one DST-free offset zone
(Asia/Tokyo) and, since r7 (ADVICE r06 on parse_alert_time's instant
construction), one zone WITH daylight saving (America/New_York), so a
session-offset round-trip that is only correct for fixed-offset zones
cannot pass."""

from __future__ import annotations

import pytest

from etl_active911_spark.plans import registry
from tests.conftest import SF_ORACLE
from tests.parity import compare, fetch_df

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
    # r7: event-time-ordered additions (NTZ ordering should be
    # session-independent by construction — this pins it)
    "x6_ts_acf",
    "x6_matrix_profile",
    # r8: windowed derived query (reuses the profile; ordering only)
    "x6_discord_topk",
    # r9: the pinned-now missing-year parse (zone conversions on MD-only
    # inputs) and the two new event-time-ordered series queries
    "o15_time_parse_pinned_now",
    "x6_cusum_changepoint",
    "x6_seasonal_strength",
    "x6_rollup_cascade",
    "x6_minmax_downsample",
    # r10: integer-microsecond gap arithmetic over event ts
    "x6_gap_detection",
    "x6_threshold_runs",
    "x6_weekday_profile",
    "x6_event_type_markov",
    "x7_temporal_hotspots",
    "x6_dominant_period",
    # r10 continuation: integer-second inter-arrival moments; ordinal
    # patterns over event-time-ordered triples
    "x6_burstiness",
    "x6_permutation_entropy",
    "n21_attribution",
    # r10 continuation: epoch seconds via pure string/date arithmetic off
    # the O-15 ISO string; ts-ordered pair ranks
    "x7_knox",
    "x6_mann_kendall",
    "x6_haar_energy",
    "x6_entropy_rate",
    # r11: event-time-ordered lag windows (standard ACF + Ljung-Box)
    "x6_acf",
    "x6_ljung_box",
    # r11 late wave: interval arithmetic + date_trunc + ts-ordered windows
    "n11_watermark_planner",
    # r12: week-truncation + DATE emission over event ts (NTZ end to end)
    "n21_retention_cohorts",
]

ZONES = ["Asia/Tokyo", "America/New_York"]


@pytest.fixture(params=ZONES)
def hostile_session(request, spark):
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", request.param)
    yield spark, request.param
    spark.conf.set("spark.sql.session.timeZone", prev)


@pytest.mark.parametrize("name", TIME_SENSITIVE)
def test_parity_under_non_utc_session(hostile_session, duck, name):
    spark, zone = hostile_session
    spark_df = registry.QUERIES[name](spark, SF_ORACLE)
    problems = compare(spark_df, fetch_df(duck, registry.ORACLES[name]))
    assert not problems, f"{name} under {zone}: " + "; ".join(problems[:2])
