"""Oracle-checked queries over the Active911 reference surface (O-3…O-20).

Each query runs the Spark transform (pipeline/active911.py) on the
deterministic synthetic alerts table (pipeline/fixtures.py); the oracle SQL
re-derives the same table with the same shared SQL text and re-implements
the transform in DuckDB dialect. Both sides emit flat rows with identical
aliases; timestamps travel as the reference's ISO-UTC strings so results
are independent of either engine's session timezone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_active911_spark.functions.timeparse import (
    TIMEZONE_MAPPINGS,
    parse_alert_time_iso,
)
from etl_active911_spark.pipeline import active911 as a911
from etl_active911_spark.pipeline.fixtures import SYNTH_ALERTS_SQL, synthetic_alerts
from etl_active911_spark.plans.registry import query

# ---------------------------------------------------------------------------
# DuckDB SQL building blocks (oracle side only — duckdb dialect is fine here)
# ---------------------------------------------------------------------------

_JS_NUM = "CASE WHEN TRIM({x}) = '' THEN 0.0 ELSE TRY_CAST(TRIM({x}) AS DOUBLE) END"

_TZ_CASE = "CASE abbr " + " ".join(
    f"WHEN '{k}' THEN '{v}'" for k, v in TIMEZONE_MAPPINGS.items()
) + " ELSE NULL END"

# parseTime (task.ts:66-76) in DuckDB: split off the trailing abbreviation,
# parse the rest as local wall time in the mapped zone, emit ISO-UTC text.
# timezone('UTC', timezone(tz, ts)) is session-TimeZone-independent.
_PARSE_ISO = (
    "strftime(CASE WHEN {tz} IS NOT NULL"
    "  THEN timezone('UTC', timezone({tz}, try_strptime({dp}, '%m/%d/%Y %H:%M:%S')))"
    "  ELSE try_strptime({dp}, '%m/%d/%Y %H:%M:%S') END,"
    " '%Y-%m-%dT%H:%M:%S.%gZ')"
)

_RESPONSE_PAT = r"Got a response of (.+?) to (.+?)\((\d+)\) at (.+?)\."

# Explode response lines with 0-based positions (bounded fan-out: the
# fixture generator emits ≤ 6 lines per alert).
_G4 = "TRIM(regexp_extract(line, '" + _RESPONSE_PAT + "', 4))"
_G4_ABBR = "regexp_extract(" + _G4 + ", '(\\S+)$', 1)"
_G4_DP = "TRIM(REGEXP_REPLACE(" + _G4 + ", '\\s*\\S+$', ''))"
_G4_ISO = _PARSE_ISO.format(tz="(" + _TZ_CASE.replace("abbr", _G4_ABBR) + ")", dp=_G4_DP)
_MATCHED = "regexp_matches(line, '" + _RESPONSE_PAT + "')"

_LINES_CTE = f"""
lines AS (
    SELECT id, i - 1 AS pos, ls[i] AS line
    FROM (SELECT id, string_split(responses, chr(10)) AS ls FROM alerts),
         (SELECT UNNEST(generate_series(1, 12)) AS i)
    WHERE i <= len(ls) AND starts_with(ls[i], 'Got a response of ')
),
extracted AS (
    SELECT id, pos,
        CASE WHEN {_MATCHED}
             THEN TRIM(regexp_extract(line, '{_RESPONSE_PAT}', 2)) ELSE 'Unknown' END AS link_callsign,
        CASE WHEN {_MATCHED}
             THEN TRIM(regexp_extract(line, '{_RESPONSE_PAT}', 1)) ELSE 'Unknown' END AS link_remarks,
        CASE WHEN {_MATCHED}
             THEN regexp_extract(line, '{_RESPONSE_PAT}', 3) END AS device_id,
        CASE WHEN {_MATCHED} THEN {_G4_ISO} END AS production_time
    FROM lines
)
"""

_COORDS_CTE = f"""
coords AS (
    SELECT *,
        ({_JS_NUM.format(x="lon")}) AS lon0,
        ({_JS_NUM.format(x="lat")}) AS lat0,
        string_split(TRIM(place), ',') AS pc
    FROM alerts
),
resolved0 AS (
    SELECT *,
        (lon0 = 0 OR lat0 = 0) AS needs_fb,
        len(pc) >= 2 AS has2,
        ({_JS_NUM.format(x="pc[1]")}) AS p_lat,
        ({_JS_NUM.format(x="pc[2]")}) AS p_lon
    FROM coords
),
resolved AS (
    SELECT *,
        CASE WHEN needs_fb THEN p_lon ELSE lon0 END AS lon_d,
        CASE WHEN needs_fb THEN p_lat ELSE lat0 END AS lat_d
    FROM resolved0
    WHERE (NOT needs_fb) OR (has2 AND p_lat IS NOT NULL AND p_lon IS NOT NULL)
)
"""

_DEDUP_CTE = f"""
{_LINES_CTE},
ranked AS (
    SELECT *,
        ROW_NUMBER() OVER (PARTITION BY id, link_callsign ORDER BY pos DESC) AS rn,
        MIN(pos) OVER (PARTITION BY id, link_callsign) AS first_pos
    FROM extracted
),
dedup AS (
    SELECT id, first_pos, link_callsign, link_remarks, device_id, production_time
    FROM ranked WHERE rn = 1
)
"""


# ---------------------------------------------------------------------------
# Queries
# ---------------------------------------------------------------------------


@query(
    "o10_coord_resolve",
    f"WITH alerts AS ({SYNTH_ALERTS_SQL}), {_COORDS_CTE} SELECT id, lon_d, lat_d FROM resolved",
)
def o10_coord_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-10/O-17: zero-coordinate fallback via 'lat,lon' in place (swap to
    lon-first), invalid-fallback row drop, JS Number() coercion."""
    return a911.resolve_coordinates(synthetic_alerts(spark, sf_dir)).select("id", "lon_d", "lat_d")


@query(
    "o15_time_parse",
    f"""
    WITH alerts AS ({SYNTH_ALERTS_SQL}),
    p AS (
        SELECT id, sent,
            TRIM(REGEXP_REPLACE(TRIM(sent), '\\s*\\S+$', '')) AS dp,
            regexp_extract(TRIM(sent), '(\\S+)$', 1) AS abbr
        FROM alerts
    )
    SELECT id, sent, {_PARSE_ISO.format(tz="(" + _TZ_CASE + ")", dp="dp")} AS start_iso
    FROM p
    """,
)
def o15_time_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-15: tz-abbreviation-normalized timestamp parse over all 18
    abbreviations + the unknown-abbr UTC fallback (task.ts:45-76)."""
    return synthetic_alerts(spark, sf_dir).select(
        "id", "sent", parse_alert_time_iso(F.col("sent")).alias("start_iso")
    )


@query(
    "o13_response_extract",
    f"WITH alerts AS ({SYNTH_ALERTS_SQL}), {_LINES_CTE} "
    "SELECT id, pos, link_callsign, link_remarks, device_id, production_time FROM extracted",
)
def o13_response_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-13/O-14: line split + prefix filter + regex group extraction with
    the 'Unknown' sentinel (task.ts:121,195-209)."""
    return a911.extract_responses(synthetic_alerts(spark, sf_dir), time_as_iso=True)


@query(
    "o19_links_dedup",
    f"WITH alerts AS ({SYNTH_ALERTS_SQL}), {_DEDUP_CTE} "
    "SELECT id, first_pos, link_callsign, link_remarks, device_id, production_time FROM dedup",
)
def o19_links_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-19: last-wins dedup per (alert, callsign) keeping first-occurrence
    position (Map insertion-order semantics, task.ts:187-209)."""
    return a911.dedupe_links(
        a911.extract_responses(synthetic_alerts(spark, sf_dir), time_as_iso=True)
    )


@query(
    "o5_base64_roundtrip",
    f"""
    WITH alerts AS ({SYNTH_ALERTS_SQL})
    SELECT id,
        decode(from_base64(regexp_extract(
            'jQuery17031(' || '{{"result":"success","message":"' || to_base64(encode(responses)) || '"}}' || ')',
            '"message":"([^"]*)"', 1))) AS decoded
    FROM alerts
    """,
)
def o5_base64_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-3/O-5: JSONP wrap → unwrap → base64 decode round-trip, proving the
    wire-decode path (task.ts:155-167) on both engines."""
    alerts = synthetic_alerts(spark, sf_dir)
    wrapped = F.concat(
        F.lit('jQuery17031({"result":"success","message":"'),
        F.base64(F.col("responses").cast("binary")),
        F.lit('"})'),
    )
    return alerts.select(
        "id",
        F.unbase64(F.regexp_extract(wrapped, r'"message":"([^"]*)"', 1)).cast("string").alias("decoded"),
    )


_REMARKS_SQL = (
    "chr(10) || repeat(' ', 32) || 'Groups: ' || units"
    " || chr(10) || repeat(' ', 32) || 'Author: ' || source"
    " || chr(10) || repeat(' ', 32) || details"
    " || chr(10) || repeat(' ', 28)"
)


@query(
    "a911_pipeline_flat",
    f"""
    WITH alerts AS ({SYNTH_ALERTS_SQL}),
    {_COORDS_CTE},
    {_DEDUP_CTE},
    link_counts AS (SELECT id, COUNT(*) AS n_links FROM dedup GROUP BY id),
    p AS (
        SELECT r.*, COALESCE(lc.n_links, 0) AS n_links,
            TRIM(REGEXP_REPLACE(TRIM(r.sent), '\\s*\\S+$', '')) AS dp,
            regexp_extract(TRIM(r.sent), '(\\S+)$', 1) AS abbr
        FROM resolved r LEFT JOIN link_counts lc USING (id)
    )
    SELECT 'active911-' || id AS feature_id,
           description AS callsign,
           {_PARSE_ISO.format(tz="(" + _TZ_CASE + ")", dp="dp")} AS start_iso,
           {_REMARKS_SQL} AS remarks,
           lon_d, lat_d, n_links
    FROM p
    """,
)
def a911_pipeline_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end O-9…O-20 pipeline, flattened for value-hash checking:
    feature id, callsign, ISO start, byte-exact remarks template, resolved
    coordinates, and per-alert link count."""
    alerts = synthetic_alerts(spark, sf_dir)
    resolved = a911.resolve_coordinates(alerts)
    # links stay inside the row (links_array_native) → the whole pipeline
    # is one narrow stage, zero shuffles (SURVEY.md §7 shortcut).
    return resolved.select(
        F.concat(F.lit("active911-"), F.col("id")).alias("feature_id"),
        F.col("description").alias("callsign"),
        parse_alert_time_iso(F.col("sent")).alias("start_iso"),
        a911.alert_remarks().alias("remarks"),
        "lon_d",
        "lat_d",
        F.size(a911.links_array_native(time_as_iso=True)).cast("bigint").alias("n_links"),
    )


@query("a911_features_nested")  # nested GeoJSON structs — rows-only check
def a911_features_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full nested Feature output (task.ts:214-231): id, type,
    properties{callsign,start,links[],remarks}, geometry{type,coordinates}.
    Golden-tested in tests/test_active911.py; driver does a rows-only check
    (nested structs aren't hash-comparable across engines)."""
    return a911.to_features(synthetic_alerts(spark, sf_dir))
