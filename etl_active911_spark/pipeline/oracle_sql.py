"""Shared DuckDB oracle SQL building blocks for the Active911 surface.

Pure string constants — importing this module registers nothing, so query
modules (pipeline/queries.py, operators/geo.py) can share CTE text without
import-order side effects on the registry (VERDICT r01 "What's wrong" #1).

Semantics mirrored here (and in pipeline/active911.py — both sides must
change together):

- ``_JS_NUM``: JS ``Number(str)`` — blank → 0.0, unparseable → NULL (the
  SQL stand-in for JS NaN).
- ``parse_iso_sql``: reference ``parseTime`` (task.ts:66-76). Known
  trailing tz abbreviation → parse the rest as local wall time in the
  mapped zone; otherwise moment parses the WHOLE string with a no-op 'z'
  token in UTC. The parse itself is moment-NON-STRICT (r4): the shared
  ``LENIENT_PAT`` digit-run regex (timeparse.py) extracts the six
  components, skipping separators/junk, with absent time fields → 0 and
  any overflowing component (month 13, hour 99, Feb 30) → NULL, exactly
  moment's overflow rule — replicated here with a guarded
  ``make_timestamp`` (DuckDB 1.0 has no TRY()); the day-in-month bound
  clamps the month argument of its own ``make_date`` so the guard can
  never error.
- ``_COORDS_CTE``: reference coordinate rules (task.ts:172-185).
  ``Number(lon) === 0 || Number(lat) === 0`` triggers the place fallback —
  NaN is NOT === 0, so rows whose lat/lon are non-blank but unparseable
  skip the fallback and flow through with NULL (JS NaN) coordinates; only
  an invalid *fallback* drops the row. COALESCE(needs_fb, FALSE) encodes
  exactly that.
"""

from __future__ import annotations

from etl_active911_spark.functions.timeparse import TIMEZONE_MAPPINGS

_JS_NUM = "CASE WHEN TRIM({x}) = '' THEN 0.0 ELSE TRY_CAST(TRIM({x}) AS DOUBLE) END"

_TZ_CASE = "CASE abbr " + " ".join(
    f"WHEN '{k}' THEN '{v}'" for k, v in TIMEZONE_MAPPINGS.items()
) + " ELSE NULL END"

def _lenient_wall_sql(s: str, now_year: int | None = None) -> str:
    """moment-non-strict parse of string expr ``s`` → naive TIMESTAMP (the
    local wall clock), NULL on missing month/day/year or component
    overflow. Mirrors ``timeparse._lenient_wall`` exactly — shared
    regexes, same two-digit-year rule (parseTwoDigitYear, ≤ 68 → 2000s),
    same defaulting, same overflow semantics, same opt-in pinned-``now``
    missing-year default."""
    from etl_active911_spark.functions.timeparse import LENIENT_PAT, LENIENT_PAT_MD

    raw = lambda i: f"NULLIF(regexp_extract({s}, '{LENIENT_PAT}', {i}), '')"  # noqa: E731
    g = lambda i: f"TRY_CAST({raw(i)} AS INT)"  # noqa: E731
    yraw = raw(3)
    yr = (
        f"CASE WHEN length({yraw}) = 2 THEN "
        f"CASE WHEN TRY_CAST({yraw} AS INT) <= 68 THEN TRY_CAST({yraw} AS INT) + 2000 "
        f"ELSE TRY_CAST({yraw} AS INT) + 1900 END "
        f"ELSE TRY_CAST({yraw} AS INT) END"
    )
    mo, dy = g(1), g(2)
    hh, mi, ss = (f"COALESCE({g(i)}, 0)" for i in (4, 5, 6))
    mo_clamped = f"CASE WHEN {mo} BETWEEN 1 AND 12 THEN {mo} ELSE 1 END"
    valid = (
        f"({yr}) IS NOT NULL AND {mo} BETWEEN 1 AND 12 AND {hh} <= 23 AND {mi} <= 59 "
        f"AND {ss} <= 59 AND {dy} BETWEEN 1 AND day(last_day(make_date({yr}, {mo_clamped}, 1)))"
    )
    full = f"CASE WHEN {valid} THEN make_timestamp({yr}, {mo}, {dy}, {hh}, {mi}, {ss}) END"
    if now_year is None:
        return full
    mraw = lambda i: f"NULLIF(regexp_extract({s}, '{LENIENT_PAT_MD}', {i}), '')"  # noqa: E731
    mg = lambda i: f"TRY_CAST({mraw(i)} AS INT)"  # noqa: E731
    mmo, mdy = mg(1), mg(2)
    mmo_clamped = f"CASE WHEN {mmo} BETWEEN 1 AND 12 THEN {mmo} ELSE 1 END"
    mvalid = (
        f"{mmo} BETWEEN 1 AND 12 AND {mdy} BETWEEN 1 AND "
        f"day(last_day(make_date({int(now_year)}, {mmo_clamped}, 1)))"
    )
    md = (
        f"CASE WHEN {mvalid} THEN "
        f"make_timestamp({int(now_year)}, {mmo}, {mdy}, 0, 0, 0) END"
    )
    # MD-shaped input wins outright (mirrors _lenient_wall: the 6-run
    # pattern would backtrack-split a 2-run input's second run)
    return f"CASE WHEN {mraw(1)} IS NOT NULL THEN {md} ELSE {full} END"


# parseTime (task.ts:66-76) in DuckDB: split off the trailing abbreviation,
# parse the rest as local wall time in the mapped zone, emit ISO-UTC text.
# timezone('UTC', timezone(tz, ts)) is session-TimeZone-independent.
# Unknown/absent abbreviation: moment parses the whole string ('z' is a
# parse no-op; the lenient parser treats a trailing token as junk) in UTC.
def parse_iso_sql(tz: str, dp: str, full: str, now_year: int | None = None) -> str:
    """ISO-UTC text for reference ``parseTime`` given SQL exprs for the
    mapped-zone lookup, the string minus its last token, and the full
    trimmed string. A function, not a ``.format`` template: the lenient
    regex contains ``{1,2}`` quantifiers that str.format would eat.
    ``now_year`` pins moment's missing-year default (timeparse.py)."""
    return (
        f"strftime(CASE WHEN {tz} IS NOT NULL"
        f"  THEN timezone('UTC', timezone({tz}, {_lenient_wall_sql(dp, now_year)}))"
        f"  ELSE {_lenient_wall_sql(full, now_year)} END,"
        " '%Y-%m-%dT%H:%M:%S.%gZ')"
    )

_RESPONSE_PAT = r"Got a response of (.+?) to (.+?)\((\d+)\) at (.+?)\."

# Explode response lines with 0-based positions (bounded fan-out: the
# fixture generator emits ≤ 6 lines per alert).
_G4 = "TRIM(regexp_extract(line, '" + _RESPONSE_PAT + "', 4))"
_G4_ABBR = "regexp_extract(" + _G4 + ", '(\\S+)$', 1)"
_G4_DP = "TRIM(REGEXP_REPLACE(" + _G4 + ", '\\s*\\S+$', ''))"
_G4_ISO = parse_iso_sql(
    tz="(" + _TZ_CASE.replace("abbr", _G4_ABBR) + ")", dp=_G4_DP, full=_G4
)
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

# task.ts:172-185: fallback only when a coordinate is exactly 0 (NaN !== 0
# → rows with unparseable non-blank lat/lon keep flowing, NULL coords);
# only an invalid place-fallback drops the row.
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
        COALESCE(lon0 = 0 OR lat0 = 0, FALSE) AS needs_fb,
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

_REMARKS_SQL = (
    "chr(10) || repeat(' ', 32) || 'Groups: ' || units"
    " || chr(10) || repeat(' ', 32) || 'Author: ' || source"
    " || chr(10) || repeat(' ', 32) || details"
    " || chr(10) || repeat(' ', 28)"
)
