"""Timezone-abbreviation-normalized timestamp parsing (O-15).

Reproduces ``parseTime`` (reference task.ts:66-76) and its 18-entry
abbreviation→IANA map (task.ts:45-64) as a pure Column expression —
JVM-side, whole-stage-codegen-friendly, no UDF.

Semantics (pinned by golden tests):
- trim, split on single spaces; the last token is the tz abbreviation.
- known abbreviation → parse 'MM/DD/YYYY HH:mm:ss' as local wall time in
  the mapped IANA zone, emit UTC.
- unknown abbreviation → the reference parses the WHOLE string with
  moment's 'z' token, which is a parse-time no-op, in zone UTC
  (task.ts:75). We first try the string minus its last token, then fall
  back to the full trimmed string — so an abbreviation-less but
  well-formed input ('12/08/2025 18:27:47') parses as UTC (ADVICE r01).
- unparseable input → NULL (moment emits null ISO; we use NULL timestamp).
  Known documented divergence (CLAUDE.md rule 8): moment additionally
  accepts malformed whitespace/garbage dates leniently; we stay strict.
- DST-ambiguous local times resolve to the earlier offset (java.time);
  moment-timezone agrees for US zones. Golden fixtures avoid the 2am
  transition window entirely (SURVEY.md §7 hard-part #1).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# task.ts:45-64 — exact mapping, including the quirks (HDT→Honolulu even
# though Hawaii observes no DST; NDT/NST→St_Johns half-hour zone).
TIMEZONE_MAPPINGS: dict[str, str] = {
    "EDT": "America/New_York",
    "EST": "America/New_York",
    "CDT": "America/Chicago",
    "CST": "America/Chicago",
    "MDT": "America/Denver",
    "MST": "America/Denver",
    "PDT": "America/Los_Angeles",
    "PST": "America/Los_Angeles",
    "AKDT": "America/Anchorage",
    "AKST": "America/Anchorage",
    "HDT": "Pacific/Honolulu",
    "HST": "Pacific/Honolulu",
    "ADT": "America/Halifax",
    "AST": "America/Halifax",
    "NDT": "America/St_Johns",
    "NST": "America/St_Johns",
    "UTC": "UTC",
    "GMT": "Etc/GMT",
}

def _tz_map_lit() -> Column:
    # Built lazily: F.lit requires an active SparkSession, and this module
    # is imported by the registry before any session exists.
    return F.create_map(*[F.lit(x) for pair in TIMEZONE_MAPPINGS.items() for x in pair])


ALERT_TIME_FORMAT = "MM/dd/yyyy HH:mm:ss"


def _split_parts(col: Column) -> tuple[Column, Column, Column]:
    trimmed = F.trim(col)
    abbr = F.regexp_extract(trimmed, r"(\S+)$", 1)
    # Everything before the last space-separated token (task.ts:71).
    date_part = F.trim(F.regexp_replace(trimmed, r"\s*\S+$", ""))
    return date_part, abbr, trimmed


def parse_alert_time(col: Column) -> Column:
    """'MM/DD/YYYY HH:mm:ss ABBR' string → UTC-instant timestamp Column.

    Session-timezone independent: ``to_timestamp`` renders the wall clock
    in the session zone and ``to_utc_timestamp`` reinterprets that same
    wall clock in the mapped zone, so the session zone cancels out.
    """
    date_part, abbr, trimmed = _split_parts(col)
    tz = F.try_element_at(_tz_map_lit(), abbr)
    fmt = F.lit(ALERT_TIME_FORMAT)
    # Unknown abbr → moment parses with the abbr ignored, in UTC
    # (task.ts:75); for abbreviation-less input the date-part parse fails
    # and the full trimmed string parses instead (same moment call).
    return F.to_utc_timestamp(
        F.coalesce(F.try_to_timestamp(date_part, fmt), F.try_to_timestamp(trimmed, fmt)),
        F.coalesce(tz, F.lit("UTC")),
    )


def parse_alert_time_ntz(col: Column) -> Column:
    """Same parse, returning the UTC wall clock as TIMESTAMP_NTZ — fully
    session-independent representation for oracle-checked queries."""
    date_part, abbr, trimmed = _split_parts(col)
    tz = F.try_element_at(_tz_map_lit(), abbr)
    fmt = F.lit(ALERT_TIME_FORMAT)
    # to_timestamp_ntz throws on malformed input under ANSI mode; guard it
    # behind lazily-evaluated branches keyed on try_to_timestamp (only its
    # null-ness is used, so its session-zone interpretation is irrelevant).
    dp_ok = F.try_to_timestamp(date_part, fmt).isNotNull()
    full_ok = F.try_to_timestamp(trimmed, fmt).isNotNull()
    ntz = F.when(dp_ok, F.to_timestamp_ntz(date_part, fmt)).when(
        full_ok, F.to_timestamp_ntz(trimmed, fmt)
    )
    return F.convert_timezone(F.coalesce(tz, F.lit("UTC")), F.lit("UTC"), ntz)


def parse_alert_time_iso(col: Column) -> Column:
    """The reference's exact output shape: ISO-8601 'yyyy-MM-ddTHH:mm:ss.SSSZ'
    UTC string (moment ``toISOString``, task.ts:72,75), NULL when invalid."""
    return F.date_format(parse_alert_time_ntz(col), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")


def tz_case_sql(ts_expr: str) -> str:
    """DuckDB-side equivalent for oracle SQL: CASE mapping abbr→IANA."""
    cases = " ".join(f"WHEN '{k}' THEN '{v}'" for k, v in TIMEZONE_MAPPINGS.items())
    return f"CASE {ts_expr} {cases} ELSE NULL END"
