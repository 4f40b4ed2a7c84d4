"""Property test for the SIGNED half-up micro division (r11, x6_acf).

Rule 26b's `(2a+b) div (2b)` pattern assumed non-negative numerators.
x6_acf introduced negative numerators (anticorrelation), where the
engines' integer division semantics DIVERGE: Spark `div` truncates
toward zero, DuckDB `//` floors. The operators therefore divide
MAGNITUDES and re-sign (`_signed_micro` / `_sql_signed_micro`); this
test pins the three-way agreement Spark == DuckDB == Python half-up
(round-half-away-from-zero on the micro grid) over adversarial inputs,
including exact .5-tie numerators on both signs — the same evidence
standard as the token_hash60 property test.
"""

from __future__ import annotations

import random

import duckdb
import pytest


def _py_half_up_micro(num: int, den: int) -> int:
    """Reference: round(num/den * 1e6) half-away-from-zero, exactly."""
    assert den > 0
    mag = (2 * abs(num) * 1_000_000 + den) // (2 * den)
    return mag if num >= 0 else -mag


def _cases() -> list[tuple[int, int]]:
    rng = random.Random(1106)
    cases = []
    for _ in range(150):
        den = rng.randint(1, 10**12)
        num = rng.randint(-den, den)  # acf-like: |ratio| <= 1
        cases.append((num, den))
    # exact ties: num/den * 1e6 lands exactly on k + 1/2 for both signs
    for k in (0, 1, 499_999, 999_999):
        den = 2_000_000
        num = 2 * k + 1  # num/den*1e6 = k + 0.5
        cases += [(num, den), (-num, den)]
    # zero and boundaries
    cases += [(0, 7), (1, 10**12), (-1, 10**12)]
    return cases


def test_duckdb_matches_python_half_up():
    from etl_active911_spark.operators.timeseries import _sql_signed_micro

    con = duckdb.connect()
    for num, den in _cases():
        got = con.execute(
            f"SELECT {_sql_signed_micro(f'{num}::HUGEINT', f'{den}::HUGEINT')}"
        ).fetchone()[0]
        assert int(got) == _py_half_up_micro(num, den), (num, den)


def test_spark_matches_python_half_up(spark):
    from etl_active911_spark.operators.timeseries import _signed_micro

    cases = _cases()
    df = spark.createDataFrame(cases, "num long, den long").selectExpr(
        "CAST(num AS DECIMAL(38,0)) AS num", "CAST(den AS DECIMAL(38,0)) AS den"
    )
    rows = df.select(
        "num", "den", _signed_micro("num", "den").cast("long").alias("m")
    ).collect()
    assert len(rows) == len(cases)
    for r in rows:
        assert r["m"] == _py_half_up_micro(int(r["num"]), int(r["den"]))


def test_tie_behavior_is_half_away_from_zero():
    """The .5 ties themselves: +ties round up, −ties round down (away
    from zero) — the HALF-UP convention both engines implement via the
    magnitude trick."""
    assert _py_half_up_micro(1, 2_000_000) == 1  # +0.5 → 1
    assert _py_half_up_micro(-1, 2_000_000) == -1  # −0.5 → −1
    assert _py_half_up_micro(3, 2_000_000) == 2  # +1.5 → 2
    assert _py_half_up_micro(-3, 2_000_000) == -2
