"""Property test for the video dedup's half-up micro Jaccard: the
integer formula (2·s·10⁶ + u) div (2·u) must equal exact rational
rounding (round-half-up of s/u in micro-units) for every feasible
(shared, union) pair — both engines evaluate this exact expression
(Spark div == DuckDB // on non-negative operands, rule 28 n/a)."""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st


def _half_up_micro(num: int, den: int) -> int:
    """Exact reference: round-half-up of num/den scaled to micro-units,
    computed with Fractions (no floats anywhere)."""
    v = Fraction(num * 1_000_000, den)
    floor = v.numerator // v.denominator
    rem = v - floor
    return floor + (1 if rem >= Fraction(1, 2) else 0)


@settings(max_examples=500, deadline=None)
@given(st.integers(1, 10_000), st.integers(0, 10_000))
def test_integer_formula_matches_exact_rounding(union, shared_raw):
    shared = min(shared_raw, union)  # |A ∩ B| <= |A ∪ B|
    got = (2 * shared * 1_000_000 + union) // (2 * union)
    assert got == _half_up_micro(shared, union)
