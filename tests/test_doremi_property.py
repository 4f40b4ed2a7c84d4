"""Property test for the x8_doremi_step integer-micro pipeline: the
exact-integer arithmetic (rule 26b half-up micro units, integer Σw0·λ
baseline, 1e-9 quantized exp) must track a plain float reference
implementation of the DoReMi update to within quantization error, for
arbitrary domain profiles — this pins the SPEC of the arithmetic; the
Spark/DuckDB twins are pinned against each other by the oracle."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st


def _half_up(num: int, den: int) -> int:
    """(num/den)·1e6 half-up — non-negative operands (rule 26b)."""
    return (2 * num * 1_000_000 + den) // (2 * den)


def _doremi_integer(domains: list[tuple[int, int]]) -> list[int]:
    """The shipped integer pipeline (mirrors mixture.py / the oracle)."""
    nn = sum(n for n, _ in domains)
    kk = len(domains)
    lam = [_half_up(n - kept, n) for n, kept in domains]
    w0 = [_half_up(n, nn) for n, _ in domains]
    swl = sum(w * l for w, l in zip(w0, lam))
    u_nano = [
        math.floor(
            (w / 1_000_000)
            * math.exp(l / 1_000_000 - swl / 1_000_000_000_000)
            * 1_000_000_000
            + 0.5
        )
        for w, l in zip(w0, lam)
    ]
    z = sum(u_nano)
    w1 = [(2 * u * 1_000_000 + z) // (2 * z) for u in u_nano]
    return [
        (2 * 9 * w + 10) // 20 + (2 * 100_000 + kk) // (2 * kk) for w in w1
    ]


def _doremi_float(domains: list[tuple[int, int]]) -> list[float]:
    """Plain-float DoReMi reference (η = 1, 10% uniform smoothing)."""
    nn = sum(n for n, _ in domains)
    k = len(domains)
    lam = [(n - kept) / n for n, kept in domains]
    w0 = [n / nn for n, _ in domains]
    bar = sum(w * l for w, l in zip(w0, lam))
    u = [w * math.exp(l - bar) for w, l in zip(w0, lam)]
    z = sum(u)
    return [0.9 * (x / z) + 0.1 / k for x in u]


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 10**7), st.integers(0, 10**7)).map(
            lambda t: (t[0], min(t[1], t[0]))
        ),
        min_size=2,
        max_size=25,
    )
)
def test_integer_pipeline_tracks_float_reference(domains):
    got = _doremi_integer(domains)
    ref = _doremi_float(domains)
    # each micro stage rounds at 1e-6 (λ, w0, w1) or 1e-9 (u); the
    # worst-case accumulated drift through exp and two normalizations
    # stays well under 5 micro-units per domain
    for g, r in zip(got, ref):
        assert abs(g - r * 1_000_000) <= 5, (g, r, domains)
    # smoothed weights sum to 1e6 within one half-up unit per domain
    assert abs(sum(got) - 1_000_000) <= len(domains)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 10**6), st.integers(0, 10**6)).map(
            lambda t: (t[0], min(t[1], t[0]))
        ),
        min_size=2,
        max_size=15,
    )
)
def test_mirror_descent_multiplier_monotone(domains):
    """The CORRECT mirror-descent direction invariant: the normalized
    update multiplier w1/w0 is strictly monotone in λ. (The naive claim
    "λ > λ̄ ⇒ w1 > w0" is FALSE after normalization — Z = Σ w0·exp(λ−λ̄)
    ≥ 1 by Jensen, so the true up/down threshold is λ − λ̄ > ln Z, not
    0; hypothesis found the counterexample that killed the naive
    version of this test.)"""
    nn = sum(n for n, _ in domains)
    lam = [_half_up(n - kept, n) for n, kept in domains]
    w0 = [_half_up(n, nn) for n, _ in domains]
    got = _doremi_integer(domains)
    k = len(domains)
    smooth_add = (2 * 100_000 + k) // (2 * k)
    ratio = [
        (wm - smooth_add) / w0m if w0m else 0.0
        for wm, w0m in zip(got, w0)
    ]
    pairs = sorted(zip(lam, ratio, w0))
    for (l1, r1, wa), (l2, r2, wb) in zip(pairs, pairs[1:]):
        if l2 - l1 > 2 and min(wa, wb) > 0:
            # each micro stage rounds w1 by ±1 micro-unit, so the ratio
            # of a domain with w0_micro = m carries ~0.9/m quantization;
            # tolerance scales with the coarser of the pair
            tol = 2.0 / min(wa, wb) + 1e-6 * (l2 - l1)
            assert r2 > r1 - tol, (l1, r1, l2, r2, tol, domains)
