"""Property tests for the audio envelope fingerprint's arithmetic core
(multimodal.audio_envelope_rows): pure-integer replicas of the exact
claims the operator's docstring makes, over inputs far beyond the
fixture's (a, b, n, gain) surface. No Spark session needed."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_active911_spark.operators.multimodal import ENV_FRAME, ENV_LEVELS


def _fingerprint(samples: np.ndarray) -> tuple[int, int]:
    """The operator's exact quantizer: frame energies → peak-normalized
    3-bit levels → packed int64. Mirrors audio_envelope_rows line for
    line (int64 end to end)."""
    m = len(samples) // ENV_FRAME
    e = (samples[: m * ENV_FRAME].astype(np.int64) ** 2).reshape(m, ENV_FRAME).sum(axis=1)
    q = np.minimum(ENV_LEVELS * e // e.max(), ENV_LEVELS - 1)
    return m, int((q << (3 * np.arange(m, dtype=np.int64))).sum())


@settings(max_examples=200, deadline=None)
@given(
    a=st.integers(1, 5000),
    b=st.integers(0, 65535),
    n=st.integers(ENV_FRAME, 4 * ENV_FRAME + 17),
    w_seed=st.integers(0, 10**6),
)
def test_gain_invariance_holds_for_any_waveform(a, b, n, w_seed):
    """floor(L·g²E_f / g²E_max) == floor(L·E_f / E_max) for every integer
    gain — the whole correctness story of the fingerprint. Checked for
    gains {1,2,3,4} on arbitrary LCG waveforms with arbitrary per-frame
    amplitude modulation (not just the fixture's)."""
    i = np.arange(n, dtype=np.int64)
    f = i // ENV_FRAME
    w = 1 + (w_seed + f * f) % 5
    base = ((a * i + b) % 3276 - 1638) * w
    if not base[: (n // ENV_FRAME) * ENV_FRAME].any():
        return  # all-zero envelope: no fingerprint defined (fixture excludes)
    ref = _fingerprint(base)
    for g in (2, 3, 4):
        assert _fingerprint(base * g) == ref


@settings(max_examples=100, deadline=None)
@given(
    e=st.lists(st.integers(0, 2**41), min_size=1, max_size=9),
)
def test_quantizer_levels_bounded_and_monotone(e):
    """Levels stay in [0, ENV_LEVELS-1]; the max-energy frame always maps
    to the top level; level order respects energy order."""
    arr = np.array(e, dtype=np.int64)
    if arr.max() == 0:
        return
    q = np.minimum(ENV_LEVELS * arr // arr.max(), ENV_LEVELS - 1)
    assert q.min() >= 0 and q.max() == ENV_LEVELS - 1
    order = np.argsort(arr, kind="stable")
    assert (np.diff(q[order]) >= 0).all()
