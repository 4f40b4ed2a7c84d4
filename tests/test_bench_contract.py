"""bench.py is driver-run per round — a typo'd HEADLINE name would crash
the round's bench record. Pin the list's integrity against the registry."""

from __future__ import annotations

import bench
from etl_active911_spark.plans import registry

registry.load_all()


def test_headline_names_registered():
    missing = [n for n in bench.HEADLINE if n not in registry.QUERIES]
    assert not missing, f"HEADLINE names not in registry: {missing}"


def test_headline_no_duplicates():
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))


def test_anchor_set_is_headline_prefix():
    """The frozen 2x-gate anchors must stay the first 17 HEADLINE entries
    (ANCHOR_17 is derived positionally) and each must have a frozen
    denominator."""
    assert set(bench.HEADLINE[:17]) == set(bench.ANCHOR_SECONDS)
    assert bench.ANCHOR_17 == set(bench.ANCHOR_SECONDS)


def _baseline_text() -> str:
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "BASELINE.md"), encoding="utf-8") as f:
        return f.read()


def test_refrozen_anchors_cite_baseline_notes():
    """VERDICT r13 item 3: the frozen 2x gate cannot be silently
    re-denominated — every ANCHOR_REFROZEN entry must name a real
    anchor, carry a non-empty why, and be documented in BASELINE.md
    (the query name must appear near the word 'refrozen' / 'refreeze'
    somewhere in the file)."""
    text = _baseline_text()
    for name, (sec, rnd, why) in bench.ANCHOR_REFROZEN.items():
        assert name in bench.ANCHOR_SECONDS, name
        assert sec > 0 and rnd and why, name
        assert name in text, f"{name}: no BASELINE.md mention at all"
        # the mention must be a refreeze note, not an incidental timing
        lowered = text.lower()
        i = 0
        found = False
        while True:
            i = lowered.find(name, i)
            if i < 0:
                break
            window = lowered[max(0, i - 500) : i + 500]
            if "refroz" in window or "refreez" in window or "re-froz" in window:
                found = True
                break
            i += len(name)
        assert found, f"{name}: BASELINE.md lacks a refreeze note for it"


def test_anchor_history_records_every_redenomination():
    """Every refreeze entry must also appear in the published
    ANCHOR_HISTORY (the permanent record BENCH readers get), and
    history entries are well-formed."""
    historied = {h["name"] for h in bench.ANCHOR_HISTORY}
    for name in bench.ANCHOR_REFROZEN:
        assert name in historied, name
    for h in bench.ANCHOR_HISTORY:
        assert h["name"] in bench.ANCHOR_SECONDS, h
        assert h.get("round") and h.get("why"), h


def test_flag_ratio_rebases_to_refrozen_denominator(monkeypatch):
    """The 2x flag must fire at exactly 2x the REFROZEN seconds (full
    original sensitivity against the new workload), not 2x the stale
    r1 anchor and not factor-rescaled (the retired r13 mechanism)."""
    name = "flagship_revenue_by_nation"  # any anchor with frozen seconds
    frozen = bench.ANCHOR_SECONDS[name]
    monkeypatch.setitem(
        bench.ANCHOR_REFROZEN, name, (2 * frozen, "rTEST", "unit test")
    )
    # measured == refrozen -> flag ratio exactly 1.0
    raw_ratio = (2 * frozen) / frozen
    assert abs(bench._flag_ratio(name, raw_ratio) - 1.0) < 1e-9
    # measured == 2x refrozen -> flag ratio exactly 2.0 (gate boundary)
    assert abs(bench._flag_ratio(name, 2 * raw_ratio) - 2.0) < 1e-9
    # an anchor WITHOUT a refreeze entry keeps the raw ratio
    other = "n2_join_broadcast_agg"
    assert bench._flag_ratio(other, 1.7) == 1.7
