"""Pins for the r13 operator additions: t-closeness (the privacy
ladder's third rung) and the DoReMi-style domain-reweighting step."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_active911_spark.operators.mixture import x8_doremi_step
from etl_active911_spark.operators.relational import (
    T_CLOSE_MAX_MICRO,
    tcloseness_classes,
    x9_t_closeness,
)
from tests.conftest import SF_ORACLE


def _cust(spark, rows):
    return spark.createDataFrame(
        rows, "c_nationkey int, c_acctbal double, c_mktsegment string"
    )


def test_tcloseness_mirror_class_scores_zero(spark):
    """A class whose segment distribution exactly mirrors the global one
    has t = 0 (TV's identity of indiscernibles) — crafted: two classes,
    identical 50/50 A-B mixes."""
    rows = []
    for nation in (1, 2):
        for seg in ("A", "B"):
            for i in range(4):
                rows.append((nation, 100.0 * nation, seg))
    out = {(r.nation, r.t_micro) for r in tcloseness_classes(_cust(spark, rows)).collect()}
    assert out == {(1, 0), (2, 0)}


def test_tcloseness_single_segment_class(spark):
    """A single-segment class scores t = 1 − g_s/N exactly (all its mass
    sits on one value): 8 A-rows in class 1, 8 B-rows in class 2 ⇒ each
    class's TV vs the global 50/50 is 1/2 → 500000 micro."""
    rows = [(1, 100.0, "A")] * 8 + [(2, 300.0, "B")] * 8
    out = {(r.nation, r.t_micro, r.viol_t) for r in tcloseness_classes(_cust(spark, rows)).collect()}
    assert out == {(1, 500_000, 1), (2, 500_000, 1)}


def test_tcloseness_fixture_has_both_polarities(spark):
    """Non-vacuity at the oracle SF: violating AND conforming classes
    both exist, and t_micro stays in [0, 1e6]."""
    rows = x9_t_closeness(spark, SF_ORACLE).collect()
    assert any(r.viol_t == 1 for r in rows)
    assert any(r.viol_t == 0 for r in rows)
    assert all(0 <= r.t_micro <= 1_000_000 for r in rows)
    assert all((r.t_micro > T_CLOSE_MAX_MICRO) == (r.viol_t == 1) for r in rows)


def test_doremi_weights_sum_and_direction(spark):
    """One DoReMi step at the oracle SF: (a) the smoothed weights sum to
    1e6 within K half-up rounding units; (b) mirror descent moves mass
    the right way — w1 > w0 exactly when λ − λ̄ > ln Z (Z = Σ w0·e^{λ−λ̄}
    ≥ 1 by Jensen; the naive "λ > λ̄ ⇒ up" claim is FALSE after
    normalization — hypothesis killed it, test_doremi_property.py); (c)
    smoothing pulls w toward uniform relative to w1, both polarities
    present on the fixture."""
    import math

    rows = x8_doremi_step(spark, SF_ORACLE).collect()
    k = len(rows)
    assert k >= 2
    total = sum(r.w_micro for r in rows)
    assert abs(total - 1_000_000) <= k, total
    swl = sum(r.w0_micro * r.lambda_micro for r in rows)
    bar = swl / 1e12
    u = [(r.w0_micro / 1e6) * math.exp(r.lambda_micro / 1e6 - bar) for r in rows]
    lnz = math.log(sum(u))
    for r in rows:
        dev = r.lambda_micro / 1e6 - bar
        if dev > lnz + 1e-5:
            assert r.w1_micro > r.w0_micro, (r, lnz)
        elif dev < lnz - 1e-5:
            assert r.w1_micro < r.w0_micro, (r, lnz)
    uniform = 1_000_000 // k
    pulled = [
        r for r in rows
        if abs(r.w_micro - uniform) < abs(r.w1_micro - uniform)
    ]
    assert pulled, "smoothing moved nothing toward uniform"
    assert any(r.w1_micro > r.w0_micro for r in rows)
    assert any(r.w1_micro < r.w0_micro for r in rows)


def test_doremi_uniform_when_losses_equal(spark):
    """Sanity invariant: with proportional w0 over equal-sized domains,
    equal λ across domains keeps w1 == w0 (exp(λ − λ̄) == 1). The
    fixture's sources are equal-sized (n_docs constant), so any pair of
    sources with EQUAL lambda_micro must carry equal w1_micro."""
    rows = x8_doremi_step(spark, SF_ORACLE).collect()
    by_lambda: dict[int, set[int]] = {}
    for r in rows:
        by_lambda.setdefault(r.lambda_micro, set()).add(r.w1_micro)
    assert all(len(v) == 1 for v in by_lambda.values()), by_lambda


def test_pack_attention_identities(spark):
    """Exact-integer identities per pack: cross + within == total causal
    pairs (within = Σ tᵢ(tᵢ+1)/2 recomputed independently from the
    packing manifest), contamination ∈ [0, 1e6], and the manifest
    (pack_id, n_docs, pack_tokens) agrees row-for-row with
    x8_token_packing — the two views of one packing cannot diverge."""
    from etl_active911_spark.operators.sampling import (
        x8_pack_attention_contamination,
        x8_token_packing,
    )

    att = {r.pack_id: r for r in x8_pack_attention_contamination(spark, SF_ORACLE).collect()}
    man = {r.pack_id: r for r in x8_token_packing(spark, SF_ORACLE).collect()}
    assert set(att) == set(man) and len(att) >= 2
    for pid, r in att.items():
        assert (r.n_docs, r.pack_tokens) == (man[pid].n_docs, man[pid].pack_tokens)
        total = r.pack_tokens * (r.pack_tokens + 1) // 2
        assert r.causal_pairs == total
        within = total - r.cross_pairs
        # within-doc causal pairs are at least n_docs (each doc's self
        # pair) and at most total
        assert r.n_docs <= within <= total
        assert 0 <= r.contamination_micro <= 1_000_000
        # multi-doc packs are contaminated, single-doc packs are clean
        if r.n_docs == 1:
            assert r.cross_pairs == 0 and r.contamination_micro == 0
        else:
            assert r.cross_pairs > 0


def test_cluster_tail_index_matches_histogram(spark):
    """Cross-query consistency: the tail index recomputed in Python from
    x2_cluster_size_histogram's ≥2-size rows (Newman discrete MLE,
    ascending-size accumulation) equals the operator's alpha exactly —
    both ride the memoized labels, so neither can drift; and the fixture
    reads dedup-healthy (alpha > 2)."""
    import math

    from etl_active911_spark.operators.clustering import (
        TAIL_XMIN,
        x2_cluster_size_histogram,
        x2_cluster_tail_index,
    )

    hist = sorted(
        (r.size, r.n_clusters)
        for r in x2_cluster_size_histogram(spark, SF_ORACLE).collect()
        if r.size >= TAIL_XMIN
    )
    assert hist, "no >=2 clusters on the fixture"
    cum = 0.0
    n_tail = 0
    for size, cnt in hist:  # ascending-size order — the shipped fold
        cum += cnt * math.log(size / 1.5)
        n_tail += cnt
    want = round(1.0 + n_tail / cum, 6)
    row = x2_cluster_tail_index(spark, SF_ORACLE).collect()
    assert len(row) == 1
    r = row[0]
    assert r.n_tail_clusters == n_tail
    assert r.max_size == hist[-1][0]
    assert r.n_distinct_sizes == len(hist)
    assert r.alpha == want, (r.alpha, want)
    assert r.alpha > 2.0  # healthy tail; a boilerplate flood drags this to ~1
