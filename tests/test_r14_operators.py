"""Round-14 operator pins (beyond the oracle-parity sweep, which covers
value equality for everything registered)."""

from __future__ import annotations

from etl_active911_spark.operators.similarity import x3_ann_ivf_lloyd2
from tests.conftest import SF_ORACLE


def test_lloyd2_converges_and_conserves(spark):
    """VERDICT r13 item 6 acceptance: the second Lloyd step's churn is
    STRICTLY below the first step's (the fit is heading to a fixpoint,
    not oscillating), membership is conserved across both steps, and at
    least one cell's inflow has already settled."""
    rows = x3_ann_ivf_lloyd2(spark, SF_ORACLE).collect()
    assert len(rows) == 16
    churn01 = sum(r.churn_in_01 for r in rows)
    churn12 = sum(r.churn_in_12 for r in rows)
    assert churn01 > 0, "step 1 churn vacuously zero — seeds degenerate?"
    assert churn12 < churn01, (churn12, churn01)
    assert sum(r.n_step1 for r in rows) == sum(r.n_step2 for r in rows)
    assert any(r.inflow_settled == 1 for r in rows)
    assert all((r.churn_in_12 == 0) == (r.inflow_settled == 1) for r in rows)


def test_reseed_plan_pairs_thin_with_fat(spark):
    """The reseed plan nominates exactly RESEED_Q pairings, thin and
    donor sets are disjoint, every donor is at least as full as every
    target, and each nominated seed currently lives in its donor cell."""
    from etl_active911_spark.operators.similarity import (
        RESEED_Q,
        x3_ann_ivf_reseed_plan,
    )

    rows = x3_ann_ivf_reseed_plan(spark, SF_ORACLE).collect()
    assert len(rows) == RESEED_Q
    thin = {r.thin_cell for r in rows}
    donors = {r.donor_cell for r in rows}
    assert len(thin) == len(donors) == RESEED_Q
    assert thin.isdisjoint(donors)
    assert min(r.donor_n for r in rows) >= max(r.thin_n for r in rows)
    # the nominated outlier scores WORSE against its own centroid than
    # the donor-cell average must (it is the argmin) — sanity: cos < 1
    assert all(r.seed_cos < 1.0 for r in rows)


def test_recursive_ldiversity_is_strictly_stronger(spark):
    """Every distinct-l violation (m < l) is also emitted here, and the
    recursive condition catches ADDITIONAL skew-only classes that
    distinct-l passes — the reason the rung exists."""
    from etl_active911_spark.operators.relational import (
        RC_LDIV_L,
        x9_recursive_ldiversity,
    )

    rows = x9_recursive_ldiversity(spark, SF_ORACLE).collect()
    assert rows
    m_viols = [r for r in rows if r.viol_m == 1]
    c_viols = [r for r in rows if r.viol_c == 1]
    assert m_viols and c_viols
    for r in rows:
        assert r.viol_m + r.viol_c == 1  # conditions are exclusive by construction
        if r.viol_c:
            assert r.m >= RC_LDIV_L and r.r1 > 2 * r.tail_sum
        assert r.r1 + r.tail_sum <= r.k


def test_dp_budget_bounds_and_split(spark):
    """Basic composition is exact and conservative (chosen ≤ basic);
    the advanced bound beats basic exactly in the k-large regime; the
    over-cap population splits both ways at the oracle SF (the
    prefix-stable ε mixer's guarantee)."""
    from etl_active911_spark.operators.relational import x9_dp_budget

    rows = x9_dp_budget(spark, SF_ORACLE).collect()
    assert rows
    assert {r.over_cap for r in rows} == {0, 1}
    for r in rows:
        basic = r.basic_micro / 1e6
        assert r.chosen_eps <= round(basic, 6) + 1e-9
        assert r.chosen_eps <= r.adv_eps + 1e-9
        assert r.eps_max_micro * r.k >= r.basic_micro  # max·k bounds the sum


def test_lloyd_centroid_rounding_margin(spark):
    """Defensive knife-edge guard (CLAUDE.md rule 26a exposure): the
    Lloyd oracles ROUND(AVG(val/nrm), 6) a float mean whose partial-sum
    order differs between engines/runs. Four consumers now ride that
    rounding (lloyd1/lloyd2/rebalance/reseed), so pin the margin: every
    step-1 centroid component's mean must sit further from its 6dp
    rounding boundary than any plausible aggregation-order jitter
    (~1e-14 for 30-term means). Measured margin at the oracle SF:
    2.9e-10. If a fixture change ever lands a mean near the boundary,
    this fails LOUDLY before parity starts flaking intermittently."""
    from pyspark.sql import functions as F

    from etl_active911_spark.io import read_table, spread
    from etl_active911_spark.operators.similarity import _lloyd_step

    n, cells0, _, _ = _lloyd_step(spread(read_table(spark, SF_ORACLE, "embeddings")))
    flat = n.select("vec_id", "nrm", F.posexplode("ee").alias("pos", "val"))
    mu = (
        flat.join(cells0, "vec_id")
        .groupBy("cell", "pos")
        .agg(F.avg(F.col("val").cast("double") / F.col("nrm")).alias("mu"))
    )
    dist = mu.select(
        F.min(
            F.abs(
                F.col("mu") * 1000000.0
                - F.floor(F.col("mu") * 1000000.0)
                - F.lit(0.5)
            )
        ).alias("d")
    ).collect()[0].d
    assert dist > 1e-12, f"centroid mean within {dist:.2e} of a 6dp boundary"


def test_dp_budget_advanced_bound_matches_python_reference(spark):
    """Transcription cross-check: the Spark/SQL advanced-composition
    expression must agree with an independent Python evaluation of
    ε_max·√(2k·ln 10⁶) + k·ε_max·(e^{ε_max}−1) within 5e-7 per channel
    (one 6dp rounding ulp) — catches log-base / operand-order slips in
    either engine's transcription."""
    import math

    from etl_active911_spark.operators.relational import x9_dp_budget

    for r in x9_dp_budget(spark, SF_ORACLE).collect():
        eps = r.eps_max_micro / 1e6
        ref = eps * math.sqrt(2 * r.k * math.log(1e6)) + r.k * eps * (
            math.exp(eps) - 1
        )
        assert abs(r.adv_eps - ref) <= 5e-7, (r.source, r.adv_eps, ref)


def test_skew_profile_polarities_and_bounds(spark):
    """The profiler's recommendation must fire both ways on the fixture
    (l_suppkey salts, the other keys do not), the 0.99-quantile can
    never exceed the max, and the skew ratio is >= 1 by construction
    (max >= mean)."""
    from etl_active911_spark.operators.skewdemo import (
        SKEW_TARGET_ROWS,
        n23_skew_profile,
    )

    rows = {r.key_name: r for r in n23_skew_profile(spark, SF_ORACLE).collect()}
    assert rows["lineitem.l_suppkey"].needs_salt == 1
    assert rows["orders.o_custkey"].needs_salt == 0
    for r in rows.values():
        assert r.p99_key_rows <= r.max_key_rows
        assert r.skew_ratio_micro >= 1_000_000
        assert (r.needs_salt == 1) == (r.max_key_rows > SKEW_TARGET_ROWS)
        assert (r.salt_buckets > 1) == (r.needs_salt == 1)
        assert r.n_keys <= r.n_rows
