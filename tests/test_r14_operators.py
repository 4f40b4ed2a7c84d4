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
