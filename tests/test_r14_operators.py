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
