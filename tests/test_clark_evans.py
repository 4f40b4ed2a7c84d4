"""Consistency checks for x7_clark_evans on the sf0.001 fixture: the
censoring ledger must close, the ratio must reproduce from its own
published components (micro-exact mean over expectation), and the
verdict must agree with the rounded ratio."""

from etl_active911_spark.plans import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_clark_evans_internal_consistency(spark):
    row = registry.QUERIES["x7_clark_evans"](spark, SF).collect()[0]
    assert row["n_points"] == row["n_with_nn"] + row["n_censored"]
    assert row["n_with_nn"] > 0
    # mean is micro-quantized: 6dp exactly
    assert round(row["mean_nn_km"], 6) == row["mean_nn_km"]
    # ratio reproduces from published components (expected_nn_km is the
    # 6dp-rounded display of the raw expectation the ratio divides by, so
    # allow one ulp of the rounding there)
    approx = row["mean_nn_km"] / row["expected_nn_km"]
    assert abs(approx - row["ce_ratio"]) < 1e-5
    expect_verdict = (
        "clustered" if row["ce_ratio"] < 1.0
        else "dispersed" if row["ce_ratio"] > 1.0
        else "random"
    )
    assert row["verdict"] == expect_verdict
    # fixture pattern is a modulo lattice packed far denser than CSR
    assert row["verdict"] == "clustered"
