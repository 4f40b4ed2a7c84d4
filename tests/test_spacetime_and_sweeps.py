"""Structural invariants for the late-r10 eval operators.

- x7_knox: the pair ledger must be internally consistent (X <= min(Ns, Nt),
  expectation reproduces from its own published counts, verdict agrees
  with the ratio).
- x3_ivf_nprobe_sweep: probe sets are nested, so candidates AND recall
  must be non-decreasing in nprobe.
- x8_context_length_sweep: longer contexts mean fewer sequences and
  never more straddling docs; totals are length-invariant.
"""

from etl_active911_spark.plans import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_knox_ledger_consistency(spark):
    row = registry.QUERIES["x7_knox"](spark, SF).collect()[0]
    assert row["n_st_pairs"] <= min(row["n_space_pairs"], row["n_time_pairs"])
    n = row["n_points"]
    n_all = n * (n - 1) // 2
    assert row["n_space_pairs"] <= n_all and row["n_time_pairs"] <= n_all
    # expectation reproduces from published counts (within micro rounding)
    expect = row["n_space_pairs"] * row["n_time_pairs"] / n_all
    assert abs(row["expected_st_pairs"] - expect) < 1e-5 * max(expect, 1.0)
    if row["expected_st_pairs"] > 0:
        ratio = row["n_st_pairs"] / expect
        assert abs(row["knox_ratio"] - ratio) < 1e-4 * max(ratio, 1.0)
    want = "interaction" if row["knox_ratio"] > 1.0 else "none"
    assert row["verdict"] == want


def test_nprobe_sweep_monotone(spark):
    rows = sorted(
        registry.QUERIES["x3_ivf_nprobe_sweep"](spark, SF).collect(),
        key=lambda r: r["nprobe"],
    )
    assert [r["nprobe"] for r in rows] == [1, 2, 4, 8]
    for a, b in zip(rows, rows[1:]):
        assert b["n_candidates"] >= a["n_candidates"]
        assert b["n_hits"] >= a["n_hits"]          # candidate superset
        assert b["recall_at_k"] >= a["recall_at_k"]


def test_context_sweep_monotone(spark):
    rows = sorted(
        registry.QUERIES["x8_context_length_sweep"](spark, SF).collect(),
        key=lambda r: r["ctx_len"],
    )
    assert [r["ctx_len"] for r in rows] == [256, 1024, 4096]
    assert len({(r["n_docs"], r["total_tokens"]) for r in rows}) == 1
    for a, b in zip(rows, rows[1:]):
        assert b["n_seqs"] <= a["n_seqs"]
        assert b["n_straddling"] <= a["n_straddling"]
        assert b["straddle_frac"] <= a["straddle_frac"]
