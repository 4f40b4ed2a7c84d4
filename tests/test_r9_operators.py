"""Property pins for the r9 operator wave (beyond DuckDB parity):
synthetic ground truths the fixture can't provide — an exact-Zipf
corpus, a known level shift, and the water-fill budget invariants."""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F

from etl_active911_spark.operators.textual import zipf_fit
from etl_active911_spark.operators.timeseries import CUSUM_H, cusum_alarms
from tests.conftest import SF_SMOKE


def test_zipf_fit_recovers_slope_on_exact_zipf_corpus(spark):
    # word_k appears floor(1000/k) times, k=1..50 -> log-log slope -1
    C, K = 1000, 50
    rows = [(k, " ".join([f"w{k:02d}"] * (C // k))) for k in range(1, K + 1)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = zipf_fit(docs).collect()[0]
    assert out["n_vocab"] == K
    # integer flooring perturbs the tail; the fit still lands near -1
    assert -1.05 <= out["zipf_slope"] <= -0.93, out["zipf_slope"]
    assert out["r2"] >= 0.99, out["r2"]


def test_cusum_alarms_localize_the_level_shift(spark):
    # user 1: 40 rows at 10 +/- 0.5, then 20 rows at 14 +/- 0.5 (shift at
    # index 41). Simulated reference: first alarm at event 46, S maximal
    # at the final row (17.34 sigma-units). user 2: flat series, max S =
    # 0.5 << H -> silent.
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(60):
        v = (10.0 if i < 40 else 14.0) + (0.5 if i % 2 else -0.5)
        rows.append((1, i + 1, t0 + datetime.timedelta(minutes=i), v))
    for i in range(60):
        v = 10.0 + (0.5 if i % 2 else -0.5)
        rows.append((2, i + 1, t0 + datetime.timedelta(minutes=i), v))
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    out = cusum_alarms(ev).collect()
    assert {r["user_id"] for r in out} == {1}
    by_rank = sorted(out, key=lambda r: r["rnk"])
    # every alarm sits strictly after the shift point
    assert all(r["event_id"] > 40 for r in out)
    # severity rank 1 = the point of maximal accumulation (series end)
    assert by_rank[0]["event_id"] == 60
    assert by_rank[0]["cusum"] > CUSUM_H


def test_cusum_order_is_ts_not_event_id(spark):
    """ADVICE r09: the prefix-sum/prefix-min identity needs ONE order.
    Same level-shift series as above but event ids assigned in REVERSE
    of time — the alarms (matched by timestamp) must be identical to the
    ts-monotone-id run, which only holds if the running-min window
    orders by (ts, event_id) like the prefix sum does."""
    t0 = datetime.datetime(2024, 1, 1)

    def series(ids):
        return [
            (
                1,
                ids[i],
                t0 + datetime.timedelta(minutes=i),
                (10.0 if i < 40 else 14.0) + (0.5 if i % 2 else -0.5),
            )
            for i in range(60)
        ]

    schema = "user_id long, event_id long, ts timestamp, value double"
    mono = spark.createDataFrame(series(list(range(1, 61))), schema)
    rev = spark.createDataFrame(series(list(range(60, 0, -1))), schema)
    # join alarms back to ts through the input frames
    def by_ts(ev):
        out = cusum_alarms(ev).join(ev, ["user_id", "event_id"])
        return {r["ts"]: (r["cusum"], r["rnk"]) for r in out.collect()}

    a, b = by_ts(mono), by_ts(rev)
    assert a and a == b


def test_budget_effective_invariants(spark):
    from etl_active911_spark.plans import registry

    registry.load_all()
    rows = registry.QUERIES["x8_budget_effective"](spark, SF_SMOKE).collect()
    caps = {r["source"]: r["capacity"] for r in rows}
    budget = sum(caps.values()) // 2
    # water-filling exactness: the budget is spent to the last token
    assert sum(r["allocation"] for r in rows) == budget
    for r in rows:
        if r["saturated"] == 1:
            assert r["allocation"] == r["capacity"]
        else:
            assert 0 <= r["allocation"] <= r["capacity"]


def test_embedding_stats_var_shares_sum_to_one(spark):
    from etl_active911_spark.plans import registry

    registry.load_all()
    rows = registry.QUERIES["x3_embedding_stats"](spark, SF_SMOKE).collect()
    assert len(rows) == 64
    total = sum(r["var_share"] for r in rows)
    assert abs(total - 1.0) < 1e-4, total
    assert all(r["var_v"] >= 0 for r in rows)


def test_metric_sensitivity_detects_norm_skew(spark):
    from etl_active911_spark.operators.similarity import TOP_K, metric_overlap

    # 1 query + 30 corpus vectors in 4 dims. Vectors 10..19 point AWAY
    # from the query but carry 100x norm: they dominate the dot-product
    # top-k while staying out of the cosine top-k -> overlap < 1.
    rows = [(0, [1.0, 0.0, 0.0, 0.0])]
    for i in range(1, 10):  # well-aligned unit-ish vectors
        rows.append((i, [1.0, 0.01 * i, 0.0, 0.0]))
    for i in range(10, 20):  # misaligned giants
        rows.append((i, [10.0, 100.0 + i, 0.0, 0.0]))
    for i in range(20, 31):  # orthogonal filler
        rows.append((i, [0.0, 0.0, 1.0, 0.01 * i]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = metric_overlap(emb, n_queries=1, persist_key="test_msens").collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_common"] < TOP_K, r
    assert r["overlap_at_k"] < 1.0
