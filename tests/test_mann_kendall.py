"""Synthetic pins for x6_mann_kendall (Mann 1945; Kendall 1975).

Hand-derived cases: a strictly monotone series of length 10 has
S = ±C(10,2) = ±45 and tie-free variance n(n-1)(2n+5)/18 = 125, so
z = (|S|-1)/sqrt(125) = 44/11.18034 ≈ 3.9355 — far past the 5% critical
value 1.959964; a constant series is one tie group (S = 0, z = 0); a
short alternating series stays insignificant.
"""

import datetime
import math

from etl_active911_spark.plans import registry

registry.load_all()


def _events(spark, tmp_path, series):
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for uid, values in series.items():
        for i, v in enumerate(values):
            eid += 1
            rows.append(
                (uid, eid, t0 + datetime.timedelta(seconds=60 * i), "a", float(v), "{}")
            )
    ev = spark.createDataFrame(
        rows,
        "user_id long, event_id long, ts timestamp_ntz, event_type string, "
        "value double, props string",
    )
    ev.write.parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_mann_kendall_hand_derived(spark, tmp_path):
    sf = _events(
        spark,
        tmp_path,
        {
            1: [i * 1.5 for i in range(10)],          # strictly increasing
            2: [100 - i * 2.25 for i in range(10)],   # strictly decreasing
            3: [7.0] * 5,                             # constant (one tie group)
            4: [0.0, 1.0, 0.0, 1.0, 0.0],             # alternating, short
        },
    )
    got = {r["user_id"]: r for r in registry.QUERIES["x6_mann_kendall"](spark, sf).collect()}
    assert set(got) == {1, 2, 3, 4}

    z_mono = 44.0 / math.sqrt(125.0)
    assert got[1]["s"] == 45 and got[1]["n"] == 10
    assert abs(got[1]["z"] - z_mono) < 1e-5
    assert got[1]["trend"] == "increasing"

    assert got[2]["s"] == -45
    assert abs(got[2]["z"] + z_mono) < 1e-5
    assert got[2]["trend"] == "decreasing"

    # constant series: S = 0, the single tie group zeroes the numerator
    assert got[3]["s"] == 0 and got[3]["z"] == 0.0 and got[3]["trend"] == "none"

    # alternating: S ∈ {-?..}, |z| < crit → none
    assert got[4]["trend"] == "none"


def test_mann_kendall_tie_corrected_variance(spark, tmp_path):
    """Ties shrink the variance: [1,1,2,2,3] has S = 8 pairs? — compute:
    pairs (i<j) with sign: hand count below; tie groups t=2,2,1 give
    tie_term = 2·1·9 + 2·1·9 = 36; n=5 → var = (5·4·15 − 36)/18 = 264/18."""
    sf = _events(spark, tmp_path, {9: [1.0, 1.0, 2.0, 2.0, 3.0]})
    row = registry.QUERIES["x6_mann_kendall"](spark, sf).collect()[0]
    # hand count of sgn over the 10 ordered pairs:
    # (1,1)=0 (1,2)+ (1,2)+ (1,3)+ | (1,2)+ (1,2)+ (1,3)+ | (2,2)=0 (2,3)+ | (2,3)+
    assert row["s"] == 8
    var = (5 * 4 * 15 - 36) / 18.0
    z = (8 - 1) / math.sqrt(var)
    assert abs(row["z"] - z) < 1e-5
