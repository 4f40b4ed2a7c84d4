"""Hand-derived pins for x6_haar_energy: signals constructed to put ALL
energy in exactly one detail level.

With v in {+1, -1} centi-units (value = ±0.01) and 32 samples:
- alternating [+1,-1]...        -> D1 = ±2 per pair, D2 = D3 = 0 -> e1 = 1
- blocks of 2 [+1,+1,-1,-1]...  -> D2 = ±4 per quad, D1 = D3 = 0 -> e2 = 1
- blocks of 4 [+1*4,-1*4]...    -> D3 = ±8 per oct,  D1 = D2 = 0 -> e3 = 1
- constant                      -> all detail energies 0 (DC only)
- series shorter than 32        -> excluded
"""

import datetime

from etl_active911_spark.plans import registry

registry.load_all()


def _series(spark, tmp_path, series):
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


def test_haar_pure_level_signals(spark, tmp_path):
    alt = [0.01, -0.01] * 16
    blk2 = [0.01, 0.01, -0.01, -0.01] * 8
    blk4 = ([0.01] * 4 + [-0.01] * 4) * 4
    const = [0.42] * 32
    short = [1.0] * 5
    sf = _series(spark, tmp_path, {1: alt, 2: blk2, 3: blk4, 4: const, 9: short})
    got = {r["user_id"]: r for r in registry.QUERIES["x6_haar_energy"](spark, sf).collect()}

    assert set(got) == {1, 2, 3, 4}  # short series excluded

    assert got[1]["e1_frac"] == 1.0 and got[1]["e2_frac"] == 0.0
    assert got[1]["e3_frac"] == 0.0 and got[1]["dominant_level"] == 1

    assert got[2]["e2_frac"] == 1.0 and got[2]["e1_frac"] == 0.0
    assert got[2]["e3_frac"] == 0.0 and got[2]["dominant_level"] == 2

    assert got[3]["e3_frac"] == 1.0 and got[3]["e1_frac"] == 0.0
    assert got[3]["e2_frac"] == 0.0 and got[3]["dominant_level"] == 3

    # constant: zero detail energy everywhere, tie resolves to level 1
    assert (got[4]["e1_frac"], got[4]["e2_frac"], got[4]["e3_frac"]) == (0.0, 0.0, 0.0)
    assert got[4]["dominant_level"] == 1
