"""Property tests (SURVEY.md §5.3, hypothesis):
- parseTime round-trips against Python zoneinfo for arbitrary datetimes/zones
- exact dedup is idempotent
- union-all conserves row counts
- MinHash signature equality ⇒ shingle-set similarity (sanity of the sketch)

Each property draws a batch of cases and runs ONE Spark job over the batch
(per-example Spark jobs would be prohibitively slow).
"""

from __future__ import annotations

from datetime import datetime
from zoneinfo import ZoneInfo

from hypothesis import given, settings, HealthCheck
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_active911_spark.functions.timeparse import TIMEZONE_MAPPINGS, parse_alert_time_iso

ABBRS = sorted(TIMEZONE_MAPPINGS)

# Avoid DST-transition local times (both libraries may legally disagree on
# ambiguous/skipped wall clocks — SURVEY.md §7 hard-part #1): hours 06-17
# are never inside any US/Canada transition window.
SAFE_DT = st.datetimes(
    min_value=datetime(1990, 1, 1, 6, 0, 0),
    max_value=datetime(2030, 12, 28, 17, 0, 0),
).filter(lambda d: 6 <= d.hour <= 17)


def expected_iso(dt: datetime, abbr: str) -> str:
    zone = ZoneInfo(TIMEZONE_MAPPINGS.get(abbr, "UTC"))
    if abbr in TIMEZONE_MAPPINGS:
        utc = dt.replace(tzinfo=zone).astimezone(ZoneInfo("UTC"))
    else:
        utc = dt.replace(tzinfo=ZoneInfo("UTC"))
    return utc.strftime("%Y-%m-%dT%H:%M:%S.000Z")


@settings(max_examples=3, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(SAFE_DT, st.sampled_from(ABBRS + ["ZZZ", "FOO"])), min_size=20, max_size=60))
def test_parse_time_matches_zoneinfo(spark, cases):
    rows = [
        (f"{dt.strftime('%m/%d/%Y %H:%M:%S')} {abbr}", expected_iso(dt, abbr))
        for dt, abbr in cases
    ]
    df = spark.createDataFrame(rows, "raw string, expected string").select(
        "raw", "expected", parse_alert_time_iso(F.col("raw")).alias("got")
    )
    bad = df.filter(F.col("got") != F.col("expected")).collect()
    assert not bad, f"zoneinfo disagreement: {bad[:5]}"


@settings(max_examples=3, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.text(alphabet="ab \n\t", min_size=0, max_size=40), min_size=1, max_size=40
    )
)
def test_exact_dedup_idempotent(spark, texts):
    from etl_active911_spark.operators.dedup import normalized_text

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    dedup1 = (
        df.select("doc_id", F.sha2(normalized_text(F.col("text")), 256).alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    # applying the same dedup to the surviving docs must be a no-op
    survivors = df.join(dedup1.select("doc_id"), "doc_id")
    dedup2 = (
        survivors.select("doc_id", F.sha2(normalized_text(F.col("text")), 256).alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    assert dedup1.count() == dedup2.count()


@settings(max_examples=3, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.integers(1, 200), st.integers(1, 200))
def test_union_conserves_rows(spark, n1, n2):
    a = spark.range(n1).withColumn("src", F.lit("a"))
    b = spark.range(n2).withColumn("src", F.lit("b"))
    assert a.unionByName(b).count() == n1 + n2


@settings(max_examples=2, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.data())
def test_minhash_identical_docs_identical_signatures(spark, data):
    from etl_active911_spark.operators.dedup import minhash_signatures

    words = data.draw(
        st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]), min_size=5, max_size=30)
    )
    text = " ".join(words)
    other = " ".join(reversed(words))
    df = spark.createDataFrame(
        [(1, text), (2, text), (3, other)], "doc_id long, text string"
    )
    sigs = {r["doc_id"]: tuple(r[f"h{i}"] for i in range(64)) for r in minhash_signatures(df).collect()}
    assert sigs[1] == sigs[2]  # identical docs → identical signatures


@settings(max_examples=3, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(0, 4),                     # query_id
            st.integers(0, 400),                   # vec_id
            st.floats(-1.0, 1.0, width=32),        # cosine
        ),
        min_size=1,
        max_size=300,
    )
)
def test_partial_topk_equals_global_topk(spark, rows):
    """partial_topk's per-batch 1e-6 cut must NEVER change the global
    result: for any scored set, output == the straightforward global
    window ranked by (round(cosine,6) DESC, vec_id)."""
    import pandas as pd

    from etl_active911_spark.operators.similarity import TOP_K, partial_topk

    # dedupe (query, vec) pairs — rank ties on vec_id assume uniqueness
    seen, uniq = set(), []
    for q, v, c in rows:
        if (q, v) not in seen:
            seen.add((q, v))
            uniq.append((q, v, float(c)))
    df = spark.createDataFrame(uniq, "query_id long, vec_id long, cosine double").repartition(7)
    got = {
        (r["query_id"], r["vec_id"], r["rnk"])
        for r in partial_topk(df, TOP_K).collect()
    }
    pdf = pd.DataFrame(uniq, columns=["query_id", "vec_id", "cosine"])
    pdf["r6"] = pdf["cosine"].round(6)
    want = set()
    for q, g in pdf.groupby("query_id"):
        g = g.sort_values(["r6", "vec_id"], ascending=[False, True]).head(TOP_K)
        for rnk, (_, row) in enumerate(g.iterrows(), start=1):
            want.add((q, int(row["vec_id"]), rnk))
    assert got == want


@settings(max_examples=3, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=40
        ),
        min_size=1,
        max_size=50,
        unique=True,
    )
)
def test_token_hash60_matches_python_and_duckdb(spark, texts):
    """token_hash60 (Spark conv(md5)) must equal Python's md5-hex parse AND
    DuckDB's sql_hash60 replica for arbitrary unicode — the foundation every
    sketch-family oracle (MinHash/SimHash) rests on."""
    import hashlib

    import duckdb

    from etl_active911_spark.operators.dedup import sql_hash60, token_hash60

    df = spark.createDataFrame([(t,) for t in texts], "tok string")
    got = {r["tok"]: r["h"] for r in df.select("tok", token_hash60(F.col("tok")).alias("h")).collect()}
    want = {t: int(hashlib.md5(t.encode()).hexdigest()[:15], 16) for t in texts}
    assert got == want
    con = duckdb.connect()
    con.register("toks_tbl", __import__("pandas").DataFrame({"tok": texts}))
    duck = {
        r[0]: r[1]
        for r in con.execute(f"SELECT tok, {sql_hash60('tok')} AS h FROM toks_tbl").fetchall()
    }
    assert duck == want


@settings(max_examples=3, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.floats(39.0, 40.0, allow_nan=False, width=32),
            st.floats(-105.0, -104.0, allow_nan=False, width=32),
        ),
        min_size=2,
        max_size=60,
    )
)
def test_grid_bucket_join_is_recall_exact(spark, pts):
    """The 9-cell grid expansion must find EVERY pair within the radius —
    for arbitrary points, bucketed pairs == brute-force pairs (the
    pigeonhole claim x7_geo_bucket_join's oracle rests on)."""
    import math

    from etl_active911_spark.operators.geo import (
        GRID_DEG,
        PAIR_RADIUS_KM,
        EARTH_RADIUS_KM,
        haversine_km,
    )

    rows = [(i, float(la), float(lo)) for i, (la, lo) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, lat_d double, lon_d double")
    p = df.select(
        "id", "lat_d", "lon_d",
        F.floor(F.col("lat_d") / GRID_DEG).cast("long").alias("cy"),
        F.floor(F.col("lon_d") / GRID_DEG).cast("long").alias("cx"),
    )
    offs = F.array(*[
        F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
        for dy in (-1, 0, 1) for dx in (-1, 0, 1)
    ])
    left = p.select(
        F.col("id").alias("id_a"), F.col("lat_d").alias("la"), F.col("lon_d").alias("lo"),
        F.explode(offs).alias("o"), "cy", "cx",
    ).select(
        "id_a", "la", "lo",
        (F.col("cy") + F.col("o.dy")).alias("jy"),
        (F.col("cx") + F.col("o.dx")).alias("jx"),
    )
    right = p.select(
        F.col("id").alias("id_b"), F.col("lat_d").alias("lb"), F.col("lon_d").alias("lb2"),
        F.col("cy").alias("jy"), F.col("cx").alias("jx"),
    )
    d = F.round(haversine_km(F.col("la"), F.col("lo"), F.col("lb"), F.col("lb2")), 3)
    bucketed = {
        (r["id_a"], r["id_b"])
        for r in left.join(right, ["jy", "jx"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(d <= PAIR_RADIUS_KM)
        .select("id_a", "id_b")
        .collect()
    }

    def hav(a, b):
        (la1, lo1), (la2, lo2) = a, b
        dphi, dlmb = math.radians(la2 - la1), math.radians(lo2 - lo1)
        h = (math.sin(dphi / 2) ** 2
             + math.cos(math.radians(la1)) * math.cos(math.radians(la2))
             * math.sin(dlmb / 2) ** 2)
        return 2 * EARTH_RADIUS_KM * math.asin(math.sqrt(h))

    brute = {
        (i, j)
        for i in range(len(rows)) for j in range(i + 1, len(rows))
        if round(hav((rows[i][1], rows[i][2]), (rows[j][1], rows[j][2])), 3)
        <= PAIR_RADIUS_KM
    }
    assert bucketed == brute


# ---------------------------------------------------------------------------
# As-of join (N-17): the union-scan window trick must match a brute-force
# per-click lookup for ANY event arrangement — ties at identical
# timestamps, clicks before any purchase, interleaved users, duplicates.
# ---------------------------------------------------------------------------

EVENT = st.tuples(
    st.integers(min_value=0, max_value=3),   # user_id (small → collisions)
    st.integers(min_value=0, max_value=20),  # ts second (small → ts ties)
    st.booleans(),                           # is_purchase
    st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
)


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(EVENT, min_size=1, max_size=40))
def test_asof_union_scan_matches_bruteforce(spark, events):
    from datetime import datetime, timedelta

    from etl_active911_spark.operators.asof import asof_core

    base = datetime(2024, 1, 1)
    rows = [
        (uid, base + timedelta(seconds=sec), eid, bool(p), float(val))
        for eid, (uid, sec, p, val) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_id long, is_purchase boolean, value double"
    )
    tagged = df.select(
        "user_id",
        "ts",
        F.when(F.col("is_purchase"), 0).otherwise(1).alias("tag"),
        F.when(F.col("is_purchase"), F.col("event_id")).alias("purchase_id"),
        F.when(F.col("is_purchase"), F.col("value")).alias("value"),
        F.when(~F.col("is_purchase"), F.col("event_id")).alias("click_id"),
    )
    got = {
        (r["user_id"], r["click_id"], r["asof_purchase_id"], r["asof_value"])
        for r in asof_core(tagged).collect()
    }

    purchases = [(u, t, e, v) for (u, t, e, p, v) in rows if p]
    want = set()
    for u, t, e, p, v in rows:
        if p:
            continue
        cands = [(pt, pe, pv) for (pu, pt, pe, pv) in purchases if pu == u and pt <= t]
        if cands:
            _, pe, pv = max(cands)  # max (ts, event_id) = as-of winner
            want.add((u, e, pe, pv))
        else:
            want.add((u, e, None, None))
    assert got == want


# --- r4 lenient (moment non-strict) date extraction: tri-engine parity ----

_LENIENT_RE = None


def _lenient_wall_py(s: str):
    """Pure-Python reference for the moment-non-strict digit-run
    extraction (timeparse.LENIENT_PAT): Python re has the same
    leftmost-first backtracking preference as java.util.regex and RE2's
    NFA simulation, so all three engines must agree match-for-match."""
    global _LENIENT_RE
    import re as _re

    from etl_active911_spark.functions.timeparse import LENIENT_PAT

    if _LENIENT_RE is None:
        _LENIENT_RE = _re.compile(LENIENT_PAT)
    m = _LENIENT_RE.search(s)
    if not m:
        return None
    g = m.groups()
    mo, dy, yr = int(g[0]), int(g[1]), int(g[2])
    if len(g[2]) == 2:  # moment parseTwoDigitYear (r5): <=68 -> 2000s
        yr = 2000 + yr if yr <= 68 else 1900 + yr
    hh = int(g[3]) if g[3] else 0
    mi = int(g[4]) if g[4] else 0
    ss = int(g[5]) if g[5] else 0
    try:
        return datetime(yr, mo, dy, hh, mi, ss)
    except ValueError:  # overflow (month 13, Feb 30, hour 99, year 0) → NULL
        return None


_SEP = st.sampled_from(["/", "-", ".", " ", "  ", "", ", ", "x"])
_DATEISH = st.builds(
    lambda mo, d1, y, h, mi, s2, s1, s3, junk: f"{mo}{s1}{d1}{s2}{y}{s3}{h}:{mi}:{s2}{junk}",
    st.integers(0, 19), st.integers(0, 39), st.integers(1, 2400),
    st.integers(0, 30), st.integers(0, 70), _SEP, _SEP, _SEP,
    st.text(alphabet="abc XYZ123456789", max_size=8),
)
_GARBAGE = st.text(alphabet="123456789/-.: abcEST", max_size=30)


@settings(max_examples=3, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.one_of(_DATEISH, _GARBAGE), min_size=25, max_size=60))
def test_lenient_wall_triple_engine_agreement(spark, raws):
    """Spark `_lenient_wall`, the DuckDB `_lenient_wall_sql` oracle
    fragment, and the pure-Python reference must agree on arbitrary
    malformed inputs — separators, padding, junk, overflow and all.
    (Alphabets exclude '0'-runs that could form year 0 — the one
    documented cross-engine edge, CLAUDE.md rule 8.)"""
    import duckdb
    import pandas as pd

    from etl_active911_spark.functions.timeparse import _lenient_wall
    from etl_active911_spark.pipeline.oracle_sql import _lenient_wall_sql

    raws = [r for r in raws if (w := _lenient_wall_py(r)) is None or w.year > 0]
    if not raws:
        return
    want = [_lenient_wall_py(r) for r in raws]

    got_spark = (
        spark.createDataFrame([(r,) for r in raws], "s string")
        .select(_lenient_wall(F.col("s")).alias("w"))
        .collect()
    )
    for r, w, g in zip(raws, want, got_spark):
        assert g["w"] == w, f"spark: {r!r} -> {g['w']} want {w}"

    con = duckdb.connect()
    con.register("raws", pd.DataFrame({"s": raws}))
    got_duck = [x[0] for x in con.execute(
        f"SELECT {_lenient_wall_sql('s')} FROM raws"
    ).fetchall()]
    for r, w, g in zip(raws, want, got_duck):
        g = g.replace(tzinfo=None) if g is not None and g.tzinfo else g
        assert g == w, f"duckdb: {r!r} -> {g} want {w}"


def test_matrix_profile_chunked_equals_sql_anchor(spark):
    """The applyInPandas scale path of the matrix profile must reproduce
    the oracle-checked SQL anchor exactly: same windows, same mean/sd
    formula, same term order, same rounded distance and tie-break."""
    from etl_active911_spark.io import read_table
    from etl_active911_spark.operators.timeseries import (
        matrix_profile_chunked,
        x6_matrix_profile,
    )
    from tests.conftest import SF_SMOKE

    sql_rows = {
        (r["user_id"], r["event_id"]): (r["nn_event_id"], r["mp"])
        for r in x6_matrix_profile(spark, SF_SMOKE).collect()
    }
    np_rows = {
        (r["user_id"], r["event_id"]): (r["nn_event_id"], r["mp"])
        for r in matrix_profile_chunked(read_table(spark, SF_SMOKE, "events")).collect()
    }
    assert sql_rows == np_rows


def test_water_fill_saturation_branch(spark):
    """Skewed capacities must exercise BOTH branches: tiny sources taken
    whole (saturated), the rest split equally with the remainder going
    one unit each to the smallest unsaturated — and the total must equal
    the budget exactly."""
    import pyspark.sql.functions as F

    from etl_active911_spark.operators.sampling import water_fill

    caps = spark.createDataFrame(
        [("tiny", 10), ("small", 50), ("big", 100000), ("huge", 200000), ("mid", 7000)],
        "source string, cap long",
    )
    t = spark.createDataFrame([(20063, 5)], "budget long, n long")
    rows = {r["source"]: r for r in water_fill(caps, t).collect()}
    # tiny, small fully funded; mid? 10+50 + 7000*3 = 21060 > 20063 -> mid unsat
    assert rows["tiny"]["saturated"] == 1 and rows["tiny"]["allocation"] == 10
    assert rows["small"]["saturated"] == 1 and rows["small"]["allocation"] == 50
    for s in ("mid", "big", "huge"):
        assert rows[s]["saturated"] == 0
    # (20063 - 60) / 3 = 6667 r 2 -> mid, big get +1 (smallest unsat first)
    assert rows["mid"]["allocation"] == 6668
    assert rows["big"]["allocation"] == 6668
    assert rows["huge"]["allocation"] == 6667
    assert sum(r["allocation"] for r in rows.values()) == 20063


@settings(max_examples=3, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, (1 << 32) - 1), st.integers(0, (1 << 32) - 1)),
        min_size=4,
        max_size=14,
    )
)
def test_phash_banded_pairs_sound_and_pigeonhole_complete(spark, hashes):
    """Property (r10): banded perceptual near-dup output is (a) SOUND —
    every reported cross-class pair's Hamming distance is the true one
    and ≤ the threshold — and (b) PIGEONHOLE-COMPLETE: every class pair
    within Hamming ≤ 3 appears (3 flips cannot touch all 4 bands)."""
    from etl_active911_spark.operators.multimodal import (
        PHASH_NEAR_HAMMING,
        phash_banded_pairs,
    )

    rows = [(i, 8, 8, h0, h1) for i, (h0, h1) in enumerate(hashes)]
    df = spark.createDataFrame(rows, "doc_id long, width int, height int, h0 long, h1 long")
    got = {
        (r.rep_a, r.rep_b): r.hamming
        for r in phash_banded_pairs(df).collect()
        if r.rep_a != r.rep_b
    }
    reps = {}
    for i, h in enumerate(hashes):
        reps.setdefault(h, i)
    classes = list(reps.items())

    def ham(a, b):
        return bin((a[0] ^ b[0]) | ((a[1] ^ b[1]) << 32)).count("1")

    for i, (ha, ra) in enumerate(classes):
        for hb, rb in classes[i + 1:]:
            d = ham(ha, hb)
            pair = (min(ra, rb), max(ra, rb))
            if d <= 3:
                assert got.get(pair) == d, (pair, d)
    for (a, b), d in got.items():
        ha = next(h for h, r in classes if r == a)
        hb = next(h for h, r in classes if r == b)
        assert d == ham(ha, hb) and d <= PHASH_NEAR_HAMMING


@settings(max_examples=3, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(st.sampled_from("ab cd ef gh ij kl".split()), min_size=1, max_size=9),
        min_size=2,
        max_size=10,
    )
)
def test_lsh_truth_pairs_equals_bruteforce(spark, token_lists):
    """Property (r10): the df-capped ground-truth leg equals brute-force
    distinct-3-shingle Jaccard >= 0.5 over all pairs whenever the cap is
    a no-op (always true at these sizes)."""
    from etl_active911_spark.operators.dedup import lsh_truth_pairs

    docs = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): round(r.jac, 9)
        for r in lsh_truth_pairs(df).collect()
    }

    def shingle_set(toks):
        if len(toks) >= 3:
            return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        return {" ".join(toks)}

    want = {}
    sets = [shingle_set(t) for t in token_lists]
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            inter = len(sets[i] & sets[j])
            union = len(sets[i] | sets[j])
            jac = inter / union
            if jac >= 0.5:
                want[(i, j)] = round(jac, 9)
    assert got == want
