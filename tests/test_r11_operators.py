"""Hand-derived pins for the round-11 operator wave.

Oracle parity (tests/test_oracle_parity.py) proves Spark == DuckDB;
these tests prove both equal the MATH: closed-form series for ACF /
Ljung-Box, crafted corpora for the boilerplate scrub, and injected-slice
polarity for the text-quality gates.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


# ---------------------------------------------------------------------------
# x6_acf / x6_ljung_box: alternating ±1 series, closed forms
# ---------------------------------------------------------------------------

N_ALT = 8  # alternating series length → r_l = (-1)^l (n-l)/n exactly


@pytest.fixture(scope="module")
def alt_series(spark):
    rows = [
        (1, f"2024-01-01 00:{i:02d}:00", i, 1.0 if i % 2 == 0 else -1.0)
        for i in range(N_ALT)
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts string, event_id long, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))


def test_acf_alternating_closed_form(spark, alt_series):
    """Alternating ±1, mean 0: r_l = (-1)^l (n-l)/n — exact on the
    micro grid (n=8 → -0.875, 0.75, -0.625)."""
    from etl_active911_spark.operators.timeseries import acf_rows

    got = {r["lag"]: r["acf"] for r in acf_rows(spark, alt_series).collect()}
    assert got == {1: -0.875, 2: 0.75, 3: -0.625}


def test_ljung_box_alternating_closed_form(spark, alt_series):
    """Q = n(n+2) Σ r_k²/(n−k) = 8·10·(r1²/7 + r2²/6 + r3²/5) = 22.5
    exactly for the alternating series; far past the 7.81 critical
    value → non-white."""
    from etl_active911_spark.operators.timeseries import ljung_rows

    row = ljung_rows(alt_series).collect()[0]
    assert row["n"] == N_ALT
    assert row["q_lb"] == 22.5
    assert row["is_nonwhite"] == 1


def test_ljung_box_iid_like_series_not_flagged(spark):
    """A low-autocorrelation series (values from a fixed scramble) must
    not trip the 5% threshold."""
    from etl_active911_spark.operators.timeseries import ljung_rows

    vals = [-0.8, -0.6, 0.1, 0.2, 0.2, -0.3, 0.3, 0.3, 0.4, 0.8,
            -0.8, 0.5, 0.2, 0.4, 0.8, -0.2]  # exact Q ≈ 0.031
    rows = [
        (7, f"2024-01-01 01:{i:02d}:00", i, v) for i, v in enumerate(vals)
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts string, event_id long, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    row = ljung_rows(ev).collect()[0]
    assert row["is_nonwhite"] == 0
    assert 0.0 <= row["q_lb"] < 7.814728


# ---------------------------------------------------------------------------
# x2_boilerplate_scrub: crafted corpus ledger
# ---------------------------------------------------------------------------


def test_scrub_identical_docs_keep_one_copy(spark):
    """Two identical docs + one unique: the canonical (lowest doc_id)
    keeps every token, the twin is fully scrubbed, the unique doc is
    untouched — C4 semantics (keep once, remove everywhere else)."""
    from etl_active911_spark.operators.dedup import boilerplate_scrub_ledger

    body = " ".join(f"w{i}" for i in range(30))  # 30 tokens → 2 segments
    docs = spark.createDataFrame(
        [(1, body), (2, body), (3, "unique text here")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in boilerplate_scrub_ledger(docs).collect()}
    assert got[1]["tokens_after"] == 30 and got[1]["n_removed_segs"] == 0
    assert got[2]["tokens_after"] == 0 and got[2]["n_removed_segs"] == 2
    assert got[3]["tokens_after"] == 3 and got[3]["removed_share"] == 0.0
    assert got[2]["removed_share"] == 1.0


def test_scrub_partial_quote_removes_only_shared_segment(spark):
    """A doc quoting exactly one aligned segment of another loses only
    that segment's tokens."""
    from etl_active911_spark.operators.dedup import (
        SCRUB_SEG,
        boilerplate_scrub_ledger,
    )

    seg = " ".join(f"q{i}" for i in range(SCRUB_SEG))
    own = " ".join(f"o{i}" for i in range(SCRUB_SEG))
    docs = spark.createDataFrame(
        [(1, seg + " " + own), (2, seg + " " + " ".join(f"z{i}" for i in range(SCRUB_SEG)))],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in boilerplate_scrub_ledger(docs).collect()}
    assert got[1]["n_removed_segs"] == 0  # canonical owner of the quote
    assert got[2]["n_removed_segs"] == 1
    assert got[2]["tokens_after"] == SCRUB_SEG  # kept its own half


def test_scrub_corpus_conservation(spark):
    """Fixture-level invariant: tokens_after + removed == tokens_before
    per doc, summed over the corpus; every doc appears exactly once."""
    from etl_active911_spark.io import read_table, spread
    from etl_active911_spark.operators.dedup import boilerplate_scrub_ledger

    docs = spread(read_table(spark, SF_ORACLE, "documents"), "doc_id")
    led = boilerplate_scrub_ledger(docs)
    agg = led.agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum(F.col("n_tokens") - F.col("tokens_after")).alias("removed"),
        F.sum("n_tokens").alias("before"),
        F.sum("tokens_after").alias("after"),
    ).collect()[0]
    assert agg["nd"] == docs.count()
    assert agg["before"] == agg["after"] + agg["removed"]
    assert agg["removed"] > 0  # the fixture's exact dups engage the scrub


# ---------------------------------------------------------------------------
# x4_unicode_anomaly / x4_code_detection: injected-slice polarity
# ---------------------------------------------------------------------------


def test_unicode_anomaly_slices(spark):
    from etl_active911_spark.plans.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["x4_unicode_anomaly"](spark, SF_ORACLE).collect()
    by_mod = {}
    for r in rows:
        by_mod.setdefault(r["doc_id"] % 31, []).append(r)
    assert all(r["n_control"] >= 1 and r["is_anomalous"] == 1 for r in by_mod[3])
    assert all(r["n_replacement"] >= 1 and r["is_anomalous"] == 1 for r in by_mod[7])
    assert all(r["mixed_script"] == 1 and r["is_anomalous"] == 1 for r in by_mod[11])
    clean = [r for m, rs in by_mod.items() if m not in (3, 7, 11) for r in rs]
    assert clean and all(r["is_anomalous"] == 0 for r in clean)


def test_code_detection_slices(spark):
    from etl_active911_spark.plans.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["x4_code_detection"](spark, SF_ORACLE).collect()
    injected = [r for r in rows if r["doc_id"] % 37 in (5, 9)]
    clean = [r for r in rows if r["doc_id"] % 37 not in (5, 9)]
    assert injected and all(r["n_sym"] >= 10 for r in injected)
    # the flag must fire on injected docs except where a long clean body
    # dilutes the snippet below threshold — and never on clean docs
    assert any(r["is_code"] == 1 for r in injected)
    assert all(r["is_code"] == 0 for r in clean)


# ---------------------------------------------------------------------------
# x5_media_hash_dedup: group arithmetic
# ---------------------------------------------------------------------------


def test_media_hash_dedup_groups(spark):
    """Every reported group is a real duplicate set: n_copies ≥ 2,
    canonical is the min doc, wasted = (copies−1)·size; the group
    structure matches the injection rule computed independently in
    Python (fixture texts are all distinct, so injected re-uploads are
    the only duplicates)."""
    from etl_active911_spark.io import read_table
    from etl_active911_spark.plans.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["x5_media_hash_dedup"](spark, SF_ORACLE).collect()
    n_docs = read_table(spark, SF_ORACLE, "documents").count()
    groups: dict[int, list[int]] = {}
    for i in range(n_docs):
        if i % 50 == 49:
            groups.setdefault(i % 7, []).append(i)
    expected = {
        (len(ids), min(ids)) for ids in groups.values() if len(ids) >= 2
    }
    assert expected, "injection must create ≥1 duplicate group"
    got = {(r["n_copies"], r["canonical_doc"]) for r in rows}
    assert got == expected
    for r in rows:
        assert r["wasted_bytes"] == (r["n_copies"] - 1) * r["n_bytes"]
        assert r["n_bytes"] == len(b"shared asset payload 0")


# ---------------------------------------------------------------------------
# x4_textrank_keywords: ranking structure
# ---------------------------------------------------------------------------


def test_textrank_structure(spark):
    """Exactly TOP keywords with dense ranks; every score carries at
    least the damping base 0.15; ordering is (score desc, token) —
    integer ties break deterministically."""
    from etl_active911_spark.operators.textual import TEXTRANK_TOP
    from etl_active911_spark.plans.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["x4_textrank_keywords"](spark, SF_ORACLE).collect()
    assert len(rows) == TEXTRANK_TOP
    assert sorted(r["rnk"] for r in rows) == list(range(1, TEXTRANK_TOP + 1))
    ordered = sorted(rows, key=lambda r: r["rnk"])
    for a, b in zip(ordered, ordered[1:]):
        assert (a["rank_score"], b["token"]) >= (b["rank_score"], a["token"])
        assert a["rank_score"] >= b["rank_score"]
    assert all(r["rank_score"] >= 0.15 for r in rows)
    assert all(r["w_degree"] > 0 for r in rows)


# ---------------------------------------------------------------------------
# x6_robust_outliers: hand-computed Hampel cases
# ---------------------------------------------------------------------------


def test_hampel_closed_forms(spark, tmp_path):
    """Odd series [1,2,3,4,100]: med 3, MAD 1 → only 100 flags
    (abs_dev 97, threshold 4.4478). Even series [1..5,100]: med 3.5,
    MAD 1.5 → only 100 flags (abs_dev 96.5). Constant-heavy series
    [5,5,5,5,9]: MAD 0 → excluded entirely."""
    import duckdb

    from etl_active911_spark.operators.timeseries import _HAMPEL_ORACLE

    rows = []
    for uid, vals in (
        (1, [1.0, 2.0, 3.0, 4.0, 100.0]),
        (2, [1.0, 2.0, 3.0, 4.0, 5.0, 100.0]),
        (3, [5.0, 5.0, 5.0, 5.0, 9.0]),
    ):
        for i, v in enumerate(vals):
            rows.append((uid, i, v))
    con = duckdb.connect()
    con.execute("CREATE TABLE events(user_id BIGINT, event_id BIGINT, value DOUBLE)")
    con.executemany("INSERT INTO events VALUES (?, ?, ?)", rows)
    got = con.sql(_HAMPEL_ORACLE).fetchall()
    assert {(r[0], r[1]) for r in got} == {(1, 4), (2, 5)}
    by_uid = {r[0]: r for r in got}
    assert by_uid[1][3] == 97.0 and by_uid[1][4] == 1.0
    assert by_uid[2][3] == 96.5 and by_uid[2][4] == 1.5


def test_hampel_spark_matches_crafted(spark):
    """Spark side of the same crafted series through the split core:
    identical flags."""
    from etl_active911_spark.operators.timeseries import hampel_outliers

    ev = spark.createDataFrame(
        [(1, i, v) for i, v in enumerate([1.0, 2.0, 3.0, 4.0, 100.0])]
        + [(2, i, v) for i, v in enumerate([1.0, 2.0, 3.0, 4.0, 5.0, 100.0])]
        + [(3, i, v) for i, v in enumerate([5.0, 5.0, 5.0, 5.0, 9.0])],
        "user_id long, event_id long, value double",
    )
    got = hampel_outliers(ev).collect()
    assert {(r["user_id"], r["event_id"]) for r in got} == {(1, 4), (2, 5)}
    by_uid = {r["user_id"]: r for r in got}
    assert by_uid[1]["abs_dev"] == 97.0 and by_uid[1]["mad"] == 1.0
    assert by_uid[2]["abs_dev"] == 96.5 and by_uid[2]["mad"] == 1.5


# ---------------------------------------------------------------------------
# x2_url_canonical_dedup: independent Python replica of the group structure
# ---------------------------------------------------------------------------


def _py_canonical(doc_id: int) -> tuple[str, str]:
    """Raw + canonical URL per the injection rule, computed with plain
    Python string logic (no regex) — independent of both engines."""
    host = ["https://WWW.Example.COM", "https://www.example.com",
            "https://www.example.com:443"][doc_id % 3]
    raw = host + f"/a/{doc_id % 120}"
    if doc_id % 5 == 2:
        raw += "/"
    q = {3: "?utm_source=feed&utm_campaign=x", 5: "?ref=tw",
         6: "?utm_medium=em&id=7"}.get(doc_id % 7, "")
    raw += q
    if doc_id % 11 == 4:
        raw += "#section2"
    # canonical: lowercase host, no port/www/fragment/trailing-slash,
    # tracking params stripped, surviving params sorted
    canon = f"https://example.com/a/{doc_id % 120}"
    params = [p for p in q.lstrip("?").split("&")
              if p and not (p.startswith("utm_") or p.startswith("ref="))]
    if params:
        canon += "?" + "&".join(sorted(params))
    return raw, canon


def test_url_dedup_matches_python_replica(spark):
    from etl_active911_spark.io import read_table
    from etl_active911_spark.plans.registry import QUERIES, load_all

    load_all()
    n_docs = read_table(spark, SF_ORACLE, "documents").count()
    groups: dict[str, list[int]] = {}
    variants: dict[str, set[str]] = {}
    for i in range(n_docs):
        raw, canon = _py_canonical(i)
        groups.setdefault(canon, []).append(i)
        variants.setdefault(canon, set()).add(raw)
    want = {
        (c, len(ids), len(variants[c]), min(ids))
        for c, ids in groups.items()
        if len(ids) >= 2
    }
    got = {
        (r["canonical_url"], r["n_docs"], r["n_variants"], r["canonical_doc"])
        for r in QUERIES["x2_url_canonical_dedup"](spark, SF_ORACLE).collect()
    }
    assert got == want
    # the variant surface actually exercises every canonicalization rule:
    # a real param survives canonicalization (its groups are singletons
    # at sf0.01 — lcm(7,120) > n — so check the full canonical set) ...
    assert any("?id=7" in c for c in groups)
    # ... and no tracking/fragment/www/port debris survives anywhere
    assert all("utm_" not in c and "#" not in c and "www." not in c
               and ":443" not in c for c in groups)
    assert want, "variant collapse must produce multi-doc groups"


# ---------------------------------------------------------------------------
# x5_mp4_box_walk: real ISO-BMFF round-trip + damage detection
# ---------------------------------------------------------------------------


def test_mp4_roundtrip_hand_case():
    """A hand-parameterized container parses back to exactly the values
    it was built from, through the real box layouts (big-endian sizes,
    16.16 dimensions, timescale-600 duration conversion)."""
    from etl_active911_spark.operators.multimodal import encode_mp4, walk_mp4_boxes

    blob = encode_mp4(ticks=900, width=640, height=480, mdat_n=100,
                      with_free=False, fill=b"\xab")
    r = walk_mp4_boxes(blob)
    assert r == {
        "n_boxes": 8, "dur_ms": 1500,  # 900 ticks / 600 per s = 1.5 s
        "w": 640, "h": 480, "mdat": 100, "truncated": 0,
    }
    # free box counts as a box, changes nothing else
    r2 = walk_mp4_boxes(encode_mp4(ticks=900, width=640, height=480,
                                   mdat_n=100, with_free=True, fill=b"\xab"))
    assert (r2["n_boxes"], r2["dur_ms"], r2["truncated"]) == (9, 1500, 0)


def test_mp4_truncation_detected_with_declared_mdat():
    """Cutting bytes off the end (inside mdat) flips the truncation
    verdict via the declared-size-vs-EOF check while the surviving mdat
    header still reports the DECLARED payload — magic-byte sniffing
    passes this file; the walker must not."""
    from etl_active911_spark.operators.multimodal import (
        MP4_TRUNC_BYTES,
        encode_mp4,
        walk_mp4_boxes,
    )

    blob = encode_mp4(ticks=60, width=16, height=16, mdat_n=100,
                      with_free=False, fill=b"\x01\x02")
    r = walk_mp4_boxes(blob[:-MP4_TRUNC_BYTES])
    assert r["truncated"] == 1
    assert r["mdat"] == 100          # declared, not surviving, payload
    assert r["n_boxes"] == 8         # every header incl. mdat's was read
    # cut INSIDE the 8-byte mdat header (4 of 8 bytes survive): too short
    # to read a box header, so the declared payload is lost and the
    # sub-header-tail branch flags it; every earlier box still walked
    r2 = walk_mp4_boxes(blob[: len(blob) - 104])
    assert r2["truncated"] == 1 and r2["mdat"] is None
    assert r2["n_boxes"] == 7  # ftyp + moov subtree; mdat header unreadable
    # deeper damage — into moov's own extent — flags at the moov header
    # and never walks its children
    r3 = walk_mp4_boxes(blob[: len(blob) - 109])
    assert r3["truncated"] == 1 and r3["mdat"] is None and r3["n_boxes"] == 1


def test_mp4_walker_ignores_unknown_leaf_boxes():
    """A foreign leaf box (skip-over semantics, ISO 14496-12 §4.2) is
    counted and stepped over without derailing typed extraction."""
    import struct

    from etl_active911_spark.operators.multimodal import encode_mp4, walk_mp4_boxes

    blob = encode_mp4(ticks=600, width=32, height=64, mdat_n=120,
                      with_free=False, fill=b"\x00")
    foreign = struct.pack(">I", 8 + 5) + b"wide "[:4] + b"abcde"
    r = walk_mp4_boxes(blob + foreign)
    assert r["truncated"] == 0
    assert r["n_boxes"] == 9
    assert (r["dur_ms"], r["w"], r["h"], r["mdat"]) == (1000, 32, 64, 120)


def test_mp4_walker_total_on_arbitrary_cuts():
    """Property: the walker is TOTAL on every prefix of a valid container
    (never raises, never over-reads) and its truncation verdict is exact —
    1 for every strict prefix long enough to start a box, 0 only for the
    complete file. Guards the bound arithmetic against off-by-ones."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from etl_active911_spark.operators.multimodal import encode_mp4, walk_mp4_boxes

    blob = encode_mp4(ticks=1234, width=320, height=240, mdat_n=777,
                      with_free=True, fill=b"\x5a\xa5")

    # clean parses happen exactly at top-level box boundaries
    # (ftyp 24 | free 16 | moov 256 | mdat 8+777); any other cut either
    # overruns a started box or leaves a sub-header tail — both flagged
    boundaries = {0, 24, 40, 296, len(blob)}

    @settings(max_examples=200, deadline=None)
    @given(st.integers(min_value=0, max_value=len(blob)))
    def check(cut):
        r = walk_mp4_boxes(blob[:cut])
        assert r["truncated"] == (0 if cut in boundaries else 1)
        assert 0 <= r["n_boxes"] <= 9

    check()


# ---------------------------------------------------------------------------
# x4_countmin_sketch: CMS guarantees against an independent Python replica
# ---------------------------------------------------------------------------


def _py_cms_estimate(all_grams, gram):
    """Independent CMS replica: same md5-60bit bucket hash (CLAUDE.md
    rule 10: int(md5hex[:15],16) == token_hash60), pure Python counters."""
    import hashlib as hl
    from collections import Counter

    from etl_active911_spark.operators.textual import CMS_DEPTH, CMS_WIDTH

    def bucket(j, g):
        return int(hl.md5(f"{j}:{g}".encode()).hexdigest()[:15], 16) % CMS_WIDTH

    counters = Counter((j, bucket(j, g)) for g in all_grams for j in range(CMS_DEPTH))
    return min(counters[(j, bucket(j, gram))] for j in range(CMS_DEPTH))


def test_cms_crafted_corpus_matches_python_replica(spark):
    """Every (exact, estimate) cell on a crafted gram multiset equals the
    independent replica, and the one-sided guarantee holds cell-by-cell."""
    from etl_active911_spark.operators.textual import countmin_calibration

    all_grams = (
        ["a b"] * 5 + ["b a"] * 3 + ["c d"] * 2 + ["d c"] + ["e f"] * 4
    )
    grams = spark.createDataFrame([(g,) for g in all_grams], "gram string")
    got = {r["gram"]: r for r in countmin_calibration(grams).collect()}
    from collections import Counter

    exact = Counter(all_grams)
    assert set(got) == set(exact)
    for g, r in got.items():
        assert r["exact_count"] == exact[g]
        assert r["cms_estimate"] == _py_cms_estimate(all_grams, g)
        assert r["overestimate"] == r["cms_estimate"] - r["exact_count"]
        assert r["cms_estimate"] >= r["exact_count"]  # one-sided, always


def test_cms_fixture_one_sided_and_collisions_exercised(spark):
    """On the fixture corpus the estimate never undershoots (CMS
    guarantee) AND the width genuinely collides (every head bigram
    carries positive collision mass) — the calibration would be an
    identity check otherwise."""
    from etl_active911_spark.plans import registry

    registry.load_all()
    rows = registry.QUERIES["x4_countmin_sketch"](spark, SF_ORACLE).collect()
    assert len(rows) == 32
    assert all(r["overestimate"] >= 0 for r in rows)
    assert sum(1 for r in rows if r["overestimate"] > 0) >= 16


# ---------------------------------------------------------------------------
# n24_cdc_apply: last-writer-wins fold with terminal-delete semantics
# ---------------------------------------------------------------------------


def test_cdc_apply_semantics_crafted(spark):
    """I→U keeps the latest values; a terminal D removes the entity even
    with earlier live versions; a D followed by a later I resurrects it —
    exactly MERGE INTO / upsert-sink last-writer-wins."""
    from etl_active911_spark.operators.scd import cdc_fold

    log = spark.createDataFrame(
        [
            (1, 10, "I", 5.0, "O"), (1, 20, "U", 7.5, "F"),            # survives as seq 20
            (2, 11, "I", 1.0, "O"), (2, 21, "D", 1.0, "O"),            # deleted
            (3, 12, "D", 0.0, "O"), (3, 22, "I", 9.0, "P"),            # resurrected
            (4, 13, "I", 4.0, "O"),                                    # single insert
        ],
        "entity_id long, seq long, op string, price double, status string",
    )
    got = {
        r["entity_id"]: (r["last_seq"], r["n_changes"], r["price"], r["status"])
        for r in cdc_fold(log).collect()
    }
    assert got == {
        1: (20, 2, 7.5, "F"),
        3: (22, 2, 9.0, "P"),
        4: (13, 1, 4.0, "O"),
    }


def test_jsonl_deadletter_null_struct_semantics(spark):
    """Pins the from_json PERMISSIVE contract n26 relies on: a malformed
    line parses to a NULL struct (not an error, not a partial row), and
    a valid line round-trips every field."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [('{"doc_id": 7, "source": "web", "n": 42}',), ('#{"doc_id": 7}',)],
        "raw string",
    ).select(F.from_json("raw", "doc_id BIGINT, source STRING, n BIGINT").alias("p"))
    rows = df.select("p.doc_id", "p.source", "p.n").collect()
    assert (rows[0]["doc_id"], rows[0]["source"], rows[0]["n"]) == (7, "web", 42)
    assert rows[1]["doc_id"] is None and rows[1]["source"] is None


def test_k_anonymity_audit_crafted_semantics(spark):
    """A 2-member class violates k; a large-but-homogeneous class
    violates l only; a large diverse class is absent from the report."""
    from etl_active911_spark.operators.relational import kanon_violations

    rows = (
        # class (1, band 0): 2 members, 2 segments -> viol_k only... l=2 < 3 also
        [(1, 100.0, "A"), (1, 200.0, "B")]
        # class (2, band 0): 6 members, 1 segment -> viol_l only
        + [(2, float(50 * i), "A") for i in range(6)]
        # class (3, band 0): 6 members, 3 segments -> clean
        + [(3, float(60 * i), ["A", "B", "C"][i % 3]) for i in range(6)]
    )
    cust = spark.createDataFrame(
        rows, "c_nationkey int, c_acctbal double, c_mktsegment string"
    )
    got = {
        r["nation"]: (r["k"], r["l"], r["viol_k"], r["viol_l"])
        for r in kanon_violations(cust).collect()
    }
    assert got == {1: (2, 2, 1, 1), 2: (6, 1, 0, 1)}  # nation 3 clean, absent


def test_k_anonymity_band_floors_negative_balances(spark):
    """The band expression must FLOOR a negative balance (-999.5 -> band
    -1), not truncate toward zero (band 0) — the rule-28 hazard the
    docstring pins; a truncating band would merge debtors into band 0."""
    from etl_active911_spark.operators.relational import kanon_violations

    cust = spark.createDataFrame(
        [(9, b, "A") for b in (-999.5, -1.0, 0.0, 1999.99, 2000.0)],
        "c_nationkey int, c_acctbal double, c_mktsegment string",
    )
    got = {
        r["acctbal_band"]: r["k"] for r in kanon_violations(cust).collect()
    }
    # floor: the two debtors form band -1 (truncation toward zero would
    # merge them into band 0); all classes tiny, so all are reported
    assert got == {-1: 2, 0: 2, 1: 1}


def test_watermark_planner_dial_shape(spark):
    """The planner's cost curve must be monotone (a longer watermark
    never drops more), engaged at the short end (the injected delays
    make real out-of-orderness), and zero once the delay exceeds
    WM_DELAY_MAX (lateness is bounded by the injected delay window)."""
    from etl_active911_spark.plans.registry import QUERIES, load_all
    from etl_active911_spark.streaming.windows import WM_DELAY_MAX, WM_GRID

    load_all()
    rows = {
        r["delay_s"]: r
        for r in QUERIES["n11_watermark_planner"](spark, SF_ORACLE).collect()
    }
    assert set(rows) == set(WM_GRID)
    drops = [rows[g]["n_dropped"] for g in sorted(WM_GRID)]
    assert drops == sorted(drops, reverse=True)  # monotone non-increasing
    assert drops[0] > 0                          # dial engaged
    assert rows[max(WM_GRID)]["n_dropped"] == 0 and max(WM_GRID) >= WM_DELAY_MAX
    for r in rows.values():
        assert r["n_events"] == rows[WM_GRID[0]]["n_events"]


def test_mips_norm_augmentation_equivalence(spark):
    """The Bachrach RecSys'14 reduction the docstring stakes the scale
    path on: append sqrt(M² − |x|²) to corpus vectors and 0 to queries,
    and cosine ORDER in d+1 dims equals inner-product order — so every
    cosine index in the family serves MIPS. Checked per query against
    the shipped operator's ranking."""
    import math

    from etl_active911_spark.io import read_table
    from etl_active911_spark.operators.similarity import N_QUERIES, TOP_K
    from etl_active911_spark.plans.registry import QUERIES, load_all

    load_all()
    got = {
        (r["query_id"], r["rnk"]): r["vec_id"]
        for r in QUERIES["x3_mips_topk"](spark, SF_ORACLE).collect()
    }
    emb = {
        r["vec_id"]: r["embedding"]
        for r in read_table(spark, SF_ORACLE, "embeddings").collect()
    }
    M = max(math.sqrt(sum(v * v for v in e)) for e in emb.values())
    aug = {
        i: e + [math.sqrt(max(0.0, M * M - sum(v * v for v in e)))]
        for i, e in emb.items()
    }

    def ip(a, b):
        return sum(x * y for x, y in zip(a, b))

    def cos(a, b):
        return ip(a, b) / (math.sqrt(ip(a, a)) * math.sqrt(ip(b, b)))

    def half_up6(x):
        # Spark F.round is BigDecimal HALF_UP (away from zero) — NOT
        # Python round()'s banker's rounding (CLAUDE.md rule 11)
        s = 1 if x >= 0 else -1
        return s * math.floor(abs(x) * 1_000_000 + 0.5)

    for qid in range(N_QUERIES):
        qhat = emb[qid] + [0.0]
        others = [i for i in emb if i != qid]
        ips = {i: ip(emb[qid], emb[i]) for i in others}
        coss = {i: cos(qhat, aug[i]) for i in others}
        # (1) the Bachrach reduction on EXACT values: augmented cosine is
        # strictly order-preserving in the raw inner product (no rounding
        # on either side, so 6dp score collisions cannot false-fail this).
        # Equivalent to the all-pairs check: walk others sorted by ip DESC
        # and require cos strictly decreasing wherever ip strictly does.
        by_ip = sorted(others, key=lambda i: -ips[i])
        for a, b in zip(by_ip, by_ip[1:]):
            if ips[a] > ips[b]:
                assert coss[a] > coss[b]
        # (2) the operator matches the half-up-rounded ip ranking with the
        # canonical (score DESC, vec_id) tie policy
        want = sorted(others, key=lambda i: (-half_up6(ips[i]), i))[:TOP_K]
        assert [got[(qid, r)] for r in range(1, TOP_K + 1)] == want


def test_frontier_schedule_politeness_invariant(spark):
    """No wave may contain two URLs from the same host (the politeness
    constraint the op exists to enforce): per-wave n_urls == n_hosts for
    every wave, waves are dense 1..max, and the URL total is conserved."""
    from etl_active911_spark.plans.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["x2_frontier_schedule"](spark, SF_ORACLE).collect()
    assert all(r["n_urls"] == r["n_hosts"] for r in rows)
    waves = sorted(r["wave"] for r in rows)
    assert waves == list(range(1, len(waves) + 1))
    assert sum(r["n_urls"] for r in rows) == 500  # sf0.01 documents


def test_lineage_chain_tamper_evidence(spark):
    """One flipped byte in one document changes its shard's digest and
    EVERY downstream chain link while leaving earlier links untouched —
    the property that makes the final link a commitment to the whole
    ordered release. Also: dropping the last shard changes nothing
    upstream (append-only extension), and the chain recomputes
    deterministically."""
    from etl_active911_spark.operators.sampling import LINEAGE_SHARD, lineage_chain

    n = 3 * LINEAGE_SHARD  # exactly 3 shards
    docs = [(i, f"document body {i}") for i in range(n)]
    base = {
        r["shard_id"]: (r["shard_md5"], r["chain_md5"])
        for r in lineage_chain(
            spark, spark.createDataFrame(docs, "doc_id long, text string")
        ).collect()
    }
    assert sorted(base) == [0, 1, 2]
    # deterministic recompute
    again = {
        r["shard_id"]: (r["shard_md5"], r["chain_md5"])
        for r in lineage_chain(
            spark, spark.createDataFrame(docs, "doc_id long, text string")
        ).collect()
    }
    assert again == base
    # tamper with one doc in the MIDDLE shard
    tampered = [
        (i, t + "!") if i == LINEAGE_SHARD + 7 else (i, t) for i, t in docs
    ]
    tam = {
        r["shard_id"]: (r["shard_md5"], r["chain_md5"])
        for r in lineage_chain(
            spark, spark.createDataFrame(tampered, "doc_id long, text string")
        ).collect()
    }
    assert tam[0] == base[0]                        # upstream untouched
    assert tam[1][0] != base[1][0]                  # tampered shard digest
    assert tam[1][1] != base[1][1]                  # ...and its link
    assert tam[2][0] == base[2][0]                  # shard 2 bytes unchanged
    assert tam[2][1] != base[2][1]                  # but its link re-chains


def test_overmerge_audit_chain_vs_clique(spark):
    """The audit's polarity: a 3-clique reads density 1.0 with tight
    jaccard; a 3-chain (A-B, B-C, no A-C edge) reads density 2/3 with the
    weak link exposed — the chained over-merge signature."""
    from etl_active911_spark.operators.clustering import overmerge_audit_rows

    pairs = spark.createDataFrame(
        [
            # clique: docs 1,2,3 fully connected, strong
            (1, 2, 0.9), (1, 3, 0.88), (2, 3, 0.92),
            # chain: 10-11-12, weak middle, no closing edge
            (10, 11, 0.55), (11, 12, 0.52),
            # a pair (size-2 cluster) must be absent from the audit
            (20, 21, 0.7),
        ],
        "doc_a long, doc_b long, jaccard double",
    )
    got = {r["component"]: r for r in overmerge_audit_rows(pairs).collect()}
    assert set(got) == {1, 10}
    clique, chain = got[1], got[10]
    assert (clique["size"], clique["n_edges"]) == (3, 3)
    assert clique["edge_density"] == 1.0
    assert clique["min_jaccard"] == 0.88
    assert (chain["size"], chain["n_edges"]) == (3, 2)
    assert chain["edge_density"] == 0.666667  # 2/3 half-up at 6dp
    assert chain["min_jaccard"] == 0.52
