"""Synthetic pins for the r10 operator wave — closed-form cases the
fixture-oracle parity can't distinguish from luck."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_gap_detection_localizes_outages(spark):
    from etl_active911_spark.operators.timeseries import _GAP_ORACLE  # noqa: F401
    from etl_active911_spark.operators import timeseries as ts_mod

    t0 = datetime.datetime(2024, 1, 1)
    # user 1: events every 10 min, with ONE 2-hour hole after the 5th
    rows = []
    t = t0
    for i in range(5):
        rows.append((1, i + 1, t, "a", 1.0, "{}"))
        t += datetime.timedelta(minutes=10)
    t += datetime.timedelta(hours=2)
    for i in range(5, 8):
        rows.append((1, i + 1, t, "a", 1.0, "{}"))
        t += datetime.timedelta(minutes=10)
    ev = spark.createDataFrame(
        rows,
        "user_id long, event_id long, ts timestamp_ntz, event_type string, "
        "value double, props string",
    )
    # drive the registered body directly over the synthetic frame
    from pyspark.sql import Window

    wspec = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select("user_id", "ts", F.lag("ts").over(wspec).alias("pv")).filter(
        F.col("pv").isNotNull()
    )
    gap_s = F.expr("timestampdiff(MICROSECOND, pv, ts)") / F.lit(1000000)
    d = g.select("user_id", F.floor(gap_s).cast("bigint").alias("gap_s"))
    out = d.groupBy("user_id").agg(
        (F.count(F.lit(1)) + 1).cast("bigint").alias("n_events"),
        F.max("gap_s").cast("bigint").alias("max_gap_s"),
        F.sum(
            F.when(F.col("gap_s") > ts_mod.GAP_ALERT_SECONDS, 1).otherwise(0)
        ).cast("bigint").alias("n_outages"),
        F.sum("gap_s").cast("bigint").alias("span_s"),
    ).collect()[0]
    assert out["n_events"] == 8
    # the hole = 2h (previous step's +10min is part of the arithmetic:
    # last pre-hole event to first post-hole event = 10min + 2h)
    assert out["max_gap_s"] == 2 * 3600 + 600
    assert out["n_outages"] == 1
    assert out["span_s"] == 6 * 600 + (2 * 3600 + 600)


def test_dup_ngram_fraction_closed_form(spark):
    from etl_active911_spark.plans import registry

    registry.load_all()
    # "a b c a b c a b c": 7 trigrams, classes: 'a b c'x3, 'b c a'x2,
    # 'c a b'x2 -> all 7 occurrences duplicated -> fraction 1.0
    # "p q r s": 2 distinct trigrams, none repeated -> 0.0
    import etl_active911_spark.operators.textual as tx
    from etl_active911_spark.operators.dedup import shingle_rows

    docs = spark.createDataFrame(
        [(1, "a b c a b c a b c"), (2, "p q r s")], "doc_id long, text string"
    )
    per = shingle_rows(docs, k=3).groupBy("doc_id", "shingle").agg(
        F.count(F.lit(1)).alias("c")
    )
    dup = F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0))
    got = {
        r["doc_id"]: (r["n"], r["d"])
        for r in per.groupBy("doc_id")
        .agg(F.sum("c").alias("n"), dup.alias("d"))
        .collect()
    }
    assert got == {1: (7, 7), 2: (2, 0)}


def test_curation_v7_funnel_monotone(spark):
    from etl_active911_spark.plans import registry

    registry.load_all()
    rows = registry.QUERIES["x9_curation_v7"](spark, SF_SMOKE).collect()
    assert rows, "funnel empty"
    for r in rows:
        assert r["n_final"] <= min(r["n_media_valid"], r["n_meta_ok"], r["n_quality"])
        assert r["n_total"] >= max(r["n_media_valid"], r["n_meta_ok"], r["n_quality"])
        assert abs(r["final_rate"] - round(r["n_final"] / r["n_total"], 6)) < 1e-9


def test_ivf_delete_conserves_vectors(spark):
    from etl_active911_spark.plans import registry

    registry.load_all()
    rows = registry.QUERIES["x3_ann_ivf_delete"](spark, SF_SMOKE).collect()
    from etl_active911_spark.io import read_table

    n_vec = read_table(spark, SF_SMOKE, "embeddings").count()
    assert sum(r["n_live"] + r["n_tombstoned"] for r in rows) == n_vec
    n_dead = sum(r["n_tombstoned"] for r in rows)
    exact_dead = read_table(spark, SF_SMOKE, "embeddings").filter(
        F.col("vec_id") % 17 == 2
    ).count()
    assert n_dead == exact_dead
    for r in rows:
        frac = r["n_tombstoned"] / (r["n_live"] + r["n_tombstoned"])
        assert r["needs_compaction"] == (1 if frac > 0.08 else 0)


def test_bbit_estimator_identical_docs(spark):
    # identical docs share every minhash, hence every low bit -> est 1.0
    from etl_active911_spark.operators.dedup import (
        N_HASHES,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"), (2, "alpha beta gamma delta epsilon")],
        "doc_id long, text string",
    )
    sigs = {r["doc_id"]: r for r in minhash_signatures(docs).collect()}
    n_eq = sum(
        1 for i in range(N_HASHES) if sigs[1][f"h{i}"] % 2 == sigs[2][f"h{i}"] % 2
    )
    assert n_eq == N_HASHES  # estimator 2*1-1 = 1.0


def test_template_detection_groups_structures(spark):
    from etl_active911_spark.operators.dedup import normalized_text
    from etl_active911_spark.operators.textual import (
        TEMPLATE_MIN_DOCS,
        TEMPLATE_PREFIX_TOKENS,
    )

    # three docs with identical opening structure (S M L pattern) but
    # different words; two docs with another structure (below threshold)
    rows = [
        (1, "to charge delivery of it parcels backed items zz"),
        (2, "we bought pursuant in at coupons policy orders yy"),
        (3, "her walked alright up to pledges formal claims xx"),
        (10, "a a a a a a a a"),
        (11, "bbbbbbbb c d e f g h i"),
    ]
    # build fingerprints exactly like the registered query
    toks = F.split(normalized_text(F.col("text")), " ")
    cls = F.transform(
        F.slice(toks, 1, TEMPLATE_PREFIX_TOKENS),
        lambda w: F.when(F.length(w) <= 3, F.lit("S"))
        .when(F.length(w) <= 6, F.lit("M"))
        .otherwise(F.lit("L")),
    )
    df = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", F.array_join(cls, "").alias("fp")
    )
    fps = {r["doc_id"]: r["fp"] for r in df.collect()}
    grouped = {}
    for d, fp in fps.items():
        grouped.setdefault(fp, []).append(d)
    big = [ds for ds in grouped.values() if len(ds) >= TEMPLATE_MIN_DOCS]
    assert big == [[1, 2, 3]] or sorted(big[0]) == [1, 2, 3]


def test_quota_fill_closed_form(spark):
    from etl_active911_spark.operators.sampling import SOURCE_QUOTA_TOKENS  # noqa: F401
    from etl_active911_spark.plans import registry

    registry.load_all()
    rows = registry.QUERIES["x8_source_quota_fill"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_docs"]
        assert r["tokens_kept"] <= r["tokens_total"]
        assert r["tokens_kept"] <= SOURCE_QUOTA_TOKENS
        assert abs(r["quota_fill"] - round(r["tokens_kept"] / SOURCE_QUOTA_TOKENS, 6)) < 1e-9


def test_markov_rows_normalize(spark):
    from etl_active911_spark.plans import registry

    registry.load_all()
    rows = registry.QUERIES["x6_event_type_markov"](spark, SF_SMOKE).collect()
    assert rows
    by_cur = {}
    for r in rows:
        by_cur.setdefault(r["cur_type"], []).append(r)
    for cur, rs in by_cur.items():
        assert abs(sum(x["p"] for x in rs) - 1.0) < 1e-4, cur
        assert all(x["n"] >= 1 for x in rs)


def test_band_occupancy_mass_conservation(spark):
    from etl_active911_spark.io import read_table
    from etl_active911_spark.operators.dedup import N_BANDS
    from etl_active911_spark.plans import registry

    registry.load_all()
    rows = registry.QUERIES["x2_minhash_band_occupancy"](spark, SF_SMOKE).collect()
    n_docs = read_table(spark, SF_SMOKE, "documents").count()
    # every doc contributes exactly N_BANDS band memberships
    assert sum(r["n_members"] for r in rows) == n_docs * N_BANDS
    assert abs(sum(r["pair_share"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        # bucket b holds sizes in [2^b, 2^(b+1)): pair mass is bounded by
        # the extremes of s*(s-1)/2 over that size range
        lo, hi = 1 << r["size_bucket"], (1 << (r["size_bucket"] + 1)) - 1
        assert r["n_buckets"] * lo * (lo - 1) // 2 <= r["n_pairs"]
        assert r["n_pairs"] <= r["n_buckets"] * hi * (hi - 1) // 2


def test_df_profile_bucket_math(spark):
    from etl_active911_spark.plans import registry

    registry.load_all()
    rows = registry.QUERIES["x2_shingle_df_profile"](spark, SF_SMOKE).collect()
    assert rows
    # bucket b holds dfs in [2^b, 2^(b+1)): check via the per-bucket
    # posting/shingle ratio bound and share normalization
    assert abs(sum(r["posting_share"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        lo, hi = 1 << r["df_bucket"], (1 << (r["df_bucket"] + 1)) - 1
        assert lo * r["n_shingles"] <= r["n_postings"] <= hi * r["n_shingles"]


def test_temporal_hotspots_consistency(spark):
    from etl_active911_spark.plans import registry

    registry.load_all()
    rows = registry.QUERIES["x7_temporal_hotspots"](spark, SF_SMOKE).collect()
    for r in rows:
        assert 0 <= r["peak_dow"] <= 6
        assert 1 <= r["peak_n"] <= r["n_incidents"]
        # the peak day carries at least 1/7 of the cell's demand
        assert r["peak_share"] >= round(1 / 7, 6) - 1e-9


def test_burstiness_closed_forms(spark, tmp_path):
    """B = (sqrt(D) - s1)/(sqrt(D) + s1): periodic -> -1 exactly;
    gaps [1, 3] -> D = 4, B = -1/3, CV = 1/2 — hand-checked."""
    import datetime

    from etl_active911_spark.plans import registry

    registry.load_all()
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    # user 1: metronome — 6 events 600 s apart
    for i in range(6):
        rows.append((1, i + 1, t0 + datetime.timedelta(seconds=600 * i), "a", 1.0, "{}"))
    # user 2: gaps [1, 3] s
    for j, off in enumerate((0, 1, 4)):
        rows.append((2, 10 + j, t0 + datetime.timedelta(seconds=off), "a", 1.0, "{}"))
    # user 3: single gap -> excluded (n_gaps < 2)
    rows += [(3, 20, t0, "a", 1.0, "{}"), (3, 21, t0 + datetime.timedelta(seconds=5), "a", 1.0, "{}")]
    # user 4: all gaps zero -> excluded (s1 = 0)
    rows += [(4, 30 + j, t0, "a", 1.0, "{}") for j in range(3)]
    ev = spark.createDataFrame(
        rows,
        "user_id long, event_id long, ts timestamp_ntz, event_type string, "
        "value double, props string",
    )
    ev.write.parquet(str(tmp_path / "events.parquet"))
    got = {
        r["user_id"]: r
        for r in registry.QUERIES["x6_burstiness"](spark, str(tmp_path)).collect()
    }
    assert set(got) == {1, 2}
    assert got[1]["n_gaps"] == 5
    assert got[1]["mean_gap_s"] == 600.0
    assert got[1]["cv"] == 0.0
    assert got[1]["burstiness"] == -1.0
    assert got[2]["n_gaps"] == 2
    assert got[2]["mean_gap_s"] == 2.0
    assert got[2]["cv"] == 0.5
    assert got[2]["burstiness"] == -0.333333


def test_doc_chunking_boundaries(spark, tmp_path):
    """Chunk grid: 32 toks -> starts [0, 24] (tail 8); 24 -> one full-
    stride chunk; 25 -> 1-token tail; 1 -> one 1-token chunk. md5s
    verified against hashlib over the exact token slices."""
    import hashlib

    from etl_active911_spark.plans import registry
    import etl_active911_spark.operators.textual as tx

    registry.load_all()
    assert tx.CHUNK_TOKENS == 32 and tx.CHUNK_STRIDE == 24
    texts = {
        1: " ".join(f"w{i}" for i in range(32)),
        2: " ".join(f"x{i}" for i in range(24)),
        3: " ".join(f"y{i}" for i in range(25)),
        4: "solo",
    }
    docs = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = registry.QUERIES["x4_doc_chunking"](spark, str(tmp_path)).collect()
    got = {(r["doc_id"], r["chunk_idx"]): r for r in out}
    assert len(out) == len(got)  # (doc, idx) unique
    assert {k for k in got} == {(1, 0), (1, 1), (2, 0), (3, 0), (3, 1), (4, 0)}
    assert got[(1, 0)]["n_tok"] == 32 and got[(1, 1)]["n_tok"] == 8
    assert got[(2, 0)]["n_tok"] == 24
    assert got[(3, 1)]["n_tok"] == 1 and got[(3, 1)]["start_tok"] == 24
    assert got[(4, 0)]["n_tok"] == 1
    for (d, idx), r in got.items():
        toks = texts[d].split(" ")
        expect = " ".join(toks[r["start_tok"] : r["start_tok"] + tx.CHUNK_TOKENS])
        assert r["chunk_md5"] == hashlib.md5(expect.encode()).hexdigest(), (d, idx)


def test_chunk_cross_dup_alignment(spark, tmp_path):
    """Shared chunks require verbatim ALIGNED 32-token windows: identical
    docs share everything; docs agreeing only on their first 24 tokens
    share nothing (the 32-token window straddles the divergence); docs
    agreeing on their first 32 share exactly the start-0 chunk."""
    from etl_active911_spark.plans import registry

    registry.load_all()
    common24 = " ".join(f"c{i}" for i in range(24))
    common32 = " ".join(f"d{i}" for i in range(32))
    docs = spark.createDataFrame(
        [
            (1, common24),
            (2, common24),
            (3, common32 + " " + " ".join(f"b{i}" for i in range(16))),
            (4, common32 + " " + " ".join(f"e{i}" for i in range(16))),
            (5, "totally unique text right here"),
            (6, common24 + " tail divergence begins immediately here now"),
        ],
        "doc_id long, text string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: r
        for r in registry.QUERIES["x2_chunk_cross_dup"](
            spark, str(tmp_path)
        ).collect()
    }
    # docs 5 and 6 filtered: no shared chunk (6's start-0 window includes
    # its divergent tail, so it does NOT match 1/2's 24-token chunk)
    assert set(got) == {1, 2, 3, 4}
    for d in (1, 2):
        assert got[d]["n_chunks"] == 1 and got[d]["n_shared_chunks"] == 1
        assert got[d]["shared_share"] == 1.0
    for d in (3, 4):
        assert got[d]["n_chunks"] == 2 and got[d]["n_shared_chunks"] == 1
        assert got[d]["shared_share"] == 0.5


def test_permutation_entropy_closed_forms(spark, tmp_path):
    """Monotone ramp and constant series -> exactly one ordinal pattern
    (entropy 0; ties rank by temporal index, the Bandt-Pompe
    convention); a perfect alternation -> patterns {7: 2/3, 11: 1/3}
    with the hand-derived entropy."""
    import datetime
    import math

    from etl_active911_spark.plans import registry

    registry.load_all()
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    for i, v in enumerate((1.0, 2.0, 3.0, 4.0, 5.0)):  # user 1: ramp
        rows.append((1, i + 1, t0 + datetime.timedelta(seconds=i), "a", v, "{}"))
    for i in range(5):  # user 2: constant (all ties)
        rows.append((2, 10 + i, t0 + datetime.timedelta(seconds=i), "a", 7.0, "{}"))
    for i, v in enumerate((1.0, 2.0, 1.0, 2.0, 1.0)):  # user 3: alternation
        rows.append((3, 20 + i, t0 + datetime.timedelta(seconds=i), "a", v, "{}"))
    ev = spark.createDataFrame(
        rows,
        "user_id long, event_id long, ts timestamp_ntz, event_type string, "
        "value double, props string",
    )
    ev.write.parquet(str(tmp_path / "events.parquet"))
    got = {
        r["user_id"]: r
        for r in registry.QUERIES["x6_permutation_entropy"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(got) == {1, 2, 3}
    for u in (1, 2):
        assert got[u]["n_triples"] == 3
        assert got[u]["n_patterns"] == 1
        assert got[u]["perm_entropy"] == 0.0
        assert got[u]["pe_normalized"] == 0.0
    r3 = got[3]
    assert r3["n_triples"] == 3 and r3["n_patterns"] == 2
    h = -(2 / 3 * round(math.log(2 / 3), 6) + 1 / 3 * round(math.log(1 / 3), 6))
    assert abs(r3["perm_entropy"] - h) < 1e-6
    assert abs(r3["pe_normalized"] - h / 1.791759469228055) < 1e-6


def test_moran_i_checkerboard_and_consistency(spark, duck):
    """The exact-integer Moran algebra gives I = -1 on a 3x3 rook
    checkerboard (hand-derived: d in {-4, +5}, every edge crosses, so
    I = (9/24)*(-480/180) = -1); the fixture output must be internally
    consistent (the emitted statistic re-derives from the emitted exact
    integers) and E[I] = -1/(N-1)."""
    # closed form through the SAME CTE algebra the oracle uses, over a
    # literal checkerboard cells table
    import duckdb

    mini = duckdb.connect()
    row = mini.execute("""
    WITH cells(cy, cx, n) AS (VALUES
        (0,0,1),(0,1,2),(0,2,1),
        (1,0,2),(1,1,1),(1,2,2),
        (2,0,1),(2,1,2),(2,2,1)),
    stats AS (SELECT CAST(COUNT(*) AS BIGINT) nc, CAST(SUM(n) AS BIGINT) s FROM cells),
    di AS (SELECT cy, cx, stats.nc * cells.n - stats.s AS d FROM cells CROSS JOIN stats),
    ssq AS (SELECT CAST(SUM(d*d) AS BIGINT) s_sq FROM di),
    sh AS (SELECT di.cy + o.dy AS jy, di.cx + o.dx AS jx, di.d
           FROM di CROSS JOIN (VALUES (1,0),(-1,0),(0,1),(0,-1)) o(dy,dx)),
    pr AS (SELECT CAST(SUM(a.d * sh.d) AS BIGINT) cross_sum,
                  CAST(COUNT(*) AS BIGINT) w
           FROM di a JOIN sh ON sh.jy = a.cy AND sh.jx = a.cx)
    SELECT stats.nc, pr.w, ssq.s_sq, pr.cross_sum,
           CAST(stats.nc AS DOUBLE) * CAST(pr.cross_sum AS DOUBLE)
             / (CAST(pr.w AS DOUBLE) * CAST(ssq.s_sq AS DOUBLE))
    FROM stats CROSS JOIN ssq CROSS JOIN pr
    """).fetchone()
    assert row == (9, 24, 180, -480, -1.0)

    from etl_active911_spark.plans import registry
    from tests.conftest import SF_ORACLE

    registry.load_all()
    r = registry.QUERIES["x7_moran_i"](spark, SF_ORACLE).collect()
    assert len(r) == 1
    r = r[0]
    assert r["w_pairs"] % 2 == 0  # directed rook pairs come in symmetric twos
    assert r["s_sq"] > 0
    expect_i = r["n_cells"] * r["cross_sum"] / (r["w_pairs"] * r["s_sq"])
    assert abs(r["moran_i"] - expect_i) < 5e-7
    assert abs(r["expected_i"] - (-1.0 / (r["n_cells"] - 1))) < 5e-7
    assert -1.05 <= r["moran_i"] <= 1.05


def test_attribution_last_touch(spark, tmp_path):
    """Strictly-prior semantics: a purchase credits the latest click/
    view BEFORE it (never itself), non-touch events are transparent,
    and untouched purchases go to 'direct'."""
    import datetime

    from etl_active911_spark.plans import registry

    registry.load_all()
    t0 = datetime.datetime(2024, 1, 1)
    rows = []

    def ev(uid, eid, sec, typ, val):
        rows.append((uid, eid, t0 + datetime.timedelta(seconds=sec), typ, val, "{}"))

    ev(1, 1, 0, "click", 0.0)
    ev(1, 2, 1, "purchase", 10.0)
    ev(1, 3, 2, "view", 0.0)
    ev(1, 4, 3, "purchase", 5.5)
    ev(1, 5, 4, "purchase", 2.25)     # still the view: purchases aren't touches
    ev(2, 6, 0, "purchase", 7.77)     # no prior touch -> direct
    ev(3, 7, 0, "click", 0.0)
    ev(3, 8, 1, "error", 0.0)         # transparent
    ev(3, 9, 2, "purchase", 3.0)
    evdf = spark.createDataFrame(
        rows,
        "user_id long, event_id long, ts timestamp_ntz, event_type string, "
        "value double, props string",
    )
    evdf.write.parquet(str(tmp_path / "events.parquet"))
    got = {
        r["channel"]: r
        for r in registry.QUERIES["n21_attribution"](spark, str(tmp_path)).collect()
    }
    assert set(got) == {"click", "view", "direct"}
    assert got["click"]["n_purchases"] == 2 and got["click"]["revenue"] == 13.0
    assert got["view"]["n_purchases"] == 2 and got["view"]["revenue"] == 7.75
    assert got["direct"]["n_purchases"] == 1 and got["direct"]["revenue"] == 7.77
    tot = 1300 + 775 + 777
    for ch, cents in (("click", 1300), ("view", 775), ("direct", 777)):
        assert abs(got[ch]["revenue_share"] - round(cents / tot, 6)) < 1e-9
