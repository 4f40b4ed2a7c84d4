"""Quality tests for the approximate / rows-only extension operators:
LSH recall vs exact ground truth, SimHash invariants, multimodal decode
plumbing, and fingerprint determinism (SURVEY.md §7 hard-part #6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_active911_spark.plans import registry
from tests.conftest import SF_SMOKE, SF_ORACLE

registry.load_all()


def test_minhash_lsh_recall_vs_exact(spark):
    """Every exact near-dup pair (Jaccard ≥ 0.6) must be found by the
    MinHash-LSH candidate path at threshold 0.5 (banding catches ≳0.5)."""
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in registry.QUERIES["x2_ngram_jaccard"](spark, SF_ORACLE).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in registry.QUERIES["x2_minhash_lsh"](spark, SF_ORACLE).collect()
        if r["jaccard"] >= 0.6
    }
    # x2_ngram_jaccard blocks by lang; LSH doesn't — compare on the exact set
    missed = exact - lsh
    recall = 1 - len(missed) / len(exact) if exact else 1.0
    assert recall >= 0.9, f"LSH recall {recall:.2f}; missed {list(missed)[:5]}"


def test_simhash_identical_docs_distance_zero(spark):
    from etl_active911_spark.operators.dedup import simhash_table

    df = simhash_table(
        spark.createDataFrame(
            [(1, "the quick brown fox"), (2, "the quick brown fox"), (3, "totally different words here")],
            "doc_id long, text string",
        )
    )
    rows = {r["doc_id"]: r["simhash"] for r in df.collect()}
    assert rows[1] == rows[2]
    assert rows[1] != rows[3]


def test_ann_lsh_recall_vs_bruteforce(spark):
    """LSH ANN must recover most of the exact top-5 neighbors."""
    exact = {
        (r["query_id"], r["vec_id"])
        for r in registry.QUERIES["x3_cosine_topk"](spark, SF_SMOKE).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in registry.QUERIES["x3_ann_lsh"](spark, SF_SMOKE).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"ANN recall {recall:.2f}"  # deterministic; measured 0.72 @sf0.001, 0.63 @sf0.01


def test_ann_brp_recall_and_determinism(spark):
    """The MLlib BucketedRandomProjectionLSH variant: seeded, so repeat runs
    must bit-match, and bucket-collision candidate generation with 6 hash
    tables must recover nearly all exact top-5 neighbors."""
    exact = {
        (r["query_id"], r["vec_id"])
        for r in registry.QUERIES["x3_cosine_topk"](spark, SF_SMOKE).collect()
    }
    first = registry.QUERIES["x3_ann_brp"](spark, SF_SMOKE).collect()
    approx = {(r["query_id"], r["vec_id"]) for r in first}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"BRP recall {recall:.2f}"  # deterministic; measured 0.99 @sf0.001, 0.98 @sf0.01
    again = registry.QUERIES["x3_ann_brp"](spark, SF_SMOKE).collect()
    assert sorted(map(tuple, first)) == sorted(map(tuple, again))


def test_ann_ivf_recall_vs_bruteforce(spark):
    """IVF with nprobe=4/16 cells must recover a reasonable share of the
    exact top-5 on near-random embeddings (scans ~25% of the corpus)."""
    exact = {
        (r["query_id"], r["vec_id"])
        for r in registry.QUERIES["x3_cosine_topk"](spark, SF_SMOKE).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in registry.QUERIES["x3_ann_ivf"](spark, SF_SMOKE).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall {recall:.2f}"  # deterministic; measured 0.61 @sf0.001, 0.56 @sf0.01


def test_pandas_matmul_matches_sql_topk(spark):
    """The NumPy/Arrow scoring path must agree with the JVM SQL path."""
    sql_rows = {
        (r["query_id"], r["vec_id"], r["rnk"])
        for r in registry.QUERIES["x3_cosine_topk"](spark, SF_SMOKE).collect()
    }
    np_rows = {
        (r["query_id"], r["vec_id"], r["rnk"])
        for r in registry.QUERIES["x3_pandas_matmul"](spark, SF_SMOKE).collect()
    }
    assert sql_rows == np_rows


def test_media_decode_plumbing(spark):
    df = registry.QUERIES["x5_media_decode"](spark, SF_SMOKE)
    rows = df.collect()
    assert len(rows) > 0
    r = rows[0]
    assert r["n_bytes"] > 0 and len(r["sha256"]) == 64
    assert 16 <= r["width"] <= 255 and 1 <= r["n_channels"] <= 4
    # deterministic: same input → same fake decode
    again = registry.QUERIES["x5_media_decode"](spark, SF_SMOKE).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_media_resize_geometry(spark):
    rows = registry.QUERIES["x5_media_resize"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert max(r["out_width"], r["out_height"]) == 64  # longer edge scaled to target
        assert r["n_out_bytes"] > 0


def test_frame_sample_fanout(spark):
    rows = registry.QUERIES["x5_frame_sample"](spark, SF_SMOKE).collect()
    assert rows
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc, frames in by_doc.items():
        assert sorted(f["frame_idx"] for f in frames) == [0, 1, 2, 3]
        assert len({f["frame_sha"] for f in frames}) == 4  # distinct per-frame digests
        ts = [f["frame_ts_ms"] for f in sorted(frames, key=lambda f: f["frame_idx"])]
        assert ts == sorted(ts)


def test_fingerprint_deterministic_and_shared_for_dupes(spark):
    from etl_active911_spark.operators.textual import x4_fingerprint

    a = x4_fingerprint(spark, SF_SMOKE)
    counts = a.groupBy("doc_id").count().collect()
    assert all(r["count"] > 0 for r in counts)
    b = x4_fingerprint(spark, SF_SMOKE)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_connected_components_known_graph(spark):
    """Hand-built edge list: {1-2, 2-3} ∪ {10-11} ∪ isolated-by-absence —
    components must be min-labeled and complete."""
    from etl_active911_spark.operators.clustering import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (3, 7), (20, 21), (21, 22), (22, 23)],
        "doc_a long, doc_b long",
    )
    comp = {r["doc_id"]: r["component"] for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20, 23: 20}


def test_connected_components_cap_raises_on_long_chain(spark):
    """Adversarial chain graph (VERDICT r03 item 8): min-label propagation
    needs O(diameter) passes, so a chain longer than ``max_iter`` hops
    must RAISE rather than return silently split components — and a cap
    sized to the diameter must converge on the identical input."""
    import pytest as _pytest

    from etl_active911_spark.operators.clustering import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(15)], "doc_a long, doc_b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=10).collect()
    # the cap is a knob, not a wall: the same graph converges when sized
    comp = {
        r["doc_id"]: r["component"]
        for r in connected_components(chain, max_iter=16).collect()
    }
    assert set(comp.values()) == {0} and len(comp) == 16


def test_dup_clusters_one_keeper_per_component(spark):
    out = registry.QUERIES["x2_dup_clusters"](spark, SF_ORACLE)
    rows = out.collect()
    assert rows, "LSH found no dup clusters?"
    by_comp: dict[int, list] = {}
    for r in rows:
        by_comp.setdefault(r["component"], []).append(r)
    for comp, members in by_comp.items():
        keepers = [m for m in members if m["is_keeper"]]
        assert len(keepers) == 1
        assert keepers[0]["doc_id"] == min(m["doc_id"] for m in members) == comp


def test_exact_dedup_keeps_one_per_hash(spark):
    out = registry.QUERIES["x1_exact_dedup"](spark, SF_ORACLE)
    assert out.groupBy("content_hash").count().filter(F.col("count") > 1).count() == 0


def test_ann_pq_recall_vs_bruteforce(spark):
    """PQ/ADC top-k must find a reasonable share of the exact top-k — the
    8-byte code (32× compression) trades accuracy for scan cost, but on
    the fixture corpus quantization error must not destroy the ranking."""
    exact = {
        (r["query_id"], r["vec_id"])
        for r in registry.QUERIES["x3_cosine_topk"](spark, SF_SMOKE).collect()
    }
    pq = {
        (r["query_id"], r["vec_id"])
        for r in registry.QUERIES["x3_ann_pq"](spark, SF_SMOKE).collect()
    }
    recall = len(exact & pq) / len(exact)
    assert recall >= 0.5, f"PQ recall collapsed: {recall:.2f}"  # deterministic; measured 0.58 at both sf0.001 and sf0.01


def test_pq_codes_are_compact_and_deterministic(spark):
    from etl_active911_spark.io import read_table, spread
    from etl_active911_spark.operators.similarity import (
        PQ_K,
        PQ_M,
        _fit_pq_codebooks,
        pq_encode,
    )

    emb = spread(read_table(spark, SF_SMOKE, "embeddings"))
    books = _fit_pq_codebooks(emb)
    a = {r["vec_id"]: tuple(r["code"]) for r in pq_encode(emb, books).collect()}
    b = {r["vec_id"]: tuple(r["code"]) for r in pq_encode(emb, books).collect()}
    assert a == b  # deterministic
    assert all(len(c) == PQ_M and all(0 <= x < PQ_K for x in c) for c in a.values())


# ---------------------------------------------------------------------------
# Error-bound asserts for the rows-only sketch aggregates (VERDICT r02
# next-step #7): "ran clean" becomes a falsifiable accuracy check.
# ---------------------------------------------------------------------------


def test_approx_count_distinct_within_5pct_of_exact(spark):
    """HLL++ at rsd=0.01 must land within 5% of the exact per-group
    distinct count (5x the configured rsd — a hard failure here means the
    sketch is misconfigured, not unlucky)."""
    from etl_active911_spark.io import read_table

    approx = {
        r["l_returnflag"]: r["approx_parts"]
        for r in registry.QUERIES["n5_approx_count_distinct"](spark, SF_ORACLE).collect()
    }
    exact = {
        r["l_returnflag"]: r["n"]
        for r in read_table(spark, SF_ORACLE, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= 0.05 * n, (k, approx[k], n)


def test_approx_percentile_rank_error_within_bound(spark):
    """percentile_approx(accuracy=10000) guarantees rank error <= n/accuracy.
    Check the realized rank of each group's approx p50: the fraction of
    values <= the returned element must sit within 0.5 +/- 0.001 (10x the
    1/accuracy bound, slack for duplicate values)."""
    from etl_active911_spark.io import read_table

    li = read_table(spark, SF_ORACLE, "lineitem")
    approx = {
        r["l_returnflag"]: r["p50_approx"]
        for r in registry.QUERIES["n4_approx_percentiles"](spark, SF_ORACLE).collect()
    }
    for flag, p50 in approx.items():
        grp = li.filter(F.col("l_returnflag") == flag)
        n = grp.count()
        rank = grp.filter(F.col("l_extendedprice") <= p50).count() / n
        assert abs(rank - 0.5) <= 0.001, (flag, p50, rank, n)


def test_cluster_split_has_no_cross_split_near_dups(spark):
    """The whole point of x8_cluster_split: no verified near-dup pair may
    straddle train/holdout (doc-level splits leak eval data through
    near-duplicates; cluster-level splits cannot)."""
    from etl_active911_spark.operators.dedup import x2_minhash_lsh

    split = {
        r["doc_id"]: r["split"]
        for r in registry.QUERIES["x8_cluster_split"](spark, SF_ORACLE).collect()
    }
    pairs = x2_minhash_lsh(spark, SF_ORACLE).collect()
    assert len(pairs) > 0
    straddlers = [
        (r["doc_a"], r["doc_b"])
        for r in pairs
        if split[r["doc_a"]] != split[r["doc_b"]]
    ]
    assert straddlers == []
    # and both sides are non-trivially populated
    assert {"train", "holdout"} == set(split.values())


def test_ann_ivf_seeded_recall_vs_bruteforce(spark):
    """The oracle-checked seeded-IVF variant must stay in the same recall
    band as the Lloyd-fitted one — seeds are the fit's own starting
    vectors, so cells are coarser but not degenerate."""
    exact = {
        (r["query_id"], r["vec_id"])
        for r in registry.QUERIES["x3_cosine_topk"](spark, SF_SMOKE).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in registry.QUERIES["x3_ann_ivf_seeded"](spark, SF_SMOKE).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.55, f"seeded-IVF recall {recall:.2f}"  # deterministic; measured 0.65 @sf0.001, 0.53 @sf0.01


def test_bmp_decoder_golden_and_roundtrip(spark):
    """decode_bmp must parse REAL bytes: (a) a hand-written literal 2x2
    BMP with explicit row padding decodes to its known pixels, (b) it
    round-trips encode_bmp over awkward widths (row padding 1..3 bytes),
    (c) non-BMP payloads raise."""
    import struct

    import pytest as _pytest

    from etl_active911_spark.operators.multimodal import decode_bmp, encode_bmp

    # (a) literal 2x2, 24bpp: rows padded to 8 bytes. Image pixels:
    #   (0,0)=R10,G20,B30  (1,0)=R11,G21,B31   <- top row, stored SECOND
    #   (0,1)=R40,G50,B60  (1,1)=R41,G51,B61   <- bottom row, stored FIRST
    pix = bytes(
        [60, 50, 40, 61, 51, 41, 0, 0,   # bottom storage row (y=1) + pad
         30, 20, 10, 31, 21, 11, 0, 0]   # top storage row (y=0) + pad
    )
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(pix), 2835, 2835, 0, 0
    )
    w, h, bpp, sr, sg, sb, tr, tg, tb = decode_bmp(hdr + pix)
    assert (w, h, bpp) == (2, 2, 24)
    assert (sr, sg, sb) == (10 + 11 + 40 + 41, 20 + 21 + 50 + 51, 30 + 31 + 60 + 61)
    assert (tr, tg, tb) == (10, 20, 30)  # top-left image pixel

    # (b) encoder/decoder round-trip across every padding remainder
    for width in (4, 5, 6, 7):
        got = decode_bmp(encode_bmp(width, 3, (9, 8, 7)))
        assert got[0] == width and got[1] == 3
        exp_sr = sum((7 * x + 13 * y + 9) % 256 for x in range(width) for y in range(3))
        assert got[3] == exp_sr
        assert got[6] == 9 % 256  # top-left R = s0

    # (c) garbage refuses loudly
    with _pytest.raises(ValueError):
        decode_bmp(b"PNG not a bmp")


def test_star_components_match_label_propagation(spark):
    """connected_components_star (O(log n) alternating star contraction)
    must produce the identical (doc_id, component) mapping as min-label
    propagation on assorted graphs — including a 30-hop chain that label
    propagation's default diameter cap cannot handle at all."""
    import random

    from etl_active911_spark.operators.clustering import (
        connected_components,
        connected_components_star,
    )

    def comp_map(df):
        return {r["doc_id"]: r["component"] for r in df.collect()}

    known = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (3, 7), (20, 21), (21, 22), (22, 23)],
        "doc_a long, doc_b long",
    )
    assert comp_map(connected_components_star(known)) == comp_map(
        connected_components(known)
    )

    rng = random.Random(41)
    rand_edges = [
        (rng.randrange(40), rng.randrange(40)) for _ in range(60)
    ]
    rand_edges = [(a, b) for a, b in rand_edges if a != b]
    rand = spark.createDataFrame(rand_edges, "doc_a long, doc_b long")
    assert comp_map(connected_components_star(rand)) == comp_map(
        connected_components(rand, max_iter=40)
    )

    # 30-hop chain: diameter 30 ≫ label-prop's default cap of 10, but
    # star contraction needs only O(log 31) rounds
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "doc_a long, doc_b long"
    )
    comp = comp_map(connected_components_star(chain, max_iter=10))
    assert set(comp.values()) == {0} and len(comp) == 31


def test_star_components_path_counterexample(spark):
    """ADVICE r05 (high): on the path graph {(3,6),(5,6),(5,7),(4,7)} —
    ONE connected component, min 3 — a star round can emit the FLAT but
    NON-FUNCTIONAL forest {5→3, 5→4, 6→3, 7→4}: no parent is a child, yet
    doc 5 holds two parents, so the r5 flatness-only convergence check
    returned early with the component split in two (docs {4,7} under 4)
    and doc 5 emitted twice. Convergence must also require the child →
    parent edge set to be a FUNCTION."""
    from etl_active911_spark.operators.clustering import connected_components_star

    pairs = spark.createDataFrame(
        [(3, 6), (5, 6), (5, 7), (4, 7)], "doc_a long, doc_b long"
    )
    rows = connected_components_star(pairs).collect()
    # every vertex exactly once (functional output — no duplicate doc_id)
    assert sorted(r["doc_id"] for r in rows) == [3, 4, 5, 6, 7]
    assert {(r["doc_id"], r["component"]) for r in rows} == {
        (3, 3), (4, 3), (5, 3), (6, 3), (7, 3)
    }


def test_compression_ratio_properties(spark):
    """x4_compression_ratio (rows-only, zlib not SQL-expressible):
    EXACT single-process replica (r7, VERDICT r06 item 6 — same zlib,
    same level, Spark ROUND emulated by decimal HALF_UP quantize), plus
    determinism, bound sanity, and repetitive ≪ varied ordering."""
    rows = registry.QUERIES["x4_compression_ratio"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0.0 < r["compression_ratio"] <= 1.2
    again = registry.QUERIES["x4_compression_ratio"](spark, SF_SMOKE).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))

    # exact replica: every cell, no tolerance
    import zlib
    from decimal import ROUND_HALF_UP, Decimal

    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_SMOKE}/documents.parquet", columns=["doc_id", "text"])
    want = {}
    for i, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        raw = txt.encode("utf-8")
        if not raw:
            continue
        zl = len(zlib.compress(raw, 6))
        ratio = float(
            Decimal(repr(zl / len(raw))).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        )
        want[int(i)] = (len(raw), zl, ratio)
    got = {
        r["doc_id"]: (r["n_bytes"], r["zl_bytes"], r["compression_ratio"]) for r in rows
    }
    assert got == want

    probe = spark.createDataFrame(
        [(1, "spam " * 200), (2, " ".join(f"w{i}x{i * 7 % 13}" for i in range(200)))],
        "doc_id long, text string",
    )
    from etl_active911_spark.operators.textual import x4_compression_ratio  # noqa: F401
    import zlib

    rep = len(zlib.compress(("spam " * 200).encode(), 6)) / len("spam " * 200)
    var = len(zlib.compress(" ".join(f"w{i}x{i * 7 % 13}" for i in range(200)).encode(), 6)) / len(
        " ".join(f"w{i}x{i * 7 % 13}" for i in range(200))
    )
    assert rep < var / 2  # repetition detector actually separates


def test_substr_scrub_kept_tokens_are_a_subsequence(spark):
    """x2_substr_scrub reconstruction invariants at sf0.001: token
    accounting adds up, and every cleaned text is a subsequence of the
    original token stream (scrubbing deletes, never reorders)."""
    from etl_active911_spark.io import read_table
    from etl_active911_spark.operators.dedup import normalized_text, x2_substr_scrub

    rows = x2_substr_scrub(spark, SF_SMOKE).collect()
    originals = {
        r["doc_id"]: r["norm"].split(" ")
        for r in read_table(spark, SF_SMOKE, "documents")
        .select("doc_id", normalized_text(F.col("text")).alias("norm"))
        .collect()
    }
    assert len(rows) == len(originals)
    for r in rows:
        orig = originals[r["doc_id"]]
        clean = r["clean_text"].split(" ") if r["clean_text"] else []
        assert r["n_tokens"] == len(orig)
        assert r["n_removed"] == len(orig) - len(clean)
        it = iter(orig)
        assert all(tok in it for tok in clean), f"doc {r['doc_id']}: not a subsequence"


def test_mmr_rerank_trades_relevance_for_diversity(spark):
    """x3_mmr_rerank sanity at sf0.01: rank 1 equals the pure-relevance
    winner, each query yields TOP_K distinct picks, and every pick is
    drawn from the relevance shortlist."""
    from etl_active911_spark.operators.similarity import (
        MMR_SHORTLIST,
        TOP_K,
        x3_cosine_topk,
        x3_mmr_rerank,
    )

    mmr = x3_mmr_rerank(spark, SF_ORACLE).collect()
    by_q = {}
    for r in mmr:
        by_q.setdefault(r["query_id"], {})[r["mmr_rank"]] = r["vec_id"]
    rel = {}
    for r in x3_cosine_topk(spark, SF_ORACLE).collect():
        rel.setdefault(r["query_id"], {})[r["rnk"]] = r["vec_id"]
    assert set(by_q) == set(rel) and len(by_q) > 0
    for q, picks in by_q.items():
        assert sorted(picks) == list(range(1, TOP_K + 1))
        assert len(set(picks.values())) == TOP_K
        # rank 1 = argmax relevance (λ-weighting can't change the first pick)
        assert picks[1] == rel[q][1]


def test_epoch_shuffle_is_per_epoch_permutation(spark):
    """x8_epoch_shuffle (r6): each epoch's pos must be a permutation of
    0..n-1, the two epochs must order the corpus DIFFERENTLY, and the
    whole thing must be deterministic across invocations (content-
    addressed, no RNG state)."""
    from etl_active911_spark.plans import registry

    registry.load_all()
    q = registry.QUERIES["x8_epoch_shuffle"]
    rows = q(spark, SF_SMOKE).collect()
    by_epoch = {}
    for r in rows:
        by_epoch.setdefault(r["epoch"], {})[r["doc_id"]] = r["pos"]
    assert set(by_epoch) == {0, 1}
    n = len(by_epoch[0])
    for e, m in by_epoch.items():
        assert sorted(m.values()) == list(range(n)), f"epoch {e} not a permutation"
    assert by_epoch[0] != by_epoch[1], "epochs must shuffle differently"
    again = {(r["epoch"], r["doc_id"]): r["pos"] for r in q(spark, SF_SMOKE).collect()}
    assert again == {(e, d): p for e, m in by_epoch.items() for d, p in m.items()}


def test_aspect_bucket_pack_budget_and_bands(spark):
    """x5_aspect_bucket_pack (r6): every pack except a band's last is
    full enough that adding its successor's first image would overflow
    (streaming-packing invariant: overflow by at most one image —
    equivalently every pack STARTS below the budget boundary), pack ids
    are dense per bucket, and pixel totals are conserved."""
    from etl_active911_spark.operators.multimodal import PACK_PIXEL_BUDGET
    from etl_active911_spark.plans import registry

    registry.load_all()
    rows = registry.QUERIES["x5_aspect_bucket_pack"](spark, SF_ORACLE).collect()
    assert rows
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r)
    assert set(by_bucket) <= {"tall", "3:4", "1:1", "4:3", "wide"}
    for bucket, packs in by_bucket.items():
        packs.sort(key=lambda r: r["pack_id"])
        assert [p["pack_id"] for p in packs] == list(range(len(packs))), bucket
        # cumulative starts: pack p starts at sum of previous pack_pixels,
        # which must be < (pack_id + 1) * budget (the docs that START in
        # pack p begin before its boundary)
        cum = 0
        for p in packs:
            assert cum < (p["pack_id"] + 1) * PACK_PIXEL_BUDGET, (bucket, p)
            cum += p["pack_pixels"]
        # doc spans are non-overlapping and ordered
        for a, b in zip(packs, packs[1:]):
            assert a["last_doc"] < b["first_doc"], (bucket, a, b)


def test_bmp_two_stage_matches_fused(spark):
    """The blob-persisting two-stage path (bmp_media_table →
    decode_bmp_features, for pipelines that store the encoded payloads)
    must produce exactly the fused x5_media_decode_real features."""
    from etl_active911_spark.operators.multimodal import (
        bmp_media_table,
        decode_bmp_features,
        media_table,
    )

    staged = decode_bmp_features(bmp_media_table(media_table(spark, SF_SMOKE)))
    fused = registry.QUERIES["x5_media_decode_real"](spark, SF_SMOKE)
    assert sorted(map(tuple, staged.collect())) == sorted(map(tuple, fused.collect()))


def test_cdc_chunks_insertion_stability(spark):
    """The defining CDC property (rsync/LBFS/FastCDC): inserting one
    token near the START of a document perturbs only the chunk the
    insertion lands in — every later chunk hash survives, because
    boundaries are anchored to CONTENT, not offsets. A fixed-size
    chunker would re-chunk everything after the edit."""
    from etl_active911_spark.operators.dedup import cdc_chunk_table

    words = [f"w{i * 31 % 97}tok{i}" for i in range(400)]
    base = " ".join(words)
    edited = " ".join(words[:5] + ["INSERTED"] + words[5:])
    docs = spark.createDataFrame(
        [(1, base, "s"), (2, edited, "s")], "doc_id long, text string, source string"
    )
    rows = cdc_chunk_table(docs).collect()
    a = [r["chunk_hash"] for r in rows if r["doc_id"] == 1]
    b = [r["chunk_hash"] for r in rows if r["doc_id"] == 2]
    assert len(a) > 5, "expected multiple chunks at this length"
    from collections import Counter

    shared = sum((Counter(a) & Counter(b)).values())
    # only the chunk containing the insertion may change; with ~25 chunks
    # that's >= len-1 shared (the edited chunk differs, all others match)
    assert shared >= len(a) - 1, (shared, len(a), len(b))
    assert a != b  # the edit IS visible — exactly one chunk changed
