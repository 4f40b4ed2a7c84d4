"""State-store-backed composed ingest (r15, VERDICT r14 item 4): the
Python signature replica, stream ≡ batch-fold equality, cross-path
equivalence at the bucket-cap boundary, and the transactional
crash-replay the state store buys over the dir fold."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE

ROW_COLS = (
    "doc_id", "source", "f_nd", "n_tokens", "tokens_after",
    "pii_post", "f_pii", "f_q", "f_ct",
)


def _rows(spark, out_dir):
    return {
        tuple(r[c] for c in ROW_COLS)
        for r in spark.read.parquet(out_dir).collect()
    }


def test_py_minhash_bit_matches_spark(spark):
    """`py_minhash` must replicate `minhash_signatures` BIT-FOR-BIT over
    every fixture document (incl. the zh/macaronic injection slices) —
    the stream's stateful gate verifies pairs against signatures the
    batch fold computed JVM-side, so one differing minhash anywhere
    breaks stream ≡ batch silently."""
    from etl_active911_spark.io import read_table
    from etl_active911_spark.operators.dedup import (
        N_HASHES,
        minhash_signatures,
        py_minhash,
    )

    docs = read_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    want = {
        r.doc_id: tuple(r[f"h{i}"] for i in range(N_HASHES))
        for r in minhash_signatures(docs).collect()
    }
    texts = {r.doc_id: r.text for r in docs.collect()}
    assert len(texts) == len(want)
    for did, text in texts.items():
        assert tuple(py_minhash(text)) == want[did], did


def _drain_state(spark, src_dir, emb, dirs, max_bucket=None):
    from etl_active911_spark.operators.dedup import LSH_MAX_BUCKET
    from etl_active911_spark.streaming import state_ingest

    src = spark.readStream.schema("doc_id long, source string, text string").parquet(
        src_dir
    )
    q = state_ingest.run_full_ingest_state_stream(
        src, emb, *dirs, max_bucket=max_bucket or LSH_MAX_BUCKET
    )
    assert q.awaitTermination(300)


def test_state_ingest_stream_matches_batch(spark, tmp_path):
    """END-TO-END: the state-store path over a 3-way doc_id-ordered
    split of the fixture corpus emits exactly the batch fold's per-doc
    funnel rows; a full re-delivery of batch 1 afterwards adds nothing
    (member-skip inside the buckets + the out_dir guard)."""
    from etl_active911_spark.io import read_table
    from etl_active911_spark.operators.ingest_funnel import ingest_funnel_rows

    docs = (
        read_table(spark, SF_ORACLE, "documents")
        .select("doc_id", "source", "text")
        .orderBy("doc_id")
    )
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    cut1, cut2 = ids[len(ids) // 3], ids[2 * len(ids) // 3]
    emb = read_table(spark, SF_ORACLE, "embeddings")
    src_dir = str(tmp_path / "src")
    dirs = (str(tmp_path / "ledger"), str(tmp_path / "out"), str(tmp_path / "ckpt"))
    batches = [
        docs.filter(F.col("doc_id") <= cut1),
        docs.filter((F.col("doc_id") > cut1) & (F.col("doc_id") <= cut2)),
        docs.filter(F.col("doc_id") > cut2),
    ]
    for b in batches:
        b.coalesce(1).write.mode("append").parquet(src_dir)
        _drain_state(spark, src_dir, emb, dirs)

    want = {
        tuple(r[c] for c in ROW_COLS)
        for r in ingest_funnel_rows(spark, SF_ORACLE).collect()
    }
    assert _rows(spark, dirs[1]) == want

    # replay batch 1: re-delivered members are skipped in-bucket
    batches[0].coalesce(1).write.mode("append").parquet(src_dir)
    _drain_state(spark, src_dir, emb, dirs)
    assert _rows(spark, dirs[1]) == want
    ledger = spark.read.parquet(dirs[0])
    assert ledger.count() == ledger.select("seg_md5").distinct().count()


def test_state_ingest_matches_dir_fold_at_cap_boundary(spark, tmp_path):
    """Cross-path equivalence where the accounting is sharpest: at
    max_bucket=2 every dup-pair bucket sits exactly at the cap, so any
    divergence in how the state gate counts old vs new members against
    the cap (the ADVICE r14 hazard class) flips the survivor set. Both
    paths over the same single batch must emit identical rows."""
    from etl_active911_spark.io import read_table
    from etl_active911_spark.streaming import full_ingest

    docs = (
        read_table(spark, SF_ORACLE, "documents")
        .select("doc_id", "source", "text")
        .filter(F.col("doc_id") < 200)
    )
    emb = read_table(spark, SF_ORACLE, "embeddings")
    src_dir = str(tmp_path / "src")
    docs.coalesce(1).write.mode("append").parquet(src_dir)

    ddirs = tuple(
        str(tmp_path / d) for d in ("dsigs", "dbands", "dledger", "dout", "dckpt")
    )
    src = spark.readStream.schema("doc_id long, source string, text string").parquet(
        src_dir
    )
    q = full_ingest.run_full_ingest_stream(src, emb, *ddirs, max_bucket=2)
    assert q.awaitTermination(300)
    want = _rows(spark, ddirs[3])
    assert any(r[2] == 0 for r in want), "no near-dup drop at cap 2"

    sdirs = (str(tmp_path / "ledger"), str(tmp_path / "out"), str(tmp_path / "ckpt"))
    _drain_state(spark, src_dir, emb, sdirs, max_bucket=2)
    assert _rows(spark, sdirs[1]) == want


def test_state_ingest_crash_replay_is_transactional(spark, tmp_path):
    """The claim that justifies the path: sig/band state commits WITH
    the micro-batch, so a crash inside foreachBatch (injected after the
    ledger write, before the rows write) replays the epoch from the
    pre-batch state — no self-state anti-joins needed — and converges
    to the same verdicts with zero duplicate ledger rows."""
    from etl_active911_spark.io import read_table
    from etl_active911_spark.operators.ingest_funnel import ingest_funnel_rows
    from etl_active911_spark.streaming import state_ingest

    docs = (
        read_table(spark, SF_ORACLE, "documents")
        .select("doc_id", "source", "text")
        .filter(F.col("doc_id") < 200)
    )
    emb = read_table(spark, SF_ORACLE, "embeddings")
    src_dir = str(tmp_path / "src")
    dirs = (str(tmp_path / "ledger"), str(tmp_path / "out"), str(tmp_path / "ckpt"))
    docs.coalesce(1).write.mode("append").parquet(src_dir)

    src = spark.readStream.schema("doc_id long, source string, text string").parquet(
        src_dir
    )
    state_ingest._CRASH_AFTER_LEDGER = True
    try:
        q = state_ingest.run_full_ingest_state_stream(src, emb, *dirs)
        t0 = time.time()
        while q.isActive and time.time() - t0 < 300:
            time.sleep(0.2)
        assert q.exception() is not None  # the injected crash fired
    finally:
        state_ingest._CRASH_AFTER_LEDGER = False

    # restart over the SAME checkpoint: the epoch replays
    _drain_state(spark, src_dir, emb, dirs)
    want = {
        tuple(r[c] for c in ROW_COLS)
        for r in ingest_funnel_rows(spark, SF_ORACLE).collect()
        if r.doc_id < 200
    }
    assert _rows(spark, dirs[1]) == want
    ledger = spark.read.parquet(dirs[0])
    assert ledger.count() == ledger.select("seg_md5").distinct().count()


def test_state_path_marginal_vs_dir_fold(spark, tmp_path):
    """VERDICT r14 item 4 regression bound: under one long-lived
    trigger the state-store path's marginal micro-batch must stay under
    1.5x its cold batch (the same structural bound the dir fold
    carries) — the canary for the BASELINE.md r15 marginal-docs/s
    record. Loose on purpose: only a new per-batch fixed cost class
    (e.g. a state re-read growing with history) should trip it."""
    import os

    from etl_active911_spark.io import read_table
    from etl_active911_spark.streaming import state_ingest

    docs = read_table(spark, SF_ORACLE, "documents").select(
        "doc_id", "source", "text"
    )
    mid = docs.approxQuantile("doc_id", [0.5], 0)[0]
    b1, b2 = docs.filter(F.col("doc_id") <= mid), docs.filter(F.col("doc_id") > mid)
    n1, n2 = b1.count(), b2.count()
    emb = read_table(spark, SF_ORACLE, "embeddings")
    src_dir = str(tmp_path / "src")
    dirs = (str(tmp_path / "ledger"), str(tmp_path / "out"), str(tmp_path / "ckpt"))

    os.makedirs(src_dir, exist_ok=True)
    b1.coalesce(1).write.mode("append").parquet(src_dir)
    src = spark.readStream.schema("doc_id long, source string, text string").parquet(
        src_dir
    )

    def out_rows() -> int:
        try:
            return spark.read.parquet(dirs[1]).count()
        except Exception:
            return 0

    t0 = time.perf_counter()
    q = state_ingest.run_full_ingest_state_stream(
        src, emb, *dirs, processing_time="200 milliseconds"
    )
    try:
        while out_rows() < n1:
            assert time.perf_counter() - t0 < 300
            time.sleep(0.2)
        cold_wall = time.perf_counter() - t0

        t1 = time.perf_counter()
        b2.coalesce(1).write.mode("append").parquet(src_dir)
        while out_rows() < n1 + n2:
            assert time.perf_counter() - t1 < 300
            time.sleep(0.2)
        marginal_wall = time.perf_counter() - t1
    finally:
        q.stop()
    assert marginal_wall < 1.5 * cold_wall, (cold_wall, marginal_wall)
