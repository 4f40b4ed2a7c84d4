"""Composed five-gate ingest stream (r13, VERDICT r12 item 6): the ONE
foreachBatch pipeline a landing zone actually deploys — near-dup gate →
boilerplate scrub (on arriving text) → PII gate (on post-scrub text) →
quality gate (raw text) → contamination gate (embeddings), in the
``operators/ingest_funnel.py`` order, emitting one per-doc funnel verdict
row per arrival.

Composition reuses each gate's shared helper VERBATIM (signature/band
machinery from the near-dup gate, ``scrub_segment_rows`` +
``scrub_pii_rollup``, ``gopher_stats``, ``train_contamination_rows``)
and the shared flag construction ``funnel_flag_rows`` — so no verdict
can drift from the batch fold.

State = exactly the union of the member gates' state: the signature +
band index (near-dup), the segment ledger (scrub), and the emitted
verdict rows (re-delivery guard). The PII / quality / contamination
stages are stateless per batch.

Stream ≡ batch: the member caveats COMPOSE — equality of the union of
per-doc rows with the batch fold (``ingest_funnel_rows``) holds for any
doc_id-ORDERED arrival split with no flooded band bucket (near-dup
later-member drop == larger-id drop; scrub first-writer == min-doc_id
canonical; the other three gates are stateless and split-invariant).
Out-of-order arrivals diverge one-sidedly at the near-dup and scrub
stages exactly as documented in their standalone modules. Pinned in
tests/test_full_ingest.py (one-batch and 3-way ordered splits).

Exactly-once caveat: plain parquet appends with the anti-join
re-delivery guard, same note as every sibling gate — production routes
the verdict rows through the keyed upsert sink (streaming/jobs.py,
key doc_id). Crash-window ordering (ADVICE r13 item 1): state dirs
(signatures, bands, segment claims) are written BEFORE the verdict
rows, and every state append anti-joins what is already on disk — so a
crash anywhere between the four writes replays to the same verdicts
with no duplicate state (pinned in tests/test_full_ingest.py).
Replayed SELF-state is additionally made invisible to the compute
(ADVICE r14 item 1): sigs_old/bands_old anti-join the batch's doc_ids,
so a replayed batch cannot inflate the bucket-cap n_old with its own
pre-crash bands (which would exclude buckets that were under the cap
originally and change the survivor set); the cap boundary is pinned in
tests/test_full_ingest.py (bucket at exactly max_bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_active911_spark.operators.dedup import (
    LSH_MAX_BUCKET,
    lsh_band_rows,
    minhash_signatures,
    scrub_segment_rows,
    signature_agreement_pairs,
)
from etl_active911_spark.operators.ingest_funnel import (
    funnel_flag_rows,
    ingest_arrival_text,
    scrub_pii_rollup,
)
from etl_active911_spark.operators.similarity import (
    SEMCONTAM_EVAL_MOD,
    SEMCONTAM_EVAL_REM,
    semcontam_eval_block,
    train_contamination_rows,
)
from etl_active911_spark.operators.textual import gopher_stats
from etl_active911_spark.streaming.neardup_ingest import _read_or_none


def _stages_2_to_5(
    spark,
    batch: DataFrame,
    surv: DataFrame,
    tr_all: DataFrame,
    ev: DataFrame,
    ledger_dir: str,
) -> tuple[DataFrame, DataFrame]:
    """Stages 2-5 of the composed funnel over ONE micro-batch — scrub
    (first-writer segment ledger) → PII on kept segments → quality →
    contamination — shared VERBATIM by the dir-state fold below and the
    state-store twin (streaming/state_ingest.py), so the two paths
    cannot drift anywhere downstream of the near-dup verdict. ``batch``
    = every arrival (doc_id, source, text); ``surv`` = stage-1
    survivors (doc_id, text). Returns (verdict rows, this batch's new
    ledger claims — already localCheckpoint'd and anti-joined against
    the on-disk ledger, ready for the idempotent append)."""
    arrv = surv.select("doc_id", ingest_arrival_text().alias("text"))
    c = scrub_segment_rows(arrv, with_text=True).localCheckpoint(eager=True)
    led_old = _read_or_none(spark, ledger_dir)
    claims = c.groupBy("seg_md5").agg(F.min("doc_id").alias("batch_owner"))
    if led_old is not None:
        claims = claims.join(led_old.select("seg_md5"), "seg_md5", "left_anti")
        owned = led_old.select("seg_md5", F.col("owner_doc").alias("owner"))
    else:
        owned = None
    claims = claims.localCheckpoint(eager=True)  # verdict + append
    ownership = claims.select("seg_md5", F.col("batch_owner").alias("owner"))
    if owned is not None:
        ownership = ownership.unionByName(owned)
    flagged = c.join(ownership, "seg_md5").select(
        "doc_id", "n", "n_tok", "seg_txt",
        (F.col("owner") != F.col("doc_id")).alias("removed"),
    )
    ledger = scrub_pii_rollup(flagged)

    # --- stage 4: quality (stateless per batch) ---
    quality = gopher_stats(batch.select("doc_id", "text")).select(
        "doc_id", F.col("keep").cast("int").alias("fq")
    )

    # --- stage 5: contamination (stateless; broadcast eval block) ---
    tr_batch = tr_all.join(
        batch.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    )
    contam = train_contamination_rows(tr_batch, ev).select(
        F.col("vec_id").alias("doc_id"),
        F.col("quarantined").alias("ct_q"),
    )

    rows = funnel_flag_rows(
        batch.select("doc_id", "source"), ledger, quality, contam
    )
    return rows, claims


def run_full_ingest_stream(
    src: DataFrame,
    emb: DataFrame,
    sig_dir: str,
    bands_dir: str,
    ledger_dir: str,
    out_dir: str,
    ckpt: str,
    max_bucket: int = LSH_MAX_BUCKET,
    processing_time: str | None = None,
):
    """Start the composed gate over a streaming (doc_id, source, text)
    source; ``emb`` is the static (vec_id, embedding) table the
    contamination stage reads. Returns the StreamingQuery — availableNow
    trigger by default (the house ingest harness); pass
    ``processing_time`` (e.g. "500 milliseconds") for a LONG-LIVED
    deployment trigger, the mode the marginal-throughput benchmark
    measures (BASELINE.md r14: per-drain fixed cost dominates cold
    availableNow drains; a long-lived query amortizes it)."""
    is_eval = F.col("vec_id") % SEMCONTAM_EVAL_MOD == SEMCONTAM_EVAL_REM
    ev = semcontam_eval_block(emb.filter(is_eval))
    tr_all = emb.filter(~is_eval).select("vec_id", "embedding")

    def process(batch: DataFrame, _batch_id: int) -> None:
        spark = batch.sparkSession
        batch = batch.dropDuplicates(["doc_id"])
        out_old = _read_or_none(spark, out_dir)
        if out_old is not None:
            batch = batch.join(out_old.select("doc_id"), "doc_id", "left_anti")
        if not batch.take(1):
            return
        batch = batch.localCheckpoint(eager=True)  # feeds all five stages

        # --- stage 1: near-dup (the neardup_ingest machinery verbatim) ---
        # ADVICE r14 item 1: a crash between the state writes and the
        # verdict write leaves THIS batch's signatures/bands on disk; the
        # replay must not see its own pre-crash state (it would inflate
        # n_old in the bucket-cap filter — excluding buckets that were
        # under the cap originally and changing the survivor set — and
        # duplicate batch rows into cross/all_sigs). Keep the raw disk
        # reads for the append-dedup guards below; anti-join the batch's
        # doc_ids out of the COMPUTE views.
        sigs_disk = _read_or_none(spark, sig_dir)
        bands_disk = _read_or_none(spark, bands_dir)
        batch_ids = batch.select("doc_id")
        sigs_old = (
            None if sigs_disk is None
            else sigs_disk.join(batch_ids, "doc_id", "left_anti")
        )
        bands_old = (
            None if bands_disk is None
            else bands_disk.join(batch_ids, "doc_id", "left_anti")
        )
        sigs_new = minhash_signatures(batch).localCheckpoint(eager=True)
        bands_new = lsh_band_rows(sigs_new).localCheckpoint(eager=True)
        new_buckets = bands_new.groupBy("band_key").agg(
            F.collect_list("doc_id").alias("ids"),
            F.count(F.lit(1)).alias("n_new"),
        )
        if bands_old is not None:
            old_sizes = bands_old.groupBy("band_key").agg(
                F.count(F.lit(1)).alias("n_old")
            )
            new_buckets = new_buckets.join(old_sizes, "band_key", "left").select(
                "band_key", "ids", "n_new",
                F.coalesce("n_old", F.lit(0)).alias("n_old"),
            )
        else:
            new_buckets = new_buckets.withColumn("n_old", F.lit(0))
        ok = new_buckets.filter(F.col("n_new") + F.col("n_old") <= max_bucket)
        within = (
            ok.filter(F.size("ids") >= 2)
            .select(F.explode("ids").alias("doc_a"), "ids")
            .select("doc_a", F.explode("ids").alias("doc_b"))
            .filter(F.col("doc_a") < F.col("doc_b"))
        )
        if bands_old is None:
            cands = within.distinct()
            all_sigs = sigs_new
        else:
            cross = (
                bands_new.withColumnRenamed("doc_id", "doc_n")
                .join(ok.select("band_key"), "band_key")
                .join(bands_old.withColumnRenamed("doc_id", "doc_o"), "band_key")
                .filter(F.col("doc_o") != F.col("doc_n"))
                .select(
                    F.least("doc_o", "doc_n").alias("doc_a"),
                    F.greatest("doc_o", "doc_n").alias("doc_b"),
                )
            )
            cands = within.unionByName(cross).distinct()
            all_sigs = sigs_old.unionByName(sigs_new)
        pairs = signature_agreement_pairs(cands, all_sigs)
        # the LATER member (larger id ⇒ later arrival under ordered
        # splits) is dropped; historical docs are never retro-dropped
        dropped = (
            pairs.select(F.col("doc_b").alias("doc_id"))
            .distinct()
            .join(batch.select("doc_id"), "doc_id", "left_semi")
        )
        surv = batch.join(dropped, "doc_id", "left_anti")

        # --- stages 2-5: shared with the state-store twin ---
        rows, claims = _stages_2_to_5(
            spark, batch, surv.select("doc_id", "text"), tr_all, ev, ledger_dir
        )
        # State BEFORE verdict rows, each append idempotent (ADVICE r13
        # item 1): the out_dir re-delivery guard suppresses replay once
        # verdict rows exist, so a crash after writing rows but before
        # state would lose the batch's signatures/bands/claims FOREVER.
        # Writing state first makes the crash window replayable — the
        # re-run recomputes the batch (rows still absent), and the
        # anti-joins below discard the state it already wrote, so the
        # near-dup/scrub folds converge to the same verdicts. claims is
        # already anti-joined on led_old above.
        # append guards use the RAW disk state (not the batch-filtered
        # compute views): replayed self-state must still suppress its own
        # re-append or the replay would duplicate signature/band rows.
        sigs_out = sigs_new
        if sigs_disk is not None:
            sigs_out = sigs_new.join(sigs_disk.select("doc_id"), "doc_id", "left_anti")
        sigs_out.write.mode("append").parquet(sig_dir)
        bands_out = bands_new
        if bands_disk is not None:
            bands_out = bands_new.join(
                bands_disk.select("doc_id").distinct(), "doc_id", "left_anti"
            )
        bands_out.write.mode("append").parquet(bands_dir)
        claims.select(
            "seg_md5", F.col("batch_owner").alias("owner_doc")
        ).write.mode("append").parquet(ledger_dir)
        rows.write.mode("append").parquet(out_dir)

    writer = src.writeStream.foreachBatch(process).option(
        "checkpointLocation", ckpt
    )
    if processing_time is None:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
