"""Streaming near-duplicate gate (X-2 at ingest): MinHash-LSH dedup as a
continuously-fed job with SIGNATURE-ONLY state.

The batch near-dup pipeline answers "what duplicates exist"; a crawl
landing zone needs "is this arriving page a near-dup of anything seen" —
without holding raw text. This job keeps exactly the state the 100 TB
design stores anyway (the materialized signature index the
``x2_incremental_neardup`` docstring names): 64 minhashes per document in
``sig_dir`` PLUS the 16 band rows per document in ``bands_dir`` — band
keys are materialized once at arrival and only READ back afterwards, so
per-batch work is |batch| signature computation + aggregates/joins
against pre-materialized index rows, never a recompute over history.
Each micro-batch:

1. drop re-delivered doc_ids (anti-join against the signature store —
   the store is first-writer-wins, which also makes a replayed batch
   emit no self-pairs; re-ingest-as-update would route through the keyed
   upsert sink instead);
2. signatures + band rows for the arriving docs (the batch operators,
   unchanged);
3. the hot-bucket guard on the TOTAL bucket size (historical + arriving
   members per band key) — the same ``LSH_MAX_BUCKET`` accounting the
   batch fold applies, so the cap cannot be defeated by feeding a flood
   one batch at a time;
4. candidates = within-batch bucket pairs (join-free bucket-and-explode,
   CLAUDE.md rule 18) ∪ arriving-band × historical-band equi-join, both
   restricted to under-cap buckets;
5. the dedup verdict from ``signature_agreement_pairs`` — the SAME
   helper the batch equivalent uses (est. Jaccard ≥ 0.5; no raw text is
   ever read back, so state never grows beyond sketches);
6. append verdict pairs, new signatures, and new band rows.

Stream ≡ batch: band membership is append-only, so each pair is
discovered exactly once — when its later member arrives — and the union
of emissions over any arrival split equals the batch fold
(``x2_stream_neardup``) whenever no bucket ever exceeds the cap. A
bucket that DOES cross the cap diverges one-sidedly: the stream already
emitted the pairs it discovered while the bucket was small and cannot
retract them, while the batch fold drops the whole bucket. Both regimes
are pinned in tests/test_streaming.py.

Exactly-once caveat: plain parquet appends; a crash between the pairs
append and the sig/band appends can replay a batch. The re-delivery
anti-join makes the STATE appends idempotent; replayed PAIR rows would
duplicate, which production routes through the keyed upsert sink
(streaming/jobs.py, keys (doc_a, doc_b)) — the append path keeps this
module readable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from etl_active911_spark.operators.dedup import (
    LSH_MAX_BUCKET,
    lsh_band_rows,
    minhash_signatures,
    signature_agreement_pairs,
)


def _read_or_none(spark, path: str) -> DataFrame | None:
    """Parquet read that treats ONLY path-not-found as "first batch".
    Any other failure (transient FS error, corrupt footer, permissions)
    must abort the batch — treating it as first-batch would silently
    lose every cross-arrival pair involving this batch forever (the
    jobs.py upsert-sink idiom, ADVICE r02)."""
    try:
        df = spark.read.parquet(path)
        df.schema  # force analysis so PATH_NOT_FOUND surfaces here
        return df
    except AnalysisException as e:
        if "PATH_NOT_FOUND" not in str(e.getErrorClass() or "") and not isinstance(
            getattr(e, "cause", None), FileNotFoundError
        ):
            raise
        return None


def run_neardup_stream(
    src: DataFrame,
    sig_dir: str,
    bands_dir: str,
    pairs_dir: str,
    ckpt: str,
    max_bucket: int = LSH_MAX_BUCKET,
):
    """Start the gate over a streaming (doc_id, text) source; returns the
    StreamingQuery (availableNow trigger — drain-what's-there semantics,
    same harness as ann_ingest/curation_ingest). ``max_bucket`` is
    parameterized so tests can pin the flood guard at toy scale."""

    def process(batch: DataFrame, _batch_id: int) -> None:
        spark = batch.sparkSession
        batch = batch.dropDuplicates(["doc_id"])
        sigs_old = _read_or_none(spark, sig_dir)
        bands_old = _read_or_none(spark, bands_dir)
        if sigs_old is not None:
            batch = batch.join(sigs_old.select("doc_id"), "doc_id", "left_anti")
        if not batch.take(1):
            return
        # shared by band rows + the agreement join: eager localCheckpoint
        # (rule 17 — inside foreachBatch each batch is its own scope)
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
                "band_key",
                "ids",
                "n_new",
                F.coalesce("n_old", F.lit(0)).alias("n_old"),
            )
        else:
            new_buckets = new_buckets.withColumn("n_old", F.lit(0))
        # TOTAL bucket size — historical + arriving — mirrors the batch
        # fold's LSH_MAX_BUCKET accounting (a flood fed one batch at a
        # time stops producing pairs the moment the bucket crosses the cap)
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
        out = signature_agreement_pairs(cands, all_sigs)
        out.write.mode("append").parquet(pairs_dir)
        sigs_new.write.mode("append").parquet(sig_dir)
        bands_new.write.mode("append").parquet(bands_dir)

    return (
        src.writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
