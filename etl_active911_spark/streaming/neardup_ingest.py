"""Streaming near-duplicate gate (X-2 at ingest): MinHash-LSH dedup as a
continuously-fed job with SIGNATURE-ONLY state.

The batch near-dup pipeline answers "what duplicates exist"; a crawl
landing zone needs "is this arriving page a near-dup of anything seen" —
without holding raw text. This job keeps exactly the state the 100 TB
design stores anyway (the materialized signature index the
``x2_incremental_neardup`` docstring names): 64 minhashes + N_BANDS band
keys per document, constant per doc. Each micro-batch:

1. signatures + band rows for the arriving docs (the batch operators,
   unchanged — ``minhash_signatures`` / ``lsh_band_rows``);
2. candidates = within-batch bucket pairs (join-free bucket-and-explode,
   CLAUDE.md rule 18) ∪ arriving-band × historical-band equi-join, with
   the ``LSH_MAX_BUCKET`` hot-bucket guard on both legs;
3. the dedup verdict from signature agreement alone (n_eq ≥
   ``NEARDUP_TAU_EQ`` of 64 — est. Jaccard ≥ 0.5): no raw text is ever
   read back, so state never grows beyond sketches;
4. append verdict pairs and the new signatures to the store.

Every pair is discovered exactly once — when its LATER member arrives
(band membership is append-only), so the union of emitted pairs over any
arrival split equals the batch fold: ``x2_stream_neardup``
(operators/dedup.py) is that batch equivalent with the full DuckDB
oracle, and tests/test_streaming.py pins stream ≡ batch end-to-end.

Exactly-once caveat: plain parquet appends here; a crash mid-batch can
replay appends. Production routes both appends through the keyed upsert
sink (streaming/jobs.py — keys (doc_a, doc_b) / doc_id), which makes
replay idempotent; the append path keeps this module readable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_active911_spark.operators.dedup import (
    LSH_MAX_BUCKET,
    N_HASHES,
    NEARDUP_TAU_EQ,
    lsh_band_rows,
    minhash_signatures,
)


def _sig_side(sigs: DataFrame, side: str, prefix: str) -> DataFrame:
    return sigs.select(
        F.col("doc_id").alias(side),
        *[F.col(f"h{i}").alias(f"{prefix}{i}") for i in range(N_HASHES)],
    )


def run_neardup_stream(src: DataFrame, sig_dir: str, pairs_dir: str, ckpt: str):
    """Start the gate over a streaming (doc_id, text) source; returns the
    StreamingQuery (availableNow trigger — drain-what's-there semantics,
    same harness as ann_ingest/curation_ingest)."""

    def process(batch: DataFrame, _batch_id: int) -> None:
        spark = batch.sparkSession
        batch = batch.dropDuplicates(["doc_id"])
        if not batch.take(1):
            return
        # shared by band rows + the agreement join: eager localCheckpoint
        # (rule 17 — inside foreachBatch each batch is its own scope)
        sigs_new = minhash_signatures(batch).localCheckpoint(eager=True)
        bands_new = lsh_band_rows(sigs_new)
        within = (
            bands_new.groupBy("band_key")
            .agg(F.collect_list("doc_id").alias("ids"))
            .filter((F.size("ids") >= 2) & (F.size("ids") <= LSH_MAX_BUCKET))
            .select(F.explode("ids").alias("doc_a"), "ids")
            .select("doc_a", F.explode("ids").alias("doc_b"))
            .filter(F.col("doc_a") < F.col("doc_b"))
        )
        try:
            sigs_old = spark.read.parquet(sig_dir)
        except Exception:
            sigs_old = None
        if sigs_old is None:
            cands = within.distinct()
            all_sigs = sigs_new
        else:
            bands_old = lsh_band_rows(sigs_old)
            old_sizes = bands_old.groupBy("band_key").agg(
                F.count(F.lit(1)).alias("n_old")
            )
            cross = (
                bands_new.withColumnRenamed("doc_id", "doc_n")
                .join(bands_old.withColumnRenamed("doc_id", "doc_o"), "band_key")
                .join(old_sizes, "band_key")
                .filter(F.col("n_old") <= LSH_MAX_BUCKET)
                .select(
                    F.least("doc_o", "doc_n").alias("doc_a"),
                    F.greatest("doc_o", "doc_n").alias("doc_b"),
                )
            )
            cands = within.unionByName(cross).distinct()
            all_sigs = sigs_old.unionByName(sigs_new)
        n_eq = None
        for i in range(N_HASHES):
            term = F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
            n_eq = term if n_eq is None else n_eq + term
        out = (
            cands.join(_sig_side(all_sigs, "doc_a", "a"), "doc_a")
            .join(_sig_side(all_sigs, "doc_b", "b"), "doc_b")
            .select(
                "doc_a",
                "doc_b",
                n_eq.cast("bigint").alias("n_matching_hashes"),
                F.round(n_eq.cast("double") / N_HASHES, 6).alias("est_jaccard"),
            )
            .filter(F.col("n_matching_hashes") >= NEARDUP_TAU_EQ)
        )
        out.write.mode("append").parquet(pairs_dir)
        sigs_new.write.mode("append").parquet(sig_dir)

    return (
        src.writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
