"""Streaming boilerplate scrub (X-2 at ingest): C4-style line dedup as a
continuously-fed job with a SEGMENT-LEDGER state — the third member of
the ingest-time trio (near-dup gate, curation gate, boilerplate scrub;
VERDICT r11 item 6).

The batch fold (``x2_boilerplate_scrub``) answers "which passages repeat
across the corpus and who keeps them"; a crawl landing zone needs "which
of THIS arriving page's passages are already owned" — decided at
arrival, holding no raw text beyond the current micro-batch. State is
exactly the index the 100 TB design stores anyway: one
(seg_md5, owner_doc) row per DISTINCT segment ever seen (``ledger_dir``)
plus the emitted per-doc scrub ledgers (``out_dir``, which doubles as
the re-delivery guard). Each micro-batch:

1. drop re-delivered doc_ids (anti-join against the emitted ledger —
   first-writer-wins, so a replayed batch cannot re-claim or re-scrub);
2. segment rows for the arriving docs via ``scrub_segment_rows`` — the
   SAME chunker the batch fold uses (shared-helper discipline, the
   ``signature_agreement_pairs`` precedent);
3. ownership: a segment already in the ledger is owned by its historical
   first writer; a segment new to the ledger is claimed by the MIN
   doc_id holding it within this batch (so a single all-at-once batch
   reproduces the batch fold exactly);
4. the scrub verdict per segment occurrence: REMOVED iff the owner is
   another document (same rule as batch: the canonical copy keeps ALL
   its occurrences, every other document loses all of its);
5. per-doc ledger rows via ``scrub_doc_rollup`` — the same arithmetic
   (exact BIGINTs, rule-26b half-up micro-division) as the batch fold;
6. append the per-doc rows and the NEW ledger claims.

Stream ≡ batch: segment ownership is append-only (first writer keeps —
the ledger is never rewritten), so the union of per-doc emissions over
any arrival split equals the batch fold (global MIN-doc_id canonical)
whenever every segment's MIN-doc_id holder arrives no later than any
other holder — in particular for any doc_id-ordered split, and trivially
for the one-batch split. An OUT-OF-ORDER split diverges one-sidedly and
honestly: a duplicate that arrives before its smaller-id sibling is the
corpus's first copy at that moment, keeps the passage, and the later
smaller-id arrival is scrubbed — arrival precedence is the only
causally-available policy at ingest (the batch fold, seeing everything,
re-assigns by MIN doc_id). Both regimes are pinned in
tests/test_streaming.py.

No hot-bucket guard is needed (unlike the near-dup gate): work is LINEAR
in batch segments — one ledger equi-join on the uniform md5 key and one
doc-keyed roll-up; a boilerplate flood makes ledger HITS, not pair
fan-out.

Exactly-once caveat: plain parquet appends; the re-delivery anti-join
makes the state appends idempotent, while a crash between the two
appends could replay per-doc rows — production routes those through the
keyed upsert sink (streaming/jobs.py, key doc_id), same note as the
near-dup gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_active911_spark.operators.dedup import (
    scrub_doc_rollup,
    scrub_segment_rows,
)
from etl_active911_spark.streaming.neardup_ingest import _read_or_none


def run_scrub_stream(
    src: DataFrame,
    ledger_dir: str,
    out_dir: str,
    ckpt: str,
):
    """Start the scrub gate over a streaming (doc_id, text) source;
    returns the StreamingQuery (availableNow trigger — drain-what's-there
    semantics, the ann_ingest/neardup_ingest harness)."""

    def process(batch: DataFrame, _batch_id: int) -> None:
        spark = batch.sparkSession
        batch = batch.dropDuplicates(["doc_id"])
        out_old = _read_or_none(spark, out_dir)
        if out_old is not None:
            batch = batch.join(out_old.select("doc_id"), "doc_id", "left_anti")
        if not batch.take(1):
            return
        # segment rows feed the ownership aggregate AND the rollup join:
        # eager localCheckpoint (rule 17 — per-batch scope)
        c = scrub_segment_rows(batch).localCheckpoint(eager=True)
        led_old = _read_or_none(spark, ledger_dir)
        # within-batch claims for segments NOT already owned
        claims = c.groupBy("seg_md5").agg(F.min("doc_id").alias("batch_owner"))
        if led_old is not None:
            claims = claims.join(
                led_old.select("seg_md5"), "seg_md5", "left_anti"
            )
            owned = led_old.select("seg_md5", F.col("owner_doc").alias("owner"))
        else:
            owned = None
        claims = claims.localCheckpoint(eager=True)  # feeds verdict + append
        ownership = claims.select(
            "seg_md5", F.col("batch_owner").alias("owner")
        )
        if owned is not None:
            ownership = ownership.unionByName(owned)
        verdict = c.join(ownership, "seg_md5")
        rows = scrub_doc_rollup(verdict, F.col("owner") != F.col("doc_id"))
        rows.write.mode("append").parquet(out_dir)
        claims.select(
            "seg_md5", F.col("batch_owner").alias("owner_doc")
        ).write.mode("append").parquet(ledger_dir)

    return (
        src.writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
