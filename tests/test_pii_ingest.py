"""Stream ≡ batch pins for the at-ingest PII gate
(streaming/pii_ingest.py vs the registered x4_pii_gate fold)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_active911_spark.io import read_table, spread
from etl_active911_spark.operators.textual import pii_verdict_rows, x4_pii_gate
from etl_active911_spark.streaming import pii_ingest
from tests.conftest import SF_ORACLE


def test_pii_stream_matches_batch(spark, tmp_path):
    """Two availableNow drains plus a replay over one checkpoint: the
    union of per-arrival verdict rows must equal the batch verdict table
    EXACTLY (stateless gate — any split), and its source-grouped
    aggregate must equal the registered fold."""
    docs = spread(read_table(spark, SF_ORACLE, "documents")).select(
        "doc_id", "source", "text"
    )
    src_dir = str(tmp_path / "pii_src")
    out_dir = str(tmp_path / "pii_out")
    ckpt = str(tmp_path / "pii_ckpt")
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)

    def drain():
        src = spark.readStream.schema("doc_id long, source string, text string").parquet(
            src_dir
        )
        q = pii_ingest.run_pii_stream(src, out_dir, ckpt)
        assert q.awaitTermination(120)

    b1.coalesce(1).write.mode("append").parquet(src_dir)
    drain()
    b2.coalesce(1).write.mode("append").parquet(src_dir)
    drain()
    # replay batch 1: the re-delivery guard must add nothing
    b1.coalesce(1).write.mode("append").parquet(src_dir)
    drain()

    def rows(df):
        return {tuple(r) for r in df.collect()}

    got = rows(spark.read.parquet(out_dir).select(
        "doc_id", "source", "n_emails", "n_phones", "n_ssns", "quarantined"
    ))
    want = rows(pii_verdict_rows(docs))
    assert got == want and len(got) > 0
    # both verdict classes fire at sf0.01
    flags = {r[-1] for r in got}
    assert flags == {0, 1}

    # the emitted verdicts aggregate to the registered batch fold
    emitted = spark.read.parquet(out_dir)
    admitted = F.col("quarantined") == 0
    folded = rows(
        emitted.groupBy("source").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("quarantined").cast("bigint").alias("n_quarantined"),
            (F.count(F.lit(1)) - F.sum("quarantined")).cast("bigint").alias("n_admitted"),
            F.sum(F.when(admitted, F.col("n_emails")).otherwise(0)).cast("bigint").alias("admitted_emails"),
            F.sum(F.when(admitted, F.col("n_phones")).otherwise(0)).cast("bigint").alias("admitted_phones"),
            F.sum(F.when(admitted, F.col("n_ssns")).otherwise(0)).cast("bigint").alias("admitted_ssns"),
        )
    )
    assert folded == rows(x4_pii_gate(spark, SF_ORACLE))
