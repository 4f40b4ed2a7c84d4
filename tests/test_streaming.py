"""Batch/stream parity (SURVEY.md §5.4): the same transform over the same
events must produce identical results via batch and Structured Streaming
(Trigger.AvailableNow), and the watermark must drop late data."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from etl_active911_spark.io import read_table
from etl_active911_spark.streaming import jobs
from etl_active911_spark.streaming.windows import tumbling_counts
from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def events_dir(spark):
    """Re-write the events fixture as µs-timestamp parquet (streaming reader
    needs a plain timestamp schema) split into several files."""
    d = tempfile.mkdtemp(prefix="events_stream_")
    read_table(spark, SF_ORACLE, "events").repartition(6).write.mode("overwrite").parquet(d)
    return d


def canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_tumbling_batch_stream_parity(spark, events_dir):
    batch = tumbling_counts(spark.read.parquet(events_dir))
    stream = jobs.windowed_counts_stream(jobs.read_events_stream(spark, events_dir))
    jobs.run_complete_to_memory(stream, "tumbling_parity")
    got = spark.table("tumbling_parity")
    assert canon(got) == canon(batch)


def test_session_batch_stream_parity(spark, events_dir):
    from etl_active911_spark.streaming.windows import session_counts

    batch = session_counts(spark.read.parquet(events_dir))
    stream = session_counts(
        jobs.read_events_stream(spark, events_dir).withWatermark("ts", "1 hour")
    )
    jobs.run_complete_to_memory(stream, "session_parity")
    assert canon(spark.table("session_parity")) == canon(batch)


def test_stateful_running_stats(spark, events_dir):
    """applyInPandasWithState across multiple micro-batches: the final
    per-user totals (max n_events emitted) must equal the batch aggregate."""
    from pyspark.sql import functions as F

    from etl_active911_spark.streaming.stateful import user_running_stats

    stream = user_running_stats(jobs.read_events_stream(spark, events_dir))
    (
        stream.writeStream.format("memory")
        .queryName("stateful_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    final = (
        spark.table("stateful_stats")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
    )
    expected = (
        spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    assert canon(final) == canon(expected)


def test_dedup_stream_drops_resubmitted_ids(spark, events_dir):
    events = spark.read.parquet(events_dir)
    # simulate the reference's overlapping re-pull: the same events arrive twice
    doubled_dir = events_dir + "_doubled"
    events.union(events).repartition(4).write.mode("overwrite").parquet(doubled_dir)
    stream = jobs.dedup_stream(jobs.read_events_stream(spark, doubled_dir))
    out_dir = tempfile.mkdtemp(prefix="dedup_out_")
    ckpt = tempfile.mkdtemp(prefix="dedup_ckpt_")
    jobs.run_to_parquet(stream, out_dir, ckpt)
    got = spark.read.parquet(os.path.join(out_dir, "*"))
    assert got.count() == events.count()
    assert got.select("event_id").distinct().count() == events.count()


def test_pattern_match_batch_stream_parity(spark, tmp_path):
    """Streaming X-6 (applyInPandasWithState, state = trailing window) must
    reproduce the batch rows-frame matcher when micro-batches arrive in
    time order (two files split at the median timestamp)."""
    import time as _time

    from pyspark.sql import functions as F

    from etl_active911_spark.io import read_table
    from etl_active911_spark.operators.timeseries import pattern_match_batch
    from etl_active911_spark.streaming.pattern import pattern_match_stream

    events = (
        read_table(spark, SF_ORACLE, "events")
        .filter(F.col("user_id") < 20)
        .select("user_id", "ts", "event_id", "value")
    )
    # split by time: state must see each user's prefix first
    lo, hi = events.selectExpr("min(ts)", "max(ts)").first()
    tsmid = lo + (hi - lo) / 2
    d = str(tmp_path / "pat_src")
    early = events.filter(F.col("ts") <= F.lit(tsmid))
    late = events.filter(F.col("ts") > F.lit(tsmid))
    early.coalesce(1).write.parquet(d + "/b1")
    _time.sleep(1.1)  # file-stream orders by modification time
    late.coalesce(1).write.parquet(d + "/b2")

    src = (
        spark.readStream.schema("user_id long, ts timestamp_ntz, event_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(d + "/*")
    )
    (
        pattern_match_stream(src)
        .writeStream.format("memory")
        .queryName("pat_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {
        (r["user_id"], r["event_id"], r["corr"])
        for r in spark.table("pat_stream").collect()
    }
    want = {
        (r["user_id"], r["event_id"], r["corr"])
        for r in pattern_match_batch(events).collect()
    }
    assert got == want


def test_watermark_drops_late_rows(spark, tmp_path):
    """Two micro-batches: the second carries an event far older than the
    watermark horizon behind batch 1's max event time → dropped."""
    d = str(tmp_path / "late_src")
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    in_schema = "event_id long, ts string, user_id long, event_type string, value double, props string"

    def mk(rows):
        return spark.createDataFrame(rows, in_schema).withColumn(
            "ts", F.col("ts").cast("timestamp")
        )

    batch1 = mk(
        [(1, "2024-01-01 10:00:00", 1, "click", 1.0, "{}"),
         (2, "2024-01-01 12:00:00", 1, "click", 1.0, "{}")]
    )
    batch2 = mk(
        [(3, "2024-01-01 09:00:00", 1, "click", 1.0, "{}"),  # > 30 min late
         (4, "2024-01-01 12:30:00", 1, "click", 1.0, "{}")]
    )
    batch1.write.parquet(d + "/f1")
    batch2.write.parquet(d + "/f2")

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(d + "/*")
    )
    stream = jobs.windowed_counts_stream(src, watermark="30 minutes")
    (
        stream.writeStream.format("memory")
        .queryName("late_test")
        .outputMode("append")  # append emits only finalized (watermark-passed) windows
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    finalized = spark.table("late_test")
    # the 09:00 window must never appear with the late row counted after
    # batch 1 advanced the watermark to 11:30
    w9 = [r for r in finalized.collect() if r["window_start"].hour == 9]
    assert all(r["n_events"] == 0 for r in w9) or not w9


def test_stream_stream_join_batch_parity(spark, tmp_path):
    """N-14 stream-stream attribution join (watermarked, time-range-bounded
    state) must reproduce the batch range join when micro-batches arrive in
    time order."""
    import time as _time

    from pyspark.sql import functions as F

    from etl_active911_spark.io import read_table
    from etl_active911_spark.streaming.joins import (
        _split_roles,
        attribution_stream,
        n14_stream_stream_join,
    )

    # watermarks need TIMESTAMP (not NTZ); the session is pinned UTC, so
    # the cast preserves instants and batch/stream values stay comparable
    events = (
        read_table(spark, SF_ORACLE, "events")
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"),
                "event_id", "event_type", "value")
    )
    lo, hi = events.selectExpr("min(ts)", "max(ts)").first()
    tsmid = lo + (hi - lo) / 2
    d = str(tmp_path / "ssj_src")
    events.filter(F.col("ts") <= F.lit(tsmid)).coalesce(1).write.parquet(d + "/b1")
    _time.sleep(1.1)  # file-stream orders by modification time
    events.filter(F.col("ts") > F.lit(tsmid)).coalesce(1).write.parquet(d + "/b2")

    src = (
        spark.readStream.schema(
            "user_id long, ts timestamp, event_id long, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(d + "/*")
    )
    clicks, purchases = _split_roles(src)
    (
        attribution_stream(clicks, purchases)
        .writeStream.format("memory")
        .queryName("ssj_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {
        (r["user_id"], r["click_id"], r["purchase_id"], r["purchase_value"])
        for r in spark.table("ssj_stream").collect()
    }
    want = {
        (r["user_id"], r["click_id"], r["purchase_id"], r["purchase_value"])
        for r in n14_stream_stream_join(spark, SF_ORACLE).collect()
    }
    assert got == want and len(want) > 0


def test_stream_static_join_batch_parity(spark, tmp_path):
    """N-14b stream-static enrichment (stateless broadcast dim per
    micro-batch) must reproduce the batch join."""
    from pyspark.sql import functions as F

    from etl_active911_spark.io import read_table
    from etl_active911_spark.streaming.joins import (
        enrichment_stream,
        n14_stream_static_join,
    )

    events = read_table(spark, SF_ORACLE, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    d = str(tmp_path / "ssj2_src")
    events.coalesce(2).write.parquet(d)
    src = (
        spark.readStream.schema(
            "user_id long, ts timestamp_ntz, event_id long, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    customer = read_table(spark, SF_ORACLE, "customer").select("c_custkey", "c_mktsegment")
    (
        enrichment_stream(src, customer)
        .writeStream.format("memory")
        .queryName("enrich_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {
        (r["event_id"], r["user_id"], r["segment"], r["value"])
        for r in spark.table("enrich_stream").collect()
    }
    want = {
        (r["event_id"], r["user_id"], r["segment"], r["value"])
        for r in n14_stream_static_join(spark, SF_ORACLE).collect()
    }
    assert got == want and len(want) > 0


def test_upsert_sink_last_write_wins(spark, tmp_path):
    """MERGE-style foreachBatch sink: the same user_id arriving in later
    micro-batches must REPLACE its earlier row (last-write-wins), while
    untouched keys survive bucket rewrites."""
    import time as _time

    d = str(tmp_path / "upsert_src")
    rows_schema = "user_id long, value double"
    b1 = spark.createDataFrame([(1, 1.0), (2, 2.0), (3, 3.0)], rows_schema)
    b2 = spark.createDataFrame([(2, 20.0), (4, 4.0)], rows_schema)
    b1.coalesce(1).write.parquet(d + "/f1")
    _time.sleep(1.1)
    b2.coalesce(1).write.parquet(d + "/f2")

    src = (
        spark.readStream.schema(rows_schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(d + "/*")
    )
    out = str(tmp_path / "upsert_out")
    ckpt = str(tmp_path / "upsert_ckpt")
    jobs.run_upsert_to_parquet(src, out, ckpt, key_col="user_id")

    got = {
        r["user_id"]: r["value"] for r in spark.read.parquet(out).collect()
    }
    assert got == {1: 1.0, 2: 20.0, 3: 3.0, 4: 4.0}


def test_upsert_sink_replay_is_idempotent(spark, tmp_path):
    """Replaying the same source through a FRESH checkpoint must converge
    to the same materialized table (the docstring's idempotency claim)."""
    d = str(tmp_path / "idem_src")
    rows_schema = "user_id long, value double"
    spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 3.0), (2, 20.0)], rows_schema
    ).coalesce(2).write.parquet(d)

    def run(tag):
        src = spark.readStream.schema(rows_schema).parquet(d)
        out = str(tmp_path / f"idem_out_{tag}")
        jobs.run_upsert_to_parquet(
            src, out, str(tmp_path / f"idem_ckpt_{tag}"), key_col="user_id"
        )
        return {
            (r["user_id"], r["value"]) for r in spark.read.parquet(out).collect()
        }

    first, second = run("a"), run("b")
    assert first == second
    assert {u for u, _ in first} == {1, 2, 3}


# ---------------------------------------------------------------------------
# Registered-body parity (VERDICT r02 next-step #6): every N-11..N-14 query
# in the driver registry gets one end-to-end Trigger.AvailableNow run that
# must equal the REGISTERED batch body on the same fixture. (The n14 joins
# are covered above; these complete the set.) Timestamp columns compare as
# session-rendered strings so TIMESTAMP (stream, UTC session) and
# TIMESTAMP_NTZ (registered body) rows align regardless of driver-local tz.
# ---------------------------------------------------------------------------


def _canon_str(df, ts_col):
    return sorted(
        tuple(r) for r in df.withColumn(ts_col, F.col(ts_col).cast("string")).collect()
    )


def test_tumbling_stream_matches_registered_body(spark, events_dir):
    from etl_active911_spark.streaming.windows import n11_tumbling_window

    stream = jobs.windowed_counts_stream(jobs.read_events_stream(spark, events_dir))
    jobs.run_complete_to_memory(stream, "tumbling_reg_parity")
    got = _canon_str(spark.table("tumbling_reg_parity"), "window_start")
    want = _canon_str(n11_tumbling_window(spark, SF_ORACLE), "window_start")
    assert got == want and len(want) > 0


def test_sliding_stream_matches_registered_body(spark, events_dir):
    from etl_active911_spark.streaming.windows import n11_sliding_window, sliding_counts

    stream = sliding_counts(
        jobs.read_events_stream(spark, events_dir).withWatermark("ts", "30 minutes")
    )
    jobs.run_complete_to_memory(stream, "sliding_reg_parity")
    got = _canon_str(spark.table("sliding_reg_parity"), "window_start")
    want = _canon_str(n11_sliding_window(spark, SF_ORACLE), "window_start")
    assert got == want and len(want) > 0


def test_session_stream_matches_registered_body(spark, events_dir):
    from etl_active911_spark.streaming.windows import n12_session_window, session_counts

    stream = session_counts(
        jobs.read_events_stream(spark, events_dir).withWatermark("ts", "1 hour")
    )
    jobs.run_complete_to_memory(stream, "session_reg_parity")
    got = _canon_str(spark.table("session_reg_parity"), "session_start")
    want = _canon_str(n12_session_window(spark, SF_ORACLE), "session_start")
    assert got == want and len(want) > 0


def test_stateful_dedup_stream_matches_registered_body(spark, events_dir):
    """Streaming form of n12_stateful_dedup: dropDuplicatesWithinWatermark
    on (user_id, event_type, hour-bucket) emits one row per key, so the
    per-(user, type) counts must equal the registered batch body's row_number
    dedup — regardless of WHICH row within a bucket survives."""
    from etl_active911_spark.streaming.windows import n12_stateful_dedup

    deduped = (
        jobs.read_events_stream(spark, events_dir)
        .withWatermark("ts", "2 hours")
        .withColumn("bucket", F.window("ts", "1 hour")["start"])
        .dropDuplicatesWithinWatermark(["user_id", "event_type", "bucket"])
    )
    (
        deduped.writeStream.format("memory")
        .queryName("dedup_reg_parity")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = sorted(
        tuple(r)
        for r in spark.table("dedup_reg_parity")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n_kept"))
        .collect()
    )
    want = sorted(tuple(r) for r in n12_stateful_dedup(spark, SF_ORACLE).collect())
    assert got == want and len(want) > 0


def test_upsert_sink_survives_crash_and_restart(spark, tmp_path):
    """Exactly-once replay across a real restart (VERDICT r02 stretch #8):
    the stream dies mid-run — once BEFORE batch 1's sink applies, once
    AFTER it applied but before the checkpoint committed — and a restart
    on the SAME checkpoint must converge to the exact last-write-wins
    state with no lost or duplicated keys."""
    import time as _time

    from pyspark.errors import StreamingQueryException

    rows_schema = "user_id long, value double"

    def make_source(tag):
        d = str(tmp_path / f"crash_src_{tag}")
        b1 = spark.createDataFrame([(1, 1.0), (2, 2.0), (3, 3.0)], rows_schema)
        b2 = spark.createDataFrame([(2, 20.0), (4, 4.0)], rows_schema)
        b1.coalesce(1).write.parquet(d + "/f1")
        _time.sleep(1.1)  # file-stream orders by modification time
        b2.coalesce(1).write.parquet(d + "/f2")
        return d

    def stream_from(d):
        return (
            spark.readStream.schema(rows_schema)
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(d + "/*")
        )

    def run(d, sink_fn, ckpt):
        (
            stream_from(d)
            .writeStream.foreachBatch(sink_fn)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    want = {1: 1.0, 2: 20.0, 3: 3.0, 4: 4.0}

    for crash_point, tag in [("before", "pre"), ("after", "post")]:
        d = make_source(tag)
        out = str(tmp_path / f"crash_out_{tag}")
        ckpt = str(tmp_path / f"crash_ckpt_{tag}")
        inner = jobs.upsert_sink(out, key_col="user_id")
        state = {"crashed": False}

        def crashing_sink(batch_df, batch_id):
            if batch_id == 1 and not state["crashed"]:
                state["crashed"] = True
                if crash_point == "after":
                    inner(batch_df, batch_id)  # applied, but commit never lands
                raise RuntimeError("injected crash")
            inner(batch_df, batch_id)

        with pytest.raises(StreamingQueryException):
            run(d, crashing_sink, ckpt)
        # batch 0 must already be durable, batch 1 must not have lost keys
        partial = {
            r["user_id"]: r["value"] for r in spark.read.parquet(out).collect()
        }
        assert partial[1] == 1.0 and partial[3] == 3.0

        run(d, crashing_sink, ckpt)  # restart on the SAME checkpoint
        got = {r["user_id"]: r["value"] for r in spark.read.parquet(out).collect()}
        assert got == want, (crash_point, got)


@pytest.mark.parametrize("session_tz", ["UTC", "Asia/Tokyo"])
def test_asof_stream_matches_registered_body(spark, tmp_path, session_tz):
    """Streaming N-17 (applyInPandasWithState, state = latest purchase per
    user) must reproduce the registered batch as-of join when micro-batches
    arrive in time order — under a hostile session timezone too (r5,
    VERDICT r04 item 8: the streaming forms join the TZ sweep; the NTZ→
    timestamp cast at the stream edge shifts both batch and stream
    uniformly and the output carries no timestamps)."""
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", session_tz)
    try:
        _asof_stream_body(spark, tmp_path, session_tz)
    finally:
        # always restore: a failure here must not leak the hostile tz into
        # the session-scoped fixture (ADVICE r05)
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


def _asof_stream_body(spark, tmp_path, session_tz):
    import time as _time

    from etl_active911_spark.io import read_table
    from etl_active911_spark.operators.asof import n17_asof_join
    from etl_active911_spark.streaming.asof_stream import asof_join_stream

    events = read_table(spark, SF_ORACLE, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"),
        "event_id", "event_type", "value",
    )
    lo, hi = events.selectExpr("min(ts)", "max(ts)").first()
    tsmid = lo + (hi - lo) / 2
    d = str(tmp_path / f"asof_src_{session_tz.replace(chr(47), chr(95))}")
    events.filter(F.col("ts") <= F.lit(tsmid)).coalesce(1).write.parquet(d + "/b1")
    _time.sleep(1.1)
    events.filter(F.col("ts") > F.lit(tsmid)).coalesce(1).write.parquet(d + "/b2")

    src = (
        spark.readStream.schema(
            "user_id long, ts timestamp, event_id long, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(d + "/*")
    )
    (
        asof_join_stream(src)
        .writeStream.format("memory")
        .queryName(f"asof_stream_{session_tz.replace(chr(47), chr(95))}")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {
        (r["user_id"], r["click_id"], r["purchase_id"], r["last_value"])
        for r in spark.table(f"asof_stream_{session_tz.replace(chr(47), chr(95))}").collect()
    }
    want = {
        (r["user_id"], r["click_id"], r["purchase_id"], r["last_value"])
        for r in n17_asof_join(spark, SF_ORACLE).collect()
    }
    assert got == want and len(want) > 0


@pytest.mark.parametrize("session_tz", ["UTC", "Asia/Tokyo"])
def test_stream_stream_join_evicts_late_rows(spark, tmp_path, session_tz):
    """N-14 range-join STATE EVICTION (VERDICT r04 item 8): once the
    watermark passes click_ts + attribution window, the click's state row
    is evicted (observable in the progress metrics) — a late matching
    purchase arriving in a LATER micro-batch finds no state and the pair
    is never emitted, while the batch join over the union attributes it.
    Eviction runs at micro-batch END, and late input is NOT input-filtered
    by Spark's stream-stream join (verified empirically — the watermark
    contract there is state cleanup, not input drop), so the late row
    must arrive ≥ 2 batches after the watermark advance. Also swept under
    a hostile session timezone: the output carries no timestamps, and
    both watermarking and the join range shift with the session
    uniformly, so the attributed pair set must not change."""
    import time as _time

    from etl_active911_spark.streaming.joins import _split_roles, attribution_stream

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", session_tz)
    try:
        in_schema = "user_id long, ts string, event_id long, event_type string, value double"

        def mk(rows):
            return spark.createDataFrame(rows, in_schema).withColumn(
                "ts", F.col("ts").cast("timestamp")
            )

        batch1 = mk([
            (1, "2024-01-01 10:00:00", 100, "click", 0.0, ),
            (1, "2024-01-01 10:10:00", 200, "purchase", 9.99),
            # fillers advance BOTH sides' event time to 12:00: the global
            # watermark is the MIN across the two watermark operators
            # (click_ts, purchase_ts), so each leg needs a 12:00 row for
            # the batch-2 horizon to reach 11:30
            (2, "2024-01-01 12:00:00", 101, "click", 0.0),
            (3, "2024-01-01 12:00:00", 300, "purchase", 2.0),
        ])
        batch2 = mk([
            # on-time rows; this batch's END applies the 11:30 horizon to
            # state → click 100 (evictable since 10:00 + 30 min < 11:30)
            # is removed here
            (2, "2024-01-01 12:10:00", 202, "purchase", 1.00),
        ])
        batch3 = mk([
            # late purchase: within 30 min of click 100, but that click's
            # state is gone — the pair must NOT be emitted
            (1, "2024-01-01 10:20:00", 201, "purchase", 5.00),
        ])
        d = str(tmp_path / f"ssj_late_{session_tz.replace('/', '_')}")
        batch1.coalesce(1).write.parquet(d + "/b1")
        _time.sleep(1.1)  # file-stream orders by modification time
        batch2.coalesce(1).write.parquet(d + "/b2")
        _time.sleep(1.1)
        batch3.coalesce(1).write.parquet(d + "/b3")

        src = (
            spark.readStream.schema(
                "user_id long, ts timestamp, event_id long, event_type string, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(d + "/*")
        )
        clicks, purchases = _split_roles(src)
        qname = f"ssj_late_{session_tz.replace('/', '_').replace('-', '_')}"
        q = (
            attribution_stream(clicks, purchases, watermark="30 minutes")
            .writeStream.format("memory")
            .queryName(qname)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r["user_id"], r["click_id"], r["purchase_id"], r["purchase_value"])
            for r in spark.table(qname).collect()
        }
        # eviction must be OBSERVABLE: join-state row count shrinks after
        # the watermark advances past the old rows' eviction bounds
        state_rows = [
            s["numRowsTotal"]
            for p in q.recentProgress
            for s in (p.get("stateOperators") or [])
        ]
        assert state_rows and min(state_rows) < max(state_rows), state_rows
        # batch semantics over the union WOULD include the late pair
        union = batch1.unionByName(batch2).unionByName(batch3)
        bclicks, bpurch = _split_roles(union)
        from etl_active911_spark.streaming.joins import _attribution_join

        batch_pairs = {
            (r["user_id"], r["click_id"], r["purchase_id"], r["purchase_value"])
            for r in _attribution_join(bclicks, bpurch).collect()
        }
        assert (1, 100, 201, 5.0) in batch_pairs
        assert got == batch_pairs - {(1, 100, 201, 5.0)}
        assert (1, 100, 200, 9.99) in got and (2, 101, 202, 1.0) in got
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


def test_stream_stream_left_join_emits_nulls_at_eviction(spark, tmp_path):
    """N-14c outer stream-stream join: a click with NO matching purchase
    is emitted with NULL purchase columns only once the watermark proves
    no match can still arrive (null generation happens at state
    eviction); matched clicks join normally. Batch parity on the same
    data pins the value semantics."""
    import time as _time

    from etl_active911_spark.streaming.joins import (
        _split_roles,
        attribution_stream_outer,
    )

    in_schema = "user_id long, ts string, event_id long, event_type string, value double"

    def mk(rows):
        return spark.createDataFrame(rows, in_schema).withColumn(
            "ts", F.col("ts").cast("timestamp")
        )

    batch1 = mk([
        (1, "2024-01-01 10:00:00", 100, "click", 0.0),   # will match
        (1, "2024-01-01 10:10:00", 200, "purchase", 9.99),
        (2, "2024-01-01 10:01:00", 101, "click", 0.0),   # never matches
        (3, "2024-01-01 10:02:00", 300, "purchase", 1.0),  # purchase-side filler
    ])
    batch2 = mk([
        # advance BOTH watermark operators far past 10:31 + 30min horizon
        (4, "2024-01-01 13:00:00", 102, "click", 0.0),
        (5, "2024-01-01 13:00:00", 301, "purchase", 2.0),
    ])
    batch3 = mk([
        # one more batch so eviction (end of batch 2) results flush
        (6, "2024-01-01 13:30:00", 103, "click", 0.0),
        (7, "2024-01-01 13:30:00", 302, "purchase", 3.0),
    ])
    d = str(tmp_path / "ssj_outer")
    batch1.coalesce(1).write.parquet(d + "/b1")
    _time.sleep(1.1)
    batch2.coalesce(1).write.parquet(d + "/b2")
    _time.sleep(1.1)
    batch3.coalesce(1).write.parquet(d + "/b3")

    src = (
        spark.readStream.schema(
            "user_id long, ts timestamp, event_id long, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(d + "/*")
    )
    clicks, purchases = _split_roles(src)
    (
        attribution_stream_outer(clicks, purchases, watermark="30 minutes")
        .writeStream.format("memory")
        .queryName("ssj_outer")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {
        (r["user_id"], r["click_id"], r["purchase_id"], r["purchase_value"])
        for r in spark.table("ssj_outer").collect()
    }
    # the unmatched click MUST surface as a null row after eviction,
    # and the matched one with its purchase
    assert (2, 101, None, None) in got
    assert (1, 100, 200, 9.99) in got
    # no spurious inner results for the filler purchase
    assert not any(p == 300 for _, _, p, _ in got)


def test_shard_assign_stream_matches_batch_prefix_sum(spark, tmp_path):
    """Streaming X-8 packing (applyInPandasWithState, state = one running
    byte offset per source) must reproduce the batch grouped two-phase
    prefix sum exactly when micro-batches arrive in doc_id order — and the
    assignments emitted by batch 1 must be final (append-only manifest:
    batch 2 extends, never rewrites)."""
    import time as _time

    from etl_active911_spark.io import read_table
    from etl_active911_spark.operators.sampling import (
        TARGET_SHARD_BYTES,
        _two_phase_prefix_sum,
    )
    from etl_active911_spark.streaming.packing import shard_assign_stream

    docs = read_table(spark, SF_ORACLE, "documents").select("source", "doc_id", "text")
    mid = docs.selectExpr("percentile_approx(doc_id, 0.5)").first()[0]
    d = str(tmp_path / "pack_src")
    docs.filter(F.col("doc_id") <= mid).coalesce(1).write.parquet(d + "/b1")
    _time.sleep(1.1)  # file-source batch order follows modification time
    docs.filter(F.col("doc_id") > mid).coalesce(1).write.parquet(d + "/b2")

    src = (
        spark.readStream.schema("source string, doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(d + "/*")
    )
    (
        shard_assign_stream(src)
        .writeStream.format("memory")
        .queryName("pack_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {
        r["doc_id"]: (r["source"], r["n_bytes"], r["start_off"], r["shard_id"])
        for r in spark.table("pack_stream").collect()
    }

    sized = docs.select(
        "source", "doc_id", F.octet_length("text").cast("long").alias("n_bytes")
    )
    want = {
        r["doc_id"]: (
            r["source"],
            r["n_bytes"],
            r["start_off"],
            r["start_off"] // TARGET_SHARD_BYTES,
        )
        for r in _two_phase_prefix_sum(sized, "n_bytes", group_cols=("source",)).collect()
    }
    assert len(got) == len(want) > 0
    assert got == want


def test_trending_topk_batch_stream_parity(spark, events_dir):
    """N-11 trending (r6): the watermarked windowed count streams in
    append mode (only watermark-finalized windows emit); ranking the sink
    table must equal the registered batch query on those windows — and
    with AvailableNow over bounded input, every window except the last
    open one finalizes."""
    from etl_active911_spark.streaming.windows import (
        n11_trending_topk,
        rank_trending,
        trending_counts,
    )

    stream = trending_counts(
        jobs.read_events_stream(spark, events_dir).withWatermark("ts", "30 minutes")
    )
    (
        stream.writeStream.format("memory")
        .queryName("trending_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    finalized = spark.table("trending_stream")
    got = {
        (r["window_start"], r["event_type"], r["n_events"], r["rnk"])
        for r in rank_trending(finalized).collect()
    }
    batch_rows = n11_trending_topk.__wrapped__(spark, SF_ORACLE) if hasattr(
        n11_trending_topk, "__wrapped__"
    ) else n11_trending_topk(spark, SF_ORACLE)
    finalized_windows = {r["window_start"] for r in finalized.collect()}
    want = {
        (r["window_start"], r["event_type"], r["n_events"], r["rnk"])
        for r in batch_rows.collect()
        if r["window_start"] in finalized_windows
    }
    assert got == want and len(got) > 0


def test_ann_ingest_stream_matches_batch(spark, tmp_path):
    """Streaming ANN ingest (X-3 r10): two micro-batches — the second
    RE-INGESTS half of the first's ids with different embeddings —
    through foreachBatch assignment + the keyed upsert sink must land on
    exactly the per-vector assignment (and hence per-cell occupancy) of
    the batch fold: latest embedding per vec_id → argmax_cells."""
    import math

    from etl_active911_spark.operators.similarity import argmax_cells
    from etl_active911_spark.streaming import ann_ingest

    dim = 8
    seeds = spark.createDataFrame(
        [
            (c, [1.0 if i == c else (0.1 if (i + c) % 3 == 0 else 0.0) for i in range(dim)])
            for c in range(4)
        ],
        "cell int, se array<double>",
    )

    def vec(i, salt):
        return [
            math.sin(0.7 * i + 1.3 * j + salt) for j in range(dim)
        ]

    schema = "vec_id long, embedding array<double>"
    b1 = spark.createDataFrame([(i, vec(i, 0.0)) for i in range(40)], schema)
    b2 = spark.createDataFrame(
        [(i, vec(i, 5.0)) for i in range(20, 60)], schema
    )

    src_dir = str(tmp_path / "ann_src")
    out = str(tmp_path / "ann_out")
    ckpt = str(tmp_path / "ann_ckpt")

    def drain():
        src = spark.readStream.schema(schema).parquet(src_dir + "/*")
        ann_ingest.run_ann_ingest_stream(src, seeds, out, ckpt)

    # two sequential availableNow drains over the same checkpoint = two
    # micro-batches in arrival order (the upsert crash/restart pattern)
    b1.coalesce(1).write.parquet(src_dir + "/f1")
    drain()
    b2.coalesce(1).write.parquet(src_dir + "/f2")
    drain()

    streamed = {
        r["vec_id"]: (r["cell"], r["cos"])
        for r in spark.read.parquet(out).select("vec_id", "cell", "cos").collect()
    }

    latest = spark.createDataFrame(
        [(i, vec(i, 0.0)) for i in range(20)]
        + [(i, vec(i, 5.0)) for i in range(20, 60)],
        schema,
    )
    expected = {
        r["vec_id"]: (r["cell"], r["cos"])
        for r in argmax_cells(latest, seeds).collect()
    }
    assert streamed == expected

    # occupancy view agrees with the batch rollup
    occ = {
        r["cell"]: r["n_vectors"]
        for r in ann_ingest.cell_occupancy(spark, out).collect()
    }
    from collections import Counter

    assert occ == dict(Counter(c for c, _ in expected.values()))


def test_curation_ingest_stream_matches_batch(spark, tmp_path):
    """Streaming curation (X-9 r10): quality gate per micro-batch +
    cross-batch content-hash upsert must converge to the batch fold
    (gate everything, keep MAX doc_id per content hash)."""
    from etl_active911_spark.operators.dedup import normalized_text
    from etl_active911_spark.operators.textual import gopher_stats
    from etl_active911_spark.streaming import curation_ingest

    good = (
        "the quick brown fox jumps over a lazy dog and then walks on "
        "to the old market where a trader sells fresh bread and ripe "
        "fruit to the town people who gather in the morning light near "
        "the stone well to share news of the day and trade small goods "
        "before the sun climbs high and the square fills with carts"
    )  # 60+ words, passes the Gopher gate
    bad = "tiny doc"  # far below the 50-word floor

    schema = "doc_id long, source string, text string"
    b1 = spark.createDataFrame(
        [
            (1, "srcA", good + " alpha"),
            (2, "srcA", good + " beta"),
            (3, "srcB", bad),
            (4, "srcB", good + " alpha"),  # dup of doc 1 content
        ],
        schema,
    )
    b2 = spark.createDataFrame(
        [
            (10, "srcC", good + " alpha"),  # re-send: replaces doc 4's copy
            (11, "srcB", good + " gamma"),
            (12, "srcA", bad),
        ],
        schema,
    )

    src_dir = str(tmp_path / "cur_src")
    out = str(tmp_path / "cur_out")
    ckpt = str(tmp_path / "cur_ckpt")

    def drain():
        src = spark.readStream.schema(schema).parquet(src_dir + "/*")
        curation_ingest.run_curation_ingest_stream(src, out, ckpt)

    b1.coalesce(1).write.parquet(src_dir + "/f1")
    drain()
    b2.coalesce(1).write.parquet(src_dir + "/f2")
    drain()

    streamed = {
        r["source"]: (r["n_docs"], r["total_words"])
        for r in curation_ingest.curated_report(spark, out).collect()
    }

    # batch fold over ALL docs: gate, then keep MAX doc_id per hash
    alldocs = b1.unionByName(b2)
    st = gopher_stats(alldocs.select("doc_id", "text"))
    kept = alldocs.join(
        st.filter(F.col("keep")).select("doc_id", "n_words"), "doc_id"
    ).select(
        F.sha2(normalized_text(F.col("text")), 256).alias("h"),
        "doc_id",
        "source",
        "n_words",
    )
    keepers = kept.groupBy("h").agg(F.max("doc_id").alias("doc_id"))
    expected = {
        r["source"]: (r["n_docs"], r["total_words"])
        for r in kept.join(keepers, ["h", "doc_id"])
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("total_words"),
        )
        .collect()
    }
    assert streamed == expected
    # the re-sent duplicate landed on srcC (doc 10), not srcA/srcB
    assert "srcC" in streamed and streamed["srcC"][0] == 1


def test_cusum_batch_stream_parity(spark, tmp_path):
    """Streaming CUSUM twin (r11, VERDICT r10 item 6): the stateful
    closed-form fold over micro-batches must reproduce the batch
    operator's alarm set exactly (same baseline, same rounded values)
    when events arrive in time order (two files split at the median)."""
    import time as _time

    from etl_active911_spark.operators.timeseries import cusum_alarms
    from etl_active911_spark.streaming.cusum_stream import (
        cusum_alarm_stream,
        cusum_baseline,
    )

    events = (
        read_table(spark, SF_ORACLE, "events")
        .filter(F.col("user_id") < 40)
        .select("user_id", "ts", "event_id", "value")
    )
    lo, hi = events.selectExpr("min(ts)", "max(ts)").first()
    tsmid = lo + (hi - lo) / 2
    d = str(tmp_path / "cusum_src")
    events.filter(F.col("ts") <= F.lit(tsmid)).coalesce(1).write.parquet(d + "/b1")
    _time.sleep(1.1)  # file-stream orders by modification time
    events.filter(F.col("ts") > F.lit(tsmid)).coalesce(1).write.parquet(d + "/b2")

    baseline = cusum_baseline(events)
    src = (
        spark.readStream.schema(
            "user_id long, ts timestamp_ntz, event_id long, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(d + "/*")
    )
    (
        cusum_alarm_stream(src, baseline)
        .writeStream.format("memory")
        .queryName("cusum_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {
        (r["user_id"], r["event_id"], r["cusum"])
        for r in spark.table("cusum_stream").collect()
    }
    want = {
        (r["user_id"], r["event_id"], r["cusum"])
        for r in cusum_alarms(events).collect()
    }
    assert got == want
    assert want, "fixture slice must actually alarm"


def test_hampel_batch_stream_parity(spark, tmp_path):
    """Streaming Hampel monitor (r11, stateless gate): stream-static
    baseline join + integer test must reproduce the batch operator's
    flagged set exactly, including abs_dev/mad values — order of
    arrival is irrelevant (no state), so a 2-file split suffices."""
    import time as _time

    from etl_active911_spark.operators.timeseries import hampel_outliers
    from etl_active911_spark.streaming.cusum_stream import (
        hampel_alarm_stream,
        hampel_baseline,
    )

    events = (
        read_table(spark, SF_ORACLE, "events")
        .filter(F.col("user_id") < 40)
        .select("user_id", "ts", "event_id", "value")
    )
    lo, hi = events.selectExpr("min(ts)", "max(ts)").first()
    tsmid = lo + (hi - lo) / 2
    d = str(tmp_path / "hampel_src")
    events.filter(F.col("ts") <= F.lit(tsmid)).coalesce(1).write.parquet(d + "/b1")
    _time.sleep(1.1)
    events.filter(F.col("ts") > F.lit(tsmid)).coalesce(1).write.parquet(d + "/b2")

    baseline = hampel_baseline(events)
    src = (
        spark.readStream.schema(
            "user_id long, ts timestamp_ntz, event_id long, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    (
        hampel_alarm_stream(src, baseline)
        .writeStream.format("memory")
        .queryName("hampel_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {
        (r["user_id"], r["event_id"], r["abs_dev"], r["mad"])
        for r in spark.table("hampel_stream").collect()
    }
    want = {
        (r["user_id"], r["event_id"], r["abs_dev"], r["mad"])
        for r in hampel_outliers(events).collect()
    }
    assert got == want
    assert want, "fixture slice must flag at least one outlier"


def test_cms_stream_accumulates_batch_matrix(spark, tmp_path):
    """Streaming Count-Min (X-4 r11): the counter matrix is a native
    Structured Streaming stateful aggregation — two availableNow drains
    over one checkpoint (a restart between arrivals) must accumulate
    EXACTLY the batch sketch of everything seen, cell for cell: CMS
    merge is cell-wise addition, which is precisely what the engine's
    partial-agg state recovery implements. Mode is complete (the sketch
    is d·w=256 rows of global state — bounded by construction, no
    watermark needed)."""
    from etl_active911_spark.operators.textual import cms_keyed

    schema = "gram string"
    g1 = [(f"w{i % 13} w{(i * 7) % 13}",) for i in range(300)]
    g2 = [(f"w{i % 11} w{(i * 5) % 13}",) for i in range(200)]
    src_dir = str(tmp_path / "cms_src")
    ckpt = str(tmp_path / "cms_ckpt")
    spark.createDataFrame(g1, schema).coalesce(1).write.mode("append").parquet(src_dir)

    def drain():
        src = spark.readStream.schema(schema).parquet(src_dir)
        q = (
            cms_keyed(src)
            .groupBy("j", "bucket")
            .count()
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName("cms_counters")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    drain()
    spark.createDataFrame(g2, schema).coalesce(1).write.mode("append").parquet(src_dir)
    drain()

    got = {
        (r["j"], r["bucket"]): r["count"]
        for r in spark.sql("SELECT * FROM cms_counters").collect()
    }
    want = {
        (r["j"], r["bucket"]): r["cnt"]
        for r in cms_keyed(spark.createDataFrame(g1 + g2, schema))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == want and len(want) > 50


def test_neardup_stream_matches_batch(spark, tmp_path):
    """Streaming near-dup gate (X-2 r11): two availableNow drains over one
    checkpoint — the second batch contains a cross-arrival near-dup of a
    batch-1 doc AND a within-batch near-dup pair — must emit exactly the
    batch equivalent's pair set (x2_stream_neardup semantics: LSH
    candidates decided by signature agreement, no raw-text state)."""
    from etl_active911_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        signature_agreement_pairs,
    )
    from etl_active911_spark.streaming import neardup_ingest

    base = (
        "the quick brown fox jumps over the lazy dog near the old stone "
        "well in the cold morning light before the town square fills"
    )
    other = (
        "volcanic islands drift across turquoise water while seabirds "
        "circle thermal columns hunting silver fish beneath foam crests"
    )
    third = (
        "engine diagnostics report nominal pressure in every valve as "
        "technicians review telemetry from the overnight calibration runs"
    )
    b1 = [
        (1, base),
        (2, base + " and vendors"),       # within-B1 near-dup of 1
        (3, other),
        (4, third),
    ]
    b2 = [
        (11, base + " as bells ring"),    # cross-arrival near-dup of 1/2
        (12, other + " at golden dusk"),  # cross-arrival near-dup of 3
        (13, "completely unrelated short text about medieval pottery glazes and kiln temperature curves"),
    ]
    schema = "doc_id long, text string"
    src_dir = str(tmp_path / "nd_src")
    sig_dir = str(tmp_path / "nd_sigs")
    bands_dir = str(tmp_path / "nd_bands")
    pairs_dir = str(tmp_path / "nd_pairs")
    ckpt = str(tmp_path / "nd_ckpt")

    def drain():
        src = spark.readStream.schema(schema).parquet(src_dir)
        q = neardup_ingest.run_neardup_stream(
            src, sig_dir, bands_dir, pairs_dir, ckpt
        )
        assert q.awaitTermination(120)

    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src_dir)
    drain()
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src_dir)
    drain()

    got = {
        (r["doc_a"], r["doc_b"], r["n_matching_hashes"], r["est_jaccard"])
        for r in spark.read.parquet(pairs_dir).collect()
    }

    # batch fold of everything through the SAME shared helpers the
    # registered x2_stream_neardup uses (crafted corpus, not the fixture)
    docs = spark.createDataFrame(b1 + b2, schema)
    sigs = minhash_signatures(docs).localCheckpoint(eager=True)
    want = {
        (r["doc_a"], r["doc_b"], r["n_matching_hashes"], r["est_jaccard"])
        for r in signature_agreement_pairs(
            lsh_candidate_pairs(docs, sigs=sigs), sigs
        ).collect()
    }
    assert got == want
    pairs_only = {(a_, b_) for a_, b_, *_ in got}
    assert (1, 2) in pairs_only        # within-batch discovery
    assert (1, 11) in pairs_only       # cross-arrival discovery
    assert (3, 12) in pairs_only       # second family, cross-arrival
    assert not any(13 in p or 4 in p for p in pairs_only)


def test_neardup_stream_flood_guard_total_size(spark, tmp_path):
    """The hot-bucket guard accounts for TOTAL bucket size (historical +
    arriving), so a flood fed one batch at a time stops producing pairs
    the moment the bucket crosses the cap — and the documented one-sided
    divergence holds: the stream keeps the pairs it discovered while the
    bucket was small, the batch fold drops the whole flooded bucket."""
    from etl_active911_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        signature_agreement_pairs,
    )
    from etl_active911_spark.streaming import neardup_ingest

    same = (
        "identical licence boilerplate repeated verbatim across mirror "
        "sites with the same words in the same order every single time"
    )
    schema = "doc_id long, text string"
    src_dir = str(tmp_path / "fl_src")
    sig_dir = str(tmp_path / "fl_sigs")
    bands_dir = str(tmp_path / "fl_bands")
    pairs_dir = str(tmp_path / "fl_pairs")
    ckpt = str(tmp_path / "fl_ckpt")

    def drain():
        src = spark.readStream.schema(schema).parquet(src_dir)
        q = neardup_ingest.run_neardup_stream(
            src, sig_dir, bands_dir, pairs_dir, ckpt, max_bucket=2
        )
        assert q.awaitTermination(120)

    spark.createDataFrame([(1, same), (2, same)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src_dir)
    drain()  # bucket size 2 <= cap: (1,2) emitted
    spark.createDataFrame([(3, same)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src_dir)
    drain()  # totals 3 > cap in EVERY bucket: nothing new emitted

    got = {
        (r["doc_a"], r["doc_b"])
        for r in spark.read.parquet(pairs_dir).collect()
    }
    assert got == {(1, 2)}

    # batch fold at the same cap drops the whole flooded bucket
    docs = spark.createDataFrame([(1, same), (2, same), (3, same)], schema)
    sigs = minhash_signatures(docs).localCheckpoint(eager=True)
    batch_pairs = signature_agreement_pairs(
        lsh_candidate_pairs(docs, sigs=sigs, max_bucket=2), sigs
    ).collect()
    assert batch_pairs == []


def test_neardup_stream_split_invariance_one_doc_batches(spark, tmp_path):
    """The gate's core contract — the union of emissions equals the batch
    fold for ANY arrival split (no bucket over cap) — at the adversarial
    granularity: every doc arrives in its OWN micro-batch, so every
    near-dup pair must be discovered on the cross-arrival (index) path,
    none on the within-batch path."""
    from etl_active911_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        signature_agreement_pairs,
    )
    from etl_active911_spark.streaming import neardup_ingest

    base = (
        "the quick brown fox jumps over the lazy dog near the old stone "
        "well in the cold morning light before the town square fills"
    )
    docs = [
        (1, base),
        (2, "volcanic islands drift across turquoise water while seabirds circle thermal columns hunting silver fish"),
        (3, base + " with vendors"),
        (4, base + " as bells ring"),
    ]
    schema = "doc_id long, text string"
    src_dir = str(tmp_path / "sp_src")
    sig_dir = str(tmp_path / "sp_sigs")
    bands_dir = str(tmp_path / "sp_bands")
    pairs_dir = str(tmp_path / "sp_pairs")
    ckpt = str(tmp_path / "sp_ckpt")

    for row in docs:
        spark.createDataFrame([row], schema).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
        src = spark.readStream.schema(schema).parquet(src_dir)
        assert neardup_ingest.run_neardup_stream(
            src, sig_dir, bands_dir, pairs_dir, ckpt
        ).awaitTermination(120)

    got = {
        (r["doc_a"], r["doc_b"], r["n_matching_hashes"])
        for r in spark.read.parquet(pairs_dir).collect()
    }
    full = spark.createDataFrame(docs, schema)
    sigs = minhash_signatures(full).localCheckpoint(eager=True)
    want = {
        (r["doc_a"], r["doc_b"], r["n_matching_hashes"])
        for r in signature_agreement_pairs(
            lsh_candidate_pairs(full, sigs=sigs), sigs
        ).collect()
    }
    assert got == want
    assert {(a, b) for a, b, _ in got} >= {(1, 3), (1, 4), (3, 4)}


def _seg(tag: str) -> str:
    """Exactly SCRUB_SEG tokens, unique per tag — one scrub segment."""
    from etl_active911_spark.operators.dedup import SCRUB_SEG

    return " ".join(f"{tag}{i}" for i in range(SCRUB_SEG))


def test_scrub_stream_matches_batch(spark, tmp_path):
    """Streaming boilerplate scrub (X-2 r12, VERDICT r11 item 6): two
    availableNow drains over one checkpoint — batch 2 contains a
    cross-arrival duplicate of a batch-1 segment AND a within-batch
    duplicate pair — must emit exactly the batch fold's per-doc ledger
    (first-writer ownership == global MIN doc_id because arrival is
    doc_id-ordered). A replay of batch 1 afterwards must add nothing
    (re-delivery guard)."""
    from etl_active911_spark.operators.dedup import boilerplate_scrub_ledger
    from etl_active911_spark.streaming import scrub_ingest

    A, B, C, D, E = (_seg(t) for t in ("alpha", "beta", "gamma", "delta", "eps"))
    b1 = [
        (1, A + " " + B),   # owns A and B
        (2, A + " " + C),   # A removed (doc 1 owns), owns C
        (3, D),             # unique
    ]
    b2 = [
        (11, B + " " + E),  # B removed cross-arrival (doc 1 owns), owns E
        (12, E),            # within-batch-2 dup of E: doc 11 owns (min id)
    ]
    schema = "doc_id long, text string"
    src_dir = str(tmp_path / "sc_src")
    ledger_dir = str(tmp_path / "sc_ledger")
    out_dir = str(tmp_path / "sc_out")
    ckpt = str(tmp_path / "sc_ckpt")

    def drain():
        src = spark.readStream.schema(schema).parquet(src_dir)
        q = scrub_ingest.run_scrub_stream(src, ledger_dir, out_dir, ckpt)
        assert q.awaitTermination(120)

    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src_dir)
    drain()
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src_dir)
    drain()

    def rows(df):
        return {
            (
                r["doc_id"], r["n_tokens"], r["n_segs"], r["n_removed_segs"],
                r["tokens_after"], r["removed_share"],
            )
            for r in df.collect()
        }

    got = rows(spark.read.parquet(out_dir))
    want = rows(boilerplate_scrub_ledger(spark.createDataFrame(b1 + b2, schema)))
    assert got == want
    by_doc = {t[0]: t for t in got}
    assert by_doc[1][3] == 0          # canonical copy keeps everything
    assert by_doc[2][3] == 1          # within-batch dup scrubbed
    assert by_doc[11][3] == 1         # cross-arrival dup scrubbed
    assert by_doc[12][3] == 1         # within-batch-2 dup scrubbed
    assert by_doc[3][3] == 0          # unique doc untouched

    # replay batch 1: the re-delivery guard must add no rows
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src_dir)
    drain()
    assert rows(spark.read.parquet(out_dir)) == want


def test_scrub_stream_out_of_order_divergence(spark, tmp_path):
    """The documented one-sided divergence: when a duplicate arrives
    BEFORE its smaller-doc_id sibling, the stream scrubs by arrival
    precedence (first writer keeps) while the batch fold re-assigns
    ownership to the MIN doc_id — the honest at-ingest contract
    (scrub_ingest module docstring)."""
    from etl_active911_spark.operators.dedup import boilerplate_scrub_ledger
    from etl_active911_spark.streaming import scrub_ingest

    A = _seg("omega")
    schema = "doc_id long, text string"
    src_dir = str(tmp_path / "oo_src")
    ledger_dir = str(tmp_path / "oo_ledger")
    out_dir = str(tmp_path / "oo_out")
    ckpt = str(tmp_path / "oo_ckpt")

    def drain():
        src = spark.readStream.schema(schema).parquet(src_dir)
        q = scrub_ingest.run_scrub_stream(src, ledger_dir, out_dir, ckpt)
        assert q.awaitTermination(120)

    # doc 20 arrives FIRST and claims the segment; doc 5 arrives later
    spark.createDataFrame([(20, A)], schema).coalesce(1).write.mode("append").parquet(src_dir)
    drain()
    spark.createDataFrame([(5, A)], schema).coalesce(1).write.mode("append").parquet(src_dir)
    drain()

    stream = {r["doc_id"]: r["n_removed_segs"] for r in spark.read.parquet(out_dir).collect()}
    assert stream == {20: 0, 5: 1}  # arrival precedence

    batch = {
        r["doc_id"]: r["n_removed_segs"]
        for r in boilerplate_scrub_ledger(
            spark.createDataFrame([(20, A), (5, A)], schema)
        ).collect()
    }
    assert batch == {5: 0, 20: 1}  # MIN-doc_id canonical


def test_contamination_stream_matches_batch(spark, tmp_path):
    """Streaming contamination gate (X-2 r12): two availableNow drains
    plus a replay over one checkpoint — the union of per-arrival verdict
    rows must equal the registered batch fold EXACTLY for this (and any)
    split: the gate is stateless per row, the strongest stream≡batch
    contract in the ingest family."""
    from etl_active911_spark.io import read_table, spread
    from etl_active911_spark.operators.similarity import (
        SEMCONTAM_EVAL_MOD,
        SEMCONTAM_EVAL_REM,
        semcontam_eval_block,
        train_contamination_rows,
    )
    from etl_active911_spark.streaming import contamination_ingest
    from pyspark.sql import functions as F
    from tests.conftest import SF_ORACLE

    emb = spread(read_table(spark, SF_ORACLE, "embeddings"))
    is_eval = F.col("vec_id") % SEMCONTAM_EVAL_MOD == SEMCONTAM_EVAL_REM
    ev = semcontam_eval_block(emb.filter(is_eval)).localCheckpoint(eager=True)
    train = emb.filter(~is_eval).select("vec_id", "embedding")

    src_dir = str(tmp_path / "ct_src")
    out_dir = str(tmp_path / "ct_out")
    ckpt = str(tmp_path / "ct_ckpt")
    b1 = train.filter(F.col("vec_id") % 2 == 0)
    b2 = train.filter(F.col("vec_id") % 2 == 1)

    def drain():
        src = spark.readStream.schema(
            "vec_id long, embedding array<float>"
        ).parquet(src_dir)
        q = contamination_ingest.run_contamination_stream(src, ev, out_dir, ckpt)
        assert q.awaitTermination(120)

    b1.coalesce(1).write.mode("append").parquet(src_dir)
    drain()
    b2.coalesce(1).write.mode("append").parquet(src_dir)
    drain()
    # replay batch 1: the re-delivery guard must add nothing
    b1.coalesce(1).write.mode("append").parquet(src_dir)
    drain()

    def rows(df):
        return {
            (r["vec_id"], r["top_eval_id"], r["top_cosine"], r["quarantined"])
            for r in df.collect()
        }

    got = rows(spark.read.parquet(out_dir))
    want = rows(train_contamination_rows(train, ev))
    assert got == want and len(got) > 0
    # sanity: the fixture exercises both verdict classes
    flags = {q for *_, q in got}
    assert flags == {0, 1}
