"""Time-series similarity over event streams (X-6, PAPERS.md:6 pattern).

Z-normalized sliding windows per entity, compared against a reference
pattern by Pearson correlation — window assembly via frame functions,
numerics via JVM array expressions. The same transform applies to a
Structured Streaming source (the window frame becomes a watermark-bounded
state store); batch form here is the oracle-testable body.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_active911_spark.io import read_table
from etl_active911_spark.plans.registry import query

WINDOW = 8

# Deterministic reference pattern (one period of a sine) — the "query" in
# pattern-matching terms; literal on both engines.
PATTERN = [math.sin(2 * math.pi * i / WINDOW) for i in range(WINDOW)]

_PAT_SD = math.sqrt(sum(p * p for p in PATTERN) / WINDOW)

# DuckDB oracle (round 2 — the flat-window rewrite made this fully
# SQL-expressible): the dot product is written term-by-term in the SAME
# left-associative oldest-first order as the Spark loop below, with
# ``repr()`` float literals (shortest round-trip → identical doubles), so
# dotp is bit-identical across engines; mean/ssq come from each engine's
# sliding frame (segment-tree vs running sums → last-bit differences) which
# ROUND(corr, 6) absorbs. Output carries no timestamp (CLAUDE.md rule 3).
_DOTP_SQL = " + ".join(
    f"(LAG(value, {lag}) OVER wo) * ({PATTERN[WINDOW - 1 - lag]!r})"
    if lag else f"value * ({PATTERN[WINDOW - 1]!r})"
    for lag in range(WINDOW - 1, -1, -1)
)
_PATTERN_ORACLE = f"""
    WITH w AS (
        SELECT user_id, event_id,
               AVG(value) OVER wf AS mean,
               SUM(value * value) OVER wf AS ssq,
               COUNT(*) OVER wf AS n,
               {_DOTP_SQL} AS dotp
        FROM events
        WINDOW wo AS (PARTITION BY user_id ORDER BY ts, event_id),
               wf AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN {WINDOW - 1} PRECEDING AND CURRENT ROW)
    ),
    c AS (
        SELECT user_id, event_id, n,
               CASE WHEN sqrt(ssq / {WINDOW} - mean * mean) > 0
                    THEN dotp / ({WINDOW} * sqrt(ssq / {WINDOW} - mean * mean)
                                 * ({_PAT_SD!r}))
               END AS corr
        FROM w
    )
    SELECT user_id, event_id, ROUND(corr, 6) AS corr
    FROM c WHERE n = {WINDOW} AND ABS(corr) >= 0.6
    """


@query("x6_ts_pattern_match", _PATTERN_ORACLE)
def x6_ts_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6: per-user sliding windows of the last WINDOW values (rows frame
    ordered by time), z-normalized, correlated with PATTERN; emits windows
    with |r| ≥ 0.6. One shuffle (partitionBy user_id), then pure array math.
    """
    return pattern_match_batch(read_table(spark, sf_dir, "events"))


def pattern_match_batch(events: DataFrame) -> DataFrame:
    """Batch body of the X-6 matcher (streaming counterpart:
    streaming/pattern.py — parity asserted in tests).

    Flat whole-stage-codegen numerics (round 2): against a FIXED pattern,
    Pearson r needs no window array at all —
    ``Σ xᵢpᵢ`` unrolls to WINDOW lag() terms (Σp ≈ 0 makes centering a
    no-op up to 1e-14) and ``sd`` comes from the frame's sum/sum-of-squares.
    Round 1 built a collect_list array per row and ran interpreted
    transform/aggregate lambdas over it — bounded (8 elements) but still
    the priciest per-row path in the bench (VERDICT r01 "done (watch)").
    Term order matches streaming/pattern.py's Python sums exactly
    (oldest-first, same associativity), so batch and stream stay
    bit-identical."""
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = wo.rowsBetween(-(WINDOW - 1), Window.currentRow)
    base = events.select("user_id", "ts", "event_id", "value")

    mean = F.avg("value").over(wf)
    ssq = F.sum(F.col("value") * F.col("value")).over(wf)
    n = F.count(F.lit(1)).over(wf)
    sd = F.sqrt(ssq / WINDOW - mean * mean)
    # oldest-first term order: lag(W-1) holds window index 0
    dotp = None
    for lag in range(WINDOW - 1, -1, -1):
        term = F.lag("value", lag).over(wo) * F.lit(PATTERN[WINDOW - 1 - lag])
        dotp = term if dotp is None else dotp + term
    r = dotp / (F.lit(WINDOW) * sd * F.lit(_PAT_SD))
    return (
        base.withColumn("__n", n)
        .withColumn("corr", F.when(sd > 0, r))
        .filter((F.col("__n") == WINDOW) & (F.abs(F.col("corr")) >= 0.6))
        .select("user_id", "event_id", F.round("corr", 6).alias("corr"))
    )


@query(
    "x6_ts_znorm_stats",
    """
    WITH w AS (
        SELECT user_id, event_id, value,
               AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS win_mean,
               COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS win_n
        FROM events
    )
    SELECT user_id, event_id,
           ROUND(win_mean, 6) AS win_mean,
           ROUND(value - win_mean, 6) AS deviation
    FROM w WHERE win_n = 8
    """,
)
def x6_ts_znorm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6 (oracle slice): rolling mean/deviation over the same rows frame —
    validates the window mechanics the pattern matcher builds on."""
    events = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(WINDOW - 1), Window.currentRow)
    )
    return (
        events.select(
            "user_id",
            "event_id",
            "value",
            F.avg("value").over(w).alias("win_mean"),
            F.count(F.lit(1)).over(w).alias("win_n"),
        )
        .filter(F.col("win_n") == WINDOW)
        .select(
            "user_id",
            "event_id",
            F.round("win_mean", 6).alias("win_mean"),
            F.round(F.col("value") - F.col("win_mean"), 6).alias("deviation"),
        )
    )
