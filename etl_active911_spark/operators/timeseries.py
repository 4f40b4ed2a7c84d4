"""Time-series similarity over event streams (X-6, PAPERS.md:6 pattern).

Z-normalized sliding windows per entity, compared against a reference
pattern by Pearson correlation — window assembly via frame functions,
numerics via JVM array expressions. The same transform applies to a
Structured Streaming source (the window frame becomes a watermark-bounded
state store); batch form here is the oracle-testable body.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_active911_spark.io import read_table, spread
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
    FROM c WHERE n = {WINDOW} AND ABS(ROUND(corr, 6)) >= 0.6
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
    # threshold on the ROUNDED corr (canonical policy 4 — plans/canonical.py):
    # mean/ssq differ in the last bit across engines, so a raw-corr cutoff
    # within 1 ulp of 0.6 could flip row membership between Spark and DuckDB
    return (
        base.withColumn("__n", n)
        .withColumn("corr", F.round(F.when(sd > 0, r), 6))
        .filter((F.col("__n") == WINDOW) & (F.abs(F.col("corr")) >= 0.6))
        .select("user_id", "event_id", "corr")
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


@query(
    "x6_ts_outliers",
    """
    WITH s AS (
        SELECT user_id,
               AVG(value) AS mu,
               COUNT(*) AS n,
               SUM(value * value) AS ssq
        FROM events GROUP BY user_id
    ),
    z AS (
        SELECT e.user_id, e.event_id, e.value,
               ROUND((e.value - s.mu)
                     / sqrt(s.ssq / s.n - s.mu * s.mu), 6) AS zscore
        FROM events e JOIN s ON e.user_id = s.user_id
        WHERE s.n >= 2 AND sqrt(s.ssq / s.n - s.mu * s.mu) > 1e-6
    )
    SELECT user_id, event_id, ROUND(value, 6) AS value, zscore
    FROM z WHERE ABS(zscore) >= 2.5
    """,
)
def x6_ts_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6: per-entity outlier flagging — |z| ≥ 2.5 against the entity's
    own mean/sd (population form, same one-pass sum/ssq shape as the
    pattern matcher so the sd guard matches rule-of-thumb 1e-6 float
    hygiene). One keyed aggregate + a broadcast-back join; the streaming
    analogue is the Welford state in streaming/stateful.py. Thresholding
    happens on the ROUNDED z (canonical policy 4)."""
    events = read_table(spark, sf_dir, "events")
    s = events.groupBy("user_id").agg(
        F.avg("value").alias("mu"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value") * F.col("value")).alias("ssq"),
    )
    sd = F.sqrt(F.col("ssq") / F.col("n") - F.col("mu") * F.col("mu"))
    return (
        events.join(s, "user_id")
        .filter((F.col("n") >= 2) & (sd > 1e-6))
        .withColumn("zscore", F.round((F.col("value") - F.col("mu")) / sd, 6))
        .filter(F.abs(F.col("zscore")) >= 2.5)
        .select("user_id", "event_id", F.round("value", 6).alias("value"), "zscore")
    )


# ---------------------------------------------------------------------------
# X-6c: dynamic time warping against the reference pattern
# ---------------------------------------------------------------------------


def _dtw_oracle() -> str:
    """Fully-unrolled 8×8 DTW dynamic program in SQL: one CTE per pattern
    row, lateral column aliases carry the within-row recurrence. Addition
    is the only rounding operation and is written in the same (cost +
    min) order as the numpy DP, so cell values are bit-identical."""
    p = [repr(x) for x in PATTERN]
    # window columns v0..v7 (v0 = oldest) via LAG
    vdefs = ", ".join(
        f"LAG(value, {WINDOW - 1 - i}) OVER wo AS v{i}" if i < WINDOW - 1 else f"value AS v{i}"
        for i in range(WINDOW)
    )
    stages = []
    # row 0: D(i,0) = |v_i - p_0| cumulative down the window axis
    row0 = [f"ABS(v0 - ({p[0]})) AS d0_0"]
    for i in range(1, WINDOW):
        row0.append(f"d{i - 1}_0 + ABS(v{i} - ({p[0]})) AS d{i}_0")
    stages.append("r0 AS (SELECT *, " + ", ".join(row0) + " FROM cells)")
    for j in range(1, WINDOW):
        row = [f"d0_{j - 1} + ABS(v0 - ({p[j]})) AS d0_{j}"]
        for i in range(1, WINDOW):
            row.append(
                f"ABS(v{i} - ({p[j]})) + LEAST(d{i - 1}_{j}, d{i}_{j - 1}, d{i - 1}_{j - 1}) "
                f"AS d{i}_{j}"
            )
        stages.append(f"r{j} AS (SELECT *, " + ", ".join(row) + f" FROM r{j - 1})")
    return f"""
    WITH cells AS (
        SELECT user_id, event_id, {vdefs},
               COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN {WINDOW - 1} PRECEDING AND CURRENT ROW) AS n
        FROM events
        WINDOW wo AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    {", ".join(stages)}
    SELECT user_id, event_id, ROUND(d{WINDOW - 1}_{WINDOW - 1}, 6) AS dtw
    FROM r{WINDOW - 1} WHERE n = {WINDOW}
    """


# max home rows per DTW task: one pandas group holds ≤ DTW_CHUNK + WINDOW - 1
# rows no matter how long a user's series grows (VERDICT r02 "What's wrong #3":
# grouping by bare user_id pulled years of one user's events into a single
# task — unbounded memory + skew magnet at 100×)
DTW_CHUNK = 4096


def dtw_batch(events: DataFrame, chunk: int = DTW_CHUNK) -> DataFrame:
    """Chunked DTW body: rows get a per-user sequence number, each task
    processes one (user_id, floor(seq/chunk)) slice, and the last
    WINDOW-1 rows of every slice are DUPLICATED into the next slice so
    each sliding window is computable locally. A window is emitted only by
    the chunk that owns its END row, so the overlap introduces no
    duplicate output rows and the union over chunks is exactly the
    per-user result. Window values are independent of which other windows
    share the numpy batch (the DP vectorization is elementwise across
    windows), so chunking cannot perturb a single bit of the output."""
    import numpy as np
    import pandas as pd

    if chunk < WINDOW:
        raise ValueError(f"chunk ({chunk}) must be >= WINDOW ({WINDOW}): "
                         "a window may never span more than two chunks")
    pat = np.array(PATTERN)
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    base = events.select("user_id", "ts", "event_id", "value").withColumn(
        "seq", F.row_number().over(wo) - 1
    )
    home = F.floor(F.col("seq") / chunk)
    feeds = F.when(
        F.col("seq") % chunk >= chunk - (WINDOW - 1), F.array(home, home + 1)
    ).otherwise(F.array(home))

    def dtw_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("seq")
        c = int(pdf["chunk"].iloc[0])
        vals = pdf["value"].to_numpy(dtype=np.float64)
        seqs = pdf["seq"].to_numpy()
        if len(vals) < WINDOW:
            return pd.DataFrame({"user_id": [], "event_id": [], "dtw": []}).astype(
                {"user_id": "int64", "event_id": "int64", "dtw": "float64"}
            )
        Wn = np.lib.stride_tricks.sliding_window_view(vals, WINDOW)  # (nw, 8)
        # DP over all windows at once; D[i] = column i of the current row
        D = np.empty((WINDOW, len(Wn)))
        D[0] = np.abs(Wn[:, 0] - pat[0])
        for i in range(1, WINDOW):
            D[i] = D[i - 1] + np.abs(Wn[:, i] - pat[0])
        for j in range(1, WINDOW):
            prev = D.copy()
            D[0] = prev[0] + np.abs(Wn[:, 0] - pat[j])
            for i in range(1, WINDOW):
                # same term order as the SQL: cost + LEAST(up, left, diag)
                D[i] = np.abs(Wn[:, i] - pat[j]) + np.minimum(
                    prev[i], np.minimum(D[i - 1], prev[i - 1])
                )
        # emit only windows whose END row is a home row of this chunk
        # (overlap-fed windows belong to — and are emitted by — this chunk;
        # the copied rows' own windows end in the NEXT chunk's home range)
        ends = seqs[WINDOW - 1 :]
        own = ends // chunk == c
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"].iloc[WINDOW - 1 :].to_numpy()[own],
                "event_id": pdf["event_id"].iloc[WINDOW - 1 :].to_numpy()[own],
                "dtw": np.round(D[WINDOW - 1], 6)[own],
            }
        )

    return (
        base.withColumn("chunk", F.explode(feeds))
        .groupBy("user_id", "chunk")
        .applyInPandas(dtw_chunk, "user_id long, event_id long, dtw double")
    )


def dtw_stream(events: DataFrame) -> DataFrame:
    """Per-BATCH DTW over the user-partitioned ordered stream — the r15
    optimization of ``dtw_batch``'s per-GROUP shape (guide §4.1/§2.4).

    ``dtw_batch`` grouped by (user_id, seq-chunk) and called Python once
    per group: at sf0.1 that is 1500 single-chunk groups, and the fixed
    per-group Arrow/pandas round-trip dominated (~3.3 of 3.7 s noop; the
    DP itself is elementwise across windows and costs almost nothing).
    Here the stream is hash-partitioned by user_id ONCE, sorted within
    partitions by (user_id, ts, event_id), and ``mapInPandas`` runs the
    same vectorized DP per Arrow BATCH (~10k rows), carrying the last
    WINDOW-1 rows between batches so windows spanning a batch boundary
    are computed by the batch that owns their END row. Only the three
    columns Python needs cross the boundary (guide §2.3: the timestamp
    serves the JVM-side sort and is projected away).

    Bit-identity with ``dtw_batch`` (pinned in test_scale_layout): the DP
    is elementwise across windows, so batch composition cannot perturb a
    value; a window is valid iff its 8 rows are consecutive events of one
    user, which inside a (user_id, ts, event_id)-sorted partition is
    exactly ``user[k] == user[k+WINDOW-1]``; every valid window is owned
    by exactly one batch (the one holding its end row), so the output SET
    matches the per-group union."""
    import numpy as np
    import pandas as pd

    pat = np.array(PATTERN)
    empty = pd.DataFrame(
        {"user_id": [], "event_id": [], "dtw": []}
    ).astype({"user_id": "int64", "event_id": "int64", "dtw": "float64"})

    def dp_tail(wins: "np.ndarray") -> "np.ndarray":
        # identical recurrence + term order as dtw_batch's dtw_chunk
        D = np.empty((WINDOW, len(wins)))
        D[0] = np.abs(wins[:, 0] - pat[0])
        for i in range(1, WINDOW):
            D[i] = D[i - 1] + np.abs(wins[:, i] - pat[0])
        for j in range(1, WINDOW):
            prev = D.copy()
            D[0] = prev[0] + np.abs(wins[:, 0] - pat[j])
            for i in range(1, WINDOW):
                D[i] = np.abs(wins[:, i] - pat[j]) + np.minimum(
                    prev[i], np.minimum(D[i - 1], prev[i - 1])
                )
        return np.round(D[WINDOW - 1], 6)

    def run(batches):
        cu = ce = cv = None  # last WINDOW-1 rows carried across batches
        for pdf in batches:
            if len(pdf) == 0:
                continue
            u = pdf["user_id"].to_numpy(np.int64)
            e = pdf["event_id"].to_numpy(np.int64)
            v = pdf["value"].to_numpy(np.float64)
            if cu is not None:
                u = np.concatenate([cu, u])
                e = np.concatenate([ce, e])
                v = np.concatenate([cv, v])
            cu, ce, cv = u[-(WINDOW - 1):], e[-(WINDOW - 1):], v[-(WINDOW - 1):]
            if len(v) < WINDOW:
                continue
            wins = np.lib.stride_tricks.sliding_window_view(v, WINDOW)
            # valid = all WINDOW rows belong to one user (contiguous sort
            # ⇒ consecutive events). End ownership is structural: carry
            # holds ≤ WINDOW-1 rows, so every window end index (≥ WINDOW-1
            # ≥ carry length) is a row of THIS batch — windows ending in
            # carried rows were emitted by the previous batch.
            ends = np.arange(WINDOW - 1, len(v))
            keep = u[ends - (WINDOW - 1)] == u[ends]
            if not keep.any():
                continue
            yield pd.DataFrame(
                {
                    "user_id": u[ends][keep],
                    "event_id": e[ends][keep],
                    "dtw": dp_tail(wins)[keep],
                }
            )
        yield empty  # schema anchor for empty partitions

    ordered = (
        spread(events.select("user_id", "ts", "event_id", "value"), "user_id")
        .sortWithinPartitions("user_id", "ts", "event_id")
        .select("user_id", "event_id", "value")
    )
    return ordered.mapInPandas(run, "user_id long, event_id long, dtw double")


@query("x6_ts_dtw", _dtw_oracle())
def x6_ts_dtw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6: sliding-window dynamic time warping distance against PATTERN —
    the alignment-tolerant similarity the Pearson matcher can't express
    (it assumes index-aligned windows). Arrow batches run the DP
    vectorized ACROSS windows (numpy sliding_window_view; 64 cell steps,
    each an elementwise op over every window at once — no per-window
    Python loop). min() is exact in floats and addition order matches the
    SQL oracle's unrolled recurrence term-for-term, so the driver's hash
    check holds bit-for-bit despite the Python/SQL split. r15: runs as
    ``dtw_stream`` (one exchange, per-batch Python with a WINDOW-1 carry)
    instead of per-group ``dtw_batch`` — same values, pinned equal in
    test_scale_layout."""
    return dtw_stream(read_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# X-6e: exponentially weighted moving average (bounded-window EWMA)
# ---------------------------------------------------------------------------

_EWMA_ALPHA_POWERS = [0.5**k for k in range(8)]  # exactly representable


def _ewma_oracle() -> str:
    lags = ",\n               ".join(
        f"LAG(value, {k}) OVER w AS v{k}" for k in range(1, 8)
    )
    num = " + ".join(
        ["value"]
        + [f"COALESCE({_EWMA_ALPHA_POWERS[k]!r} * v{k}, 0.0)" for k in range(1, 8)]
    )
    den = " + ".join(
        ["1.0"]
        + [
            f"(CASE WHEN v{k} IS NULL THEN 0.0 ELSE {_EWMA_ALPHA_POWERS[k]!r} END)"
            for k in range(1, 8)
        ]
    )
    return f"""
    WITH lagged AS (
        SELECT user_id, event_id, value,
               {lags}
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id,
           ROUND(value, 6) AS value,
           ROUND(({num}) / ({den}), 6) AS ewma
    FROM lagged
    """


@query("x6_ts_ewma", _ewma_oracle())
def x6_ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6: bounded-window EWMA (half-life weights 0.5^k over the last 8
    observations, partial windows renormalized over the terms present) —
    the smoothing primitive behind anomaly baselines. A true infinite
    EWMA is a sequential recurrence (bad distributed fit); the 8-term
    truncation (residual mass 0.5^8 < 0.4%) makes it a PER-ROW expression
    over 7 lag columns: one shuffle on user_id, then pure codegen — no
    state carried across rows, so it parallelizes like any window query
    at 100 TB. The weighted sum is written left-to-right identically in
    both engines (exactly-representable powers of 0.5), so values
    bit-match before the ROUND(6)."""
    events = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = events.select(
        "user_id",
        "event_id",
        "value",
        *[F.lag("value", k).over(w).alias(f"v{k}") for k in range(1, 8)],
    )
    num = F.col("value")
    for k in range(1, 8):
        num = num + F.coalesce(F.lit(_EWMA_ALPHA_POWERS[k]) * F.col(f"v{k}"), F.lit(0.0))
    den = F.lit(1.0)
    for k in range(1, 8):
        den = den + F.when(F.col(f"v{k}").isNull(), 0.0).otherwise(
            F.lit(_EWMA_ALPHA_POWERS[k])
        )
    return lagged.select(
        "user_id",
        "event_id",
        F.round("value", 6).alias("value"),
        F.round(num / den, 6).alias("ewma"),
    )


@query(
    "x6_ts_outliers_robust",
    """
    WITH med AS (
        SELECT user_id, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY user_id
    ),
    j AS (
        SELECT e.user_id, e.event_id, e.value, m.med,
               ABS(e.value - m.med) AS adev
        FROM events e JOIN med m USING (user_id)
    ),
    mad AS (
        SELECT user_id, quantile_cont(adev, 0.5) AS mad FROM j GROUP BY user_id
    ),
    r AS (
        SELECT j.user_id, j.event_id, j.value,
               ROUND((j.value - j.med) / (mad.mad * 1.4826), 6) AS robust_z
        FROM j JOIN mad USING (user_id)
        WHERE mad.mad > 1e-6
    )
    SELECT user_id, event_id, ROUND(value, 6) AS value, robust_z
    FROM r WHERE ABS(robust_z) >= 3.5
    """,
)
def x6_ts_outliers_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6e: MEDIAN/MAD outlier flagging — the breakdown-resistant
    companion to x6_ts_outliers' mean/sd z-score (a single extreme value
    inflates sd and masks itself; the median absolute deviation has a 50%
    breakdown point). robust_z = (x − median) / (MAD · 1.4826), flagged
    at |z| ≥ 3.5 on the ROUNDED score (canonical policy 4).

    Exactness: Spark ``percentile`` and DuckDB ``quantile_cont`` share
    the same linear-interpolation definition (pos = p·(n−1)), so the two
    engines agree bit-for-bit. Shape: two keyed aggregates with
    broadcast-back joins. At true 100 TB swap the exact percentile for
    ``approx_percentile`` (t-digest) — same plan, sketch-bounded memory —
    and the oracle degrades to the rows-only check like the other
    sketches."""
    events = read_table(spark, sf_dir, "events")
    med = events.groupBy("user_id").agg(F.expr("percentile(value, 0.5)").alias("med"))
    j = events.join(med, "user_id").withColumn("adev", F.abs(F.col("value") - F.col("med")))
    mad = j.groupBy("user_id").agg(F.expr("percentile(adev, 0.5)").alias("mad"))
    return (
        j.join(mad, "user_id")
        .filter(F.col("mad") > 1e-6)
        .withColumn(
            "robust_z",
            F.round((F.col("value") - F.col("med")) / (F.col("mad") * 1.4826), 6),
        )
        .filter(F.abs(F.col("robust_z")) >= 3.5)
        .select("user_id", "event_id", F.round("value", 6).alias("value"), "robust_z")
    )


DECOMP_HALF = 2  # centered moving-average half-width (5-row trend window)
DECOMP_SPAN = 2 * DECOMP_HALF + 1
DECOMP_PERIOD = 4  # seasonal phase period
_DECOMP_SCALE = 1000  # value quantization: 3dp fixed-point


@query(
    "x6_ts_decompose",
    f"""
    WITH base AS (
        SELECT user_id, event_id,
               CAST(ROUND(value * {_DECOMP_SCALE}) AS BIGINT) AS sv,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ),
    tr AS (
        SELECT user_id, event_id, sv, rn,
               SUM(sv) OVER w5 AS tn,
               COUNT(*) OVER w5 AS n
        FROM base
        WINDOW w5 AS (PARTITION BY user_id ORDER BY rn
                      ROWS BETWEEN {DECOMP_HALF} PRECEDING
                               AND {DECOMP_HALF} FOLLOWING)
    ),
    det AS (
        SELECT user_id, event_id, rn, tn,
               sv * {DECOMP_SPAN} - tn AS d_num
        FROM tr WHERE n = {DECOMP_SPAN}
    ),
    sea AS (
        SELECT user_id, event_id, tn, d_num,
               SUM(d_num) OVER wp AS s_num,
               COUNT(*) OVER wp AS m
        FROM det
        WINDOW wp AS (PARTITION BY user_id, rn % {DECOMP_PERIOD})
    )
    SELECT user_id, event_id,
           ROUND(CAST(tn AS DOUBLE) / {DECOMP_SPAN * _DECOMP_SCALE}, 6) AS trend,
           ROUND(CAST(s_num AS DOUBLE) / ({DECOMP_SPAN * _DECOMP_SCALE} * m), 6) AS seasonal,
           ROUND(CAST(d_num * m - s_num AS DOUBLE)
                 / ({DECOMP_SPAN * _DECOMP_SCALE} * m), 6) AS residual
    FROM sea
    """,
)
def x6_ts_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6 (r5): classical additive seasonal decomposition per user
    series — trend = centered 5-row moving average (complete windows
    only, the standard edge rule), seasonal = per-phase (row index mod
    DECOMP_PERIOD) mean of the detrended values, residual = value −
    trend − seasonal.

    Numerics (the hard-won part): a naive chain of float AVGs is
    order-dependent per engine and — because the fixture values are 3dp
    decimals divided by 5 — lands EXACTLY on rounding boundaries
    (measured: 4-10 flipped rows per 10k at both 4dp and 6dp). So the
    whole pipeline runs in 3dp FIXED-POINT integers: quantized value sv,
    trend numerator Σsv (exact BIGINT window sum), detrended numerator
    sv·5 − Σsv, seasonal numerator a per-phase BIGINT sum, and each
    output is ONE terminal IEEE division of identical integers —
    bit-identical across engines by construction (rule 11 applied to
    aggregates). Shape: one shuffle on user_id reused by the row-number
    and trend windows + one on (user_id, phase); magnitudes stay ≤ ~2e10
    ≪ 2⁶³."""
    events = read_table(spark, sf_dir, "events")
    w_rn = Window.partitionBy("user_id").orderBy("ts", "event_id")
    base = events.select(
        "user_id",
        "event_id",
        F.round(F.col("value") * _DECOMP_SCALE).cast("long").alias("sv"),
        F.row_number().over(w_rn).alias("rn"),
    )
    w5 = (
        Window.partitionBy("user_id")
        .orderBy("rn")
        .rowsBetween(-DECOMP_HALF, DECOMP_HALF)
    )
    tr = base.select(
        "user_id",
        "event_id",
        "sv",
        "rn",
        F.sum("sv").over(w5).alias("tn"),
        F.count(F.lit(1)).over(w5).alias("n"),
    )
    det = tr.filter(F.col("n") == DECOMP_SPAN).select(
        "user_id",
        "event_id",
        "rn",
        "tn",
        (F.col("sv") * DECOMP_SPAN - F.col("tn")).alias("d_num"),
    )
    wp = Window.partitionBy("user_id", F.col("rn") % DECOMP_PERIOD)
    sea = det.select(
        "user_id",
        "event_id",
        "tn",
        "d_num",
        F.sum("d_num").over(wp).alias("s_num"),
        F.count(F.lit(1)).over(wp).alias("m"),
    )
    den = DECOMP_SPAN * _DECOMP_SCALE
    return sea.select(
        "user_id",
        "event_id",
        F.round(F.col("tn").cast("double") / den, 6).alias("trend"),
        F.round(F.col("s_num").cast("double") / (den * F.col("m")), 6).alias("seasonal"),
        F.round(
            (F.col("d_num") * F.col("m") - F.col("s_num")).cast("double")
            / (den * F.col("m")),
            6,
        ).alias("residual"),
    )


@query(
    "x6_ts_changepoint",
    f"""
    WITH base AS (
        SELECT user_id, event_id,
               CAST(ROUND(value * {_DECOMP_SCALE}) AS BIGINT) AS sv,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ),
    tot AS (
        SELECT user_id, SUM(sv) AS total_sv, COUNT(*) AS cnt
        FROM base GROUP BY user_id
    ),
    pref AS (
        SELECT b.user_id, b.event_id, b.rn, t.cnt,
               SUM(b.sv) OVER (PARTITION BY b.user_id ORDER BY b.rn
                               ROWS UNBOUNDED PRECEDING) * t.cnt
                 - b.rn * t.total_sv AS cusum_num
        FROM base b JOIN tot t ON t.user_id = b.user_id
    ),
    picked AS (
        SELECT user_id, event_id, rn, cnt, cusum_num,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ABS(cusum_num) DESC, rn) AS pk
        FROM pref WHERE cnt >= 4
    )
    SELECT user_id, event_id,
           CAST(rn AS BIGINT) AS change_idx,
           ROUND(CAST(cusum_num AS DOUBLE) / ({_DECOMP_SCALE} * cnt), 6) AS cusum
    FROM picked WHERE pk = 1
    """,
)
def x6_ts_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6 (r5): CUSUM change-point estimate per user series — the index
    maximizing |Σ_{{i≤k}}(vᵢ − mean)|, the classical single-change-point
    locator (a mean shift at k makes the cumulative deviation peak
    there). Complements the POINT anomaly detectors (z-score, robust
    MAD): those flag single outliers, CUSUM finds where the LEVEL moved.

    Same exact-arithmetic discipline as x6_ts_decompose: values in 3dp
    fixed-point, cusum numerator = prefix·n − k·total as pure BIGINT
    (running-frame integer sums are exact AND order-deterministic),
    argmax on the integer numerator with an rn tie-break, ONE terminal
    IEEE division for display — bit-identical across engines. Shape:
    one shuffle on user_id shared by the row-number, prefix and argmax
    windows, plus a tiny per-user aggregate broadcast back."""
    events = read_table(spark, sf_dir, "events")
    w_rn = Window.partitionBy("user_id").orderBy("ts", "event_id")
    base = events.select(
        "user_id",
        "event_id",
        F.round(F.col("value") * _DECOMP_SCALE).cast("long").alias("sv"),
        F.row_number().over(w_rn).alias("rn"),
    )
    tot = base.groupBy("user_id").agg(
        F.sum("sv").alias("total_sv"), F.count(F.lit(1)).alias("cnt")
    )
    w_pref = (
        Window.partitionBy("user_id").orderBy("rn").rowsBetween(Window.unboundedPreceding, 0)
    )
    pref = (
        base.join(tot, "user_id")
        .withColumn(
            "cusum_num",
            F.sum("sv").over(w_pref) * F.col("cnt") - F.col("rn") * F.col("total_sv"),
        )
        .filter(F.col("cnt") >= 4)
    )
    w_pick = Window.partitionBy("user_id").orderBy(
        F.abs(F.col("cusum_num")).desc(), F.col("rn")
    )
    return (
        pref.withColumn("pk", F.row_number().over(w_pick))
        .filter(F.col("pk") == 1)
        .select(
            "user_id",
            "event_id",
            F.col("rn").cast("bigint").alias("change_idx"),
            F.round(
                F.col("cusum_num").cast("double") / (_DECOMP_SCALE * F.col("cnt")), 6
            ).alias("cusum"),
        )
    )


# ---------------------------------------------------------------------------
# X-6i (r6): seasonal-naive forecast + MASE evaluation
# ---------------------------------------------------------------------------

FC_PERIOD = 4  # seasonal-naive lag
FC_HOLDOUT = 4  # last rows per user scored as the forecast horizon


@query(
    "x6_forecast_eval",
    f"""
    WITH base AS (
        SELECT user_id,
               CAST(ROUND(value * {_DECOMP_SCALE}) AS BIGINT) AS sv,
               ROW_NUMBER() OVER w AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS n,
               LAG(CAST(ROUND(value * {_DECOMP_SCALE}) AS BIGINT), {FC_PERIOD}) OVER w AS sn,
               LAG(CAST(ROUND(value * {_DECOMP_SCALE}) AS BIGINT), 1) OVER w AS prev
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    agg AS (
        SELECT user_id, MAX(n) AS n,
               SUM(CASE WHEN rn > n - {FC_HOLDOUT} THEN ABS(sv - sn) END) AS e_sum,
               SUM(CASE WHEN rn BETWEEN 2 AND n - {FC_HOLDOUT} THEN ABS(sv - prev) END) AS d_sum,
               SUM(CASE WHEN rn BETWEEN 2 AND n - {FC_HOLDOUT} THEN 1 ELSE 0 END) AS d_cnt
        FROM base
        GROUP BY user_id
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_obs,
           ROUND(CAST(e_sum AS DOUBLE) / ({FC_HOLDOUT} * {_DECOMP_SCALE}), 6) AS mae_fc,
           ROUND(CAST(e_sum * d_cnt AS DOUBLE) / ({FC_HOLDOUT} * d_sum), 6) AS mase
    FROM agg
    WHERE n >= {FC_PERIOD + FC_HOLDOUT + 2} AND d_sum > 0
    """,
)
def x6_forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6i (r6): SEASONAL-NAIVE forecast + MASE evaluation per user
    series — the baseline every forecasting pipeline must report:
    ŷ_t = y_{t−P} (period P=4), scored on the last
    H=4 observations per user with MASE (Hyndman & Koehler,
    "Another look at measures of forecast accuracy", IJF 2006 — public
    literature): holdout MAE scaled by the in-sample MAE of the 1-step
    naive, so the score is unit-free and comparable across users.

    Numerics follow the x6_ts_decompose fixed-point rule (CLAUDE.md 11):
    values quantize to 3dp BIGINTs, both MAEs stay INTEGER sums
    (Σ|sv_t − sv_{t−P}| over the horizon, Σ|sv_t − sv_{t−1}| over the
    train span), and each output is ONE terminal IEEE division of
    identical integers — MASE = (Σe · n_d) / (H · Σd) exactly, in both
    engines. Shape: ONE shuffle on user_id (row-number + both lags + the
    count share the window spec), then a keyed aggregate; no horizon
    materialization, no per-user collect."""
    events = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sv = F.round(F.col("value") * _DECOMP_SCALE).cast("long")
    base = events.select(
        "user_id",
        sv.alias("sv"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n"),
        F.lag(sv, FC_PERIOD).over(w).alias("sn"),
        F.lag(sv, 1).over(w).alias("prev"),
    )
    hold = F.col("rn") > F.col("n") - FC_HOLDOUT
    train = (F.col("rn") >= 2) & (F.col("rn") <= F.col("n") - FC_HOLDOUT)
    agg = base.groupBy("user_id").agg(
        F.max("n").alias("n"),
        F.sum(F.when(hold, F.abs(F.col("sv") - F.col("sn")))).alias("e_sum"),
        F.sum(F.when(train, F.abs(F.col("sv") - F.col("prev")))).alias("d_sum"),
        F.sum(F.when(train, 1).otherwise(0)).alias("d_cnt"),
    )
    return (
        agg.filter((F.col("n") >= FC_PERIOD + FC_HOLDOUT + 2) & (F.col("d_sum") > 0))
        .select(
            "user_id",
            F.col("n").cast("bigint").alias("n_obs"),
            F.round(
                F.col("e_sum").cast("double") / (FC_HOLDOUT * _DECOMP_SCALE), 6
            ).alias("mae_fc"),
            F.round(
                (F.col("e_sum") * F.col("d_cnt")).cast("double")
                / (FC_HOLDOUT * F.col("d_sum")),
                6,
            ).alias("mase"),
        )
    )


ACF_LAGS = (1, 2, 3)


def _acf_oracle() -> str:
    legs = "\n        UNION ALL\n".join(
        f"""        SELECT user_id, {k} AS lag, sv AS x,
               LAG(sv, {k}) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS y
        FROM base"""
        for k in ACF_LAGS
    )
    return f"""
    WITH base AS (
        SELECT user_id, ts, event_id,
               CAST(ROUND(value * {_DECOMP_SCALE}) AS BIGINT) AS sv
        FROM events
    ),
    legs AS (
{legs}
    ),
    sums AS (
        SELECT user_id, lag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM legs WHERE y IS NOT NULL
        GROUP BY user_id, lag
    )
    SELECT user_id, CAST(lag AS INT) AS lag, n AS n_pairs,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS acf
    FROM sums
    WHERE n >= 3 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    """


@query("x6_ts_acf", _acf_oracle())
def x6_ts_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6 (r6): AUTOCORRELATION function per user series at lags 1-3 —
    the seasonality/memory diagnostic that tells an operator which lag
    the seasonal-naive forecast (x6_forecast_eval) should use and whether
    x6_ts_decompose's period is real.

    Numerics: Pearson via the COMPUTATIONAL formula over 3dp FIXED-POINT
    integers — every inner sum (Σx, Σy, Σx², Σy², Σxy) is an exact
    BIGINT, so aggregation ORDER cannot perturb them (the usual float-SUM
    nondeterminism is structurally absent); the one float expression is
    the terminal (n·Σxy − ΣxΣy)/√(...) with identical IEEE op order in
    both engines, rounded 6dp (rule 11 applied to correlations).
    Magnitudes: n·Σxy ≤ 2e14 ≪ 2⁶³. Shape: ONE shuffle on user_id
    (row-order window computes all three lags), a lag-exploded stack
    (3× rows, narrow), one keyed aggregate."""
    events = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sv = F.round(F.col("value") * _DECOMP_SCALE).cast("long")
    base = events.select("user_id", sv.alias("x"), *[
        F.lag(sv, k).over(w).alias(f"y{k}") for k in ACF_LAGS
    ])
    stacked = base.select(
        "user_id",
        "x",
        F.explode(
            F.array(*[
                F.struct(F.lit(k).alias("lag"), F.col(f"y{k}").alias("y"))
                for k in ACF_LAGS
            ])
        ).alias("s"),
    ).select("user_id", F.col("s.lag").alias("lag"), "x", F.col("s.y").alias("y"))
    sums = (
        stacked.filter(F.col("y").isNotNull())
        .groupBy("user_id", "lag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("x").cast("bigint").alias("sx"),
            F.sum("y").cast("bigint").alias("sy"),
            F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
            F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
            F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        )
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    dy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    return (
        sums.filter((F.col("n") >= 3) & (dx > 0) & (dy > 0))
        .select(
            "user_id",
            F.col("lag").cast("int").alias("lag"),
            F.col("n").alias("n_pairs"),
            F.round(num / F.sqrt(dx.cast("double") * dy.cast("double")), 6).alias("acf"),
        )
    )


# ---------------------------------------------------------------------------
# X-6 (r7): matrix profile (motif discovery)
# ---------------------------------------------------------------------------


def _mp_windows_sql() -> str:
    return f"""
    b AS (
        SELECT user_id, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
               list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN {WINDOW - 1} PRECEDING AND CURRENT ROW) AS a,
               AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN {WINDOW - 1} PRECEDING AND CURRENT ROW) AS m,
               SUM(value * value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN {WINDOW - 1} PRECEDING AND CURRENT ROW) AS ssq,
               COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN {WINDOW - 1} PRECEDING AND CURRENT ROW) AS n
        FROM events
    ),
    w AS (
        SELECT user_id, event_id, rn, a, m,
               sqrt(GREATEST(ssq / {WINDOW} - m * m, 0)) AS sd
        FROM b WHERE n = {WINDOW}
    ),
    full_w AS (SELECT * FROM w WHERE sd > 0)
    """


def _mp_dist_sql(prefix_a: str = "x", prefix_b: str = "y") -> str:
    """Σ_k ((a_k−ma)/sa − (b_k−mb)/sb)² unrolled over the fixed window —
    identical term order in both engines."""
    terms = " + ".join(
        f"(({prefix_a}.a[{k}] - {prefix_a}.m) / {prefix_a}.sd"
        f" - ({prefix_b}.a[{k}] - {prefix_b}.m) / {prefix_b}.sd)"
        f" * (({prefix_a}.a[{k}] - {prefix_a}.m) / {prefix_a}.sd"
        f" - ({prefix_b}.a[{k}] - {prefix_b}.m) / {prefix_b}.sd)"
        for k in range(1, WINDOW + 1)
    )
    return f"sqrt({terms})"


@query(
    "x6_matrix_profile",
    f"""
    WITH {_mp_windows_sql()},
    pairs AS (
        SELECT x.user_id, x.event_id,
               y.event_id AS nn_event_id,
               ROUND({_mp_dist_sql()}, 6) AS d
        FROM full_w x JOIN full_w y
          ON x.user_id = y.user_id AND ABS(x.rn - y.rn) >= {WINDOW}
    ),
    ranked AS (
        SELECT user_id, event_id, nn_event_id, d,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_id
                                  ORDER BY d, nn_event_id) AS k
        FROM pairs
    )
    SELECT user_id, event_id, d AS mp, nn_event_id
    FROM ranked WHERE k = 1
    """,
)
def x6_matrix_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6 (r7): the MATRIX PROFILE (Yeh et al., "Matrix Profile I",
    ICDM 2016 — public literature): for every length-``WINDOW`` sliding
    window of each user's series, the z-normalized euclidean distance to
    its NEAREST non-trivial neighbor window (exclusion zone
    ``|i−j| ≥ WINDOW``) plus that neighbor's id. Low profile values =
    MOTIFS (repeated behavior); high values = DISCORDS (anomalies) —
    the one structure that answers both queries at once, which the
    existing pattern matcher (fixed query pattern) and robust-outlier
    operators (pointwise) cannot.

    Cross-engine exactness: windows, means, and sds come from the SAME
    frame expressions as ``x6_ts_znorm_stats``; the pair distance is
    the per-element unrolled sum (fixed term order, codegen `element_at`
    — no interpreted lambda at pair fan-out); nearest-neighbor choice
    ranks on the ROUNDED distance with event-id tie-break (canonical
    policy 4); ``GREATEST(var, 0)`` guards fp-negative variances
    identically in both engines.

    Scale note: the registered form is the exact all-pairs join —
    O(Σ_u n_u²) pairs, sound for per-user series that fit a task. At
    real scale the published STOMP ordering computes each diagonal in
    O(1) from its predecessor inside a per-user ``applyInPandas`` chunk
    (the x6_ts_dtw chunking pattern); the SQL form here is what DuckDB
    can replicate bit-for-bit, so it is the oracle-checked anchor."""
    events = read_table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = wo.rowsBetween(-(WINDOW - 1), Window.currentRow)
    b = events.select(
        "user_id",
        "event_id",
        F.row_number().over(wo).alias("rn"),
        F.collect_list("value").over(wf).alias("a"),
        F.avg("value").over(wf).alias("m"),
        F.sum(F.col("value") * F.col("value")).over(wf).alias("ssq"),
        F.count(F.lit(1)).over(wf).alias("n"),
    )
    w = (
        b.filter(F.col("n") == WINDOW)
        .withColumn(
            "sd",
            F.sqrt(F.greatest(F.col("ssq") / WINDOW - F.col("m") * F.col("m"), F.lit(0.0))),
        )
        .filter(F.col("sd") > 0)
        .select("user_id", "event_id", "rn", "a", "m", "sd")
    )
    x = w.alias("x")
    y = w.alias("y")

    def z(side: str, k: int):
        return (F.element_at(f"{side}.a", k) - F.col(f"{side}.m")) / F.col(f"{side}.sd")

    dist2 = None
    for k in range(1, WINDOW + 1):
        t = (z("x", k) - z("y", k)) * (z("x", k) - z("y", k))
        dist2 = t if dist2 is None else dist2 + t
    pairs = (
        x.join(
            y,
            (F.col("x.user_id") == F.col("y.user_id"))
            & (F.abs(F.col("x.rn") - F.col("y.rn")) >= WINDOW),
        )
        .select(
            F.col("x.user_id").alias("user_id"),
            F.col("x.event_id").alias("event_id"),
            F.col("y.event_id").alias("nn_event_id"),
            F.round(F.sqrt(dist2), 6).alias("d"),
        )
    )
    wr = Window.partitionBy("user_id", "event_id").orderBy("d", "nn_event_id")
    return (
        pairs.withColumn("k", F.row_number().over(wr))
        .filter(F.col("k") == 1)
        .select("user_id", "event_id", F.col("d").alias("mp"), "nn_event_id")
    )


def matrix_profile_chunked(events: DataFrame) -> DataFrame:
    """The SCALE path for ``x6_matrix_profile``: per-user Arrow chunks
    (``applyInPandas`` — the x6_ts_dtw pattern) computing the same
    z-normalized nearest-neighbor profile with vectorized numpy instead
    of the all-pairs SQL join. Per-user work is still O(n²) pairwise
    float ops but with NO pair-row materialization or shuffle — the pair
    matrix lives only inside one task's numpy arena, so the shuffled
    data volume is the series itself, not its square. (The published
    STOMP recurrence would drop the per-pair cost to O(1) amortized;
    the vectorized form here is already memory-safe and keeps the
    arithmetic ORDER identical to the SQL anchor, which the equivalence
    test pins: same windows, same mean/sd formula, same per-element
    term order, same round-half-up-6 + id tie-break.)"""
    import pandas as pd

    def prof(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        v = pdf["value"].to_numpy(dtype=np.float64)
        ev = pdf["event_id"].to_numpy()
        n = len(v)
        if n < WINDOW:
            return pd.DataFrame(
                {"user_id": [], "event_id": [], "mp": [], "nn_event_id": []}
            ).astype({"user_id": "int64", "event_id": "int64", "mp": "float64", "nn_event_id": "int64"})
        wins = np.lib.stride_tricks.sliding_window_view(v, WINDOW)  # (nw, W)
        m = wins.sum(axis=1) / WINDOW
        ssq = (wins * wins).sum(axis=1)
        sd = np.sqrt(np.maximum(ssq / WINDOW - m * m, 0.0))
        valid = sd > 0
        z = np.where(
            valid[:, None], (wins - m[:, None]) / np.where(valid, sd, 1.0)[:, None], 0.0
        )
        # window i ends at series index i+W-1 -> event_id of that row
        end_ev = ev[WINDOW - 1 :]
        idx = np.arange(len(wins))
        uid = int(pdf["user_id"].iloc[0])
        rows = []
        for i in idx[valid]:
            mask = valid & (np.abs(idx - i) >= WINDOW)
            if not mask.any():
                continue
            diff = z[mask] - z[i]
            d = np.sqrt((diff * diff).sum(axis=1))
            d6 = np.sign(d) * np.floor(np.abs(d) * 1e6 + 0.5) / 1e6
            cand_ev = end_ev[mask]
            order = np.lexsort((cand_ev, d6))
            j = order[0]
            rows.append((uid, int(end_ev[i]), float(d6[j]), int(cand_ev[j])))
        return pd.DataFrame(rows, columns=["user_id", "event_id", "mp", "nn_event_id"])

    return events.select("user_id", "ts", "event_id", "value").groupBy("user_id").applyInPandas(
        prof, "user_id long, event_id long, mp double, nn_event_id long"
    )


@query(
    "x6_discord_topk",
    None,  # oracle injected below (reuses the matrix-profile oracle text)
)
def x6_discord_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6 (r7): top-5 DISCORDS — the corpus's most anomalous windows,
    read straight off the matrix profile (the window with the LARGEST
    nearest-neighbor distance is, by definition, the subsequence least
    like anything else — Matrix Profile I's discord definition). Global
    rank orders by (mp DESC, user_id, event_id) so ties are
    deterministic; the plan is a ``TakeOrderedAndProject`` over the
    profile — per-partition heaps, no global sort."""
    return (
        x6_matrix_profile(spark, sf_dir)
        .orderBy(F.col("mp").desc(), "user_id", "event_id")
        .limit(5)
    )


# the discord oracle nests the full profile oracle as a CTE body, so the
# two stay in lockstep by construction
from etl_active911_spark.plans import registry as _registry  # noqa: E402

_registry.ORACLES["x6_discord_topk"] = f"""
    SELECT * FROM ({_registry.ORACLES["x6_matrix_profile"]})
    ORDER BY mp DESC, user_id, event_id LIMIT 5
"""


# ---------------------------------------------------------------------------
# X-6 (r9): CUSUM changepoint / level-shift detection
# ---------------------------------------------------------------------------

CUSUM_K = 0.5  # slack, in per-series sigma units (textbook standardized CUSUM)
CUSUM_H = 5.0  # alarm threshold, sigma units (ARL-motivated default)

_CUSUM_ORACLE = f"""
    WITH base AS (
        SELECT user_id, event_id, ts, value,
               AVG(value) OVER (PARTITION BY user_id) AS mu,
               STDDEV_POP(value) OVER (PARTITION BY user_id) AS sd
        FROM events
    ),
    p AS (
        SELECT user_id, event_id, ts,
               SUM(CASE WHEN sd > 0 THEN (value - mu) / sd - {CUSUM_K} END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pf
        FROM base
    ),
    s AS (
        SELECT user_id, event_id,
               ROUND(pf - LEAST(0, MIN(pf) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
                   AS cusum
        FROM p
    ),
    a AS (
        SELECT user_id, event_id, cusum,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY cusum DESC, event_id) AS rnk
        FROM s WHERE cusum > CAST({CUSUM_H} AS DOUBLE)
    )
    SELECT user_id, event_id, cusum, CAST(rnk AS BIGINT) AS rnk FROM a
    """


@query("x6_cusum_changepoint", _CUSUM_ORACLE)
def x6_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6 (r9): CUSUM LEVEL-SHIFT DETECTION (Page 1954) — the standard
    upward-changepoint alarm over each user's value series: standardized
    deviations ``(x - mu)/sigma - K`` accumulate as
    ``S_t = max(0, S_{t-1} + dev_t)`` and an alarm fires at
    ``S_t > H``. The recursion is NOT directly SQL-expressible, but its
    prefix closed form IS: ``S_t = P_t - min(0, min_{j<=t} P_j)`` with
    ``P`` the plain prefix sum (induction: if P_t >= m_{t-1} the max()
    branch is inactive and the running min is unchanged; otherwise
    S_t = 0 and P_t becomes the new min — both cases preserve
    S_t = P_t - min(0, min P));
    that turns a stateful scan into two stock window frames — the same
    flat-window discipline as x6_ts_pattern_match. Emits every alarm
    point with its per-user severity rank.

    Determinism: both engines accumulate the same per-row deviations;
    cumulative-frame last-bit drift is absorbed by ROUND(.,6) BEFORE
    the threshold comparison and the rank (canonical policy 4; the
    comparison constant is CAST AS DOUBLE — rule 24's decimal trap).
    A zero-variance series yields NULL deviations → NULL cusum →
    filtered identically by both engines.

    Scale shape: two per-series window frames + one whole-partition
    moment window — every exchange keys on user_id (series-bounded, the
    x6 family's partitioning); no joins, no corpus-wide window."""
    return cusum_alarms(read_table(spark, sf_dir, "events"))


def cusum_alarms(ev: DataFrame) -> DataFrame:
    """Core of ``x6_cusum_changepoint`` over an arbitrary
    (user_id, event_id, ts, value) frame — split out so synthetic
    level-shift series pin alarm localization in pytest."""
    w_all = Window.partitionBy("user_id")
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # w_min MUST share w_ord's (ts, event_id) ordering: the prefix-sum /
    # prefix-min identity requires one consistent order (ADVICE r09 —
    # event_id alone only worked because fixture ids are ts-monotone).
    w_min = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    base = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.avg("value").over(w_all).alias("mu"),
        F.stddev_pop("value").over(w_all).alias("sd"),
    )
    dev = F.when(
        F.col("sd") > 0, (F.col("value") - F.col("mu")) / F.col("sd") - CUSUM_K
    )
    p = base.select(
        "user_id", "event_id", "ts", F.sum(dev).over(w_ord).alias("pf")
    )
    s = p.select(
        "user_id",
        "event_id",
        F.round(
            F.col("pf") - F.least(F.lit(0.0), F.min("pf").over(w_min)), 6
        ).alias("cusum"),
    )
    w_rank = Window.partitionBy("user_id").orderBy(F.col("cusum").desc(), "event_id")
    return (
        s.filter(F.col("cusum") > F.lit(CUSUM_H))
        .withColumn("rnk", F.row_number().over(w_rank).cast("bigint"))
        .select("user_id", "event_id", "cusum", "rnk")
    )


# ---------------------------------------------------------------------------
# X-6 (r9): seasonal / trend strength (Hyndman's F_s, F_t)
# ---------------------------------------------------------------------------

_STRENGTH_ORACLE = f"""
    WITH base AS (
        SELECT user_id, event_id,
               CAST(ROUND(value * {_DECOMP_SCALE}) AS BIGINT) AS sv,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ),
    tr AS (
        SELECT user_id, event_id, sv, rn,
               SUM(sv) OVER w5 AS tn,
               COUNT(*) OVER w5 AS n
        FROM base
        WINDOW w5 AS (PARTITION BY user_id ORDER BY rn
                      ROWS BETWEEN {DECOMP_HALF} PRECEDING
                               AND {DECOMP_HALF} FOLLOWING)
    ),
    det AS (
        SELECT user_id, event_id, rn, tn,
               sv * {DECOMP_SPAN} - tn AS d_num
        FROM tr WHERE n = {DECOMP_SPAN}
    ),
    sea AS (
        SELECT user_id, event_id, tn, d_num,
               SUM(d_num) OVER wp AS s_num,
               COUNT(*) OVER wp AS m
        FROM det
        WINDOW wp AS (PARTITION BY user_id, rn % {DECOMP_PERIOD})
    ),
    comp AS (
        SELECT user_id,
               ROUND(CAST(tn AS DOUBLE) / {DECOMP_SPAN * _DECOMP_SCALE}, 6) AS trend,
               ROUND(CAST(s_num AS DOUBLE) / ({DECOMP_SPAN * _DECOMP_SCALE} * m), 6) AS seasonal,
               ROUND(CAST(d_num * m - s_num AS DOUBLE)
                     / ({DECOMP_SPAN * _DECOMP_SCALE} * m), 6) AS residual
        FROM sea
    ),
    v AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS nw,
               SUM(residual) AS sr, SUM(residual * residual) AS srr,
               SUM(seasonal + residual) AS ss,
               SUM((seasonal + residual) * (seasonal + residual)) AS sss,
               SUM(trend + residual) AS st,
               SUM((trend + residual) * (trend + residual)) AS stt
        FROM comp GROUP BY user_id
    )
    SELECT user_id, nw AS n_windows,
           ROUND(CASE WHEN sss / nw - (ss / nw) * (ss / nw) > 0
                      THEN GREATEST(0.0, 1 - (srr / nw - (sr / nw) * (sr / nw))
                                          / (sss / nw - (ss / nw) * (ss / nw)))
                      ELSE 0.0 END, 6) AS seasonal_strength,
           ROUND(CASE WHEN stt / nw - (st / nw) * (st / nw) > 0
                      THEN GREATEST(0.0, 1 - (srr / nw - (sr / nw) * (sr / nw))
                                          / (stt / nw - (st / nw) * (st / nw)))
                      ELSE 0.0 END, 6) AS trend_strength
    FROM v
    """


@query("x6_seasonal_strength", _STRENGTH_ORACLE)
def x6_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6 (r9): SEASONAL / TREND STRENGTH (Hyndman & Athanasopoulos,
    FPP3 §4.4): per series, ``F_s = max(0, 1 − Var(R)/Var(S+R))`` and
    ``F_t = max(0, 1 − Var(R)/Var(T+R))`` over the classical
    decomposition's components — the two scalars that let a fleet-wide
    job RANK thousands of series by how seasonal/trending they are
    (feature selection for forecasting, anomaly-baseline choice) without
    a human looking at plots. Composes ``x6_ts_decompose``'s exact
    fixed-point components (bit-identical across engines by
    construction), so the only floating work is the variance aggregate
    over identical 6dp inputs — summation-order drift ≪ the 6dp output
    rounding, and the zero-variance guard short-circuits identically.

    Scale shape: inherits the decompose shuffles (user_id, then
    (user_id, phase)); the strength itself is one per-user aggregate."""
    comp = x6_ts_decompose(spark, sf_dir).select(
        "user_id", "trend", "seasonal", "residual"
    )
    v = comp.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("nw"),
        F.sum("residual").alias("sr"),
        F.sum(F.col("residual") * F.col("residual")).alias("srr"),
        F.sum(F.col("seasonal") + F.col("residual")).alias("ss"),
        F.sum(
            (F.col("seasonal") + F.col("residual"))
            * (F.col("seasonal") + F.col("residual"))
        ).alias("sss"),
        F.sum(F.col("trend") + F.col("residual")).alias("st"),
        F.sum(
            (F.col("trend") + F.col("residual"))
            * (F.col("trend") + F.col("residual"))
        ).alias("stt"),
    )
    def strength(sq, sm):
        var_sig = sq / F.col("nw") - (sm / F.col("nw")) * (sm / F.col("nw"))
        var_res = F.col("srr") / F.col("nw") - (F.col("sr") / F.col("nw")) * (
            F.col("sr") / F.col("nw")
        )
        return F.round(
            F.when(var_sig > 0, F.greatest(F.lit(0.0), 1 - var_res / var_sig))
            .otherwise(F.lit(0.0)),
            6,
        )
    return v.select(
        "user_id",
        F.col("nw").alias("n_windows"),
        strength(F.col("sss"), F.col("ss")).alias("seasonal_strength"),
        strength(F.col("stt"), F.col("st")).alias("trend_strength"),
    )


# ---------------------------------------------------------------------------
# X-6 (r9): hypertable-style rollup cascade (continuous aggregate)
# ---------------------------------------------------------------------------


@query(
    "x6_rollup_cascade",
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS hour_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS sum_value,
           ROUND(MIN(value), 6) AS min_value,
           ROUND(MAX(value), 6) AS max_value,
           ROUND(SUM(value) / COUNT(*), 6) AS mean_value,
           ROUND(sqrt(SUM(value * value) / COUNT(*)
                      - (SUM(value) / COUNT(*)) * (SUM(value) / COUNT(*))), 6)
               AS stddev_value
    FROM events GROUP BY 1
    """,
)
def x6_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6 (r9): the HYPERTABLE ROLLUP CASCADE (TimescaleDB continuous
    aggregates / materialized rollup chains): raw events roll up to a
    MINUTE layer carrying re-aggregatable partials (count, sum, min,
    max, sum-of-squares), and the HOUR layer is derived from the minute
    layer ALONE — never re-reading raw data, which is the entire point
    of the pattern at scale (each refresh touches one minute of raw
    events; the hour/day layers re-aggregate partials). Derived stats
    (mean, population stddev) are computed only at the edge, from the
    partials — averaging averages is the classic cascade bug, and the
    ORACLE computes the hour layer DIRECTLY from raw events, so any
    non-re-aggregatable state in the cascade hash-mismatches.

    Determinism: count/min/max re-aggregate exactly; sum/sum-of-squares
    differ from the direct path only by float association (≪ the 2dp/6dp
    output rounding at fixture magnitudes). Buckets are epoch-aligned
    (Spark ``window`` == DuckDB ``time_bucket``) over the NTZ-normalized
    event time, so no session-zone dependence (rule 3).

    Scale shape: two keyed aggregates, each map-side combined; the hour
    layer's input is the minute layer (1440× smaller than raw per day),
    and adding day/week layers repeats the same partial re-aggregation."""
    ev = read_table(spark, sf_dir, "events")
    minute = (
        ev.groupBy(F.window("ts", "1 minute").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("value").alias("s"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
            F.sum(F.col("value") * F.col("value")).alias("ssq"),
        )
        .select(F.col("w.start").alias("minute_start"), "cnt", "s", "mn", "mx", "ssq")
    )
    hour = (
        minute.groupBy(F.date_trunc("hour", "minute_start").alias("hour_start"))
        .agg(
            F.sum("cnt").cast("bigint").alias("n_events"),
            F.sum("s").alias("s"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
            F.sum("ssq").alias("ssq"),
        )
    )
    n, s = F.col("n_events"), F.col("s")
    return hour.select(
        "hour_start",
        "n_events",
        F.round(s, 2).alias("sum_value"),
        F.round("mn", 6).alias("min_value"),
        F.round("mx", 6).alias("max_value"),
        F.round(s / n, 6).alias("mean_value"),
        F.round(F.sqrt(F.col("ssq") / n - (s / n) * (s / n)), 6).alias("stddev_value"),
    )


# ---------------------------------------------------------------------------
# X-6 (r9): min-max downsampling (rendering-faithful series reduction)
# ---------------------------------------------------------------------------

# 3 days, in minutes. NOT arbitrary: Spark's window() buckets from the
# 1970-01-01 epoch, DuckDB's time_bucket() from 2000-01-03, and the two
# origins differ by 10959 days = 3653 x 3 — so 3-day buckets land on
# IDENTICAL boundaries in both engines (any divisor of 1440 minutes also
# aligns; a 7-day bucket would NOT: 10959 % 7 != 0).
DOWNSAMPLE_BUCKET_MIN = 3 * 1440


@query(
    "x6_minmax_downsample",
    f"""
    WITH b AS (
        SELECT user_id, event_id, value,
               time_bucket(INTERVAL '{DOWNSAMPLE_BUCKET_MIN} minutes', ts) AS bucket
        FROM events
    ),
    r AS (
        SELECT user_id, bucket, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, bucket
                                  ORDER BY ROUND(value, 6) ASC, event_id) AS rmin,
               ROW_NUMBER() OVER (PARTITION BY user_id, bucket
                                  ORDER BY ROUND(value, 6) DESC, event_id) AS rmax
        FROM b
    )
    SELECT user_id, bucket, event_id, ROUND(value, 6) AS value,
           CASE WHEN rmin = 1 AND rmax = 1 THEN 'both'
                WHEN rmin = 1 THEN 'min' ELSE 'max' END AS kept_as
    FROM r WHERE rmin = 1 OR rmax = 1
    """,
)
def x6_minmax_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6 (r9): MIN-MAX DOWNSAMPLING — the rendering-faithful series
    reduction dashboards use (Grafana/M4): per (series, time bucket)
    keep the extreme points — the actual ROWS, not aggregates — so
    spikes and dips survive any reduction ratio, which plain AVG
    downsampling erases (the monitoring bug this operator class
    exists for). A single-point bucket (or constant bucket where the
    same row takes both extremes) is kept once, tagged 'both'.

    Determinism: extreme selection ranks on ROUND(value, 6) with
    event_id tie-breaks (canonical policy 4), so equal-valued rows pick
    the same representative on both engines.

    Scale shape: one shuffle on (user_id, bucket) shared by both rank
    windows; WindowGroupLimit prunes each to its per-bucket extreme
    map-side. Output is ≤ 2 rows per (series, bucket) regardless of
    input rate — the reduction contract."""
    ev = read_table(spark, sf_dir, "events")
    b = ev.select(
        "user_id",
        "event_id",
        "value",
        F.window("ts", f"{DOWNSAMPLE_BUCKET_MIN} minutes").start.alias("bucket"),
    )
    w_min = Window.partitionBy("user_id", "bucket").orderBy(
        F.round("value", 6).asc(), F.col("event_id")
    )
    w_max = Window.partitionBy("user_id", "bucket").orderBy(
        F.round("value", 6).desc(), F.col("event_id")
    )
    r = b.withColumn("rmin", F.row_number().over(w_min)).withColumn(
        "rmax", F.row_number().over(w_max)
    )
    return r.filter((F.col("rmin") == 1) | (F.col("rmax") == 1)).select(
        "user_id",
        "bucket",
        "event_id",
        F.round("value", 6).alias("value"),
        F.when((F.col("rmin") == 1) & (F.col("rmax") == 1), "both")
        .when(F.col("rmin") == 1, "min")
        .otherwise("max")
        .alias("kept_as"),
    )


# ---------------------------------------------------------------------------
# X-6 (r10): telemetry gap detection (data-liveness audit)
# ---------------------------------------------------------------------------

GAP_ALERT_SECONDS = 3600  # gaps longer than this are reporting outages

_GAP_ORACLE = f"""
    WITH g AS (
        SELECT user_id, ts,
               LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pv
        FROM events
    ),
    d AS (
        SELECT user_id,
               date_diff('microsecond', pv, ts) // 1000000 AS gap_s
        FROM g WHERE pv IS NOT NULL
    )
    SELECT user_id,
           CAST(COUNT(*) + 1 AS BIGINT) AS n_events,
           CAST(MAX(gap_s) AS BIGINT) AS max_gap_s,
           CAST(SUM(CASE WHEN gap_s > {GAP_ALERT_SECONDS} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outages,
           CAST(SUM(gap_s) AS BIGINT) AS span_s
    FROM d GROUP BY user_id
    """


@query("x6_gap_detection", _GAP_ORACLE)
def x6_gap_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6 (r10): TELEMETRY GAP AUDIT — the liveness question every
    ingestion pipeline answers before trusting windowed aggregates: per
    series, the largest inter-event gap, the count of outage-grade gaps
    (> GAP_ALERT_SECONDS), the covered span, and the event count. A
    series with big max_gap relative to span has silent holes that
    forward-fills and rollups would paper over.

    Determinism: gaps are exact integer microsecond differences floored
    to seconds in BOTH engines (no float time arithmetic anywhere);
    ordering ties broken by event_id (canonical policy).

    Scale shape: one lag window + one aggregate, both keyed on user_id —
    the x6 family's series-bounded partitioning; no joins."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select("user_id", "ts", F.lag("ts").over(w).alias("pv")).filter(
        F.col("pv").isNotNull()
    )
    gap_s = F.expr("timestampdiff(MICROSECOND, pv, ts)") / F.lit(1000000)
    d = g.select("user_id", F.floor(gap_s).cast("bigint").alias("gap_s"))
    return d.groupBy("user_id").agg(
        (F.count(F.lit(1)) + 1).cast("bigint").alias("n_events"),
        F.max("gap_s").cast("bigint").alias("max_gap_s"),
        F.sum(F.when(F.col("gap_s") > GAP_ALERT_SECONDS, 1).otherwise(0))
        .cast("bigint")
        .alias("n_outages"),
        F.sum("gap_s").cast("bigint").alias("span_s"),
    )


# ---------------------------------------------------------------------------
# X-6 (r10): above-mean run-length analysis (gaps-and-islands)
# ---------------------------------------------------------------------------

_RUNS_ORACLE = """
    WITH base AS (
        SELECT user_id, event_id, ts, value,
               AVG(value) OVER (PARTITION BY user_id) AS mu
        FROM events
    ),
    t AS (
        SELECT user_id,
               CASE WHEN ROUND(value - mu, 6) > 0 THEN 1 ELSE 0 END AS above,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM base
    ),
    a AS (
        SELECT user_id,
               rn - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn)
                   AS island
        FROM t WHERE above = 1
    ),
    runs AS (
        SELECT user_id, island, COUNT(*) AS run_len
        FROM a GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_runs,
           CAST(MAX(run_len) AS BIGINT) AS max_run_len,
           CAST(SUM(run_len) AS BIGINT) AS n_above
    FROM runs GROUP BY user_id
    """


@query("x6_threshold_runs", _RUNS_ORACLE)
def x6_threshold_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6 (r10): ABOVE-MEAN RUN LENGTHS — the classic gaps-and-islands
    rewrite (consecutive-row grouping via the rn − rank-among-marked
    difference): per series, how many sustained above-mean episodes
    exist, the longest one, and the total above-mean row count. The
    flapping-vs-sustained discriminator CUSUM alarms don't expose: many
    short runs = noise around the mean; one long run = a level episode
    worth alerting on.

    Determinism: the threshold compares ROUND(value − mu, 6) > 0 so the
    engines' last-ulp AVG difference cannot flip a row (canonical
    policy 4); row order ties break on event_id.

    Scale shape: one whole-partition moment window + two row_number
    windows + two aggregates, every one keyed on user_id — no joins,
    nothing corpus-wide."""
    ev = read_table(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id")
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = ev.select(
        "user_id",
        "ts",
        "event_id",
        (F.round(F.col("value") - F.avg("value").over(w_all), 6) > 0)
        .cast("int")
        .alias("above"),
    ).withColumn("rn", F.row_number().over(w_ord))
    w_rn = Window.partitionBy("user_id").orderBy("rn")
    a = t.filter(F.col("above") == 1).select(
        "user_id", (F.col("rn") - F.row_number().over(w_rn)).alias("island")
    )
    runs = a.groupBy("user_id", "island").agg(F.count(F.lit(1)).alias("run_len"))
    return runs.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_runs"),
        F.max("run_len").cast("bigint").alias("max_run_len"),
        F.sum("run_len").cast("bigint").alias("n_above"),
    )


# ---------------------------------------------------------------------------
# X-6 (r10): weekday activity profile
# ---------------------------------------------------------------------------

_WEEKDAY_ORACLE = """
    WITH d AS (
        SELECT user_id, CAST(isodow(ts) - 1 AS INTEGER) AS dow
        FROM events
    ),
    c AS (
        SELECT user_id, dow, CAST(COUNT(*) AS BIGINT) AS n_events
        FROM d GROUP BY user_id, dow
    ),
    t AS (SELECT user_id, SUM(n_events) AS total FROM c GROUP BY user_id),
    r AS (
        SELECT user_id, dow, n_events,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY n_events DESC, dow) AS rn
        FROM c
    )
    SELECT c.user_id, c.dow, c.n_events,
           ROUND(CAST(c.n_events AS DOUBLE) / t.total, 6) AS share,
           CAST(CASE WHEN r.rn = 1 THEN 1 ELSE 0 END AS INTEGER) AS is_peak
    FROM c
    JOIN t ON t.user_id = c.user_id
    JOIN r ON r.user_id = c.user_id AND r.dow = c.dow
    """


@query("x6_weekday_profile", _WEEKDAY_ORACLE)
def x6_weekday_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6 (r10): WEEKDAY ACTIVITY PROFILE — the seasonality fingerprint
    behind capacity planning and anomaly baselines: per series, event
    counts and shares by ISO weekday (0 = Monday) with the peak day
    flagged (ties to the earlier weekday). The calendar twin of
    ``x6_ts_decompose``'s numeric seasonality: categorical, exact, and
    joinable as a feature.

    Determinism: weekday comes from the UTC-wall TIMESTAMP_NTZ the io
    layer guarantees for events.ts (rule 7), so the bucket is
    session-timezone-independent — Spark ``weekday`` (0=Mon) ≡ DuckDB
    ``isodow − 1``; counts are exact integers, shares round at 6dp.

    Scale shape: one keyed aggregate to ≤7 rows/series, then
    series-keyed windows/joins over that 7-row grain."""
    ev = read_table(spark, sf_dir, "events")
    c = ev.select("user_id", F.weekday("ts").cast("int").alias("dow")).groupBy(
        "user_id", "dow"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    t = c.groupBy("user_id").agg(F.sum("n_events").alias("total"))
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc(), "dow")
    r = c.withColumn("rn", F.row_number().over(w))
    return (
        r.join(t, "user_id")
        .select(
            "user_id",
            "dow",
            "n_events",
            F.round(F.col("n_events").cast("double") / F.col("total"), 6).alias(
                "share"
            ),
            (F.col("rn") == 1).cast("int").alias("is_peak"),
        )
    )


# ---------------------------------------------------------------------------
# X-6 (r10): event-type transition matrix (first-order Markov)
# ---------------------------------------------------------------------------

_MARKOV_ORACLE = """
    WITH s AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events
    ),
    c AS (
        SELECT event_type AS cur_type, next_type,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM s WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type
    )
    SELECT cur_type, next_type, n,
           ROUND(CAST(n AS DOUBLE)
                 / SUM(n) OVER (PARTITION BY cur_type), 6) AS p
    FROM c
    """


@query("x6_event_type_markov", _MARKOV_ORACLE)
def x6_event_type_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6 (r10): EVENT-TYPE TRANSITION MATRIX — the first-order Markov
    summary of user behavior (what follows what): corpus-level counts
    and row-normalized probabilities for every observed (current → next)
    event-type pair, with transitions sequenced WITHIN each user's
    timeline (the lead window never crosses users). The input to churn
    funnels, next-action prediction baselines, and anomaly scoring of
    improbable transitions.

    Determinism: sequencing ties break on event_id; probabilities are
    exact-integer counts divided once, rounded at 6dp.

    Scale shape: one user_id-keyed lead window, then a |types|²-keyed
    aggregate (tiny) and a row-normalizing window over that tiny
    result."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        F.col("event_type").alias("cur_type"),
        F.lead("event_type").over(w).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    c = s.groupBy("cur_type", "next_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    return c.select(
        "cur_type",
        "next_type",
        "n",
        F.round(
            F.col("n").cast("double")
            / F.sum("n").over(Window.partitionBy("cur_type")),
            6,
        ).alias("p"),
    )


# ---------------------------------------------------------------------------
# X-6 (r10): dominant-period detection (ACF argmax over lags 2..12)
# ---------------------------------------------------------------------------

DOMINANT_LAGS = tuple(range(2, 13))  # lag-1 memory excluded: period >= 2


def _dominant_period_oracle() -> str:
    legs = "\n        UNION ALL\n".join(
        f"""        SELECT user_id, {k} AS lag, sv AS x,
               LAG(sv, {k}) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS y
        FROM base"""
        for k in DOMINANT_LAGS
    )
    return f"""
    WITH base AS (
        SELECT user_id, ts, event_id,
               CAST(ROUND(value * {_DECOMP_SCALE}) AS BIGINT) AS sv
        FROM events
    ),
    legs AS (
{legs}
    ),
    sums AS (
        SELECT user_id, lag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM legs WHERE y IS NOT NULL
        GROUP BY user_id, lag
    ),
    acfs AS (
        SELECT user_id, CAST(lag AS INT) AS lag, n,
               ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                     / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                            * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS acf
        FROM sums
        WHERE n >= 3 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    )
    SELECT user_id, lag AS dominant_lag, acf AS dominant_acf,
           CAST(n AS BIGINT) AS n_pairs,
           CAST(CASE WHEN acf > 2.0 / SQRT(CAST(n AS DOUBLE))
                     THEN 1 ELSE 0 END AS INTEGER) AS is_significant
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY acf DESC, lag) AS rn
        FROM acfs
    ) t WHERE rn = 1
    """


@query("x6_dominant_period", _dominant_period_oracle())
def x6_dominant_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6 (r10): DOMINANT-PERIOD DETECTION — which lag in 2..12
    maximizes the autocorrelation, per series, with the classic
    2/√n significance gate: the automated answer to "what period should
    the seasonal decompose/forecast use?" that ``x6_ts_acf`` (lags 1-3)
    leaves to the operator's eye. Lag 1 is excluded by construction —
    short-memory persistence always wins it without indicating a PERIOD.

    Numerics: identical fixed-point integer-sums Pearson as x6_ts_acf
    (every inner sum exact BIGINT; one terminal float expression with
    identical IEEE op order, rounded 6dp); argmax ties break on the
    shorter lag; the significance compare uses the ROUNDED acf.

    Scale shape: one user_id-keyed window computes all 11 lags, the
    lag-exploded stack is narrow, one keyed aggregate + a per-series
    rank over ≤11 rows."""
    events = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sv = F.round(F.col("value") * _DECOMP_SCALE).cast("long")
    base = events.select(
        "user_id",
        sv.alias("x"),
        *[F.lag(sv, k).over(w).alias(f"y{k}") for k in DOMINANT_LAGS],
    )
    stacked = base.select(
        "user_id",
        "x",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(k).alias("lag"), F.col(f"y{k}").alias("y"))
                    for k in DOMINANT_LAGS
                ]
            )
        ).alias("s"),
    ).select("user_id", F.col("s.lag").alias("lag"), "x", F.col("s.y").alias("y"))
    sums = (
        stacked.filter(F.col("y").isNotNull())
        .groupBy("user_id", "lag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("x").cast("bigint").alias("sx"),
            F.sum("y").cast("bigint").alias("sy"),
            F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
            F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
            F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        )
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    acfs = (
        sums.filter((F.col("n") >= 3) & (dx > 0) & (dy > 0))
        .select(
            "user_id",
            F.col("lag").cast("int").alias("lag"),
            "n",
            F.round(num / F.sqrt(dx.cast("double") * dy.cast("double")), 6).alias(
                "acf"
            ),
        )
    )
    w_rank = Window.partitionBy("user_id").orderBy(F.col("acf").desc(), "lag")
    return (
        acfs.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("lag").alias("dominant_lag"),
            F.col("acf").alias("dominant_acf"),
            F.col("n").cast("bigint").alias("n_pairs"),
            (F.col("acf") > F.lit(2.0) / F.sqrt(F.col("n").cast("double")))
            .cast("int")
            .alias("is_significant"),
        )
    )

# ---------------------------------------------------------------------------
# X-6 (r10): inter-arrival burstiness (Goh & Barabasi 2008)
# ---------------------------------------------------------------------------

_BURSTINESS_ORACLE = """
    WITH g AS (
        SELECT user_id, ts,
               LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pv
        FROM events
    ),
    d AS (
        SELECT user_id,
               date_diff('microsecond', pv, ts) // 1000000 AS gap_s
        FROM g WHERE pv IS NOT NULL
    ),
    s AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_gaps,
               CAST(SUM(gap_s) AS BIGINT) AS s1,
               CAST(SUM(gap_s * gap_s) AS BIGINT) AS s2
        FROM d GROUP BY user_id
    )
    SELECT user_id, n_gaps,
           ROUND(CAST(s1 AS DOUBLE) / CAST(n_gaps AS DOUBLE), 6) AS mean_gap_s,
           ROUND(SQRT(CAST(n_gaps * s2 - s1 * s1 AS DOUBLE))
                 / CAST(s1 AS DOUBLE), 6) AS cv,
           ROUND((SQRT(CAST(n_gaps * s2 - s1 * s1 AS DOUBLE))
                  - CAST(s1 AS DOUBLE))
                 / (SQRT(CAST(n_gaps * s2 - s1 * s1 AS DOUBLE))
                    + CAST(s1 AS DOUBLE)), 6) AS burstiness
    FROM s WHERE n_gaps >= 2 AND s1 > 0
    """


@query("x6_burstiness", _BURSTINESS_ORACLE)
def x6_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6 (r10): INTER-ARRIVAL BURSTINESS — the Goh & Barabasi (EPL
    2008) coefficient B = (sigma - mu) / (sigma + mu) over each series'
    inter-event gaps, plus the coefficient of variation sigma/mu and the
    mean gap. B ~ 0 is memoryless (Poisson arrivals), B -> -1 is
    metronome-periodic, B -> +1 is heavy-burst — the single-number answer
    to "can windowed rollups assume steady arrivals for this series?"
    that ``x6_gap_detection``'s max-gap audit doesn't give.

    Numerics: gaps are exact integer seconds (microsecond diff floored,
    the gap-detection idiom); all moment sums are exact BIGINT. The
    algebra keeps everything integer until ONE terminal float chain:
    with D = n*s2 - s1^2 (exact),  n*sigma = sqrt(D)  and  n*mu = s1,
    so B = (sqrt(D) - s1) / (sqrt(D) + s1) and CV = sqrt(D) / s1 —
    written with the identical IEEE op order in both engines, rounded
    6dp. Series with < 2 gaps or an all-zero gap sum are excluded in
    both engines (mu = 0 makes CV/B undefined).

    Scale shape: one lag window + one aggregate, both keyed on user_id
    (series-bounded partitioning, the x6 family contract); no joins,
    output one row per series."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select("user_id", "ts", F.lag("ts").over(w).alias("pv")).filter(
        F.col("pv").isNotNull()
    )
    gap_s = F.floor(
        F.expr("timestampdiff(MICROSECOND, pv, ts)") / F.lit(1000000)
    ).cast("bigint")
    s = (
        g.select("user_id", gap_s.alias("gap_s"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
            F.sum("gap_s").cast("bigint").alias("s1"),
            F.sum(F.col("gap_s") * F.col("gap_s")).cast("bigint").alias("s2"),
        )
        .filter((F.col("n_gaps") >= 2) & (F.col("s1") > 0))
    )
    sd = F.sqrt((F.col("n_gaps") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double"))
    s1d = F.col("s1").cast("double")
    return s.select(
        "user_id",
        "n_gaps",
        F.round(s1d / F.col("n_gaps").cast("double"), 6).alias("mean_gap_s"),
        F.round(sd / s1d, 6).alias("cv"),
        F.round((sd - s1d) / (sd + s1d), 6).alias("burstiness"),
    )


# ---------------------------------------------------------------------------
# X-6 (r10): permutation entropy (Bandt & Pompe 2002, order 3)
# ---------------------------------------------------------------------------

#: ln(6) as an exact double literal — BOTH engines divide by this same
#: constant instead of calling their own libm ln(6.0) (last-ulp hazard).
_LN6 = "1.791759469228055"

_PERM_ENTROPY_ORACLE = f"""
    WITH base AS (
        SELECT user_id, ts, event_id,
               CAST(ROUND(value * {_DECOMP_SCALE}) AS BIGINT) AS sv
        FROM events
    ),
    tri AS (
        SELECT user_id,
               LAG(sv, 2) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS v0,
               LAG(sv, 1) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS v1,
               sv AS v2
        FROM base
    ),
    pat AS (
        SELECT user_id,
               (CASE WHEN v1 < v0 THEN 1 ELSE 0 END
                + CASE WHEN v2 < v0 THEN 1 ELSE 0 END) * 9
             + (CASE WHEN v0 <= v1 THEN 1 ELSE 0 END
                + CASE WHEN v2 < v1 THEN 1 ELSE 0 END) * 3
             + (CASE WHEN v0 <= v2 THEN 1 ELSE 0 END
                + CASE WHEN v1 <= v2 THEN 1 ELSE 0 END) AS pattern
        FROM tri WHERE v0 IS NOT NULL
    ),
    cnt AS (
        SELECT user_id, pattern, CAST(COUNT(*) AS BIGINT) AS c
        FROM pat GROUP BY user_id, pattern
    ),
    tot AS (
        SELECT user_id, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY user_id
    )
    SELECT t.user_id,
           t.n AS n_triples,
           CAST(COUNT(*) AS BIGINT) AS n_patterns,
           -- exact-integer micro-nat terms: the weighted sum is BIGINT,
           -- so entropy is aggregation-order-free; the mean is integer
           -- HALF-UP division in micro-units (no terminal ROUND-of-double
           -- decimal-tie exposure) — r10 discipline
           CAST((2 * -SUM(c.c * CAST(ROUND(
                    ln(CAST(c.c AS DOUBLE) / CAST(t.n AS DOUBLE))
                    * 1000000.0, 0) AS BIGINT)) + t.n) // (2 * t.n)
                AS DOUBLE) / 1000000.0 AS perm_entropy,
           ROUND(CAST((2 * -SUM(c.c * CAST(ROUND(
                    ln(CAST(c.c AS DOUBLE) / CAST(t.n AS DOUBLE))
                    * 1000000.0, 0) AS BIGINT)) + t.n) // (2 * t.n)
                AS DOUBLE) / 1000000.0 / {_LN6}, 6)
               AS pe_normalized
    FROM cnt c JOIN tot t USING (user_id)
    GROUP BY t.user_id, t.n
    """


@query("x6_permutation_entropy", _PERM_ENTROPY_ORACLE)
def x6_permutation_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6 (r10): PERMUTATION ENTROPY (Bandt & Pompe, PRL 2002) at
    order 3 — the entropy of the distribution over ORDINAL PATTERNS of
    consecutive value triples, the standard model-free complexity
    measure for sensor streams: a monotone ramp uses 1 of the 6
    patterns (entropy 0), white noise uses all 6 uniformly
    (normalized entropy 1), and regime changes move the number in
    between. Complements ``x6_burstiness`` (timing complexity) with
    VALUE-ORDER complexity on the same per-series grain.

    Determinism: values quantize to the family's 3dp fixed point before
    comparison; rank ties break by temporal index (the Bandt-Pompe
    convention: on equal values the EARLIER sample ranks lower), so the
    pattern id — rank0*9 + rank1*3 + rank2 — is integer-exact in both
    engines. Entropy terms quantize to EXACT BIGINT micro-nats
    (m = round(ln p · 10⁶)) so the weighted sum Σ c·m is integer and
    aggregation-ORDER-FREE (the float Σ p·round₆(ln p) form can sit on a
    6dp knife edge that flips with partial-agg order — observed on
    x3_centroid_purity, r10); normalization divides by a shared ln(6)
    DOUBLE LITERAL rather than each engine's own libm ln.

    Scale shape: ONE exchange total — the user_id-keyed lag window's;
    the (user_id, pattern) count, the per-user total, and the final
    roll-up all reuse that partitioning (hash(user_id) satisfies every
    downstream clustering), and the pattern alphabet is 6 so state per
    series is bounded."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sv = F.round(F.col("value") * _DECOMP_SCALE).cast("long")
    tri = ev.select(
        "user_id",
        F.lag(sv, 2).over(w).alias("v0"),
        F.lag(sv, 1).over(w).alias("v1"),
        sv.alias("v2"),
    ).filter(F.col("v0").isNotNull())

    def lt(a: str, b: str) -> Column:
        return F.when(F.col(a) < F.col(b), 1).otherwise(0)

    def le(a: str, b: str) -> Column:
        return F.when(F.col(a) <= F.col(b), 1).otherwise(0)

    pattern = (
        (lt("v1", "v0") + lt("v2", "v0")) * 9
        + (le("v0", "v1") + lt("v2", "v1")) * 3
        + (le("v0", "v2") + le("v1", "v2"))
    )
    cnt = (
        tri.select("user_id", pattern.alias("pattern"))
        .groupBy("user_id", "pattern")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    n = F.sum("c").over(Window.partitionBy("user_id")).cast("bigint")
    withn = cnt.select("user_id", "c", n.alias("n"))
    p = F.col("c").cast("double") / F.col("n").cast("double")
    # exact-integer micro-nat terms → order-free BIGINT sum, integer
    # HALF-UP micro-mean (no terminal ROUND-of-double) — r10 discipline
    m = F.round(F.log(p) * 1000000.0, 0).cast("long")
    return withn.groupBy("user_id", "n").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_patterns"),
        (-F.sum(F.col("c") * m)).cast("long").alias("e_micro"),
    ).select(
        "user_id",
        "n",
        "n_patterns",
        (F.expr("(2 * e_micro + n) div (2 * n)").cast("double") / 1000000.0).alias(
            "perm_entropy"
        ),
        F.round(
            F.expr("(2 * e_micro + n) div (2 * n)").cast("double")
            / 1000000.0
            / F.lit(float(_LN6)),
            6,
        ).alias("pe_normalized"),
    ).select(
        "user_id",
        F.col("n").alias("n_triples"),
        "n_patterns",
        "perm_entropy",
        "pe_normalized",
    )


# ---------------------------------------------------------------------------
# X-6 (r10): SAX symbolization (Lin/Keogh/Lonardi/Chiu, DMKD 2003)
# ---------------------------------------------------------------------------

#: PAA frame length (samples per symbol) and the alphabet-4 Gaussian
#: breakpoints (N(0,1) quartiles) — shared literals in both engines.
_SAX_FRAME = 4
_SAX_BP = "0.6745"

_SAX_ORACLE = f"""
    WITH base AS (
        SELECT user_id,
               CAST(ROUND(value * {_DECOMP_SCALE}) AS BIGINT) AS sv,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) - 1 AS idx
        FROM events
    ),
    st AS (
        SELECT user_id, sv, idx // {_SAX_FRAME} AS seg,
               CAST(COUNT(*) OVER w AS BIGINT) AS n,
               CAST(SUM(sv) OVER w AS BIGINT) AS s1,
               CAST(SUM(sv * sv) OVER w AS BIGINT) AS s2
        FROM base
        WINDOW w AS (PARTITION BY user_id)
    ),
    seg AS (
        SELECT user_id, seg, n, s1, s2,
               CAST(SUM(sv) AS BIGINT) AS seg_sum,
               CAST(COUNT(*) AS BIGINT) AS seg_n
        FROM st
        GROUP BY user_id, seg, n, s1, s2
    ),
    sym AS (
        SELECT user_id, seg, n,
               CASE WHEN z < -{_SAX_BP} THEN 'a'
                    WHEN z < 0.0 THEN 'b'
                    WHEN z < {_SAX_BP} THEN 'c'
                    ELSE 'd' END AS sym
        FROM (
            SELECT user_id, seg, n,
                   ROUND((CAST(seg_sum AS DOUBLE) / CAST(seg_n AS DOUBLE)
                          - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                         / sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)
                                / CAST(n * (n - 1) AS DOUBLE)), 6) AS z
            FROM seg
            WHERE n * s2 - s1 * s1 > 0
        )
    )
    SELECT user_id,
           n AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           string_agg(sym, '' ORDER BY seg) AS sax_word,
           CAST(SUM(CASE WHEN sym = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           CAST(SUM(CASE WHEN sym = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
           CAST(SUM(CASE WHEN sym = 'c' THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
           CAST(SUM(CASE WHEN sym = 'd' THEN 1 ELSE 0 END) AS BIGINT) AS n_d
    FROM sym
    GROUP BY user_id, n
    """


@query("x6_sax_words", _SAX_ORACLE)
def x6_sax_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6 (r10): SAX SYMBOLIZATION (Lin, Keogh, Lonardi & Chiu, DMKD
    2003) — each per-user value series z-normalized, reduced by PAA
    (Piecewise Aggregate Approximation, frame = 4 samples, trailing
    partial frame retained), and discretized against the alphabet-4
    Gaussian breakpoints (±0.6745, the N(0,1) quartiles) into the SAX
    string plus its symbol histogram. The discrete-representation
    complement of ``x6_ts_pattern_match`` (numeric correlation) and
    ``x6_permutation_entropy`` (ordinal complexity): SAX words are what
    motif/discord mining and series indexing actually store.

    Determinism: values quantize to the family's 3dp fixed point; the
    per-user moments (n, Σsv, Σsv²) and per-frame sums are EXACT BIGINT
    (safe while n·Σsv² < 2⁶³ — holds to ~10⁵ samples/series at fixture
    magnitudes; the 100 TB upgrade path is the same formula over
    DECIMAL(38) partials). The z-score is ONE mirrored double expression
    over those integers — sample variance via n·S2 − S1² (scale cancels
    exactly in the ratio) — rounded 6dp BEFORE the breakpoint compare,
    so both engines bin identically. Constant series (variance 0) are
    excluded by contract. The SAX string aggregates WITHIN GROUP
    (ORDER BY seg) — deterministic, no collect.

    Scale shape: ONE exchange — the user-keyed order window's;
    the per-user moment window, the (user, frame) PAA aggregate, and
    the final per-user roll-up all reuse hash(user_id) partitioning
    (subset rule), and per-series state is O(n_frames) strings of
    bounded alphabet."""
    ev = read_table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wu = Window.partitionBy("user_id")
    sv = F.round(F.col("value") * _DECOMP_SCALE).cast("long")
    base = ev.select(
        "user_id",
        sv.alias("sv"),
        (F.row_number().over(wo) - 1).alias("idx"),
    )
    st = base.select(
        "user_id",
        "sv",
        (F.col("idx") / _SAX_FRAME).cast("long").alias("seg"),
        F.count(F.lit(1)).over(wu).cast("bigint").alias("n"),
        F.sum("sv").over(wu).cast("bigint").alias("s1"),
        F.sum(F.col("sv") * F.col("sv")).over(wu).cast("bigint").alias("s2"),
    )
    seg = st.groupBy("user_id", "seg", "n", "s1", "s2").agg(
        F.sum("sv").cast("bigint").alias("seg_sum"),
        F.count(F.lit(1)).cast("bigint").alias("seg_n"),
    )
    num = F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
    den = F.col("n") * (F.col("n") - 1)
    z = F.round(
        (
            F.col("seg_sum").cast("double") / F.col("seg_n").cast("double")
            - F.col("s1").cast("double") / F.col("n").cast("double")
        )
        / F.sqrt(num.cast("double") / den.cast("double")),
        6,
    )
    bp = float(_SAX_BP)
    sym = (
        F.when(F.col("z") < -bp, "a")
        .when(F.col("z") < 0.0, "b")
        .when(F.col("z") < bp, "c")
        .otherwise("d")
    )
    symdf = (
        seg.filter(num > 0)
        .select("user_id", "seg", "n", z.alias("z"))
        .select("user_id", "seg", "n", sym.alias("sym"))
    )

    def cnt(s: str) -> Column:
        return F.sum(F.when(F.col("sym") == s, 1).otherwise(0)).cast("bigint").alias(f"n_{s}")

    return symdf.groupBy("user_id", "n").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        F.expr("listagg(sym, '') WITHIN GROUP (ORDER BY seg)").alias("sax_word"),
        cnt("a"),
        cnt("b"),
        cnt("c"),
        cnt("d"),
    ).select(
        "user_id",
        F.col("n").alias("n_events"),
        "n_segments",
        "sax_word",
        "n_a",
        "n_b",
        "n_c",
        "n_d",
    )


# ---------------------------------------------------------------------------
# X-6 (r10): lead-lag cross-correlation between event-type series
# ---------------------------------------------------------------------------

_XCORR_MAX_LAG = 3

_XCORR_ORACLE = f"""
    WITH base AS (
        SELECT date_diff('second', TIMESTAMP '2024-01-01 00:00:00', ts)
               // 3600 AS h,
               event_type
        FROM events
    ),
    cnt AS (
        SELECT h,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS cx,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS cy
        FROM base GROUP BY h
    ),
    bounds AS (SELECT MIN(h) AS hmin, MAX(h) AS hmax FROM cnt),
    spine AS (
        SELECT unnest(range((SELECT hmin FROM bounds),
                            (SELECT hmax FROM bounds) + 1)) AS h
    ),
    ser AS (
        SELECT s.h, COALESCE(c.cx, 0) AS x, COALESCE(c.cy, 0) AS y
        FROM spine s LEFT JOIN cnt c USING (h)
    ),
    lags AS (SELECT unnest(range(-{_XCORR_MAX_LAG}, {_XCORR_MAX_LAG} + 1)) AS lag),
    agg AS (
        SELECT l.lag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(a.x) AS BIGINT) AS sx,
               CAST(SUM(b.y) AS BIGINT) AS sy,
               CAST(SUM(a.x * b.y) AS BIGINT) AS sxy,
               CAST(SUM(a.x * a.x) AS BIGINT) AS sxx,
               CAST(SUM(b.y * b.y) AS BIGINT) AS syy
        FROM lags l
        JOIN ser a ON TRUE
        JOIN ser b ON b.h = a.h + l.lag
        GROUP BY l.lag
    )
    SELECT lag, n AS n_hours,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST((n * sxx - sx * sx) * (n * syy - sy * sy)
                             AS DOUBLE)), 6) AS xcorr
    FROM agg
    WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    """


@query("x6_cross_correlation", _XCORR_ORACLE)
def x6_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6 (r10): LEAD-LAG CROSS-CORRELATION FUNCTION (Box & Jenkins
    CCF) between the hourly 'click' and 'error' count series: Pearson r
    of click[t] against error[t+L] for L ∈ −3..+3 hours over the
    zero-filled hour spine. THE diagnostic for "do errors FOLLOW load,
    and by how long?" — the cross-series complement of
    ``x6_ts_acf``/``x6_dominant_period`` (self-correlation) and
    ``x6_event_type_markov`` (per-transition, unlagged).

    Determinism: the hour bucket is an exact integer (microsecond-exact
    epoch diff from a shared NTZ origin literal, floor-divided — rule 3
    TZ-safe); counts and all five correlation moments are EXACT BIGINT,
    so r is ONE mirrored double expression — (n·Sxy − Sx·Sy) /
    √((n·Sxx − Sx²)(n·Syy − Sy²)) — rounded 6dp. Degenerate lags
    (either series constant over the overlap) are excluded by contract.

    Scale shape: raw events collapse to the hour grain FIRST (map-side
    combined keyed aggregate, ~10⁴ rows/year regardless of corpus
    size); the spine, the 7-lag replicate, and the per-lag moment
    roll-up all run on that collapsed grain, so the lag join never
    touches raw data. The bounds row broadcasts; nothing collects."""
    ev = read_table(spark, sf_dir, "events")
    h = F.expr(
        "timestampdiff(SECOND, TIMESTAMP_NTZ '2024-01-01 00:00:00', ts) div 3600"
    )
    cnt = ev.select(h.alias("h"), "event_type").groupBy("h").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("cx"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("bigint")
        .alias("cy"),
    )
    bounds = cnt.agg(F.min("h").alias("hmin"), F.max("h").alias("hmax"))
    spine = bounds.select(
        F.explode(F.sequence(F.col("hmin"), F.col("hmax"))).alias("h")
    )
    ser = (
        spine.join(cnt, "h", "left")
        .select(
            "h",
            F.coalesce("cx", F.lit(0)).alias("x"),
            F.coalesce("cy", F.lit(0)).alias("y"),
        )
    )
    lags = spark.range(-_XCORR_MAX_LAG, _XCORR_MAX_LAG + 1).select(
        F.col("id").alias("lag")
    )
    a = ser.crossJoin(F.broadcast(lags))
    b = ser.select(F.col("h").alias("bh"), F.col("y").alias("by"))
    pairs = a.join(b, F.col("bh") == F.col("h") + F.col("lag"))
    agg = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("by").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("by")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("by") * F.col("by")).cast("bigint").alias("syy"),
    )
    n = F.col("n")
    dx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = n * F.col("syy") - F.col("sy") * F.col("sy")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    return (
        agg.filter((dx > 0) & (dy > 0))
        .select(
            "lag",
            n.alias("n_hours"),
            F.round(num.cast("double") / F.sqrt((dx * dy).cast("double")), 6).alias(
                "xcorr"
            ),
        )
    )


# ---------------------------------------------------------------------------
# X-6 (r10): Hurst exponent via rescaled-range (R/S) analysis
# ---------------------------------------------------------------------------

#: R/S block sizes — powers of two so the log-log regression abscissas
#: are exact multiples of ln 2 and the 3-point least-squares slope
#: collapses to (y_last − y_first) / (2·ln 2)
_HURST_SIZES = (8, 16, 32)
_LN2 = "0.6931471805599453"

_HURST_BLOCKS_SQL = f"""
    base AS (
        SELECT user_id,
               CAST(ROUND(value * {_DECOMP_SCALE}) AS BIGINT) AS sv,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) - 1 AS idx,
               COUNT(*) OVER (PARTITION BY user_id) AS n
        FROM events
    ),
    sized AS (
        SELECT user_id, sv, idx, m,
               idx // m AS blk,
               CAST(SUM(sv) OVER wb AS BIGINT) AS cum
        FROM base, (SELECT unnest([{', '.join(str(m) for m in _HURST_SIZES)}]) AS m)
        WHERE idx < (n // m) * m
        WINDOW wb AS (PARTITION BY user_id, m, idx // m
                      ORDER BY idx ROWS UNBOUNDED PRECEDING)
    ),
    blocks AS (
        SELECT user_id, m, blk,
               CAST(MAX(m * cum - (idx % m + 1) * bs1) AS BIGINT) AS mx,
               CAST(MIN(m * cum - (idx % m + 1) * bs1) AS BIGINT) AS mn,
               ANY_VALUE(bs1) AS s1, ANY_VALUE(bs2) AS s2
        FROM (
            SELECT user_id, m, blk, idx, cum,
                   CAST(SUM(sv) OVER wf AS BIGINT) AS bs1,
                   CAST(SUM(sv * sv) OVER wf AS BIGINT) AS bs2
            FROM sized
            WINDOW wf AS (PARTITION BY user_id, m, blk)
        ) GROUP BY user_id, m, blk
    ),
    rs AS (
        SELECT user_id, m,
               CAST(COUNT(*) AS BIGINT) AS nb,
               CAST(SUM(CAST(ROUND(CAST(mx - mn AS DOUBLE)
                                   / sqrt(CAST(m * s2 - s1 * s1 AS DOUBLE))
                                   * 1000000.0, 0) AS BIGINT)) AS BIGINT)
                   AS sum_micro
        FROM blocks WHERE m * s2 - s1 * s1 > 0
        GROUP BY user_id, m
    ),
    ys AS (
        -- mean_rs for the ln/H path: plain double division (deterministic,
        -- consumed only by irrational ln so no decimal-tie exposure);
        -- mean_micro for DISPLAY: integer HALF-UP mean in micro-units —
        -- ROUND(sum/nb/1e6, 6) ties exactly at digit 7 when nb is a power
        -- of two (observed: 4.0361565 rounded differently per engine)
        SELECT user_id, m,
               CAST(sum_micro AS DOUBLE) / CAST(nb AS DOUBLE) / 1000000.0
                   AS mean_rs,
               (2 * sum_micro + nb) // (2 * nb) AS mean_micro
        FROM rs
    )
"""

_HURST_ORACLE = f"""
    WITH {_HURST_BLOCKS_SQL}
    SELECT user_id,
           ROUND((ROUND(ln(MAX(CASE WHEN m = {_HURST_SIZES[-1]}
                                    THEN mean_rs END)), 6)
                  - ROUND(ln(MAX(CASE WHEN m = {_HURST_SIZES[0]}
                                      THEN mean_rs END)), 6))
                 / (2.0 * {_LN2}), 6) AS hurst,
           {', '.join(
               f"CAST(MAX(CASE WHEN m = {m} THEN mean_micro END) AS DOUBLE)"
               f" / 1000000.0 AS rs{m}"
               for m in _HURST_SIZES)}
    FROM ys
    GROUP BY user_id
    HAVING COUNT(*) = {len(_HURST_SIZES)}
    """


@query("x6_hurst", _HURST_ORACLE)
def x6_hurst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6 (r10): HURST EXPONENT by rescaled-range analysis (Hurst 1951;
    Mandelbrot & Wallis 1969) — per series, mean R/S over full blocks of
    8/16/32 samples and the log-log slope H: the long-memory scalar
    (H ≈ 0.5 random walk increments, > 0.5 persistent/trending, < 0.5
    anti-persistent/mean-reverting). Completes the X-6 complexity panel:
    burstiness (timing), permutation entropy (ordinal), SAX (shape),
    Hurst (MEMORY).

    Determinism: values quantize to the family's 3dp fixed point; within
    a block of size m the cumulative deviation SCALED BY m is EXACT
    BIGINT (m·cum_k − (k+1)·S1 — no division until the end), and since
    Z_m = 0 exactly, R = max − min needs no zero-anchoring case; the
    per-block R/S = (m-scaled R)/√(m·S2 − S1²) is one double, then
    quantized to BIGINT micro-units so the per-size block MEAN is an
    integer sum (aggregation-ORDER-FREE — the r10 entropy discipline).
    Block sizes are powers of two, so the 3-point log-log least squares
    collapses to (y₃₂ − y₈)/(2·ln 2) with shared literals; ln values
    round 6dp pre-difference. Zero-variance blocks are excluded by
    contract.

    Scale shape: ONE exchange (the user order window); the ×3 size
    replicate, the per-(user,size,block) windows, and every roll-up
    reuse hash(user_id) partitioning; per-task state is one block
    (≤ 32 rows) per window frame."""
    ev = read_table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wu = Window.partitionBy("user_id")
    sv = F.round(F.col("value") * _DECOMP_SCALE).cast("long")
    base = ev.select(
        "user_id",
        sv.alias("sv"),
        (F.row_number().over(wo) - 1).alias("idx"),
        F.count(F.lit(1)).over(wu).alias("n"),
    )
    sizes = F.explode(F.array(*[F.lit(m) for m in _HURST_SIZES])).alias("m")
    sized = (
        base.select("user_id", "sv", "idx", "n", sizes)
        .filter(F.col("idx") < (F.col("n") / F.col("m")).cast("long") * F.col("m"))
        .select(
            "user_id",
            "sv",
            "idx",
            "m",
            (F.col("idx") / F.col("m")).cast("long").alias("blk"),
        )
    )
    wb = (
        Window.partitionBy("user_id", "m", "blk")
        .orderBy("idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = Window.partitionBy("user_id", "m", "blk")
    enriched = sized.select(
        "user_id",
        "m",
        "blk",
        "idx",
        F.sum("sv").over(wb).cast("long").alias("cum"),
        F.sum("sv").over(wf).cast("long").alias("bs1"),
        F.sum(F.col("sv") * F.col("sv")).over(wf).cast("long").alias("bs2"),
    )
    z = F.col("m") * F.col("cum") - (F.col("idx") % F.col("m") + 1) * F.col("bs1")
    blocks = enriched.groupBy("user_id", "m", "blk").agg(
        F.max(z).cast("long").alias("mx"),
        F.min(z).cast("long").alias("mn"),
        F.first("bs1").alias("s1"),
        F.first("bs2").alias("s2"),
    )
    var_num = F.col("m") * F.col("s2") - F.col("s1") * F.col("s1")
    rs_micro = F.round(
        (F.col("mx") - F.col("mn")).cast("double")
        / F.sqrt(var_num.cast("double"))
        * 1000000.0,
        0,
    ).cast("long")
    rs = (
        blocks.filter(var_num > 0)
        .groupBy("user_id", "m")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("nb"),
            F.sum(rs_micro).cast("bigint").alias("sum_micro"),
        )
    )
    mean_rs = (
        F.col("sum_micro").cast("double") / F.col("nb").cast("double") / 1000000.0
    )
    # integer HALF-UP micro-mean for display (see oracle note: the
    # terminal ROUND of sum/nb ties at digit 7 for power-of-two nb)
    mean_micro = F.expr("(2 * sum_micro + nb) div (2 * nb)")
    ys = rs.select(
        "user_id", "m", mean_rs.alias("mean_rs"), mean_micro.alias("mean_micro")
    )
    ln2 = float(_LN2)

    def at(m: int, col: str = "mean_rs") -> Column:
        return F.max(F.when(F.col("m") == m, F.col(col)))

    return (
        ys.groupBy("user_id")
        .agg(
            F.round(
                (F.round(F.log(at(_HURST_SIZES[-1])), 6)
                 - F.round(F.log(at(_HURST_SIZES[0])), 6))
                / (2.0 * ln2),
                6,
            ).alias("hurst"),
            *[
                (at(m, "mean_micro").cast("double") / 1000000.0).alias(f"rs{m}")
                for m in _HURST_SIZES
            ],
            F.count(F.lit(1)).alias("__k"),
        )
        .filter(F.col("__k") == len(_HURST_SIZES))
        .drop("__k")
    )


# ---------------------------------------------------------------------------
# X-6 (r10): Mann-Kendall trend test (Mann 1945; Kendall 1975)
# ---------------------------------------------------------------------------

#: two-sided 5% critical value of the standard normal, shared literal
_MK_CRIT = "1.959964"

_MK_ORACLE = f"""
    WITH base AS (
        SELECT user_id,
               CAST(ROUND(value * {_DECOMP_SCALE}) AS BIGINT) AS sv,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS idx
        FROM events
    ),
    s AS (
        SELECT a.user_id,
               CAST(SUM(CASE WHEN b.sv > a.sv THEN 1
                             WHEN b.sv < a.sv THEN -1 ELSE 0 END)
                    AS BIGINT) AS s
        FROM base a JOIN base b
          ON b.user_id = a.user_id AND b.idx > a.idx
        GROUP BY a.user_id
    ),
    ties AS (
        SELECT user_id,
               CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term,
               CAST(SUM(t) AS BIGINT) AS n
        FROM (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS t
              FROM base GROUP BY user_id, sv)
        GROUP BY user_id
    ),
    z AS (
        SELECT s.user_id, s.s, t.n,
               ROUND(CASE
                   WHEN s.s > 0 THEN CAST(s.s - 1 AS DOUBLE)
                       / sqrt(CAST(t.n * (t.n - 1) * (2 * t.n + 5)
                                   - t.tie_term AS DOUBLE) / 18.0)
                   WHEN s.s < 0 THEN CAST(s.s + 1 AS DOUBLE)
                       / sqrt(CAST(t.n * (t.n - 1) * (2 * t.n + 5)
                                   - t.tie_term AS DOUBLE) / 18.0)
                   ELSE 0.0 END, 6) AS z
        FROM s JOIN ties t USING (user_id)
    )
    SELECT user_id, s, n, z,
           CASE WHEN z >= {_MK_CRIT} THEN 'increasing'
                WHEN z <= -{_MK_CRIT} THEN 'decreasing'
                ELSE 'none' END AS trend
    FROM z
    """


@query("x6_mann_kendall", _MK_ORACLE)
def x6_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6 (r10): MANN-KENDALL TREND TEST (Mann 1945; Kendall 1975) —
    the standard NON-PARAMETRIC monotone-trend detector per series:
    S = Σᵢ<ⱼ sign(xⱼ − xᵢ), the tie-corrected variance
    [n(n−1)(2n+5) − Σ t(t−1)(2t+5)]/18, and the continuity-corrected
    Z with a two-sided 5% verdict. Complements ``x6_ts_decompose``'s
    fitted trend COMPONENT with a significance TEST that needs no
    distributional assumption — the hydrology/climatology workhorse,
    and what a data-ops dashboard wants before alerting "this metric is
    drifting".

    Determinism: S, n, and the tie term are EXACT BIGINT off the 3dp
    fixed point (ties are real after quantization — the correction is
    exercised, not decorative); Z is one mirrored double expression
    (√ makes it decimal-tie-free, rule 26) rounded 6dp; the verdict
    thresholds compare the ROUNDED Z against a shared literal.

    Scale shape: the pairwise S is a user-keyed equi self-join
    (bounded per-series — series length is the dial, and the shuffle
    reuses the order-window's hash(user_id) exchange on both sides);
    tie groups are one (user, value) count; everything downstream is
    one row per series."""
    ev = read_table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sv = F.round(F.col("value") * _DECOMP_SCALE).cast("long")
    base = ev.select(
        "user_id", sv.alias("sv"), F.row_number().over(wo).alias("idx")
    )
    a = base.select("user_id", F.col("sv").alias("sv_a"), F.col("idx").alias("idx_a"))
    b = base.select("user_id", F.col("sv").alias("sv_b"), F.col("idx").alias("idx_b"))
    s = (
        a.join(b, "user_id")
        .filter(F.col("idx_b") > F.col("idx_a"))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("sv_b") > F.col("sv_a"), 1)
                .when(F.col("sv_b") < F.col("sv_a"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s")
        )
    )
    ties = (
        base.groupBy("user_id", "sv")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .groupBy("user_id")
        .agg(
            F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5))
            .cast("bigint")
            .alias("tie_term"),
            F.sum("t").cast("bigint").alias("n"),
        )
    )
    n = F.col("n")
    var18 = (n * (n - 1) * (2 * n + 5) - F.col("tie_term")).cast("double") / 18.0
    zc = F.round(
        F.when(F.col("s") > 0, (F.col("s") - 1).cast("double") / F.sqrt(var18))
        .when(F.col("s") < 0, (F.col("s") + 1).cast("double") / F.sqrt(var18))
        .otherwise(F.lit(0.0)),
        6,
    )
    crit = float(_MK_CRIT)
    return (
        s.join(ties, "user_id")
        .select("user_id", "s", "n", zc.alias("z"))
        .select(
            "user_id",
            "s",
            "n",
            "z",
            F.when(F.col("z") >= crit, "increasing")
            .when(F.col("z") <= -crit, "decreasing")
            .otherwise("none")
            .alias("trend"),
        )
    )


# ---------------------------------------------------------------------------
# X-6 (r10): Haar wavelet energy decomposition (Haar 1910; Mallat 1989)
# ---------------------------------------------------------------------------

HAAR_LEN = 32     # dyadic analysis window: first 32 samples per series
HAAR_SCALE = 100  # centi-quantization keeps all energy sums in int64


def _haar_sum_exprs(divop: str) -> list[tuple[str, str]]:
    """The 28 signed conditional sums + the energy total, shared between
    engines (``divop`` = 'div' for Spark SQL, '//' for DuckDB). Unnormalized
    integer Haar details: level-k coefficient energy is D_k^2 / 2^k, so with
    common denominator 8: E1*8 = 4*sum(D1^2), E2*8 = 2*sum(D2^2),
    E3*8 = sum(D3^2), total*8 = 8*sum(v^2)."""
    out = []
    for g in range(HAAR_LEN // 2):
        out.append((
            f"d1_{g}",
            f"CAST(SUM(CASE WHEN idx {divop} 2 = {g} "
            f"THEN (1 - 2 * (idx % 2)) * v ELSE 0 END) AS BIGINT)",
        ))
    for g in range(HAAR_LEN // 4):
        out.append((
            f"d2_{g}",
            f"CAST(SUM(CASE WHEN idx {divop} 4 = {g} "
            f"THEN (1 - 2 * ((idx {divop} 2) % 2)) * v ELSE 0 END) AS BIGINT)",
        ))
    for g in range(HAAR_LEN // 8):
        out.append((
            f"d3_{g}",
            f"CAST(SUM(CASE WHEN idx {divop} 8 = {g} "
            f"THEN (1 - 2 * ((idx {divop} 4) % 2)) * v ELSE 0 END) AS BIGINT)",
        ))
    out.append(("sq", "CAST(SUM(v * v) AS BIGINT)"))
    return out


def _haar_energy_exprs() -> dict[str, str]:
    e1 = " + ".join(f"d1_{g} * d1_{g}" for g in range(HAAR_LEN // 2))
    e2 = " + ".join(f"d2_{g} * d2_{g}" for g in range(HAAR_LEN // 4))
    e3 = " + ".join(f"d3_{g} * d3_{g}" for g in range(HAAR_LEN // 8))
    return {
        "e1_8": f"4 * ({e1})",
        "e2_8": f"2 * ({e2})",
        "e3_8": f"({e3})",
        "tot8": "8 * sq",
    }


def _haar_frac_sql(num: str, divop: str) -> str:
    return (
        f"CASE WHEN tot8 = 0 THEN 0 "
        f"ELSE (2 * ({num}) * 1000000 + tot8) {divop} (2 * tot8) END"
    )


def _haar_oracle() -> str:
    sums = ",\n               ".join(f"{sql} AS {name}" for name, sql in _haar_sum_exprs("//"))
    en = _haar_energy_exprs()
    return f"""
    WITH b AS (
        SELECT user_id, v, idx FROM (
            SELECT user_id,
                   CAST(ROUND(value * {HAAR_SCALE}) AS BIGINT) AS v,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) - 1 AS idx
            FROM events
        ) t WHERE idx < {HAAR_LEN}
    ),
    d AS (
        SELECT user_id,
               {sums}
        FROM b GROUP BY user_id HAVING COUNT(*) = {HAAR_LEN}
    ),
    e AS (
        SELECT user_id,
               {en['e1_8']} AS e1_8, {en['e2_8']} AS e2_8,
               {en['e3_8']} AS e3_8, {en['tot8']} AS tot8
        FROM d
    )
    SELECT user_id,
           CAST({_haar_frac_sql('e1_8', '//')} AS DOUBLE) / 1000000.0 AS e1_frac,
           CAST({_haar_frac_sql('e2_8', '//')} AS DOUBLE) / 1000000.0 AS e2_frac,
           CAST({_haar_frac_sql('e3_8', '//')} AS DOUBLE) / 1000000.0 AS e3_frac,
           CASE WHEN e1_8 >= e2_8 AND e1_8 >= e3_8 THEN 1
                WHEN e2_8 >= e3_8 THEN 2 ELSE 3 END AS dominant_level
    FROM e
    """


@query("x6_haar_energy", _haar_oracle())
def x6_haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6 (r10): HAAR WAVELET ENERGY DECOMPOSITION (Mallat, TPAMI 1989)
    over each series' first 32 samples: the share of signal energy in
    detail levels 1-3 (adjacent-sample, 4-sample, 8-sample structure) —
    the time-frequency fingerprint that separates jitter (level-1-heavy)
    from slow regime structure (level-3-plus), orthogonal to what
    burstiness (timing) and permutation entropy (ordinal) see. Dominant
    level = argmax over EXACT integer energies (ties to the finer level).

    EXACT-INTEGER TRANSFORM: values centi-quantized to BIGINT; the
    unnormalized Haar detail D_k is a signed integer sum, level-k
    coefficient energy is D_k^2/2^k, and with common denominator 8 every
    energy is an exact BIGINT (headroom proof: v <= 4.9e4 centi-units,
    8*sum(v^2) <= 6.2e11, micro-numerators <= 1.2e18 < int64). Fractions
    are integer HALF-UP micro-divisions — no float exists anywhere.

    Scale shape: ONE exchange (the per-user order window); the 29
    conditional sums run in the SAME hash(user_id) partitioning
    exchange-free (rule 20), combine map-side, and emit one row per
    series. Window length is the dial; longer windows add levels, not
    shuffles."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    b = (
        ev.select(
            "user_id",
            F.round(F.col("value") * HAAR_SCALE).cast("long").alias("v"),
            (F.row_number().over(w) - 1).alias("idx"),
        )
        .filter(F.col("idx") < HAAR_LEN)
    )
    d = b.groupBy("user_id").agg(
        *[F.expr(sql).alias(name) for name, sql in _haar_sum_exprs("div")],
        F.count(F.lit(1)).alias("__n"),
    ).filter(F.col("__n") == HAAR_LEN)
    en = _haar_energy_exprs()
    e = d.select(
        "user_id",
        F.expr(en["e1_8"]).alias("e1_8"),
        F.expr(en["e2_8"]).alias("e2_8"),
        F.expr(en["e3_8"]).alias("e3_8"),
        F.expr(en["tot8"]).alias("tot8"),
    )
    return e.select(
        "user_id",
        (F.expr(_haar_frac_sql("e1_8", "div")).cast("double") / 1000000.0).alias(
            "e1_frac"
        ),
        (F.expr(_haar_frac_sql("e2_8", "div")).cast("double") / 1000000.0).alias(
            "e2_frac"
        ),
        (F.expr(_haar_frac_sql("e3_8", "div")).cast("double") / 1000000.0).alias(
            "e3_frac"
        ),
        F.when(
            (F.col("e1_8") >= F.col("e2_8")) & (F.col("e1_8") >= F.col("e3_8")),
            F.lit(1),
        )
        .when(F.col("e2_8") >= F.col("e3_8"), F.lit(2))
        .otherwise(F.lit(3))
        .alias("dominant_level"),
    )


# ---------------------------------------------------------------------------
# X-6 (r10): Markov entropy rate per user (Shannon 1948 §7)
# ---------------------------------------------------------------------------

_ENTROPY_RATE_ORACLE = """
    WITH s AS (
        SELECT user_id, event_type AS cur,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    c AS (
        SELECT user_id, cur, nxt, CAST(COUNT(*) AS BIGINT) AS cij
        FROM s WHERE nxt IS NOT NULL GROUP BY user_id, cur, nxt
    ),
    r AS (
        SELECT user_id, cur, nxt, cij,
               CAST(SUM(cij) OVER (PARTITION BY user_id, cur) AS BIGINT) AS ci
        FROM c
    ),
    m AS (
        SELECT user_id, cij,
               CAST(ROUND(ln(CAST(ci AS DOUBLE) / CAST(cij AS DOUBLE)) * 1000000)
                    AS BIGINT) AS mn
        FROM r
    ),
    agg AS (
        SELECT user_id,
               CAST(SUM(cij) AS BIGINT) AS t,
               CAST(SUM(cij * mn) AS BIGINT) AS s_micro
        FROM m GROUP BY user_id
    ),
    st AS (
        SELECT user_id, CAST(COUNT(DISTINCT cur) AS BIGINT) AS n_states
        FROM c GROUP BY user_id
    )
    SELECT a.user_id, a.t AS n_transitions, st.n_states,
           CAST((2 * a.s_micro + a.t) // (2 * a.t) AS DOUBLE) / 1000000.0
               AS entropy_rate,
           CASE WHEN st.n_states = 1 THEN 0.0
                ELSE ROUND(ln(CAST(st.n_states AS DOUBLE)), 6) END AS max_entropy
    FROM agg a JOIN st ON st.user_id = a.user_id
    """


@query("x6_entropy_rate", _ENTROPY_RATE_ORACLE)
def x6_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6 (r10): MARKOV ENTROPY RATE per user (Shannon 1948 §7) — the
    predictability of each user's behavior sequence: H = Σ_ij (c_ij/T) ·
    ln(c_i/c_ij) over first-order event-type transitions, i.e. how many
    nats the NEXT action carries given the current one. 0 = perfectly
    scripted behavior, ln(n_states) = uniformly random; the per-user
    complement of the corpus-level ``x6_event_type_markov`` matrix and
    the behavioral twin of ``x6_permutation_entropy`` (value order) and
    ``x6_burstiness`` (timing).

    Determinism: the zipf/permutation-entropy ln discipline (rule 26a) —
    each ln of an exact BIGINT-ratio double is rounded to integer
    MICRO-NATS pre-sum, Σ c_ij·m_ij is an exact integer, and the rate is
    one integer HALF-UP micro-division by T; max_entropy rounds after an
    irrational op (tie-free).

    Scale shape: ONE exchange (the user-keyed lead window); the
    transition counts, the per-state row totals (window clustered on a
    user-prefixed key), and both roll-ups all reuse hash(user_id)
    partitioning exchange-free (rule 20)."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    c = s.groupBy("user_id", "cur", "nxt").agg(
        F.count(F.lit(1)).cast("bigint").alias("cij")
    )
    r = c.withColumn(
        "ci", F.sum("cij").over(Window.partitionBy("user_id", "cur")).cast("bigint")
    )
    m = r.select(
        "user_id",
        "cij",
        F.round(F.log(F.col("ci").cast("double") / F.col("cij").cast("double")) * 1000000)
        .cast("bigint")
        .alias("mn"),
    )
    agg = m.groupBy("user_id").agg(
        F.sum("cij").cast("bigint").alias("t"),
        F.sum(F.col("cij") * F.col("mn")).cast("bigint").alias("s_micro"),
    )
    st = c.groupBy("user_id").agg(
        F.countDistinct("cur").cast("bigint").alias("n_states")
    )
    return agg.join(st, "user_id").select(
        "user_id",
        F.col("t").alias("n_transitions"),
        "n_states",
        (
            F.expr("CAST((2 * s_micro + t) div (2 * t) AS BIGINT)").cast("double")
            / 1000000.0
        ).alias("entropy_rate"),
        F.when(F.col("n_states") == 1, F.lit(0.0))
        .otherwise(F.round(F.log(F.col("n_states").cast("double")), 6))
        .alias("max_entropy"),
    )


# ---------------------------------------------------------------------------
# X-6 (r11): autocorrelation function + Ljung-Box whiteness test
# ---------------------------------------------------------------------------

ACF_MAX_LAG = 3
#: Ljung-Box 5% critical value for 3 df, in exact micro-units (7.814728
#: truncated to the 6dp grid the statistic lives on)
LJUNG_BOX_CRIT_MICRO = 7814728

#: shared CTE text: per-user integer moment sums for lags 1..3 over the
#: 3dp-quantized series in (ts, event_id) order. Every sum DuckDB takes
#: over BIGINT auto-widens to HUGEINT; the Spark side mirrors with
#: DECIMAL(38,0) sums (rule 27 — Spark BIGINT sums wrap silently).
_ACF_USER_CTES = f"""
    b AS (
        SELECT user_id,
               CAST(ROUND(value * {_DECOMP_SCALE}) AS BIGINT) AS x,
               LAG(CAST(ROUND(value * {_DECOMP_SCALE}) AS BIGINT), 1)
                   OVER w AS x1,
               LAG(CAST(ROUND(value * {_DECOMP_SCALE}) AS BIGINT), 2)
                   OVER w AS x2,
               LAG(CAST(ROUND(value * {_DECOMP_SCALE}) AS BIGINT), 3)
                   OVER w AS x3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    u AS (
        SELECT user_id,
               COUNT(*)::HUGEINT AS n,
               SUM(x)::HUGEINT AS s,
               SUM(x::HUGEINT * x) AS q,
               SUM(CASE WHEN x1 IS NOT NULL THEN x::HUGEINT * x1 END) AS sxy1,
               SUM(CASE WHEN x2 IS NOT NULL THEN x::HUGEINT * x2 END) AS sxy2,
               SUM(CASE WHEN x3 IS NOT NULL THEN x::HUGEINT * x3 END) AS sxy3,
               SUM(CASE WHEN x1 IS NOT NULL THEN x END)::HUGEINT AS h1,
               SUM(CASE WHEN x2 IS NOT NULL THEN x END)::HUGEINT AS h2,
               SUM(CASE WHEN x3 IS NOT NULL THEN x END)::HUGEINT AS h3,
               SUM(x1)::HUGEINT AS t1,
               SUM(x2)::HUGEINT AS t2,
               SUM(x3)::HUGEINT AS t3
        FROM b GROUP BY user_id
    ),
    uf AS (
        SELECT *, n * n * q - n * s * s AS den
        FROM u WHERE n > {ACF_MAX_LAG} AND n * n * q - n * s * s > 0
    )
"""

#: micro half-up division with sign handling (DuckDB side): num may be
#: negative; `//` floors on HUGEINT, so divide magnitudes and re-sign
def _sql_signed_micro(num: str, den: str) -> str:
    return (
        f"CASE WHEN ({num}) >= 0"
        f" THEN (2 * ({num}) * 1000000 + ({den})) // (2 * ({den}))"
        f" ELSE -((2 * (-({num})) * 1000000 + ({den})) // (2 * ({den})))"
        f" END"
    )


def _sql_acf_num(l: int) -> str:
    return f"n * n * sxy{l} - n * s * (h{l} + t{l}) + (n - {l}) * s * s"


_ACF_ORACLE = f"""
    WITH {_ACF_USER_CTES}
    SELECT user_id,
           lag,
           CAST(n AS BIGINT) AS n,
           CAST(CASE lag
                WHEN 1 THEN {_sql_signed_micro(_sql_acf_num(1), "den")}
                WHEN 2 THEN {_sql_signed_micro(_sql_acf_num(2), "den")}
                ELSE {_sql_signed_micro(_sql_acf_num(3), "den")}
                END AS BIGINT) / 1000000.0 AS acf
    FROM uf CROSS JOIN (VALUES (1), (2), (3)) AS lags(lag)
    """


def _acf_user_stats(ev: DataFrame) -> DataFrame:
    """Per-user exact integer moment sums for the ACF family — one
    ordered-window pass + one keyed aggregate, every sum in
    DECIMAL(38,0) (rule 27: Spark silently wraps BIGINT sums; DuckDB
    auto-widens to HUGEINT — the decimal mirror keeps both exact at
    100 TB series lengths)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    x = F.round(F.col("value") * _DECOMP_SCALE).cast("long")
    b = ev.select(
        "user_id",
        x.alias("x"),
        F.lag(x, 1).over(w).alias("x1"),
        F.lag(x, 2).over(w).alias("x2"),
        F.lag(x, 3).over(w).alias("x3"),
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    aggs = [
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(d("x")).alias("s"),
        F.sum(d("x") * d("x")).alias("q"),
    ]
    for l in (1, 2, 3):  # noqa: E741
        aggs += [
            F.sum(F.when(F.col(f"x{l}").isNotNull(), d("x") * d(f"x{l}"))).alias(
                f"sxy{l}"
            ),
            F.sum(F.when(F.col(f"x{l}").isNotNull(), d("x"))).alias(f"h{l}"),
            F.sum(d(f"x{l}")).alias(f"t{l}"),
        ]
    u = b.groupBy("user_id").agg(*aggs)
    den = F.col("n") * F.col("n") * F.col("q") - F.col("n") * F.col("s") * F.col("s")
    return u.withColumn("den", den).filter(
        (F.col("n") > ACF_MAX_LAG) & (F.col("den") > 0)
    )


def _signed_micro(num, den):
    """Spark mirror of ``_sql_signed_micro``: rule-26b HALF-UP micro
    division in DECIMAL(38,0), magnitudes divided and re-signed so
    Spark's truncating ``div`` and DuckDB's flooring ``//`` agree."""
    mag = F.expr(
        f"(2 * abs({num}) * 1000000 + {den}) div (2 * {den})"
    )
    return F.when(F.expr(num) >= 0, mag).otherwise(-mag)


@query("x6_acf", _ACF_ORACLE)
def x6_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6 (r11): the STANDARD autocorrelation estimator at lags 1..3
    per user series — r_l = Σ(x_t−x̄)(x_{t−l}−x̄) / Σ(x_t−x̄)² with the
    GLOBAL mean and variance (Box & Jenkins 1970 ch.2). Deliberately
    distinct from ``x6_ts_acf`` (r6), which computes the pairwise-
    Pearson variant (per-lag means/variances over the overlapping
    pairs): the two estimators differ at short series and ONLY the
    standard one is valid input to the Ljung-Box statistic
    (``x6_ljung_box`` composes this, not the Pearson variant — Ljung &
    Box's null distribution assumes the common-denominator r_k).
    r_l is evaluated
    ENTIRELY in integers: with S=Σx, Q=Σx², H/T the lagged head/tail
    sums and Sxy the lag product sum over the 3dp-quantized series,
    r_l = (n²·Sxy − n·S·(H+T) + (n−l)·S²) / (n²·Q − n·S²) — numerator
    and denominator exact 128-bit integers (rule 27; products reach
    ~1e17 at fixture scale and overflow int64 at ~10×), quotient via
    the rule-26b HALF-UP micro division with explicit sign handling
    (Spark `div` truncates, DuckDB `//` floors — magnitudes are divided,
    then re-signed, so the engines agree on negative correlations).
    Constant series (den=0) and series shorter than the max lag are
    excluded by both engines.

    Scale shape: ONE ordered window pass (three LAGs share the frame)
    + ONE user-keyed aggregate; the 3-row lag explosion joins a 3-row
    literal table. All exchanges key on user_id — series-bounded, the
    x6 family's partitioning; nothing quadratic."""
    return acf_rows(spark, read_table(spark, sf_dir, "events"))


def acf_rows(spark: SparkSession, ev: DataFrame) -> DataFrame:
    """Core of ``x6_acf`` over an arbitrary (user_id, ts, event_id,
    value) frame — split out so closed-form series (alternating ±1 →
    r_l = ±(n−l)/n exactly) pin the integer pipeline in pytest."""
    uf = _acf_user_stats(ev)
    lags = spark.createDataFrame([(1,), (2,), (3,)], "lag int")
    num = (
        "CASE lag WHEN 1 THEN n * n * sxy1 - n * s * (h1 + t1) + (n - 1) * s * s"
        " WHEN 2 THEN n * n * sxy2 - n * s * (h2 + t2) + (n - 2) * s * s"
        " ELSE n * n * sxy3 - n * s * (h3 + t3) + (n - 3) * s * s END"
    )
    return uf.crossJoin(F.broadcast(lags)).select(
        "user_id",
        "lag",
        F.col("n").cast("bigint").alias("n"),
        (_signed_micro(num, "den").cast("bigint").cast("double") / 1000000.0).alias(
            "acf"
        ),
    )


_LJUNG_ORACLE = f"""
    WITH {_ACF_USER_CTES},
    r AS (
        SELECT user_id, n,
               {_sql_signed_micro(_sql_acf_num(1), "den")} AS r1,
               {_sql_signed_micro(_sql_acf_num(2), "den")} AS r2,
               {_sql_signed_micro(_sql_acf_num(3), "den")} AS r3
        FROM uf
    )
    SELECT user_id,
           CAST(n AS BIGINT) AS n,
           CAST((2 * (n * (n + 2) * (r1 * r1 * (n - 2) * (n - 3)
                                     + r2 * r2 * (n - 1) * (n - 3)
                                     + r3 * r3 * (n - 1) * (n - 2)))
                 + 1000000 * (n - 1) * (n - 2) * (n - 3))
                // (2 * 1000000 * (n - 1) * (n - 2) * (n - 3)) AS BIGINT)
               / 1000000.0 AS q_lb,
           CAST(CASE WHEN (2 * (n * (n + 2) * (r1 * r1 * (n - 2) * (n - 3)
                                     + r2 * r2 * (n - 1) * (n - 3)
                                     + r3 * r3 * (n - 1) * (n - 2)))
                 + 1000000 * (n - 1) * (n - 2) * (n - 3))
                // (2 * 1000000 * (n - 1) * (n - 2) * (n - 3))
                > {LJUNG_BOX_CRIT_MICRO} THEN 1 ELSE 0 END AS INTEGER)
               AS is_nonwhite
    FROM r
    """


@query("x6_ljung_box", _LJUNG_ORACLE)
def x6_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6 (r11): LJUNG-BOX PORTMANTEAU TEST (Ljung & Box, Biometrika
    1978) — the standard whiteness test over the first ACF_MAX_LAG
    autocorrelations: Q = n(n+2) Σ r_k²/(n−k), compared against the
    chi-square(3) 5% critical value. The one-number answer to "does
    this series have ANY linear structure worth modeling", composing
    ``x6_acf``'s integer machinery: with r_k in exact micro-units, Q is
    assembled under the common denominator 10⁶·(n−1)(n−2)(n−3) as ONE
    128-bit integer HALF-UP micro-division (numerator ~n⁴·10¹² — far
    past int64, decimal(38,0)/HUGEINT territory, rule 27), and the
    5%-level decision compares micro-integers, never floats. The fixed
    3-term sum is written as explicit r1/r2/r3 columns, so no
    aggregation-order float hazard exists anywhere in the chain
    (rule 26a by construction).

    Scale shape: identical to x6_acf (one window pass + one keyed
    aggregate), minus the lag explosion — strictly per-user scalar
    math after the roll-up."""
    return ljung_rows(read_table(spark, sf_dir, "events"))


def ljung_rows(ev: DataFrame) -> DataFrame:
    """Core of ``x6_ljung_box`` over an arbitrary frame (see
    ``acf_rows``); the alternating-series pin has the closed form
    Q = n(n+2)·Σ((n−k)/n)²/(n−k)."""
    uf = _acf_user_stats(ev)
    r = uf.select(
        "user_id",
        "n",
        _signed_micro(
            "n * n * sxy1 - n * s * (h1 + t1) + (n - 1) * s * s", "den"
        ).alias("r1"),
        _signed_micro(
            "n * n * sxy2 - n * s * (h2 + t2) + (n - 2) * s * s", "den"
        ).alias("r2"),
        _signed_micro(
            "n * n * sxy3 - n * s * (h3 + t3) + (n - 3) * s * s", "den"
        ).alias("r3"),
    )
    qnum = (
        "n * (n + 2) * (r1 * r1 * (n - 2) * (n - 3)"
        " + r2 * r2 * (n - 1) * (n - 3)"
        " + r3 * r3 * (n - 1) * (n - 2))"
    )
    qden = "1000000 * (n - 1) * (n - 2) * (n - 3)"
    q_micro = F.expr(f"(2 * ({qnum}) + {qden}) div (2 * ({qden}))").cast("bigint")
    return r.select(
        "user_id",
        F.col("n").cast("bigint").alias("n"),
        (q_micro.cast("double") / 1000000.0).alias("q_lb"),
        (q_micro > LJUNG_BOX_CRIT_MICRO).cast("int").alias("is_nonwhite"),
    )


# ---------------------------------------------------------------------------
# X-6 (r11): Hampel robust outliers (exact-integer median / MAD)
# ---------------------------------------------------------------------------

#: Hampel threshold |x − med| > 3·1.4826·MAD, cross-multiplied into the
#: pure-integer comparison 10000·d2 > 22239·mad4 (d2 = doubled deviation
#: in 3dp units, mad4 = quadrupled MAD; 22239 = 3·14826/2)
_HAMPEL_NUM, _HAMPEL_DEN = 22239, 10000

_HAMPEL_ORACLE = f"""
    WITH b AS (
        SELECT user_id, event_id, value,
               CAST(ROUND(value * {_DECOMP_SCALE}) AS BIGINT) AS sv
        FROM events
    ),
    o AS (
        SELECT user_id, event_id, value, sv,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY sv, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS n
        FROM b
    ),
    med AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN n % 2 = 1 AND 2 * rn = n + 1 THEN 2 * sv
                             WHEN n % 2 = 0 AND (2 * rn = n OR 2 * rn = n + 2)
                                  THEN sv
                             ELSE 0 END) AS BIGINT) AS m2
        FROM o GROUP BY user_id
    ),
    d AS (
        SELECT o.user_id, o.event_id, o.value, ABS(2 * o.sv - m.m2) AS d2
        FROM o JOIN med m USING (user_id)
    ),
    dr AS (
        SELECT user_id, event_id, d2,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY d2, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS n
        FROM d
    ),
    mad AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN n % 2 = 1 AND 2 * rn = n + 1 THEN 2 * d2
                             WHEN n % 2 = 0 AND (2 * rn = n OR 2 * rn = n + 2)
                                  THEN d2
                             ELSE 0 END) AS BIGINT) AS mad4
        FROM dr GROUP BY user_id
    )
    SELECT d.user_id, d.event_id, d.value,
           d.d2 / {2 * _DECOMP_SCALE}.0 AS abs_dev,
           m.mad4 / {4 * _DECOMP_SCALE}.0 AS mad
    FROM d JOIN mad m USING (user_id)
    WHERE m.mad4 > 0 AND {_HAMPEL_DEN} * d.d2 > {_HAMPEL_NUM} * m.mad4
    """


@query("x6_robust_outliers", _HAMPEL_ORACLE)
def x6_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6 (r11): HAMPEL ROBUST OUTLIERS — the median/MAD outlier filter
    (Hampel 1974; the identifier robust statistics recommends over
    z-scores, whose mean AND sd are themselves corrupted by the very
    outliers being hunted — a 50%-breakdown estimator pair instead of
    0%): flag every event with |x − median| > 3·1.4826·MAD of its
    user's series. The family's point-anomaly complement to CUSUM
    (level shifts) and the matrix-profile discords (shape anomalies).

    EXACT-INTEGER ORDER STATISTICS — the engineering point: exact
    medians of even-length series are half-integers, and interpolating
    percentile functions differ subtly across engines, so both medians
    are computed in DOUBLED integer space from ROW_NUMBER order
    statistics (odd n: 2·x_{{(n+1)/2}}; even: x_{{n/2}} + x_{{n/2+1}})
    — m2 and mad4 are exact BIGINTs, the Hampel test cross-multiplies
    into the pure-integer comparison 10000·d2 > 22239·mad4 (no float
    anywhere, rule 11/26 satisfied by construction), and the emitted
    abs_dev/mad are exact dyadic rationals (halves/quarters of 3dp
    units — exactly representable doubles). Zero-MAD series (>50%
    identical values) are excluded by both engines — the documented
    Hampel degenerate case where every other value would flag.

    Scale shape: two ordered windows + two keyed aggregates + two
    equi-joins, ALL keyed on user_id (series-bounded, one partitioning
    reused); no corpus-wide window, nothing quadratic."""
    return hampel_outliers(read_table(spark, sf_dir, "events"))


def doubled_median(df: DataFrame, col: str, out: str) -> DataFrame:
    """Exact per-user median of an integer column in DOUBLED integer
    space (odd n: 2·x_{(n+1)/2}; even: x_{n/2} + x_{n/2+1}), from
    ROW_NUMBER order statistics — shared by the batch Hampel operator
    and the streaming monitor's offline baseline fit."""
    w = Window.partitionBy("user_id").orderBy(col, "event_id")
    wn = Window.partitionBy("user_id")
    o = df.select(
        "user_id",
        col,
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    pick = (
        F.when(
            (F.col("n") % 2 == 1) & (2 * F.col("rn") == F.col("n") + 1),
            2 * F.col(col),
        )
        .when(
            (F.col("n") % 2 == 0)
            & ((2 * F.col("rn") == F.col("n")) | (2 * F.col("rn") == F.col("n") + 2)),
            F.col(col),
        )
        .otherwise(F.lit(0))
    )
    return o.groupBy("user_id").agg(F.sum(pick).cast("bigint").alias(out))


def hampel_outliers(ev: DataFrame) -> DataFrame:
    """Core of ``x6_robust_outliers`` over an arbitrary (user_id,
    event_id, value) frame — split out so hand-computed odd/even-median
    and zero-MAD series pin the integer pipeline in pytest."""
    b = ev.select(
        "user_id",
        "event_id",
        "value",
        F.round(F.col("value") * _DECOMP_SCALE).cast("long").alias("sv"),
    )
    med = doubled_median(b, "sv", "m2")
    d = b.join(med, "user_id").select(
        "user_id",
        "event_id",
        "value",
        F.abs(2 * F.col("sv") - F.col("m2")).alias("d2"),
    )
    mad = doubled_median(d, "d2", "mad4")
    return (
        d.join(mad, "user_id")
        .filter(
            (F.col("mad4") > 0)
            & (_HAMPEL_DEN * F.col("d2") > _HAMPEL_NUM * F.col("mad4"))
        )
        .select(
            "user_id",
            "event_id",
            "value",
            (F.col("d2").cast("double") / (2.0 * _DECOMP_SCALE)).alias("abs_dev"),
            (F.col("mad4").cast("double") / (4.0 * _DECOMP_SCALE)).alias("mad"),
        )
    )


# ---------------------------------------------------------------------------
# X-6 (r13): AR(1) fit + mean-reversion half-life
# ---------------------------------------------------------------------------

#: the CASE/ln expression shared verbatim by both engines (rule 24: the
#: micro int is CAST AS DOUBLE before the division; ROUND lands after an
#: irrational ln ratio, so it is tie-free — rule 26)
_AR1_HL_EXPR = (
    "CASE WHEN phi_micro > 0 AND phi_micro < 1000000"
    " THEN ROUND((0 - ln(2)) / ln(CAST(phi_micro AS DOUBLE) / 1000000), 6)"
    " ELSE NULL END"
)

@query(
    "x6_ar1_halflife",
    f"""
    WITH {_ACF_USER_CTES},
    ph AS (
        SELECT user_id,
               CAST(n AS BIGINT) AS n,
               CAST({_sql_signed_micro(_sql_acf_num(1), "den")} AS BIGINT)
                   AS phi_micro
        FROM uf
    )
    SELECT user_id, n, phi_micro, {_AR1_HL_EXPR} AS half_life
    FROM ph
    """,
)
def x6_ar1_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6 (r13): AR(1) FIT + MEAN-REVERSION HALF-LIFE per user series —
    the Yule-Walker estimate for lag order 1 is exactly the lag-1
    autocorrelation (φ̂ = r₁ — Box & Jenkins 1970 ch.3), and the quantity
    an operations/capacity analyst actually reads off it is the
    mean-reversion half-life −ln 2 / ln φ (how many steps until a
    deviation from the series mean decays to half — the standard
    Ornstein-Uhlenbeck discretization reading). φ ≤ 0 (no reversion
    toward the mean from positive persistence) and φ ≥ 1 (non-stationary)
    emit NULL, documented.

    Determinism: φ comes out of the SAME exact-integer ACF machinery as
    ``x6_acf`` (DECIMAL(38,0) moment sums, rule-28 signed micro
    division — shared ``_acf_user_stats``/``_sql_acf_num`` so the two
    queries cannot disagree on φ); the half-life is the shared
    ``_AR1_HL_EXPR`` (byte-identical SQL text both engines, CAST AS
    DOUBLE per rule 24, ROUND after an irrational ln ratio — tie-free).

    Scale shape: identical to x6_acf — one ordered window pass for the
    lag column + ONE user-keyed hash aggregate; the half-life is a
    per-row scalar on the user-grain result. No joins."""
    u = _acf_user_stats(read_table(spark, sf_dir, "events"))
    ph = u.select(
        "user_id",
        F.col("n").cast("bigint").alias("n"),
        _signed_micro(_sql_acf_num(1), "den")
        .cast("bigint")
        .alias("phi_micro"),
    )
    return ph.select(
        "user_id", "n", "phi_micro", F.expr(_AR1_HL_EXPR).alias("half_life")
    )
