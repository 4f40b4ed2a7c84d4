"""X-6 over streams: CUSUM level-shift alarms via
``applyInPandasWithState`` (VERDICT r10 item 6 — the r10 X-6 wave's first
streaming twin, same evidence standard as ``pattern.py``/
``x9_stream_curation``: batch ≡ stream pinned on the fixture).

Page's CUSUM assumes a KNOWN in-control baseline (mu, sigma) — that is
the production regime: the baseline is fitted offline and the monitor
runs against it. The batch query (``x6_cusum_changepoint``) estimates
the baseline in-sample for the oracle; this twin takes the SAME baseline
as a static table (``cusum_baseline``) stream-static-joined to the
events, so the two compute identical deviations.

The batch form evaluates the recursion ``S_t = max(0, S_{t-1} + dev_t)``
through its prefix closed form ``S_t = P_t - min(0, min_{j<=t} P_j)``
(two window frames). State here carries exactly that closed form's two
accumulators — the running prefix sum ``pf`` and the running prefix-min
``pfmin`` — updated as a left fold in the batch's (ts, event_id) order,
so every float op replays the batch window's accumulation sequence
bit-for-bit (the parity test compares exact rounded values). State size
is O(users × 2 doubles), independent of stream length.

Emits (user_id, event_id, cusum) whenever the rounded statistic crosses
CUSUM_H; the batch query's per-user severity ``rnk`` is a
whole-result-set ordering and is attached downstream of the stream (the
parity pin compares the alarm SET, matching the x9_stream_curation
standard).
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.window import Window

from etl_active911_spark.operators.timeseries import CUSUM_H, CUSUM_K

OUTPUT_SCHEMA = "user_id long, event_id long, cusum double"
STATE_SCHEMA = "pf double, pfmin double"


def cusum_baseline(ev: DataFrame) -> DataFrame:
    """Per-user in-control baseline (user_id, mu, sd), sd > 0 only —
    computed with the SAME whole-partition window expressions as the
    batch operator (not a groupBy agg: partial aggregation can reorder
    the float accumulation; the window accumulates in the identical
    order, keeping stream deviations bit-equal to batch). Zero-variance
    users are excluded here and produce no alarms in the batch either
    (NULL deviations filter out)."""
    w_all = Window.partitionBy("user_id")
    return (
        ev.select(
            "user_id",
            F.avg("value").over(w_all).alias("mu"),
            F.stddev_pop("value").over(w_all).alias("sd"),
        )
        .distinct()
        .filter(F.col("sd") > 0)
    )


def _cusum_update(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    pf, pfmin = state.get if state.exists else (0.0, 0.0)
    out_eids, out_vals = [], []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for eid, val, mu, sd in zip(
            pdf["event_id"], pdf["value"], pdf["mu"], pdf["sd"]
        ):
            dev = (float(val) - float(mu)) / float(sd) - CUSUM_K
            pf = pf + dev
            pfmin = min(pfmin, pf)
            # closed form, batch op order: pf - min(0, running-min);
            # round-then-compare mirrors the batch filter (policy 4)
            cusum = round(pf - min(0.0, pfmin), 6)
            if cusum > CUSUM_H:
                out_eids.append(int(eid))
                out_vals.append(cusum)
    state.update((pf, pfmin))
    yield pd.DataFrame(
        {
            "user_id": [user_id] * len(out_eids),
            "event_id": out_eids,
            "cusum": out_vals,
        }
    )


def cusum_alarm_stream(events: DataFrame, baseline: DataFrame) -> DataFrame:
    """Streaming CUSUM monitor: ``events`` is the (possibly streaming)
    (user_id, ts, event_id, value) frame; ``baseline`` the static
    per-user (mu, sd) table. Stream-static inner join (users without a
    valid baseline are unmonitored, matching batch NULL-filtering), then
    stateful per-user fold."""
    return (
        events.select("user_id", "ts", "event_id", "value")
        .join(baseline, "user_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            _cusum_update,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# r11: streaming Hampel monitor (stateless twin of x6_robust_outliers)
# ---------------------------------------------------------------------------


def hampel_baseline(ev: DataFrame) -> DataFrame:
    """Per-user robust baseline (user_id, m2, mad4) — the doubled-integer
    median and quadrupled MAD from the batch operator's exact order
    statistics, fitted offline exactly like ``cusum_baseline``. Zero-MAD
    users are excluded (the batch operator's documented degenerate
    case), so joined events from them are unmonitored in both forms."""
    from etl_active911_spark.operators.timeseries import (
        _DECOMP_SCALE,
        doubled_median,
    )

    b = ev.select(
        "user_id",
        "event_id",
        F.round(F.col("value") * _DECOMP_SCALE).cast("long").alias("sv"),
    )
    med = doubled_median(b, "sv", "m2")
    d = b.join(med, "user_id").select(
        "user_id", "event_id", F.abs(2 * F.col("sv") - F.col("m2")).alias("d2")
    )
    mad = doubled_median(d, "d2", "mad4")
    return (
        med.join(mad, "user_id").filter(F.col("mad4") > 0).select(
            "user_id", "m2", "mad4"
        )
    )


def hampel_alarm_stream(events: DataFrame, baseline: DataFrame) -> DataFrame:
    """Streaming Hampel monitor: a STATELESS gate — stream-static inner
    join to the fitted (m2, mad4) baseline, then the batch operator's
    exact cross-multiplied integer test per event. No state store at
    all: the robust baseline regime's entire memory lives in the
    offline fit, which is what makes Hampel the cheapest deployable
    point-anomaly monitor (contrast the CUSUM twin's 2-double state).
    Emits (user_id, event_id, value, abs_dev, mad) identical to the
    batch rows — batch ≡ stream pinned in tests/test_streaming.py."""
    from etl_active911_spark.operators.timeseries import (
        _DECOMP_SCALE,
        _HAMPEL_DEN,
        _HAMPEL_NUM,
    )

    sv = F.round(F.col("value") * _DECOMP_SCALE).cast("long")
    return (
        events.select("user_id", "event_id", "value")
        .join(baseline, "user_id")
        .select(
            "user_id",
            "event_id",
            "value",
            F.abs(2 * sv - F.col("m2")).alias("d2"),
            "mad4",
        )
        .filter(_HAMPEL_DEN * F.col("d2") > _HAMPEL_NUM * F.col("mad4"))
        .select(
            "user_id",
            "event_id",
            "value",
            (F.col("d2").cast("double") / (2.0 * _DECOMP_SCALE)).alias("abs_dev"),
            (F.col("mad4").cast("double") / (4.0 * _DECOMP_SCALE)).alias("mad"),
        )
    )
