"""Local replica of the driver's DuckDB-oracle comparison.

Compares a Spark DataFrame result against a DuckDB SQL result:
row count, sorted column names, and order-insensitive exact values.
Exact (not tolerance-based) float comparison — if this passes, the driver's
value-hash comparison will pass too.

TYPE-STRICT (r7): the driver hashes the *string form* of every cell, so
``0.0`` and ``0`` are different answers even though Python ``0.0 == 0``.
The r4-r6 HUGEINT incident (VERDICT r6 #1-2): DuckDB's ``SUM(BIGINT) OVER``
widens to int128, pandas cannot hold int128 so the column arrives as
float64, and the driver saw ``"0.0" != "0"`` on every row — while this
replica's ``==`` comparison silently passed for three rounds. Cells are now
canonicalized as ``(kind, value)`` pairs (int / float / bool / str /
datetime / null), so a cross-engine numeric-kind divergence is a replica
failure, exactly as it is a driver failure.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import pandas as pd


def fetch_df(duck, sql: str) -> pd.DataFrame:
    """Fetch a DuckDB oracle result for ``compare``.

    Goes through Arrow (``date_as_object`` default) rather than ``.df()``:
    the pandas boundary erases DATE into midnight ``Timestamp``s, which
    would make a genuine DATE-vs-TIMESTAMP cross-engine divergence
    invisible (ADVICE r07 item 3). Arrow hands DATE columns over as
    ``datetime.date`` objects, matching how Spark's ``toPandas`` delivers
    DateType — so the distinct ``date`` kind below is strict without
    false-flagging driver-green DATE queries (tpch_q3, n10_scalar_suite).
    """
    return duck.execute(sql).arrow().to_pandas()


def _norm_cell(v):
    """Canonicalize one cell as a (kind, value) pair.

    Kinds mirror what the driver's stringification distinguishes: an int64
    cell prints ``0`` and a float64 cell prints ``0.0``, so they must NOT
    compare equal here even though Python ``0 == 0.0``. NaN/NaT fold to
    null (both engines surface missing data that way after the pandas
    boundary). bool is tagged separately from int (``True`` vs ``1``).
    """
    if v is None:
        return ("null", None)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("null", None)
        return ("f", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, Decimal):
        return ("d", v)
    if isinstance(v, str):
        return ("s", v)
    if v is pd.NaT:
        return ("null", None)
    if isinstance(v, pd.Timestamp):
        return ("t", v.to_pydatetime())
    if isinstance(v, datetime):
        return ("t", v)
    if isinstance(v, date):
        # Own kind (ADVICE r07): the driver's string hash distinguishes
        # DATE ("2024-01-01") from TIMESTAMP ("2024-01-01 00:00:00"), so
        # promoting dates to midnight datetimes would hide a cross-engine
        # DATE-vs-TIMESTAMP column divergence from this replica.
        return ("date", v)
    if isinstance(v, (list, tuple)):
        return ("a", tuple(_norm_cell(x) for x in v))
    try:
        import numpy as np

        if isinstance(v, np.generic):
            return _norm_cell(v.item())
        if isinstance(v, np.ndarray):
            return ("a", tuple(_norm_cell(x) for x in v.tolist()))
    except ImportError:
        pass
    return (type(v).__name__, v)


def _canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    return sorted(rows, key=repr)


def compare(spark_df, duck_df: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = parity)."""
    problems: list[str] = []
    spark_pdf = spark_df.toPandas()
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_df.columns)
    if s_cols != d_cols:
        return [f"schema mismatch: spark={s_cols} duck={d_cols}"]
    if len(spark_pdf) != len(duck_df):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_df)}")
    s_rows, d_rows = _canon(spark_pdf), _canon(duck_df)
    n_bad = 0
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        if a != b:
            n_bad += 1
            if n_bad <= 3:
                problems.append(f"row {i}: spark={a!r} duck={b!r}")
    if n_bad > 3:
        problems.append(f"... {n_bad} mismatched rows total of {len(s_rows)}")
    return problems
