"""Local replica of the driver's DuckDB-oracle comparison.

Compares a Spark DataFrame result against a DuckDB SQL result:
row count, sorted column names, and order-insensitive exact values.
Exact (not tolerance-based) float comparison — if this passes, the driver's
value-hash comparison will pass too.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import pandas as pd


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return v
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if isinstance(v, datetime):
        return v
    if isinstance(v, date):
        return datetime(v.year, v.month, v.day)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    try:
        import numpy as np

        if isinstance(v, np.generic):
            return _norm_cell(v.item())
        if isinstance(v, np.ndarray):
            return tuple(_norm_cell(x) for x in v.tolist())
    except ImportError:
        pass
    return v


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
