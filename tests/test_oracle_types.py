"""Oracle output-type gate (VERDICT r6 #2).

DuckDB silently widens some expressions past int64 — most notably
``SUM(BIGINT) OVER (...)`` returns HUGEINT (int128). pandas has no int128,
so ``.df()`` hands the column over as float64, and the driver's value hash
then compares ``"0.0"`` against Spark's ``"0"`` — a deterministic hash
failure that rows/schema checks cannot see (the r4-r6 x8/x9 incident).

This sweep runs ``DESCRIBE`` (plan-only, no execution) over every
registered oracle at sf0.01 and fails if any output column has a type that
pandas cannot represent losslessly: HUGEINT/UHUGEINT, or DECIMAL wider
than 18 digits (also widened to float64/object inconsistently). Every
aggregate/window-derived key must be explicitly ``CAST(... AS BIGINT)``
in the oracle text.

Also pins the type-strict replica itself: a synthetic HUGEINT-vs-BIGINT
pair must be flagged by ``tests.parity.compare``'s canonicalizer (it was
invisible to the pre-r7 ``==``-based comparison, which is why the driver
failed for three rounds while the replica stayed green).
"""

from __future__ import annotations

import pytest

from etl_active911_spark.plans import registry
from tests.parity import _canon

registry.load_all()

ORACLE_KEYS = sorted(registry.ORACLES)

_FORBIDDEN = ("HUGEINT", "UHUGEINT", "INT128", "UINT128")


def _decimal_too_wide(type_str: str) -> bool:
    # DECIMAL(p,s) with p > 18 exceeds int64 scaled range -> pandas object
    # or float64 depending on duckdb version; either way not hash-stable
    # against Spark's output.
    import re

    m = re.match(r"DECIMAL\((\d+),", type_str)
    return bool(m and int(m.group(1)) > 18)


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_oracle_emits_no_unrepresentable_types(duck, name):
    desc = duck.execute(f"DESCRIBE {registry.ORACLES[name]}").df()
    bad = []
    for col, typ in zip(desc["column_name"], desc["column_type"]):
        t = str(typ).upper()
        if any(f in t for f in _FORBIDDEN) or _decimal_too_wide(t):
            bad.append(f"{col}: {typ}")
    assert not bad, (
        f"{name}: oracle emits pandas-unrepresentable column type(s) {bad} — "
        f"wrap the expression in CAST(... AS BIGINT) (or narrow the DECIMAL)"
    )


def test_replica_catches_hugeint_float_widening(duck):
    """The exact r4-r6 failure shape, reduced: DuckDB windowed SUM group key
    arrives as float64 (0.0, 1.0, ...) while Spark-side would be int64.
    The type-strict canonicalizer must distinguish them."""
    import pandas as pd

    # what the HUGEINT oracle used to hand the driver
    duck_like = duck.execute(
        "SELECT (SUM(x) OVER (ORDER BY x)) // 2 AS k FROM (VALUES (1::BIGINT), (2)) t(x)"
    ).df()
    assert str(duck_like["k"].dtype) == "float64", "repro precondition changed"
    spark_like = pd.DataFrame({"k": pd.Series([0, 1], dtype="int64")})
    assert _canon(duck_like) != _canon(spark_like), (
        "replica failed to distinguish float64-widened HUGEINT from int64 — "
        "the driver's value hash DOES distinguish them"
    )
    # and the post-CAST shape must agree
    duck_fixed = duck.execute(
        "SELECT CAST((SUM(x) OVER (ORDER BY x)) // 2 AS BIGINT) AS k "
        "FROM (VALUES (1::BIGINT), (2)) t(x)"
    ).df()
    assert _canon(duck_fixed) == _canon(spark_like)


def test_replica_distinguishes_date_from_midnight_timestamp():
    """ADVICE r07: a DATE column and a midnight-TIMESTAMP column are
    different answers (the driver stringifies them differently), so the
    replica's cell canonicalizer must NOT fold ``datetime.date`` into
    ``datetime``. Paired with ``parity.fetch_df`` going through Arrow
    (which preserves DuckDB DATE as ``date`` objects), this makes a
    cross-engine DATE-vs-TIMESTAMP divergence a replica failure."""
    from datetime import date, datetime

    from tests.parity import _norm_cell

    d = _norm_cell(date(2024, 1, 2))
    t = _norm_cell(datetime(2024, 1, 2, 0, 0))
    assert d != t
    assert d == _norm_cell(date(2024, 1, 2))


def test_fetch_df_preserves_duckdb_date_objects(duck):
    """The ``.df()`` pandas boundary erases DATE into midnight
    Timestamps; ``fetch_df`` (Arrow, date_as_object) must not."""
    from datetime import date

    from tests.parity import fetch_df

    pdf = fetch_df(duck, "SELECT DATE '2024-01-02' AS d")
    assert type(pdf["d"][0]) is date
