"""Skew- and layout-aware helpers (SCALE.md "what changes at 1000
executors"): key salting for hot keys and bucketed co-located joins.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; these helpers cover the two cases it can't:
- hot-key *aggregation* skew (AQE only splits join partitions), via
  two-phase salted aggregation;
- repeated large joins on a stable key, via bucketed table layout that
  removes the shuffle from every future join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _data_salt(df: DataFrame, n_salts: int, seed: int = 0x5A17) -> Column:
    """Deterministic per-row salt derived from the DATA (SCALE.md
    invariant 9: no physical-plan-state columns — `spark_partition_id`/
    `monotonically_increasing_id` give each consumer of a recomputed or
    AQE-re-planned subtree DIFFERENT values). Hashing every column makes
    rows of the same hot key spread across salts while staying a pure
    function of the row: recomputation always reproduces the same salt.
    Fully-duplicate rows share a salt bucket — correct, just less spread
    on degenerate all-duplicate corpora."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns], F.lit(seed)), F.lit(n_salts))


def salted_agg(
    df: DataFrame,
    key: str,
    agg_exprs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    Phase 1 groups by (key, salt) — the hot key's rows spread over
    ``n_salts`` reducers; phase 2 merges the partials per key. Only
    decomposable aggregates are supported (sum/count/min/max).
    """
    mergers = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    firsts = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    salted = df.withColumn("__salt", _data_salt(df, n_salts))
    phase1 = salted.groupBy(key, "__salt").agg(
        *[firsts[fn](c).alias(f"__p_{c}_{fn}") for c, fn in agg_exprs.items()]
    )
    return phase1.groupBy(key).agg(
        *[mergers[fn](f"__p_{c}_{fn}").alias(f"{fn}_{c}") for c, fn in agg_exprs.items()]
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe equi-join: salt the skewed side, explode the small side
    ``n_salts``× so every salted key finds its match. Use when the small
    side is too big to broadcast but the key distribution is pathological
    (otherwise prefer broadcast or AQE skew-join)."""
    salted_big = skewed.withColumn("__salt", _data_salt(skewed, n_salts))
    exploded_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>"))
    )
    return salted_big.join(exploded_small, [key, "__salt"]).drop("__salt")
