"""Canonicalization policy for oracle parity (SURVEY.md §4 "deterministic
hash-match output" and §7 hard-part #4).

The driver compares Spark vs DuckDB results by order-insensitive value
hash, so every query must emit values that are bit-identical across
engines. Policy (applied in every registered query):

1. **Aliases**: every computed/aggregate column is aliased identically in
   the DataFrame code and the oracle SQL — the compare sorts columns by
   name before hashing.
2. **Float aggregates**: sums/avgs of doubles accumulate in engine-specific
   order → last-ulp drift. All floating aggregates are rounded: ROUND(x, 2)
   for money-scale sums, ROUND(x, 6) for ratios/averages/similarities.
   Per-row arithmetic (a*b, a-b) is IEEE-exact in both engines and is NOT
   rounded unless aggregated.
3. **Ranking determinism**: any row_number/limit ties are broken by a
   unique key column, and rank ordering uses the *rounded* score so both
   engines select identical rows.
4. **Timestamps**: fixture nanos are converted to microseconds with integer
   division (io.py); event-time results are exchanged as naive-UTC
   timestamps; parsed Active911 times travel as ISO-8601 strings produced
   via TIMESTAMP_NTZ so neither engine's session timezone can leak in.
5. **Integer casts**: COUNT/len() products are cast to BIGINT on both
   sides; DuckDB emits int128 for some aggregates otherwise.
6. **No nondeterministic functions** (rand, uuid, now) anywhere in
   oracle-checked queries; "random" hashing uses xxhash64/sha2 with fixed
   seeds only.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: decimal places for money-scale sums (policy item 2)
MONEY_SCALE = 2
#: decimal places for ratios, averages, cosines (policy item 2)
RATIO_SCALE = 6


def money(col: Column) -> Column:
    return F.round(col, MONEY_SCALE)


def ratio(col: Column) -> Column:
    return F.round(col, RATIO_SCALE)
