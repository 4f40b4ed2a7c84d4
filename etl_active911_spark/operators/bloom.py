"""N-19: bloom-filter runtime pre-filter for selective joins.

The scale problem (reference behavior: the connector's per-agency alert
fetch is a selective semi-join of a huge fact stream against a small,
dynamically-filtered key set — ``task.ts:122-141``): at 100 TB the fact
side of ``fact SEMI JOIN filtered_dim`` should not shuffle at all, and
even a broadcast of the exact key set can be too wide when keys are
strings. The classic fix — what Spark's own runtime row-level filtering
does under ``spark.sql.optimizer.runtime.bloomFilter.enabled`` — is to
condense the build side into a fixed-size bloom bitset, broadcast THAT,
and pre-filter the fact scan before the exact join.

Spark 4.1 does not expose ``bloom_filter_agg``/``might_contain`` as
public SQL functions, so this operator builds the bloom honestly from
DataFrame primitives, entirely JVM-side and deterministic:

- build: k=4 seeded ``xxhash64`` bit positions per key (r15: the bloom
  geometry never surfaces in the RESULT — the oracle is the exact
  semi-join — so the hash needs no cross-engine replica, and the
  md5+concat+conv chain the first cut borrowed from the sketch oracles
  was pure per-row cost: 4 native xxhash64 calls on the raw bigint key
  replace 4 md5s over built strings), ``bit_or``-aggregated into <= 2048
  32-bit words — a fixed-size table INDEPENDENT of build-side
  cardinality (the whole point vs broadcasting the key set itself);
- probe: the word table (<= 2048 longs, densified IN-PLAN — the bits
  never touch the driver) rides as a ONE-ROW broadcast, so
  each of the 4 bit tests is a pure codegen ``element_at`` + ``&`` on the
  scanned row: the fact side is filtered right after its scan with no
  shuffle — exactly how a native engine broadcasts bloom bits, and
  measured faster than probing the word table via chained broadcast hash
  joins (see ``bloom_probe``);
- verify: exact broadcast semi-join removes the ~0.1% false positives
  (m/n ~ 21 bits/key at this segment size), so the RESULT is exactly the
  semi-join — which is why the DuckDB oracle is the plain semi-join: any
  false NEGATIVE in the bloom build/probe (the bug class that silently
  loses data) fails the driver's row-count/hash gate end-to-end.

At 1000 executors the only broadcast is <= 2048 rows + the filtered key
set; the fact table is scanned once, filtered in the scan stage, and
never shuffled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_active911_spark.io import read_table
from etl_active911_spark.plans.registry import query

M_BITS = 1 << 16  # bloom width: 2^16 bits = 2048 32-bit words
K_HASH = 4  # hash functions per key
_SEGMENT = "BUILDING"


def _positions(key: Column) -> list[Column]:
    """k independent bit positions via seeded xxhash64 (JVM-native, a few
    ns/row). Deterministic within Spark, which is all the bloom needs:
    build and probe use the SAME function in the same session, and the
    exact verify join makes the final result hash-independent (rule 10's
    md5 discipline applies only to hashes an ORACLE must replicate —
    these positions never leave the plan). ``pmod`` not ``%``: xxhash64
    is signed and a negative position would index off the word table —
    silently dropping bits on build (false negatives: the data-loss bug
    class pinned by the superset test)."""
    # cast to long FIRST: xxhash64 hashes by Spark type, so an int build
    # key and a bigint probe key would hash differently — a silent
    # false-negative source. All bloom keys here are integral ids.
    return [
        F.pmod(F.xxhash64(F.lit(i), key.cast("long")), F.lit(M_BITS)).cast("long")
        for i in range(K_HASH)
    ]


def bloom_build(keys: DataFrame, key_col: str) -> DataFrame:
    """Aggregate a key column into the bloom word table
    ``(w: long, bits: long)`` — <= 2048 rows regardless of key count."""
    pos = keys.select(
        F.explode(F.array(*_positions(F.col(key_col)))).alias("pos")
    )
    # F.shiftleft only takes a literal shift amount; the per-row shift
    # must go through the SQL expression form.
    mask = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))")
    return pos.groupBy(F.shiftright(F.col("pos"), 5).alias("w")).agg(
        F.bit_or(mask).alias("bits")
    )


def bloom_bitset_df(keys: DataFrame, key_col: str) -> DataFrame:
    """Densify the distributed word table into a ONE-ROW
    ``(_bloom array<bigint>)`` bitset ENTIRELY IN-PLAN (r15 optimization
    round): ``collect_list`` the ≤2048 (w, bits) pairs into a map and
    unfold it over the fixed word-index sequence. The first cut collected
    the words to the driver and shipped them back through
    ``createDataFrame`` — one extra job plus a 2048-long py4j round trip
    per invocation, and the builder-side collect froze data-derived
    values into the plan, which made the query ineligible for the
    whole-plan memo (a collected bitset would NOT recompute from parquet
    on later actions). In-plan, every action rebuilds the bloom from the
    key scan, so the query is memo-safe and one job cheaper. The
    ``transform`` lambda is interpreted but runs over 2048 elements of
    ONE row (rule-1's corpus-size concern does not apply)."""
    n_words = M_BITS // 32
    return (
        bloom_build(keys, key_col)
        .agg(F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("m"))
        .select(
            F.expr(
                f"transform(sequence(0, {n_words - 1}), "
                "i -> coalesce(m[CAST(i AS BIGINT)], CAST(0 AS BIGINT)))"
            ).alias("_bloom")
        )
    )


_BIT_MASKS = [1 << b for b in range(32)]


def bloom_probe(fact: DataFrame, key: Column, bitset: DataFrame) -> DataFrame:
    """Keep only fact rows whose key passes the bloom: 4 pure-codegen bit
    tests (``element_at`` into the broadcast bitset + ``&``). The bitset
    rides as a ONE-ROW broadcast (16 KB build side) rather than as a
    2048-element literal: inlining the array as a literal was measured
    ~2 s SLOWER per query — all of it analyzer/optimizer time walking the
    4 copies of the 2048-node expression tree, none of it execution. The
    cross join of the single bitset row plans as a
    BroadcastNestedLoopJoin whose build side is one row — a scalar
    broadcast (1×N, bit tests evaluated streaming-side), not a pairwise
    blowup; asserted as such in tests/test_scale_layout.py. An unset bit
    is a definite negative; no shuffle of the fact side anywhere."""
    masks_lit = F.lit(_BIT_MASKS)
    cond = F.lit(True)
    for pos in _positions(key):
        word = F.element_at(F.col("_bloom"), (F.shiftright(pos, 5) + 1).cast("int"))
        mask = F.element_at(masks_lit, ((pos % 32) + 1).cast("int"))
        cond = cond & (word.bitwiseAND(mask) != 0)
    return fact.crossJoin(F.broadcast(bitset)).filter(cond).drop("_bloom")


def bloom_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The probe output BEFORE exact verification (exposed for the
    superset/false-positive-rate property test)."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    keys = cust.filter(F.col("c_mktsegment") == _SEGMENT).select("c_custkey")
    bitset = bloom_bitset_df(keys, "c_custkey")
    return bloom_probe(
        orders.select("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"),
        F.col("o_custkey"),
        bitset,
    )


@query(
    "n19_bloom_prefilter_join",
    f"""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS total_price
    FROM orders o
    WHERE o.o_custkey IN (
        SELECT c_custkey FROM customer WHERE c_mktsegment = '{_SEGMENT}'
    )
    GROUP BY o.o_orderpriority
    """,
)
def n19_bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-19: order volume for one market segment, computed bloom-first:
    bloom pre-filter (fixed-size broadcast) -> exact broadcast semi-join
    (false-positive removal) -> aggregate. Semantically identical to the
    oracle's plain semi-join; a bloom false negative would fail the
    driver's hash gate."""
    cust = read_table(spark, sf_dir, "customer")
    keys = cust.filter(F.col("c_mktsegment") == _SEGMENT).select("c_custkey")
    cand = bloom_candidates(spark, sf_dir)
    exact = cand.join(
        F.broadcast(keys), cand["o_custkey"] == keys["c_custkey"], "semi"
    )
    return exact.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )
