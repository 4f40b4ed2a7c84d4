"""Deterministic sampling operators for training-data pipelines (X-8).

RNG-based sampling (``df.sample``) is neither reproducible across engines
nor stable under retries/partition changes. These operators sample by
**content-addressed hash buckets** (md5 — identical in every engine), so a
sample is a pure function of the data: re-runs, backfills, and the DuckDB
oracle all agree row-for-row. This is the standard trick for holdout
splits and mixture weighting at 100 TB: no shuffle, one scan, pushdown-safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_active911_spark.io import read_table
from etl_active911_spark.plans.registry import query


def hash_bucket(key: Column, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets): first 8 hex chars of md5 of
    the key string, mod n_buckets — engine-agnostic."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("bigint") % n_buckets


def _bucket_sql(key: str, n_buckets: int = 100) -> str:
    return f"(('0x' || substr(md5(CAST({key} AS STRING)), 1, 8))::BIGINT) % {n_buckets}"


@query(
    "x8_hash_sample",
    f"""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE {_bucket_sql("doc_id")} < 10
    """,
)
def x8_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-8: reproducible ~10% uniform sample by content hash bucket."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.filter(hash_bucket(F.col("doc_id")) < 10).select("doc_id", "lang", "n_chars")


@query(
    "x8_stratified_sample",
    f"""
    SELECT doc_id, lang
    FROM documents
    WHERE {_bucket_sql("doc_id")} <
        CASE lang WHEN 'en' THEN 20 WHEN 'zh' THEN 50 ELSE 100 END
    """,
)
def x8_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-8: stratified mixture weighting — per-language keep rates
    (down-sample the dominant language, keep the rest), the deterministic
    form of training-mixture reweighting."""
    docs = read_table(spark, sf_dir, "documents")
    rate = (
        F.when(F.col("lang") == "en", 20)
        .when(F.col("lang") == "zh", 50)
        .otherwise(100)
    )
    return docs.filter(hash_bucket(F.col("doc_id")) < rate).select("doc_id", "lang")


@query(
    "x8_train_holdout_split",
    f"""
    SELECT doc_id,
           CASE WHEN {_bucket_sql("doc_id")} < 90 THEN 'train' ELSE 'holdout' END AS split
    FROM documents
    """,
)
def x8_train_holdout_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-8: stable 90/10 train/holdout assignment — membership never
    changes as the corpus grows (content-addressed, not positional)."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.when(hash_bucket(F.col("doc_id")) < 90, "train").otherwise("holdout").alias("split"),
    )


@query(
    "x8_weighted_sample",
    f"""
    WITH h AS (
        SELECT doc_id,
               sha256(TRIM(regexp_replace(LOWER(text), '\\s+', ' ', 'g'))) AS content_hash
        FROM documents
    ),
    keepers AS (
        SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
        FROM h GROUP BY content_hash
    )
    SELECT doc_id, CAST(n_copies AS BIGINT) AS n_copies
    FROM keepers
    WHERE {_bucket_sql("doc_id", 10000)} < LEAST(10000, n_copies * 2000)
    """,
)
def x8_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-8: frequency-weighted sampling AFTER dedup — the keeper of a
    duplicate cluster is kept with probability ∝ its original copy count
    (min(1, 0.2·n_copies)), the standard way to preserve the corpus
    distribution while storing each text once. Deterministic: the 'coin'
    is the doc_id's md5 bucket out of 10 000, so the sample is a pure
    function of the data (re-runs, the oracle, and backfills agree
    row-for-row). Composes x1_exact_dedup; one extra scan-free filter."""
    from etl_active911_spark.operators.dedup import normalized_text

    docs = read_table(spark, sf_dir, "documents")
    keepers = (
        docs.select(
            "doc_id", F.sha2(normalized_text(F.col("text")), 256).alias("content_hash")
        )
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )
    return (
        keepers.filter(
            hash_bucket(F.col("doc_id"), 10000)
            < F.least(F.lit(10000), F.col("n_copies") * 2000)
        )
        .select("doc_id", F.col("n_copies").cast("bigint").alias("n_copies"))
    )


def _cluster_split_oracle() -> str:
    """Closure CTE (same walk as x2_dup_clusters' oracle) + md5 bucket of
    the CLUSTER key, so every member of a near-dup cluster lands on the
    same side of the split."""
    from etl_active911_spark.operators.dedup import MINHASH_CTES

    key = "CAST(COALESCE(c.component, d.doc_id) AS STRING)"
    return f"""
    WITH RECURSIVE {MINHASH_CTES},
    prs AS (SELECT doc_a, doc_b FROM verified WHERE jac >= 0.5),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM prs
        UNION
        SELECT doc_b, doc_a FROM prs
    ),
    walk(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT w.src, e.dst FROM walk w JOIN edges e ON w.dst = e.src
    ),
    reach AS (
        SELECT src AS doc_id, dst FROM walk
        UNION
        SELECT src, src FROM edges
    ),
    comp AS (SELECT doc_id, MIN(dst) AS component FROM reach GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(c.component, d.doc_id) AS BIGINT) AS cluster_key,
           CASE WHEN (('0x' || substr(md5({key}), 1, 8))::BIGINT) % 100 < 80
                THEN 'train' ELSE 'holdout' END AS split
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
    """


@query("x8_cluster_split", None)  # oracle injected below (needs dedup's CTEs)
def x8_cluster_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-8: LEAKAGE-FREE train/holdout split — the split key is the
    near-dup CLUSTER (connected component of the verified MinHash pair
    graph), not the document, so two near-duplicates can never straddle
    train and holdout (the classic eval-contamination bug that doc-level
    splits like x8_train_holdout_split cannot prevent). Singletons key by
    their own doc_id. The no-straddle property is asserted in
    tests/test_extensions.py.

    Components come from the memoized O(log n) star-contraction labels
    (``shared_component_labels`` — r5/r12, VERDICT r04 item 4 + ADVICE
    r11 item 2; previously the O(diameter) label propagator via
    x2_dup_clusters): the split needs (doc_id, component) only, so the
    keeper join x2_dup_clusters performs is skipped too. Both components
    engines remain equivalence-tested against the same recursive-closure
    oracle (x2_dup_clusters / x2_dup_clusters_star)."""
    from etl_active911_spark.operators.dedup import shared_component_labels

    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    comp = shared_component_labels(spark, sf_dir)
    key = F.coalesce(F.col("component"), F.col("doc_id"))
    return (
        docs.join(comp, "doc_id", "left")
        .select(
            "doc_id",
            key.cast("bigint").alias("cluster_key"),
            F.when(hash_bucket(key) < 80, "train").otherwise("holdout").alias("split"),
        )
    )


from etl_active911_spark.plans import registry as _registry  # noqa: E402

_registry.ORACLES["x8_cluster_split"] = _cluster_split_oracle()


@query(
    "x8_reservoir_sample",
    f"""
    SELECT lang, doc_id, rk FROM (
        SELECT lang, doc_id,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY md5(CAST(doc_id AS STRING)), doc_id) AS rk
        FROM documents
    ) t WHERE rk <= 5
    """,
)
def x8_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-8: deterministic per-key 'reservoir' — the k=5 docs per language
    with the smallest md5(doc_id), i.e. a uniform-at-random-looking but
    fully reproducible fixed-size sample per group (hash order is the
    random order). One shuffle on lang; at 100 TB the global window would
    funnel each language into one task, so the production form is the same
    two-phase trick as partial_topk — per-partition top-5 first, then the
    tiny merge — which this query's plan gets from Spark's WindowGroupLimit
    pushdown automatically. Oracle replicates the hash order exactly."""
    docs = read_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("lang", "doc_id", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 5)
    )


# ---------------------------------------------------------------------------
# X-8g: size-balanced shard assignment (distributed prefix sum) — r4
# ---------------------------------------------------------------------------

TARGET_SHARD_BYTES = 1 << 16  # 64 KiB over the fixture corpus; prod knob
_SHARD_RANGES = 8  # key ranges for the two-phase prefix sum


def _with_range_id(d: DataFrame, key: str = "doc_id", n_ranges: int = _SHARD_RANGES) -> DataFrame:
    """Stamp a DETERMINISTIC contiguous range id ``pid`` in [0, n_ranges)
    derived purely from the data: uniform split of the key's [min, max]
    span (tiny bounds aggregate, broadcast back).

    This replaced ``repartitionByRange + spark_partition_id`` in r6:
    spark_partition_id is physical-plan state, and when the range exchange
    is NOT reused between the offsets aggregate and the probe join (AQE
    re-plan, exchange reuse off, recomputation re-sampling range
    boundaries), the two consumers see DIFFERENT pids and every downstream
    shard id shifts — a real cluster-scale hazard, hostile-conf-reproduced
    in tests/test_prefix_sum.py (spark.sql.exchange.reuse=false). A pid
    that is a pure function of the row can never disagree with itself,
    whatever the physical plan does (SCALE.md invariant 9).

    NOTE (r7 postmortem correction, VERDICT r06 #1): the r4-r6 DRIVER
    hash mismatches on x8_shard_assign / x8_token_packing / x9_curation_v3
    were NOT this hazard — they were deterministic ORACLE output-type bugs
    (DuckDB windowed SUM → HUGEINT → pandas float64 vs Spark int64),
    fixed by CAST(... AS BIGINT) in the oracle SQL and guarded by
    tests/test_oracle_types.py + the type-strict tests/parity.py.

    Balance note: uniform key-span split assumes roughly uniform key
    density (true for sequential doc_ids). Correctness never depends on
    balance — any contiguous monotone assignment yields the same global
    prefix sums — so a skewed id space only costs parallelism; production
    would swap in precomputed quantile boundaries (still data-derived and
    deterministic), never physical-partition state."""
    bounds = d.agg(F.min(key).alias("_lo"), F.max(key).alias("_hi"))
    span = F.col("_hi") - F.col("_lo") + 1
    pid = F.floor(((F.col(key) - F.col("_lo")) * n_ranges) / span).cast("int")
    return d.crossJoin(F.broadcast(bounds)).withColumn("pid", pid).drop("_lo", "_hi")


def _two_phase_prefix_sum(
    d: DataFrame,
    weight: str,
    key: str = "doc_id",
    group_cols: tuple[str, ...] = (),
    tiebreak: str | None = None,
    persist_key: str | None = None,
) -> DataFrame:
    """Add ``start_off`` = EXCLUSIVE running sum of ``weight`` in ``key``
    order — GLOBAL by default, PER GROUP when ``group_cols`` are given
    (each group gets its own independent prefix sum; the packing use case
    is per-aspect-bucket sequence packing). The distributed shape:

    1. deterministic range id per row (``_with_range_id`` — no
       physical-partition state anywhere in the computation); with groups
       the range split still uses the GLOBAL key span — any contiguous
       monotone split is correct per group too, since group rows keep
       their relative key order within and across ranges;
    2. per-(group, range) running sums with a window PARTITIONED by
       (group, range id) — parallel, no single-task stage;
    3. per-(group, range) totals (one row each, aggregated straight from
       the weights — NOT from the window output, so a recomputed subtree
       cannot diverge) → cumulative offsets per group over the bounded
       (groups × ranges)-row table, broadcast back and added.

    ``tiebreak`` (optional) disambiguates the within-range window order
    when ``key`` is not unique (e.g. a derived hash); per-range totals
    are order-insensitive, so only the window's ORDER BY needs it.

    ``persist_key`` (optional, r15): the input subtree feeds THREE
    consumers (the bounds aggregate, the per-range window, the
    per-range totals) with no barrier between them — when ``key`` or
    ``weight`` is an EXPENSIVE derived expression (a regex over the
    full text, an md5 hash) that column pruning cannot drop from the
    bounds/offsets consumers, each consumer re-evaluates it. Passing a
    scoped_persist key materializes the (doc_id, key, weight)
    projection once (rule 17; block-design A/B on x8_curriculum_order:
    ~2.3 -> ~1.3 s noop at sf0.1). Only worth it when the KEY is the
    expensive column: an expensive WEIGHT alone reaches just two
    consumers (bounds prunes it) and the persist measured a wash on
    x8_token_packing (rule 34 — the barrier pays for at most one saved
    evaluation). Never set it on PLAN_MEMOED queries (a persist breaks
    memo eligibility)."""
    g = list(group_cols)
    if persist_key is not None:
        from etl_active911_spark.plans.cache import scoped_persist

        d = scoped_persist(persist_key, d)
    d = _with_range_id(d, key)
    order = [key] + ([tiebreak] if tiebreak else [])
    w_local = (
        Window.partitionBy(*g, "pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    part = d.withColumn("local_cum", F.sum(weight).over(w_local))
    # bounded offsets table: groups × n_ranges rows; the global form's
    # single-partition window becomes one tiny window per group
    w_off = (
        (Window.partitionBy(*g) if g else Window.partitionBy())
        .orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = (
        d.groupBy(*g, "pid")
        .agg(F.sum(weight).alias("range_total"))
        .withColumn("offset", F.sum("range_total").over(w_off) - F.col("range_total"))
        .select(*g, "pid", "offset")
    )
    # exclusive prefix: range offset + everything before this row within
    # its range
    start = F.col("offset") + F.col("local_cum") - F.col(weight)
    return (
        part.join(F.broadcast(offsets), [*g, "pid"])
        .withColumn("start_off", start)
        .drop("pid", "local_cum", "offset")
    )


def assign_shards(docs: DataFrame, target: int = TARGET_SHARD_BYTES) -> DataFrame:
    """Assign each document to a training shard so shards are filled
    sequentially in deterministic ``doc_id`` order to ~``target`` bytes
    (a doc belongs to the shard where its payload STARTS — the standard
    streaming-packing rule, so a shard overflows by at most one doc).

    100 TB shape: shard id = running byte offset ``div`` target, i.e. a
    GLOBAL prefix sum — the naive formulation (one window with a global
    ORDER BY) funnels the entire corpus through a single task; this is
    the two-phase distributed prefix sum (``_two_phase_prefix_sum``),
    with range ids derived deterministically from the data rather than
    from physical partition state (see ``_with_range_id`` for the r5
    driver postmortem).

    Returns (doc_id, n_bytes, shard_id)."""
    d = docs.select("doc_id", F.octet_length("text").cast("bigint").alias("n_bytes"))
    out = _two_phase_prefix_sum(d, "n_bytes")
    # byte offset where this doc STARTS; exact bigint division (DIV), not
    # float `/` — cumulative byte offsets overflow double precision long
    # before they overflow int64
    return out.select(
        "doc_id",
        "n_bytes",
        F.expr(f"CAST(start_off DIV {target} AS BIGINT)").alias("shard_id"),
    )


@query(
    "x8_shard_assign",
    f"""
    WITH d AS (
        SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        FROM documents
    ),
    c AS (
        SELECT doc_id, n_bytes,
               SUM(n_bytes) OVER (ORDER BY doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM d
    )
    SELECT CAST((cum - n_bytes) // {TARGET_SHARD_BYTES} AS BIGINT) AS shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_bytes) AS BIGINT) AS shard_bytes,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM c GROUP BY 1
    """,
)
def x8_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-8g: size-balanced training-shard manifest — every shard's doc
    count, byte size, and contiguous [first_doc, last_doc] range. The
    oracle computes the same prefix sum with a plain global window (fine
    at oracle scale); the Spark side must reproduce it bit-for-bit from
    the two-phase distributed formulation, which pins the offset
    arithmetic (a misplaced range boundary or off-by-one in the offset
    join shifts every downstream shard id)."""
    docs = read_table(spark, sf_dir, "documents")
    shards = assign_shards(docs)
    return (
        shards.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_bytes").cast("bigint").alias("shard_bytes"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


# ---------------------------------------------------------------------------
# X-8h: temperature-based source mixture weighting — r4
# ---------------------------------------------------------------------------

MIX_BUCKETS = 1_000_000  # inclusion-threshold resolution


def tempered_shares(per: DataFrame, n_col: str = "n_docs") -> DataFrame:
    """α=1/2 tempered mixture shares over a per-source count table:
    ``share_s = ROUND(sqrt(n_s/N) / Σ_t sqrt(n_t/N), 6)``.

    r15 optimization round: the first cut chained two scalar crossJoins
    (``per → tot → z → p``), which cost a broadcast-BUILD JOB per scalar
    and re-evaluated the per-source aggregate once per consumer (three
    evaluations in the curation funnels). Both normalizers are now
    WINDOW sums over the per-source table itself — one pass, zero extra
    jobs. The unpartitioned window is bounded by |sources| (a
    low-cardinality mixture axis by design), never corpus-sized.

    GUARD (r16, VERDICT r15 item 4): an unpartitioned window serializes
    its ENTIRE input into one task — callers MUST pass a table already
    aggregated to the mixture axis (per-source counts), never row-grain
    data. Every current caller passes a groupBy("source") result; reusing
    this helper on a high-cardinality axis reintroduces the exact
    single-task wall the r15 rewrite removed from the scalar chain.

    Rounding audit (rule 26): the BIGINT n_total window sum is exact in
    any order; z = Σ sqrt(n/N) is a sum of irrationals and the final
    ROUND(wr/z, 6) sits after an irrational op, the rule-26b tie-free
    class — the engines' existing 6dp agreement already tolerates
    sum-order ulp drift (DuckDB sums in its own order today)."""
    w_all = Window.partitionBy()
    n_total = F.sum(n_col).over(w_all)
    wr = F.sqrt(F.col(n_col).cast("double") / F.col("n_total"))
    return (
        per.withColumn("n_total", n_total)
        .withColumn("wr", wr)
        .withColumn("z", F.sum("wr").over(w_all))
        .select(
            *per.columns,
            F.round(F.col("wr") / F.col("z"), 6).alias("share"),
        )
    )


@query(
    "x8_mixture_weights",
    f"""
    WITH per AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY source
    ),
    w AS (
        SELECT source, n_docs,
               SQRT(CAST(n_docs AS DOUBLE) / (SELECT SUM(n_docs) FROM per)) AS wr
        FROM per
    ),
    p AS (
        SELECT source, n_docs, ROUND(wr / (SELECT SUM(wr) FROM w), 6) AS tempered_share
        FROM w
    ),
    s AS (
        SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_sampled
        FROM documents d JOIN p ON d.source = p.source
        WHERE {_bucket_sql('doc_id', 1_000_000)}
              < CAST(FLOOR(p.tempered_share * 1000000) AS BIGINT)
        GROUP BY d.source
    )
    SELECT p.source, p.n_docs, p.tempered_share,
           COALESCE(s.n_sampled, 0) AS n_sampled
    FROM p LEFT JOIN s ON p.source = s.source
    """,
)
def x8_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-8h: temperature-based mixture weighting across sources — the
    standard pretraining rebalancing (upweight small sources, downweight
    dominant ones) at temperature α = 1/2: tempered share
    p_s ∝ sqrt(n_s / N), renormalized. α is fixed at 1/2 deliberately:
    sqrt is IEEE-correctly-rounded in every engine, so the oracle matches
    bit-for-bit where a general pow(x, α) could differ in the last ulp.

    Membership is then CONTENT-ADDRESSED, not RNG: doc included iff
    md5-bucket(doc_id) < floor(p_s · 10⁶) — a deterministic per-source
    Bernoulli(p_s) that is reproducible across engines, retries, and
    partitionings (same property as the other X-8 samplers). Output: per
    source, corpus count, tempered share, and realized sample count.

    100 TB shape: two scans of `documents` (one countable aggregate, one
    threshold filter), a ~|sources|-row broadcast join, and 1-row totals
    folded as scalar subqueries — no global sort, no RNG state."""
    docs = read_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    p = tempered_shares(per).withColumnRenamed("share", "tempered_share")
    thr = F.floor(F.col("tempered_share") * MIX_BUCKETS).cast("bigint")
    sampled = (
        docs.join(F.broadcast(p), "source")
        .filter(hash_bucket(F.col("doc_id"), MIX_BUCKETS) < thr)
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sampled"))
    )
    return p.join(sampled, "source", "left").select(
        "source",
        "n_docs",
        "tempered_share",
        F.coalesce("n_sampled", F.lit(0).cast("bigint")).alias("n_sampled"),
    )


# ---------------------------------------------------------------------------
# X-8i: token-budget sequence-packing manifest — r4
# ---------------------------------------------------------------------------

PACK_TOKEN_BUDGET = 4096  # tokens per packed training sequence


@query(
    "x8_token_packing",
    None,  # oracle injected below (needs textual's BPE pattern)
)
def x8_token_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-8i: sequence-packing manifest — concatenate documents in
    deterministic ``doc_id`` order into packed training sequences of
    ~``PACK_TOKEN_BUDGET`` BPE-ish tokens (a doc belongs to the pack
    where its first token lands; packs overflow by at most one doc, the
    same streaming-packing rule as ``assign_shards``). Output per pack:
    doc count, token total, and the contiguous [first_doc, last_doc]
    span — what a pretraining loader needs to seek into the corpus.

    Same two-phase distributed prefix-sum core as ``assign_shards``
    (``_two_phase_prefix_sum``: deterministic range ids → per-range
    running sums → broadcast offsets), with the token count from x4's
    BPE-ish pre-tokenizer regex instead of byte length. No
    global-ORDER-BY window anywhere near the corpus."""
    from etl_active911_spark.operators.textual import BPE_ISH_PATTERN

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_count(F.lower("text"), F.lit(BPE_ISH_PATTERN)).cast("bigint").alias("n_tokens"),
    )
    packed = _two_phase_prefix_sum(docs, "n_tokens").withColumn(
        "pack_id", F.expr(f"CAST(start_off DIV {PACK_TOKEN_BUDGET} AS BIGINT)")
    )
    return (
        packed.groupBy("pack_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


def _token_packing_oracle() -> str:
    from etl_active911_spark.operators.textual import BPE_ISH_PATTERN

    pat = BPE_ISH_PATTERN.replace("'", "''")
    return f"""
    WITH d AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(LOWER(text), '{pat}')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, n_tokens,
               SUM(n_tokens) OVER (ORDER BY doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM d
    )
    SELECT CAST((cum - n_tokens) // {PACK_TOKEN_BUDGET} AS BIGINT) AS pack_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM c GROUP BY 1
    """


_registry.ORACLES["x8_token_packing"] = _token_packing_oracle()


@query(
    "x8_pack_attention_contamination",
    None,  # oracle injected below (needs textual's BPE pattern)
)
def x8_pack_attention_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-8 (r13): CROSS-DOCUMENT ATTENTION CONTAMINATION per packed
    sequence — the number a packing pipeline owes before choosing
    whether to pay for block-diagonal attention masking: naive packing
    lets a causal LM attend across document boundaries, and the
    contaminated fraction of causal (query, key) pairs in a pack is
    exactly (T² − Σ tᵢ²) / (T(T+1)) where T = Σ tᵢ (identity:
    T² − Σtᵢ² = 2·Σ_{i<j} tᵢtⱼ, the cross-doc ordered pairs — always
    even, so the arithmetic is pure integers). Per pack of the SAME
    manifest as ``x8_token_packing`` (shared prefix-sum core — the
    manifests cannot diverge): docs, tokens, cross/causal pair counts,
    and the contamination share in rule-26b half-up micro-units.

    Overflow note: per-pack T is bounded by PACK_TOKEN_BUDGET plus one
    doc's overflow, so T²·10⁶ sits ~9 orders below int64 at ANY corpus
    size — pack-grain arithmetic needs no 128-bit path (contrast the
    corpus-grain sums of rule 27).

    Scale shape: identical to x8_token_packing (two-phase prefix sum,
    no global window) plus one pack-keyed hash aggregate carrying two
    int64s; output is |packs| rows."""
    from etl_active911_spark.operators.textual import BPE_ISH_PATTERN

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_count(F.lower("text"), F.lit(BPE_ISH_PATTERN))
        .cast("bigint")
        .alias("n_tokens"),
    )
    packed = _two_phase_prefix_sum(docs, "n_tokens").withColumn(
        "pack_id", F.expr(f"CAST(start_off DIV {PACK_TOKEN_BUDGET} AS BIGINT)")
    )
    agg = packed.groupBy("pack_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("pack_tokens"),
        F.sum(F.col("n_tokens") * F.col("n_tokens")).cast("bigint").alias("sq"),
    )
    return agg.select(
        "pack_id",
        "n_docs",
        "pack_tokens",
        F.expr("(pack_tokens * pack_tokens - sq) div 2").alias("cross_pairs"),
        F.expr("(pack_tokens * (pack_tokens + 1)) div 2").alias("causal_pairs"),
        F.expr(
            "CAST((2 * ((pack_tokens * pack_tokens - sq) div 2) * 1000000"
            " + ((pack_tokens * (pack_tokens + 1)) div 2))"
            " div (2 * ((pack_tokens * (pack_tokens + 1)) div 2)) AS BIGINT)"
        ).alias("contamination_micro"),
    )


def _pack_attention_oracle() -> str:
    from etl_active911_spark.operators.textual import BPE_ISH_PATTERN

    pat = BPE_ISH_PATTERN.replace("'", "''")
    return f"""
    WITH d AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(LOWER(text), '{pat}')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, n_tokens,
               SUM(n_tokens) OVER (ORDER BY doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM d
    ),
    p AS (
        SELECT CAST((cum - n_tokens) // {PACK_TOKEN_BUDGET} AS BIGINT) AS pack_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
               CAST(SUM(n_tokens * n_tokens) AS BIGINT) AS sq
        FROM c GROUP BY 1
    )
    SELECT pack_id, n_docs, pack_tokens,
           CAST((pack_tokens * pack_tokens - sq) // 2 AS BIGINT) AS cross_pairs,
           CAST((pack_tokens * (pack_tokens + 1)) // 2 AS BIGINT) AS causal_pairs,
           CAST((2 * ((pack_tokens * pack_tokens - sq) // 2) * 1000000
                 + ((pack_tokens * (pack_tokens + 1)) // 2))
                // (2 * ((pack_tokens * (pack_tokens + 1)) // 2)) AS BIGINT)
               AS contamination_micro
    FROM p
    """


_registry.ORACLES["x8_pack_attention_contamination"] = _pack_attention_oracle()


@query(
    "x8_interleave_sources",
    """
    WITH ranked AS (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY md5(CAST(doc_id AS STRING)), doc_id)
                   AS src_rank
        FROM documents
    ),
    srcs AS (
        SELECT source,
               ROW_NUMBER() OVER (ORDER BY source) - 1 AS src_idx,
               COUNT(*) OVER () AS n_sources
        FROM (SELECT DISTINCT source FROM documents)
    )
    SELECT r.doc_id, r.source, CAST(r.src_rank AS BIGINT) AS src_rank,
           CAST((r.src_rank - 1) * s.n_sources + s.src_idx AS BIGINT) AS global_pos
    FROM ranked r JOIN srcs s ON s.source = r.source
    """,
)
def x8_interleave_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-8 (r5): deterministic SOURCE INTERLEAVING — the training-order
    mixer: each source's documents get a reproducible pseudo-random rank
    (md5 hash order, the same coin as the sampling family), and the
    global training position round-robins across sources
    (``(rank−1)·n_sources + source_index``). Complements
    ``x8_mixture_weights`` (which says how MUCH of each source): this
    emits the actual interleaved order a sequential trainer consumes,
    with no epoch boundary where one source ends early.

    Scale shape: one shuffle on source for the per-source ranks (at
    100 TB the per-source window would use the same WindowGroupLimit /
    two-phase trick as the reservoir when only a prefix is needed); the
    global position is a CLOSED FORM over (rank, source index) — no
    global single-partition window anywhere. The source table (a
    handful of rows) broadcasts."""
    docs = read_table(spark, sf_dir, "documents")
    w_src = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = docs.select(
        "doc_id", "source", F.row_number().over(w_src).alias("src_rank")
    )
    w_idx = Window.orderBy("source")
    srcs = (
        docs.select("source")
        .distinct()
        .select(
            "source",
            (F.row_number().over(w_idx) - 1).alias("src_idx"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("n_sources"),
        )
    )
    return (
        ranked.join(F.broadcast(srcs), "source")
        .select(
            "doc_id",
            "source",
            F.col("src_rank").cast("bigint").alias("src_rank"),
            ((F.col("src_rank") - 1) * F.col("n_sources") + F.col("src_idx"))
            .cast("bigint")
            .alias("global_pos"),
        )
    )


@query(
    "x8_dedup_report",
    """
    WITH h AS (
        SELECT doc_id, source,
               sha256(TRIM(regexp_replace(LOWER(text), '\\s+', ' ', 'g'))) AS ch
        FROM documents
    ),
    keep AS (
        SELECT source, ch, COUNT(*) AS n, MIN(doc_id) AS keeper
        FROM h GROUP BY source, ch
    )
    SELECT source,
           CAST(SUM(n) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_exact_dups,
           ROUND(CAST(SUM(n) - COUNT(*) AS DOUBLE) / SUM(n), 6) AS dup_rate
    FROM keep GROUP BY source
    """,
)
def x8_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-8 (r5): per-source DEDUPLICATION REPORT — the corpus-health
    rollup an operator reads before choosing mixture weights (a source
    with dup_rate 0.4 contributes less unique signal than its row count
    suggests). Within-source exact-dup accounting via the X-1 content
    hash; two keyed aggregates (hash then source), text never shuffles."""
    from etl_active911_spark.operators.dedup import normalized_text

    docs = read_table(spark, sf_dir, "documents")
    keep = (
        docs.select(
            "source", F.sha2(normalized_text(F.col("text")), 256).alias("ch")
        )
        .groupBy("source", "ch")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return keep.groupBy("source").agg(
        F.sum("n").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        (F.sum("n") - F.count(F.lit(1))).cast("bigint").alias("n_exact_dups"),
        F.round(
            (F.sum("n") - F.count(F.lit(1))).cast("double") / F.sum("n"), 6
        ).alias("dup_rate"),
    )


WRES_K = 50  # weighted-sample size
_H60_MAX = float(2**60)


def _wres_oracle() -> str:
    from etl_active911_spark.operators.dedup import sql_hash60

    h60 = sql_hash60("CAST(doc_id AS VARCHAR)")
    return f"""
    WITH u AS (
        SELECT doc_id, lang, n_chars,
               (({h60}) + 1) / {_H60_MAX!r} AS unif
        FROM documents
    ),
    keyed AS (
        SELECT doc_id, lang, n_chars,
               ROUND(-ln(unif) / NULLIF(CAST(n_chars AS DOUBLE), 0), 6) AS skey
        FROM u WHERE n_chars > 0
    )
    SELECT doc_id, lang, n_chars, skey, CAST(rk AS INT) AS rk FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY skey, doc_id) AS rk FROM keyed
    ) t WHERE rk <= {WRES_K}
    """


_WRES_ORACLE = _wres_oracle()


@query(
    "x8_weighted_reservoir",
    _WRES_ORACLE,
)
def x8_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-8 (r5): WEIGHTED sampling WITHOUT replacement (Efraimidis &
    Spirakis, "Weighted random sampling with a reservoir", IPL 2006 —
    public literature; exponential-jumps form): each document draws a
    deterministic uniform from its md5 hash, keys by −ln(u)/w with
    w = n_chars, and the k SMALLEST keys are an exact weighted sample —
    the 'sample tokens, not documents' correction (long documents
    proportionally likelier) the plain hash sample can't express.

    Determinism: u = (hash60 + 1)/2⁶⁰ is identical IEEE arithmetic in
    both engines; ln() differs in the last ulp across libm builds, so
    ranking compares ROUND(key, 6) with the doc_id tie-break (canonical
    policy 3/4 — same discipline as the geo distances). Global top-k by
    smallest key rides the WindowGroupLimit pushdown: per-partition
    k-smallest survive map-side, the final window sees partitions × k
    rows (the one empty-partitionBy window in the engine that is NOT a
    single-partition bottleneck for that reason)."""
    from etl_active911_spark.operators.dedup import token_hash60

    docs = read_table(spark, sf_dir, "documents")
    unif = (token_hash60(F.col("doc_id").cast("string")) + 1) / F.lit(_H60_MAX)
    keyed = (
        docs.filter(F.col("n_chars") > 0)
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.round(
                -F.log(unif) / F.nullif(F.col("n_chars").cast("double"), F.lit(0)), 6
            ).alias("skey"),
        )
    )
    w = Window.orderBy("skey", "doc_id")
    return (
        keyed.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= WRES_K)
    )


# ---------------------------------------------------------------------------
# X-8j (r6): deterministic per-epoch corpus shuffle
# ---------------------------------------------------------------------------

SHUFFLE_EPOCHS = 2


def _epoch_shuffle_oracle() -> str:
    from etl_active911_spark.operators.dedup import sql_hash60

    h60 = sql_hash60("CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)")
    return f"""
    WITH e AS (
        SELECT unnest(range(0, {SHUFFLE_EPOCHS})) AS epoch
    ),
    keyed AS (
        SELECT e.epoch, d.doc_id, ({h60}) AS h
        FROM documents d CROSS JOIN e
    )
    SELECT CAST(epoch AS INT) AS epoch, doc_id,
           CAST(SUM(1) OVER (PARTITION BY epoch ORDER BY h, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                - 1 AS BIGINT) AS pos
    FROM keyed
    """


@query("x8_epoch_shuffle", _epoch_shuffle_oracle())
def x8_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-8j (r6): deterministic PER-EPOCH corpus shuffle — every epoch
    gets an independent, reproducible pseudo-random training order
    (rank by md5-hash of ``epoch:doc_id``), the standard 'reshuffle each
    epoch, identically on every re-run / resumed job' contract a
    pretraining loader needs. Same content-addressed-coin discipline as
    the rest of X-8: no RNG state, order is a pure function of
    (epoch, doc_id).

    Scale shape — this is a GLOBAL order statistic per epoch (naively a
    global-sort window: one task per epoch at 100 TB). Instead the rank
    is computed as an exclusive prefix COUNT over the hash-ordered key
    space via the grouped two-phase prefix sum (``_two_phase_prefix_sum``
    with weight 1, key = hash, group = epoch): deterministic hash-span
    ranges (uniform by construction — the key IS a 60-bit hash), a
    per-(epoch, range) counting window, and a bounded offsets table.
    ``doc_id`` is the tie-break for the astronomically-unlikely 60-bit
    collision, mirrored in the oracle's ORDER BY."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    from etl_active911_spark.operators.dedup import token_hash60

    epochs = F.explode(
        F.sequence(F.lit(0), F.lit(SHUFFLE_EPOCHS - 1))
    ).alias("epoch")
    keyed = docs.select("doc_id", epochs).select(
        F.col("epoch").cast("int").alias("epoch"),
        "doc_id",
        token_hash60(
            F.concat(F.col("epoch").cast("string"), F.lit(":"), F.col("doc_id").cast("string"))
        ).alias("h"),
        F.lit(1).alias("one"),
    )
    ranked = _two_phase_prefix_sum(
        keyed, "one", key="h", group_cols=("epoch",), tiebreak="doc_id"
    )
    return ranked.select(
        "epoch", "doc_id", F.col("start_off").cast("bigint").alias("pos")
    )


# ---------------------------------------------------------------------------
# X-8k (r6): curriculum ordering — quality bands, shuffled within band
# ---------------------------------------------------------------------------

CURRICULUM_BANDS = 4


def _curriculum_oracle() -> str:
    from etl_active911_spark.operators.dedup import sql_hash60

    h60 = sql_hash60("CAST(b.doc_id AS VARCHAR)")
    return f"""
    WITH s AS (
        SELECT doc_id,
               ROUND(CAST(LENGTH(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                     / GREATEST(LENGTH(text), 1), 6) AS score
        FROM documents
    ),
    r AS (
        SELECT doc_id, score,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) - 1 AS rk,
               COUNT(*) OVER () AS n
        FROM s
    ),
    b AS (SELECT doc_id, CAST((rk * {CURRICULUM_BANDS}) // n AS INT) AS band FROM r),
    h AS (SELECT b.doc_id, b.band, ({h60}) AS hh FROM b),
    ranked AS (
        SELECT doc_id, band,
               ROW_NUMBER() OVER (PARTITION BY band ORDER BY hh, doc_id) - 1 AS ib
        FROM h
    ),
    sizes AS (SELECT band, COUNT(*) AS c FROM b GROUP BY band),
    offs AS (
        SELECT band,
               SUM(c) OVER (ORDER BY band ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) - c AS off
        FROM sizes
    )
    SELECT r.doc_id, r.band, CAST(o.off + r.ib AS BIGINT) AS pos
    FROM ranked r JOIN offs o USING (band)
    """


@query("x8_curriculum_order", _curriculum_oracle())
def x8_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-8k (r6): CURRICULUM ordering — documents ranked into quality
    BANDS (alpha-ratio quality proxy, highest band first: the classic
    easy/clean-first curriculum), deterministically SHUFFLED within each
    band (md5 hash order — band membership is curriculum signal, order
    within a band must not correlate with anything). ``pos`` is the
    global training position: band offset + in-band shuffle rank.

    Scale shape: THREE global order statistics, zero global-sort
    windows — the quality rank and the in-band shuffle rank are both
    two-phase prefix COUNTS (key = −score for the descending rank; key =
    60-bit hash grouped by band for the shuffle), and the band offsets
    are a cumulative window over a 4-row (CURRICULUM_BANDS) table. Rank
    keys are ROUNDED scores with doc_id tie-breaks (canonical policy), so
    both engines order identically."""
    from etl_active911_spark.operators.dedup import token_hash60

    docs = read_table(spark, sf_dir, "documents")
    # GREATEST(len,1) guard (ADVICE r06): an empty doc must score 0.0, not
    # NULL — NULL ordering diverges between engines (Spark NULLS FIRST vs
    # DuckDB NULLS LAST on ASC) and a NULL key poisons _with_range_id's pid
    score = F.round(
        F.length(F.regexp_replace("text", "[^a-zA-Z]", "")).cast("double")
        / F.greatest(F.length("text"), F.lit(1)),
        6,
    )
    s = docs.select("doc_id", (-score).alias("negscore"), F.lit(1).alias("one"))
    # the regex-derived score is the prefix-sum KEY, so all three
    # consumers would re-run the [^a-zA-Z] scrub over the corpus —
    # persist (see _two_phase_prefix_sum's persist_key note)
    r = _two_phase_prefix_sum(
        s, "one", key="negscore", tiebreak="doc_id",
        persist_key="x8_curriculum_order.scored",
    )
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    # shared subtree (rule 17): band assignment feeds both the shuffle
    # rank and the band-size offsets
    from etl_active911_spark.plans.cache import scoped_persist

    b = scoped_persist(
        "x8_curriculum_order.bands",
        r.crossJoin(F.broadcast(n)).select(
            "doc_id",
            F.expr(f"CAST((start_off * {CURRICULUM_BANDS}) DIV n AS INT)").alias("band"),
        ),
    )
    keyed = b.select(
        "doc_id",
        "band",
        token_hash60(F.col("doc_id").cast("string")).alias("hh"),
        F.lit(1).alias("one"),
    )
    ranked = _two_phase_prefix_sum(
        keyed, "one", key="hh", group_cols=("band",), tiebreak="doc_id"
    ).withColumnRenamed("start_off", "ib")
    sizes = b.groupBy("band").agg(F.count(F.lit(1)).alias("c"))
    w_off = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    offs = sizes.withColumn("off", F.sum("c").over(w_off) - F.col("c")).select("band", "off")
    return (
        ranked.join(F.broadcast(offs), "band")
        .select("doc_id", "band", (F.col("off") + F.col("ib")).cast("bigint").alias("pos"))
    )


# ---------------------------------------------------------------------------
# X-8 (r7): length-bucketed batching (padding-efficiency manifest)
# ---------------------------------------------------------------------------

BATCH_SIZE = 8
_LEN_BANDS_SQL = """CASE WHEN n_tokens < 64 THEN 'xs'
                         WHEN n_tokens < 256 THEN 's'
                         WHEN n_tokens < 1024 THEN 'm'
                         ELSE 'l' END"""


def _length_batching_oracle() -> str:
    from etl_active911_spark.operators.textual import BPE_ISH_PATTERN

    pat = BPE_ISH_PATTERN.replace("'", "''")
    return f"""
    WITH d AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(LOWER(text), '{pat}')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    b AS (SELECT doc_id, n_tokens, {_LEN_BANDS_SQL} AS band FROM d),
    r AS (
        SELECT doc_id, n_tokens, band,
               ROW_NUMBER() OVER (PARTITION BY band ORDER BY doc_id) - 1 AS rn
        FROM b
    )
    SELECT band, CAST(rn // {BATCH_SIZE} AS BIGINT) AS batch_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MAX(n_tokens) AS BIGINT) AS max_len,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_len,
           ROUND(1 - CAST(SUM(n_tokens) AS DOUBLE)
                     / GREATEST(MAX(n_tokens) * COUNT(*), 1), 6) AS pad_frac
    FROM r GROUP BY 1, 2
    """


@query("x8_length_batching", _length_batching_oracle())
def x8_length_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-8 (r7): LENGTH-BUCKETED BATCHING — the PADDING strategy's
    manifest, complementing ``x8_token_packing`` (the CONCAT strategy):
    documents are banded by token length (so batchmates have similar
    lengths), fixed-size batches of ``BATCH_SIZE`` form in deterministic
    doc_id order within each band, and each batch reports its padding
    waste ``1 − Σlen/(max_len·n)`` — the fraction of compute a padded
    batch burns on pad tokens, i.e. exactly the number dynamic batching
    exists to minimize. Fine-tuning stacks pad (this operator); 
    pretraining stacks pack (``x8_token_packing``); an engine for LLM
    data needs both manifests.

    Scale shape: the within-band rank is the GROUPED two-phase prefix
    COUNT (group = band, key = doc_id) — a per-band ROW_NUMBER window
    would funnel each band (a quarter of the corpus) through one task;
    the oracle may use the window because oracle scale is fixture scale.
    Everything after the rank is a keyed (band, batch) aggregate."""
    from etl_active911_spark.operators.textual import BPE_ISH_PATTERN

    d = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_count(F.lower("text"), F.lit(BPE_ISH_PATTERN))
        .cast("bigint")
        .alias("n_tokens"),
    )
    b = d.withColumn("band", F.expr(_LEN_BANDS_SQL)).withColumn(
        "one", F.lit(1)
    )
    r = _two_phase_prefix_sum(b, "one", key="doc_id", group_cols=("band",))
    return (
        r.withColumn("batch_id", F.expr(f"CAST(start_off DIV {BATCH_SIZE} AS BIGINT)"))
        .groupBy("band", "batch_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.max("n_tokens").cast("bigint").alias("max_len"),
            F.sum("n_tokens").cast("bigint").alias("sum_len"),
            F.round(
                F.lit(1.0)
                - F.sum("n_tokens").cast("double")
                / F.greatest(F.max("n_tokens") * F.count(F.lit(1)), F.lit(1)),
                6,
            ).alias("pad_frac"),
        )
    )


# ---------------------------------------------------------------------------
# X-8 (r7): token-budget allocation across sources (exact water-filling)
# ---------------------------------------------------------------------------


#: The water-filling CTE tail (everything downstream of ``caps``/``t``) —
#: shared by x8_budget_allocation and the dedup-aware x8_budget_effective
#: so the two oracles can never drift apart.
_WATER_FILL_TAIL_SQL = """
    r AS (
        SELECT source, cap,
               ROW_NUMBER() OVER (ORDER BY cap, source) AS k,
               CAST(SUM(cap) OVER (ORDER BY cap, source
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cap
                    AS BIGINT) AS pfx
        FROM caps
    ),
    s AS (
        SELECT r.*, t.budget, t.n,
               CASE WHEN r.pfx + r.cap * (t.n - r.k + 1) <= t.budget
                    THEN 1 ELSE 0 END AS sat
        FROM r CROSS JOIN t
    ),
    agg AS (
        SELECT CAST(SUM(sat) AS BIGINT) AS n_sat,
               CAST(SUM(CASE WHEN sat = 1 THEN cap ELSE 0 END) AS BIGINT) AS used
        FROM s
    ),
    lvl AS (
        SELECT s.*, agg.n_sat, agg.used,
               (s.budget - agg.used) // (s.n - agg.n_sat) AS level,
               (s.budget - agg.used) % (s.n - agg.n_sat) AS extra,
               CASE WHEN s.sat = 0
                    THEN ROW_NUMBER() OVER (PARTITION BY s.sat ORDER BY s.cap, s.source)
                    ELSE 0 END AS uj
        FROM s CROSS JOIN agg
    )
    SELECT source, cap AS capacity,
           CAST(CASE WHEN sat = 1 THEN cap
                     ELSE level + CASE WHEN uj <= extra THEN 1 ELSE 0 END
                END AS BIGINT) AS allocation,
           CAST(sat AS INT) AS saturated
    FROM lvl
    """


def _budget_alloc_oracle() -> str:
    from etl_active911_spark.functions.textpat import BPE_ISH_PATTERN

    pat = BPE_ISH_PATTERN.replace("'", "''")
    return f"""
    WITH caps AS (
        SELECT source,
               CAST(SUM(len(regexp_extract_all(LOWER(text), '{pat}'))) AS BIGINT) AS cap
        FROM documents GROUP BY source
    ),
    t AS (SELECT CAST(SUM(cap) AS BIGINT) // 2 AS budget, COUNT(*) AS n FROM caps),
    {_WATER_FILL_TAIL_SQL}"""


@query("x8_budget_allocation", _budget_alloc_oracle())
def x8_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-8 (r7): TOKEN-BUDGET ALLOCATION across sources by exact integer
    WATER-FILLING: given a total training budget (here derived as 50% of
    corpus tokens, deterministic) and per-source capacities, small
    sources are taken whole (saturated) and the remaining budget splits
    EQUALLY across the rest — the max-min fair allocation behind "cap
    the big crawls, keep all of the good small corpora" curation plans.
    A source is saturated iff funding every source from its sorted
    position onward at its own capacity still fits (monotone predicate,
    provably the water-filling cut); the division remainder goes to the
    smallest unsaturated sources, one unit each, so Σ allocation ==
    budget EXACTLY and every quantity stays an int64 end-to-end — no
    float enters the computation at any point.

    Scale shape: one corpus scan for per-source token caps; everything
    after runs on the |sources|-row table (windows over ≤ |sources|
    rows, 1-row scalar broadcasts)."""
    from etl_active911_spark.operators.textual import BPE_ISH_PATTERN

    caps = (
        read_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.sum(F.regexp_count(F.lower("text"), F.lit(BPE_ISH_PATTERN)))
            .cast("bigint")
            .alias("cap")
        )
    )
    t = caps.agg(
        # Integer division on BOTH engines (ADVICE r07): DuckDB's
        # CAST(double AS BIGINT) rounds half-to-even while Spark's
        # double->bigint cast truncates, so `SUM/2` diverges whenever the
        # total is odd with an even floor. `DIV` keeps int64 end-to-end.
        F.expr("CAST(sum(cap) DIV 2 AS BIGINT)").alias("budget"),
        F.count(F.lit(1)).alias("n"),
    )
    return water_fill(caps, t)


def water_fill(caps: DataFrame, t: DataFrame) -> DataFrame:
    """Exact integer water-filling core of ``x8_budget_allocation``:
    ``caps`` = (source, cap), ``t`` = 1-row (budget, n). Exposed so the
    saturation branch (skewed capacities) is pinned by its own synthetic
    test — the near-uniform fixture never saturates at a 50% budget.

    NON-NEGATIVITY ASSUMPTION (ADVICE r08): cross-engine equivalence of
    the residual division relies on Spark ``DIV`` (truncate toward zero)
    and DuckDB ``//`` (floor) agreeing — true only for non-negative
    operands. Holds here because caps are regexp counts (≥ 0) and
    ``budget - used ≥ 0`` by the saturation predicate; do NOT reuse this
    core with signed quantities without switching both engines to an
    explicit floor."""
    wo = Window.orderBy("cap", "source")
    wf = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r = caps.select(
        "source",
        "cap",
        F.row_number().over(wo).alias("k"),
        (F.sum("cap").over(wf) - F.col("cap")).cast("bigint").alias("pfx"),
    )
    s = r.crossJoin(F.broadcast(t)).withColumn(
        "sat",
        F.when(
            F.col("pfx") + F.col("cap") * (F.col("n") - F.col("k") + 1) <= F.col("budget"),
            1,
        ).otherwise(0),
    )
    agg = s.agg(
        F.sum("sat").cast("bigint").alias("n_sat"),
        F.sum(F.when(F.col("sat") == 1, F.col("cap")).otherwise(0)).cast("bigint").alias("used"),
    )
    wu = Window.partitionBy("sat").orderBy("cap", "source")
    lvl = (
        s.crossJoin(F.broadcast(agg))
        .withColumn("level", F.expr("(budget - used) DIV (n - n_sat)"))
        .withColumn("extra", F.expr("(budget - used) % (n - n_sat)"))
        .withColumn(
            "uj",
            F.when(F.col("sat") == 0, F.row_number().over(wu)).otherwise(F.lit(0)),
        )
    )
    return lvl.select(
        "source",
        F.col("cap").alias("capacity"),
        F.when(F.col("sat") == 1, F.col("cap"))
        .otherwise(F.col("level") + F.when(F.col("uj") <= F.col("extra"), 1).otherwise(0))
        .cast("bigint")
        .alias("allocation"),
        F.col("sat").cast("int").alias("saturated"),
    )


# ---------------------------------------------------------------------------
# X-8 (r7): temperature-annealed mixture schedule (exact powers)
# ---------------------------------------------------------------------------


@query(
    "x8_mixture_schedule",
    """
    WITH per AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY source
    ),
    tot AS (SELECT SUM(n_docs) AS n FROM per),
    frac AS (
        SELECT source, n_docs, CAST(n_docs AS DOUBLE) / n AS p
        FROM per CROSS JOIN tot
    ),
    powed AS (
        SELECT source, n_docs, e,
               CASE e WHEN 0 THEN sqrt(p)
                      WHEN 1 THEN sqrt(p) * sqrt(sqrt(p))
                      ELSE p END AS w
        FROM frac CROSS JOIN (SELECT unnest(range(3)) AS e)
    ),
    z AS (SELECT e, SUM(w) AS zz FROM powed GROUP BY e)
    SELECT p.e AS epoch, p.source, p.n_docs,
           ROUND(p.w / z.zz, 6) AS share
    FROM powed p JOIN z ON p.e = z.e
    """,
)
def x8_mixture_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-8 (r7): temperature-ANNEALED mixture schedule — the multi-epoch
    curriculum over source weights: epoch 0 trains near-uniform
    (α = 1/2, small sources upweighted), later epochs anneal toward the
    natural distribution (α: 1/2 → 3/4 → 1), the standard multilingual/
    multi-source schedule. Per (epoch, source): tempered share
    ``p^α / Σ p^α``.

    Exactness: α is restricted to {1/2, 3/4, 1} ON PURPOSE — those
    powers compose from sqrt (``sqrt(p)``, ``sqrt(p)·sqrt(sqrt(p))``,
    ``p``), and sqrt is IEEE-correctly-rounded in every engine, where a
    general ``pow(p, α)`` differs in the last ulp across libms (the
    x8_mixture_weights α=1/2 rationale, extended to a schedule). The
    per-epoch normalizer sums |sources| doubles in an aggregate — at 5
    sources and round-6 output, order effects are below visibility; the
    grid is (sources × epochs) rows.

    Scale shape: one corpus scan for per-source counts; the schedule is
    pure arithmetic over a |sources|×3 table."""
    per = (
        read_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    tot = per.agg(F.sum("n_docs").alias("n"))
    frac = per.crossJoin(F.broadcast(tot)).select(
        "source", "n_docs", (F.col("n_docs").cast("double") / F.col("n")).alias("p")
    )
    epochs = spark.range(3).select(F.col("id").cast("int").alias("e"))
    w = (
        F.when(F.col("e") == 0, F.sqrt("p"))
        .when(F.col("e") == 1, F.sqrt("p") * F.sqrt(F.sqrt("p")))
        .otherwise(F.col("p"))
    )
    powed = frac.crossJoin(F.broadcast(epochs)).select(
        "source", "n_docs", "e", w.alias("w")
    )
    z = powed.groupBy("e").agg(F.sum("w").alias("zz"))
    return powed.join(z, "e").select(
        F.col("e").alias("epoch"),
        "source",
        "n_docs",
        F.round(F.col("w") / F.col("zz"), 6).alias("share"),
    )


# ---------------------------------------------------------------------------
# X-9 (r7): release manifest with shard checksums
# ---------------------------------------------------------------------------


@query(
    "x9_release_manifest",
    f"""
    WITH d AS (
        SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               md5(text) AS h
        FROM documents
    ),
    c AS (
        SELECT doc_id, n_bytes, h,
               SUM(n_bytes) OVER (ORDER BY doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM d
    ),
    sh AS (
        SELECT doc_id, n_bytes, h,
               CAST((cum - n_bytes) // {TARGET_SHARD_BYTES} AS BIGINT) AS shard_id
        FROM c
    )
    SELECT shard_id,
           'shard-' || LPAD(CAST(shard_id AS STRING), 5, '0') || '.parquet' AS shard_name,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_bytes) AS BIGINT) AS shard_bytes,
           md5(string_agg(h, '' ORDER BY doc_id)) AS content_checksum
    FROM sh GROUP BY shard_id
    """,
)
def x9_release_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-9 (r7): the RELEASE MANIFEST — what a dataset publisher ships
    next to the shards: per shard, a stable file name, document and byte
    counts, and a CONTENT CHECKSUM (md5 over the per-document content
    hashes concatenated in doc order — the chain any consumer can
    recompute to verify an undamaged, untampered, correctly-ordered
    shard). Composes ``assign_shards``' distributed prefix sum; the
    checksum chain uses the ordered ``listagg`` collapse (the
    x2_cdc_chunks discipline), so per-doc hashes — 32 bytes each, never
    the text — are the only thing the shard aggregate carries.

    Scale shape: the prefix sum is the two-phase distributed form; the
    per-shard aggregate groups by shard_id (hash-partitioned); the
    concatenated hash string per shard is bounded by docs-per-shard ×
    32 B (the 64 KiB fixture shard ≈ tens of docs; a production 1 GB
    shard ≈ a few MB of hex — one aggregate buffer, not a corpus)."""
    docs = read_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.octet_length("text").cast("bigint").alias("n_bytes"),
        F.md5("text").alias("h"),
    )
    sh = _two_phase_prefix_sum(d, "n_bytes").withColumn(
        "shard_id", F.expr(f"CAST(start_off DIV {TARGET_SHARD_BYTES} AS BIGINT)")
    )
    return (
        sh.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_bytes").cast("bigint").alias("shard_bytes"),
            F.md5(F.expr("listagg(h, '') WITHIN GROUP (ORDER BY doc_id)")).alias(
                "content_checksum"
            ),
        )
        .select(
            "shard_id",
            F.concat(
                F.lit("shard-"), F.lpad(F.col("shard_id").cast("string"), 5, "0"), F.lit(".parquet")
            ).alias("shard_name"),
            "n_docs",
            "shard_bytes",
            "content_checksum",
        )
    )


# ---------------------------------------------------------------------------
# X-8 (r9): dedup-aware budget allocation (effective tokens + water-filling)
# ---------------------------------------------------------------------------


def _budget_effective_oracle() -> str:
    from etl_active911_spark.functions.textpat import BPE_ISH_PATTERN

    pat = BPE_ISH_PATTERN.replace("'", "''")
    return f"""
    WITH d AS (
        SELECT doc_id, source,
               sha256(TRIM(regexp_replace(LOWER(text), '\\s+', ' ', 'g'))) AS h,
               CAST(len(regexp_extract_all(LOWER(text), '{pat}')) AS BIGINT) AS n_tok
        FROM documents
    ),
    kp AS (SELECT h, MIN(doc_id) AS keeper FROM d GROUP BY h),
    caps AS (
        SELECT d.source,
               CAST(SUM(CASE WHEN d.doc_id = kp.keeper THEN d.n_tok ELSE 0 END)
                    AS BIGINT) AS cap
        FROM d JOIN kp ON d.h = kp.h
        GROUP BY d.source
    ),
    t AS (SELECT CAST(SUM(cap) AS BIGINT) // 2 AS budget, COUNT(*) AS n FROM caps),
    {_WATER_FILL_TAIL_SQL}"""


@query("x8_budget_effective", _budget_effective_oracle())
def x8_budget_effective(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-8 (r9): DEDUP-AWARE budget allocation — ``x8_budget_allocation``
    re-based on EFFECTIVE capacities: each source's cap is its
    post-exact-dedup BPE-ish token volume (keeper = min doc_id per
    normalized content hash, the x2_effective_tokens accounting), so a
    source whose bulk is duplicated text no longer crowds the water-fill
    — allocating against RAW counts over-funds exactly the sources dedup
    will later gut, the budget-planning bug this composition closes.
    Water-fill core (and its non-negativity invariant: dedup'd token
    sums are ≥ 0) shared verbatim with x8_budget_allocation; the oracle
    shares the SQL tail via ``_WATER_FILL_TAIL_SQL``.

    Scale shape: one scan computes (hash, token count) per doc; keeper
    choice is a hash-keyed aggregate; the water-fill runs on the
    |sources|-row capacity table with 1-row scalar broadcasts."""
    from etl_active911_spark.functions.textpat import BPE_ISH_PATTERN
    from etl_active911_spark.operators.dedup import normalized_text

    d = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.sha2(normalized_text(F.col("text")), 256).alias("h"),
        F.regexp_count(F.lower("text"), F.lit(BPE_ISH_PATTERN))
        .cast("bigint")
        .alias("n_tok"),
    )
    kp = d.groupBy("h").agg(F.min("doc_id").alias("keeper"))
    caps = (
        d.join(kp, "h")
        .groupBy("source")
        .agg(
            F.sum(
                F.when(F.col("doc_id") == F.col("keeper"), F.col("n_tok")).otherwise(0)
            )
            .cast("bigint")
            .alias("cap")
        )
    )
    t = caps.agg(
        F.expr("CAST(SUM(cap) AS BIGINT) DIV 2").alias("budget"),
        F.count(F.lit(1)).alias("n"),
    )
    return water_fill(caps, t)


# ---------------------------------------------------------------------------
# X-8 (r9): split leakage audit (doc-level vs cluster-level assignment)
# ---------------------------------------------------------------------------


def _split_leakage_oracle() -> str:
    from etl_active911_spark.operators.dedup import MINHASH_CTES

    doc_b = _bucket_sql("doc_id")
    key_a = "CAST(COALESCE(ca.component, p.doc_a) AS STRING)"
    key_b = "CAST(COALESCE(cb.component, p.doc_b) AS STRING)"
    return f"""
    WITH RECURSIVE {MINHASH_CTES},
    prs AS (SELECT doc_a, doc_b FROM verified WHERE jac >= 0.5),
    cedges AS (
        SELECT doc_a AS src, doc_b AS dst FROM prs
        UNION
        SELECT doc_b, doc_a FROM prs
    ),
    walk(src, dst) AS (
        SELECT src, dst FROM cedges
        UNION
        SELECT w.src, e.dst FROM walk w JOIN cedges e ON w.dst = e.src
    ),
    reach AS (
        SELECT src AS doc_id, dst FROM walk
        UNION
        SELECT src, src FROM cedges
    ),
    comp AS (SELECT doc_id, MIN(dst) AS component FROM reach GROUP BY doc_id),
    flags AS (
        SELECT p.doc_a, p.doc_b,
               CASE WHEN (SELECT {doc_b.replace('doc_id', 'p.doc_a')}) < 90
                    THEN 1 ELSE 0 END AS da,
               CASE WHEN (SELECT {doc_b.replace('doc_id', 'p.doc_b')}) < 90
                    THEN 1 ELSE 0 END AS db,
               CASE WHEN (('0x' || substr(md5({key_a}), 1, 8))::BIGINT) % 100 < 80
                    THEN 1 ELSE 0 END AS ka,
               CASE WHEN (('0x' || substr(md5({key_b}), 1, 8))::BIGINT) % 100 < 80
                    THEN 1 ELSE 0 END AS kb
        FROM prs p
        LEFT JOIN comp ca ON ca.doc_id = p.doc_a
        LEFT JOIN comp cb ON cb.doc_id = p.doc_b
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN da <> db THEN 1 ELSE 0 END) AS BIGINT)
               AS n_straddle_doc_split,
           CAST(SUM(CASE WHEN ka <> kb THEN 1 ELSE 0 END) AS BIGINT)
               AS n_straddle_cluster_split,
           ROUND(CAST(SUM(CASE WHEN da <> db THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS doc_split_leak_rate
    FROM flags
    """


@query("x8_split_leakage_audit", _split_leakage_oracle())
def x8_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-8 (r9): SPLIT LEAKAGE AUDIT — the measurement that justifies
    cluster-aware splitting: over every verified near-dup pair, how many
    straddle the train/holdout boundary under the naive DOC-level
    assignment (``x8_train_holdout_split``'s 90/10 hash rule) vs under
    the CLUSTER-level assignment (``x8_cluster_split``'s 80/20 rule on
    the component key). The cluster column is ZERO BY CONSTRUCTION (both
    pair members share a component ⇒ the same key hashes to the same
    side) — the audit proves it on the actual corpus rather than
    asserting it, and the doc-split column quantifies the eval
    contamination a team ships if they skip the cluster split.

    Scale shape: pairs and component labels both ride the rule-25 memos
    (``shared_verified_pairs`` / ``shared_component_labels``); the
    component lookup is two pair-sized joins; everything after is one
    1-row aggregate over pair-count rows."""
    from etl_active911_spark.operators.dedup import (
        shared_component_labels,
        shared_verified_pairs,
    )

    pairs = shared_verified_pairs(spark, sf_dir).select("doc_a", "doc_b")
    comp = shared_component_labels(spark, sf_dir)
    ca = comp.select(F.col("doc_id").alias("doc_a"), F.col("component").alias("comp_a"))
    cb = comp.select(F.col("doc_id").alias("doc_b"), F.col("component").alias("comp_b"))
    f = (
        pairs.join(ca, "doc_a", "left")
        .join(cb, "doc_b", "left")
        .select(
            (hash_bucket(F.col("doc_a")) < 90).cast("int").alias("da"),
            (hash_bucket(F.col("doc_b")) < 90).cast("int").alias("db"),
            (hash_bucket(F.coalesce("comp_a", F.col("doc_a"))) < 80)
            .cast("int")
            .alias("ka"),
            (hash_bucket(F.coalesce("comp_b", F.col("doc_b"))) < 80)
            .cast("int")
            .alias("kb"),
        )
    )
    return f.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.when(F.col("da") != F.col("db"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_straddle_doc_split"),
        F.sum(F.when(F.col("ka") != F.col("kb"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_straddle_cluster_split"),
        F.round(
            F.sum(F.when(F.col("da") != F.col("db"), 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("doc_split_leak_rate"),
    )


# ---------------------------------------------------------------------------
# X-8 (r10): per-source token quota fill (domain caps)
# ---------------------------------------------------------------------------

SOURCE_QUOTA_TOKENS = 800  # per-source token cap (domain over-representation)


def _quota_fill_oracle() -> str:
    from etl_active911_spark.operators.textual import BPE_ISH_PATTERN

    pat = BPE_ISH_PATTERN.replace("'", "''")
    return f"""
    WITH t AS (
        SELECT doc_id, source,
               CAST(len(regexp_extract_all(LOWER(text), '{pat}'))
                    AS BIGINT) AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, source, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM t
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN cum <= {SOURCE_QUOTA_TOKENS} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN cum <= {SOURCE_QUOTA_TOKENS} THEN n_tokens
                         ELSE 0 END) AS BIGINT) AS tokens_kept,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_total,
           ROUND(CAST(SUM(CASE WHEN cum <= {SOURCE_QUOTA_TOKENS} THEN n_tokens
                              ELSE 0 END) AS DOUBLE)
                 / CAST({SOURCE_QUOTA_TOKENS} AS DOUBLE), 6) AS quota_fill
    FROM c GROUP BY source
    """


@query("x8_source_quota_fill", _quota_fill_oracle())
def x8_source_quota_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-8 (r10): PER-SOURCE TOKEN QUOTAS — the domain-cap operator
    ("no single domain exceeds N tokens") that every web-scale mixture
    applies before temperature weighting: docs fill each source's
    SOURCE_QUOTA_TOKENS budget in deterministic doc_id order (a
    content-addressed order would slot in identically), and the report
    shows per source how many docs made the cut, the kept/total token
    mass, and the quota fill rate (>1 impossible, <1 = source exhausted
    under its cap).

    Scale shape: the cumulative sum is a SOURCE-KEYED window (bounded
    partitions — never the global-ORDER-BY window SCALE.md bans; the
    global variant is exactly ``x8_token_packing``'s two-phase prefix
    sum), followed by one |sources|-group rollup."""
    from etl_active911_spark.operators.textual import BPE_ISH_PATTERN

    from etl_active911_spark.io import spread

    docs = spread(read_table(spark, sf_dir, "documents"), "source").select(
        "doc_id",
        "source",
        F.regexp_count(F.lower("text"), F.lit(BPE_ISH_PATTERN))
        .cast("bigint")
        .alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = docs.withColumn("cum", F.sum("n_tokens").over(w))
    kept = F.when(F.col("cum") <= SOURCE_QUOTA_TOKENS, F.col("n_tokens")).otherwise(0)
    return c.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("cum") <= SOURCE_QUOTA_TOKENS, 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
        F.sum(kept).cast("bigint").alias("tokens_kept"),
        F.sum("n_tokens").cast("bigint").alias("tokens_total"),
        F.round(
            F.sum(kept).cast("double") / F.lit(float(SOURCE_QUOTA_TOKENS)), 6
        ).alias("quota_fill"),
    )


# ---------------------------------------------------------------------------
# X-8 (r10): duplicate-aware sample weights (downweight, don't drop)
# ---------------------------------------------------------------------------


def _dup_weighted_oracle() -> str:
    from etl_active911_spark.operators.clustering import component_ctes

    return f"""
    WITH RECURSIVE {component_ctes()},
    sz AS (
        SELECT component, COUNT(*) AS size FROM assigned GROUP BY component
    ),
    wtd AS (
        SELECT a.doc_id, d.source,
               ROUND(1.0 / sz.size, 6) AS w
        FROM assigned a
        JOIN sz ON sz.component = a.component
        JOIN documents d ON d.doc_id = a.doc_id
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(SUM(w), 6) AS effective_docs,
           ROUND(SUM(w) / COUNT(*), 6) AS dedup_deflation
    FROM wtd GROUP BY source
    """


@query("x8_dup_weighted_counts", _dup_weighted_oracle())
def x8_dup_weighted_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-8 (r10): DUPLICATE-AWARE SAMPLE WEIGHTS — the soft alternative
    to dropping near-dups: every doc gets weight 1/|its near-dup
    cluster| (a cluster contributes ONE effective document regardless of
    how many copies exist), and the per-source report shows raw vs
    EFFECTIVE document counts and the deflation factor — the number that
    should feed mixture weighting instead of raw counts (the same bug
    ``x8_budget_effective`` closes for token budgets, at document grain
    with weights instead of keeper selection).

    Determinism: per-doc weights are pre-rounded to 6dp (each an exact
    multiple of 1e-6, so the double sum is order-exact far beyond corpus
    scale — the mean-cos discipline); only the final ratios round.

    Scale shape: components come straight from the memoized star-engine
    labels (``shared_component_labels``, rule 25); sizes and the weight
    join key on component (clusters ≪ corpus); one |sources|-group
    rollup."""
    from pyspark.sql import functions as F

    from etl_active911_spark.io import read_table
    from etl_active911_spark.operators.dedup import shared_component_labels

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    comp = shared_component_labels(spark, sf_dir)
    assigned = docs.join(comp, "doc_id", "left").select(
        "doc_id", "source", F.coalesce("component", F.col("doc_id")).alias("component")
    )
    sz = assigned.groupBy("component").agg(F.count(F.lit(1)).alias("size"))
    wtd = assigned.join(sz, "component").select(
        "source", F.round(F.lit(1.0) / F.col("size"), 6).alias("w")
    )
    return wtd.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(F.sum("w"), 6).alias("effective_docs"),
        F.round(F.sum("w") / F.count(F.lit(1)), 6).alias("dedup_deflation"),
    )


# ---------------------------------------------------------------------------
# X-8 (r10): mixture-temperature sweep over token mass
# ---------------------------------------------------------------------------

#: sweep grid: tau=1 proportional, tau=2 sqrt, tau=4 sqrt(sqrt) — fractional
#: powers are expressed as nested SQRT (IEEE-correctly-rounded, so both
#: engines produce bit-identical weights; POW is libm-dependent and banned
#: here) — and 'uniform' (tau -> infinity).
TEMP_SWEEP_TAUS = ("1", "2", "4", "uniform")

_TEMP_W_SQL = """CASE tau
               WHEN '1' THEN CAST(n_tokens AS DOUBLE)
               WHEN '2' THEN SQRT(CAST(n_tokens AS DOUBLE))
               WHEN '4' THEN SQRT(SQRT(CAST(n_tokens AS DOUBLE)))
               ELSE 1.0 END"""

_TEMP_SWEEP_ORACLE = f"""
    WITH per AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(string_split_regex(TRIM(text), '\\s+'))) AS BIGINT)
                   AS n_tokens
        FROM documents GROUP BY source
    ),
    taus AS (SELECT UNNEST([{", ".join(f"'{t}'" for t in TEMP_SWEEP_TAUS)}]) AS tau),
    w AS (
        SELECT t.tau, p.source, p.n_docs, p.n_tokens,
               CAST(ROUND(({_TEMP_W_SQL}) * 1000000) AS BIGINT) AS w_micro
        FROM taus t CROSS JOIN per p
    ),
    tot AS (
        SELECT tau, source, n_docs, n_tokens, w_micro,
               CAST(SUM(w_micro) OVER (PARTITION BY tau) AS BIGINT) AS t_micro
        FROM w
    ),
    sh AS (
        SELECT tau, source, n_docs, n_tokens,
               CAST((2::HUGEINT * w_micro * 1000000 + t_micro)
                    // (2::HUGEINT * t_micro) AS BIGINT) AS share_micro
        FROM tot
    ),
    eff AS (
        SELECT tau, source, n_docs, n_tokens, share_micro,
               CAST(SUM(share_micro) OVER (PARTITION BY tau) AS BIGINT) AS s1,
               CAST(SUM(share_micro * share_micro) OVER (PARTITION BY tau)
                    AS BIGINT) AS s2
        FROM sh
    )
    SELECT tau, source, n_docs, n_tokens,
           CAST(share_micro AS DOUBLE) / 1000000.0 AS tempered_share,
           CAST(CAST((2::HUGEINT * s1 * s1 * 1000000 + s2)
                     // (2::HUGEINT * s2) AS BIGINT) AS DOUBLE) / 1000000.0
               AS effective_sources
    FROM eff
    """


@query("x8_temperature_sweep", _TEMP_SWEEP_ORACLE)
def x8_temperature_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-8 (r10): MIXTURE-TEMPERATURE SWEEP — per sampling temperature
    tau in {{1, 2, 4, uniform}}, each source's tempered share of the
    training mixture (w = mass^(1/tau), normalized) over TOKEN mass (the
    budget currency; doc counts are uniform on this fixture and would
    sweep degenerately), plus the EFFECTIVE SOURCE COUNT
    (Σshare)²/Σshare² — the inverse-Simpson diversity the temperature
    dial actually controls. This is the table a curation run reads
    before picking tau: how much the head flattens, how many sources
    effectively contribute.

    Determinism: weights quantized to micro-units right after the
    (IEEE-exact) nested-SQRT transform; shares and effective counts are
    integer HALF-UP micro-divisions in 128-bit space (HUGEINT ≡
    DECIMAL(38,0)) because tau=1 weight micros exceed int64 headroom at
    ~10x fixture token mass.

    Scale shape: one source-keyed aggregate over the corpus (map-side
    combined token counts); everything after is |sources| x 4 rows —
    window sums over bounded partitions, zero corpus re-reads."""
    docs = read_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(F.split(F.trim(F.col("text")), r"\s+")))
        .cast("bigint")
        .alias("n_tokens"),
    )
    taus = spark.createDataFrame([(t,) for t in TEMP_SWEEP_TAUS], "tau string")
    w = per.crossJoin(F.broadcast(taus)).select(
        "tau",
        "source",
        "n_docs",
        "n_tokens",
        F.expr(f"CAST(ROUND(({_TEMP_W_SQL}) * 1000000) AS BIGINT)").alias("w_micro"),
    )
    wt = Window.partitionBy("tau")
    tot = w.withColumn("t_micro", F.sum("w_micro").over(wt).cast("bigint"))
    sh = tot.select(
        "tau",
        "source",
        "n_docs",
        "n_tokens",
        F.expr(
            "CAST((2 * CAST(w_micro AS DECIMAL(38,0)) * 1000000 + t_micro)"
            " div (2 * CAST(t_micro AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("share_micro"),
    )
    eff = sh.select(
        "tau",
        "source",
        "n_docs",
        "n_tokens",
        "share_micro",
        F.sum("share_micro").over(wt).cast("bigint").alias("s1"),
        F.sum(F.col("share_micro") * F.col("share_micro"))
        .over(wt)
        .cast("bigint")
        .alias("s2"),
    )
    return eff.select(
        "tau",
        "source",
        "n_docs",
        "n_tokens",
        (F.col("share_micro").cast("double") / 1000000.0).alias("tempered_share"),
        (
            F.expr(
                "CAST((2 * CAST(s1 AS DECIMAL(38,0)) * s1 * 1000000 + s2)"
                " div (2 * CAST(s2 AS DECIMAL(38,0))) AS BIGINT)"
            ).cast("double")
            / 1000000.0
        ).alias("effective_sources"),
    )


# ---------------------------------------------------------------------------
# X-8 (r10): context-length sweep — fragmentation vs sequence length
# ---------------------------------------------------------------------------

CTX_SWEEP_LENGTHS = (256, 1024, 4096)


def _ctx_sweep_oracle() -> str:
    from etl_active911_spark.operators.textual import BPE_ISH_PATTERN

    pat = BPE_ISH_PATTERN.replace("'", "''")
    lengths = ", ".join(str(x) for x in CTX_SWEEP_LENGTHS)
    return f"""
    WITH d AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(LOWER(text), '{pat}')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, n_tokens,
               CAST(SUM(n_tokens) OVER (ORDER BY doc_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS BIGINT) AS cum
        FROM d
    ),
    ls AS (SELECT UNNEST([{lengths}]) AS ctx_len),
    per AS (
        SELECT l.ctx_len,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN c.n_tokens > 0
                             AND (c.cum - c.n_tokens) // l.ctx_len
                                 <> (c.cum - 1) // l.ctx_len
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_straddling,
               CAST(MAX(c.cum) AS BIGINT) AS total_tokens
        FROM ls l CROSS JOIN c
        GROUP BY l.ctx_len
    )
    SELECT ctx_len, n_docs, total_tokens,
           CAST((total_tokens + ctx_len - 1) // ctx_len AS BIGINT) AS n_seqs,
           n_straddling,
           CAST((2 * n_straddling * 1000000 + n_docs)
                // (2 * n_docs) AS DOUBLE) / 1000000.0 AS straddle_frac
    FROM per
    """


@query("x8_context_length_sweep", _ctx_sweep_oracle())
def x8_context_length_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-8 (r10): CONTEXT-LENGTH SWEEP — for each candidate training
    sequence length L, how fragmented the packed corpus is: sequence
    count ceil(total/L) and the number/fraction of documents STRADDLING
    an L boundary under the streaming concat-in-doc_id-order packing of
    ``x8_token_packing`` (a straddling doc is split across training
    sequences — attention never sees it whole; the fraction falls as L
    grows, and this table prices that trade against the quadratic
    attention cost of longer L).

    Determinism: everything derives from ONE exact integer prefix sum
    (cum) — boundary tests are integer floor-divisions, the fraction is
    an integer HALF-UP micro-division.

    Scale shape: the prefix sum is the family's two-phase distributed
    core (``_two_phase_prefix_sum``, hostile-conf-tested — no global
    ORDER BY window at scale); the sweep joins the per-doc table to a
    3-row broadcast length grid and reduces to 3 rows."""
    from etl_active911_spark.operators.textual import BPE_ISH_PATTERN

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_count(F.lower("text"), F.lit(BPE_ISH_PATTERN))
        .cast("bigint")
        .alias("n_tokens"),
    )
    c = _two_phase_prefix_sum(docs, "n_tokens").select(
        "doc_id",
        "n_tokens",
        (F.col("start_off") + F.col("n_tokens")).cast("bigint").alias("cum"),
    )
    ls = spark.createDataFrame([(x,) for x in CTX_SWEEP_LENGTHS], "ctx_len bigint")
    per = (
        c.crossJoin(F.broadcast(ls))
        .groupBy("ctx_len")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(
                F.when(
                    (F.col("n_tokens") > 0)
                    & (
                        F.expr("(cum - n_tokens) div ctx_len")
                        != F.expr("(cum - 1) div ctx_len")
                    ),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_straddling"),
            F.max("cum").cast("bigint").alias("total_tokens"),
        )
    )
    return per.select(
        "ctx_len",
        "n_docs",
        "total_tokens",
        F.expr("CAST((total_tokens + ctx_len - 1) div ctx_len AS BIGINT)").alias(
            "n_seqs"
        ),
        "n_straddling",
        (
            F.expr(
                "CAST((2 * n_straddling * 1000000 + n_docs) div (2 * n_docs)"
                " AS BIGINT)"
            ).cast("double")
            / 1000000.0
        ).alias("straddle_frac"),
    )


# ---------------------------------------------------------------------------
# X-9 (r11): tamper-evident release lineage (hash-chained shard manifest)
# ---------------------------------------------------------------------------

LINEAGE_SHARD = 64  # docs per shard in the chained manifest


def _lineage_chain_sql(shards_rel: str) -> str:
    """The hash-chain recursion, shared verbatim by Spark (over a temp
    view) and DuckDB (over a CTE): chain_i = md5(chain_{i-1} ||
    shard_md5_i), seeded with md5(shard_md5_0). Strictly increasing
    shard_id, so UNION ALL terminates without fixpoint dedup
    (CLAUDE.md rule 14)."""
    return f"""
    WITH RECURSIVE chain AS (
        SELECT shard_id, n_docs, shard_md5, md5(shard_md5) AS chain_md5
        FROM {shards_rel} WHERE shard_id = 0
        UNION ALL
        SELECT s.shard_id, s.n_docs, s.shard_md5,
               md5(c.chain_md5 || s.shard_md5)
        FROM chain c JOIN {shards_rel} s ON s.shard_id = c.shard_id + 1
    )
    SELECT CAST(shard_id AS BIGINT) AS shard_id,
           CAST(n_docs AS BIGINT) AS n_docs,
           shard_md5, chain_md5
    FROM chain
    """


_LINEAGE_ORACLE = f"""
    WITH RECURSIVE shards AS (
        SELECT doc_id // {LINEAGE_SHARD} AS shard_id,
               COUNT(*) AS n_docs,
               md5(string_agg(md5(text), '' ORDER BY doc_id)) AS shard_md5
        FROM documents GROUP BY 1
    ),
    chain AS (
        SELECT shard_id, n_docs, shard_md5, md5(shard_md5) AS chain_md5
        FROM shards WHERE shard_id = 0
        UNION ALL
        SELECT s.shard_id, s.n_docs, s.shard_md5,
               md5(c.chain_md5 || s.shard_md5)
        FROM chain c JOIN shards s ON s.shard_id = c.shard_id + 1
    )
    SELECT CAST(shard_id AS BIGINT) AS shard_id,
           CAST(n_docs AS BIGINT) AS n_docs,
           shard_md5, chain_md5
    FROM chain
    """


@query("x9_lineage_chain", _LINEAGE_ORACLE)
def x9_lineage_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-9 (r11): TAMPER-EVIDENT RELEASE LINEAGE — the integrity layer on
    top of ``x9_release_manifest``: shard content digests folded into a
    HASH CHAIN (chain_i = md5(chain_{i-1} || shard_md5_i)), so the final
    link commits to every byte of every shard IN ORDER. A consumer
    verifying a published dataset recomputes the chain; any modified,
    dropped, reordered, or inserted shard changes every downstream link —
    the same construction as a git history or transparency log, and the
    answer to "is this EXACTLY the corpus the model card points to?".

    Shard digests: per-doc md5 folded per shard over the doc_id order
    (Spark: sort_array over the ≤{LINEAGE_SHARD}-element collected list —
    a BOUNDED higher-order transform, invariant-3 exempt; DuckDB:
    ordered string_agg). The chain itself runs as the SAME recursive
    UNION ALL SQL in both engines (strictly increasing shard_id — rule
    14 termination), over shard DIGESTS, never rows.

    Scale shape: one doc_id-keyed hash aggregate builds the shard table
    (map-side partial md5s; shard count = corpus/{LINEAGE_SHARD});
    the recursion walks |shards| single-row steps — sequential BY
    CONSTRUCTION (each link commits to the previous), which is the
    point of a chain; the walked relation is the tiny digest table, so
    depth, not width, is the only cost."""
    from etl_active911_spark.io import spread

    return lineage_chain(
        spark, spread(read_table(spark, sf_dir, "documents"), "doc_id")
    )


def lineage_chain(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Core of ``x9_lineage_chain`` over an arbitrary (doc_id, text)
    frame — split out so the tamper-evidence property (one flipped byte
    re-links every downstream chain entry, earlier links untouched) is
    pinned on crafted corpora in pytest."""
    shards = (
        docs.select(
            F.expr(f"doc_id div {LINEAGE_SHARD}").alias("shard_id"),
            F.struct("doc_id", F.md5("text").alias("h")).alias("dh"),
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.md5(
                F.concat_ws(
                    "",
                    F.transform(
                        F.array_sort(F.collect_list("dh")), lambda s: s["h"]
                    ),
                )
            ).alias("shard_md5"),
        )
    )
    shards.createOrReplaceTempView("x9_lineage_shards")
    return spark.sql(_lineage_chain_sql("x9_lineage_shards"))

