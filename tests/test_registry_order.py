"""Contract tests for the driver's 50-row scoring window.

The harness records CORRECTNESS rows for only the FIRST 50 entries of
``__spark_entry__.queries()`` (observed in rounds 1 and 2). These tests pin
the curated ordering so every SURVEY §2 operator family keeps a hard driver
row each round, and the one filesystem-writing query can never abort the
sweep mid-window.
"""

from __future__ import annotations

import re

import __spark_entry__ as entry
from etl_active911_spark.plans import registry

WINDOW = 50

# Every §2 family that must be represented inside the scoring window,
# as a name-prefix (a family is covered if any windowed query matches).
# The r11 rebalance (VERDICT r10 item 3) trimmed CORE to one query per §2
# family; n15_/n16_ (beyond-survey SQL-API / recursive-CTE, not §2 ids)
# left the every-round window and are covered by the local 258-oracle
# replica plus periodic long-cycle rotation (registry queue comment).
REQUIRED_FAMILY_PREFIXES = [
    "flagship",
    "o2_", "o5_", "o10_", "o13_", "o15_", "o19_", "o22_",  # O-* pipeline surface
    "a911_pipeline", "a911_features",
    "n11_", "n12_", "n13_", "n14_",  # streaming + UDF surface
    "x1_", "x2_dup_clusters",
    "x4_", "x5_", "x6_", "x7_", "x8_", "x9_",
    "x3_pandas_matmul",
]

# The round-11 scoring window (CORRECTNESS_r11.json keys — 47/47 green on
# every oracled row, 3 rows-only by design, so nothing carries over): the
# rotation policy requires each round's window to re-earn driver rows for
# queries this set did NOT score.
R11_WINDOW = {
    "flagship_revenue_by_nation", "o2_source_roundtrip",
    "o5_base64_roundtrip", "o10_coord_resolve", "o13_response_extract",
    "o15_time_parse", "o19_links_dedup", "o22_error_accounting",
    "a911_pipeline_flat", "a911_features_nested", "n11_tumbling_window",
    "n12_session_window", "n13_pandas_scalar", "n14_stream_stream_join",
    "x1_exact_dedup", "x2_dup_clusters", "x3_pandas_matmul",
    "x4_token_stats", "x5_media_decode", "x6_ts_pattern_match",
    "x7_nearest_station", "x8_stratified_sample", "x9_curation_pipeline",
    "tpch_q22_idle_customers", "n2_correlated_subquery",
    "n4_approx_percentiles", "n5_approx_count_distinct",
    "x8_budget_effective", "x6_seasonal_strength",
    "x2_eval_contamination_report", "x7_geofence_assignment",
    "x5_media_validate", "x2_lsh_recall_eval", "x6_rollup_cascade",
    "x3_metric_sensitivity", "x2_cluster_size_histogram",
    "x6_minmax_downsample", "x7_hotspot_cells", "x2_cluster_template",
    "x8_split_leakage_audit", "x5_phash_banded_dedup", "x5_media_metadata",
    "x4_dup_ngram_fraction", "x9_curation_v7", "x2_bbit_minhash",
    "x4_template_detection", "x3_ann_stream_ingest", "x3_ann_ivf_delete",
    "x3_ann_ivf", "x3_ann_ivf_add_recall",
}

# The 27-slot r12 rotation queue pinned in the r11 registry queue-math
# note and re-pinned verbatim by VERDICT r11 item 1 — every named member
# must sit inside this round's scoring window.
PINNED_R12_QUEUE = {
    "x6_gap_detection", "x6_burstiness", "x4_doc_chunking",
    "x2_chunk_cross_dup", "x6_permutation_entropy", "x7_moran_i",
    "n21_attribution", "x6_sax_words", "x6_cross_correlation",
    "x7_ripley_k", "x3_knn_hubness", "x5_silence_gate",
    "x5_image_histogram", "x6_hurst", "x7_dbscan_labels",
    "x6_mann_kendall", "x3_ann_lsh_multiprobe", "x2_threshold_sweep",
    "x2_dedup_method_agreement", "x7_clark_evans", "x7_knox",
    "x3_ann_method_recall", "x8_temperature_sweep", "x6_haar_energy",
    "x4_msttr", "x3_ivf_nprobe_sweep", "x9_dup_quality_matrix",
}


def test_window_covers_every_family():
    names = list(entry.queries())
    window = names[:WINDOW]
    for prefix in REQUIRED_FAMILY_PREFIXES:
        assert any(n.startswith(prefix) for n in window), (
            f"family {prefix!r} has no query inside the driver's "
            f"{WINDOW}-row scoring window"
        )


def test_priority_names_all_registered_and_unique():
    registry.load_all()
    names = registry.PRIORITY + registry.LAST
    assert len(set(names)) == len(names)
    for n in names:
        assert n in registry.QUERIES, n


def test_ordering_is_a_permutation_of_the_registry():
    registry.load_all()
    ordered = list(registry.ordered_queries())
    assert sorted(ordered) == sorted(registry.QUERIES)
    assert len(ordered) == len(set(ordered))


def test_filesystem_writers_are_registered_last():
    names = list(entry.queries())
    assert names[-2:] == ["x3_ann_ivf_compact", "x3_ann_ivf_partitioned"]


def test_oracle_dict_is_subset_in_same_order():
    q = list(entry.queries())
    o = list(entry.oracle_sql())
    assert set(o) <= set(q)
    # oracle iteration order follows query order (driver zips by name, but
    # keep the dicts aligned for humans reading CORRECTNESS output)
    pos = {n: i for i, n in enumerate(q)}
    assert o == sorted(o, key=pos.__getitem__)


def test_windowed_queries_all_have_oracles():
    """Every query in the r12 scoring window carries a DuckDB oracle —
    the r12 window is 50/50 hash-checked (VERDICT r11 item 5: the
    rows-only sketches earned their weaker driver row in r11 and rotate
    out; their error-bound companions are oracled)."""
    names = list(entry.queries())[:WINDOW]
    oracles = entry.oracle_sql()
    missing = [n for n in names if n not in oracles]
    assert missing == [], missing


def test_priority_window_is_exactly_the_window_size():
    assert len(registry.PRIORITY) == WINDOW
    assert registry.PRIORITY == registry.CORE + registry.ROTATION


def test_rotation_reearns_driver_rows():
    """Rotation policy (VERDICT r03 item 3): at least 20 of the window's
    slots must go to queries the PREVIOUS round's window did not score,
    so hard driver evidence cycles through the whole registry over
    rounds. r12: all 47 oracled r11 rows were green, so no red row
    carries over and the whole ROTATION (27 slots) is fresh."""
    window = set(list(entry.queries())[:WINDOW])
    fresh = window - R11_WINDOW
    assert len(fresh) >= 20, sorted(fresh)
    assert set(registry.ROTATION) & R11_WINDOW == set()


def test_r12_pinned_queue_executes_exactly():
    """VERDICT r11 item 1: the 27-slot r12 queue pinned in r11 executes
    EXACTLY — every named member holds a slot in this round's window."""
    window = set(list(entry.queries())[:WINDOW])
    missing = PINNED_R12_QUEUE - window
    assert missing == set(), sorted(missing)


def test_core_is_single_cover_per_family():
    """VERDICT r10 item 3: CORE carries no family double-covers beyond
    the mandated flagship + a911 pair — each trimmed slot is a rotation
    slot the r10 operator wave gets back."""
    assert len(registry.CORE) == 23
    assert len(registry.ROTATION) == 27


# The 27-slot r13 queue pinned in the registry's queue-math note —
# pinned HERE too so the r13 rotation can be executed verbatim, and so
# the registry's "all oracled, verified in tests/test_registry_order.py"
# claim is mechanical.
PINNED_R13_QUEUE = (
    "x6_entropy_rate", "x8_context_length_sweep", "x4_unicode_anomaly",
    "x4_code_detection", "x2_boilerplate_scrub", "x5_media_hash_dedup",
    "x6_acf", "x6_ljung_box", "x9_curation_v8", "x4_textrank_keywords",
    "x6_robust_outliers", "x2_url_canonical_dedup", "x3_embedding_gram",
    "x5_mp4_box_walk", "x4_countmin_sketch", "x2_stream_neardup",
    "n24_cdc_apply", "n26_jsonl_deadletter", "x9_k_anonymity_audit",
    "n11_watermark_planner", "x4_lang_id", "x5_media_decode_real",
    "x8_train_holdout_split", "x6_ts_dtw", "n13_python_udtf",
    "n15_sql_api", "n16_recursive_cte",
)


def test_r13_queue_is_exactly_full_and_all_oracled():
    """The recorded r13 queue fills the 27 rotation slots exactly, every
    member is registered, none is already in CORE, and every member
    carries a DuckDB oracle — so executing it keeps the r13 window
    50/50 hash-checked (VERDICT r11 item 5)."""
    registry.load_all()
    assert len(PINNED_R13_QUEUE) == len(registry.ROTATION) == 27
    assert len(set(PINNED_R13_QUEUE)) == 27
    assert set(PINNED_R13_QUEUE) & set(registry.CORE) == set()
    for n in PINNED_R13_QUEUE:
        assert n in registry.QUERIES, n
        assert n in registry.ORACLES, f"{n}: rows-only query in the r13 queue"


def test_no_duplicate_registration_possible():
    registry.load_all()
    # names are valid python-ish identifiers (driver uses them as keys/files)
    for n in registry.QUERIES:
        assert re.fullmatch(r"[a-z0-9_]+", n), n
