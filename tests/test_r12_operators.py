"""Round-12 operator pins: the rule-25 memo wave's result-identity
contracts (VERDICT r11 items 3+4's "result-identical, exceptAll empty"
standard), the contamination family's tie-break/threshold semantics, and
the rebalance planner's conservation laws."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def test_shared_minhash_sigs_is_result_identical_and_memo_hits(spark):
    """The signature memo must equal a fresh private rebuild row-for-row
    (both directions), and a second call within the session must return
    the SAME materialized DataFrame (memo hit, not a rebuild)."""
    from etl_active911_spark.io import read_table, spread
    from etl_active911_spark.operators.dedup import (
        minhash_signatures,
        shared_minhash_sigs,
    )

    memo = shared_minhash_sigs(spark, SF_ORACLE)
    assert shared_minhash_sigs(spark, SF_ORACLE) is memo  # session memo hit
    fresh = minhash_signatures(spread(read_table(spark, SF_ORACLE, "documents"), "doc_id"))
    assert memo.exceptAll(fresh).count() == 0
    assert fresh.exceptAll(memo).count() == 0


def test_shared_component_labels_match_star_engine(spark):
    from etl_active911_spark.operators.clustering import connected_components_star
    from etl_active911_spark.operators.dedup import (
        shared_component_labels,
        shared_verified_pairs,
    )

    memo = shared_component_labels(spark, SF_ORACLE)
    assert shared_component_labels(spark, SF_ORACLE) is memo
    fresh = connected_components_star(shared_verified_pairs(spark, SF_ORACLE))
    assert memo.exceptAll(fresh).count() == 0
    assert fresh.exceptAll(memo).count() == 0


def test_geo_pair_graph_memo_is_result_identical(spark):
    from etl_active911_spark.operators.geo import (
        _colocated_pairs,
        _grid_points,
        _shared_pair_graph,
    )

    memo = _shared_pair_graph(spark, SF_ORACLE)
    assert _shared_pair_graph(spark, SF_ORACLE) is memo
    fresh = _colocated_pairs(_grid_points(spark, SF_ORACLE))
    assert memo.exceptAll(fresh).count() == 0
    assert fresh.exceptAll(memo).count() == 0


def test_shared_exact_topk_matches_cosine_topk(spark):
    from etl_active911_spark.operators.similarity import (
        shared_exact_topk,
        x3_cosine_topk,
    )

    memo = shared_exact_topk(spark, SF_ORACLE)
    assert shared_exact_topk(spark, SF_ORACLE) is memo
    fresh = x3_cosine_topk(spark, SF_ORACLE)
    assert memo.exceptAll(fresh).count() == 0
    assert fresh.exceptAll(memo).count() == 0


def test_contamination_tie_break_and_threshold(spark):
    """Crafted semantics: (a) two eval items at the SAME rounded cosine —
    the verdict names the LOWER eval_id; (b) the quarantine flag is ≥ τ
    INCLUSIVE (an exact-τ cosine flags)."""
    from etl_active911_spark.operators.similarity import (
        SEMCONTAM_TAU,
        semcontam_eval_block,
        train_contamination_rows,
    )

    # eval 10 and 20 are identical vectors -> identical cosines to any
    # train row; eval 30 is orthogonal to train vec 1
    ev = semcontam_eval_block(
        spark.createDataFrame(
            [(10, [1.0, 0.0]), (20, [1.0, 0.0]), (30, [0.0, 1.0])],
            "vec_id long, embedding array<double>",
        )
    )
    # train 1 aligned with eval 10/20 (cos 1.0 -> quarantined, tie-break
    # 10); train 2 = (−sin θ, cos θ) with θ = acos(τ): cosine vs eval
    # 30's (0, 1) axis is EXACTLY τ (the inclusive-threshold case) while
    # the (1, 0) evals sit at −sin θ < τ, so eval 30 is the argmax
    import math

    theta = math.acos(SEMCONTAM_TAU)
    tr = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [-math.sin(theta), math.cos(theta)])],
        "vec_id long, embedding array<double>",
    )
    got = {r["vec_id"]: r for r in train_contamination_rows(tr, ev).collect()}
    assert got[1]["top_eval_id"] == 10  # tie-break: lower eval id
    assert got[1]["top_cosine"] == 1.0 and got[1]["quarantined"] == 1
    # vec 2: nearest is eval 30 at exactly tau (rounded) -> flag fires
    assert got[2]["quarantined"] == 1
    assert abs(got[2]["top_cosine"] - round(SEMCONTAM_TAU, 6)) <= 1e-6


def test_rebalance_plan_conservation(spark):
    """Vectors are conserved by the Lloyd re-assignment: Σn_before ==
    Σn_after == corpus size, and global in/out movement balances."""
    from etl_active911_spark.io import read_table
    from etl_active911_spark.operators.similarity import x3_ann_ivf_rebalance_plan

    rows = x3_ann_ivf_rebalance_plan(spark, SF_ORACLE).collect()
    n_vecs = read_table(spark, SF_ORACLE, "embeddings").count()
    assert sum(r["n_before"] for r in rows) == n_vecs
    assert sum(r["n_after"] for r in rows) == n_vecs
    assert sum(r["n_in"] for r in rows) == sum(r["n_out"] for r in rows)
    for r in rows:
        assert r["n_after"] == r["n_before"] + r["n_in"] - r["n_out"]
        assert r["needs_rewrite"] == int(r["n_in"] + r["n_out"] > 0)


def test_contamination_argmax_stays_hash_aggregate(spark):
    """The argmax rides the order-preserving BIGINT encoding so it plans
    as a partial+final HashAggregate — a struct-max would silently fall
    back to SortAggregate (map-side sort of the full scored stream, the
    regression the r12 .explain audit caught)."""
    from etl_active911_spark.plans import registry
    from tests.conftest import SF_SMOKE

    registry.load_all()
    for name in ("x2_contamination_gate", "x2_semantic_contamination"):
        df = registry.QUERIES[name](spark, SF_SMOKE)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "SortAggregate" not in plan, name
        assert plan.count("HashAggregate") >= 2, name  # partial + final


def test_cluster_drift_merged_class_on_crafted_bridge(spark):
    """The MERGED verdict (unreachable on the fixture's pair-sized
    clusters): two base clusters {1,2} and {3,4} bridged by delta doc 10
    must report one full cluster with n_prior_components = 2 and class
    'merged'; an all-delta pair {20, 30} reports 'new'; base pair {5, 6}
    grown by delta 40 reports 'grown'."""
    from etl_active911_spark.operators.clustering import cluster_drift_rows

    pairs = spark.createDataFrame(
        [
            (1, 2),    # base cluster A
            (3, 4),    # base cluster B
            (1, 10),   # delta bridge...
            (10, 3),   # ...merging A and B
            (20, 30),  # all-delta family
            (5, 6),    # base cluster C
            (6, 40),   # delta grows C
        ],
        "doc_a long, doc_b long",
    )
    got = {r["component"]: r for r in cluster_drift_rows(pairs).collect()}
    assert got[1]["drift_class"] == "merged"
    assert got[1]["n_docs"] == 5 and got[1]["n_delta_docs"] == 1
    assert got[1]["n_prior_components"] == 2
    assert got[20]["drift_class"] == "new"
    assert got[20]["n_docs"] == got[20]["n_delta_docs"] == 2
    assert got[5]["drift_class"] == "grown"
    assert got[5]["n_prior_components"] == 1 and got[5]["n_delta_docs"] == 1


def test_license_propagation_invariants(spark):
    """x2_license_propagation: the propagated license is never LESS
    restrictive than the keeper's own; the understate flag is exactly
    rank(effective) > rank(keeper); and both audit classes fire at
    sf0.01 (clean single-license clusters AND understated keepers)."""
    from etl_active911_spark.operators.clustering import (
        LICENSE_LADDER,
        x2_license_propagation,
    )
    from tests.conftest import SF_ORACLE

    rows = x2_license_propagation(spark, SF_ORACLE).collect()
    assert rows
    rank = {n: i for i, n in enumerate(LICENSE_LADDER)}
    for r in rows:
        assert r.n_members >= 2
        assert rank[r.effective_license] >= rank[r.keeper_license]
        assert r.keeper_understates == (
            rank[r.effective_license] > rank[r.keeper_license]
        )
        assert r.keeper_license == LICENSE_LADDER[r.keeper % 4]
        assert 1 <= r.n_distinct_licenses <= len(LICENSE_LADDER)
    flags = {r.keeper_understates for r in rows}
    assert flags == {True, False}


def test_geotag_privacy_audit_classes(spark):
    """x5_geotag_privacy_audit: untagged assets (doc_id % 4 == 3) never
    appear; tagged assets outside every fence report zero; both scrub
    verdicts fire; and n_sensitive <= n_fences always."""
    from etl_active911_spark.operators.multimodal import x5_geotag_privacy_audit
    from tests.conftest import SF_ORACLE

    rows = x5_geotag_privacy_audit(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert r.doc_id % 3 == 0 and r.doc_id % 4 != 3
        assert 0 <= r.n_sensitive <= r.n_fences
        assert r.scrub_location == (r.n_sensitive >= 1)
        assert 3900 <= r.lat_c <= 4099 and -10600 <= r.lon_c <= -10451
    verdicts = {r.scrub_location for r in rows}
    assert verdicts == {True, False}
    assert any(r.n_fences == 0 for r in rows)     # tagged but outside all zones
    assert any(r.n_fences >= 2 for r in rows)     # overlapping zones counted per fence


def test_deletion_propagation_invariants(spark):
    """x2_deletion_propagation: collateral = members − requests per
    tainted cluster; the NULL-component total row equals the sum of the
    cluster rows; amplification > 1 actually occurs at sf0.01 (some
    purge removes copies nobody asked about)."""
    from etl_active911_spark.operators.clustering import x2_deletion_propagation
    from tests.conftest import SF_ORACLE

    rows = x2_deletion_propagation(spark, SF_ORACLE).collect()
    clusters = [r for r in rows if r.component is not None]
    totals = [r for r in rows if r.component is None]
    assert len(totals) == 1 and clusters
    t = totals[0]
    for r in clusters:
        assert r.n_direct_requests >= 1
        assert r.n_collateral == r.n_members - r.n_direct_requests >= 0
    assert t.n_members == sum(r.n_members for r in clusters)
    assert t.n_direct_requests == sum(r.n_direct_requests for r in clusters)
    assert t.n_collateral == sum(r.n_collateral for r in clusters)
    assert t.n_collateral >= 1  # amplification is real, not vacuous


def test_release_scorecard_decision(spark):
    """x9_release_scorecard: per-gate verdicts are metric <= threshold,
    the ALL row is their conjunction, and at sf0.01 the license gate
    blocks the release (conflicts exist) while the volume gates pass —
    the scorecard reads an honest no-ship with the blocking gate
    visible."""
    from etl_active911_spark.operators.clustering import (
        SCORECARD_GATES,
        x9_release_scorecard,
    )
    from tests.conftest import SF_ORACLE

    rows = {r.gate: r for r in x9_release_scorecard(spark, SF_ORACLE).collect()}
    assert set(rows) == {g for g, _ in SCORECARD_GATES} | {"ALL"}
    for g, th in SCORECARD_GATES:
        r = rows[g]
        assert r.threshold_micro == th
        assert r.passed == (r.metric_micro <= th)
    assert rows["ALL"].metric_micro is None
    assert rows["ALL"].passed == all(rows[g].passed for g, _ in SCORECARD_GATES)
    assert not rows["license_conflict_rate"].passed      # conflicts block
    assert rows["pii_quarantine_rate"].passed            # volume gates clear
    assert not rows["ALL"].passed                        # honest no-ship


def test_retention_cohorts_diagonal(spark):
    """n21_retention_cohorts: the offset-0 diagonal is 100% retention for
    EVERY cohort by construction; offsets are non-negative exact week
    multiples; per-cell actives never exceed cohort size; and sub-100%
    cells exist at sf0.01 (the matrix carries signal)."""
    from etl_active911_spark.operators.relational import n21_retention_cohorts
    from tests.conftest import SF_ORACLE

    rows = n21_retention_cohorts(spark, SF_ORACLE).collect()
    assert rows
    cohorts = {r.cohort_week for r in rows}
    diag = {r.cohort_week: r for r in rows if r.week_offset == 0}
    assert set(diag) == cohorts
    for r in diag.values():
        assert r.n_active_users == r.cohort_size and r.retention_micro == 1_000_000
    for r in rows:
        assert r.week_offset >= 0
        assert 1 <= r.n_active_users <= r.cohort_size
    assert any(r.retention_micro < 1_000_000 for r in rows)
