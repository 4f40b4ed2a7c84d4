"""Contract tests for the r15 whole-plan memo (registry.PLAN_MEMOED).

The optimization removes per-call driver-side plan construction (rule 35)
WITHOUT caching any data: every action on the memoized DataFrame must
still recompute from the parquet inputs. These tests make the eligibility
rule mechanical and pin the no-result-caching property.
"""

from __future__ import annotations

import pytest

from etl_active911_spark.plans import cache, registry
from tests.conftest import SF_SMOKE

registry.load_all()


def test_all_plan_memoed_names_registered():
    missing = [n for n in registry.PLAN_MEMOED if n not in registry.QUERIES]
    assert not missing, missing


def test_wrapper_applied_and_idempotent():
    for name in registry.PLAN_MEMOED:
        assert getattr(registry.QUERIES[name], "_plan_memoed", False), name
    before = {n: registry.QUERIES[n] for n in registry.PLAN_MEMOED}
    registry._wrap_plan_memoed()
    for n, fn in before.items():
        assert registry.QUERIES[n] is fn, f"{n} double-wrapped"


@pytest.mark.parametrize("name", registry.PLAN_MEMOED)
def test_no_materialization_in_plan(spark, name):
    """ELIGIBILITY: a memoized plan must hold no cached-data nodes — no
    InMemoryTableScan/InMemoryRelation (scoped_persist inside the builder
    would carry cached blocks across bench runs) and no ExistingRDD/
    LogicalRDD (builder-side collect/localCheckpoint freezes computed
    values). A query that grows one of these must leave PLAN_MEMOED."""
    df = registry.QUERIES[name](spark, SF_SMOKE)
    txt = df._jdf.queryExecution().toString()
    for marker in ("InMemoryTableScan", "InMemoryRelation", "ExistingRDD", "LogicalRDD"):
        assert marker not in txt, f"{name}: {marker} in memoized plan"


def test_memo_hit_and_tz_key(spark):
    """Repeat invocation reuses the memoized ANALYZED subtree (the stored
    entry is the same object) while every call returns a FRESH Dataset
    wrapper — an executed instance must never leak its post-execution
    AQE plan to later plan-shape observers (the r15 in-suite hygiene
    failures). A session-TZ flip (the hostile sweep's move) must MISS
    the memo and build fresh, then hit again after restoring the zone."""
    from etl_active911_spark.plans import cache

    name = "flagship_revenue_by_nation"
    import os

    app_id = spark.sparkContext.applicationId
    sf_abs = os.path.abspath(SF_SMOKE)

    def stored(tz):
        # Filter on the FULL memo key (app id + sf_dir, not just name+tz):
        # in suite order, other tests legitimately add entries for other
        # sf_dirs and for restarted SparkContexts — matching on name+tz
        # alone made this test order-dependent (seen green in isolation,
        # red in the full r15 suite).
        return [
            v[1]
            for k, v in cache._QPLAN_MEMO.items()
            if k[0] == "q." + name and k[1] == app_id and k[2] == sf_abs and k[3] == tz
        ]

    prev = spark.conf.get("spark.sql.session.timeZone")
    a = registry.QUERIES[name](spark, SF_SMOKE)
    (sa,) = stored(prev)
    b = registry.QUERIES[name](spark, SF_SMOKE)
    (sb,) = stored(prev)
    assert sa is sb, "second call must HIT the memo (same stored subtree)"
    assert a is not b, "each call must return a fresh wrapper (plan hygiene)"
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        registry.QUERIES[name](spark, SF_SMOKE)
        (sc,) = stored("Asia/Tokyo")
        assert sc is not sa, "TZ flip must not serve the UTC-built plan"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    registry.QUERIES[name](spark, SF_SMOKE)
    (sd,) = stored(prev)
    assert sd is sa, "restored zone must hit the original entry"


def test_memoized_plan_stays_initial_after_execution(spark):
    """Regression pin for the r15 order-dependent hygiene failures: after
    an action on one returned instance, a NEW invocation's executedPlan
    must still be the INITIAL adaptive plan (isFinalPlan=false shape),
    not the executed instance's re-optimized plan — x8_epoch_shuffle read
    4 BroadcastNestedLoopJoins (vs 2) and n17_asof_join 2 Exchanges
    (vs 1) when the stored object itself was returned."""
    d1 = registry.QUERIES["x8_epoch_shuffle"](spark, SF_SMOKE)
    before = d1._jdf.queryExecution().executedPlan().toString().count(
        "BroadcastNestedLoopJoin"
    )
    d1.collect()
    d2 = registry.QUERIES["x8_epoch_shuffle"](spark, SF_SMOKE)
    after = d2._jdf.queryExecution().executedPlan().toString().count(
        "BroadcastNestedLoopJoin"
    )
    assert after == before, f"post-execution plan leaked: {before} -> {after}"


def test_memoized_plan_recomputes_every_action(spark):
    """No-result-caching proof: each action on the memoized DataFrame runs
    real Spark jobs (a cached result would run zero)."""
    name = "flagship_revenue_by_nation"
    df = registry.QUERIES[name](spark, SF_SMOKE)
    st = spark.sparkContext.statusTracker()
    df.count()
    mid = set(st.getJobIdsForGroup(None))
    df.count()
    after = set(st.getJobIdsForGroup(None))
    assert len(after - mid) >= 1, "second action ran no jobs — data was cached"


def test_fingerprint_covers_every_table(tmp_path):
    """table='*' fingerprints all parquet entries under sf_dir, so a
    rewrite of ANY input table invalidates the whole-plan memo."""
    import shutil
    import os

    for t in ("region", "nation"):
        shutil.copy(f"{SF_SMOKE}/{t}.parquet", tmp_path / f"{t}.parquet")
    fp1 = cache._fixture_fingerprint(str(tmp_path), "*")
    assert len(fp1) == 2
    os.utime(tmp_path / "nation.parquet", (0, 0))
    fp2 = cache._fixture_fingerprint(str(tmp_path), "*")
    assert fp1 != fp2
