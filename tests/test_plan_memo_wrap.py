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
    """Repeat invocation reuses the plan; a session-TZ flip (the hostile
    sweep's move) must MISS the memo and build fresh, then hit again
    after restoring the zone."""
    name = "flagship_revenue_by_nation"
    a = registry.QUERIES[name](spark, SF_SMOKE)
    b = registry.QUERIES[name](spark, SF_SMOKE)
    assert a is b
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        c = registry.QUERIES[name](spark, SF_SMOKE)
        assert c is not a, "TZ flip must not serve the UTC-built plan"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    d = registry.QUERIES[name](spark, SF_SMOKE)
    assert d is a


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
