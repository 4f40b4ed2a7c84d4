"""Plan-shape and contract pins for the r16 optimization round's changes.

Value-level correctness is pinned by oracle parity; these are the
mechanical guards for the structural properties each change bought."""

from __future__ import annotations

import os

from etl_active911_spark.plans import registry
from tests.conftest import SF_SMOKE

registry.load_all()


def test_reseed_plan_persist_free_and_memoized(spark):
    """r16 fold: occupancy + outlier ride ONE cell-keyed window pass, so
    the scoped_persist is gone — no InMemory nodes anywhere (the
    wrap_plan_memo eligibility contract) and the query is PLAN_MEMOED."""
    assert "x3_ann_ivf_reseed_plan" in registry.PLAN_MEMOED
    df = registry.QUERIES["x3_ann_ivf_reseed_plan"](spark, SF_SMOKE)
    txt = df._jdf.queryExecution().toString()
    assert "InMemoryRelation" not in txt and "InMemoryTableScan" not in txt, txt[:3000]


def test_reseed_plan_occupancy_folded_into_window(spark):
    """The occupancy count is a window function over the cell partition
    (count(1) windowspecdefinition(cell...)), not a separate groupBy-
    aggregate consumer of the scored assignment."""
    df = registry.QUERIES["x3_ann_ivf_reseed_plan"](spark, SF_SMOKE)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "windowspecdefinition(cell" in analyzed, analyzed[:3000]


def test_textrank_tokenized_corpus_not_persisted(spark):
    """r16 measured rejection: persisting select(doc_id, tokens(text))
    — the engine's most common plan fragment — lets the CacheManager
    substitute it into OTHER queries' plans by canonicalized-subtree
    match (it leaked an InMemoryRelation into x2_substr_scrub's
    memo-eligibility pin). The builder must not register that key."""
    from etl_active911_spark.plans import cache

    registry.QUERIES["x4_textrank_keywords"](spark, SF_SMOKE)
    assert "x4_textrank_keywords.toks" not in cache._LIVE


def test_bigram_comb_guarded_against_empty_token_array(spark):
    """ADVICE r15: the positional explode must not see a size-0 array
    (sequence(1, 0) is descending; element_at(t, 0) throws). The guard
    filter sits between tokenize and the explode."""
    df = registry.QUERIES["x4_bigram_logprob"](spark, SF_SMOKE)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "(size(t" in analyzed, analyzed[:3000]


def test_bench_disk_rows_and_io_probe():
    """r16 bench additions: the disk-row bracket names real HEADLINE
    queries and the IO probe measures something positive."""
    import bench

    assert set(bench.DISK_ROWS) <= set(bench.HEADLINE)
    sec = bench._io_probe()
    assert 0 < sec < 60


def test_driver_gate_selects_contract_modules():
    """The default pytest run must keep every contract-critical module
    (driver-budget gate, VERDICT r15 item 2) and each named module must
    exist on disk — a renamed file would silently shrink the gate."""
    from tests import conftest as c

    here = os.path.dirname(os.path.abspath(__file__))
    required = {
        "test_oracle_parity.py",
        "test_local_correctness.py",
        "test_oracle_types.py",
        "test_plan_hygiene.py",
        "test_plan_memo_wrap.py",
        "test_registry_order.py",
        "test_bench_contract.py",
    }
    assert required <= c.GATE_MODULES
    for name in c.GATE_MODULES:
        assert os.path.exists(os.path.join(here, name)), name
