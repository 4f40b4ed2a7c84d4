"""Plan-shape pins for the r15 optimization round's session-2 changes.

Each test pins the STRUCTURAL property an optimization bought — the
removed corpus sort, count-table rejoin, or scalar-crossJoin chain —
so a future refactor cannot silently reintroduce it. Value-level
correctness is pinned elsewhere (oracle parity, CMS replica, textrank
goldens); these are the mechanical plan guards.
"""

from __future__ import annotations

from etl_active911_spark.plans import registry
from tests.conftest import SF_SMOKE

registry.load_all()


def _plan(spark, name: str) -> str:
    df = registry.QUERIES[name](spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_bigram_logprob_no_count_rejoin(spark):
    """Change 13: c1/c12 are window counts — the corpus-sized count
    rejoins (and the big ⋈ bc self-join) must stay gone. The only
    remaining join is the 1-row vocabulary broadcast."""
    plan = _plan(spark, "x4_bigram_logprob")
    assert "SortMergeJoin" not in plan, plan[:3000]
    assert "BroadcastHashJoin" not in plan, plan[:3000]
    assert plan.count("Window") >= 2  # the two count windows ARE the design


def test_countmin_gram_stream_sort_free(spark):
    """Change 15: bigram pairing is array-side — no window (and hence no
    per-doc position sort) anywhere in the sketch plan.

    Pinned on the ANALYZED logical plan (ADVICE r15): the gram pipeline
    is scoped_persist'd, and once cached the EXECUTED plan prints it as
    an InMemoryTableScan whose child rendering varies by Spark version —
    a window reintroduced inside the persisted subtree could pass an
    executed-plan pin vacuously. Cache substitution happens AFTER
    analysis, so the analyzed plan always shows the full logical tree."""
    df = registry.QUERIES["x4_countmin_sketch"](spark, SF_SMOKE)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "Window" not in analyzed, analyzed[:3000]


def test_pmi_adjacency_sort_free(spark):
    """Change 15: the PMI pair stream must not sort the corpus token
    stream — no window partitioned by doc_id (the final top-K ranking
    window over the tiny scored table is expected and allowed)."""
    plan = _plan(spark, "x4_pmi_bigrams")
    assert "windowspecdefinition(doc_id" not in plan, plan[:3000]


def test_unigram_logprob_no_vocab_join(spark):
    """Change 16: the per-token count is a window over the token stream;
    the vocab-count rejoin through a corpus-sized token join is gone."""
    plan = _plan(spark, "x4_unigram_logprob")
    assert "SortMergeJoin" not in plan, plan[:3000]
    assert "BroadcastHashJoin" not in plan, plan[:3000]
    assert plan.count("Window") >= 1


def test_mixture_weights_single_broadcast(spark):
    """Change 16: both tempered-mixture normalizers ride window sums and
    the share table joins the fact side BY KEY — zero nested-loop
    broadcasts remain anywhere in the plan (the per/tot/z scalar
    crossJoin chain cost one BNLJ per scalar before the rewrite)."""
    plan = _plan(spark, "x8_mixture_weights")
    assert plan.count("BroadcastNestedLoopJoin") == 0, plan[:3000]


def test_curation_v5_mixture_chain_collapsed(spark):
    """Change 16: the v5 funnel keeps at most the two prefix-sum bounds
    broadcasts (SCALE.md invariant 9) — the tot/z scalar chain is gone.
    Plan-text subtree repetition bounds this at 4 (each bounds table
    appears once per prefix-sum consumer branch)."""
    plan = _plan(spark, "x9_curation_v5")
    assert plan.count("BroadcastNestedLoopJoin") <= 4, plan[:3000]


def test_n19_bloom_bitset_in_plan(spark):
    """Change 14: the bloom bitset is densified in-plan — no frozen
    driver-side rows (ExistingRDD/LogicalRDD) anywhere, so every action
    recomputes the bloom from the key scan."""
    df = registry.QUERIES["n19_bloom_prefilter_join"](spark, SF_SMOKE)
    txt = df._jdf.queryExecution().toString()
    assert "ExistingRDD" not in txt and "LogicalRDD" not in txt, txt[:3000]
