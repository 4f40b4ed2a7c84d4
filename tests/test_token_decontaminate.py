"""Synthetic-corpus pins for ``dedup.token_contamination`` — the fixture
exercises only the full-overlap path (2 contaminated docs, one island
each), so the interval-island merge's interesting cases live here:
disjoint islands, overlapping windows fused into one island, and the
short-doc whole-gram fallback.

Expectations are hand-derived in the comments (token positions are
1-based over the BPE-ish pre-tokens; mid-text words tokenize with a
leading space, which is why every copied span sits mid-text in both the
eval and train docs — a doc-initial token has no leading space and would
not match a mid-text copy)."""

from __future__ import annotations

from etl_active911_spark.operators.dedup import token_contamination

SPAN10 = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
SPAN8 = "alpha bravo charlie delta echo foxtrot golf hotel"
JUNK10 = "k1 k2 k3 k4 k5 k6 k7 k8 k9 k10"


def _run(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = token_contamination(docs, persist_key="test_tokdecon.hits")
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_disjoint_islands_and_overlap_fusion(spark):
    rows = [
        # eval doc: 'zz'(1) + SPAN10 tokens at positions 2..11
        (100, "src0", f"zz {SPAN10}"),
        # train A: 'aa'(1), span8 at 2..9, junk at 10..29 ('k1' is TWO
        # BPE-ish tokens ' k','1'), span8 again at 30..37, 'bb'(38) ->
        # hit windows i=2 and i=30, islands [2,9] and [30,37] -> 16
        # contaminated tokens of 38
        (1, "src1", f"aa {SPAN8} {JUNK10} {SPAN8} bb"),
        # train B: 'cc'(1), span10 at 2..11, 'dd'(12) -> hit windows
        # i=2,3,4 overlap -> ONE island [2,11] -> 10 of 12 tokens
        (2, "src1", f"cc {SPAN10} dd"),
    ]
    got = _run(spark, rows)
    assert set(got) == {1, 2}
    a = got[1]
    assert (a["n_hit_windows"], a["n_eval_docs"]) == (2, 1)
    assert (a["contaminated_tokens"], a["n_tokens"]) == (16, 38)
    assert a["contaminated_frac"] == round(16 / 38, 6)
    b = got[2]
    assert (b["n_hit_windows"], b["n_eval_docs"]) == (3, 1)
    assert (b["contaminated_tokens"], b["n_tokens"]) == (10, 12)
    assert b["contaminated_frac"] == round(10 / 12, 6)


def test_short_doc_whole_gram_fallback(spark):
    rows = [
        (100, "src0", "foo bar"),
        # 2-token train doc == 2-token eval doc: whole-doc gram match,
        # k_eff = 2, island [1,2], frac exactly 1.0
        (3, "src1", "foo bar"),
        # near-miss control: shares one token, no whole-gram match
        (4, "src1", "foo baz"),
    ]
    got = _run(spark, rows)
    assert set(got) == {3}
    c = got[3]
    assert (c["n_hit_windows"], c["n_eval_docs"]) == (1, 1)
    assert (c["contaminated_tokens"], c["n_tokens"]) == (2, 2)
    assert c["contaminated_frac"] == 1.0


def test_adjacent_but_not_overlapping_windows_merge(spark):
    # Train doc carries span10 at 2..11 AND span8 again at 12..19
    # (back-to-back): windows i=2..4 (from span10) and i=12 (the second
    # span8 copy) — [2,11] and [12,19] touch with NO gap token between
    # island ends? i=12 > max_prev_e=11 so they are SEPARATE islands by
    # the strict gap rule, total 10 + 8 = 18 tokens.
    rows = [
        (100, "src0", f"zz {SPAN10}"),
        (5, "src1", f"cc {SPAN10} {SPAN8} dd"),
    ]
    got = _run(spark, rows)
    e = got[5]
    # windows: span10 copy gives i=2,3,4; the second span8 copy starts at
    # token 12 (' alpha') matching eval window [2,9] -> i=12
    assert e["n_hit_windows"] == 4
    assert e["contaminated_tokens"] == 18
    assert e["n_tokens"] == 20
