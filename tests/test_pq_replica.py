"""Bit-level replica checks for the PQ ANN path (VERDICT r05 item 6).

``x3_ann_pq`` is rows-only for the driver (numpy codebook math is not
SQL-expressible), so this suite is its hard correctness evidence: an
INDEPENDENT single-process numpy implementation of the whole pipeline —
parquet read via pyarrow, identical codebook fit, encode, full-corpus ADC,
global shortlist, exact re-rank — compared EXACTLY against the distributed
result. What the comparison verifies is precisely the distributed
plumbing: the block decomposition, the cogroup, the per-block shortlist
(which must be a superset of the global one), the re-rank joins, and the
WindowGroupLimit top-k, none of which exist in the replica.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from tests.conftest import SF_SMOKE


def _round_half_up(x: np.ndarray, nd: int = 6) -> np.ndarray:
    """Spark's ROUND (half away from zero) — np.round / Python round are
    banker's (CLAUDE.md rule 11)."""
    p = 10.0**nd
    return np.sign(x) * np.floor(np.abs(x) * p + 0.5) / p


def _load_embeddings(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"])
    X = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], X[order]


def _replica_codebooks(ids: np.ndarray, X: np.ndarray):
    """Pure-numpy re-statement of _fit_pq_codebooks: same deterministic
    sample (vec_id % 7 == 0, ordered, first 256), same 2 Lloyd steps."""
    from etl_active911_spark.operators.similarity import EMB_DIM, PQ_K, PQ_M

    sel = ids % 7 == 0
    S = X[sel][:256]
    sub = EMB_DIM // PQ_M
    books = np.zeros((PQ_M, PQ_K, sub))
    for m in range(PQ_M):
        Xm = S[:, m * sub : (m + 1) * sub]
        C = Xm[:PQ_K].copy()
        for _ in range(2):
            d2 = ((Xm[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for k in range(PQ_K):
                members = Xm[assign == k]
                if len(members):
                    C[k] = members.mean(axis=0)
        books[m] = C
    return books


def _replica_codes(X: np.ndarray, books: np.ndarray) -> np.ndarray:
    from etl_active911_spark.operators.similarity import EMB_DIM, PQ_M

    sub = EMB_DIM // PQ_M
    codes = np.zeros((len(X), PQ_M), dtype=np.int64)
    for m in range(PQ_M):
        Xm = X[:, m * sub : (m + 1) * sub]
        d2 = ((Xm[:, None, :] - books[m][None, :, :]) ** 2).sum(axis=2)
        codes[:, m] = d2.argmin(axis=1)
    return codes


def test_pq_codes_match_replica_exactly(spark):
    """The distributed Arrow encode must emit byte-identical codes to the
    single-process replica — integers, so no tolerance."""
    from etl_active911_spark.io import read_table, spread
    from etl_active911_spark.operators.similarity import (
        _fit_pq_codebooks,
        pq_encode,
    )

    emb = spread(read_table(spark, SF_SMOKE, "embeddings"))
    books = _fit_pq_codebooks(emb)
    got = {
        r["vec_id"]: tuple(r["code"]) for r in pq_encode(emb, books).collect()
    }
    ids, X = _load_embeddings(SF_SMOKE)
    rep_books = _replica_codebooks(ids, X)
    assert np.array_equal(books, rep_books)  # codebook fit is bit-identical
    codes = _replica_codes(X, rep_books)
    want = {int(i): tuple(int(c) for c in row) for i, row in zip(ids, codes)}
    assert got == want


def test_pq_topk_matches_replica_exactly(spark):
    """End-to-end x3_ann_pq == single-process replica on
    (query_id, vec_id, rnk, round6(cosine)) — exact match, no recall
    slack. The per-block ADC shortlist must be a SUPERSET of the global
    top-`shortlist` under the canonical (round6 desc, vec_id asc) order,
    so the distributed result is exactly the replica's."""
    from etl_active911_spark.operators.similarity import (
        EMB_DIM,
        N_QUERIES,
        PQ_M,
        TOP_K,
        x3_ann_pq,
    )

    got = {
        (r["query_id"], r["rnk"]): (r["vec_id"], r["cosine"])
        for r in x3_ann_pq(spark, SF_SMOKE).collect()
    }

    ids, X = _load_embeddings(SF_SMOKE)
    books = _replica_codebooks(ids, X)
    codes = _replica_codes(X, books)
    sub = EMB_DIM // PQ_M
    qsel = ids < N_QUERIES
    q_ids, Q = ids[qsel], X[qsel]
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    lut = np.einsum("qms,mks->qmk", Qn.reshape(len(Qn), PQ_M, sub), books)
    shortlist = 8 * TOP_K
    norms = np.linalg.norm(X, axis=1)
    want = {}
    for qi, qid in enumerate(q_ids):
        s = lut[qi, np.arange(PQ_M)[None, :], codes].sum(axis=1)
        mask = ids != qid
        cand_ids, cand = ids[mask], s[mask]
        # global shortlist in canonical order (round6 desc, vec_id asc)
        order = np.lexsort((cand_ids, -_round_half_up(cand)))[:shortlist]
        sl_ids = cand_ids[order]
        # exact cosine re-rank on the shortlist
        sel = np.isin(ids, sl_ids)
        ex = (X[sel] @ X[qsel][qi]) / (norms[sel] * norms[qsel][qi])
        ex_ids = ids[sel]
        r6 = _round_half_up(ex)
        order2 = np.lexsort((ex_ids, -r6))[:TOP_K]
        for rnk, j in enumerate(order2, start=1):
            want[(int(qid), rnk)] = (int(ex_ids[j]), float(r6[j]))
    assert got == want
