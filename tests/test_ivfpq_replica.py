"""Exact-replica check for the composed IVF+PQ ANN path (r7; the
test_pq_replica / test_brp_replica pattern).

``x3_ann_ivf_pq`` is rows-only for the driver (numpy fits are not
SQL-expressible). This suite re-derives the WHOLE pipeline in a single
process — centroid fit, cell assignment, probe lists, per-probed-cell ADC,
global shortlist, exact re-rank — and matches the distributed result on
every output cell. What the comparison verifies is precisely the
distributed plumbing: the per-cell cogroup decomposition, the probe join,
the per-cell shortlist cap (which must be a SUPERSET of the global
shortlist), and the WindowGroupLimit top-k.

Replication notes: the numpy stages (Lloyd fits, einsum LUT, gathers) use
the SAME numpy expressions as the engine, so they are bit-identical; the
Spark-SQL stages (probe cosine, exact re-rank) evaluate `dot`/`l2norm`
lambdas SEQUENTIALLY over the arrays, so the replica computes those with
left-to-right Python loops (exact IEEE order), and rank boundaries use the
canonical (round-half-up-6 desc, id asc) order.
"""

from __future__ import annotations

import math

import numpy as np

from tests.conftest import SF_SMOKE
from tests.test_brp_replica import _round6, _sqdist  # noqa: F401 (shared helpers)
from tests.test_pq_replica import _load_embeddings, _replica_codebooks, _replica_codes


def _seq_dot(a, b):
    s = 0.0
    for x, y in zip(a, b):
        s += x * y
    return s


def _seq_norm(a):
    s = 0.0
    for x in a:
        s += x * x
    return math.sqrt(s)


def _replica_centroids(ids: np.ndarray, X: np.ndarray):
    """Same numpy ops as _fit_ivf_centroids."""
    from etl_active911_spark.operators.similarity import IVF_N_CELLS

    S = X[ids % 7 == 0][:256]
    S = S / np.linalg.norm(S, axis=1, keepdims=True)
    C = S[:IVF_N_CELLS].copy()
    for _ in range(2):
        assign = (S @ C.T).argmax(axis=1)
        for c in range(IVF_N_CELLS):
            members = S[assign == c]
            if len(members):
                m = members.mean(axis=0)
                C[c] = m / np.linalg.norm(m)
    return C


def test_ivfpq_topk_matches_replica_exactly(spark):
    from etl_active911_spark.operators.similarity import (
        EMB_DIM,
        IVF_NPROBE,
        N_QUERIES,
        PQ_M,
        TOP_K,
        x3_ann_ivf_pq,
    )

    got = {
        (r["query_id"], r["rnk"]): (r["vec_id"], r["cosine"])
        for r in x3_ann_ivf_pq(spark, SF_SMOKE).collect()
    }

    ids, X = _load_embeddings(SF_SMOKE)
    C = _replica_centroids(ids, X)
    books = _replica_codebooks(ids, X)
    codes = _replica_codes(X, books)
    sub = EMB_DIM // PQ_M

    # cell assignment: same numpy formula as _ivf_cells (row-independent,
    # so batch decomposition cannot change it)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    cells = (Xn @ C.T).argmax(axis=1)

    # probe lists: engine ranks RAW cos desc with cell tie-break, computed
    # by sequential SQL lambdas -> sequential Python here
    qsel = ids < N_QUERIES
    q_ids = ids[qsel]
    probes = {}
    for qi, qid in enumerate(q_ids):
        qv = list(X[qsel][qi])
        qn = _seq_norm(qv)
        scored = []
        for c in range(len(C)):
            cv = list(C[c])
            cos = _seq_dot(qv, cv) / (qn * _seq_norm(cv))
            scored.append((c, cos))
        scored.sort(key=lambda p: (-p[1], p[0]))
        probes[int(qid)] = {c for c, _ in scored[:IVF_NPROBE]}

    shortlist = 8 * TOP_K
    norms = np.linalg.norm(X, axis=1)
    want = {}
    for qi, qid in enumerate(q_ids):
        Qn = Xn[qsel][qi]
        lut = np.einsum("ms,mks->mk", Qn.reshape(PQ_M, sub), books)
        mask = np.isin(cells, list(probes[int(qid)])) & (ids != qid)
        cand_ids = ids[mask]
        s = lut[np.arange(PQ_M)[None, :], codes[mask]].sum(axis=1)
        order = np.lexsort((cand_ids, -np.vectorize(_round6)(s)))[:shortlist]
        sl_ids = set(int(v) for v in cand_ids[order])
        # exact re-rank: sequential cosine, canonical order
        rer = []
        qv = list(X[qsel][qi])
        qn = _seq_norm(qv)
        for j, vid in enumerate(ids):
            if int(vid) not in sl_ids:
                continue
            cos = _seq_dot(qv, list(X[j])) / (qn * norms[j])
            rer.append((int(vid), _round6(cos)))
        rer.sort(key=lambda p: (-p[1], p[0]))
        for rnk, (vid, cos) in enumerate(rer[:TOP_K], start=1):
            want[(int(qid), rnk)] = (vid, cos)
    assert got == want
