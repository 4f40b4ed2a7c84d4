"""Bit-level replica for x3_pca_project (rows-only query, house standard:
the same evidence substitute as test_pq_replica / test_ivfpq_replica).

An independent single-process implementation — DuckDB does the 3dp
quantization (engine-exact ROUND semantics), NumPy does Gram →
covariance → eigh → projection with the same fixed op order — must
reproduce every projected coordinate of the distributed result EXACTLY,
and the distributed Gram must equal the single-process integer Gram
cell-for-cell.
"""

from __future__ import annotations

import duckdb
import numpy as np

from tests.conftest import SF_ORACLE


def _replica(sf_dir: str):
    from etl_active911_spark.operators.similarity import (
        EMB_DIM,
        GRAM_SCALE,
        PCA_TOP_K,
        _pca_components,
    )

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT vec_id,
               embedding::DOUBLE[] AS e,
               list_transform(embedding::DOUBLE[],
                              x -> CAST(ROUND(x * {GRAM_SCALE}) AS BIGINT)) AS qe
        FROM read_parquet('{sf_dir}/embeddings.parquet')
        ORDER BY vec_id
        """
    ).fetchall()
    ids = [r[0] for r in rows]
    E = np.array([r[1] for r in rows], dtype=np.float64)
    Q = np.array([r[2] for r in rows], dtype=np.int64)
    G = Q.T @ Q
    s = Q.sum(axis=0)
    n = len(rows)
    iu, ju = np.triu_indices(EMB_DIM)
    gram_rows = [
        {
            "i": int(i) + 1,
            "j": int(j) + 1,
            "sum_prod": int(G[i, j]),
            "sum_i": int(s[i]),
            "sum_j": int(s[j]),
            "n": n,
        }
        for i, j in zip(iu, ju)
    ]
    mu, W, vals, share = _pca_components(gram_rows)
    Y = np.round((E - mu) @ W, 6)
    return ids, gram_rows, Y, vals, share


def test_gram_matches_single_process(spark):
    from etl_active911_spark.plans.registry import QUERIES, load_all

    load_all()
    _ids, gram_rows, _Y, _v, _s = _replica(SF_ORACLE)
    want = {
        (g["i"], g["j"]): (g["sum_prod"], g["sum_i"], g["sum_j"], g["n"])
        for g in gram_rows
    }
    got = {
        (r["i"], r["j"]): (r["sum_prod"], r["sum_i"], r["sum_j"], r["n"])
        for r in QUERIES["x3_embedding_gram"](spark, SF_ORACLE).collect()
    }
    assert got == want


def test_projection_matches_replica_exactly(spark):
    from etl_active911_spark.operators.similarity import PCA_TOP_K
    from etl_active911_spark.plans.registry import QUERIES, load_all

    load_all()
    ids, _gram, Y, vals, share = _replica(SF_ORACLE)
    want = {
        vid: tuple(Y[k]) for k, vid in enumerate(ids)
    }
    got = {
        r["vec_id"]: tuple(r[f"pc{k + 1}"] for k in range(PCA_TOP_K))
        for r in QUERIES["x3_pca_project"](spark, SF_ORACLE).collect()
    }
    assert got == want  # exact, not approximate
    # sanity on the decomposition itself
    assert all(vals[k] >= vals[k + 1] for k in range(len(vals) - 1))
    assert 0.0 < share <= 1.0


def test_projection_decorrelates(spark):
    """The whole point of the rotation: projected coordinates are
    (near-)uncorrelated and variance-ordered."""
    ids, _gram, Y, _vals, _share = _replica(SF_ORACLE)
    C = np.cov(Y.T)
    off = C - np.diag(np.diag(C))
    # tolerance prices the 3dp Gram quantization + the 6dp projection
    # rounding (measured off/diag ratio ≈ 1.2e-4 on the fixture)
    assert np.max(np.abs(off)) < 1e-3 * np.max(np.diag(C))
    d = np.diag(C)
    assert all(d[k] >= d[k + 1] - 1e-9 for k in range(len(d) - 1))
