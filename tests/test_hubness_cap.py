"""x3_knn_hubness enforced FLOPs bound (VERDICT r10 item 2).

The exact-kNN hubness audit must never run O(n²) over an unbounded
corpus: the corpus is deterministically hash-thinned to ~HUBNESS_SAMPLE_CAP
vectors with an adaptive modulus t = ceil(n/cap) BEFORE the GEMM, mirrored
exactly in the DuckDB oracle. At the default cap the cut is a calibrated
no-op at fixture scale (t = 1), so these tests pin the ENGAGED branch with
a small cap — the same evidence standard as the r10 LSH_TRUTH_DF_CAP
ruling (tests/test_lsh_recall_cap.py).
"""

from __future__ import annotations

import hashlib

from tests.conftest import SF_ORACLE
from tests.parity import compare, fetch_df

SMALL_CAP = 64  # 500 fixture vectors -> t = ceil(500/64) = 8, cut engages


def _py_hash60(s: str) -> int:
    """Python replica of token_hash60 / sql_hash60 (CLAUDE.md rule 10)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _factory(spark):
    from etl_active911_spark.io import read_table, spread

    return lambda: spread(read_table(spark, SF_ORACLE, "embeddings")).select(
        "vec_id", "embedding"
    )


def test_engaged_cut_full_parity(spark, duck):
    """With the cut ENGAGED (t=8 on the 500-row fixture), Spark and the
    cap-parameterized oracle still agree cell-for-cell — the thinned
    subsample is identical across engines."""
    from etl_active911_spark.operators.similarity import hubness_oracle, knn_hubness

    got = knn_hubness(spark, _factory(spark), cap=SMALL_CAP)
    want = fetch_df(duck, hubness_oracle(SMALL_CAP))
    assert compare(got, want) == []


def test_cut_engages_and_keeps_the_hash_selected_subsample(spark, duck):
    """The engaged cut keeps exactly the deterministic hash-selected ids:
    n_vectors == |{id : hash60(id) % 8 == 0}|, strictly below the corpus."""
    from etl_active911_spark.operators.similarity import knn_hubness

    ids = [r[0] for r in duck.execute("SELECT vec_id FROM embeddings").fetchall()]
    t = -(-len(ids) // SMALL_CAP)  # ceil
    assert t == 8
    expected = sum(1 for i in ids if _py_hash60(str(i)) % t == 0)
    assert 0 < expected < len(ids)

    row = knn_hubness(spark, _factory(spark), cap=SMALL_CAP).collect()[0]
    assert row["n_vectors"] == expected


def test_default_cap_is_noop_at_fixture_scale(spark):
    """At HUBNESS_SAMPLE_CAP the fixture corpus passes through whole
    (t = 1), so the registered oracle's hash stays exact."""
    from etl_active911_spark.operators.similarity import (
        HUBNESS_SAMPLE_CAP,
        knn_hubness,
    )

    n = _factory(spark)().count()
    assert n <= HUBNESS_SAMPLE_CAP
    row = knn_hubness(spark, _factory(spark)).collect()[0]
    assert row["n_vectors"] == n
