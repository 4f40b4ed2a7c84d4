"""IVF compaction executed (VERDICT r10 item 5).

``ivf_compact_index`` physically rewrites cells past the tombstone
pressure threshold in the partitioned layout. These tests pin the three
contracts the verdict named:

1. CONSERVATION — the set of live vectors is identical before and after
   compaction (nothing lost, nothing resurrected).
2. SELECTIVE REWRITE — flagged cells contain no tombstoned rows
   afterwards; unflagged cell directories keep their original files
   (tombstones below pressure stay, LSM-style).
3. PROBE EQUIVALENCE — the serving path (probe + tombstone anti-join)
   returns identical top-k results over the compacted index.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tests.conftest import SF_ORACLE

K = 5
N_QUERIES = 20


def _dead(col):
    from etl_active911_spark.operators.similarity import (
        IVF_DELETE_MOD,
        IVF_DELETE_REM,
    )

    return col % IVF_DELETE_MOD == IVF_DELETE_REM


def _serve_topk(spark, physical, tombstones):
    """The serving computation: anti-join tombstones, exact cosine top-k
    per query — deterministic (6dp round, vec_id tie-break). Queries come
    from the SOURCE table, not the index: a compacted index must serve
    the same external query set, including queries whose own vector was
    tombstoned out of the layout."""
    from etl_active911_spark.io import read_table
    from etl_active911_spark.operators.similarity import dot, l2norm

    live = physical.join(tombstones, "vec_id", "left_anti")
    q = (
        read_table(spark, SF_ORACLE, "embeddings")
        .filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"))
    )
    scored = live.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        "vec_id",
        F.round(
            dot(F.col("qe"), F.col("embedding"))
            / (l2norm(F.col("qe")) * l2norm(F.col("embedding"))),
            6,
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= K)
        .select("query_id", "vec_id", "cos")
    )


@pytest.fixture(scope="module")
def compacted_index(spark, tmp_path_factory):
    """Build the partitioned layout once, snapshot pre-compaction state,
    compact, and hand everything to the three contract tests."""
    from etl_active911_spark.io import read_table, spread
    from etl_active911_spark.operators.similarity import (
        argmax_cells,
        ivf_compact_index,
        seed_centroid_table,
    )

    path = str(tmp_path_factory.mktemp("ivf") / "index")
    emb = spread(read_table(spark, SF_ORACLE, "embeddings"))
    assigned = argmax_cells(emb.select("vec_id", "embedding"), seed_centroid_table(emb))
    data = emb.select("vec_id", "embedding").join(
        assigned.select("vec_id", "cell"), "vec_id"
    )
    data.write.partitionBy("cell").mode("overwrite").parquet(path)

    tombstones = emb.filter(_dead(F.col("vec_id"))).select("vec_id")

    pre = spark.read.parquet(path)
    pre_rows = {(r["vec_id"], r["cell"]) for r in pre.select("vec_id", "cell").collect()}
    pre_topk = sorted(map(tuple, _serve_topk(spark, pre, tombstones).collect()))
    pre_files = {
        d: sorted(os.listdir(os.path.join(path, d)))
        for d in os.listdir(path)
        if d.startswith("cell=")
    }

    flagged = ivf_compact_index(spark, path, tombstones)
    return {
        "path": path,
        "tombstones": tombstones,
        "pre_rows": pre_rows,
        "pre_topk": pre_topk,
        "pre_files": pre_files,
        "flagged": flagged,
    }


def test_compaction_engages(compacted_index):
    assert compacted_index["flagged"], "fixture must flag at least one cell"


def test_live_vector_conservation(spark, compacted_index):
    """Live vectors before == after; flagged cells physically clean;
    unflagged cells keep their tombstones (LSM semantics)."""
    post = spark.read.parquet(compacted_index["path"])
    post_rows = {
        (r["vec_id"], r["cell"]) for r in post.select("vec_id", "cell").collect()
    }
    flagged = set(compacted_index["flagged"])
    live_pre = {
        (v, c) for v, c in compacted_index["pre_rows"] if not _dead(v)
    }
    dead_unflagged_pre = {
        (v, c)
        for v, c in compacted_index["pre_rows"]
        if _dead(v) and c not in flagged
    }
    # exact physical inventory: every live row survives, tombstones
    # survive iff their cell was below pressure
    assert post_rows == live_pre | dead_unflagged_pre
    assert not any(_dead(v) for v, c in post_rows if c in flagged)


def test_unflagged_cell_files_untouched(compacted_index):
    """Dynamic partition overwrite must not rewrite below-pressure cells:
    their directories keep the identical file names."""
    path = compacted_index["path"]
    flagged = {f"cell={c}" for c in compacted_index["flagged"]}
    for d, files in compacted_index["pre_files"].items():
        if d in flagged:
            continue
        assert sorted(os.listdir(os.path.join(path, d))) == files, d


def test_all_dead_cell_excluded_and_oracle_mirrors_it(spark, tmp_path):
    """ADVICE r11 item 1: a cell whose rows are ALL tombstoned cannot be
    cleared by dynamic partition overwrite (there is nothing to write),
    so ``ivf_compact_index`` leaves it in place and excludes it from the
    returned list — and the oracle must encode the SAME rule
    (``AND n_live > 0``) or a fully-dead cell would silently break
    Spark-vs-oracle parity if the delete rate ever rises."""
    from etl_active911_spark.operators.similarity import (
        _IVF_COMPACT_ORACLE,
        ivf_compact_index,
    )

    path = str(tmp_path / "index")
    rows = [
        # cell 0: 4 rows, all dead -> past threshold but zero live
        *[(i, [1.0, 0.0], 0) for i in range(4)],
        # cell 1: 4 rows, 3 dead 1 live -> flagged and compactable
        *[(i, [0.0, 1.0], 1) for i in range(10, 14)],
        # cell 2: 4 rows, 0 dead -> below threshold, untouched
        *[(i, [0.5, 0.5], 2) for i in range(20, 24)],
    ]
    df = spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<DOUBLE>, cell INT")
    df.write.partitionBy("cell").mode("overwrite").parquet(path)
    tombstones = spark.createDataFrame(
        [(i,) for i in (0, 1, 2, 3, 10, 11, 12)], "vec_id INT"
    )

    flagged = ivf_compact_index(spark, path, tombstones)
    assert flagged == [1], flagged  # all-dead cell 0 excluded

    post = {
        (r["vec_id"], r["cell"])
        for r in spark.read.parquet(path).select("vec_id", "cell").collect()
    }
    # cell 0 left fully in place; cell 1 reduced to its one live row;
    # cell 2 untouched
    assert post == (
        {(i, 0) for i in range(4)} | {(13, 1)} | {(i, 2) for i in range(20, 24)}
    )

    # the oracle mirrors the zero-live exclusion in every CASE arm
    assert _IVF_COMPACT_ORACLE.count("AND n_live > 0") == 3


def test_probe_equivalence_after_compaction(spark, compacted_index):
    """The serving path (probe + tombstone anti-join) is bit-identical
    over the compacted layout."""
    post = spark.read.parquet(compacted_index["path"])
    post_topk = sorted(
        map(tuple, _serve_topk(spark, post, compacted_index["tombstones"]).collect())
    )
    assert post_topk == compacted_index["pre_topk"]
    assert len(post_topk) == N_QUERIES * K
