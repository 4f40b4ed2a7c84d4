"""Exact-replica check for the BucketedRandomProjectionLSH ANN path
(VERDICT r06 item 6 — promote x3_ann_brp beyond its rows-only driver check;
the PQ bit-level replica in test_pq_replica.py is the template).

``x3_ann_brp`` is rows-only for the driver because the seeded projection
matrix is JVM-random (not SQL-replicable). This suite is its hard
correctness evidence: take MLlib's per-vector bucket assignments (the one
piece that depends on the JVM RNG — its seed-determinism is pinned in
test_extensions.py), then INDEPENDENTLY re-derive everything our code is
responsible for, in single-process Python:

- candidate generation: set logic over (table, bucket) collisions,
  replacing approxSimilarityJoin's explode + equi-join;
- scoring: Normalizer → euclidean distance → cosine = 1 − d²/2, with
  IEEE operation order replicated sequentially (CLAUDE.md rule 11);
- ROUND half-away-from-zero via exact decimal quantize (Spark's Round on
  double goes through BigDecimal.valueOf == Python Decimal(repr(x)));
- per-query top-k with the canonical (round6 desc, vec_id asc) order.

Exact equality on every output cell — no recall slack.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq

from tests.conftest import SF_SMOKE


def _round6(x: float) -> float:
    """Spark ROUND(double, 6): BigDecimal.valueOf (Double.toString — the
    shortest round-trip decimal, same as Python repr) quantized HALF_UP
    (= half away from zero, matching Java)."""
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def _norm2(v: list[float]) -> float:
    s = 0.0
    for x in v:
        s += x * x
    return math.sqrt(s)


def _sqdist(a: list[float], b: list[float]) -> float:
    """MLlib Vectors.sqdist: sequential left-to-right accumulation."""
    s = 0.0
    for x, y in zip(a, b):
        d = x - y
        s += d * d
    return s


def test_brp_topk_matches_replica_exactly(spark):
    from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    from etl_active911_spark.io import read_table, spread
    from etl_active911_spark.operators.similarity import N_QUERIES, TOP_K, x3_ann_brp

    got = {
        (r["query_id"], r["rnk"]): (r["vec_id"], r["cosine"])
        for r in x3_ann_brp(spark, SF_SMOKE).collect()
    }

    # --- the ONLY JVM-trusted input: per-vector bucket ids from the same
    # seeded model the query fits (seed-determinism separately pinned)
    emb = spread(read_table(spark, SF_SMOKE, "embeddings")).select(
        "vec_id",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("raw"),
    )
    data = (
        Normalizer(inputCol="raw", outputCol="features", p=2.0)
        .transform(emb)
        .select("vec_id", "features")
    )
    model = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=0.5,
        numHashTables=6, seed=42,
    ).fit(data)
    buckets = {
        r["vec_id"]: tuple(float(h[0]) for h in r["hashes"])
        for r in model.transform(data).select("vec_id", "hashes").collect()
    }

    # --- everything below is replica-owned: candidates, scores, top-k
    t = pq.read_table(f"{SF_SMOKE}/embeddings.parquet", columns=["vec_id", "embedding"])
    raw = {
        int(i): [float(x) for x in v]
        for i, v in zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist())
    }
    normed = {}
    for i, v in raw.items():
        n = _norm2(v)
        normed[i] = [x / n for x in v]

    all_ids = sorted(raw)
    assert set(buckets) == set(all_ids)
    want = {}
    for qid in [i for i in all_ids if i < N_QUERIES]:
        qb = buckets[qid]
        cands = [
            x for x in all_ids
            if x != qid and any(qb[i] == buckets[x][i] for i in range(len(qb)))
        ]
        scored = []
        for x in cands:
            d = math.sqrt(_sqdist(normed[qid], normed[x]))
            scored.append((x, _round6(1.0 - (d * d) / 2.0)))
        scored.sort(key=lambda p: (-p[1], p[0]))
        for rnk, (x, c) in enumerate(scored[:TOP_K], start=1):
            want[(qid, rnk)] = (x, c)

    assert got == want
