"""Similarity search over embeddings (X-3): brute-force cosine top-k as the
exact baseline, and a bucketed LSH variant as the 100 TB scale path.

Embeddings stay as array columns end-to-end; dot products run JVM-side via
higher-order functions for the exact path, and as Arrow-batched NumPy
matmuls (pandas_udf) for the bucketed path — never per-row Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_active911_spark.io import read_table, spread
from etl_active911_spark.plans.registry import query

TOP_K = 5
N_QUERIES = 20  # queries = vec_id < 20


def dot(a: Column, b: Column) -> Column:
    """Double-precision dot product of two array columns (JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


@query(
    "x3_cosine_topk",
    f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
        FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    scored AS (
        SELECT q.query_id, e.vec_id,
               list_dot_product(q.qe, e.embedding::DOUBLE[])
                 / (sqrt(list_dot_product(q.qe, q.qe))
                    * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) AS cos
        FROM q, embeddings e
        WHERE e.vec_id != q.query_id
    ),
    ranked AS (
        SELECT query_id, vec_id, cos,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY ROUND(cos, 6) DESC, vec_id) AS rnk
        FROM scored
    )
    SELECT query_id, vec_id, ROUND(cos, 6) AS cosine, rnk
    FROM ranked WHERE rnk <= {TOP_K}
    """,
)
def x3_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-3 exact baseline: brute-force cosine top-k for a query subset.

    The query side is tiny → explicitly broadcast; the corpus scan streams
    once. Ranking keys on (round(cos,6), vec_id) so result selection is
    deterministic across engines despite last-ulp float differences.
    At 100 TB the same plan holds per query-block: broadcast the queries,
    one corpus pass, per-partition heap via the row_number window.
    """
    emb = spread(read_table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    scored = (
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", dot(F.col("qe"), F.col("embedding")) / (l2norm(F.col("qe")) * l2norm(F.col("embedding"))))
    )
    w = Window.partitionBy("query_id").orderBy(F.round("cos", 6).desc(), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "vec_id", F.round("cos", 6).alias("cosine"), "rnk")
    )


@query("x3_ann_lsh")  # approximate — rows-only; recall vs brute force in pytest
def x3_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-3 scale path: random-hyperplane LSH bucketing.

    Signature bit p = sign(Σ_d emb[d] · h(p,d)) with h a deterministic
    ±1 hash of (plane, dim) — no stored projection matrix, so executors
    need no broadcast state. Candidates = bucket collisions on any of the
    signature bands; exact cosine re-ranks candidates only. At 100 TB the
    shuffle key is (band, 16-bit bucket): ~constant bytes per vector.
    """
    emb = spread(read_table(spark, sf_dir, "embeddings"))

    # 8 bands × 4 planes: tuned for weak-similarity corpora (the fixture
    # embeddings are near-random; top-5 neighbors sit at cos≈0.3, where a
    # 4-plane band collides with p≈0.13 → 8 bands give ~0.68 recall while
    # pruning roughly half the corpus per query). On clustered production
    # embeddings the same banding prunes far harder.
    #
    # Plane projections via posexplode + one codegen hash-aggregate with 32
    # SUM expressions (hyperplane p, dim d → ±1 from xxhash64(p, d)); a
    # higher-order-lambda formulation would be interpreted AND re-inlined
    # into the join predicate below — measured minutes vs seconds. The
    # aggregate is also a pipeline breaker, so band values are computed
    # exactly once.
    n_planes, n_bands, planes_per_band = 32, 8, 4
    dims = emb.select("vec_id", F.posexplode("embedding").alias("d", "v"))
    pm = lambda p: F.when(  # noqa: E731 — ±1 pseudo-random plane component
        F.xxhash64(F.lit(p), F.col("d")).bitwiseAND(F.lit(1)) == 1, F.col("v").cast("double")
    ).otherwise(-F.col("v").cast("double"))
    projs = dims.groupBy("vec_id").agg(
        *[F.sum(pm(p)).alias(f"s{p}") for p in range(n_planes)]
    )
    band_cols = [
        F.concat_ws(
            "",
            *[
                F.when(F.col(f"s{band * planes_per_band + j}") > 0, "1").otherwise("0")
                for j in range(planes_per_band)
            ],
        ).alias(f"band{band}")
        for band in range(n_bands)
    ]
    sig = projs.select("vec_id", *band_cols).join(
        emb.select("vec_id", "embedding"), "vec_id"
    )
    q = sig.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        *[F.col(f"band{band}").alias(f"qband{band}") for band in range(n_bands)],
    )
    any_band = None
    for band in range(n_bands):
        clause = F.col(f"band{band}") == F.col(f"qband{band}")
        any_band = clause if any_band is None else (any_band | clause)
    cands = (
        sig.join(
            F.broadcast(q),
            any_band & (F.col("vec_id") != F.col("query_id")),
        )
        .withColumn(
            "cosine",
            dot(F.col("qe"), F.col("embedding"))
            / (l2norm(F.col("qe")) * l2norm(F.col("embedding"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        cands.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rnk")
    )


@query(
    "x2_embedding_neardup",
    """
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                 / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6)
               AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
          / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
             * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) >= 0.45
    """,
)
def x2_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-2 (embedding-cosine near-dup): all pairs with cosine ≥ 0.45,
    computed as an Arrow-batched NumPy matmul of each corpus batch against
    the (small) corpus matrix. Exact — serves as the oracle-checked ground
    truth the LSH-bucketed path trades against. At 100 TB the same batch
    matmul runs per LSH bucket instead of against the full corpus
    (x3_ann_lsh's banding), keeping the pair space bounded.
    """
    import numpy as np
    import pandas as pd

    emb = spread(read_table(spark, sf_dir, "embeddings"))
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)

    def pairs(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            bm = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            bids = pdf["vec_id"].to_numpy()
            sims = (bm @ mat.T) / (np.linalg.norm(bm, axis=1)[:, None] * norms[None, :])
            bi, cj = np.where(sims >= 0.45)
            keep = bids[bi] < ids[cj]
            yield pd.DataFrame(
                {
                    "vec_a": bids[bi][keep],
                    "vec_b": ids[cj][keep],
                    "cosine": np.round(sims[bi, cj][keep], 6),
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        pairs, "vec_a long, vec_b long, cosine double"
    )


@query("x3_ann_ivf")  # approximate — rows-only; recall vs brute force in pytest
def x3_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-3 scale path #2: IVF (inverted-file) ANN.

    Coarse quantizer: K centroids from a deterministic strided sample,
    refined with two Lloyd iterations driver-side (the sample is tiny —
    centroids are the only thing ever collected). Vectors are assigned to
    their nearest centroid cell via an Arrow-batched matmul; each query
    probes its ``nprobe`` nearest cells and reranks exactly within them.
    At 100 TB the cell id becomes the storage partition key, so a probe
    reads only matching partitions (partition pruning on cell).
    """
    import numpy as np
    import pandas as pd

    n_cells, nprobe = 16, 4
    emb = spread(read_table(spark, sf_dir, "embeddings"))

    sample = (
        emb.filter(F.col("vec_id") % 7 == 0).limit(256).select("vec_id", "embedding").collect()
    )
    S = np.array([r["embedding"] for r in sample], dtype=np.float64)
    S = S / np.linalg.norm(S, axis=1, keepdims=True)
    C = S[:n_cells].copy()
    for _ in range(2):  # Lloyd refinement on the sample
        assign = (S @ C.T).argmax(axis=1)
        for c in range(n_cells):
            members = S[assign == c]
            if len(members):
                m = members.mean(axis=0)
                C[c] = m / np.linalg.norm(m)

    def assign_cells(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            M = M / np.linalg.norm(M, axis=1, keepdims=True)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "cell": (M @ C.T).argmax(axis=1).astype("int32")}
            )

    cells = emb.select("vec_id", "embedding").mapInPandas(assign_cells, "vec_id long, cell int")
    data = emb.select("vec_id", "embedding").join(cells, "vec_id")

    # queries probe their nprobe nearest cells (tiny driver-side table)
    qrows = emb.filter(F.col("vec_id") < N_QUERIES).select("vec_id", "embedding").collect()
    probes = []
    for r in qrows:
        v = np.array(r["embedding"], dtype=np.float64)
        v = v / np.linalg.norm(v)
        for c in np.argsort(-(C @ v))[:nprobe]:
            probes.append((r["vec_id"], int(c)))
    probe_df = spark.createDataFrame(probes, "query_id long, cell int")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )

    cands = (
        data.join(F.broadcast(probe_df), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(q), "query_id")
        .withColumn(
            "cosine",
            dot(F.col("qe"), F.col("embedding"))
            / (l2norm(F.col("qe")) * l2norm(F.col("embedding"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        cands.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rnk")
    )


@query("x3_pandas_matmul")  # Arrow/NumPy path — rows-only (UDF surface, N-13)
def x3_pandas_matmul(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-3/N-13: the vectorized-Python variant — mapInPandas computes a
    NumPy matmul of each Arrow batch against the broadcast query block.
    This is the shape that wins when k·dim is large (BLAS beats per-row
    SQL expressions); demonstrates the Arrow batch boundary done right.
    """
    import numpy as np
    import pandas as pd

    emb = spread(read_table(spark, sf_dir, "embeddings"))
    qrows = emb.filter(F.col("vec_id") < N_QUERIES).select("vec_id", "embedding").collect()
    # Tiny query block only (N_QUERIES×dim floats) — broadcast via closure;
    # corpus embeddings are never collected.
    q_ids = np.array([r["vec_id"] for r in qrows])
    q_mat = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1)

    def score_batches(batches):
        for pdf in batches:
            mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            if len(mat) == 0:
                continue
            sims = (mat @ q_mat.T) / (
                np.linalg.norm(mat, axis=1)[:, None] * q_norm[None, :]
            )
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids, n),
                    "vec_id": np.tile(pdf["vec_id"].to_numpy(), len(q_ids)),
                    "cosine": sims.T.reshape(-1),
                }
            )

    scored = emb.select("vec_id", "embedding").mapInPandas(
        score_batches, "query_id long, vec_id long, cosine double"
    ).filter(F.col("vec_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.round("cosine", 6).desc(), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rnk")
    )
