"""X-8 mixture-planning ops that compose the quality gate (r13).

Separate module (not ``sampling.py``) because ``textual`` imports
``sampling`` at module load, so a decoration-time oracle here that nests
``textual.quality_ctes`` would be a circular import from inside
``sampling`` — this module is imported only by the registry, after
``textual`` is fully loaded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_active911_spark.io import read_table
from etl_active911_spark.plans.registry import query

# ---------------------------------------------------------------------------
# X-8 (r13): DoReMi-style domain reweighting step
# ---------------------------------------------------------------------------

#: one mirror-descent update at η = 1 with 10% uniform smoothing —
#: the published DoReMi constants family (Xie et al., NeurIPS 2023)
DOREMI_SMOOTH_NUM, DOREMI_SMOOTH_DEN = 1, 10

#: the u_s expression — IDENTICAL text in Spark and DuckDB (every float
#: op CAST AS DOUBLE so neither engine routes through DECIMAL
#: arithmetic, rule 24; left-assoc structure matches operand-for-operand
#: so the only cross-engine delta is exp()'s last ulp, absorbed by the
#: 1e-9 quantization)
_DOREMI_U_EXPR = (
    "FLOOR((CAST(w0_micro AS DOUBLE) / 1000000)"
    " * exp(CAST(lambda_micro AS DOUBLE) / 1000000"
    "       - CAST(swl AS DOUBLE) / 1000000000000)"
    " * 1000000000 + CAST(0.5 AS DOUBLE))"
)


def _doremi_oracle() -> str:
    from etl_active911_spark.operators.textual import quality_ctes

    return f"""
    WITH {quality_ctes()},
    per AS MATERIALIZED (
        -- embeds the full quality pipeline and is referenced by tot AND
        -- pm: MATERIALIZED so DuckDB cannot re-inline the two-explode
        -- Gopher chain per reference (rule 27; caught in r13 review)
        SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN q.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS kept
        FROM documents d LEFT JOIN quality q ON q.doc_id = d.doc_id
        GROUP BY 1
    ),
    tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(COUNT(*) AS BIGINT) AS kk
        FROM per
    ),
    pm AS MATERIALIZED (
        SELECT source, n,
               (2 * (n - kept) * 1000000 + n) // (2 * n) AS lambda_micro,
               (2 * n * 1000000 + tot.nn) // (2 * tot.nn) AS w0_micro,
               tot.kk AS kk
        FROM per, tot
    ),
    gl AS (SELECT CAST(SUM(w0_micro * lambda_micro) AS BIGINT) AS swl FROM pm),
    un AS MATERIALIZED (
        SELECT source, n, lambda_micro, w0_micro, kk,
               CAST({_DOREMI_U_EXPR} AS BIGINT) AS u_nano
        FROM pm, gl
    ),
    z AS (SELECT CAST(SUM(u_nano) AS BIGINT) AS zz FROM un),
    w1 AS (
        SELECT source, n, lambda_micro, w0_micro, kk,
               (2 * u_nano * 1000000 + z.zz) // (2 * z.zz) AS w1_micro
        FROM un, z
    )
    SELECT source, n AS n_docs,
           CAST(lambda_micro AS BIGINT) AS lambda_micro,
           CAST(w0_micro AS BIGINT) AS w0_micro,
           CAST(w1_micro AS BIGINT) AS w1_micro,
           CAST((2 * 9 * w1_micro + 10) // 20
                + (2 * 100000 + kk) // (2 * kk) AS BIGINT) AS w_micro
    FROM w1
    """


@query("x8_doremi_step", _doremi_oracle())
def x8_doremi_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-8 (r13): one DOREMI-STYLE DOMAIN-REWEIGHTING STEP (Xie et al.,
    NeurIPS 2023 — public): the mixture planner's principled upgrade
    over temperature scaling (``x8_mixture_weights``/
    ``x8_temperature_sweep``): start from the proportional reference
    mixture w0_s = n_s/N, measure a per-domain excess-loss proxy λ_s
    (here the Gopher-gate FAILURE rate per source — the deterministic
    stand-in for the proxy-model excess loss; a real run plugs per-domain
    loss deltas into the same column), and apply one mirror-descent
    update u_s = w0_s · exp(η·(λ_s − λ̄)) at η = 1 with the baseline
    λ̄ = Σ w0·λ, then normalize and mix with 10% uniform smoothing:
    w_s = 0.9·w1_s + 0.1/K. Domains whose documents fail the quality
    gate more than the mixture average are UP-weighted for the next
    proxy round — the DoReMi loop's single step as a query.

    Determinism: λ, w0, w1, w are integer HALF-UP micro-units (rule
    26b); the ONLY float crossing the engines is the u_s expression —
    module-level ``_DOREMI_U_EXPR``, byte-identical SQL text in both,
    all operands CAST AS DOUBLE (rule 24), quantized to 1e-9
    immediately (rule 11 floor(x+0.5) half-up); λ̄ enters it as the
    EXACT integer Σ w0_micro·λ_micro (no float partial-sum order
    anywhere, rule 26a). Smoothing is pure integer arithmetic.

    Scale shape: one source-keyed hash aggregate over the memoized
    gopher table join (rule 25), then |sources|-row (≤20) folds with
    1-row broadcast totals — no corpus joins, no windows, no RNG."""
    from etl_active911_spark.operators.textual import shared_gopher_rules

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    quality = shared_gopher_rules(spark, sf_dir).select(
        "doc_id", F.col("keep").cast("int").alias("fq")
    )
    per = (
        docs.join(quality, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.coalesce("fq", F.lit(0))).cast("bigint").alias("kept"),
        )
    )
    tot = per.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.count(F.lit(1)).cast("bigint").alias("kk"),
    )
    pm = per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n",
        F.expr("(2 * (n - kept) * 1000000 + n) div (2 * n)").alias("lambda_micro"),
        F.expr("(2 * n * 1000000 + nn) div (2 * nn)").alias("w0_micro"),
        "kk",
    )
    gl = pm.agg(F.sum(F.col("w0_micro") * F.col("lambda_micro")).cast("bigint").alias("swl"))
    un = pm.crossJoin(F.broadcast(gl)).select(
        "source",
        "n",
        "lambda_micro",
        "w0_micro",
        "kk",
        F.expr(_DOREMI_U_EXPR).cast("bigint").alias("u_nano"),
    )
    z = un.agg(F.sum("u_nano").cast("bigint").alias("zz"))
    w1 = un.crossJoin(F.broadcast(z)).select(
        "source",
        "n",
        "lambda_micro",
        "w0_micro",
        "kk",
        F.expr("(2 * u_nano * 1000000 + zz) div (2 * zz)").alias("w1_micro"),
    )
    return w1.select(
        "source",
        F.col("n").alias("n_docs"),
        F.col("lambda_micro").cast("bigint").alias("lambda_micro"),
        F.col("w0_micro").cast("bigint").alias("w0_micro"),
        F.col("w1_micro").cast("bigint").alias("w1_micro"),
        F.expr(
            "CAST((2 * 9 * w1_micro + 10) div 20"
            " + (2 * 100000 + kk) div (2 * kk) AS BIGINT)"
        ).alias("w_micro"),
    )
