"""N-13: the vectorized Python UDF surface — scalar pandas_udf, grouped-agg
pandas_udf, and applyInPandas (SNIPPETS.md patterns; Arrow batch transfer).

These exist to prove the Python boundary is Arrow-vectorized end-to-end;
equivalent built-in expressions are preferred in real pipelines (and the
oracle SQL shows each is semantically plain SQL).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from etl_active911_spark.io import read_table
from etl_active911_spark.plans.registry import query


@query(
    "n13_pandas_scalar",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charged
    FROM lineitem
    WHERE l_quantity > 45
    """,
)
def n13_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf: whole-column NumPy arithmetic per Arrow batch."""

    @pandas_udf("double")
    def charged(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return price * (1 - disc) * (1 + tax)

    return (
        read_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(charged("l_extendedprice", "l_discount", "l_tax"), 6).alias("charged"),
        )
    )


@query(
    "n13_pandas_grouped_agg",
    """
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 6)
               AS weighted_avg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def n13_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas_udf: one NumPy reduction per group."""

    @pandas_udf("double")
    def weighted_avg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    return (
        read_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(weighted_avg("l_extendedprice", "l_quantity"), 6).alias(
                "weighted_avg_price"
            )
        )
    )


@query(
    "n13_apply_in_pandas",
    """
    SELECT o_custkey, o_orderkey,
           ROUND(o_totalprice - AVG(o_totalprice) OVER (PARTITION BY o_custkey), 6)
               AS price_dev
    FROM orders
    WHERE o_custkey < 200
    """,
)
def n13_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas: per-group pandas transform (group-wise demeaning) —
    the grouped-map pattern used for per-entity feature engineering."""

    def demean(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[["o_custkey", "o_orderkey"]].copy()
        out["price_dev"] = (pdf["o_totalprice"] - pdf["o_totalprice"].mean()).round(6)
        return out

    return (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 200)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .groupBy("o_custkey")
        .applyInPandas(demean, "o_custkey long, o_orderkey long, price_dev double")
    )


@query(
    "n13_python_udtf",
    """
    WITH c AS (
        SELECT o_orderkey,
               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders WHERE o_custkey < 100
    ),
    i AS (
        SELECT o_orderkey, cents, unnest(range(4)) AS inst FROM c
    )
    SELECT o_orderkey, CAST(inst AS INT) AS installment,
           CAST(CASE WHEN inst < 3 THEN cents // 4
                     ELSE cents - 3 * (cents // 4) END AS BIGINT) AS amount_cents
    FROM i
    """,
)
def n13_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-13 (UDTF surface): a Python user-defined TABLE function applied
    via SQL LATERAL — each order fans out to 4 installment rows whose
    integer-cent amounts sum exactly to the total (half-up cent rounding,
    floor split, remainder on the last installment — all integer math so
    the oracle replicates it bit-for-bit).

    UDTFs complete the Python-function surface (scalar pandas_udf →
    grouped agg → applyInPandas → mapInPandas → UDTF); ``eval`` runs
    per input row, so on a 100 TB hot path prefer mapInPandas — this
    registration exists for API parity and is filtered to a small key
    range accordingly.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="o_orderkey bigint, installment int, amount_cents bigint")
    class Installments:
        def eval(self, o_orderkey: int, o_totalprice: float):
            cents = int(o_totalprice * 100 + 0.5)
            per = cents // 4
            for i in range(4):
                yield o_orderkey, i, per if i < 3 else cents - 3 * per

    spark.udtf.register("installments_udtf", Installments)
    read_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100).select(
        "o_orderkey", "o_totalprice"
    ).createOrReplaceTempView("udtf_orders_in")
    return spark.sql(
        """
        SELECT i.o_orderkey, i.installment, i.amount_cents
        FROM udtf_orders_in o,
             LATERAL installments_udtf(o.o_orderkey, o.o_totalprice) i
        """
    )


@query(
    "n13_map_in_arrow",
    """
    SELECT doc_id,
           CAST(LENGTH(text) AS BIGINT) AS n_chars_arrow,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_fields
    FROM documents
    """,
)
def n13_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-13 (r5, mapInArrow): the LOWEST-overhead Python boundary — raw
    Arrow RecordBatches in and out, no pandas materialization at all
    (``mapInPandas`` converts every batch to pandas and back; for
    columnar-native work like pyarrow.compute kernels that conversion is
    pure overhead). Computes codepoint length and single-space field
    count per document with vectorized Arrow kernels; integer outputs,
    so the SQL oracle matches bit-for-bit. Completes the Python-function
    ladder: scalar pandas_udf → grouped agg → applyInPandas →
    mapInPandas → mapInArrow → UDTF."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def measure(batches):
        for b in batches:
            text = b.column(1)
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(0),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                    pc.cast(
                        pc.list_value_length(pc.split_pattern(text, " ")), pa.int64()
                    ),
                ],
                ["doc_id", "n_chars_arrow", "n_fields"],
            )

    return (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .mapInArrow(measure, "doc_id long, n_chars_arrow long, n_fields long")
    )
