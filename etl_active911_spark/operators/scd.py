"""N-18: slowly-changing-dimension (SCD type 2) build — compress a keyed
event stream into effective-dated dimension rows: one row per state RUN
(consecutive identical states collapse), with [valid_from, valid_to) ranges
and an is_current flag. This is the batch half of every warehouse's
dimension pipeline; the keyed upsert sink (streaming/jobs.py) is the
incremental half.

Gaps-and-islands on one key-partitioned window: mark run starts via LAG,
keep start rows, close each range with LEAD. Two window passes over ONE
shuffle on the key (both windows share the user_id partitioning — Spark
reuses the exchange+sort). No joins, no self-aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_active911_spark.io import read_table
from etl_active911_spark.plans.registry import query


@query(
    "n18_scd2_intervals",
    """
    WITH ordered AS (
        SELECT user_id, ts, event_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_state
        FROM events
    ),
    starts AS (
        SELECT user_id, event_type AS state, ts AS valid_from, event_id
        FROM ordered
        WHERE prev_state IS NULL OR prev_state <> event_type
    )
    SELECT user_id, state, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from, event_id) AS valid_to,
           LEAD(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from, event_id) IS NULL AS is_current
    FROM starts
    """,
)
def n18_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-18: each user's event_type stream → effective-dated state rows.
    Ties at identical timestamps order by event_id in BOTH engines, so run
    boundaries are deterministic."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    starts = (
        ev.withColumn("prev_state", F.lag("event_type").over(wo))
        .filter(
            F.col("prev_state").isNull()
            | (F.col("prev_state") != F.col("event_type"))
        )
        .select(
            "user_id",
            F.col("event_type").alias("state"),
            F.col("ts").alias("valid_from"),
            "event_id",
        )
    )
    wv = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    valid_to = F.lead("valid_from").over(wv)
    return starts.select(
        "user_id",
        "state",
        "valid_from",
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# N-24 (r11): CDC changelog apply (MERGE INTO semantics as a window op)
# ---------------------------------------------------------------------------

#: entities per snapshot — the changelog synthesizes ~ |orders| / 3000
#: change events per entity, giving every entity a multi-event history
CDC_ENTITIES = 3000

_CDC_APPLY_ORACLE = f"""
    WITH changelog AS (
        SELECT o_orderkey % {CDC_ENTITIES} AS entity_id,
               o_orderkey AS seq,
               CASE CAST(o_orderkey % 7 AS INT)
                    WHEN 0 THEN 'D'
                    WHEN 1 THEN 'U' WHEN 2 THEN 'U'
                    ELSE 'I' END AS op,
               ROUND(o_totalprice, 2) AS price,
               o_orderstatus AS status
        FROM orders
    ),
    latest AS (
        SELECT entity_id, seq, op, price, status,
               ROW_NUMBER() OVER (PARTITION BY entity_id ORDER BY seq DESC)
                   AS rn,
               COUNT(*) OVER (PARTITION BY entity_id) AS n_changes
        FROM changelog
    )
    SELECT entity_id,
           CAST(seq AS BIGINT) AS last_seq,
           CAST(n_changes AS BIGINT) AS n_changes,
           price,
           status
    FROM latest
    WHERE rn = 1 AND op <> 'D'
    """


@query("n24_cdc_apply", _CDC_APPLY_ORACLE)
def n24_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-24 (r11): CDC CHANGELOG APPLY — fold an insert/update/delete
    change stream into the current snapshot, the lakehouse MERGE INTO /
    Delta CDF pattern and the batch half of the keyed upsert sink
    (streaming/jobs.py applies the same last-writer-wins contract
    incrementally): per entity, the highest-sequence event wins; a
    terminal delete removes the entity from the snapshot entirely
    (earlier versions notwithstanding). Emits the surviving snapshot
    with per-entity change counts — the audit a CDC consumer reconciles
    against the upstream database.

    The changelog is synthesized from ``orders`` (entity = o_orderkey %
    {CDC_ENTITIES}, seq = o_orderkey — globally unique, so last-wins is
    well-defined; op from o_orderkey % 7 giving ~1/7 terminal-delete
    probability per event and every entity a multi-event history).

    Scale shape: ONE window pass over ONE shuffle keyed by entity_id
    (row_number and the change count share the exchange — plan-checked:
    one hashpartitioning, two Window nodes), then a per-row filter. The
    rank-limit prune (rule 19) deliberately does NOT fire here: the
    change-count aggregate needs every history row, so a pruned rank
    leg would force a SECOND pass over the changelog — one full-row
    pass beats two. No joins. At 100 TB the snapshot write would
    bucket by entity_id — the upsert sink's layout."""
    orders = read_table(spark, sf_dir, "orders")
    log = orders.select(
        (F.col("o_orderkey") % CDC_ENTITIES).alias("entity_id"),
        F.col("o_orderkey").alias("seq"),
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("D"))
        .when(F.col("o_orderkey") % 7 <= 2, F.lit("U"))
        .otherwise(F.lit("I"))
        .alias("op"),
        F.round("o_totalprice", 2).alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    return cdc_fold(log)


def cdc_fold(log: DataFrame) -> DataFrame:
    """Core of ``n24_cdc_apply`` over an arbitrary (entity_id, seq, op,
    value...) changelog — split out so crafted I/U/D/resurrect histories
    pin the fold itself in pytest (not a copy of it)."""
    value_cols = [
        c for c in log.columns if c not in ("entity_id", "seq", "op")
    ]
    w = Window.partitionBy("entity_id")
    latest = log.select(
        "entity_id",
        "seq",
        "op",
        *value_cols,
        F.row_number().over(w.orderBy(F.col("seq").desc())).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n_changes"),
    )
    return latest.filter((F.col("rn") == 1) & (F.col("op") != "D")).select(
        "entity_id",
        F.col("seq").cast("bigint").alias("last_seq"),
        F.col("n_changes").cast("bigint").alias("n_changes"),
        *value_cols,
    )
