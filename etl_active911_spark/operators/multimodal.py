"""Multimodal column handling (X-5): images/audio/video as opaque binary
columns with typed metadata.

Blobs are modeled as ``struct<uri,mime,bytes,meta>`` with *lazy* bytes: at
100 TB you store the URI and fetch bytes inside the Arrow batch only when a
stage needs them — the engine never ``collect()``s blob columns, and decode
work rides ``mapInPandas`` so one Python worker handles a whole Arrow batch.

The actual codec step (image decode / resample) is STUBBED with a
deterministic fake — media libraries are not available in this runtime —
but the Spark-side plumbing (schema, batch iteration, partitioning, typed
output) is real and tested. Swap ``_fake_decode`` for a PIL/librosa call
and nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_active911_spark.io import read_table, spread
from etl_active911_spark.plans.registry import query

MEDIA_SCHEMA = (
    "doc_id long, uri string, mime string, bytes binary, meta map<string,string>"
)

# Shared oracle scaffolding: the stub codec derives everything from the
# payload's sha256 DIGEST, so DuckDB can replicate it exactly by parsing
# digest bytes out of the hex string (2 hex chars = 1 byte) — the stub is
# deliberately specified in SQL-replicable terms so the whole mapInPandas
# path gets a hard oracle, not a rows-only check.
_MEDIA_CTE = """
    m AS (
        SELECT doc_id,
               's3://media-bucket/' || source || '/' || CAST(doc_id AS STRING) AS uri,
               CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image/png'
                    WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime,
               text,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               sha256(text) AS sha
        FROM documents
    )
"""


def _hexbyte(col: str, byte_idx: int) -> str:
    """SQL for digest byte ``byte_idx`` (0-based) of a lowercase hex column."""
    hv = lambda pos: f"(strpos('0123456789abcdef', substr({col}, {pos}, 1)) - 1)"  # noqa: E731
    return f"(16 * {hv(2 * byte_idx + 1)} + {hv(2 * byte_idx + 2)})"


# _fake_decode in SQL: width/height/channels from digest bytes 0..2
_SQL_W = f"(16 + {_hexbyte('sha', 0)} % 240)"
_SQL_H = f"(16 + {_hexbyte('sha', 1)} % 240)"
_SQL_C = f"(1 + {_hexbyte('sha', 2)} % 4)"

FEATURE_SCHEMA = (
    "doc_id long, uri string, mime string, n_bytes long, sha256 string, "
    "width int, height int, n_channels int"
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a multimodal table from ``documents``: text bytes stand in
    for media payloads; mime/URI assigned deterministically."""
    docs = spread(read_table(spark, sf_dir, "documents"))
    mime = F.element_at(
        F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        "doc_id",
        F.concat(F.lit("s3://media-bucket/"), F.col("source"), F.lit("/"), F.col("doc_id")).alias("uri"),
        mime.alias("mime"),
        F.encode("text", "utf-8").alias("bytes"),
        F.create_map(
            F.lit("lang"), F.col("lang"),
            F.lit("n_chars"), F.col("n_chars").cast("string"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, mime: str) -> tuple[int, int, int]:
    """Deterministic stand-in for the real codec (media libs unavailable
    here): derives (width, height, channels) from a digest of the payload.
    Replace with PIL.Image.open / soundfile.read in production — the
    surrounding Arrow plumbing is unchanged."""
    d = hashlib.sha256(payload).digest()
    return 16 + d[0] % 240, 16 + d[1] % 240, 1 + d[2] % 4


def extract_media_features(media: DataFrame) -> DataFrame:
    """X-5 decode/feature-extract over ``mapInPandas``: one Python worker
    per Arrow batch, blobs never leave the executor."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            dims = [_fake_decode(b, m) for b, m in zip(pdf["bytes"], pdf["mime"])]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "uri": pdf["uri"],
                    "mime": pdf["mime"],
                    "n_bytes": [len(b) for b in pdf["bytes"]],
                    "sha256": [hashlib.sha256(b).hexdigest() for b in pdf["bytes"]],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_channels": [d[2] for d in dims],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


@query(
    "x5_media_meta",
    """
    SELECT doc_id,
           's3://media-bucket/' || source || '/' || CAST(doc_id AS STRING) AS uri,
           CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image/png'
                WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS payload_sha
    FROM documents
    """,
)
def x5_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-5 (oracle-checkable slice): typed metadata projection of the
    multimodal table — byte length + digest computed JVM-side."""
    media = media_table(spark, sf_dir)
    return media.select(
        "doc_id",
        "uri",
        "mime",
        F.length("bytes").cast("bigint").alias("n_bytes"),
        F.sha2("bytes", 256).alias("payload_sha"),
    )


@query(
    "x5_media_decode",
    f"""
    WITH {_MEDIA_CTE}
    SELECT doc_id, uri, mime, n_bytes, sha AS sha256,
           CAST({_SQL_W} AS INT) AS width,
           CAST({_SQL_H} AS INT) AS height,
           CAST({_SQL_C} AS INT) AS n_channels
    FROM m
    """,
)
def x5_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-5: full decode/feature-extract path through mapInPandas (Arrow
    batches); codec stubbed deterministically (digest-derived — see
    ``_fake_decode``), plumbing real, and the whole path oracle-checked
    against DuckDB's hex-parsed replica of the stub."""
    return extract_media_features(media_table(spark, sf_dir))


RESIZE_SCHEMA = "doc_id long, mime string, width int, height int, out_width int, out_height int, n_out_bytes long"


def resize_media(media: DataFrame, target: int = 64) -> DataFrame:
    """X-5 resize: scale every image's longer edge to ``target`` px,
    preserving aspect ratio. The resample kernel itself is the stubbed
    codec step (real impl: PIL.Image.resize inside the same batch loop);
    geometry math and output sizing are real and tested."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            dims = [_fake_decode(b, m) for b, m in zip(pdf["bytes"], pdf["mime"])]
            rows = []
            for (w, h, ch), doc_id, mime in zip(dims, pdf["doc_id"], pdf["mime"]):
                scale = target / max(w, h)
                # half-UP rounding (floor(x + 0.5)), not Python's banker's
                # round: specified this way so the SQL oracle reproduces it
                # bit-for-bit (same IEEE op order: w * (target/max))
                ow, oh = max(1, int(w * scale + 0.5)), max(1, int(h * scale + 0.5))
                rows.append((doc_id, mime, w, h, ow, oh, ow * oh * ch))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "mime", "width", "height", "out_width", "out_height", "n_out_bytes"],
            )

    return media.mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_ts_ms long, frame_sha string"


def sample_frames(media: DataFrame, fps: float = 1.0, n_frames: int = 4) -> DataFrame:
    """X-5 frame-sample: emit ``n_frames`` evenly spaced frames per video
    payload (one→many via mapInPandas). Frame extraction is the stubbed
    codec step (real impl: pyav/ffmpeg per batch); the fan-out shape,
    timestamps, and per-frame digests are real."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for doc_id, mime, payload in zip(pdf["doc_id"], pdf["mime"], pdf["bytes"]):
                if mime != "video/mp4":
                    continue
                # stub: fake duration from payload size; real impl probes the container
                duration_ms = 1000 * (1 + len(payload) % 60)
                for i in range(n_frames):
                    ts = int(i * duration_ms / n_frames)
                    # tag = ASCII decimal of ts (not raw bytes) so the SQL
                    # oracle can replicate the digest via string concat
                    digest = hashlib.sha256(payload + str(ts).encode()).hexdigest()
                    rows.append((doc_id, i, ts, digest))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_ts_ms", "frame_sha"])

    return media.mapInPandas(run, FRAME_SCHEMA)


@query(
    "x5_media_resize",
    f"""
    WITH {_MEDIA_CTE},
    d AS (
        SELECT doc_id, mime,
               {_SQL_W} AS w, {_SQL_H} AS h, {_SQL_C} AS ch
        FROM m
    ),
    r AS (
        SELECT doc_id, mime, w, h, ch,
               GREATEST(1, CAST(FLOOR(w * (64.0 / GREATEST(w, h)) + 0.5) AS INT)) AS ow,
               GREATEST(1, CAST(FLOOR(h * (64.0 / GREATEST(w, h)) + 0.5) AS INT)) AS oh
        FROM d
    )
    SELECT doc_id, mime, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           ow AS out_width, oh AS out_height,
           CAST(ow * oh * ch AS BIGINT) AS n_out_bytes
    FROM r
    """,
)
def x5_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-5: aspect-preserving resize metadata for every media row."""
    return resize_media(media_table(spark, sf_dir))


@query(
    "x5_frame_sample",
    f"""
    WITH {_MEDIA_CTE},
    v AS (
        SELECT doc_id, text, 1000 * (1 + n_bytes % 60) AS dur
        FROM m WHERE mime = 'video/mp4'
    )
    SELECT v.doc_id,
           CAST(f.i AS INT) AS frame_idx,
           CAST(f.i * v.dur / 4 AS BIGINT) AS frame_ts_ms,
           sha256(v.text || CAST(CAST(f.i * v.dur / 4 AS BIGINT) AS STRING)) AS frame_sha
    FROM v CROSS JOIN generate_series(0, 3) AS f(i)
    """,
)
def x5_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-5: evenly-spaced frame sampling for the video rows (1→N fan-out
    inside the Arrow batch — no explode shuffle of blob bytes)."""
    return sample_frames(media_table(spark, sf_dir))


@query(
    "x5_meta_kv",
    """
    WITH kv AS (
        SELECT doc_id, 'lang' AS k, lang AS v FROM documents
        UNION ALL
        SELECT doc_id, 'n_chars', CAST(n_chars AS STRING) FROM documents
    )
    SELECT k, v, CAST(COUNT(*) AS BIGINT) AS n
    FROM kv WHERE k = 'lang' OR CAST(v AS BIGINT) >= 300
    GROUP BY k, v
    """,
)
def x5_meta_kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-5 (typed-metadata surface): explode the media table's
    ``map<string,string>`` meta column to key/value rows and aggregate —
    exercises the MapType path (map_entries + inline explode) that no
    other query touches. The oracle rebuilds the same kv rows relationally
    from ``documents`` since the map itself is constructed in-flight."""
    media = media_table(spark, sf_dir)
    kv = media.select(
        "doc_id", F.explode(F.map_entries("meta")).alias("e")
    ).select("doc_id", F.col("e.key").alias("k"), F.col("e.value").alias("v"))
    return (
        kv.filter((F.col("k") == "lang") | (F.col("v").cast("bigint") >= 300))
        .groupBy("k", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
