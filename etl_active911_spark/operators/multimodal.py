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


@query("x5_media_decode")  # Pandas-UDF decode path — rows-only (stubbed codec)
def x5_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-5: full decode/feature-extract path through mapInPandas (Arrow
    batches); codec stubbed deterministically, plumbing real."""
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
                ow, oh = max(1, round(w * scale)), max(1, round(h * scale))
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
                    digest = hashlib.sha256(payload + ts.to_bytes(8, "big")).hexdigest()
                    rows.append((doc_id, i, ts, digest))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_ts_ms", "frame_sha"])

    return media.mapInPandas(run, FRAME_SCHEMA)


@query("x5_media_resize")  # stubbed resample kernel — rows-only
def x5_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-5: aspect-preserving resize metadata for every media row."""
    return resize_media(media_table(spark, sf_dir))


@query("x5_frame_sample")  # stubbed frame extraction — rows-only
def x5_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-5: evenly-spaced frame sampling for the video rows (1→N fan-out
    inside the Arrow batch — no explode shuffle of blob bytes)."""
    return sample_frames(media_table(spark, sf_dir))
