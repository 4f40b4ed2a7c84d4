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
import math
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


# ---------------------------------------------------------------------------
# X-5b: REAL tiny-format decode (24-bit BMP) — r4, VERDICT r03 item 7
# ---------------------------------------------------------------------------
#
# Unlike the digest-stub codec above, this path parses ACTUAL bytes: the
# encoder below writes genuine BITMAPFILEHEADER + BITMAPINFOHEADER + padded
# bottom-up pixel rows, and the decoder reads dimensions from the header
# and pixel values from the array — `struct.unpack` on real offsets, no
# digests. It still carries a hard DuckDB oracle because the encoder's
# *parameters* (dims, pattern seeds) derive from the payload digest and the
# pixel pattern is plain arithmetic, so SQL can predict what a correct
# decoder must recover without ever touching binary.

import struct  # noqa: E402


def encode_bmp(width: int, height: int, seeds: tuple[int, int, int]) -> bytes:
    """A real 24-bit bottom-up BMP: 14-byte file header, 40-byte
    BITMAPINFOHEADER, BGR pixel triplets, rows zero-padded to 4 bytes.
    Pixel (x, y) in image coords (y=0 is the TOP row — stored LAST):
    R=(7x+13y+s0)%256, G=(3x+5y+s1)%256, B=(11x+17y+s2)%256."""
    import numpy as np

    s0, s1, s2 = seeds
    row_len = (3 * width + 3) & ~3
    # vectorized pattern fill (the per-pixel Python loop measured ~2.8 s
    # for the sf0.1 query; numpy broadcasting runs it at C speed)
    x = np.arange(width, dtype=np.int64)[None, :]
    y = np.arange(height, dtype=np.int64)[:, None]  # image rows, y=0 top
    bgr = np.empty((height, width, 3), dtype=np.uint8)
    bgr[:, :, 0] = (11 * x + 17 * y + s2) % 256  # B
    bgr[:, :, 1] = (3 * x + 5 * y + s1) % 256    # G
    bgr[:, :, 2] = (7 * x + 13 * y + s0) % 256   # R
    rows = np.zeros((height, row_len), dtype=np.uint8)
    rows[:, : 3 * width] = bgr.reshape(height, 3 * width)
    pix = rows[::-1].tobytes()  # bottom-up storage: image row 0 last
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    return bytes(header + pix)


def decode_bmp(payload: bytes) -> tuple[int, int, int, int, int, int, int, int, int]:
    """Parse a 24-bit uncompressed BMP: returns (width, height, bpp,
    sum_r, sum_g, sum_b, top_r, top_g, top_b). Every value comes from the
    byte stream itself — header fields via struct.unpack at their
    documented offsets, pixel sums by walking the padded bottom-up rows,
    top_* from the TOP-LEFT image pixel (i.e. the FIRST triplet of the
    LAST stored row — wrong row-order handling cannot pass the oracle)."""
    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pix_off,) = struct.unpack_from("<I", payload, 10)
    dib, width, height, _planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if dib < 40 or bpp != 24 or comp != 0 or height <= 0:
        raise ValueError(f"unsupported BMP variant (dib={dib} bpp={bpp} comp={comp})")
    row_len = (3 * width + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_len * height, offset=pix_off
    ).reshape(height, row_len)
    bgr = rows[:, : 3 * width].reshape(height, width, 3).astype(np.int64)
    sb, sg, sr = (int(bgr[:, :, c].sum()) for c in (0, 1, 2))
    top = pix_off + (height - 1) * row_len  # image row y=0 is stored last
    return (width, height, bpp, sr, sg, sb, payload[top + 2], payload[top + 1], payload[top])


BMP_FEATURE_SCHEMA = (
    "doc_id long, width int, height int, bpp int, n_bytes long, "
    "mean_r double, mean_g double, mean_b double, top_r int, top_g int, top_b int"
)


def bmp_media_table(media: DataFrame) -> DataFrame:
    """Replace the image rows' text stand-in payloads with REAL encoded
    BMPs whose parameters derive from the original payload digest
    (dims from digest bytes 0-1 → 4..32 px, pattern seeds from bytes
    3-5). Runs in mapInPandas — blob construction stays on executors."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = pdf[pdf["mime"] == "image/png"].copy()
            payloads = []
            for b in out["bytes"]:
                d = hashlib.sha256(b).digest()
                payloads.append(
                    encode_bmp(4 + d[0] % 29, 4 + d[1] % 29, (d[3], d[4], d[5]))
                )
            out["bytes"] = payloads
            out["mime"] = "image/bmp"
            yield out[["doc_id", "uri", "mime", "bytes"]]

    return media.mapInPandas(run, "doc_id long, uri string, mime string, bytes binary")


def decode_bmp_features(bmps: DataFrame) -> DataFrame:
    """The real decode pass: header + pixel parse per Arrow batch."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["bytes"]):
                w, h, bpp, sr, sg, sb, tr, tg, tb = decode_bmp(payload)
                n = w * h
                rows.append(
                    (doc_id, w, h, bpp, len(payload),
                     # half-up, not banker's: mirrors SQL ROUND
                     # (CLAUDE.md rule 11; ADVICE r08)
                     math.floor(sr / n * 1e6 + 0.5) / 1e6,
                     math.floor(sg / n * 1e6 + 0.5) / 1e6,
                     math.floor(sb / n * 1e6 + 0.5) / 1e6, tr, tg, tb)
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "bpp", "n_bytes",
                         "mean_r", "mean_g", "mean_b", "top_r", "top_g", "top_b"],
            )

    return bmps.mapInPandas(run, BMP_FEATURE_SCHEMA)


# digest-derived encoder parameters, as SQL over the hex digest
_BMP_W = f"(4 + {_hexbyte('sha', 0)} % 29)"
_BMP_H = f"(4 + {_hexbyte('sha', 1)} % 29)"
_BMP_S0 = _hexbyte("sha", 3)
_BMP_S1 = _hexbyte("sha", 4)
_BMP_S2 = _hexbyte("sha", 5)


@query(
    "x5_media_decode_real",
    f"""
    WITH {_MEDIA_CTE},
    img AS (
        SELECT doc_id, sha,
               {_BMP_W} AS w, {_BMP_H} AS h,
               {_BMP_S0} AS s0, {_BMP_S1} AS s1, {_BMP_S2} AS s2
        FROM m WHERE mime = 'image/png'
    ),
    px AS (
        SELECT doc_id, w, h, s0, s1, s2, unnest(range(w * h)) AS i FROM img
    ),
    sums AS (
        SELECT doc_id,
               SUM((7 * (i % w) + 13 * (i // w) + s0) % 256) AS sr,
               SUM((3 * (i % w) + 5 * (i // w) + s1) % 256) AS sg,
               SUM((11 * (i % w) + 17 * (i // w) + s2) % 256) AS sb
        FROM px GROUP BY doc_id
    )
    SELECT img.doc_id,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height, 24 AS bpp,
           CAST(54 + ((3 * w + 3) // 4) * 4 * h AS BIGINT) AS n_bytes,
           ROUND(CAST(sr AS DOUBLE) / (w * h), 6) AS mean_r,
           ROUND(CAST(sg AS DOUBLE) / (w * h), 6) AS mean_g,
           ROUND(CAST(sb AS DOUBLE) / (w * h), 6) AS mean_b,
           CAST(s0 % 256 AS INT) AS top_r,
           CAST(s1 % 256 AS INT) AS top_g,
           CAST(s2 % 256 AS INT) AS top_b
    FROM img JOIN sums ON img.doc_id = sums.doc_id
    """,
)
def x5_media_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-5b: REAL image decode — encode genuine 24-bit BMPs on the
    executors, then parse headers and padded bottom-up pixel rows back out
    of the raw bytes (``decode_bmp``). The oracle predicts every decoded
    field closed-form from the digest-derived encoder parameters, so a
    decoder that misreads offsets, padding, or row order hash-mismatches.
    Top-left-pixel outputs specifically pin bottom-up row indexing.

    r6: encode and decode run FUSED in ONE mapInPandas (0.94 → 0.57 s
    warm median at sf0.1) — the chained ``bmp_media_table →
    decode_bmp_features`` form shipped every BMP payload through a second
    Arrow hop just to parse it; at 100 TB that's a full extra
    serialization pass of the blob column. The two-stage helpers remain
    (and remain tested) for pipelines that persist the encoded blobs."""
    import pandas as pd

    media = media_table(spark, sf_dir)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = pdf[pdf["mime"] == "image/png"]
            rows = []
            for doc_id, b in zip(out["doc_id"], out["bytes"]):
                d = hashlib.sha256(b).digest()
                payload = encode_bmp(4 + d[0] % 29, 4 + d[1] % 29, (d[3], d[4], d[5]))
                w, h, bpp, sr, sg, sb, tr, tg, tb = decode_bmp(payload)
                n = w * h
                rows.append(
                    (doc_id, w, h, bpp, len(payload),
                     # half-up, not banker's: mirrors SQL ROUND
                     # (CLAUDE.md rule 11; ADVICE r08)
                     math.floor(sr / n * 1e6 + 0.5) / 1e6,
                     math.floor(sg / n * 1e6 + 0.5) / 1e6,
                     math.floor(sb / n * 1e6 + 0.5) / 1e6, tr, tg, tb)
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "bpp", "n_bytes",
                         "mean_r", "mean_g", "mean_b", "top_r", "top_g", "top_b"],
            )

    return media.mapInPandas(run, BMP_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# X-5c (r6): aspect-ratio bucketing + pixel-budget batch packing
# ---------------------------------------------------------------------------

PACK_PIXEL_BUDGET = 1 << 20  # ~1 Mpixel per packed training batch

#: ratio ladder on r = (100·w) DIV h — pure integer arithmetic so both
#: engines agree exactly; the ladder is the standard 5-band bucketing
#: (portrait ... landscape) an SDXL-style trainer uses.
_AR_BANDS = [(63, "tall"), (88, "3:4"), (117, "1:1"), (160, "4:3")]
_AR_ELSE = "wide"


def _ar_bucket_sql(r: str) -> str:
    whens = " ".join(f"WHEN {r} < {lim} THEN '{name}'" for lim, name in _AR_BANDS)
    return f"CASE {whens} ELSE '{_AR_ELSE}' END"


def _ar_bucket_col(r):
    out = None
    for lim, name in _AR_BANDS:
        out = F.when(r < lim, name) if out is None else out.when(r < lim, name)
    return out.otherwise(_AR_ELSE)


@query(
    "x5_aspect_bucket_pack",
    f"""
    WITH m AS (
        SELECT doc_id, sha256(text) AS sha FROM documents WHERE doc_id % 3 = 0
    ),
    dims AS (
        SELECT doc_id,
               (16 + {_hexbyte('sha', 0)} % 240) AS w,
               (16 + {_hexbyte('sha', 1)} % 240) AS h
        FROM m
    ),
    b AS (
        SELECT doc_id, {_ar_bucket_sql('((100 * w) // h)')} AS bucket,
               CAST(w * h AS BIGINT) AS px
        FROM dims
    ),
    c AS (
        SELECT doc_id, bucket, px,
               SUM(px) OVER (PARTITION BY bucket ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM b
    )
    SELECT bucket, CAST((cum - px) // {PACK_PIXEL_BUDGET} AS BIGINT) AS pack_id,
           CAST(COUNT(*) AS BIGINT) AS n_images,
           CAST(SUM(px) AS BIGINT) AS pack_pixels,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM c GROUP BY 1, 2
    """,
)
def x5_aspect_bucket_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-5c (r6): ASPECT-RATIO BUCKETING + pixel-budget batch packing —
    the multimodal trainer's batch builder: images are grouped into
    aspect-ratio bands (so a batch shares one target shape and no image
    is destructively cropped), then packed WITHIN each band into batches
    of ~PACK_PIXEL_BUDGET pixels in deterministic doc_id order (the
    streaming-packing rule: an image belongs to the pack where its first
    pixel lands, so packs overflow by at most one image). Output per
    (bucket, pack_id): image count, pixel total, contiguous doc span —
    what the loader needs to seek a shape-consistent batch.

    Built entirely from engine-exact integer arithmetic: dimensions come
    from the stub codec's digest bytes (same spec as x5_media_meta — the
    parse happens JVM-side here: sha2 hex → conv, no Python), the ratio
    band compares (100·w) DIV h against an integer ladder, and the
    per-band packing is the GROUPED two-phase distributed prefix sum
    (``_two_phase_prefix_sum(group_cols=('bucket',))`` — per-(band,
    range) counting windows, a bounded bands × ranges offsets table, no
    global-ORDER-BY window; range ids are data-derived per SCALE.md
    invariant 9)."""
    from etl_active911_spark.operators.sampling import _two_phase_prefix_sum

    docs = spread(read_table(spark, sf_dir, "documents"), "doc_id")
    sha = F.sha2(F.encode("text", "utf-8"), 256)
    imgs = docs.filter(F.col("doc_id") % 3 == 0).select(
        "doc_id",
        (16 + F.conv(F.substring(sha, 1, 2), 16, 10).cast("int") % 240).alias("w"),
        (16 + F.conv(F.substring(sha, 3, 2), 16, 10).cast("int") % 240).alias("h"),
    )
    r = F.expr("CAST((100 * w) DIV h AS INT)")
    b = imgs.select(
        "doc_id",
        _ar_bucket_col(r).alias("bucket"),
        (F.col("w").cast("bigint") * F.col("h")).alias("px"),
    )
    packed = _two_phase_prefix_sum(b, "px", group_cols=("bucket",)).withColumn(
        "pack_id", F.expr(f"CAST(start_off DIV {PACK_PIXEL_BUDGET} AS BIGINT)")
    )
    return packed.groupBy("bucket", "pack_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_images"),
        F.sum("px").cast("bigint").alias("pack_pixels"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


SCENE_HAMMING_THRESHOLD = 26  # of 60 bits; random-hash mean is 30


@query(
    "x5_scene_change",
    f"""
    WITH {_MEDIA_CTE},
    v AS (
        SELECT doc_id, text, 1000 * (1 + n_bytes % 60) AS dur
        FROM m WHERE mime = 'video/mp4'
    ),
    fr AS (
        SELECT v.doc_id, CAST(f.i AS INT) AS frame_idx,
               ('0x' || substr(sha256(v.text || CAST(CAST(f.i * v.dur / 4 AS BIGINT) AS STRING)), 1, 15))::BIGINT AS vh
        FROM v CROSS JOIN generate_series(0, 3) AS f(i)
    ),
    d AS (
        SELECT doc_id, frame_idx, vh,
               LAG(vh) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS pv
        FROM fr
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(SUM(CASE WHEN pv IS NOT NULL
                          AND bit_count(xor(vh, pv)) >= {SCENE_HAMMING_THRESHOLD}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_scene_changes,
           CAST(SUM(CASE WHEN pv IS NOT NULL THEN bit_count(xor(vh, pv)) END) AS BIGINT)
               AS total_hamming
    FROM d GROUP BY doc_id
    """,
)
def x5_scene_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-5 (r6): SCENE-CHANGE detection over sampled video frames — the
    standard shot-boundary heuristic: a 60-bit per-frame visual hash
    (here the stub codec's digest prefix — a real pipeline would plug a
    pHash/dHash here; the Spark shape is identical), consecutive-frame
    Hamming distance via one lag window + ``bit_count(xor)``, boundary
    when distance ≥ 26/60 bits. Emits per video: frame count, scene-
    change count, and the total inter-frame Hamming (an overall motion/
    cut-rate proxy). Everything is integer bit arithmetic in codegen —
    engine-exact, no rounding policy; one shuffle on doc_id shared by
    the lag window and the roll-up."""
    from pyspark.sql import Window as W

    media = media_table(spark, sf_dir)
    v = media.filter(F.col("mime") == "video/mp4").select(
        "doc_id",
        F.decode("bytes", "utf-8").alias("text"),
        (1000 * (1 + F.octet_length("bytes") % 60)).alias("dur"),
    )
    fr = v.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("frame_idx"),
        "text",
        "dur",
    ).select(
        "doc_id",
        "frame_idx",
        F.conv(
            F.substring(
                F.sha2(
                    F.concat(
                        F.col("text"),
                        (F.col("frame_idx") * F.col("dur") / 4).cast("bigint").cast("string"),
                    ),
                    256,
                ),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("vh"),
    )
    w = W.partitionBy("doc_id").orderBy("frame_idx")
    d = fr.withColumn("pv", F.lag("vh").over(w))
    ham = F.bit_count(F.expr("vh ^ pv"))
    return d.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_frames"),
        F.sum(
            F.when(F.col("pv").isNotNull() & (ham >= SCENE_HAMMING_THRESHOLD), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_scene_changes"),
        F.sum(F.when(F.col("pv").isNotNull(), ham)).cast("bigint").alias("total_hamming"),
    )


# ---------------------------------------------------------------------------
# X-5d (r7): perceptual-hash image dedup (average hash)
# ---------------------------------------------------------------------------

AHASH_SCHEMA = "doc_id long, width int, height int, h0 long, h1 long"


def ahash64(payload: bytes) -> tuple[int, int, int, int]:
    """64-bit AVERAGE HASH of a 24-bit BMP (the classic aHash perceptual
    fingerprint, public literature): nearest-neighbor resample to 8×8
    (sample at ``x = (gi·w)//8``, ``y = (gj·h)//8`` — exact for any
    dimensions, no interpolation ties), integer luminance
    ``299·R + 587·G + 114·B`` (the Rec.601 weights ×1000, kept integral),
    bit k (= 8·gj + gi) set iff ``64·lum > Σlum`` — the strict-integer
    form of "above the mean", so both engines make identical boundary
    calls with no division anywhere. Returned as two 32-bit halves
    (h0 = bits 0-31, h1 = bits 32-63): a single int64 would need bit 63
    and overflow signed arithmetic in SQL."""
    import numpy as np

    (pix_off,) = struct.unpack_from("<I", payload, 10)
    _dib, width, height, _planes, _bpp, _comp = struct.unpack_from("<IiiHHI", payload, 14)
    row_len = (3 * width + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_len * height, offset=pix_off
    ).reshape(height, row_len)
    img = rows[::-1, : 3 * width].reshape(height, width, 3)  # top-down BGR
    xs = (np.arange(8) * width) // 8
    ys = (np.arange(8) * height) // 8
    sub = img[np.ix_(ys, xs)].astype(np.int64)  # (gj, gi, BGR)
    lum = 299 * sub[:, :, 2] + 587 * sub[:, :, 1] + 114 * sub[:, :, 0]
    tot = int(lum.sum())
    h0 = h1 = 0
    for k in range(64):
        if 64 * int(lum[k // 8, k % 8]) > tot:
            if k < 32:
                h0 |= 1 << k
            else:
                h1 |= 1 << (k - 32)
    return width, height, h0, h1


# aHash derivation as a shared oracle CTE chain (ends in `hashes` =
# (doc_id, w, h, h0, h1)) — consumed by x5_phash_dedup AND the banded
# near-dup query so the two can never desynchronize.
_PHASH_HASHES_CTES = f"""{_MEDIA_CTE},
    img AS (
        SELECT doc_id, {_BMP_W} AS w, {_BMP_H} AS h,
               {_BMP_S0} AS s0, {_BMP_S1} AS s1, {_BMP_S2} AS s2
        FROM m WHERE mime = 'image/png'
    ),
    grid AS (
        SELECT doc_id, w, h, s0, s1, s2, unnest(range(64)) AS k FROM img
    ),
    samp AS (
        SELECT doc_id, w, h, k,
               ((k % 8) * w) // 8 AS x,
               ((k // 8) * h) // 8 AS y,
               s0, s1, s2
        FROM grid
    ),
    lum AS (
        SELECT doc_id, w, h, k,
               299 * ((7 * x + 13 * y + s0) % 256)
             + 587 * ((3 * x + 5 * y + s1) % 256)
             + 114 * ((11 * x + 17 * y + s2) % 256) AS l
        FROM samp
    ),
    tot AS (SELECT doc_id, SUM(l) AS t FROM lum GROUP BY doc_id),
    bits AS (
        SELECT lum.doc_id, lum.w, lum.h, lum.k,
               CASE WHEN 64 * lum.l > tot.t THEN 1 ELSE 0 END AS b
        FROM lum JOIN tot ON lum.doc_id = tot.doc_id
    ),
    hashes AS (
        SELECT doc_id, ANY_VALUE(w) AS w, ANY_VALUE(h) AS h,
               CAST(SUM(CASE WHEN k < 32
                             THEN b * (CAST(1 AS BIGINT) << k)
                             ELSE 0 END) AS BIGINT) AS h0,
               CAST(SUM(CASE WHEN k >= 32
                             THEN b * (CAST(1 AS BIGINT) << (k - 32))
                             ELSE 0 END) AS BIGINT) AS h1
        FROM bits GROUP BY doc_id
    )"""


@query(
    "x5_phash_dedup",
    f"""
    WITH {_PHASH_HASHES_CTES}
    SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height, h0, h1,
           CAST(COUNT(*) OVER (PARTITION BY h0, h1) AS BIGINT) AS n_same_hash
    FROM hashes
    """,
)
def x5_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-5d (r7): PERCEPTUAL-HASH image dedup — the multimodal twin of
    exact text dedup: every image gets a 64-bit average hash computed
    from its REAL decoded pixels (encode → parse → nearest-neighbor 8×8
    resample → Rec.601 integer luminance → above-mean bits, all in one
    fused Arrow pass like ``x5_media_decode_real``), and the output
    tags each image with its hash and the size of its hash class —
    identical source documents produce identical payloads, hence
    identical hashes, so duplicate media collapse exactly. The oracle
    re-derives every bit closed-form from the digest-derived encoder
    pattern: a decoder that misreads row order, padding, the resample
    anchor, or the threshold boundary flips bits and hash-mismatches.

    Near-dup extension (documented, not registered): Hamming distance
    between hashes is ``bit_count(h0 ^ h0') + bit_count(h1 ^ h1')`` —
    band the 4 16-bit quarters for LSH candidates exactly like SimHash
    chunks (``x2_simhash``); at fixture scale only exact classes exist,
    so the registered output is the exact-class rollup.

    Scale shape: blob bytes never shuffle (hash computed in the scan-side
    Arrow pass; only (doc_id, 2×int64) rows move); the class count is one
    window over the hash key — the same shuffle the downstream dedup
    would group by."""
    from pyspark.sql import Window

    hashes = phash_hashes(media_table(spark, sf_dir))
    w = Window.partitionBy("h0", "h1")
    return hashes.withColumn("n_same_hash", F.count(F.lit(1)).over(w).cast("bigint"))


def phash_hashes(media: DataFrame) -> DataFrame:
    """(doc_id, width, height, h0, h1) aHash rows for every image blob:
    one fused Arrow pass (encode the digest-derived BMP, parse its real
    pixels, ``ahash64``) — shared by ``x5_phash_dedup`` and the banded
    near-dup query."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = pdf[pdf["mime"] == "image/png"]
            rows = []
            for doc_id, b in zip(out["doc_id"], out["bytes"]):
                d = hashlib.sha256(b).digest()
                payload = encode_bmp(4 + d[0] % 29, 4 + d[1] % 29, (d[3], d[4], d[5]))
                w, h, h0, h1 = ahash64(payload)
                rows.append((doc_id, w, h, h0, h1))
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "h0", "h1"])

    return media.mapInPandas(run, AHASH_SCHEMA)


# ---------------------------------------------------------------------------
# X-5f (r10): Hamming-banded perceptual near-dup (VERDICT r09 item 5a)
# ---------------------------------------------------------------------------

#: near-dup acceptance: ≤ this many differing bits of 64 (the usual
#: perceptual-hash dup band; exact dups are Hamming 0)
PHASH_NEAR_HAMMING = 10
#: band-bucket flood cap (same recall argument as dedup.LSH_MAX_BUCKET:
#: a 16-bit band value shared by >cap distinct hash CLASSES is a
#: degenerate/flat-image flood, not a dup signal) — no-op at fixture
#: scale and mirrored in the oracle SQL
PHASH_MAX_BUCKET = 1024

_PHASH_BANDED_ORACLE = f"""
    WITH {_PHASH_HASHES_CTES},
    cls AS (
        SELECT h0, h1, MIN(doc_id) AS rep, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM hashes GROUP BY h0, h1
    ),
    bnd AS (
        SELECT rep, n_docs, h0, h1,
               unnest([h0 & 65535, h0 >> 16, h1 & 65535, h1 >> 16]) AS bv,
               unnest([0, 1, 2, 3]) AS bi
        FROM cls
    ),
    ok AS (
        SELECT bi, bv FROM bnd
        GROUP BY bi, bv HAVING COUNT(*) BETWEEN 2 AND {PHASH_MAX_BUCKET}
    ),
    cand AS (
        SELECT DISTINCT a.rep AS rep_a, b.rep AS rep_b,
               a.n_docs AS n_docs_a, b.n_docs AS n_docs_b,
               CAST(bit_count(xor(a.h0, b.h0))
                    + bit_count(xor(a.h1, b.h1)) AS BIGINT) AS hamming
        FROM bnd a
        JOIN bnd b ON a.bi = b.bi AND a.bv = b.bv AND a.rep < b.rep
        JOIN ok   ON ok.bi = a.bi AND ok.bv = a.bv
    )
    SELECT rep_a, rep_b, n_docs_a, n_docs_b, hamming
    FROM cand WHERE hamming <= {PHASH_NEAR_HAMMING}
    UNION ALL
    SELECT rep AS rep_a, rep AS rep_b, n_docs AS n_docs_a,
           n_docs AS n_docs_b, CAST(0 AS BIGINT) AS hamming
    FROM cls WHERE n_docs >= 2
    """


def phash_banded_pairs(
    hashes: DataFrame,
    ham_t: int = PHASH_NEAR_HAMMING,
    max_bucket: int = PHASH_MAX_BUCKET,
) -> DataFrame:
    """Near-dup image pairs at HASH-CLASS grain from (doc_id, h0, h1)
    rows: exact pre-collapse to distinct (h0, h1) classes first (the X-2
    flood discipline — a million byte-identical images are ONE band
    member, not a million), then LSH banding over the 4 16-bit hash
    quarters (pigeonhole: any pair within Hamming ≤ 3 shares a band
    untouched by its flips, so recall is 1.0 there by construction —
    pinned in tests/test_phash_banded.py), bucket-and-explode candidate
    generation with NO join operator (CLAUDE.md rule 18), exact Hamming
    verification via ``bit_count(xor)``. Self-pair rows (rep_a = rep_b,
    hamming 0) report exact-dup classes of ≥ 2 docs.

    Scale shape: one shuffle on (band_idx, band_val) over class-grain
    rows; buckets above ``max_bucket`` classes are dropped on the
    aggregated list before the n² explode can fire."""
    classes = hashes.groupBy("h0", "h1").agg(
        F.min("doc_id").alias("rep"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    )
    exact = classes.filter(F.col("n_docs") >= 2).select(
        F.col("rep").alias("rep_a"),
        F.col("rep").alias("rep_b"),
        F.col("n_docs").alias("n_docs_a"),
        F.col("n_docs").alias("n_docs_b"),
        F.lit(0).cast("bigint").alias("hamming"),
    )
    quarters = F.array(
        F.col("h0").bitwiseAND(F.lit(65535)),
        F.shiftright("h0", 16),
        F.col("h1").bitwiseAND(F.lit(65535)),
        F.shiftright("h1", 16),
    )
    bnd = classes.select(
        F.struct("rep", "n_docs", "h0", "h1").alias("m"),
        F.posexplode(quarters).alias("bi", "bv"),
    )
    buckets = (
        bnd.groupBy("bi", "bv")
        .agg(F.collect_list("m").alias("ms"))
        .filter(F.size("ms").between(2, max_bucket))
        .select("ms")
    )
    ham = (
        F.bit_count(F.col("a.h0").bitwiseXOR(F.col("b.h0")))
        + F.bit_count(F.col("a.h1").bitwiseXOR(F.col("b.h1")))
    ).cast("bigint")
    near = (
        buckets.select(F.explode("ms").alias("a"), "ms")
        .select("a", F.explode("ms").alias("b"))
        .filter(F.col("a.rep") < F.col("b.rep"))
        .select(
            F.col("a.rep").alias("rep_a"),
            F.col("b.rep").alias("rep_b"),
            F.col("a.n_docs").alias("n_docs_a"),
            F.col("b.n_docs").alias("n_docs_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= ham_t)
        .distinct()
    )
    return near.unionByName(exact)


@query("x5_phash_banded_dedup", _PHASH_BANDED_ORACLE)
def x5_phash_banded_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-5f (r10): PERCEPTUAL NEAR-DUP PAIRS — the multimodal twin of
    ``x2_minhash_lsh``: every image's 64-bit aHash (real decoded pixels,
    the ``x5_phash_dedup`` pipeline) is banded into its 4 16-bit
    quarters; images agreeing on ANY quarter become candidates; exact
    Hamming distance verifies at ≤ PHASH_NEAR_HAMMING (10/64) bits. Output
    is at hash-class grain: cross-class near-dup pairs plus self-rows
    for exact-dup classes (rep_a = rep_b), each with class sizes — what
    a curation pipeline joins back to collapse re-encoded/resized
    variants. The oracle re-derives every hash bit closed-form and
    replicates banding, the flood cap, and verification exactly.

    Scale shape: see ``phash_banded_pairs``; blob bytes never shuffle
    (hashes computed scan-side), all downstream traffic is
    (2×int64 + counts) class rows."""
    return phash_banded_pairs(phash_hashes(media_table(spark, sf_dir)))


# ---------------------------------------------------------------------------
# X-5e (r7): real WAV audio codec (encode + decode, analytic oracle)
# ---------------------------------------------------------------------------


def encode_wav(n_samples: int, rate: int, a: int, b: int) -> bytes:
    """A real 16-bit mono PCM WAV: 44-byte RIFF/WAVE/fmt/data header and
    little-endian samples from the integer sawtooth
    ``s[i] = (a·i + b) % 65536 − 32768`` — pure int arithmetic so every
    decoded statistic is closed-form predictable (the audio twin of
    ``encode_bmp``'s pixel pattern)."""
    import numpy as np

    i = np.arange(n_samples, dtype=np.int64)
    s = ((a * i + b) % 65536 - 32768).astype("<i2")
    data = s.tobytes()
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def decode_wav(payload: bytes) -> tuple[int, int, int, int, int]:
    """Parse a 16-bit mono PCM WAV: (n_samples, rate, sum_sq, n_zero_cross,
    peak) — every value from the byte stream itself (RIFF/fmt/data chunk
    walk; samples as little-endian int16). sum_sq and crossings are exact
    integers, so downstream stats carry no float ambiguity."""
    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    fmt_tag, channels, rate = struct.unpack_from("<HHI", payload, 20)
    bits = struct.unpack_from("<H", payload, 34)[0]
    if fmt_tag != 1 or channels != 1 or bits != 16 or payload[36:40] != b"data":
        raise ValueError("unsupported WAV variant")
    (data_len,) = struct.unpack_from("<I", payload, 40)
    s = np.frombuffer(payload, dtype="<i2", count=data_len // 2, offset=44).astype(
        np.int64
    )
    sum_sq = int((s * s).sum())
    zc = int(((s[:-1] * s[1:]) < 0).sum()) if len(s) > 1 else 0
    peak = int(np.abs(s).max()) if len(s) else 0
    return len(s), rate, sum_sq, zc, peak


# digest-derived encoder parameters (audio rows: doc_id % 3 = 1)
_WAV_N = f"(500 + ({_hexbyte('sha', 0)} * 256 + {_hexbyte('sha', 1)}) % 2000)"
_WAV_RATE = f"(8000 + 1000 * ({_hexbyte('sha', 2)} % 5))"
_WAV_A = f"(1 + {_hexbyte('sha', 3)})"
_WAV_B = f"({_hexbyte('sha', 4)} * 256 + {_hexbyte('sha', 5)})"


@query(
    "x5_audio_decode_real",
    f"""
    WITH {_MEDIA_CTE},
    au AS (
        SELECT doc_id, {_WAV_N} AS n, {_WAV_RATE} AS rate,
               {_WAV_A} AS a, {_WAV_B} AS b
        FROM m WHERE mime = 'audio/wav'
    ),
    sm AS (
        SELECT doc_id, n, rate, a, b, unnest(range(n)) AS i FROM au
    ),
    sv AS (
        SELECT doc_id, n, rate, i, ((a * i + b) % 65536 - 32768) AS s FROM sm
    ),
    ag AS (
        SELECT doc_id, ANY_VALUE(n) AS n, ANY_VALUE(rate) AS rate,
               CAST(SUM(s * s) AS BIGINT) AS sum_sq,
               CAST(SUM(CASE WHEN i > 0 AND s * lag_s < 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_zero_cross,
               CAST(MAX(ABS(s)) AS BIGINT) AS peak
        FROM (
            SELECT doc_id, n, rate, i, s,
                   LAG(s) OVER (PARTITION BY doc_id ORDER BY i) AS lag_s
            FROM sv
        ) GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_samples,
           CAST(rate AS INT) AS sample_rate,
           CAST(n * 1000 // rate AS BIGINT) AS duration_ms,
           ROUND(sqrt(CAST(sum_sq AS DOUBLE) / n), 6) AS rms,
           n_zero_cross, peak
    FROM ag
    """,
)
def x5_audio_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-5e (r7): REAL audio decode — the WAV twin of
    ``x5_media_decode_real``: genuine RIFF/PCM bytes are encoded on the
    executors (parameters derived from the payload digest), then parsed
    back out of the raw byte stream — header chunk walk, little-endian
    int16 samples — into the features an audio-curation pipeline gates
    on: duration, RMS energy, zero-crossing rate (the classic
    speech/noise discriminator), and peak amplitude. The oracle predicts
    every value closed-form from the integer sample formula, so a
    decoder that misreads the header layout, sample width, or
    endianness hash-mismatches. Sums and crossings are exact INTEGERS
    (no float until the final RMS), so no aggregation-order ambiguity
    exists anywhere.

    Production swap: ``soundfile.read``/ffmpeg behind the same
    mapInPandas signature — the Spark-side plumbing (Arrow batching,
    fused encode+decode, schema) is the real, tested part.

    Scale shape: one fused Arrow pass, blob bytes never shuffle, output
    is 6 scalars per asset."""
    import pandas as pd

    media = media_table(spark, sf_dir)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = pdf[pdf["mime"] == "audio/wav"]
            rows = []
            import math

            for doc_id, bts in zip(out["doc_id"], out["bytes"]):
                d = hashlib.sha256(bts).digest()
                n = 500 + (d[0] * 256 + d[1]) % 2000
                rate = 8000 + 1000 * (d[2] % 5)
                payload = encode_wav(n, rate, 1 + d[3], d[4] * 256 + d[5])
                ns, rt, sum_sq, zc, peak = decode_wav(payload)
                rows.append(
                    (
                        doc_id,
                        ns,
                        rt,
                        ns * 1000 // rt,
                        # half-up, not banker's: mirrors SQL ROUND
                        # (CLAUDE.md rule 11; ADVICE r07)
                        math.floor(math.sqrt(sum_sq / ns) * 1e6 + 0.5) / 1e6,
                        zc,
                        peak,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_samples", "sample_rate", "duration_ms",
                    "rms", "n_zero_cross", "peak",
                ],
            )

    return media.mapInPandas(
        run,
        "doc_id long, n_samples long, sample_rate int, duration_ms long, "
        "rms double, n_zero_cross long, peak long",
    )


# ---------------------------------------------------------------------------
# X-5 (r9): media integrity validation (magic bytes + header consistency)
# ---------------------------------------------------------------------------


@query(
    "x5_media_validate",
    f"""
    WITH {_MEDIA_CTE}
    SELECT mime,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN mime <> 'video/mp4' AND doc_id % 7 <> 0
                          AND doc_id % 11 <> 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
           CAST(SUM(CASE WHEN mime <> 'video/mp4'
                          AND (doc_id % 7 = 0 OR doc_id % 11 = 0)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
           CAST(SUM(CASE WHEN mime = 'video/mp4' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_unverifiable
    FROM m GROUP BY mime
    """,
)
def x5_media_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-5 (r9): BLOB INTEGRITY VALIDATION — the ingest gate a media
    pipeline runs before spending decode compute: per blob, does the
    container LOOK like what its mime claims (magic bytes) and is the
    header-declared size consistent with the actual byte count? The
    Arrow pass synthesizes each doc's real container (genuine BMP /
    RIFF-WAV via the real codecs), CORRUPTS the first byte for
    ``doc_id % 7 == 0`` (a deterministic stand-in for truncated
    uploads/bit rot), then validates by actually parsing: BMP = 'BM'
    magic + little-endian declared file size == len; WAV = 'RIFF' +
    'WAVE' magics + riff size == len − 8. The mp4 mime has no codec in
    this container, so those rows report UNVERIFIABLE — counted, never
    silently passed (the no-silent-caps rule). The oracle predicts
    every count closed-form from the corruption rule — a validator that
    misparses either header, or one that rubber-stamps, hash-mismatches.

    Scale shape: one fused mapInPandas pass (blobs cross Arrow once,
    never shuffle) → a |mimes|-group aggregate of tiny flag rows."""
    flags = media_validate_flags(media_table(spark, sf_dir))
    return flags.groupBy("mime").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.sum(F.when(F.col("status") == "valid", 1).otherwise(0))
        .cast("bigint")
        .alias("n_valid"),
        F.sum(F.when(F.col("status") == "corrupt", 1).otherwise(0))
        .cast("bigint")
        .alias("n_corrupt"),
        F.sum(F.when(F.col("status") == "unverifiable", 1).otherwise(0))
        .cast("bigint")
        .alias("n_unverifiable"),
    )


def media_validate_flags(media: DataFrame) -> DataFrame:
    """Per-blob integrity verdicts (doc_id, mime, status ∈ valid/corrupt/
    unverifiable) — the parsing pass behind ``x5_media_validate``, exposed
    so curation compositions (x9_curation_v7) gate on the per-doc rows."""
    import struct as _struct

    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for doc_id, mime, b in zip(pdf["doc_id"], pdf["mime"], pdf["bytes"]):
                d = hashlib.sha256(b).digest()
                if mime == "image/png":
                    payload = encode_bmp(4 + d[0] % 29, 4 + d[1] % 29, (d[3], d[4], d[5]))
                elif mime == "audio/wav":
                    n = 500 + (d[0] * 256 + d[1]) % 2000
                    payload = encode_wav(n, 8000 + 1000 * (d[2] % 5), 1 + d[3], d[4] * 256 + d[5])
                else:
                    payload = b  # no mp4 codec in this container
                if doc_id % 7 == 0:
                    # magic-byte corruption (truncated upload / bit rot)
                    payload = b"\x00" + payload[1:]
                elif doc_id % 11 == 0 and mime != "video/mp4":
                    # declared-size corruption with the magic INTACT — a
                    # validator that only sniffs magic bytes passes these
                    # and hash-mismatches the oracle
                    off = 2 if mime == "image/png" else 4
                    payload = (
                        payload[:off]
                        + _struct.pack("<I", _struct.unpack("<I", payload[off:off + 4])[0] + 1)
                        + payload[off + 4:]
                    )
                if mime == "image/png":
                    ok = (
                        len(payload) >= 6
                        and payload[:2] == b"BM"
                        and _struct.unpack("<I", payload[2:6])[0] == len(payload)
                    )
                    status = "valid" if ok else "corrupt"
                elif mime == "audio/wav":
                    ok = (
                        len(payload) >= 12
                        and payload[:4] == b"RIFF"
                        and payload[8:12] == b"WAVE"
                        and _struct.unpack("<I", payload[4:8])[0] == len(payload) - 8
                    )
                    status = "valid" if ok else "corrupt"
                else:
                    status = "unverifiable"
                rows.append((doc_id, mime, status))
            yield pd.DataFrame(rows, columns=["doc_id", "mime", "status"])

    return media.mapInPandas(run, "doc_id long, mime string, status string")


# ---------------------------------------------------------------------------
# X-5 (r10): typed container-metadata extraction (VERDICT r09 item 5b)
# ---------------------------------------------------------------------------

_METADATA_ORACLE = f"""
    WITH {_MEDIA_CTE},
    x AS (
        SELECT doc_id, mime, n_bytes,
               {_BMP_W} AS w, {_BMP_H} AS h,
               500 + ({_hexbyte('sha', 0)} * 256 + {_hexbyte('sha', 1)}) % 2000 AS n,
               8000 + 1000 * ({_hexbyte('sha', 2)} % 5) AS rate
        FROM m
    )
    SELECT doc_id, mime,
           CASE WHEN mime = 'image/png' THEN CAST(w AS INT) END AS width,
           CASE WHEN mime = 'image/png' THEN CAST(h AS INT) END AS height,
           CASE WHEN mime = 'image/png' THEN CAST(24 AS INT) END AS bpp,
           CASE WHEN mime = 'audio/wav' THEN CAST(rate AS INT) END AS sample_rate,
           CASE WHEN mime = 'audio/wav' THEN CAST(n AS BIGINT) END AS n_samples,
           CASE WHEN mime = 'audio/wav' THEN CAST(n * 1000 // rate AS BIGINT) END
               AS duration_ms,
           CASE WHEN mime = 'image/png'
                    THEN CAST(54 + ((3 * w + 3) // 4) * 4 * h AS BIGINT)
                WHEN mime = 'audio/wav' THEN CAST(44 + 2 * n AS BIGINT)
           END AS declared_bytes,
           CASE WHEN mime = 'image/png'
                    THEN CAST(54 + ((3 * w + 3) // 4) * 4 * h AS BIGINT)
                WHEN mime = 'audio/wav' THEN CAST(44 + 2 * n AS BIGINT)
                ELSE n_bytes
           END AS actual_bytes
    FROM x
    """


@query("x5_media_metadata", _METADATA_ORACLE)
def x5_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-5 (r10): EXIF-style TYPED METADATA EXTRACTION — the ingest step
    that turns opaque blobs into first-class queryable columns
    (dimensions, bit depth, sample rate, duration, declared vs actual
    byte size). Every value is PARSED out of the real container bytes
    at its documented offset — BMP: width/height/bpp from the
    BITMAPINFOHEADER and the declared file size from the BM header;
    WAV: sample rate from the fmt chunk, sample count from the data
    chunk length, duration as exact integer division — never recomputed
    from the generation parameters, so a parser that misreads an
    offset, endianness, or signedness hash-mismatches the closed-form
    oracle. The mp4 mime has no codec in this container: its typed
    columns are NULL (counted unverifiable by ``x5_media_validate``),
    only the actual byte length is reported — the no-silent-caps rule.

    Scale shape: one fused mapInPandas pass (blob bytes cross Arrow
    once, never shuffle); output is 10 scalars per asset, ready to be a
    partition/filter key (e.g. aspect-bucket packing reads width/height
    from exactly this surface)."""
    import struct as _struct

    import pandas as pd

    media = media_table(spark, sf_dir)

    cols = [
        "doc_id", "mime", "width", "height", "bpp", "sample_rate",
        "n_samples", "duration_ms", "declared_bytes", "actual_bytes",
    ]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for doc_id, mime, b in zip(pdf["doc_id"], pdf["mime"], pdf["bytes"]):
                d = hashlib.sha256(b).digest()
                if mime == "image/png":
                    payload = encode_bmp(
                        4 + d[0] % 29, 4 + d[1] % 29, (d[3], d[4], d[5])
                    )
                    (declared,) = _struct.unpack_from("<I", payload, 2)
                    _dib, w, h, _pl, bpp, _c = _struct.unpack_from(
                        "<IiiHHI", payload, 14
                    )
                    rows.append(
                        (doc_id, mime, w, h, bpp, None, None, None,
                         declared, len(payload))
                    )
                elif mime == "audio/wav":
                    n = 500 + (d[0] * 256 + d[1]) % 2000
                    payload = encode_wav(
                        n, 8000 + 1000 * (d[2] % 5), 1 + d[3], d[4] * 256 + d[5]
                    )
                    (riff_sz,) = _struct.unpack_from("<I", payload, 4)
                    _tag, _ch, prate = _struct.unpack_from("<HHI", payload, 20)
                    (data_len,) = _struct.unpack_from("<I", payload, 40)
                    pn = data_len // 2
                    rows.append(
                        (doc_id, mime, None, None, None, prate, pn,
                         pn * 1000 // prate, riff_sz + 8, len(payload))
                    )
                else:
                    rows.append(
                        (doc_id, mime, None, None, None, None, None, None,
                         None, len(b))
                    )
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(
        run,
        "doc_id long, mime string, width int, height int, bpp int, "
        "sample_rate int, n_samples long, duration_ms long, "
        "declared_bytes long, actual_bytes long",
    )


# ---------------------------------------------------------------------------
# X-5 (r10): VAD-style silence gating over the real WAV sample stream
# ---------------------------------------------------------------------------

#: energy-gate frame length (samples) and the silence threshold:
#: a frame is SILENT iff its mean square < 65536²/48 — i.e. roughly a
#: quarter of the uniform-sawtooth average power (65536²/12), expressed
#: below as the all-integer compare 48·Σs² < FRAME·65536² (= 2⁴⁰).
_VAD_FRAME = 256
_VAD_DIV = 48
_VAD_RHS = _VAD_FRAME * 65536 * 65536  # 2^40

_SILENCE_ORACLE = f"""
    WITH {_MEDIA_CTE},
    au AS (
        SELECT doc_id, {_WAV_N} AS n, {_WAV_RATE} AS rate,
               {_WAV_A} AS a, {_WAV_B} AS b
        FROM m WHERE mime = 'audio/wav'
    ),
    sm AS (
        SELECT doc_id, n, rate, a, b, unnest(range((n // {_VAD_FRAME})
                                                   * {_VAD_FRAME})) AS i
        FROM au
    ),
    fr AS (
        SELECT doc_id, ANY_VALUE(rate) AS rate, i // {_VAD_FRAME} AS f,
               CAST(SUM(((a * i + b) % 65536 - 32768)
                        * ((a * i + b) % 65536 - 32768)) AS BIGINT) AS ssq
        FROM sm GROUP BY doc_id, i // {_VAD_FRAME}
    ),
    act AS (
        SELECT doc_id, rate, f,
               CASE WHEN {_VAD_DIV} * ssq < {_VAD_RHS} THEN 0 ELSE 1 END AS a
        FROM fr
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(SUM(a) AS BIGINT) AS n_active,
           CAST(COALESCE(MIN(CASE WHEN a = 1 THEN f END), -1) AS BIGINT)
               AS first_active,
           CAST(COALESCE(MAX(CASE WHEN a = 1 THEN f END), -1) AS BIGINT)
               AS last_active,
           CAST(SUM(a) * {_VAD_FRAME} * 1000 // ANY_VALUE(rate) AS BIGINT)
               AS active_ms,
           ROUND(CAST(SUM(a) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
               AS active_ratio
    FROM act GROUP BY doc_id
    """


@query("x5_silence_gate", _SILENCE_ORACLE)
def x5_silence_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-5 (r10): SILENCE GATING / VAD-STYLE TRIM — the first pass of
    every audio-curation pipeline: frame the PCM stream (256-sample
    frames, full frames only), gate each frame on energy, and report the
    active-frame census plus the trim offsets (first/last active frame,
    −1 when the whole asset is silence) and the retained duration. What
    a speech-data pipeline runs before transcription to drop dead air —
    the audio twin of the X-4 quality gates.

    Like its siblings the decode is REAL: genuine RIFF/PCM bytes are
    encoded on the executors and the features computed from the parsed
    byte stream; the oracle predicts every value CLOSED-FORM from the
    integer sawtooth, so a gate that misframes, misreads sample width,
    or is off-by-one on the frame boundary hash-mismatches. The
    silence test is ALL-INTEGER (48·Σs² < 256·65536², exact BIGINT — no
    float enters until the terminal ratio), so there is no
    aggregation-order ambiguity anywhere.

    Production swap: the same mapInPandas signature over
    soundfile/webrtcvad. Scale shape: one fused Arrow pass, blobs never
    shuffle, output is 7 scalars per asset."""
    import numpy as np
    import pandas as pd

    media = media_table(spark, sf_dir)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = pdf[pdf["mime"] == "audio/wav"]
            rows = []
            for doc_id, bts in zip(out["doc_id"], out["bytes"]):
                d = hashlib.sha256(bts).digest()
                n = 500 + (d[0] * 256 + d[1]) % 2000
                rate = 8000 + 1000 * (d[2] % 5)
                payload = encode_wav(n, rate, 1 + d[3], d[4] * 256 + d[5])
                (data_len,) = struct.unpack_from("<I", payload, 40)
                s = np.frombuffer(
                    payload, dtype="<i2", count=data_len // 2, offset=44
                ).astype(np.int64)
                nf = len(s) // _VAD_FRAME
                fr = s[: nf * _VAD_FRAME].reshape(nf, _VAD_FRAME)
                ssq = (fr * fr).sum(axis=1)
                active = _VAD_DIV * ssq >= _VAD_RHS
                idx = np.nonzero(active)[0]
                n_act = int(active.sum())
                rows.append(
                    (
                        doc_id,
                        nf,
                        n_act,
                        int(idx[0]) if len(idx) else -1,
                        int(idx[-1]) if len(idx) else -1,
                        n_act * _VAD_FRAME * 1000 // rate,
                        math.floor(n_act / nf * 1e6 + 0.5) / 1e6,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames", "n_active", "first_active",
                    "last_active", "active_ms", "active_ratio",
                ],
            )

    return media.mapInPandas(
        run,
        "doc_id long, n_frames long, n_active long, first_active long, "
        "last_active long, active_ms long, active_ratio double",
    )


# ---------------------------------------------------------------------------
# X-5 (r10): luma histogram + contrast over the real BMP pixel stream
# ---------------------------------------------------------------------------

#: luma proxy t = R+G+B ∈ 0..765; 4 exposure bins of width 192
#: (t//192 ∈ {0,1,2,3} exactly — 4·192 = 768 ≥ 766)
_LUMA_BIN = 192

_HISTOGRAM_ORACLE = f"""
    WITH {_MEDIA_CTE},
    img AS (
        SELECT doc_id,
               {_BMP_W} AS w, {_BMP_H} AS h,
               {_BMP_S0} AS s0, {_BMP_S1} AS s1, {_BMP_S2} AS s2
        FROM m WHERE mime = 'image/png'
    ),
    px AS (
        SELECT doc_id, w, h,
               ((7 * (i % w) + 13 * (i // w) + s0) % 256
                + (3 * (i % w) + 5 * (i // w) + s1) % 256
                + (11 * (i % w) + 17 * (i // w) + s2) % 256) AS t
        FROM (SELECT doc_id, w, h, s0, s1, s2, unnest(range(w * h)) AS i
              FROM img)
    ),
    ag AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(t) AS BIGINT) AS s1,
               CAST(SUM(t * t) AS BIGINT) AS s2,
               CAST(SUM(CASE WHEN t // {_LUMA_BIN} = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS b0,
               CAST(SUM(CASE WHEN t // {_LUMA_BIN} = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS b1,
               CAST(SUM(CASE WHEN t // {_LUMA_BIN} = 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS b2,
               CAST(SUM(CASE WHEN t // {_LUMA_BIN} = 3 THEN 1 ELSE 0 END)
                    AS BIGINT) AS b3
        FROM px GROUP BY doc_id
    )
    SELECT doc_id, n AS n_px, b0, b1, b2, b3,
           ROUND(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 3.0, 6)
               AS mean_luma,
           ROUND(sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE))
                 / CAST(n AS DOUBLE) / 3.0, 6) AS std_luma
    FROM ag
    """


@query("x5_image_histogram", _HISTOGRAM_ORACLE)
def x5_image_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-5 (r10): LUMA HISTOGRAM + CONTRAST — the exposure audit an
    image-curation pipeline gates on (all-dark / blown-out / flat
    detection) before spending GPU decode on an asset: per image, a
    4-bin histogram over the luma proxy t = R+G+B, its mean, and its
    population std (contrast). Joins against ``x5_aspect_bucket_pack``
    and the pHash family as a quality feature.

    The pixels are parsed from REAL encoded BMP bytes on the executors
    (padded bottom-up BGR rows — same contract as
    ``x5_media_decode_real``); the oracle predicts the histogram
    CLOSED-FORM from the pixel formula. Bin membership, counts, and
    both moment sums are EXACT BIGINT (t ≤ 765, so n·Σt² ≪ 2⁶³ at any
    plausible image size); mean and std are terminal mirrored double
    expressions (÷3 to land in the familiar 0..255 luma range),
    rounded 6dp.

    Scale shape: one fused Arrow pass (encode + parse + histogram per
    batch), blobs never shuffle, output is 8 scalars per asset."""
    import numpy as np
    import pandas as pd

    media = media_table(spark, sf_dir)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = pdf[pdf["mime"] == "image/png"]
            rows = []
            for doc_id, bts in zip(out["doc_id"], out["bytes"]):
                d = hashlib.sha256(bts).digest()
                w, h = 4 + d[0] % 29, 4 + d[1] % 29
                payload = encode_bmp(w, h, (d[3], d[4], d[5]))
                row_len = (3 * w + 3) & ~3
                rowsb = np.frombuffer(payload, dtype=np.uint8, offset=54)
                rowsb = rowsb.reshape(h, row_len)[::-1, : 3 * w]
                bgr = rowsb.reshape(h, w, 3).astype(np.int64)
                t = bgr.sum(axis=2)
                n = w * h
                s1 = int(t.sum())
                s2 = int((t * t).sum())
                bins = np.bincount((t // _LUMA_BIN).ravel(), minlength=4)
                rows.append(
                    (
                        doc_id, n, int(bins[0]), int(bins[1]), int(bins[2]),
                        int(bins[3]),
                        math.floor(s1 / n / 3.0 * 1e6 + 0.5) / 1e6,
                        math.floor(
                            math.sqrt(n * s2 - s1 * s1) / n / 3.0 * 1e6 + 0.5
                        ) / 1e6,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_px", "b0", "b1", "b2", "b3",
                    "mean_luma", "std_luma",
                ],
            )

    return media.mapInPandas(
        run,
        "doc_id long, n_px long, b0 long, b1 long, b2 long, b3 long, "
        "mean_luma double, std_luma double",
    )


# ---------------------------------------------------------------------------
# X-5 (r11): content-addressed blob dedup (exact, digest-keyed)
# ---------------------------------------------------------------------------

#: deterministic duplicate-payload injection (the synthetic-fixture
#: idiom): the fixture's 500 texts are all distinct, so every 50th asset
#: is a re-upload of one of 7 shared payloads — the content-addressed
#: store's actual workload (the same logo/jingle uploaded under many ids).
_BLOB_INJECT_SQL = """
    CASE WHEN doc_id % 50 = 49
         THEN 'shared asset payload ' || CAST(doc_id % 7 AS STRING)
         ELSE text END
"""

_BLOB_DEDUP_ORACLE = f"""
    WITH m AS (
        SELECT doc_id,
               sha256({_BLOB_INJECT_SQL}) AS payload_sha,
               CAST(octet_length(encode({_BLOB_INJECT_SQL})) AS BIGINT)
                   AS n_bytes,
               CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image/png'
                    WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime
        FROM documents
    )
    SELECT payload_sha,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           CAST(MIN(doc_id) AS BIGINT) AS canonical_doc,
           CAST(MIN(n_bytes) AS BIGINT) AS n_bytes,
           CAST((COUNT(*) - 1) * MIN(n_bytes) AS BIGINT) AS wasted_bytes,
           CAST(COUNT(DISTINCT mime) AS BIGINT) AS n_mimes
    FROM m
    GROUP BY payload_sha
    HAVING COUNT(*) >= 2
    """


@query("x5_media_hash_dedup", _BLOB_DEDUP_ORACLE)
def x5_media_hash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-5 (r11): CONTENT-ADDRESSED BLOB DEDUP — the exact-duplicate
    sweep every media lake runs before the expensive perceptual pass
    (``x5_phash_banded_dedup``): blobs keyed by payload digest, one row
    per duplicate group with copy count, canonical asset (lowest
    doc_id), per-copy size, RECLAIMABLE bytes, and the distinct-mime
    count — the same bytes served under different claimed types is a
    classic ingest bug this surfaces for free. This is X-1's exact
    dedup lifted to the binary column: identical pipeline position to a
    blob store's garbage-collection planner (dedup by digest, keep one
    canonical object, repoint the rest).

    Determinism: the digest is computed JVM-side (``sha2(bytes, 256)``)
    and replicated by DuckDB's ``sha256(text)`` over the identical
    payload bytes (the media fixture's blobs ARE UTF-8 text bytes —
    x5_media_meta's established equivalence); counts/sizes are exact
    BIGINTs; canonical choice is MIN (order-free). The fixture's 500
    payloads are all distinct, so duplicates are INJECTED on the
    ``doc_id % 50`` slice (7 shared payloads — shared SQL constant,
    same idiom as x4_unicode_anomaly), giving the report both real
    groups and a pinned expected shape.

    Scale shape: digests are computed in the scan projection so blob
    BYTES never shuffle — only the 64-char digest and two ints reach
    the exchange; one hash aggregate keyed by digest (uniform key, no
    skew). At 100 TB of media this is the cheapest possible full-corpus
    pass: scan + narrow shuffle of digests."""
    docs = spread(read_table(spark, sf_dir, "documents"), "doc_id")
    payload = F.when(
        F.col("doc_id") % 50 == 49,
        F.concat(F.lit("shared asset payload "), (F.col("doc_id") % 7).cast("string")),
    ).otherwise(F.col("text"))
    mime = F.element_at(
        F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return (
        docs.select(
            "doc_id",
            F.sha2(F.encode(payload, "utf-8"), 256).alias("payload_sha"),
            F.length(F.encode(payload, "utf-8")).cast("bigint").alias("n_bytes"),
            mime.alias("mime"),
        )
        .groupBy("payload_sha")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
            F.min("doc_id").cast("bigint").alias("canonical_doc"),
            F.min("n_bytes").cast("bigint").alias("n_bytes"),
            ((F.count(F.lit(1)) - 1) * F.min("n_bytes"))
            .cast("bigint")
            .alias("wasted_bytes"),
            F.count_distinct("mime").cast("bigint").alias("n_mimes"),
        )
        .filter(F.col("n_copies") >= 2)
    )


# ---------------------------------------------------------------------------
# X-5 (r11): ISO-BMFF (MP4) box-tree walk — real container structure parsing
# ---------------------------------------------------------------------------

#: box types whose payload is a sequence of child boxes (ISO/IEC 14496-12
#: §4.2 container boxes we emit or commonly meet)
MP4_CONTAINERS = frozenset({b"moov", b"trak", b"mdia", b"minf", b"stbl", b"udta"})

#: movie/media timescale (ticks per second) written by the synthesizer —
#: the classic QuickTime 600, so duration_ms = ticks * 1000 // 600 is a
#: real conversion the parser must perform, not an identity
MP4_TIMESCALE = 600

#: bytes cut from the file end for the truncated slice (doc_id % 13) —
#: strictly less than the minimum mdat payload (100), so the mdat HEADER
#: always survives and the walker's declared-size-vs-EOF check is what
#: detects the damage
MP4_TRUNC_BYTES = 17


def encode_mp4(ticks: int, width: int, height: int, mdat_n: int,
               with_free: bool, fill: bytes) -> bytes:
    """Serialize a genuine, minimal ISO-BMFF container: ftyp [free] moov
    (mvhd, trak(tkhd, mdia(mdhd))) mdat — every box a big-endian
    [u32 size][4cc type] header with spec-layout v0 payloads (mvhd 100 B,
    tkhd 84 B with 16.16 fixed-point dimensions, mdhd 24 B). No codec is
    needed: container STRUCTURE is pure framing, mdat content is opaque."""
    import struct as s

    def box(t: bytes, payload: bytes) -> bytes:
        return s.pack(">I", 8 + len(payload)) + t + payload

    ftyp = box(b"ftyp", b"isom" + s.pack(">I", 0) + b"isom" + b"mp42")
    free = box(b"free", b"\x00" * 8) if with_free else b""
    mvhd = box(b"mvhd", s.pack(">IIIII", 0, 0, 0, MP4_TIMESCALE, ticks)
               + s.pack(">I", 0x00010000) + s.pack(">HH", 0x0100, 0)
               + b"\x00" * 8 + b"\x00" * 36 + b"\x00" * 24 + s.pack(">I", 2))
    tkhd = box(b"tkhd", s.pack(">IIIIII", 0, 0, 0, 1, 0, ticks) + b"\x00" * 8
               + s.pack(">HHHH", 0, 0, 0x0100, 0) + b"\x00" * 36
               + s.pack(">II", width << 16, height << 16))
    mdhd = box(b"mdhd", s.pack(">IIIII", 0, 0, 0, MP4_TIMESCALE, ticks)
               + s.pack(">HH", 0x55C4, 0))
    mdia = box(b"mdia", mdhd)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    body = (fill * (mdat_n // len(fill) + 1))[:mdat_n]
    return ftyp + free + moov + box(b"mdat", body)


def walk_mp4_boxes(buf: bytes) -> dict:
    """Generic ISO-BMFF walker: iterate [u32 size][4cc] headers, recurse
    into container boxes, pull typed fields from mvhd (timescale,
    duration), tkhd (16.16 width/height), and mdat (declared payload
    size). A box whose declared size overruns its enclosing bound marks
    the file truncated; a surviving mdat header still reports its
    DECLARED payload so the repair/refetch pipeline knows the gap size."""
    out = {"n_boxes": 0, "dur_ms": None, "w": None, "h": None,
           "mdat": None, "truncated": 0}

    def walk(start: int, end: int) -> None:
        pos = start
        while pos + 8 <= end:
            size = int.from_bytes(buf[pos:pos + 4], "big")
            btype = buf[pos + 4:pos + 8]
            if size < 8 or pos + size > end:
                out["truncated"] = 1
                if size >= 8 and btype == b"mdat":
                    out["n_boxes"] += 1
                    out["mdat"] = size - 8
                return
            out["n_boxes"] += 1
            p = pos + 8
            if btype in MP4_CONTAINERS:
                walk(p, pos + size)
            elif btype == b"mvhd":
                ts = int.from_bytes(buf[p + 12:p + 16], "big")
                dur = int.from_bytes(buf[p + 16:p + 20], "big")
                out["dur_ms"] = dur * 1000 // ts
            elif btype == b"tkhd":
                out["w"] = int.from_bytes(buf[p + 76:p + 80], "big") >> 16
                out["h"] = int.from_bytes(buf[p + 80:p + 84], "big") >> 16
            elif btype == b"mdat":
                out["mdat"] = size - 8
            pos += size
        if pos != end:
            # 1..7 leftover bytes — too short for a box header; a clean
            # file ends exactly on a box boundary (property-tested on
            # every prefix cut)
            out["truncated"] = 1

    walk(0, len(buf))
    return out


_MP4_ORACLE = f"""
    WITH {_MEDIA_CTE}
    SELECT doc_id,
           CAST(8 + CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS BIGINT)
               AS n_boxes,
           CAST((({_hexbyte('sha', 0)} * 256 + {_hexbyte('sha', 1)}) * 1000)
                // {MP4_TIMESCALE} AS BIGINT) AS duration_ms,
           CAST(16 * (1 + {_hexbyte('sha', 2)} % 64) AS INT) AS width,
           CAST(16 * (1 + {_hexbyte('sha', 3)} % 64) AS INT) AS height,
           CAST(100 + ({_hexbyte('sha', 4)} * 256 + {_hexbyte('sha', 5)}) % 4000
                AS BIGINT) AS mdat_bytes,
           CAST(CASE WHEN doc_id % 13 = 0 THEN 1 ELSE 0 END AS INT) AS truncated
    FROM m WHERE mime = 'video/mp4'
    """


@query("x5_mp4_box_walk", _MP4_ORACLE)
def x5_mp4_box_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-5 (r11): MP4 CONTAINER STRUCTURE WALK — closes the family's one
    honestly-unverifiable surface: video containers CAN be validated and
    typed without any codec, because ISO-BMFF (ISO/IEC 14496-12) framing
    is pure [size][type] box nesting. Per mp4 blob: synthesize the real
    container (``encode_mp4`` — genuine ftyp/moov/mvhd/trak/tkhd/mdia/
    mdhd/mdat boxes with spec v0 layouts, parameters drawn from the
    payload digest, a ``free`` box on the doc_id % 5 slice, and the
    doc_id % 13 slice truncated mid-mdat), then PARSE it back with the
    generic recursive walker: box count, mvhd duration converted through
    the real timescale-600 arithmetic, tkhd 16.16 fixed-point
    dimensions, declared mdat payload, and the truncation verdict from
    the declared-size-vs-EOF bound check (magic sniffing cannot catch
    this — the damage is 17 bytes INSIDE mdat). The oracle predicts
    every parsed field closed-form from the digest, so a walker that
    misreads any offset, endianness, or the fixed-point shift
    hash-mismatches. Complements ``x5_media_validate`` (which counts
    these rows unverifiable at the codec level) and ``x5_media_metadata``
    (BMP/WAV typed extraction).

    Scale shape: one fused mapInPandas pass — blobs cross Arrow once and
    never shuffle; output is 7 scalars per mp4 row; no joins, no
    aggregates, scan-bound at any corpus size."""
    import pandas as pd

    media = media_table(spark, sf_dir).filter(F.col("mime") == "video/mp4")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf["bytes"]):
                d = hashlib.sha256(b).digest()
                blob = encode_mp4(
                    ticks=d[0] * 256 + d[1],
                    width=16 * (1 + d[2] % 64),
                    height=16 * (1 + d[3] % 64),
                    mdat_n=100 + (d[4] * 256 + d[5]) % 4000,
                    with_free=doc_id % 5 == 0,
                    fill=d,
                )
                if doc_id % 13 == 0:
                    blob = blob[:-MP4_TRUNC_BYTES]
                r = walk_mp4_boxes(blob)
                rows.append((doc_id, r["n_boxes"], r["dur_ms"], r["w"],
                             r["h"], r["mdat"], r["truncated"]))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_boxes", "duration_ms", "width",
                         "height", "mdat_bytes", "truncated"],
            )

    return media.mapInPandas(
        run,
        "doc_id long, n_boxes long, duration_ms long, width int, "
        "height int, mdat_bytes long, truncated int",
    )


# ---------------------------------------------------------------------------
# X-5 (r12): cross-modal dedup report (text clusters × asset digests)
# ---------------------------------------------------------------------------

#: deterministic paired-asset assignment (shared SQL constant, rule 5):
#: the asset attached to a document is content-derived — the sha of its
#: 80-char head (the shared thumbnail/logo/header image near-dup texts
#: typically carry) — except a fixed quarter of uploads (doc_id % 4 = 3)
#: whose asset is doc-unique (fresh photography attached to recycled
#: text). This gives the report all three verdict classes on the fixture
#: (full_dup / partial_asset_reuse / text_only_dup) so the oracle hash
#: exercises every CASE arm.
_XMODAL_ASSET_SQL = """
    CASE WHEN doc_id % 4 = 3
         THEN 'unique asset ' || CAST(doc_id AS STRING)
         ELSE substr(text, 1, 80) END
"""


def _cross_modal_oracle() -> str:
    from etl_active911_spark.operators.clustering import component_ctes

    return f"""
    WITH RECURSIVE {component_ctes()},
    assets AS (
        SELECT doc_id, sha256({_XMODAL_ASSET_SQL}) AS payload_sha
        FROM documents
    ),
    joined AS (
        SELECT a.component, s.payload_sha
        FROM assigned a JOIN assets s USING (doc_id)
    ),
    per_sha AS (
        SELECT component, payload_sha, COUNT(*) AS n_sha
        FROM joined GROUP BY component, payload_sha
    ),
    per_comp AS (
        SELECT component,
               CAST(SUM(n_sha) AS BIGINT) AS n_members,
               CAST(COUNT(*) AS BIGINT) AS n_distinct_assets,
               CAST(SUM(CASE WHEN n_sha >= 2 THEN n_sha ELSE 0 END)
                    AS BIGINT) AS n_asset_reused_members
        FROM per_sha GROUP BY component
    )
    SELECT CAST(component AS BIGINT) AS component,
           n_members, n_distinct_assets, n_asset_reused_members,
           CASE WHEN n_distinct_assets = 1 THEN 'full_dup'
                WHEN n_asset_reused_members >= 2 THEN 'partial_asset_reuse'
                ELSE 'text_only_dup' END AS paired_decision
    FROM per_comp WHERE n_members >= 2
    """


@query("x5_cross_modal_dedup", _cross_modal_oracle())
def x5_cross_modal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-5 (r12, VERDICT r11 item 7): CROSS-MODAL DEDUP REPORT — the
    paired-data decision multimodal training needs: when two documents
    are TEXT near-duplicates, is the attached asset ALSO reused? Per
    text near-dup cluster (the x2 connected components), the member
    count, the distinct content-addressed asset digests among members
    (``x5_media_hash_dedup``'s digest assignment), the number of members
    whose asset is shared with another member, and the verdict the
    pipeline acts on:

    * ``full_dup`` — one asset serves the whole cluster: the (text,
      image) pairs are full duplicates, keep ONE pair;
    * ``partial_asset_reuse`` — some members share an asset: dedup
      text per x2 but audit the asset mapping before dropping pairs;
    * ``text_only_dup`` — every member carries a distinct asset: the
      texts are near-dups but the PAIRS are not — dropping to one text
      would discard unique images.

    Scale shape (the verdict's bar: "over the two existing memos, zero
    new scans"): cluster labels are the memoized
    ``dedup.shared_component_labels`` (no MinHash or star-loop rerun);
    asset digests are a scan-side projection (sha2 in the scan — blob
    bytes never shuffle, the x5_media_hash_dedup shape) over the one
    documents scan this query owns; then two keyed aggregates on
    (component, sha) / component — cluster-sized, ≪ corpus. Asset
    assignment is the ``_XMODAL_ASSET_SQL`` shared constant (all three
    verdict classes fire on the fixture: 14/1/8 at sf0.01)."""
    from etl_active911_spark.operators.dedup import shared_component_labels

    docs = spread(read_table(spark, sf_dir, "documents"), "doc_id")
    payload = F.when(
        F.col("doc_id") % 4 == 3,
        F.concat(F.lit("unique asset "), F.col("doc_id").cast("string")),
    ).otherwise(F.substring("text", 1, 80))
    assets = docs.select(
        "doc_id", F.sha2(F.encode(payload, "utf-8"), 256).alias("payload_sha")
    )
    comp = shared_component_labels(spark, sf_dir)
    joined = assets.join(comp, "doc_id", "left").select(
        F.coalesce("component", F.col("doc_id")).alias("component"),
        "payload_sha",
    )
    per_sha = joined.groupBy("component", "payload_sha").agg(
        F.count(F.lit(1)).alias("n_sha")
    )
    per_comp = per_sha.groupBy("component").agg(
        F.sum("n_sha").cast("bigint").alias("n_members"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_assets"),
        F.sum(F.when(F.col("n_sha") >= 2, F.col("n_sha")).otherwise(0))
        .cast("bigint")
        .alias("n_asset_reused_members"),
    )
    return per_comp.filter(F.col("n_members") >= 2).select(
        F.col("component").cast("bigint").alias("component"),
        "n_members",
        "n_distinct_assets",
        "n_asset_reused_members",
        F.when(F.col("n_distinct_assets") == 1, "full_dup")
        .when(F.col("n_asset_reused_members") >= 2, "partial_asset_reuse")
        .otherwise("text_only_dup")
        .alias("paired_decision"),
    )


# ---------------------------------------------------------------------------
# X-5k (r12): gain-invariant audio envelope fingerprint — perceptual
# near-dup for audio (the WAV twin of x5_phash_banded_dedup)
# ---------------------------------------------------------------------------

#: envelope frame length in samples (fixed-rate fixture: 8 kHz mono)
ENV_FRAME = 250
#: quantization levels per frame (3 bits)
ENV_LEVELS = 8

# Fixture injection (a function of doc_id, identical in both engines):
# audio assets (doc_id % 3 = 1) come in CONTENT groups g = doc_id % 7 —
# same waveform shape — replicated at a per-copy GAIN in {1, 2, 4}
# (re-mastered / volume-normalized variants: byte-DIFFERENT payloads the
# digest dedup x5_media_hash_dedup structurally cannot collapse).
_ENV_G = "CAST(doc_id % 7 AS BIGINT)"
# gain index rides doc_id // 21, NOT doc_id // 7: with audio doc_ids
# ≡ 1 (mod 3) and g = doc_id % 7, CRT fixes doc_id mod 21 per group, so
# (doc_id // 7) % 3 = (doc_id % 21) // 7 would be CONSTANT per group —
# every group would carry exactly one gain and the invariance would be
# vacuous (caught by tests/test_audio_envelope.py).
_ENV_GAIN = "(CASE CAST((doc_id // 21) % 3 AS INT) WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END)"
_ENV_N = "(1000 + 150 * (doc_id % 7))"

_AUDIO_ENVELOPE_ORACLE = f"""
    WITH au AS (
        SELECT doc_id, {_ENV_G} AS g, {_ENV_GAIN} AS gain, {_ENV_N} AS n,
               (3 + 11 * (doc_id % 7)) AS a, (1000 + 97 * (doc_id % 7)) AS b
        FROM documents WHERE doc_id % 3 = 1
    ),
    sm AS (
        SELECT doc_id, g, gain, a, b, n // {ENV_FRAME} AS m,
               unnest(range(({ENV_FRAME}) * (n // {ENV_FRAME}))) AS i
        FROM au
    ),
    sv AS (
        SELECT doc_id, g, gain, m, i // {ENV_FRAME} AS f,
               ((a * i + b) % 3276 - 1638)
                   * (1 + (g + (i // {ENV_FRAME}) * (i // {ENV_FRAME})) % 5)
                   * gain AS s
        FROM sm
    ),
    fr AS (
        SELECT doc_id, ANY_VALUE(g) AS g, ANY_VALUE(gain) AS gain,
               ANY_VALUE(m) AS m, f, SUM(s * s) AS e
        FROM sv GROUP BY doc_id, f
    ),
    qz AS (
        SELECT doc_id, g, gain, m, f,
               LEAST(({ENV_LEVELS} * e) // MAX(e) OVER (PARTITION BY doc_id), {ENV_LEVELS - 1}) AS q
        FROM fr
    ),
    fp AS (
        SELECT doc_id, ANY_VALUE(g) AS g, ANY_VALUE(gain) AS gain,
               CAST(ANY_VALUE(m) AS BIGINT) AS n_frames,
               CAST(SUM(q * CAST(power(2, 3 * f) AS BIGINT)) AS BIGINT) AS fingerprint_code
        FROM qz GROUP BY doc_id
    )
    SELECT n_frames, fingerprint_code,
           CAST(COUNT(*) AS BIGINT) AS n_assets,
           CAST(COUNT(DISTINCT g * 10 + gain) AS BIGINT) AS n_byte_classes,
           CAST(MIN(doc_id) AS BIGINT) AS rep_doc
    FROM fp
    GROUP BY n_frames, fingerprint_code
    HAVING COUNT(*) >= 2
    """


def audio_envelope_rows(media: DataFrame) -> DataFrame:
    """(doc_id, payload_sha, n_frames, fingerprint_code) per audio asset:
    REAL WAV bytes are encoded on the executors (fixture waveform groups
    at per-copy gains), then decoded back OUT of the byte stream —
    RIFF header walk, little-endian int16 samples, the ``decode_wav``
    discipline — and fingerprinted: per-frame energy E_f = Σ s², peak-
    normalized 3-bit quantization q_f = min(8·E_f // max E, 7), packed
    little-endian into one int64. Quantizing the RATIO E_f / max E makes
    the code exactly gain-invariant (⌊8·g²E_f / g²E_max⌋ = ⌊8·E_f /
    E_max⌋ for integer g — floors of equal rationals), so re-mastered
    copies collide while different waveforms do not. All arithmetic is
    exact int64 (rule 26a structurally absent); one fused Arrow pass,
    blob bytes never leave the executor."""
    import numpy as np
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {"doc_id": [], "payload_sha": [], "n_frames": [], "fingerprint_code": []}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                g = doc_id % 7
                gain = (1, 2, 4)[(doc_id // 21) % 3]
                n = 1000 + 150 * g
                a, b = 3 + 11 * g, 1000 + 97 * g
                i = np.arange(n, dtype=np.int64)
                f = i // ENV_FRAME
                w = 1 + (g + f * f) % 5
                s = (((a * i + b) % 3276 - 1638) * w * gain).astype("<i2")
                data = s.tobytes()
                wav = (
                    b"RIFF"
                    + struct.pack("<I", 36 + len(data))
                    + b"WAVE"
                    + b"fmt "
                    + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
                    + b"data"
                    + struct.pack("<I", len(data))
                    + data
                )
                # decode from the BYTES (not the local array): header walk
                (data_len,) = struct.unpack_from("<I", wav, 40)
                dec = np.frombuffer(wav, dtype="<i2", count=data_len // 2, offset=44).astype(np.int64)
                m = len(dec) // ENV_FRAME
                e = (dec[: m * ENV_FRAME] ** 2).reshape(m, ENV_FRAME).sum(axis=1)
                q = np.minimum(ENV_LEVELS * e // e.max(), ENV_LEVELS - 1)
                code = int((q << (3 * np.arange(m, dtype=np.int64))).sum())
                out["doc_id"].append(doc_id)
                out["payload_sha"].append(hashlib.sha256(wav).hexdigest())
                out["n_frames"].append(m)
                out["fingerprint_code"].append(code)
            yield pd.DataFrame(out)

    audio = media.filter(F.col("mime") == "audio/wav").select("doc_id")
    return audio.mapInPandas(
        run, "doc_id long, payload_sha string, n_frames long, fingerprint_code long"
    )


@query("x5_audio_envelope_dedup", _AUDIO_ENVELOPE_ORACLE)
def x5_audio_envelope_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-5 (r12): PERCEPTUAL AUDIO NEAR-DUP — the audio twin of the image
    family's ``x5_phash_banded_dedup``: every WAV asset is reduced to a
    gain-invariant energy-envelope fingerprint (``audio_envelope_rows``)
    and deduplicated at fingerprint grain. Clusters where ``n_assets >
    n_byte_classes`` hold byte-IDENTICAL copies (digest dedup catches
    those too); clusters where ``n_byte_classes ≥ 2`` are the perceptual
    win — re-mastered (gain-scaled) variants with DISTINCT payload
    digests that only this fingerprint can collapse. The oracle
    re-derives every sample, frame energy, quantized level, and packed
    code closed-form from the injected integer waveform, so a decoder
    that misreads the header, endianness, frame split, or quantization
    hash-mismatches.

    Spark-side ``n_byte_classes`` counts DATA-derived payload digests;
    the oracle counts injected (waveform, gain) classes — equal because
    the encoding is injective (different groups ⇒ different byte
    lengths; same group, different gain ⇒ different samples), which the
    crafted test pins.

    Scale shape: one fused Arrow pass per asset (encode → decode →
    fingerprint), then ONE hash aggregate keyed by the 2-int fingerprint
    class; blob bytes never shuffle — only (int64, digest) rows. No pair
    explosion anywhere (fingerprint equality is the candidate rule), so
    no hot-bucket cap is needed."""
    rows = audio_envelope_rows(media_table(spark, sf_dir))
    return (
        rows.groupBy("n_frames", "fingerprint_code")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_assets"),
            F.countDistinct("payload_sha").cast("bigint").alias("n_byte_classes"),
            F.min("doc_id").cast("bigint").alias("rep_doc"),
        )
        .filter(F.col("n_assets") >= 2)
        .select("n_frames", "fingerprint_code", "n_assets", "n_byte_classes", "rep_doc")
    )


# ---------------------------------------------------------------------------
# X-5l (r12): video near-dup via frame-hash overlap — completes the
# perceptual-dedup modality trio (image pHash / audio envelope / video)
# ---------------------------------------------------------------------------

#: minimum frame-set Jaccard (micro-units) for a near-dup verdict
VIDEO_JAC_MIN_MICRO = 500_000
#: flood cap on classes sharing one frame hash (3 by construction here)
VIDEO_MAX_BUCKET = 64

# Fixture injection (a function of doc_id, identical in both engines):
# video assets (doc_id % 3 = 2) come in CONTENT groups g = doc_id % 5,
# each group published as three EDITS (variant rides doc_id // 15 — the
# audio gate's CRT lesson: doc_id mod 15 is fixed per (mod-3, mod-5)
# class, so any //5 or //3 variant index would be constant per group):
#   e=0 full cut      — shared frames j ∈ 0..11
#   e=1 trimmed tail  — shared frames j ∈ 0..9   (Jaccard vs e=0: 10/12)
#   e=2 re-edit       — shared j ∈ 2..11 + 2 unique title frames
# so within a group every edit pair overlaps ≥ 8/16 ≥ τ, and distinct
# groups share nothing.
#
# r13 (VERDICT r12 item 3): the frame hashes are now DERIVED FROM REAL
# DECODED PIXELS, not injected keys. Each video is a genuine ISO-BMFF
# container (``encode_video_mp4`` — the ``encode_mp4`` box layout) whose
# mdat carries real 24-bit BMP frames (``encode_bmp`` pattern, seeds +
# DIMS per frame slot below); the Spark pass walks the boxes to mdat,
# splits the self-delimiting BMP stream, decodes pixels, and computes
# the image leg's aHash (``ahash64``) per frame. Frame dims vary per
# slot (16..24 × 12..18) because aHash over the linear-gradient pattern
# at one fixed size is degenerate — 11 of 70 slots collided at 16×12;
# varying the sampling grid makes all 70 (g, kind, j) hashes distinct
# (pinned in tests/test_video_framehash.py).

#: frame slot → BMP parameters (kind 0 = shared 'vf' frame, 1 = unique
#: re-edit title frame); all small ints so the oracle replays them in SQL
def _video_frame_dims(kind: int, j: int) -> tuple[int, int]:
    return 16 + 2 * ((7 * j + 3 * kind) % 5), 12 + (5 * j + kind) % 7


def _video_frame_seeds(g: int, kind: int, j: int) -> tuple[int, int, int]:
    return (
        (37 * g + 7 * j + 149 * kind) % 256,
        (17 * g + 11 * j + 211 * kind) % 256,
        (13 * g + 5 * j + 97 * kind) % 256,
    )


def _video_frame_plan(e: int) -> list[tuple[int, int]]:
    """(kind, j) frame list for edit variant e — the injection table."""
    if e == 1:
        return [(0, j) for j in range(10)]
    if e == 2:
        return [(1, 0), (1, 1)] + [(0, j) for j in range(2, 12)]
    return [(0, j) for j in range(12)]


def encode_video_mp4(g: int, e: int) -> bytes:
    """A real minimal MP4 whose mdat is the concatenation of the edit's
    BMP frames (1 s per frame at the real timescale-600 arithmetic)."""
    frames = [
        encode_bmp(*_video_frame_dims(k, j), _video_frame_seeds(g, k, j))
        for k, j in _video_frame_plan(e)
    ]
    blob = b"".join(frames)
    return encode_mp4(MP4_TIMESCALE * len(frames), 24, 18, len(blob), False, blob)


def mp4_mdat_payload(buf: bytes) -> bytes:
    """Top-level box walk to the mdat payload slice."""
    pos = 0
    while pos + 8 <= len(buf):
        size = int.from_bytes(buf[pos : pos + 4], "big")
        if size < 8 or pos + size > len(buf):
            raise ValueError("corrupt box header")
        if buf[pos + 4 : pos + 8] == b"mdat":
            return buf[pos + 8 : pos + size]
        pos += size
    raise ValueError("no mdat box")


def split_bmp_frames(body: bytes) -> list[bytes]:
    """Split a concatenated BMP stream on the self-delimiting BM header
    (file size is a u32 LE at offset 2 of each frame)."""
    out, pos = [], 0
    while pos < len(body):
        if body[pos : pos + 2] != b"BM":
            raise ValueError(f"not a BMP frame at offset {pos}")
        (size,) = struct.unpack_from("<I", body, pos + 2)
        if size < 54 or pos + size > len(body):
            raise ValueError("corrupt BMP frame size")
        out.append(body[pos : pos + size])
        pos += size
    return out


# Oracle replica of the per-frame aHash: the image leg's lum chain
# (_PHASH_HASHES_CTES) replayed over the 70 deterministic frame slots —
# dims/seeds are the closed-form functions above, so a decoder that
# misreads any BMP offset, the box walk, or the aHash arithmetic
# hash-mismatches against pixels it never saw.
_VIDEO_FRAMES_CTES = """
    fdim AS (
        SELECT g, kind, j,
               16 + 2 * ((7 * j + 3 * kind) % 5) AS w,
               12 + (5 * j + kind) % 7 AS h
        FROM (SELECT unnest(range(5)) AS g),
             (SELECT unnest(range(2)) AS kind),
             (SELECT unnest(range(12)) AS j)
        WHERE kind = 0 OR j < 2
    ),
    fgrid AS (SELECT g, kind, j, w, h, unnest(range(64)) AS k FROM fdim),
    flum AS (
        SELECT g, kind, j, k,
               299 * ((7 * (((k % 8) * w) // 8) + 13 * (((k // 8) * h) // 8)
                       + (37 * g + 7 * j + 149 * kind) % 256) % 256)
             + 587 * ((3 * (((k % 8) * w) // 8) + 5 * (((k // 8) * h) // 8)
                       + (17 * g + 11 * j + 211 * kind) % 256) % 256)
             + 114 * ((11 * (((k % 8) * w) // 8) + 17 * (((k // 8) * h) // 8)
                       + (13 * g + 5 * j + 97 * kind) % 256) % 256) AS l
        FROM fgrid
    ),
    ftot AS (SELECT g, kind, j, SUM(l) AS t FROM flum GROUP BY 1, 2, 3),
    fbits AS (
        SELECT flum.g, flum.kind, flum.j, flum.k,
               CASE WHEN 64 * flum.l > ftot.t THEN 1 ELSE 0 END AS b
        FROM flum JOIN ftot USING (g, kind, j)
    ),
    fhash AS (
        SELECT g, kind, j,
               CAST(SUM(CASE WHEN k < 32
                             THEN b * (CAST(1 AS BIGINT) << k)
                             ELSE 0 END) AS BIGINT) AS h0,
               CAST(SUM(CASE WHEN k >= 32
                             THEN b * (CAST(1 AS BIGINT) << (k - 32))
                             ELSE 0 END) AS BIGINT) AS h1
        FROM fbits GROUP BY 1, 2, 3
    ),
    fkey AS (
        SELECT g, kind, j,
               CAST(('0x' || substr(md5(
                   CAST(h0 AS STRING) || ':' || CAST(h1 AS STRING)
               ), 1, 15)) AS BIGINT) AS vh
        FROM fhash
    ),
    vids AS (
        SELECT doc_id, doc_id % 5 AS g, (doc_id // 15) % 3 AS e
        FROM documents WHERE doc_id % 3 = 2
    ),
    fh AS (
        SELECT v.doc_id, f.vh
        FROM vids v JOIN fkey f ON f.g = v.g
        WHERE (v.e = 0 AND f.kind = 0)
           OR (v.e = 1 AND f.kind = 0 AND f.j <= 9)
           OR (v.e = 2 AND (f.kind = 1 OR (f.kind = 0 AND f.j >= 2)))
    )
"""

_VIDEO_DEDUP_ORACLE = f"""
    WITH {_VIDEO_FRAMES_CTES},
    sig AS (
        SELECT doc_id,
               md5(string_agg(CAST(vh AS STRING), ',' ORDER BY vh)) AS s,
               CAST(COUNT(*) AS BIGINT) AS n_frames
        FROM fh GROUP BY doc_id
    ),
    cls AS (
        SELECT s, MIN(doc_id) AS rep, CAST(COUNT(*) AS BIGINT) AS n_videos,
               ANY_VALUE(n_frames) AS n_frames
        FROM sig GROUP BY s
    ),
    cfr AS (
        SELECT c.rep, c.n_videos, c.n_frames, f.vh
        FROM cls c JOIN fh f ON f.doc_id = c.rep
    ),
    ok AS (
        SELECT vh FROM cfr GROUP BY vh
        HAVING COUNT(*) BETWEEN 2 AND {VIDEO_MAX_BUCKET}
    ),
    pairs AS (
        SELECT a.rep AS rep_a, b.rep AS rep_b,
               a.n_videos AS n_videos_a, b.n_videos AS n_videos_b,
               a.n_frames AS f_a, b.n_frames AS f_b,
               CAST(COUNT(*) AS BIGINT) AS shared_frames
        FROM cfr a JOIN cfr b ON a.vh = b.vh AND a.rep < b.rep
        JOIN ok ON ok.vh = a.vh
        GROUP BY 1, 2, 3, 4, 5, 6
    ),
    scored AS (
        SELECT rep_a, rep_b, n_videos_a, n_videos_b, shared_frames,
               CAST(f_a + f_b - shared_frames AS BIGINT) AS union_frames,
               CAST((2 * shared_frames * 1000000 + (f_a + f_b - shared_frames))
                    // (2 * (f_a + f_b - shared_frames)) AS BIGINT) AS jac_micro
        FROM pairs
    )
    SELECT rep_a, rep_b, n_videos_a, n_videos_b, shared_frames, union_frames, jac_micro
    FROM scored WHERE jac_micro >= {VIDEO_JAC_MIN_MICRO}
    UNION ALL
    SELECT rep AS rep_a, rep AS rep_b, n_videos AS n_videos_a,
           n_videos AS n_videos_b, n_frames AS shared_frames,
           n_frames AS union_frames, CAST(1000000 AS BIGINT) AS jac_micro
    FROM cls WHERE n_videos >= 2
    """


def video_frame_hashes(media: DataFrame) -> DataFrame:
    """(doc_id, vh) rows: one 60-bit hash per keyframe of each video,
    DERIVED FROM REAL DECODED BYTES (r13, VERDICT r12 item 3): one fused
    Arrow pass synthesizes the edit's genuine MP4 (``encode_video_mp4``),
    walks the box tree to mdat, splits the concatenated BMP frames on
    their self-delimiting headers, decodes pixels, and computes the image
    leg's aHash (``ahash64``) per frame; ``token_hash60`` over the
    canonical "h0:h1" string folds the two 32-bit halves into the house
    cross-engine 60-bit key.

    Scale shape: blob bytes are constructed AND consumed inside one
    mapInPandas pass — they never cross a shuffle; the decode runs once
    per distinct (g, e) edit per task (15 edits, ~180 small BMPs — the
    exact-pre-collapse discipline applied at decode time; a production
    pipeline keys the same cache by payload digest), and the per-video
    fan-out is a vectorized pandas merge, no Python row loop. Output
    rows are (int64, int64) pairs, ≤12 per video."""
    import pandas as pd

    vids = media.filter(F.col("mime") == "video/mp4").select(
        "doc_id",
        (F.col("doc_id") % 5).alias("g"),
        (F.expr("doc_id div 15") % 3).alias("e"),
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        # decode the 15 distinct (g, e) edits ONCE per task (~180 small
        # BMPs), then fan out to videos with a vectorized merge — the
        # per-video work is C-speed, no Python row loop. The 60-bit key
        # is computed HERE (int(md5[:15], 16) ≡ token_hash60, the
        # rule-10 property-tested identity) over the 70 distinct frames
        # only, so the Arrow boundary carries int64s, not strings, and
        # no JVM md5/conv pass runs over the ~12x-per-video fan-out.
        rows = []
        for g in range(5):
            for e in range(3):
                frames = split_bmp_frames(mp4_mdat_payload(encode_video_mp4(g, e)))
                for fb in frames:
                    _w, _h, h0, h1 = ahash64(fb)
                    key = hashlib.md5(f"{h0}:{h1}".encode()).hexdigest()
                    rows.append((g, e, int(key[:15], 16)))
        frame_df = pd.DataFrame(rows, columns=["g", "e", "vh"])
        for pdf in batches:
            out = pdf[["doc_id", "g", "e"]].merge(frame_df, on=["g", "e"])
            yield out[["doc_id", "vh"]]

    return vids.mapInPandas(run, "doc_id long, vh long")


@query("x5_video_framehash_dedup", _VIDEO_DEDUP_ORACLE)
def x5_video_framehash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-5 (r12): VIDEO NEAR-DUP via keyframe-hash overlap — the video
    member of the perceptual-dedup trio (image ``x5_phash_banded_dedup``,
    audio ``x5_audio_envelope_dedup``): a video is its SET of sampled
    frame hashes; re-edited copies (trimmed, re-titled) share most
    frames, so frame-set Jaccard ≥ τ is the dedup verdict — the standard
    keyframe-fingerprint design (the X-2 shingle/MinHash idea lifted to
    frames, evaluated EXACTLY here because frame sets are bounded).
    Since r13 the frame hashes come from REAL DECODED PIXELS: genuine
    MP4 containers whose mdat carries real BMP frames, box-walked,
    split, decoded, and aHashed in one fused Arrow pass
    (``video_frame_hashes``); the oracle replays the aHash closed-form
    per frame slot (VERDICT r12 item 3).

    Shape (all the house dedup disciplines at once): exact pre-collapse
    of byte-identical frame SETS to classes first (an md5 set-signature —
    a million re-uploads are ONE class member); candidate generation is
    join-free bucket-and-explode per frame hash (rule 18) with the flood
    cap; and the bucket co-occurrence COUNT of a class pair *is*
    |A ∩ B|, so candidates and the exact intersection arrive in one
    aggregate — no second verification pass. Jaccard in rule-26 half-up
    micro-units (non-negative, so Spark div == DuckDB //). Self-rows
    report exact-dup classes (rep_a = rep_b, jac 1.0), the phash-family
    convention.

    Scale shape: shuffles carry (doc_id, int64) frame rows and class-
    grain structs only; the pair explosion is bounded by the bucket cap;
    one aggregate per stage, no join operators in the candidate path."""
    fh = video_frame_hashes(media_table(spark, sf_dir))
    per_video = fh.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("vh")).alias("fs")
    )
    # group by the sorted frame array ITSELF: a var-width GROUPING KEY
    # stays in HashAggregate (it's var-width aggregation BUFFERS that
    # fall to SortAggregate, rule 30 — carrying fs via first(fs) did);
    # the oracle's md5 set-signature partitions rows identically.
    # scoped_persist: two consumers (exact self-rows + the bucket path)
    # — rule 17, unconditional reuse even under exchange.reuse=false
    from etl_active911_spark.plans.cache import scoped_persist

    classes = scoped_persist(
        "x5_video_framehash.classes",
        per_video.groupBy("fs").agg(
            F.min("doc_id").alias("rep"),
            F.count(F.lit(1)).cast("bigint").alias("n_videos"),
        ),
    )
    exact = classes.filter(F.col("n_videos") >= 2).select(
        F.col("rep").alias("rep_a"),
        F.col("rep").alias("rep_b"),
        F.col("n_videos").alias("n_videos_a"),
        F.col("n_videos").alias("n_videos_b"),
        F.size("fs").cast("bigint").alias("shared_frames"),
        F.size("fs").cast("bigint").alias("union_frames"),
        F.lit(1_000_000).cast("bigint").alias("jac_micro"),
    )
    cfr = classes.select(
        F.struct(
            "rep", "n_videos", F.size("fs").cast("bigint").alias("n_frames")
        ).alias("m"),
        F.explode("fs").alias("vh"),
    )
    buckets = (
        cfr.groupBy("vh")
        .agg(F.collect_list("m").alias("ms"))
        .filter(F.size("ms").between(2, VIDEO_MAX_BUCKET))
        .select("ms")
    )
    co = (
        buckets.select(F.explode("ms").alias("a"), "ms")
        .select("a", F.explode("ms").alias("b"))
        .filter(F.col("a.rep") < F.col("b.rep"))
        .groupBy(
            F.col("a.rep").alias("rep_a"),
            F.col("b.rep").alias("rep_b"),
            F.col("a.n_videos").alias("n_videos_a"),
            F.col("b.n_videos").alias("n_videos_b"),
            F.col("a.n_frames").alias("f_a"),
            F.col("b.n_frames").alias("f_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_frames"))
    )
    un = F.col("f_a") + F.col("f_b") - F.col("shared_frames")
    near = co.select(
        "rep_a",
        "rep_b",
        "n_videos_a",
        "n_videos_b",
        "shared_frames",
        un.cast("bigint").alias("union_frames"),
        F.expr(
            "CAST((2 * shared_frames * 1000000 + (f_a + f_b - shared_frames))"
            " div (2 * (f_a + f_b - shared_frames)) AS BIGINT)"
        ).alias("jac_micro"),
    ).filter(F.col("jac_micro") >= VIDEO_JAC_MIN_MICRO)
    return near.unionByName(exact)


# ---------------------------------------------------------------------------
# X-5m (r12): geotag privacy audit — EXIF GPS vs sensitive geofences
# (the multimodal × geo privacy composition)
# ---------------------------------------------------------------------------

#: dispatch zones whose contents must not ship with location metadata
SENSITIVE_FENCES = ("f2", "f6")

_GEOTAG_ORACLE = """
    WITH g AS (
        SELECT doc_id,
               CAST(3900 + doc_id % 200 AS BIGINT) AS lat_c,
               CAST(-10600 + doc_id % 150 AS BIGINT) AS lon_c
        FROM documents WHERE doc_id % 3 = 0 AND doc_id % 4 <> 3
    ),
    fences AS ({fences}),
    fc AS (
        SELECT fence_id,
               CAST(lat_min * 100 AS BIGINT) AS lat_min_c,
               CAST(lat_max * 100 AS BIGINT) AS lat_max_c,
               CAST(lon_min * 100 AS BIGINT) AS lon_min_c,
               CAST(lon_max * 100 AS BIGINT) AS lon_max_c
        FROM fences
    ),
    j AS (
        SELECT g.doc_id, g.lat_c, g.lon_c, f.fence_id,
               CASE WHEN f.fence_id IN ({sens}) THEN 1 ELSE 0 END AS sens
        FROM g LEFT JOIN fc f
          ON g.lat_c >= f.lat_min_c AND g.lat_c < f.lat_max_c
         AND g.lon_c >= f.lon_min_c AND g.lon_c < f.lon_max_c
    )
    SELECT doc_id, lat_c, lon_c,
           CAST(COUNT(fence_id) AS BIGINT) AS n_fences,
           CAST(COALESCE(SUM(sens), 0) AS BIGINT) AS n_sensitive,
           (COALESCE(SUM(sens), 0) >= 1) AS scrub_location
    FROM j GROUP BY doc_id, lat_c, lon_c
    """


def geotag_rows(media: DataFrame) -> DataFrame:
    """(doc_id, lat_c, lon_c) for every GEOTAGGED image asset: an
    EXIF-style GPS blob (fixed-point centi-degrees at a documented byte
    offset) is written and parsed back OUT of the bytes — the
    ``x5_media_metadata`` discipline, so an extractor that misreads
    offset/endianness/signedness diverges. Untagged assets
    (doc_id % 4 = 3) emit nothing. Coordinates stay EXACT INTEGERS
    end-to-end (centi-degrees), so containment has no float path at
    all."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {"doc_id": [], "lat_c": [], "lon_c": []}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                if doc_id % 4 == 3:
                    continue  # no GPS tag on this asset
                blob = b"GPS1" + struct.pack(
                    "<ii", 3900 + doc_id % 200, -10600 + doc_id % 150
                )
                lat_c, lon_c = struct.unpack_from("<ii", blob, 4)
                out["doc_id"].append(doc_id)
                out["lat_c"].append(lat_c)
                out["lon_c"].append(lon_c)
            yield pd.DataFrame(out)

    imgs = media.filter(F.col("mime") == "image/png").select("doc_id")
    return imgs.mapInPandas(run, "doc_id long, lat_c long, lon_c long")


def _geotag_oracle() -> str:
    from etl_active911_spark.operators.geo import _FENCES_SQL

    return _GEOTAG_ORACLE.format(
        fences=_FENCES_SQL, sens=", ".join(f"'{f}'" for f in SENSITIVE_FENCES)
    )


@query("x5_geotag_privacy_audit", _geotag_oracle())
def x5_geotag_privacy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-5 (r12): GEOTAG PRIVACY AUDIT — the multimodal × geo privacy
    composition a release pipeline owes its geotagged assets: every
    image carrying EXIF GPS is tested against the dispatch-zone fence
    table (the ``x7_geofence_assignment`` fences, integer centi-degree
    bounds — quarter-degree fence edges ×100 are IEEE-exact), and any
    asset inside a SENSITIVE zone is flagged ``scrub_location`` (strip
    the GPS tag before release; publishing precise coordinates of a
    sensitive site is the multimodal sibling of the text PII gate).
    Per-asset: containing-fence count, sensitive-fence count, verdict.
    Zones overlap (an asset counts in each); tagged assets outside all
    fences report zero (LEFT containment join).

    Scale shape: one Arrow pass parses GPS out of the bytes (blobs never
    shuffle); the containment join is a bounded BNLJ against the
    broadcast 6-row fence side (the x7_geofence_assignment note: at
    thousands of fences, grid-bucket equi-join replaces it); the roll-up
    keys on doc_id. Everything after the parse is exact int64."""
    g = geotag_rows(media_table(spark, sf_dir))
    from etl_active911_spark.operators.geo import _FENCES_SQL

    fences = spark.sql(_FENCES_SQL).select(
        "fence_id",
        (F.col("lat_min") * 100).cast("bigint").alias("lat_min_c"),
        (F.col("lat_max") * 100).cast("bigint").alias("lat_max_c"),
        (F.col("lon_min") * 100).cast("bigint").alias("lon_min_c"),
        (F.col("lon_max") * 100).cast("bigint").alias("lon_max_c"),
    )
    contained = (
        (F.col("lat_c") >= F.col("lat_min_c"))
        & (F.col("lat_c") < F.col("lat_max_c"))
        & (F.col("lon_c") >= F.col("lon_min_c"))
        & (F.col("lon_c") < F.col("lon_max_c"))
    )
    sens = (
        F.when(F.col("fence_id").isin(*SENSITIVE_FENCES), F.lit(1))
        .otherwise(F.lit(0))
    )
    j = g.join(F.broadcast(fences), on=contained, how="left").select(
        "doc_id", "lat_c", "lon_c", "fence_id", sens.alias("sens")
    )
    return j.groupBy("doc_id", "lat_c", "lon_c").agg(
        F.count("fence_id").cast("bigint").alias("n_fences"),
        F.coalesce(F.sum("sens"), F.lit(0)).cast("bigint").alias("n_sensitive"),
        (F.coalesce(F.sum("sens"), F.lit(0)) >= 1).alias("scrub_location"),
    )
