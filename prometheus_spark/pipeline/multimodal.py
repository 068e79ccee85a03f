"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The *header decode* step is REAL: stdlib-only container parsing for
PNG (IHDR dimensions), GIF (logical screen), JPEG (SOF frame), and
WAV (fmt/data chunks → sample rate + duration), over genuine binary
payloads produced by the stdlib writers in :func:`synthesize_media` —
so the decode path is hash-verifiable end-to-end.  Only the
*pixel/sample-level* decode (full image raster, audio PCM decode,
video frame extraction) is stubbed behind clearly-marked seams —
PIL/ffmpeg are not in this container.  Everything Spark-side is real
and tested: schemas, Arrow batch shapes, ``mapInPandas`` signatures,
partitioning.  Swapping a stub for a real decoder changes one inner
function, not the plan.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("mime", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def _decode_image(payload: bytes, meta) -> "object":
    """STUB: full-raster decode would be PIL.Image.open(BytesIO(payload));
    header-level decode (dimensions, mime, duration) is REAL — see
    :func:`parse_media_header`."""
    raise NotImplementedError("pixel decoding requires PIL; use fake_feature path")


# --------------------------------------------------------------------------
# stdlib media writers — REAL container bytes for tests/synthesis


def encode_png(width: int, height: int, seed: int = 0) -> bytes:
    """A valid 8-bit grayscale PNG (signature + IHDR + IDAT + IEND) with
    deterministic pixel content."""

    def chunk(typ: bytes, data: bytes) -> bytes:
        c = typ + data
        return (
            struct.pack(">I", len(data)) + c
            + struct.pack(">I", zlib.crc32(c) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes((seed + x + y) % 256 for x in range(width))
        for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def encode_wav(sample_rate: int, n_frames: int, seed: int = 0) -> bytes:
    """A valid PCM16 mono WAV (RIFF/fmt /data) with deterministic
    sample content."""
    data = bytes((seed + j) % 256 for j in range(n_frames * 2))
    byte_rate = sample_rate * 2
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, byte_rate, 2, 16)
    riff_size = 4 + (8 + len(fmt)) + (8 + len(data))
    return (
        b"RIFF" + struct.pack("<I", riff_size) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


# --------------------------------------------------------------------------
# stdlib media header parsers — the REAL decode seam


def parse_media_header(payload: Optional[bytes]) -> Optional[dict]:
    """Parse container headers from raw bytes: PNG IHDR, GIF logical
    screen, JPEG SOF frame, WAV fmt/data.  Returns
    {mime, width, height, sample_rate, duration_ms} or None when the
    container is unrecognized/truncated."""
    if not payload:
        return None
    p = bytes(payload)
    try:
        if p[:8] == b"\x89PNG\r\n\x1a\n" and p[12:16] == b"IHDR":
            w, h = struct.unpack(">II", p[16:24])
            return {"mime": "image/png", "width": w, "height": h,
                    "sample_rate": None, "duration_ms": None}
        if p[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", p[6:10])
            return {"mime": "image/gif", "width": w, "height": h,
                    "sample_rate": None, "duration_ms": None}
        if p[:2] == b"\xff\xd8":  # JPEG: walk markers to a SOF frame
            pos = 2
            while pos + 4 <= len(p):
                if p[pos] != 0xFF:
                    break
                marker = p[pos + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    pos += 2
                    continue
                seg_len = struct.unpack(">H", p[pos + 2:pos + 4])[0]
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h, w = struct.unpack(">HH", p[pos + 5:pos + 9])
                    return {"mime": "image/jpeg", "width": w, "height": h,
                            "sample_rate": None, "duration_ms": None}
                pos += 2 + seg_len
            return None
        if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
            pos = 12
            rate = byte_rate = data_len = None
            while pos + 8 <= len(p):
                cid = p[pos:pos + 4]
                sz = struct.unpack("<I", p[pos + 4:pos + 8])[0]
                if cid == b"fmt " and sz >= 16:
                    _fmt, _ch, rate, byte_rate, _ba, _bits = struct.unpack(
                        "<HHIIHH", p[pos + 8:pos + 24]
                    )
                elif cid == b"data":
                    data_len = sz
                pos += 8 + sz + (sz & 1)  # chunks are word-aligned
            if rate is None or byte_rate in (None, 0) or data_len is None:
                return None
            return {"mime": "audio/wav", "width": None, "height": None,
                    "sample_rate": rate,
                    "duration_ms": data_len * 1000 // byte_rate}
    except (struct.error, IndexError):
        return None
    return None


MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("parse_ok", T.BooleanType(), False),
    ]
)


def decode_media_headers(media: DataFrame) -> DataFrame:
    """Arrow-batched header decode over binary payloads — the real
    production shape (payloads stay executor-side; one pass, no
    shuffle).  Unrecognized payloads yield parse_ok=false rows rather
    than dropping (the caller decides quarantine policy)."""
    from prometheus_spark.shipping import ensure_shipped

    ensure_shipped(media.sparkSession)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [parse_media_header(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": [m["mime"] if m else None for m in metas],
                    "width": pd.array(
                        [m["width"] if m else None for m in metas],
                        dtype="Int32",
                    ),
                    "height": pd.array(
                        [m["height"] if m else None for m in metas],
                        dtype="Int32",
                    ),
                    "sample_rate": pd.array(
                        [m["sample_rate"] if m else None for m in metas],
                        dtype="Int32",
                    ),
                    "duration_ms": pd.array(
                        [m["duration_ms"] if m else None for m in metas],
                        dtype="Int64",
                    ),
                    "parse_ok": [m is not None for m in metas],
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, MEDIA_META_SCHEMA
    )


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature: bytes of md5(payload) scaled to
    [0, 1).  Replaces the embed(decode(payload)) composition."""
    digest = hashlib.md5(payload or b"").digest()
    return [b / 256.0 for b in digest[:dim]]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over binary payloads — the real
    Arrow-batched plumbing a production decode would use.  Batch size is
    controlled by spark.sql.execution.arrow.maxRecordsPerBatch; payloads
    never land on the driver."""

    from prometheus_spark.shipping import ensure_shipped

    ensure_shipped(media.sparkSession)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [_fake_feature(p, dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
                    "decode_ok": [p is not None for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def media_dims(i: int) -> tuple[int, int]:
    """Deterministic image dimensions for media_id ``i`` — mirrored by
    the DuckDB oracle so the REAL png parse is hash-verifiable."""
    return 16 + (i % 16), 16 + ((i * 7) % 16)


def media_audio_params(i: int) -> tuple[int, int]:
    """(sample_rate, duration_ms) for media_id ``i`` — oracle-mirrored."""
    return 8000 + (i % 3) * 4000, 500 + (i % 5) * 250


def synthesize_media(spark, n: int = 100, kind: str = "image") -> DataFrame:
    """Deterministic media table: REAL container bytes for image (PNG)
    and audio (WAV) via the stdlib writers; video remains a fake payload
    (no stdlib video muxer) with plan-testable duration metadata."""
    rows = []
    for i in range(n):
        k = kind
        if kind == "mixed":
            k = "image" if i % 2 == 0 else "audio"
        if k == "image":
            w, h = media_dims(i)
            payload = encode_png(w, h, seed=i)
            meta = (w, h, None, None, "image/png")
        elif k == "video":
            payload = hashlib.md5(f"media-{i}".encode()).digest() * 4
            # deterministic per-media duration so frame sampling is testable
            meta = (320, 240, None, 1_000 + (i % 7) * 700, "video/fake")
        else:
            rate, dur_ms = media_audio_params(i)
            payload = encode_wav(rate, rate * dur_ms // 1000, seed=i)
            meta = (None, None, rate, dur_ms, "audio/wav")
        rows.append((i, k, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    timestamp (the decode itself is the stubbed seam).  Shows the explode
    shape: rows = Σ duration/every_ms, partitioned by media_id."""
    n_frames = F.greatest(
        (F.col("meta.duration_ms") / F.lit(every_ms)).cast("int"), F.lit(1)
    )
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"))
        .withColumn("frame_ts_ms", F.col("frame_idx") * F.lit(every_ms))
    )
