"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Media libraries (PIL/ffmpeg/torchaudio) are not available in this
container, so the *decode* steps are stubbed behind clearly-marked seams —
but everything Spark-side is real and tested: schemas, Arrow batch shapes,
``mapInPandas`` signatures, partitioning.  Swapping a stub for a real
decoder changes one inner function, not the plan.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

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
    """STUB: real implementation would be PIL.Image.open(BytesIO(payload)).
    Deterministic fake: derives a pseudo-pixel array from the payload hash
    so downstream shapes/values are stable and testable."""
    raise NotImplementedError("image decoding requires PIL; use fake_feature path")


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


def synthesize_media(spark, n: int = 100, kind: str = "image") -> DataFrame:
    """Deterministic fake media table for tests: payload = repeated md5
    bytes, metadata consistent with ``kind``."""
    rows = []
    for i in range(n):
        payload = hashlib.md5(f"media-{i}".encode()).digest() * 4
        if kind == "image":
            meta = (64, 64, None, None, "image/fake")
        elif kind == "video":
            # deterministic per-media duration so frame sampling is testable
            meta = (320, 240, None, 1_000 + (i % 7) * 700, "video/fake")
        else:
            meta = (None, None, 16000, 2_000, "audio/fake")
        rows.append((i, kind, bytearray(payload), meta))
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
