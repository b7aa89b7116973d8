"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schemas, Arrow batch shapes, partition-count
preservation, mapInPandas iterator contracts) is real and tested; the
actual media decode is STUBBED — this container ships no image/audio
libraries.  ``decode_images(..., fake=True)`` substitutes a deterministic
content-hash "decode" so the pipeline shape is exercised end to end;
``fake=False`` raises NotImplementedError at task level by design.

Design notes for 100 TB of media:
* binary payloads stay columnar (parquet binary) — never collect, never
  base64 through the driver,
* decode runs in mapInPandas with small Arrow batches
  (spark.sql.execution.arrow.maxRecordsPerBatch) so a batch of images
  bounds executor memory,
* feature vectors come back as array<float> ready for the similarity
  operators (cosine_topk / rhp_ann_topk).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.StringType(), True),  # JSON sidecar
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministically synthesize a media table from documents (payload =
    utf-8 bytes of the text; stands in for crawled image bytes)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("image/png").alias("mime"),
        F.col("text").cast("binary").alias("payload"),
        F.to_json(F.struct(F.col("n_chars").alias("orig_len"))).alias("meta"),
    )


def _fake_decode(payload: bytes | None, dim: int) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in decode: dimensions + features from the
    content digest.  Pure function of bytes -> reproducible tests."""
    if payload is None:
        return 0, 0, 0, [0.0] * dim
    d = hashlib.sha256(payload).digest()
    width = 64 + d[0]
    height = 64 + d[1]
    feats = [((d[i % 32] / 255.0) * 2.0 - 1.0) for i in range(dim)]
    return len(payload), width, height, feats


def decode_images(media: DataFrame, dim: int = 16, fake: bool = True) -> DataFrame:
    """mapInPandas decode/feature-extract.  Batch shape: the function
    receives an ITERATOR of pandas DataFrames (one per Arrow batch) and
    yields result batches — constant memory regardless of partition size.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image decode requires PIL/libvips — not available "
                    "in this container; pass fake=True for the deterministic "
                    "stand-in"
                )
            rows = [_fake_decode(p, dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "n_bytes": [r[0] for r in rows],
                    "width": [r[1] for r in rows],
                    "height": [r[2] for r in rows],
                    "features": [r[3] for r in rows],
                }
            )

    return media.mapInPandas(fn, IMAGE_FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def resize_images(
    media: DataFrame, width: int = 32, height: int = 32, fake: bool = True
) -> DataFrame:
    """mapInPandas image resize plumbing.  Real path would decode + resample
    via PIL/libvips (not in this container — raises); the fake path emits a
    deterministic pseudo-thumbnail (content digest tiled to width·height
    bytes) so batch shape, schema, and payload-size discipline are
    exercised: output payloads are bounded by the target dimensions
    regardless of input size — the property that matters for shuffle
    planning downstream."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image resize requires PIL/libvips — not available "
                    "in this container; pass fake=True for the deterministic "
                    "stand-in"
                )
            out = []
            for p in pdf["payload"]:
                if p is None:
                    out.append(None)
                    continue
                d = hashlib.sha256(p).digest()
                need = width * height
                out.append((d * (need // len(d) + 1))[:need])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                    "payload": out,
                }
            )

    return media.where(F.col("kind") == "image").mapInPandas(fn, RESIZED_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("mfcc", T.ArrayType(T.FloatType()), True),
    ]
)


def decode_audio(
    media: DataFrame, n_mfcc: int = 13, bytes_per_ms: int = 16, fake: bool = True
) -> DataFrame:
    """mapInPandas audio decode/feature plumbing (the audio member of the
    image/audio/video trio).  Real path would decode PCM + compute MFCCs
    via soundfile/librosa (not in this container — raises); the fake path
    derives duration from payload size and a deterministic digest-based
    MFCC vector, so schema, Arrow batch shape and array<float> handoff to
    the similarity operators are real and tested."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real audio decode requires soundfile/librosa — not "
                    "available in this container; pass fake=True for the "
                    "deterministic stand-in"
                )
            rows = []
            for p in pdf["payload"]:
                if p is None:
                    rows.append((0, 0, [0.0] * n_mfcc))
                    continue
                d = hashlib.sha256(p).digest()
                rows.append(
                    (
                        len(p),
                        len(p) // bytes_per_ms,
                        [((d[i % 32] / 255.0) * 2.0 - 1.0) for i in range(n_mfcc)],
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "n_bytes": [r[0] for r in rows],
                    "duration_ms": [r[1] for r in rows],
                    "mfcc": [r[2] for r in rows],
                }
            )

    return media.where(F.col("kind") == "audio").mapInPandas(fn, AUDIO_FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    index (the decode itself is the same stub).  Emits (media_id,
    frame_idx, payload) — the explode pattern a real ffmpeg-backed UDF
    would follow."""
    n_frames = F.greatest(
        (F.length(F.col("payload")) / 1000).cast("int"), F.lit(1)
    )
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
            ).alias("frame_idx"),
            "payload",
        )
    )
