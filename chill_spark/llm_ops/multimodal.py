"""Multimodal columns: image/audio/video as opaque binary + typed
metadata.

The Spark-side plumbing is real — schemas, Arrow-batched mapInPandas
transforms, partition-friendly shapes. The codec step is pluggable:
the default ``FakeCodec`` is deterministic (parses our synthetic
header format) because real image/audio libraries aren't in this
container; swap in a real decoder via the ``codec`` argument. Decode
runs inside mapInPandas so bytes never leave the executor.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)

IMAGE_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("mean_intensity", DoubleType(), True),
    ]
)


class Codec:
    """Decoder interface; real implementations wrap PIL/ffmpeg/etc."""

    def decode_image(self, content: bytes) -> dict:  # pragma: no cover
        raise NotImplementedError(
            "real image decoding requires an image library not present "
            "in this environment; use FakeCodec for plumbing tests"
        )


class FakeCodec(Codec):
    """Deterministic stand-in: interprets our synthetic header
    ``IMG:<w>:<h>:<c>:`` followed by raw 'pixel' bytes."""

    def decode_image(self, content: bytes) -> dict:
        try:
            head, _, rest = content.partition(b":")
            if head != b"IMG":
                return {"width": None, "height": None, "channels": None,
                        "mean_intensity": None}
            w, h, c, pixels = rest.split(b":", 3)
            px = pixels or b"\x00"
            return {
                "width": int(w),
                "height": int(h),
                "channels": int(c),
                "mean_intensity": float(sum(px)) / len(px),
            }
        except Exception:
            return {"width": None, "height": None, "channels": None,
                    "mean_intensity": None}


def extract_image_metadata(
    media: DataFrame, codec: Codec | None = None
) -> DataFrame:
    """Decode + feature-extract image rows (Arrow-batched; one pass)."""
    codec = codec or FakeCodec()

    def run(batches):
        for pdf in batches:
            out = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                meta = codec.decode_image(bytes(content or b""))
                out.append({"media_id": media_id, **meta})
            yield pd.DataFrame(
                out, columns=[f.name for f in IMAGE_META_SCHEMA.fields]
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "content")
        .mapInPandas(run, schema=IMAGE_META_SCHEMA)
    )


def frame_sample_plan(
    media: DataFrame, every_n: int = 10, codec: Codec | None = None
) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    index. Frame decode itself is the pluggable codec step; with
    FakeCodec the frame count derives from the synthetic header
    ``VID:<n_frames>:``."""
    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_idx", IntegerType(), False),
        ]
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for media_id, raw in zip(pdf["media_id"], pdf["content"]):
                content = bytes(raw or b"")
                if content.startswith(b"VID:"):
                    try:
                        n = int(content.split(b":", 2)[1])
                    except Exception:
                        n = 0
                    rows.extend(
                        {"media_id": media_id, "frame_idx": i}
                        for i in range(0, n, every_n)
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx"])

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "content")
        .mapInPandas(run, schema=schema)
    )


@dataclass
class MediaStats:
    kind_counts: dict
    total_bytes: int


def media_summary(media: DataFrame) -> DataFrame:
    """Typed-metadata aggregation over the binary column (bytes never
    deserialize): counts + sizes per kind."""
    return (
        media.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce(F.col("n_bytes"), F.length(F.col("content")))).alias(
                "total_bytes"
            ),
        )
        .orderBy("kind")
    )


AUDIO_FEAT_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_samples", LongType(), True),
        StructField("duration_s", DoubleType(), True),
        StructField("rms", DoubleType(), True),
    ]
)

RESIZE_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_pixel_bytes", LongType(), True),
    ]
)

FAKE_SAMPLE_RATE = 16_000


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Audio decode + feature extraction (Arrow-batched mapInPandas).
    FakeCodec semantics: bytes after the ``AUD:`` header are unsigned
    8-bit samples at 16 kHz; features are sample count, duration and
    RMS level. A real codec (soundfile/ffmpeg) drops in behind the
    same schema — the Spark plumbing (binary column in, typed feature
    rows out, bytes never leave the executor) is the part under test."""

    def run(batches):
        import math

        for pdf in batches:
            out = []
            for media_id, raw in zip(pdf["media_id"], pdf["content"]):
                content = bytes(raw or b"")
                if not content.startswith(b"AUD:"):
                    out.append({"media_id": media_id, "n_samples": None,
                                "duration_s": None, "rms": None})
                    continue
                samples = content[4:] or b"\x00"
                n = len(samples)
                out.append({
                    "media_id": media_id,
                    "n_samples": n,
                    "duration_s": n / FAKE_SAMPLE_RATE,
                    "rms": math.sqrt(sum(b * b for b in samples) / n),
                })
            yield pd.DataFrame(
                out, columns=[f.name for f in AUDIO_FEAT_SCHEMA.fields]
            )

    return (
        media.filter(F.col("kind") == "audio")
        .select("media_id", "content")
        .mapInPandas(run, schema=AUDIO_FEAT_SCHEMA)
    )


def resize_images(media: DataFrame, max_side: int) -> DataFrame:
    """Image resize plumbing: scale (w, h) so the longer side is
    ``max_side`` (never upscale) and subsample the fake pixel buffer
    by the area ratio — the metadata arithmetic a real resampler
    would produce, behind the schema a real one would use."""

    def run(batches):
        import math

        for pdf in batches:
            out = []
            for media_id, raw in zip(pdf["media_id"], pdf["content"]):
                content = bytes(raw or b"")
                parts = content.split(b":", 4)
                if len(parts) != 5 or parts[0] != b"IMG":
                    out.append({"media_id": media_id, "width": None,
                                "height": None, "n_pixel_bytes": None})
                    continue
                w, h = int(parts[1]), int(parts[2])
                px = parts[4] or b"\x00"
                scale = min(1.0, max_side / max(w, h))
                nw = max(1, math.floor(w * scale))
                nh = max(1, math.floor(h * scale))
                step = max(1, math.ceil((w * h) / (nw * nh)))
                out.append({
                    "media_id": media_id,
                    "width": nw,
                    "height": nh,
                    "n_pixel_bytes": len(px[::step]),
                })
            yield pd.DataFrame(
                out, columns=[f.name for f in RESIZE_META_SCHEMA.fields]
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "content")
        .mapInPandas(run, schema=RESIZE_META_SCHEMA)
    )


AHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("ahash", LongType(), True),
        StructField("n_pixels", LongType(), True),
    ]
)


def _ahash_bytes(px: bytes, bits: int) -> int | None:
    """Average-hash over a byte buffer: split positions into ``bits``
    cells via ``cell(i) = (i * bits) // n`` (the exact integer
    partition a SQL oracle replays), set cell bit iff the cell's mean
    exceeds the global mean — compared CROSS-MULTIPLIED in integers
    (``csum * n > tsum * ccnt``), so no float ever decides a bit."""
    n = len(px)
    if n == 0:
        return None
    tsum = sum(px)
    csum = [0] * bits
    ccnt = [0] * bits
    for i, b in enumerate(px):
        c = (i * bits) // n
        csum[c] += b
        ccnt[c] += 1
    h = 0
    for c in range(bits):
        if csum[c] * n > tsum * ccnt[c]:
            h |= 1 << c
    return h


def image_ahash(
    media: DataFrame, bits: int = 16, codec: Codec | None = None
) -> DataFrame:
    """Perceptual (average) hash per image row — the near-dup key for
    media dedup: byte-identical copies collide on md5, but re-encoded
    or lightly-edited copies only collide perceptually. One Arrow-
    batched pass (bytes never leave the executor); downstream blocking
    is a plain groupBy on ``ahash`` — model-free, skew handled as
    aggregate skew. FakeCodec's 'pixels' are the payload after the
    ``IMG:w:h:c:`` header; a real codec supplies decoded luma bytes
    through the same interface."""
    codec = codec or FakeCodec()

    def pixels_of(content: bytes) -> bytes | None:
        head, _, rest = content.partition(b":")
        if head != b"IMG":
            return None
        try:
            _, _, _, px = rest.split(b":", 3)
        except ValueError:
            return None
        return px

    def run(batches):
        for pdf in batches:
            out = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                px = pixels_of(bytes(content or b""))
                h = _ahash_bytes(px, bits) if px is not None else None
                out.append(
                    {
                        "media_id": media_id,
                        "ahash": h,
                        "n_pixels": len(px) if px is not None else None,
                    }
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in AHASH_SCHEMA.fields]
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "content")
        .mapInPandas(run, schema=AHASH_SCHEMA)
    )
