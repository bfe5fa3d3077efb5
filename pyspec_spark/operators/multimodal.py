"""Multimodal (image/audio/video) column plumbing — SURVEY.md §2.12 L7.

Design (north-star brief): media payloads are opaque `binary` columns
with a typed metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched pandas functions over `mapInPandas`.
The image/audio codec libraries are NOT in this container, so the codec
step is stubbed: `decode_media` raises NotImplementedError for real
codecs and supports the deterministic `fake-rgb8` codec (a seeded,
shape-correct synthetic decode) so the Spark-side plumbing — schema,
partitioning, UDF signature, batch shape — is real and tested.

Scale notes: one media blob never leaves its executor; decode is
per-row inside Arrow batches; frame sampling happens *before* feature
extraction so the explode factor is bounded by sample_every.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
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
        StructField("media_id", LongType()),
        StructField("kind", StringType()),        # image | audio | video
        StructField("codec", StringType()),       # png | jpeg | wav | fake-rgb8 ...
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("payload", BinaryType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_id", IntegerType()),
        StructField("features", ArrayType(DoubleType())),  # mean RGB + moments
    ]
)

REAL_CODECS = ("png", "jpeg", "wav", "mp4")


def decode_frame(codec: str, payload: bytes, width: int, height: int, frame_id: int) -> np.ndarray:
    """Decode one frame to (h, w, 3) uint8.  Real codecs are stubbed —
    the decoder libraries are not available in this environment."""
    if codec == "fake-rgb8":
        # deterministic synthetic decode: bytes seed a generator
        seed = int.from_bytes(payload[:8], "little", signed=False) + frame_id
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, (height, width, 3), dtype=np.uint8)
    if codec in REAL_CODECS:
        raise NotImplementedError(
            f"codec {codec!r}: image/audio libraries not available in this "
            "container — plug a decoder in here (PIL/av/soundfile)"
        )
    raise ValueError(f"unknown codec {codec!r}")


def make_fake_media(spark: SparkSession, n: int = 8, frames: int = 4) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    rows = []
    for i in range(n):
        payload = int(i * 2654435761 % 2**63).to_bytes(8, "little") * 4
        rows.append((i, "video" if i % 2 else "image", "fake-rgb8", 16, 12,
                     frames if i % 2 else 1, bytearray(payload)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_features(
    media: DataFrame, sample_every: int = 2
) -> DataFrame:
    """Frame-sample + per-frame feature extraction (mean/std per RGB
    channel) via mapInPandas — the full multimodal batch shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                n_frames = int(r["n_frames"] or 1)
                for f in range(0, n_frames, sample_every):
                    img = decode_frame(
                        r["codec"], bytes(r["payload"]), int(r["width"]),
                        int(r["height"]), f
                    )
                    feats = np.concatenate(
                        [img.mean(axis=(0, 1)), img.std(axis=(0, 1))]
                    ).astype(np.float64)
                    out.append(
                        {
                            "media_id": int(r["media_id"]),
                            "frame_id": f,
                            "features": feats.tolist(),
                        }
                    )
            yield pd.DataFrame(out, columns=["media_id", "frame_id", "features"])

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize: metadata-level plumbing (target dims recorded; payload
    re-encode requires a codec — stubbed like decode)."""
    return media.withColumns(
        {"width": F.lit(width), "height": F.lit(height), "codec": F.col("codec")}
    )
