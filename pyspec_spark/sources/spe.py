"""SPE (WinView) binary frame decoder — SURVEY.md §2 S3/S4.

Reference: `pyspec/ccd/PrincetonSPE.py` `PrincetonSPEFile` [M] — WinView
.SPE v2: a 4100-byte fixed header with dims/dtype/frame-count at fixed
offsets, then raw frames; loaded as a (nframes, y, x) array.

Spark-first design: `spark.read.format("binaryFile")` gives one row per
file (path, content); an Arrow-batched `mapInPandas` decodes each file's
bytes with numpy and emits the **long format** `(file, frame_id, y, x,
intensity)` — SURVEY.md §1 D6's preferred layout, which turns all image
algebra (dark subtraction, binning, ROI, gridding) into relational ops.

Scale notes: one task per file (binaryFile partitioning); the decode is
a zero-copy numpy frombuffer + reshape, and the long-format explosion
happens executor-side in Arrow batches.  Never collected to the driver.
Header offsets (v2, public format): xdim uint16@42, datatype int16@108,
ydim uint16@656, NumFrames int32@1446; dtypes 0=float32, 1=int32,
2=int16, 3=uint16.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

SPE_HEADER_LEN = 4100
_DTYPES = {0: np.float32, 1: np.int32, 2: np.int16, 3: np.uint16}

FRAME_SCHEMA = StructType(
    [
        StructField("file", StringType()),
        StructField("frame_id", IntegerType()),
        StructField("y", IntegerType()),
        StructField("x", IntegerType()),
        StructField("intensity", DoubleType()),
    ]
)


def decode_spe_bytes(content: bytes) -> np.ndarray:
    """Decode one .SPE v2 payload -> float64 array (nframes, ydim, xdim)."""
    if len(content) < SPE_HEADER_LEN:
        raise ValueError(f"SPE file too short: {len(content)} bytes")
    xdim = struct.unpack_from("<H", content, 42)[0]
    dtype_code = struct.unpack_from("<h", content, 108)[0]
    ydim = struct.unpack_from("<H", content, 656)[0]
    nframes = struct.unpack_from("<i", content, 1446)[0]
    if dtype_code not in _DTYPES:
        raise ValueError(f"unsupported SPE datatype code {dtype_code}")
    dt = np.dtype(_DTYPES[dtype_code]).newbyteorder("<")
    expected = nframes * ydim * xdim
    data = np.frombuffer(content, dtype=dt, count=expected, offset=SPE_HEADER_LEN)
    if data.size != expected:
        raise ValueError(
            f"SPE body truncated: want {expected} px, got {data.size}"
        )
    return data.reshape(nframes, ydim, xdim).astype(np.float64)


def read_spe(spark: SparkSession, path: str) -> DataFrame:
    """Read .SPE file(s) into long-format (file, frame_id, y, x, intensity)."""
    binary = spark.read.format("binaryFile").load(path)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import os

        for pdf in batches:
            for _, row in pdf.iterrows():
                frames = decode_spe_bytes(bytes(row["content"]))
                nf, ny, nx = frames.shape
                fid, yy, xx = np.meshgrid(
                    np.arange(nf, dtype=np.int32),
                    np.arange(ny, dtype=np.int32),
                    np.arange(nx, dtype=np.int32),
                    indexing="ij",
                )
                yield pd.DataFrame(
                    {
                        "file": os.path.basename(row["path"]),
                        "frame_id": fid.ravel(),
                        "y": yy.ravel(),
                        "x": xx.ravel(),
                        "intensity": frames.ravel(),
                    }
                )

    return binary.select("path", "content").mapInPandas(decode, FRAME_SCHEMA)


def encode_spe(frames: np.ndarray, dtype_code: int = 3) -> bytes:
    """Serialize a (nframes, ydim, xdim) array as an SPE v2 payload —
    the exact inverse of decode_spe_bytes (same fixed header offsets),
    so round-trip queries and fixtures share one format definition
    (r8; previously only tests/fixtures.py could write the format)."""
    if frames.ndim != 3:
        raise ValueError("encode_spe: frames must be (nframes, ydim, xdim)")
    if dtype_code not in _DTYPES:
        raise ValueError(f"unsupported SPE datatype code {dtype_code}")
    nframes, ydim, xdim = (int(s) for s in frames.shape)
    header = bytearray(SPE_HEADER_LEN)
    struct.pack_into("<H", header, 42, xdim)
    struct.pack_into("<h", header, 108, dtype_code)
    struct.pack_into("<H", header, 656, ydim)
    struct.pack_into("<i", header, 1446, nframes)
    dt = np.dtype(_DTYPES[dtype_code]).newbyteorder("<")
    return bytes(header) + frames.astype(dt).tobytes()
