"""CCD image-pipeline operators over long-format frames — SURVEY.md §2
X2/J1/J2, §3.1 E2.

Reference: `pyspec/ccd/transformations.py` `FileProcessor`/`ImageProcessor`
[M]: dark subtraction, flat-field division, monitor normalization, k x k
pixel binning, ROI crop, and the angle alignment that precedes ccdToQ.
The reference holds the whole image stack in RAM (its scale ceiling);
here every step is a relational op over `(frame_id, y, x, intensity)`
rows, so the stack can be arbitrarily large.

Scale notes:
- dark/flat are one frame each (~64k rows for 256x256): always broadcast.
- per-frame metadata (monitor, angles) is a tiny dim keyed by frame_id:
  broadcast join (J2's at-scale form; the shuffle join is only needed if
  frame metadata itself is huge).
- binning/ROI are pure projections/aggregations — pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dark_subtract(frames: DataFrame, dark: DataFrame) -> DataFrame:
    """I <- I - dark, aligned on (y, x).  `pyspec/ccd/transformations.py`
    FileProcessor dark correction; the one-row-side broadcast join J1."""
    d = F.broadcast(dark.select("y", "x", F.col("intensity").alias("dark_i")))
    return (
        frames.join(d, ["y", "x"], "left")
        .withColumn(
            "intensity", F.col("intensity") - F.coalesce(F.col("dark_i"), F.lit(0.0))
        )
        .drop("dark_i")
    )


def flat_field(frames: DataFrame, flat: DataFrame, eps: float = 1e-12) -> DataFrame:
    """I <- I / flat (guarded), aligned on (y, x)."""
    f = F.broadcast(flat.select("y", "x", F.col("intensity").alias("flat_i")))
    return (
        frames.join(f, ["y", "x"], "left")
        .withColumn(
            "intensity",
            F.col("intensity")
            / F.coalesce(F.nullif(F.col("flat_i"), F.lit(0.0)), F.lit(1.0)),
        )
        .drop("flat_i")
    )


def monitor_normalize(frames: DataFrame, geom: DataFrame, on=("frame_id",)) -> DataFrame:
    """I <- I / monitor(frame) — the implicit frame<->scan-metadata join
    (J2) + monitor normalization (P3) of ImageProcessor."""
    g = F.broadcast(geom.select(*on, "monitor"))
    return (
        frames.join(g, list(on))
        .withColumn("intensity", F.col("intensity") / F.col("monitor"))
        .drop("monitor")
    )


def pixel_bin(frames: DataFrame, k: int, keys=("file", "frame_id")) -> DataFrame:
    """k x k pixel binning: sum intensity per block (ImageProcessor
    setBinning).  Keys keep per-frame identity."""
    return (
        frames.groupBy(
            *keys,
            (F.col("y") / k).cast("int").alias("by"),
            (F.col("x") / k).cast("int").alias("bx"),
        )
        .agg(F.sum("intensity").alias("intensity"), F.count("*").alias("n_px"))
    )


def roi(frames: DataFrame, x0: int, x1: int, y0: int, y1: int) -> DataFrame:
    """ROI crop [x0,x1) x [y0,y1) (ImageProcessor setDetectorROI)."""
    return frames.where(
        (F.col("x") >= x0) & (F.col("x") < x1) & (F.col("y") >= y0) & (F.col("y") < y1)
    )


def frame_stats(frames: DataFrame, keys=("file", "frame_id")) -> DataFrame:
    """Per-frame summary (total counts, peak pixel) — scan.Detector.sum()
    analog over images."""
    return frames.groupBy(*keys).agg(
        F.sum("intensity").alias("total_i"),
        F.max("intensity").alias("max_i"),
        F.max_by(F.struct("y", "x"), F.struct("intensity", F.col("y") * -1)).alias(
            "peak_px"
        ),
        F.count("*").alias("n_px"),
    )
