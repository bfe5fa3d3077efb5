"""Plot / npy sink under the oracle gate (SURVEY.md §2 S6, r8).

The SpecPlot-analog render path (operators/plotting.py) was unit-only;
this declares it driver-checkable with the q_video_frames golden trick:
a FIXED synthetic scan-plot set (6 plots x 129 points, all coordinates
exact binary doubles — integer modular patterns over eighths and
sixteenths, no libm anywhere, so the raster is bit-stable on any IEEE
platform) renders IN-EXECUTOR via applyInPandas, and the query returns
(plot_id, n_points, png_md5, npy_md5).  The oracle reads the committed
golden parquet: if one pixel of the rasterizer, one byte of the PNG
encoder, or one header byte of the .npy serializer changes, the md5
flips.

Scale posture: rendering is a terminal per-group export — each group is
a bounded, already-reduced scan (the engine's row-count guard rejects
fact-table renders); groups render in parallel on executors and only
(id, md5) rows move.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspec_spark.registry import query

_PLOT_GOLDEN = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests", "fixtures", "plot_golden.parquet",
)

_N_PLOTS, _N_PTS = 6, 129

_PLOT_ORACLE = f"""
SELECT plot_id, n_points, png_md5, npy_md5
FROM read_parquet('{_PLOT_GOLDEN}')
ORDER BY plot_id
"""


def synthetic_scans(spark: SparkSession) -> DataFrame:
    """The fixed scan-plot set: x on exact eighths, y a plot-dependent
    integer modular pattern over eighths, yerr over sixteenths — every
    value is a finite binary double, so generation is bit-identical on
    every run/platform (no trig/exp whose libm could drift)."""
    base = spark.range(_N_PLOTS * _N_PTS).select(
        (F.col("id") % _N_PLOTS).cast("int").alias("plot_id"),
        (F.col("id") / F.lit(_N_PLOTS)).cast("long").alias("i"),
    )
    return base.select(
        "plot_id",
        (F.col("i") * F.lit(0.125)).alias("x"),
        (
            ((F.col("i") * (F.col("plot_id") + 7)) % 97) / F.lit(8.0)
            + F.col("plot_id") * F.lit(2.0)
        ).alias("y"),
        (((F.col("i") * 3) % 13 + 1) / F.lit(16.0)).alias("yerr"),
    )


@query("q_plot_golden", oracle=_PLOT_ORACLE)
def q_plot_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    def render(pdf: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        import numpy as np

        from pyspec_spark.operators.plotting import (
            npy_bytes,
            render_points_png,
        )

        pts = pdf[["x", "y", "yerr"]].to_numpy(dtype=np.float64)
        png = render_points_png(pts, has_err=True)
        # npy export of the x-sorted y series (the grid/fit dump shape)
        order = np.argsort(pts[:, 0], kind="stable")
        ys = np.ascontiguousarray(pts[order, 1])
        return pd.DataFrame(
            {
                "plot_id": [int(pdf["plot_id"].iloc[0])],
                "n_points": [len(pdf)],
                "png_md5": [hashlib.md5(png).hexdigest()],
                "npy_md5": [hashlib.md5(npy_bytes(ys)).hexdigest()],
            }
        )

    scans = synthetic_scans(spark)
    return (
        scans.groupBy("plot_id")
        .applyInPandas(
            render,
            "plot_id INT, n_points BIGINT, png_md5 STRING, npy_md5 STRING",
        )
        .orderBy("plot_id")
    )
