"""The reusable 3-D gridder operator — SURVEY.md §2 A4-A6, §1 D7.

Reference: `src/ctrans.c` `grid3d` [M]: accumulate (sum, n) per voxel
over a user-set bounding box x bin counts; finalize mean + stderr.
Distributed form: floor-binned keys + ONE hash aggregation; Spark's
partial->final HashAggregate IS ctrans's one-pass accumulation (A15).

The grid is sparse (a keyed DataFrame) — never a dense driver-side
array; densify only at export (`to_dense`, small grids only).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class GridSpec:
    """Bounding box + bin counts, mirroring ImageProcessor's
    (gridSize, gridRange)."""

    mins: tuple[float, float, float]
    maxs: tuple[float, float, float]
    sizes: tuple[int, int, int]

    def deltas(self) -> tuple[float, float, float]:
        return tuple(
            (mx - mn) / sz for mn, mx, sz in zip(self.mins, self.maxs, self.sizes)
        )


def grid3d(
    df: DataFrame,
    spec: GridSpec,
    cols: tuple[str, str, str] = ("qx", "qy", "qz"),
    val: str = "intensity",
    clip: bool = True,
) -> DataFrame:
    """Bin scattered points into the grid: per-voxel mean, count, stderr.

    Output: (gx, gy, gz, n, mean_i, stderr_i) — gridData/gridOccu/
    gridStdErr as columns of one sparse table.
    """
    d = spec.deltas()
    keys = []
    for i, (c, axis) in enumerate(zip(cols, "xyz")):
        g = F.floor((F.col(c) - F.lit(spec.mins[i])) / F.lit(d[i])).cast("long")
        # points exactly at the max edge fall into the last bin (numpy
        # histogram convention, matching the reference gridder)
        g = F.when(g == spec.sizes[i], spec.sizes[i] - 1).otherwise(g)
        keys.append(g.alias(f"g{axis}"))
    binned = df.select(*keys, F.col(val).alias("_v"))
    if clip:
        binned = binned.where(
            (F.col("gx") >= 0) & (F.col("gx") < spec.sizes[0])
            & (F.col("gy") >= 0) & (F.col("gy") < spec.sizes[1])
            & (F.col("gz") >= 0) & (F.col("gz") < spec.sizes[2])
        )
    agg = binned.groupBy("gx", "gy", "gz").agg(
        F.count("*").alias("n"),
        F.sum("_v").alias("_s"),
        F.sum(F.col("_v") * F.col("_v")).alias("_ss"),
    )
    mean = F.col("_s") / F.col("n")
    var = (F.col("_ss") - F.col("_s") * F.col("_s") / F.col("n")) / (F.col("n") - 1)
    stderr = F.when(F.col("n") > 1, F.sqrt(var / F.col("n"))).otherwise(F.lit(0.0))
    return agg.select(
        "gx", "gy", "gz", "n", mean.alias("mean_i"), stderr.alias("stderr_i")
    )


def grid_sum_2d(voxels: DataFrame, axis: str = "gz") -> DataFrame:
    """get2DSum: project the voxel table along one axis (sum of means)."""
    keep = [a for a in ("gx", "gy", "gz") if a != axis]
    return voxels.groupBy(*keep).agg(
        F.sum("mean_i").alias("sum_i"), F.sum("n").alias("n")
    )


def grid_cut(voxels: DataFrame, axis: str = "gz", index: int = 0) -> DataFrame:
    """get2DCut: one plane of the grid."""
    keep = [a for a in ("gx", "gy", "gz") if a != axis]
    return voxels.where(F.col(axis) == index).select(
        *keep, "n", "mean_i", "stderr_i"
    )


def empty_voxels(voxels: DataFrame, spec: GridSpec) -> DataFrame:
    """Occupancy holes: full lattice anti-join (gridOccu == 0 mask)."""
    spark = voxels.sparkSession
    lattice = (
        spark.range(spec.sizes[0]).select(F.col("id").alias("gx"))
        .crossJoin(spark.range(spec.sizes[1]).select(F.col("id").alias("gy")))
        .crossJoin(spark.range(spec.sizes[2]).select(F.col("id").alias("gz")))
    )
    return lattice.join(voxels.select("gx", "gy", "gz"), ["gx", "gy", "gz"], "left_anti")


def to_dense(voxels: DataFrame, spec: GridSpec):
    """Export a SMALL grid to dense numpy arrays (gridData, gridOccu,
    gridStdErr) — the reference's in-RAM representation, for plotting /
    export only.  Guarded against accidental huge collects."""
    import numpy as np

    n_cells = spec.sizes[0] * spec.sizes[1] * spec.sizes[2]
    if n_cells > 50_000_000:
        raise ValueError(f"grid too large to densify: {n_cells} cells")
    data = np.zeros(spec.sizes)
    occu = np.zeros(spec.sizes, dtype=np.int64)
    stderr = np.zeros(spec.sizes)
    for r in voxels.toLocalIterator():
        i = (int(r["gx"]), int(r["gy"]), int(r["gz"]))
        data[i] = r["mean_i"]
        occu[i] = r["n"]
        stderr[i] = r["stderr_i"]
    return data, occu, stderr
