"""The pyspec computational heart re-expressed relationally (Stage 2).

Reference loci (public `stuwilkins/pyspec`; SURVEY.md §0 policy):
- 3-D gridder `grid3d` = `src/ctrans.c` (C): bin scattered (qx,qy,qz,I)
  points into a regular grid; per-voxel mean intensity, occupancy count,
  standard error.  Here: a plain hash aggregation on floor-binned keys
  (SURVEY.md §1 D7 — sparse keyed DataFrame, never a dense array).
- Grid cuts/sums = `pyspec/ccd/transformations.py` ImageProcessor
  get1DSum/get2DSum/get1DCut/get2DCut: re-aggregation of the voxel table.
- Weighted centroid / argmax peak-pick = `pyspec/fitfuncs.py` guess mode.
- ccdToQ rotation = `src/ctrans.c` ccdToQ (stand-in: fixed 3x3 rotation,
  pure arithmetic so both engines agree bit-for-bit).
- Pixel k x k binning = `pyspec/ccd/transformations.py` ImageProcessor.

Scale notes (100 TB posture):
- The gridder's groupBy key cardinality is bounded by the grid size, not
  the data size: partial (map-side) aggregation reduces each input
  partition to <=n_voxels rows before the shuffle, so the shuffle volume
  is O(n_voxels x n_partitions) regardless of input rows.  This is
  exactly ctrans.c's one-pass (sum, n) accumulation, distributed.
- Voxel skew (one Bragg peak dominating a cell) is absorbed by partial
  aggregation + AQE skew handling; no salting needed for bounded keys.
- Cross-engine determinism: bin keys use only IEEE-exact ops
  (+ - * / floor); libm functions (trig/exp) never feed a floor() and
  only ever appear in ROUND(..., 6) outputs with hardcoded constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspec_spark.functions.determinism import (
    davg,
    dsum,
    dsum_split,
    sql_davg,
    sql_dsum,
    sql_dsum_split,
)
from pyspec_spark.registry import query
from pyspec_spark.tables import table

# Synthetic q-space mapping on lineitem (SURVEY §1.3 analogy:
# lineitem row ~ scan point, groupBy keys ~ voxel ids):
#   qx = l_quantity        in [1, 50],   dqx = 5  -> gx in 0..10
#   qy = l_discount * 100  in [0, 10],   dqy = 2  -> gy in 0..5
#   qz = l_tax * 100       in [0, 8],    dqz = 2  -> gz in 0..4
#   I  = l_extendedprice
_GX = "CAST(FLOOR(l_quantity / 5) AS BIGINT)"
_GY = "CAST(FLOOR(l_discount * 100 / 2) AS BIGINT)"
_GZ = "CAST(FLOOR(l_tax * 100 / 2) AS BIGINT)"


def _voxels(li: DataFrame) -> DataFrame:
    return li.selectExpr(
        f"{_GX} AS gx",
        f"{_GY} AS gy",
        f"{_GZ} AS gz",
        "l_extendedprice AS intensity",
    )


# ---------------------------------------------------------------------------
# A3 — 1-D rebin/histogram onto a regular x-grid: mean y, occupancy n,
# stderr per bin (ctrans 1-D reduction / numpy.interp alignment analog).
# ---------------------------------------------------------------------------
@query(
    "q_grid1d",
    oracle=f"""
WITH b AS (
  SELECT CAST(FLOOR(l_quantity / 5) AS BIGINT) AS bin,
         COUNT(*) AS n,
         {sql_dsum('l_extendedprice', 'sy')},
         {sql_dsum_split('l_extendedprice * l_extendedprice', 'syy')}
  FROM lineitem
  GROUP BY 1
)
SELECT bin, n,
       ROUND(sy / n, 6) AS mean_y,
       ROUND(CASE WHEN n > 1
                  THEN SQRT((syy - sy * sy / n) / (n - 1) / n)
                  ELSE 0.0 END, 6) AS stderr_y
FROM b
""",
)
def q_grid1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    b = li.groupBy(F.expr("CAST(FLOOR(l_quantity / 5) AS BIGINT)").alias("bin")).agg(
        F.count("*").alias("n"),
        dsum("l_extendedprice", "sy"),
        dsum_split(F.col("l_extendedprice") * F.col("l_extendedprice"), "syy"),
    )
    stderr = F.when(
        F.col("n") > 1,
        F.sqrt(
            (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n"))
            / (F.col("n") - 1)
            / F.col("n")
        ),
    ).otherwise(F.lit(0.0))
    return b.select(
        "bin",
        "n",
        F.round(F.col("sy") / F.col("n"), 6).alias("mean_y"),
        F.round(stderr, 6).alias("stderr_y"),
    )


# ---------------------------------------------------------------------------
# A4 — the 3-D gridder (ctrans.c grid3d): per-voxel mean intensity,
# occupancy, standard error, as ONE hash aggregation.
# ---------------------------------------------------------------------------
@query(
    "q_grid3d",
    oracle=f"""
WITH v AS (
  SELECT {_GX} AS gx, {_GY} AS gy, {_GZ} AS gz,
         COUNT(*) AS n,
         {sql_dsum('l_extendedprice', 'si')},
         {sql_dsum_split('l_extendedprice * l_extendedprice', 'sii')}
  FROM lineitem
  GROUP BY 1, 2, 3
)
SELECT gx, gy, gz, n,
       ROUND(si / n, 6) AS mean_i,
       ROUND(CASE WHEN n > 1
                  THEN SQRT((sii - si * si / n) / (n - 1) / n)
                  ELSE 0.0 END, 6) AS stderr_i
FROM v
""",
)
def q_grid3d(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    # r13 (second pass): stderr chain as parsed SQL; dsum_split takes
    # its str face (1:1 transliteration of the former Column chain)
    v = (
        _voxels(li)
        .groupBy("gx", "gy", "gz")
        .agg(
            F.count("*").alias("n"),
            dsum("intensity", "si"),
            dsum_split("intensity * intensity", "sii"),
        )
    )
    stderr = (
        "CASE WHEN n > 1"
        " THEN sqrt((sii - si * si / n) / (n - 1) / n)"
        " ELSE 0.0D END"
    )
    return v.selectExpr(
        "gx",
        "gy",
        "gz",
        "n",
        "round(si / n, 6) AS mean_i",
        f"round({stderr}, 6) AS stderr_i",
    )


# ---------------------------------------------------------------------------
# A5 — grid cut & sum (ImageProcessor get2DSum / get2DCut): project the
# 3-D voxel table to 2-D by summing voxel means over gz, plus one plane
# slice.  Second-level aggregation over already-rounded voxel means is
# done in exact decimals so both engines agree.
# ---------------------------------------------------------------------------
@query(
    "q_grid_cut",
    oracle=f"""
WITH v AS (
  SELECT {_GX} AS gx, {_GY} AS gy, {_GZ} AS gz,
         ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*), 6) AS mean_i
  FROM lineitem
  GROUP BY 1, 2, 3
)
SELECT gx, gy,
       {sql_dsum('mean_i', 'sum2d')},
       {sql_dsum('CASE WHEN gz = 2 THEN mean_i END', 'cut_gz2')},
       COUNT(*) AS n_voxels
FROM v
GROUP BY gx, gy
""",
)
def q_grid_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    v = (
        _voxels(li)
        .groupBy("gx", "gy", "gz")
        .agg(davg("intensity", "mean_i"))
    )
    return v.groupBy("gx", "gy").agg(
        dsum("mean_i", "sum2d"),
        dsum(F.when(F.col("gz") == 2, F.col("mean_i")), "cut_gz2"),
        F.count("*").alias("n_voxels"),
    )


# ---------------------------------------------------------------------------
# A6 — occupancy mask: report empty voxels of the full bounding-box
# lattice (ctrans gridOccu == 0 holes).  Lattice anti-join, all keyed —
# the lattice is generated, never materialized on the driver.
# ---------------------------------------------------------------------------
@query(
    "q_occupancy",
    oracle=f"""
WITH occ AS (
  SELECT DISTINCT {_GX} AS gx, {_GY} AS gy, {_GZ} AS gz FROM lineitem
),
lattice AS (
  SELECT x.range AS gx, y.range AS gy, z.range AS gz
  FROM range(0, 11) x, range(0, 6) y, range(0, 5) z
)
SELECT l.gx, COUNT(*) AS n_lattice,
       COUNT(o.gx) AS n_occupied,
       COUNT(*) - COUNT(o.gx) AS n_empty
FROM lattice l
LEFT JOIN occ o ON l.gx = o.gx AND l.gy = o.gy AND l.gz = o.gz
GROUP BY l.gx
""",
)
def q_occupancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    occ = _voxels(li).select("gx", "gy", "gz").distinct().withColumn("hit", F.lit(1))
    lattice = (
        spark.range(0, 11)
        .select(F.col("id").alias("gx"))
        .crossJoin(spark.range(0, 6).select(F.col("id").alias("gy")))
        .crossJoin(spark.range(0, 5).select(F.col("id").alias("gz")))
    )
    j = lattice.join(F.broadcast(occ), ["gx", "gy", "gz"], "left")
    return j.groupBy("gx").agg(
        F.count("*").alias("n_lattice"),
        F.count("hit").alias("n_occupied"),
        (F.count("*") - F.count("hit")).alias("n_empty"),
    )


# ---------------------------------------------------------------------------
# A7 — weighted centroid & second moment (fitfuncs guess: peak center
# = sum(x*w)/sum(w), width from second moment).
# ---------------------------------------------------------------------------
@query(
    "q_centroid",
    oracle=f"""
WITH s AS (
  SELECT l_returnflag,
         {sql_dsum_split('l_quantity * l_extendedprice', 'sxw')},
         {sql_dsum_split('l_quantity * l_quantity * l_extendedprice', 'sxxw')},
         {sql_dsum('l_extendedprice', 'sw')}
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag,
       ROUND(sxw / sw, 6) AS centroid,
       ROUND(SQRT(sxxw / sw - (sxw / sw) * (sxw / sw)), 6) AS width
FROM s
""",
)
def q_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    s = li.groupBy("l_returnflag").agg(
        dsum_split(F.col("l_quantity") * F.col("l_extendedprice"), "sxw"),
        dsum_split(
            F.col("l_quantity") * F.col("l_quantity") * F.col("l_extendedprice"),
            "sxxw",
        ),
        dsum("l_extendedprice", "sw"),
    )
    c = F.col("sxw") / F.col("sw")
    return s.select(
        "l_returnflag",
        F.round(c, 6).alias("centroid"),
        F.round(F.sqrt(F.col("sxxw") / F.col("sw") - c * c), 6).alias("width"),
    )


# ---------------------------------------------------------------------------
# A8 — argmax / peak pick (x at max y) with unique tiebreak via window
# rank so both engines resolve ties identically.
# ---------------------------------------------------------------------------
@query(
    "q_argmax",
    oracle="""
SELECT l_returnflag, l_quantity AS peak_qty, l_extendedprice AS peak_price,
       l_orderkey, l_linenumber
FROM (
  SELECT l_returnflag, l_quantity, l_extendedprice, l_orderkey, l_linenumber,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
  FROM lineitem
)
WHERE rn = 1
""",
)
def q_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("l_extendedprice"), "l_orderkey", "l_linenumber"
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("l_quantity").alias("peak_qty"),
            F.col("l_extendedprice").alias("peak_price"),
            "l_orderkey",
            "l_linenumber",
        )
    )


# ---------------------------------------------------------------------------
# X1 stand-in — fixed 3x3 rotation applied to a 3-vector built from
# lineitem columns (ccdToQ's rotation-matrix product, minus the libm
# trig: constants are hardcoded so Spark and DuckDB agree bitwise).
# R = Rz(30 deg) with cos=0.866025, sin=0.5 hardcoded.
# ---------------------------------------------------------------------------
@query(
    "q_rot3",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(0.866025 * l_quantity - 0.5 * (l_discount * 100), 6) AS qx,
       ROUND(0.5 * l_quantity + 0.866025 * (l_discount * 100), 6) AS qy,
       ROUND(l_tax * 100, 6) AS qz
FROM lineitem
WHERE l_orderkey <= 2000
""",
)
def q_rot3(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")
    y = F.col("l_discount") * 100
    z = F.col("l_tax") * 100
    return li.where(F.col("l_orderkey") <= 2000).select(
        "l_orderkey",
        "l_linenumber",
        F.round(0.866025 * x - 0.5 * y, 6).alias("qx"),
        F.round(0.5 * x + 0.866025 * y, 6).alias("qy"),
        F.round(z, 6).alias("qz"),
    )


# ---------------------------------------------------------------------------
# X2 — pixel k x k binning (ImageProcessor setBinning): sum intensity
# over k x k pixel blocks.  Synthetic pixel coords from part/supp keys.
# ---------------------------------------------------------------------------
@query(
    "q_pixel_bin",
    oracle=f"""
SELECT CAST(FLOOR((l_partkey % 64) / 8) AS BIGINT) AS bx,
       CAST(FLOOR((l_suppkey % 64) / 8) AS BIGINT) AS by,
       {sql_dsum('l_quantity', 'sum_i')},
       COUNT(*) AS n_px
FROM lineitem
GROUP BY 1, 2
""",
)
def q_pixel_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.expr("CAST(FLOOR((l_partkey % 64) / 8) AS BIGINT)").alias("bx"),
            F.expr("CAST(FLOOR((l_suppkey % 64) / 8) AS BIGINT)").alias("by"),
        )
        .agg(dsum("l_quantity", "sum_i"), F.count("*").alias("n_px"))
    )
