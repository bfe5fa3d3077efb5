"""ccdToQ — detector pixels to reciprocal space (SURVEY.md §2 X1, §3.1 E2).

Reference: `src/ctrans.c` `ccdToQ` [M], driven by
`pyspec/ccd/transformations.py` `ImageProcessor` frame modes (theta-frame /
phi-frame / cartesian / hkl).  Per pixel: six-circle goniometer angles
(delta, theta, chi, phi, mu, gamma) + detector geometry + wavelength ->
(qx, qy, qz); optionally UB^-1 -> (h, k, l).  Pure row-wise math.

Geometry convention used here (documented because the reference mount is
empty; six-circle algebra follows the public You (1999) four/six-circle
paper): incident beam along +y; z up; detector arm rotated by delta
(about z) then gamma (about x); sample rotations applied as
R = Rz(theta) . Ry(chi) . Rz(phi); Q_sample = R^T . Q_lab,
Q_lab = (2 pi / lambda) * (kf_hat - ki_hat).

Two implementations with identical semantics:
- `ccd_to_q_cols`   — built-in trig column expressions: stays inside
  whole-stage codegen, zero Python cost; preferred at scale.
- `ccd_to_q_arrow`  — `mapInArrow` numpy kernel: the shape the reference's
  C kernel takes when the math outgrows SQL expressions.  Arrow-batched,
  vectorized, no per-row Python.
Both are tested to agree to 1e-9 (tests/test_images.py).
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# columns required on the input frame table
ANGLE_COLS = ("delta", "theta", "chi", "phi", "mu", "gamma")


def _pixel_angles(pix_size: float, dist: float):
    """Per-pixel angular offsets: small-angle detector plane mapping."""
    return pix_size / dist


def ccd_to_q_cols(
    df: DataFrame,
    wavelength: float,
    pix_size: float = 1e-4,
    dist: float = 1.0,
    cx: float = 32.0,
    cy: float = 32.0,
) -> DataFrame:
    """Column-expression ccdToQ.  Input: (x, y, intensity, delta, theta,
    chi, phi, mu, gamma); output adds (qx, qy, qz)."""
    k = 2.0 * math.pi / wavelength
    scale = _pixel_angles(pix_size, dist)
    # total detector deflection per pixel
    delta_p = F.radians(F.col("delta")) + (F.col("y") - cy) * scale   # vertical
    gamma_p = F.radians(F.col("gamma")) + (F.col("x") - cx) * scale   # horizontal
    # kf_hat in lab frame (beam +y, z up): rotate +y by delta about z,
    # then by gamma about x
    kfx = F.sin(gamma_p) * F.cos(delta_p)
    kfy = F.cos(gamma_p) * F.cos(delta_p)
    kfz = F.sin(delta_p)
    qxl = k * kfx
    qyl = k * (kfy - 1.0)
    qzl = k * kfz
    th = F.radians(F.col("theta"))
    ch = F.radians(F.col("chi"))
    ph = F.radians(F.col("phi"))
    # R = Rz(th) . Ry(ch) . Rz(ph); Q_sample = R^T Q_lab = Rz(-ph) Ry(-ch) Rz(-th) Q_lab
    # Rz(-th):
    x1 = F.cos(th) * qxl + F.sin(th) * qyl
    y1 = -F.sin(th) * qxl + F.cos(th) * qyl
    z1 = qzl
    # Ry(-ch):
    x2 = F.cos(ch) * x1 - F.sin(ch) * z1
    y2 = y1
    z2 = F.sin(ch) * x1 + F.cos(ch) * z1
    # Rz(-ph):
    qx = F.cos(ph) * x2 + F.sin(ph) * y2
    qy = -F.sin(ph) * x2 + F.cos(ph) * y2
    qz = z2
    return df.withColumns({"qx": qx, "qy": qy, "qz": qz})


def ccd_to_q_arrow(
    df: DataFrame,
    wavelength: float,
    pix_size: float = 1e-4,
    dist: float = 1.0,
    cx: float = 32.0,
    cy: float = 32.0,
) -> DataFrame:
    """mapInArrow ccdToQ — numpy kernel over Arrow batches (the C-kernel
    shape: `src/ctrans.c` ccdToQ, distributed)."""
    from pyspark.sql.types import StructField, StructType, DoubleType

    k = 2.0 * math.pi / wavelength
    scale = _pixel_angles(pix_size, dist)
    out_schema = StructType(
        df.schema.fields
        + [
            StructField("qx", DoubleType()),
            StructField("qy", DoubleType()),
            StructField("qz", DoubleType()),
        ]
    )

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            t = b.to_pydict()
            x = np.asarray(t["x"], dtype=np.float64)
            y = np.asarray(t["y"], dtype=np.float64)
            delta_p = np.radians(np.asarray(t["delta"], dtype=np.float64)) + (y - cy) * scale
            gamma_p = np.radians(np.asarray(t["gamma"], dtype=np.float64)) + (x - cx) * scale
            kfx = np.sin(gamma_p) * np.cos(delta_p)
            kfy = np.cos(gamma_p) * np.cos(delta_p)
            kfz = np.sin(delta_p)
            qxl, qyl, qzl = k * kfx, k * (kfy - 1.0), k * kfz
            th = np.radians(np.asarray(t["theta"], dtype=np.float64))
            ch = np.radians(np.asarray(t["chi"], dtype=np.float64))
            ph = np.radians(np.asarray(t["phi"], dtype=np.float64))
            x1 = np.cos(th) * qxl + np.sin(th) * qyl
            y1 = -np.sin(th) * qxl + np.cos(th) * qyl
            z1 = qzl
            x2 = np.cos(ch) * x1 - np.sin(ch) * z1
            y2 = y1
            z2 = np.sin(ch) * x1 + np.cos(ch) * z1
            qx = np.cos(ph) * x2 + np.sin(ph) * y2
            qy = -np.sin(ph) * x2 + np.cos(ph) * y2
            qz = z2
            arrays = [b.column(i) for i in range(b.num_columns)] + [
                pa.array(qx),
                pa.array(qy),
                pa.array(qz),
            ]
            yield pa.RecordBatch.from_arrays(arrays, schema=pa.schema(
                list(b.schema) + [pa.field("qx", pa.float64()),
                                  pa.field("qy", pa.float64()),
                                  pa.field("qz", pa.float64())]))

    return df.mapInArrow(kernel, out_schema)


def hkl_transform(df: DataFrame, ub: list[float]) -> DataFrame:
    """(qx,qy,qz) -> (h,k,l) via UB^-1 (Busing-Levy; `pyspec/
    diffractometer.py` [M]).  UB is 9 driver-side numbers — inverted on
    the driver, applied as literal column expressions (SURVEY §2 X3)."""
    inv = np.linalg.inv(np.asarray(ub, dtype=np.float64).reshape(3, 3))
    q = [F.col("qx"), F.col("qy"), F.col("qz")]
    out = {}
    for i, name in enumerate(("h", "k", "l")):
        out[name] = sum(float(inv[i, j]) * q[j] for j in range(3))
    return df.withColumns(out)
