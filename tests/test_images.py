"""E2 CCD pipeline golden tests (SURVEY.md §3.1 E2, §5.2 layer 2):
SPE decode -> dark subtract -> monitor normalize -> ccdToQ -> grid3d.
Fixtures per FIXTURES.md B2."""

from __future__ import annotations

import math
import os

import numpy as np
import pytest

from tests.fixtures import make_frames, make_spe_file


@pytest.fixture(scope="module")
def frame_data():
    return make_frames(n_scans=2, n_frames=4, dim=64)


@pytest.fixture(scope="module")
def spe_dir(tmp_path_factory, frame_data):
    base = tmp_path_factory.mktemp("spe")
    stacks, dark = frame_data
    for s, stack in stacks.items():
        make_spe_file(str(base / f"scan{s}.spe"), stack, dtype_code=0)
    make_spe_file(str(base / "dark.spe"), dark[None, :, :], dtype_code=0)
    # one uint16 variant to cover integer dtypes
    make_spe_file(str(base / "scan0_u16.spe"), stacks[0], dtype_code=3)
    return str(base)


def test_spe_decode_roundtrip(frame_data, tmp_path):
    from pyspec_spark.sources.spe import decode_spe_bytes

    stacks, _ = frame_data
    path = tmp_path / "rt.spe"
    make_spe_file(str(path), stacks[0], dtype_code=0)
    decoded = decode_spe_bytes(path.read_bytes())
    np.testing.assert_allclose(decoded, stacks[0].astype(np.float32), rtol=1e-6)


def test_spe_decode_uint16(frame_data, tmp_path):
    from pyspec_spark.sources.spe import decode_spe_bytes

    stacks, _ = frame_data
    path = tmp_path / "u16.spe"
    make_spe_file(str(path), stacks[0], dtype_code=3)
    decoded = decode_spe_bytes(path.read_bytes())
    np.testing.assert_allclose(decoded, stacks[0].astype(np.uint16).astype(np.float64))


def test_spe_truncated_raises(tmp_path):
    from pyspec_spark.sources.spe import decode_spe_bytes

    with pytest.raises(ValueError, match="too short"):
        decode_spe_bytes(b"\x00" * 100)


def test_read_spe_long_format(spark, spe_dir, frame_data):
    from pyspec_spark.sources.spe import read_spe

    stacks, _ = frame_data
    df = read_spe(spark, os.path.join(spe_dir, "scan0.spe"))
    assert df.count() == 4 * 64 * 64
    total = df.groupBy("frame_id").sum("intensity").collect()
    want = {f: float(stacks[0][f].astype(np.float32).sum()) for f in range(4)}
    for r in total:
        assert r["sum(intensity)"] == pytest.approx(want[r["frame_id"]], rel=1e-5)


def test_dark_subtract_and_binning(spark, spe_dir, frame_data):
    from pyspec_spark.operators.images import dark_subtract, frame_stats, pixel_bin, roi
    from pyspec_spark.sources.spe import read_spe

    stacks, dark = frame_data
    frames = read_spe(spark, os.path.join(spe_dir, "scan0.spe"))
    darkdf = read_spe(spark, os.path.join(spe_dir, "dark.spe")).drop("file", "frame_id")
    sub = dark_subtract(frames, darkdf)
    # residual of frame 0 ~ the gaussian spot (5000 peak, sigma 3)
    stats = {r["frame_id"]: r for r in frame_stats(sub).collect()}
    expect0 = (stacks[0][0] - dark).astype(np.float32).sum()
    assert stats[0]["total_i"] == pytest.approx(float(expect0), rel=1e-3)
    # peak pixel should sit at the drifting spot center (cx=20+2f, cy=30+f)
    assert abs(stats[2]["peak_px"]["x"] - 24) <= 1
    assert abs(stats[2]["peak_px"]["y"] - 32) <= 1
    # k x k binning conserves total intensity
    binned = pixel_bin(sub, 8)
    t_b = binned.groupBy().sum("intensity").collect()[0][0]
    t_s = sub.groupBy().sum("intensity").collect()[0][0]
    assert t_b == pytest.approx(t_s, rel=1e-9)
    # ROI bounds
    r = roi(sub, 16, 32, 24, 40)
    assert r.select("x").distinct().count() == 16
    assert r.select("y").distinct().count() == 16


_TEST_UB = [0.5, 0.0, 0.0, 0.0, 0.5, 0.0, 0.0, 0.0, 0.5]


@pytest.mark.parametrize("frame", ["theta", "phi", "cartesian", "hkl"])
def test_ccd_to_q_cols_vs_arrow(spark, spe_dir, frame):
    """The codegen-expression and Arrow-kernel ccdToQ agree to 1e-9 in
    every frame mode (ImageProcessor modes 1-4)."""
    from pyspec_spark.operators.transform import ccd_to_q_arrow, ccd_to_q_cols
    from pyspec_spark.sources.spe import read_spe
    from pyspark.sql import functions as F

    frames = read_spe(spark, os.path.join(spe_dir, "scan0.spe")).limit(5000)
    geom = frames.withColumns(
        {
            "delta": F.lit(10.0) + F.col("frame_id") * 0.5,
            "theta": F.lit(5.0) + F.col("frame_id") * 0.25,
            "chi": F.lit(90.0),
            "phi": F.lit(30.0),
            "mu": F.lit(0.0),
            "gamma": F.lit(2.0),
        }
    )
    out_cols = ["h", "k", "l"] if frame == "hkl" else ["qx", "qy", "qz"]
    kw = {"frame": frame, "ub": _TEST_UB if frame == "hkl" else None}
    a = ccd_to_q_cols(geom, wavelength=1.5405, **kw).select("y", "x", "frame_id", *out_cols)
    b = ccd_to_q_arrow(geom, wavelength=1.5405, **kw).select("y", "x", "frame_id", *out_cols)
    pa_ = a.orderBy("frame_id", "y", "x").toPandas()
    pb_ = b.orderBy("frame_id", "y", "x").toPandas()
    np.testing.assert_allclose(
        pa_[out_cols].values, pb_[out_cols].values, atol=1e-9
    )


def _one_pixel_geom(spark, delta, theta, chi, phi, gamma):
    """One pixel at the detector center — Q depends only on the circles,
    so golden values are hand-derivable."""
    return spark.createDataFrame(
        [(32.0, 32.0, 1.0, delta, theta, chi, phi, 0.0, gamma)],
        "x double, y double, intensity double, delta double, theta double, "
        "chi double, phi double, mu double, gamma double",
    )


# Golden geometry: wavelength = 2*pi so |k| = 1; delta = 90, gamma = 0
# puts kf straight up => Q_lab = (0, -1, 1).  With theta=30, chi=90:
#   theta frame: Rz(-30).Q_lab       = (-1/2, -sqrt(3)/2, 1)
#   phi frame (phi=0): Ry(-90).above = (-1, -sqrt(3)/2, -1/2)
#   phi frame (phi=90): Rz(-90).above= (-sqrt(3)/2, 1, -1/2)
#   hkl (UB = I/2): 2 * phi-frame Q  = (-2, -sqrt(3), -1)
_SQ3 = math.sqrt(3.0)


@pytest.mark.parametrize(
    "frame,phi,expect",
    [
        ("cartesian", 0.0, (0.0, -1.0, 1.0)),
        ("theta", 0.0, (-0.5, -_SQ3 / 2, 1.0)),
        ("phi", 0.0, (-1.0, -_SQ3 / 2, -0.5)),
        ("phi", 90.0, (-_SQ3 / 2, 1.0, -0.5)),
    ],
)
def test_frame_mode_goldens(spark, frame, phi, expect):
    from pyspec_spark.operators.transform import ccd_to_q_arrow, ccd_to_q_cols

    df = _one_pixel_geom(spark, 90.0, 30.0, 90.0, phi, 0.0)
    for fn in (ccd_to_q_cols, ccd_to_q_arrow):
        row = fn(df, wavelength=2.0 * math.pi, frame=frame).select(
            "qx", "qy", "qz"
        ).first()
        np.testing.assert_allclose(
            [row["qx"], row["qy"], row["qz"]], expect, atol=1e-12,
            err_msg=f"{fn.__name__} frame={frame} phi={phi}",
        )


def test_frame_mode_hkl_golden(spark):
    from pyspec_spark.operators.transform import ccd_to_q_arrow, ccd_to_q_cols

    df = _one_pixel_geom(spark, 90.0, 30.0, 90.0, 0.0, 0.0)
    for fn in (ccd_to_q_cols, ccd_to_q_arrow):
        out = fn(df, wavelength=2.0 * math.pi, frame="hkl", ub=_TEST_UB)
        assert {"h", "k", "l"} <= set(out.columns)
        assert not {"qx", "qy", "qz"} & set(out.columns)
        row = out.select("h", "k", "l").first()
        np.testing.assert_allclose(
            [row["h"], row["k"], row["l"]], (-2.0, -_SQ3, -1.0), atol=1e-12,
            err_msg=fn.__name__,
        )


def test_frame_mode_validation(spark):
    from pyspec_spark.operators.transform import ccd_to_q_cols

    df = _one_pixel_geom(spark, 90.0, 30.0, 90.0, 0.0, 0.0)
    with pytest.raises(ValueError, match="frame must be one of"):
        ccd_to_q_cols(df, wavelength=1.0, frame="bogus")
    with pytest.raises(ValueError, match="requires the 9-element ub"):
        ccd_to_q_cols(df, wavelength=1.0, frame="hkl")


def test_e2_pipeline_grid(spark, spe_dir, frame_data):
    """Full E2: decode -> dark -> normalize -> ccdToQ -> grid3d; grid
    invariants: sum(n) == points, occupied+empty == lattice."""
    from pyspark.sql import functions as F

    from pyspec_spark.operators.gridder import GridSpec, empty_voxels, grid3d, grid_sum_2d
    from pyspec_spark.operators.images import dark_subtract, monitor_normalize
    from pyspec_spark.operators.transform import ccd_to_q_cols
    from pyspec_spark.sources.spe import read_spe

    stacks, dark = frame_data
    frames = read_spe(spark, os.path.join(spe_dir, "scan0.spe"))
    darkdf = read_spe(spark, os.path.join(spe_dir, "dark.spe")).drop("file", "frame_id")
    geom = spark.createDataFrame(
        [(f, 10.0 + 0.5 * f, 5.0, 90.0, 0.0, 0.0, 2.0, 1e5) for f in range(4)],
        "frame_id int, delta double, theta double, chi double, phi double, mu double, gamma double, monitor double",
    )
    pipe = dark_subtract(frames, darkdf)
    pipe = monitor_normalize(pipe, geom)
    pipe = pipe.join(F.broadcast(geom.drop("monitor")), "frame_id")
    q = ccd_to_q_cols(pipe, wavelength=1.5405)
    bounds = q.agg(
        F.min("qx"), F.max("qx"), F.min("qy"), F.max("qy"), F.min("qz"), F.max("qz")
    ).collect()[0]
    spec = GridSpec(
        mins=(bounds[0], bounds[2], bounds[4]),
        maxs=(bounds[1] + 1e-9, bounds[3] + 1e-9, bounds[5] + 1e-9),
        sizes=(16, 16, 16),
    )
    vox = grid3d(q, spec).cache()
    n_points = q.count()
    assert vox.agg(F.sum("n")).collect()[0][0] == n_points
    holes = empty_voxels(vox, spec).count()
    assert vox.count() + holes == 16 * 16 * 16
    # 2-D projection keeps total occupancy
    proj = grid_sum_2d(vox)
    assert proj.agg(F.sum("n")).collect()[0][0] == n_points
    vox.unpersist()
