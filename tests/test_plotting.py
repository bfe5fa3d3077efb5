"""Plot/export sinks (SURVEY §2 S6 residue closed in r6): SpecPlot /
ccd-plotter analogs rendered via the in-repo PNG encoder, and the
public `.npy` v1.0 format writer — all verified by decoding our own
output back (the codec round-trip proof pattern)."""

from __future__ import annotations

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# .npy — pure format tests, no Spark
# ---------------------------------------------------------------------------
@pytest.mark.parametrize(
    "arr",
    [
        np.arange(24, dtype=np.float64).reshape(2, 3, 4) * 1.5,
        np.arange(10, dtype=np.int64) - 5,
        np.array([[1, 2], [3, 4]], dtype=np.int32),
        np.zeros((3, 0, 2), dtype=np.float32),
        np.array(7.5, dtype=np.float64),  # 0-d
        (np.arange(12, dtype=np.uint8).reshape(3, 4)),
    ],
)
def test_npy_roundtrip_ours(tmp_path, arr):
    from pyspec_spark.operators.plotting import load_npy, save_npy

    p = str(tmp_path / "a.npy")
    save_npy(arr, p)
    back = load_npy(p)
    assert back.dtype == arr.dtype
    assert back.shape == arr.shape
    assert np.array_equal(back, arr)


def test_npy_interop_with_numpy(tmp_path):
    """Our writer is readable by numpy and vice versa — the format is
    the public contract, not a private serialization."""
    from pyspec_spark.operators.plotting import load_npy, save_npy

    arr = np.linspace(0, 1, 31).reshape(31, 1).astype(np.float64)
    ours = str(tmp_path / "ours.npy")
    save_npy(arr, ours)
    assert np.array_equal(np.load(ours), arr)

    theirs = str(tmp_path / "theirs.npy")
    np.save(theirs, arr)
    assert np.array_equal(load_npy(theirs), arr)


def test_npy_corrupt_raises(tmp_path):
    from pyspec_spark.operators.plotting import load_npy, save_npy

    p = str(tmp_path / "a.npy")
    save_npy(np.arange(6, dtype=np.float64), p)
    whole = open(p, "rb").read()
    truncated = str(tmp_path / "t.npy")
    open(truncated, "wb").write(whole[:-8])
    with pytest.raises(ValueError, match="truncated"):
        load_npy(truncated)
    bad = str(tmp_path / "b.npy")
    open(bad, "wb").write(b"NOTNPY" + whole[6:])
    with pytest.raises(ValueError, match="magic"):
        load_npy(bad)


# ---------------------------------------------------------------------------
# scan plot — decode our own PNG back and assert pixel facts
# ---------------------------------------------------------------------------
def _decode(png: bytes) -> np.ndarray:
    from pyspec_spark.operators.codecs import decode_frame_at

    return decode_frame_at("png", png, 0)


def test_render_scan_png_structure(spark):
    import pandas as pd

    from pyspec_spark.operators.plotting import render_scan_png

    pdf = pd.DataFrame(
        {
            "theta": np.linspace(10.0, 20.0, 21),
            "counts": 100 + 80 * np.exp(-0.5 * ((np.linspace(10, 20, 21) - 15) / 1.2) ** 2),
            "err": np.full(21, 5.0),
        }
    )
    df = spark.createDataFrame(pdf)
    png = render_scan_png(df, "theta", "counts", yerr="err", width=320, height=240)
    img = _decode(png)
    assert img.shape == (240, 320, 3)
    # white background present
    assert (img == 255).all(axis=2).mean() > 0.5
    # blue data marks present (marker/line color)
    blue = (img[:, :, 2] > 150) & (img[:, :, 0] < 100)
    assert blue.sum() > 20
    # black frame on all four plot-box edges
    assert (img == 0).all(axis=2).any()
    # gray error bars present
    gray = (
        (img[:, :, 0] == 150) & (img[:, :, 1] == 150) & (img[:, :, 2] == 150)
    )
    assert gray.sum() > 20


def test_render_scan_png_guards(spark):
    from pyspec_spark.operators.plotting import render_scan_png

    empty = spark.range(0).selectExpr("id as x", "id as y")
    with pytest.raises(ValueError, match="no rows"):
        render_scan_png(empty, "x", "y")


def test_render_scan_png_deterministic(spark):
    from pyspec_spark.operators.plotting import render_scan_png

    df = spark.range(16).selectExpr(
        "cast(id as double) as x", "cast(id * id as double) as y"
    )
    assert render_scan_png(df, "x", "y") == render_scan_png(df, "x", "y")


# ---------------------------------------------------------------------------
# grid heatmap — through the real gridder path
# ---------------------------------------------------------------------------
def test_render_grid_png(spark):
    from pyspec_spark.operators.gridder import GridSpec, grid3d
    from pyspec_spark.operators.plotting import render_grid_png

    rng = np.random.default_rng(5)
    n = 4000
    import pandas as pd

    pts = pd.DataFrame(
        {
            "qx": rng.uniform(0, 1, n),
            "qy": rng.uniform(0, 1, n),
            "qz": rng.uniform(0, 1, n),
            "intensity": rng.exponential(10.0, n),
        }
    )
    # plant a hot voxel so the colormap's top end is exercised
    pts.loc[:50, ["qx", "qy", "qz"]] = 0.55
    pts.loc[:50, "intensity"] = 500.0
    df = spark.createDataFrame(pts)
    spec = GridSpec(mins=(0, 0, 0), maxs=(1, 1, 1), sizes=(8, 8, 8))
    voxels = grid3d(df, spec)
    png = render_grid_png(voxels, spec, axis=2, scale=4)
    img = _decode(png)
    assert img.shape == (32, 32, 3)
    # hot cell renders at the bright end of the ramp (yellow-ish),
    # background at the dark end (purple-ish)
    assert img[:, :, 0].max() > 200  # bright stop reached
    flat = img.reshape(-1, 3)
    assert (flat[:, 2] > flat[:, 0]).mean() > 0.3  # dark-blue field


def test_render_scan_png_filters_nan(spark):
    """NaN y/yerr rows (e.g. sqrt of a negative background-subtracted
    counter) are filtered, not crashed on — Spark dropna() removes
    nulls only, so the driver-side isfinite filter must catch NaN
    (r6 review)."""
    import pandas as pd

    from pyspec_spark.operators.plotting import render_scan_png

    pdf = pd.DataFrame(
        {
            "x": [1.0, 2.0, 3.0, 4.0],
            "y": [1.0, float("nan"), 3.0, 4.0],
            "e": [0.1, 0.1, float("nan"), 0.1],
        }
    )
    png = render_scan_png(spark.createDataFrame(pdf), "x", "y", yerr="e")
    img = _decode(png)
    assert img.shape[2] == 3  # rendered fine from the 2 finite rows
    # all-NaN input refuses cleanly
    bad = pd.DataFrame({"x": [1.0], "y": [float("nan")]})
    with pytest.raises(ValueError, match="no rows"):
        render_scan_png(spark.createDataFrame(bad), "x", "y")


def test_npy_big_endian_normalized(tmp_path):
    """'>f8' input is byteswapped to little-endian before the descr
    lookup (r6 review: the swap branch was dead code behind the
    lookup) — and numpy reads the result back equal."""
    from pyspec_spark.operators.plotting import load_npy, save_npy

    arr = np.arange(6, dtype=">f8").reshape(2, 3) * 1.25
    p = str(tmp_path / "be.npy")
    save_npy(arr, p)
    back = load_npy(p)
    assert back.dtype == np.dtype("<f8")
    assert np.array_equal(back, arr.astype("<f8"))
    assert np.array_equal(np.load(p), arr.astype("<f8"))


def test_plot_golden_executor_render_matches_driver_path(spark):
    """The in-executor per-group render (q_plot_golden) and the
    driver-side render_scan_png sink must produce byte-identical PNGs —
    one rasterization core, two entry points — and the committed golden
    parquet pins both."""
    import hashlib

    import pandas as pd

    from pyspec_spark.queries.plots import (
        _PLOT_GOLDEN,
        q_plot_golden,
        synthetic_scans,
    )
    from pyspec_spark.operators.plotting import render_scan_png

    golden = pd.read_parquet(_PLOT_GOLDEN).set_index("plot_id")
    got = {r["plot_id"]: r for r in q_plot_golden.__wrapped__(
        spark, "ignored").collect()}
    assert set(got) == set(golden.index)
    for pid, r in got.items():
        assert r["png_md5"] == golden.loc[pid, "png_md5"]
        assert r["npy_md5"] == golden.loc[pid, "npy_md5"]
    # driver-side sink renders plot 0 to the same bytes
    one = synthetic_scans(spark).where("plot_id = 0")
    png = render_scan_png(one, "x", "y", yerr="yerr")
    assert hashlib.md5(png).hexdigest() == golden.loc[0, "png_md5"]
