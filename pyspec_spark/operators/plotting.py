"""Plot / export sinks — the reference's SpecPlot / ccd-plotter analog
(SURVEY.md §2 S6), rendered with ZERO plot libraries: pure numpy
rasterization + the in-repo PNG encoder (operators/codecs.encode_png).

Public-knowledge reference behavior (SURVEY §2 S6 [M]): the reference
plots a scan's normalized counts vs the scan motor with error bars
(SpecPlot), renders gridded CCD volumes as 2-D slice heatmaps
(ccd/plotter), and dumps grids/fits to numpy files.  Here those become
EXPORT SINKS on the engine's result DataFrames:

- ``render_scan_png(df, x, y, yerr=...)`` → PNG bytes of a scatter/
  line plot with error bars (SpecPlot analog for 1-D scans / fits).
- ``render_grid_png(voxels, spec, axis=...)`` → PNG heatmap of a
  summed 2-D projection of the 3-D grid (ccd/plotter analog).
- ``save_npy(arr, path)`` / ``load_npy(path)`` — numpy `.npy` v1.0
  format writer/reader implemented from the PUBLIC format spec
  (numpy NEP — magic, header dict, C-order payload), so grid exports
  round-trip to any numpy consumer without importing numpy.save's
  filesystem semantics.

Scale posture: plotting is a DRIVER-SIDE export of an already-reduced
result (a scan table of ≤ thousands of points, a bounded grid via
to_dense's 50M-cell guard) — it is the terminal sink AFTER the
distributed reduction, never a stage in it.  Row-count guards reject
accidental full-table renders; nothing here ever ships executors a
plot."""

from __future__ import annotations

import struct

import numpy as np

MAX_PLOT_ROWS = 100_000  # a plot beyond this is a data export, not a plot


# ---------------------------------------------------------------------------
# tiny 5x7 bitmap font for axis labels (digits + minus/dot/e only — the
# characters numeric tick labels need).  Each glyph: 7 rows of 5 bits.
# ---------------------------------------------------------------------------
_FONT = {
    "0": "01110 10001 10011 10101 11001 10001 01110",
    "1": "00100 01100 00100 00100 00100 00100 01110",
    "2": "01110 10001 00001 00010 00100 01000 11111",
    "3": "11110 00001 00001 01110 00001 00001 11110",
    "4": "00010 00110 01010 10010 11111 00010 00010",
    "5": "11111 10000 11110 00001 00001 10001 01110",
    "6": "00110 01000 10000 11110 10001 10001 01110",
    "7": "11111 00001 00010 00100 01000 01000 01000",
    "8": "01110 10001 10001 01110 10001 10001 01110",
    "9": "01110 10001 10001 01111 00001 00010 01100",
    "-": "00000 00000 00000 11111 00000 00000 00000",
    ".": "00000 00000 00000 00000 00000 01100 01100",
    "e": "00000 00000 01110 10001 11111 10000 01110",
    "+": "00000 00100 00100 11111 00100 00100 00000",
    " ": "00000 00000 00000 00000 00000 00000 00000",
}


def _draw_text(img: np.ndarray, row: int, col: int, text: str) -> None:
    """Stamp 5x7 glyphs into an (h, w, 3) uint8 canvas (dark pixels)."""
    h, w = img.shape[:2]
    for ch in text:
        glyph = _FONT.get(ch)
        if glyph is None:
            col += 6
            continue
        for r, bits in enumerate(glyph.split()):
            for c, b in enumerate(bits):
                if b == "1" and 0 <= row + r < h and 0 <= col + c < w:
                    img[row + r, col + c] = (32, 32, 32)
        col += 6


def _fmt(v: float) -> str:
    if v == 0:
        return "0"
    a = abs(v)
    if 1e-3 <= a < 1e5:
        s = f"{v:.4g}"
    else:
        s = f"{v:.2e}"
    return s


def _ticks(lo: float, hi: float, n: int = 5) -> list[float]:
    """Round-number tick positions covering [lo, hi] (the classic
    1/2/5 ladder)."""
    if not (np.isfinite(lo) and np.isfinite(hi)):  # NaN/inf: no ticks
        return []
    if hi <= lo:
        return [lo]
    raw = (hi - lo) / max(1, n - 1)
    mag = 10.0 ** np.floor(np.log10(raw))
    for m in (1.0, 2.0, 5.0, 10.0):
        if raw <= m * mag:
            step = m * mag
            break
    start = np.ceil(lo / step) * step
    out = []
    t = start
    while t <= hi + 1e-12 * step:
        out.append(round(t, 12))
        t += step
    return out or [lo]


class _Canvas:
    """Shared axes/frame scaffolding for the two renderers."""

    ML, MR, MT, MB = 46, 12, 10, 22  # margins: left right top bottom

    def __init__(self, width: int, height: int):
        self.w, self.h = width, height
        self.img = np.full((height, width, 3), 255, dtype=np.uint8)
        self.pl, self.pr = self.ML, width - self.MR
        self.pt, self.pb = self.MT, height - self.MB

    def frame(self) -> None:
        i = self.img
        i[self.pt, self.pl : self.pr] = 0
        i[self.pb, self.pl : self.pr] = 0
        i[self.pt : self.pb + 1, self.pl] = 0
        i[self.pt : self.pb + 1, self.pr - 1] = 0

    def x_px(self, v, lo, hi):
        span = (hi - lo) or 1.0
        return self.pl + 1 + (v - lo) / span * (self.pr - self.pl - 3)

    def y_px(self, v, lo, hi):
        span = (hi - lo) or 1.0
        return self.pb - 1 - (v - lo) / span * (self.pb - self.pt - 3)

    def x_axis(self, lo, hi):
        for t in _ticks(lo, hi):
            if not lo <= t <= hi:
                continue
            c = int(self.x_px(t, lo, hi))
            self.img[self.pb : self.pb + 3, c] = 0
            label = _fmt(t)
            _draw_text(self.img, self.pb + 5, c - 3 * len(label), label)

    def y_axis(self, lo, hi):
        for t in _ticks(lo, hi):
            if not lo <= t <= hi:
                continue
            r = int(self.y_px(t, lo, hi))
            self.img[r, self.pl - 3 : self.pl] = 0
            label = _fmt(t)
            _draw_text(self.img, r - 3, max(0, self.pl - 5 - 6 * len(label)), label)


def render_scan_png(
    df,
    x: str,
    y: str,
    yerr: str | None = None,
    width: int = 480,
    height: int = 320,
    line: bool = True,
) -> bytes:
    """SpecPlot analog: scatter+line plot of a (small, already-reduced)
    scan result DataFrame, error bars from ``yerr``, PNG bytes out.

    Driver-side by design (a plot IS a driver artifact); guarded so a
    full fact table can't be collected by accident.  ONE Spark job:
    limit(MAX+1) + collect, with the row-count guard, NaN filtering
    (Spark dropna removes nulls, NOT NaN — e.g. sqrt of a negative
    background-subtracted counter) and the x-sort all driver-side on
    the ≤100k collected points (r6 review items 3 and 7).

    The rasterization itself lives in ``render_points_png`` so a
    per-group executor-side render (the q_plot_golden sink query) uses
    the exact same pixels as this driver-side path."""
    from pyspark.sql import functions as F

    cols = [x, y] + ([yerr] if yerr else [])
    rows = (
        df.select(*[F.col(c).cast("double").alias(f"_c{i}")
                    for i, c in enumerate(cols)])
        .dropna()
        .limit(MAX_PLOT_ROWS + 1)
        .collect()
    )
    if len(rows) > MAX_PLOT_ROWS:
        raise ValueError(
            f"render_scan_png: >{MAX_PLOT_ROWS} rows — reduce first "
            "(this sink plots results, not fact tables)"
        )
    pts = np.array([[r[i] for i in range(len(cols))] for r in rows], dtype=np.float64)
    return render_points_png(
        pts, has_err=yerr is not None, width=width, height=height, line=line
    )


def render_points_png(
    pts: np.ndarray,
    has_err: bool = False,
    width: int = 480,
    height: int = 320,
    line: bool = True,
) -> bytes:
    """Rasterization core shared by the driver-side sink and in-executor
    renders: pts is an (n, 2|3) float64 array of (x, y[, yerr]) in ANY
    row order (a stable x-sort happens here, so a shuffled pandas group
    renders the identical PNG)."""
    pts = np.asarray(pts, dtype=np.float64)
    if pts.size:
        pts = pts[np.isfinite(pts).all(axis=1)]  # NaN/inf rows out
        pts = pts[np.argsort(pts[:, 0], kind="stable")]
    if not pts.size:
        raise ValueError("render_points_png: no rows to plot")
    xs, ys = pts[:, 0], pts[:, 1]
    es = pts[:, 2] if has_err and pts.shape[1] > 2 else None

    xlo, xhi = float(xs.min()), float(xs.max())
    ylo = float((ys - (es if es is not None else 0)).min())
    yhi = float((ys + (es if es is not None else 0)).max())
    if yhi == ylo:
        ylo, yhi = ylo - 0.5, yhi + 0.5
    pad = 0.05 * (yhi - ylo)
    ylo, yhi = ylo - pad, yhi + pad

    cv = _Canvas(width, height)
    px = cv.x_px(xs, xlo, xhi).astype(int)
    py = cv.y_px(ys, ylo, yhi).astype(int)
    img = cv.img
    blue = (40, 80, 200)
    if line and len(xs) > 1:
        for i in range(len(xs) - 1):
            r0, c0, r1, c1 = py[i], px[i], py[i + 1], px[i + 1]
            steps = max(abs(r1 - r0), abs(c1 - c0), 1)
            rr = np.linspace(r0, r1, steps + 1).round().astype(int)
            cc = np.linspace(c0, c1, steps + 1).round().astype(int)
            img[rr.clip(0, height - 1), cc.clip(0, width - 1)] = blue
    if es is not None:
        lo_px = cv.y_px(ys - es, ylo, yhi).astype(int)
        hi_px = cv.y_px(ys + es, ylo, yhi).astype(int)
        for c, rlo, rhi in zip(px, hi_px, lo_px):
            img[max(0, rlo) : min(height, rhi + 1), c] = (150, 150, 150)
            for rr in (rlo, rhi):
                if 0 <= rr < height:
                    img[rr, max(0, c - 2) : min(width, c + 3)] = (150, 150, 150)
    for c, r in zip(px, py):  # markers last, on top
        img[max(0, r - 1) : min(height, r + 2), max(0, c - 1) : min(width, c + 2)] = blue
    cv.frame()
    cv.x_axis(xlo, xhi)
    cv.y_axis(ylo, yhi)

    from pyspec_spark.operators.codecs import encode_png

    return encode_png(img)


# viridis-like 8-stop colormap (public perceptual-ramp shape, hand-set
# stops — NOT a copy of any library's table)
_CMAP = np.array(
    [
        (68, 1, 84),
        (70, 50, 127),
        (54, 92, 141),
        (39, 127, 143),
        (31, 161, 136),
        (74, 194, 110),
        (159, 218, 58),
        (253, 231, 37),
    ],
    dtype=np.float64,
)


def _colorize(norm: np.ndarray) -> np.ndarray:
    """(h, w) in [0,1] → (h, w, 3) uint8 through the 8-stop ramp."""
    t = np.clip(norm, 0.0, 1.0) * (len(_CMAP) - 1)
    i0 = np.floor(t).astype(int)
    i1 = np.minimum(i0 + 1, len(_CMAP) - 1)
    frac = (t - i0)[..., None]
    rgb = _CMAP[i0] * (1 - frac) + _CMAP[i1] * frac
    return rgb.round().astype(np.uint8)


def render_grid_png(
    voxels,
    spec,
    axis: int = 2,
    scale: int = 4,
    log: bool = False,
) -> bytes:
    """ccd/plotter analog: sum the 3-D grid along ``axis`` and render
    the 2-D projection as a colormapped heatmap PNG (nearest-neighbor
    upscaled ``scale``×).  Uses to_dense's 50M-cell guard — plotting is
    for reduced grids, and the distributed sum happened upstream."""
    from pyspec_spark.operators.gridder import to_dense

    data, occu, _ = to_dense(voxels, spec)
    proj = np.asarray(data).sum(axis=axis)
    if log:
        proj = np.log1p(np.maximum(proj, 0.0))
    lo, hi = float(proj.min()), float(proj.max())
    norm = (proj - lo) / ((hi - lo) or 1.0)
    img = _colorize(norm.T[::-1])  # y up, x right — plot convention
    if scale > 1:
        img = img.repeat(scale, axis=0).repeat(scale, axis=1)

    from pyspec_spark.operators.codecs import encode_png

    return encode_png(np.ascontiguousarray(img))


# ---------------------------------------------------------------------------
# numpy .npy v1.0 — implemented from the public format description:
# magic \x93NUMPY, version (1,0), u16-LE header length, python-dict
# header {descr, fortran_order, shape} padded with spaces to 64-byte
# alignment ending in \n, then the raw C-order bytes.
# ---------------------------------------------------------------------------
_NPY_MAGIC = b"\x93NUMPY"

_DESCR = {
    np.dtype("float64"): "<f8",
    np.dtype("float32"): "<f4",
    np.dtype("int64"): "<i8",
    np.dtype("int32"): "<i4",
    np.dtype("uint8"): "|u1",
}


def npy_bytes(arr: np.ndarray) -> bytes:
    """`.npy` v1.0 serialization as bytes — the format core of
    save_npy, reusable where the payload goes to a column or a hash
    instead of a file (q_plot_golden's npy_md5)."""
    dt = np.dtype(arr.dtype)
    if dt.byteorder == ">":
        # normalize BEFORE the descr lookup: dtype equality includes
        # byte order, so '>f8' would fail the table probe and the swap
        # below would be dead code (r6 review item 4)
        arr = arr.astype(dt.newbyteorder("<"))
        dt = np.dtype(arr.dtype)
    if dt not in _DESCR:
        raise ValueError(f"save_npy: unsupported dtype {dt}")
    shape = tuple(int(s) for s in arr.shape)  # before ascontiguousarray
    a = np.ascontiguousarray(arr)             # (it promotes 0-d to 1-d)
    header = (
        "{'descr': '%s', 'fortran_order': False, 'shape': %s, }"
        % (_DESCR[dt], repr(shape))
    )
    base = len(_NPY_MAGIC) + 2 + 2  # magic + version + u16 length
    pad = (64 - (base + len(header) + 1) % 64) % 64
    header = header + " " * pad + "\n"
    return (
        _NPY_MAGIC
        + bytes((1, 0))
        + struct.pack("<H", len(header))
        + header.encode("latin-1")
        + a.tobytes(order="C")
    )


def save_npy(arr: np.ndarray, path: str) -> None:
    """Write `.npy` v1.0 (grids/fits export the reference dumped as
    numpy files)."""
    with open(path, "wb") as fh:
        fh.write(npy_bytes(arr))


def load_npy(path: str) -> np.ndarray:
    """Read back what save_npy wrote (and any v1.0 C-order little-
    endian file of a supported dtype)."""
    import ast

    with open(path, "rb") as fh:
        if fh.read(6) != _NPY_MAGIC:
            raise ValueError("load_npy: bad magic")
        ver = fh.read(2)
        if ver != bytes((1, 0)):
            raise ValueError(f"load_npy: unsupported version {ver!r}")
        (hlen,) = struct.unpack("<H", fh.read(2))
        header = ast.literal_eval(fh.read(hlen).decode("latin-1"))
        if header.get("fortran_order"):
            raise ValueError("load_npy: fortran_order not supported")
        descr = header["descr"]
        shape = header["shape"]
        inv = {v: k for k, v in _DESCR.items()}
        if descr not in inv:
            raise ValueError(f"load_npy: unsupported descr {descr!r}")
        dt = inv[descr]
        n = int(np.prod(shape)) if shape else 1
        buf = fh.read(n * dt.itemsize)
        if len(buf) != n * dt.itemsize:
            raise ValueError("load_npy: truncated payload")
        return np.frombuffer(buf, dtype=dt).reshape(shape).copy()
