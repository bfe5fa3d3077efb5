"""Deterministic domain-fixture generators per FIXTURES.md group B.

Seed 42 throughout.  Generated into temp dirs at test time; the same
generators back the golden tests for the SPEC DataSource (B1), the SPE
decoder / frame pipeline (B2), curve fitting (B3), and streaming replay
(B4)."""

from __future__ import annotations

import os
import struct

import numpy as np

MOTORS_0 = ["Theta", "TwoTheta", "Chi", "Phi"]
MOTORS_1 = ["Mu", "Gamma", "Sample_X", "Sample_Y"]
SPEC_COLUMNS = ["Theta", "H", "K", "L", "Epoch", "Seconds", "Monitor", "Detector"]


def gauss(x, a, mu, sig):
    return a * np.exp(-((x - mu) ** 2) / (2 * sig**2))


def make_spec_file(path: str, file_idx: int, n_scans: int = 25) -> dict:
    """Write one synthetic SPEC file; return ground truth per scan.

    Quirks (FIXTURES.md B1), placed in file 0:
      scan 7  — @A MCA continuation lines (1024 ints, 16/line, trailing \\)
      scan 13 — aborted (#C ... aborted) with fewer rows than declared
      scan 19 — duplicate scan number (second #S 19 block)
      scan 21 — different #L column set
      blank lines between scans (all files)
    """
    rng = np.random.default_rng(42 + file_idx)
    truth: dict = {"scans": {}, "file": os.path.basename(path)}
    lines: list[str] = []
    lines.append(f"#F {os.path.basename(path)}")
    lines.append("#E 1300000000")
    lines.append("#D Thu Feb 24 14:05:35 2011")
    lines.append("#O0 " + "  ".join(MOTORS_0))
    lines.append("#O1 " + "  ".join(MOTORS_1))
    lines.append("")

    def emit_scan(n: int, npts: int, aborted: bool = False, mca: bool = False,
                  alt_columns: bool = False) -> dict:
        a, mu, sig = 1000 + 100 * n, 5.0 + 0.1 * n, 0.5
        monitor = 1e5 * (1 + 0.01 * rng.standard_normal())
        intervals = npts - 1
        lines.append(f"#S {n} ascan th {mu - 1:.4f} {mu + 1:.4f} {intervals} 1")
        lines.append(f"#D Thu Feb 24 {14 + (n % 8)}:{n % 60:02d}:35 2011")
        lines.append("#T 1 (Seconds)")
        if n % 2 == 1:
            lines.append(f"#M {monitor:.1f} (Monitor)")
        lines.append("#G0 0 0 0 0")
        lines.append("#G1 1.54 1.54 1.54 90 90 90")
        lines.append("#G2 0 0 0")
        ub = np.round(np.eye(3).flatten() * (1 + 0.01 * n), 6)
        lines.append("#G3 " + " ".join(f"{v:.6f}" for v in ub))
        lines.append("#G4 1.5405 0 0")
        lines.append(f"#Q {0.1 * n:.4f} 0.0000 {1.0 + 0.01 * n:.4f}")
        p0 = np.round(rng.uniform(-10, 10, len(MOTORS_0)), 4)
        p1 = np.round(rng.uniform(-10, 10, len(MOTORS_1)), 4)
        lines.append("#P0 " + " ".join(f"{v:.4f}" for v in p0))
        lines.append("#P1 " + " ".join(f"{v:.4f}" for v in p1))
        cols = ["Theta", "Detector2", "Monitor", "Detector"] if alt_columns else SPEC_COLUMNS
        lines.append(f"#N {len(cols)}")
        lines.append("#L " + "  ".join(cols))
        n_emit = npts // 3 if aborted else npts
        th = np.linspace(mu - 1, mu + 1, npts)
        rows = []
        for i in range(n_emit):
            det = float(np.round(gauss(th[i], a, mu, sig) + 100 + rng.poisson(10)))
            if alt_columns:
                row = [th[i], det / 2, monitor, det]
            else:
                row = [th[i], 0.1 * n, 0.0, 1.0 + 0.01 * n, 1300000000 + i, 1.0, monitor, det]
            rows.append(row)
            lines.append(" ".join(f"{v:.6g}" for v in row))
            if mca and i < 2:  # two points carry MCA spectra
                spec = rng.integers(0, 1000, 1024)
                chunks = [spec[j : j + 16] for j in range(0, 1024, 16)]
                for ci, ch in enumerate(chunks):
                    prefix = "@A " if ci == 0 else ""
                    suffix = " \\" if ci < len(chunks) - 1 else ""
                    lines.append(prefix + " ".join(str(int(v)) for v in ch) + suffix)
        if aborted:
            lines.append("#C Thu Feb 24 14:20:00 2011.  Scan aborted after %d points." % n_emit)
        lines.append("")
        return {
            "n_points": n_emit,
            "n_declared": npts,
            "aborted": aborted,
            "has_mca": mca,
            "columns": cols,
            "motors": dict(zip(MOTORS_0 + MOTORS_1, list(p0) + list(p1))),
            "monitor": monitor if n % 2 == 1 else None,
            "ub": list(ub),
            "peak": {"a": a, "mu": mu, "sig": sig},
        }

    npts_cycle = [11, 41, 81]
    for n in range(1, n_scans + 1):
        if file_idx == 0 and n == 7:
            truth["scans"][n] = emit_scan(n, 11, mca=True)
        elif file_idx == 0 and n == 13:
            truth["scans"][n] = emit_scan(n, 41, aborted=True)
        elif file_idx == 0 and n == 21:
            truth["scans"][n] = emit_scan(n, 11, alt_columns=True)
        else:
            truth["scans"][n] = emit_scan(n, npts_cycle[n % 3])
        if file_idx == 0 and n == 19:  # duplicate scan number
            truth["dup_19"] = emit_scan(19, 11)

    with open(path, "w") as fh:
        fh.write("\n".join(lines))
    return truth


def make_spec_dir(base: str, n_files: int = 3) -> list[dict]:
    os.makedirs(base, exist_ok=True)
    return [
        make_spec_file(os.path.join(base, f"exp{i}.spec"), i) for i in range(n_files)
    ]


# --------------------------------------------------------------------------
# B2 — SPE-v2-like binaries + long-format frames
# --------------------------------------------------------------------------
SPE_HEADER_LEN = 4100
_SPE_DTYPES = {0: np.float32, 1: np.int32, 2: np.int16, 3: np.uint16}


def make_spe_file(path: str, frames: np.ndarray, dtype_code: int = 0) -> None:
    """Write an SPE-v2-like binary: 4100-B header with xdim uint16@42,
    dtype int16@108, ydim uint16@656, nframes int32@1446 (FIXTURES B2)."""
    nframes, ydim, xdim = frames.shape
    header = bytearray(SPE_HEADER_LEN)
    struct.pack_into("<H", header, 42, xdim)
    struct.pack_into("<h", header, 108, dtype_code)
    struct.pack_into("<H", header, 656, ydim)
    struct.pack_into("<i", header, 1446, nframes)
    body = frames.astype(_SPE_DTYPES[dtype_code]).tobytes()
    with open(path, "wb") as fh:
        fh.write(bytes(header) + body)


def make_frames(n_scans: int = 4, n_frames: int = 8, dim: int = 64):
    """Synthetic detector frames: drifting 2-D gaussian spot + dark level
    100 + seeded poisson noise.  Returns (frames_array dict, dark)."""
    rng = np.random.default_rng(42)
    y, x = np.mgrid[0:dim, 0:dim]
    out = {}
    for s in range(n_scans):
        stack = np.empty((n_frames, dim, dim), dtype=np.float64)
        for f in range(n_frames):
            cx, cy = 20 + 2 * f + s, 30 + f
            spot = 5000 * np.exp(-(((x - cx) ** 2) + ((y - cy) ** 2)) / (2 * 9.0))
            stack[f] = spot + 100 + rng.poisson(10, (dim, dim))
        out[s] = stack
    dark = 100 + rng.poisson(10, (dim, dim)).astype(np.float64)
    return out, dark


# --------------------------------------------------------------------------
# B3 — fit targets
# --------------------------------------------------------------------------
def make_fit_targets(n_series: int = 20, npts: int = 81):
    """y = model(x; p) + N(0, e); 4 models cycling; returns rows + truth."""
    rng = np.random.default_rng(42)
    rows = []
    truth = {}
    for s in range(n_series):
        x = np.linspace(-10, 10, npts)
        kind = ("gauss", "lor", "pvoight", "linear+gauss")[s % 4]
        a = rng.uniform(50, 150)
        mu = rng.uniform(-3, 3)
        sig = rng.uniform(0.5, 2.0)
        if kind == "gauss":
            y0 = gauss(x, a, mu, sig)
            p = [a, mu, sig]
        elif kind == "lor":
            y0 = a / (1 + ((x - mu) / sig) ** 2)
            p = [a, mu, sig]
        elif kind == "pvoight":
            eta = 0.5
            y0 = a * (
                eta / (1 + ((x - mu) / sig) ** 2)
                + (1 - eta) * np.exp(-((x - mu) ** 2) / (2 * sig**2))
            )
            p = [a, mu, sig, eta]
        else:
            m, b = rng.uniform(-2, 2), rng.uniform(0, 20)
            y0 = m * x + b + gauss(x, a, mu, sig)
            p = [m, b, a, mu, sig]
        e = np.maximum(np.sqrt(np.abs(y0)), 1.0)
        y = y0 + rng.normal(0, 1.0, npts) * e * 0.1
        truth[s] = {"model": kind, "p": p}
        for i in range(npts):
            rows.append((s, float(x[i]), float(y[i]), float(e[i]), kind))
    return rows, truth
