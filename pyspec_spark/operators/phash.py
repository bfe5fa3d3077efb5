"""Perceptual image hashing (pHash) — DCT-based 64-bit fingerprints
for image/frame near-dup detection, pure numpy (clean-room from the
published pHash construction: grayscale → fixed-size resample → 2-D
DCT-II → 8×8 low-frequency block → median threshold → 64 bits).

Why this exists: text near-dup (MinHash/SimHash) cannot see that two
JPEGs are the same picture re-encoded at a different quality — the
bytes share nothing.  pHash is invariant to re-encoding noise (the
low-frequency DCT terms survive quantization) while distinct pictures
land ~32 bits apart (the expectation for independent hashes), so a
Hamming threshold separates re-encodes from genuinely different
content with a wide margin (measured in tests/test_phash.py).

Scale shape mirrors the SimHash corpus path (operators/similarity.py):
64-bit hashes band into 4×16-bit keys, candidates come from band
equality (a Hamming-≤3 pair agrees on ≥1 band by pigeonhole), and the
exact Hamming check runs only on band-collision candidates — never
all pairs.
"""

from __future__ import annotations

import numpy as np

PHASH_SIZE = 32          # resample target (32×32) before the DCT
PHASH_BLOCK = 8          # low-frequency block kept (8×8 − DC = 63+1 bits)


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II matrix (float64)."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


_DCT32 = _dct_matrix(PHASH_SIZE)


def _resample(gray: np.ndarray, size: int) -> np.ndarray:
    """Deterministic nearest-neighbor resample to (size, size) — for
    hashing, alias artifacts are irrelevant; determinism is not."""
    h, w = gray.shape
    ys = (np.arange(size) * h) // size
    xs = (np.arange(size) * w) // size
    return gray[np.ix_(ys, xs)]


def phash64(img: np.ndarray) -> int:
    """64-bit perceptual hash of an (h, w, 3) uint8 image.  Returned
    as a SIGNED int64 (two's complement) so the value round-trips
    through Spark/parquet BIGINT columns unchanged."""
    gray = (
        299 * img[:, :, 0].astype(np.int64)
        + 587 * img[:, :, 1].astype(np.int64)
        + 114 * img[:, :, 2].astype(np.int64)
    )  # ITU-R 601 luma in exact integer milli-units
    small = _resample(gray, PHASH_SIZE).astype(np.float64)
    freq = _DCT32 @ small @ _DCT32.T
    block = freq[:PHASH_BLOCK, :PHASH_BLOCK].flatten()
    med = float(np.median(block[1:]))  # median excludes the DC term
    bits = 0
    for idx, v in enumerate(block):
        if v > med:
            bits |= 1 << idx
    if bits >= 1 << 63:
        bits -= 1 << 64
    return bits


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")
