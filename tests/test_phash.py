"""Perceptual image hashing (operators/phash.py): margin measurement,
the pigeonhole banding guarantee, golden-fixture agreement, and the
q_image_phash_dedup planted-pair recovery."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspec_spark.operators.jpeg import decode_jpeg_one, encode_jpeg
from pyspec_spark.operators.multimodal import synth_image
from pyspec_spark.operators.phash import hamming64, phash64

SF = "/root/testdata/sf0.001"


def _encode_decode(img, q, sub):
    dec, _ = decode_jpeg_one(encode_jpeg(img, quality=q, subsampling=sub), 0)
    return dec


def test_phash_reencode_margin():
    """Re-encode pairs (q92/444 vs q30/420) stay <= 6 bits apart;
    distinct pictures stay >= 10 — tau=7 sits in the gap with margin
    on both sides."""
    hi, lo = [], []
    for i in range(8):
        img = synth_image(i, 0, 48, 36)
        hi.append(phash64(_encode_decode(img, 92, "444")))
        lo.append(phash64(_encode_decode(img, 30, "420")))
    intra = [hamming64(a, b) for a, b in zip(hi, lo)]
    inter = [
        hamming64(hi[i], hi[j])
        for i in range(8)
        for j in range(i + 1, 8)
    ]
    assert max(intra) <= 6
    assert min(inter) >= 10


def test_phash_identical_and_unrelated():
    img = synth_image(3, 0, 48, 36)
    assert hamming64(phash64(img), phash64(img)) == 0
    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, img.shape, dtype=np.uint8)
    assert hamming64(phash64(img), phash64(noise)) >= 10


def test_banding_pigeonhole_guarantee():
    """Any pair within Hamming <= 7 MUST share one of the 8 8-bit
    bands (pigeonhole: 7 flips cannot touch 8 bands) — the property
    that makes the banded join's recall exact at tau=7, checked over
    adversarial flip patterns that spread bits maximally."""
    rng = np.random.default_rng(11)

    def bands(h):
        u = h & ((1 << 64) - 1)
        return [(u >> (8 * b)) & 0xFF for b in range(8)]

    for _ in range(500):
        base = int(rng.integers(0, 1 << 63))
        k = int(rng.integers(0, 8))  # 0..7 flips
        positions = rng.choice(64, size=k, replace=False)
        other = base
        for p in positions:
            other ^= 1 << int(p)
        assert hamming64(base, other) == k
        if k <= 7:
            assert any(x == y for x, y in zip(bands(base), bands(other)))


def test_phash_matches_committed_golden():
    """The committed golden parquet (the q_image_phash_dedup oracle
    input) reproduces from the live encode+decode+hash chain."""
    want = pd.read_parquet("tests/fixtures/phash_golden.parquet")
    got = []
    for i in range(8):
        img = synth_image(i, 0, 48, 36)
        for j, (q, sub) in enumerate(((92, "444"), (30, "420"))):
            got.append(
                {"media_id": 2 * i + j,
                 "phash": phash64(_encode_decode(img, q, sub))}
            )
    pd.testing.assert_frame_equal(
        pd.DataFrame(got), want.sort_values("media_id").reset_index(drop=True)
    )


def test_q_image_phash_dedup_recovers_planted_pairs(spark):
    from pyspec_spark import registry

    registry.load_all()
    rows = registry.QUERIES["q_image_phash_dedup"](spark, SF).collect()
    assert [(r["media_a"], r["media_b"]) for r in rows] == [
        (2 * i, 2 * i + 1) for i in range(8)
    ]
    assert all(r["hamming"] <= 7 for r in rows)
