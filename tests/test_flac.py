"""FLAC codec (r9) — lossless round-trip, CRC/MD5 integrity, the
contract boundary (LPC / mid-side / non-16-bit), and container
equivalence through the generic audio operators."""

from __future__ import annotations

import numpy as np
import pytest

from pyspec_spark.operators.flac import decode_flac, encode_flac


def test_roundtrip_exact_all_subframe_types():
    rng = np.random.default_rng(3)
    cases = [
        np.full(5000, -123, dtype=np.int16),                    # CONSTANT
        rng.integers(-32768, 32768, 10_000).astype(np.int16),   # VERBATIM
        (2000 * np.sin(np.arange(40_000) / 50)).astype(np.int16),  # FIXED
        np.array([5, -5, 7], dtype=np.int16),                   # < block
        np.array([32767, -32768] * 100, dtype=np.int16),        # extremes
    ]
    for x in cases:
        dec, rate = decode_flac(encode_flac(x, rate=22050))
        assert rate == 22050
        np.testing.assert_array_equal(dec[:, 0], x)


def test_roundtrip_stereo_and_compression():
    rng = np.random.default_rng(7)
    x = np.stack(
        [
            (1500 * np.sin(np.arange(30_001) / 40)).astype(np.int16),
            rng.integers(-50, 50, 30_001).astype(np.int16),
        ],
        axis=1,
    )
    enc = encode_flac(x)
    dec, _ = decode_flac(enc)
    np.testing.assert_array_equal(dec, x)
    assert len(enc) < x.size * 2 * 0.6  # smooth+small signals compress


def test_roundtrip_hypothesis_adversarial_samples():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(data=st.binary(min_size=2, max_size=600))
    @settings(max_examples=40, deadline=None)
    def prop(data):
        x = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2")
        if x.size == 0:
            return
        dec, _ = decode_flac(encode_flac(x))
        np.testing.assert_array_equal(dec[:, 0], x)

    prop()


def test_corruption_is_detected_never_silent():
    x = (1000 * np.sin(np.arange(8000) / 30)).astype(np.int16)
    enc = bytearray(encode_flac(x))
    # flip one bit somewhere in the frame section (past magic+metadata)
    enc[80] ^= 0x10
    with pytest.raises((ValueError, NotImplementedError, IndexError)):
        decode_flac(bytes(enc))


def test_lpc_subframe_hits_contract_boundary():
    """A frame whose subframe type is LPC (0b1xxxxx) must raise the
    contract NotImplementedError, not decode garbage."""
    x = np.zeros(256, dtype=np.int16)
    enc = bytearray(encode_flac(x, block_size=256))
    # locate the first frame: magic(4) + metadata header(4) + 34 bytes
    fstart = 4 + 4 + 34
    assert enc[fstart] == 0xFF and enc[fstart + 1] & 0xFC == 0xF8
    # subframe header is the byte right after the CRC-8: header is
    # 4 bytes fixed + 1 utf8 + 2 blocksize + 1 crc = offset 8
    sub = fstart + 8
    assert enc[sub] & 0x80 == 0  # padding bit
    enc[sub] = (enc[sub] & 0x81) | (0b100000 << 1)  # type := LPC order 1
    with pytest.raises((NotImplementedError, ValueError)) as ei:
        decode_flac(bytes(enc))
    # CRC-8 catches the tamper first unless we recompute — either way
    # nothing decodes silently; with a recomputed CRC it must be the
    # NotImplementedError path:
    from pyspec_spark.operators.flac import _crc8

    enc[fstart + 7] = _crc8(bytes(enc[fstart : fstart + 7]))
    with pytest.raises(NotImplementedError, match="LPC"):
        decode_flac(bytes(enc))


def test_flac_media_equals_wav_media_through_operators(spark):
    """The same signals through WAV and FLAC containers must produce
    IDENTICAL features and landmarks (lossless, end-to-end)."""
    from pyspec_spark.operators.multimodal import (
        audio_landmark_table,
        extract_audio_features,
        make_audio_media,
        make_flac_media,
    )

    w = make_audio_media(spark, n=3)
    f = make_flac_media(spark, n=3)
    fw = {
        (r["media_id"], r["window_id"]): (r["rms"], r["zcr"])
        for r in extract_audio_features(w).collect()
    }
    ff = {
        (r["media_id"], r["window_id"]): (r["rms"], r["zcr"])
        for r in extract_audio_features(f).collect()
    }
    assert fw == ff and len(ff) > 0
    lw = {(r["media_id"], r["lhash"]) for r in audio_landmark_table(w).collect()}
    lf = {(r["media_id"], r["lhash"]) for r in audio_landmark_table(f).collect()}
    assert lw == lf and len(lf) > 0
