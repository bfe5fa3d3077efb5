"""FLAC codec (r9, depth-generalized r10) — lossless round-trip at
every standard depth (8/12/16/20/24/32), CRC/MD5 integrity, every
subframe/stereo/partition branch, the ADVICE-r9 edge cases (extended
frame-number coding, 0-bit raw escape, unknown total, empty streams,
rice-quotient escape fallback), and container equivalence through the
generic audio operators."""

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


def test_lpc_stereo_partition_roundtrips_exact():
    """The real-world tier (r9): LPC subframes (several coefficient
    sets incl. nonzero quantization shift), all three stereo
    decorrelation modes, partition orders > 0, and their combination —
    every path round-trips bit-exactly, including full-scale samples
    through the bps+1 side channel."""
    rng = np.random.default_rng(5)
    mono = (1800 * np.sin(np.arange(20_001) / 45)).astype(np.int16)
    stereo = np.stack(
        [
            mono,
            (mono * 0.7).astype(np.int16)
            + rng.integers(-30, 30, 20_001).astype(np.int16),
        ],
        axis=1,
    )
    ext = np.stack(
        [np.full(4096, 32767, np.int16), np.full(4096, -32768, np.int16)],
        axis=1,
    )
    cases = [
        (dict(lpc=([1], 2, 0)), stereo),
        (dict(lpc=([25, -12, 3], 6, 4)), stereo),
        (dict(lpc=([52, -30, 12, -3], 7, 5)), stereo),
        (dict(stereo_mode="left_side"), stereo),
        (dict(stereo_mode="right_side"), stereo),
        (dict(stereo_mode="mid_side"), stereo),
        (dict(stereo_mode="mid_side", lpc=([3, -3, 1], 4, 0), part_order=2), stereo),
        (dict(part_order=3), mono),
        (dict(stereo_mode="mid_side"), ext),
        (dict(stereo_mode="left_side"), ext),
        (dict(stereo_mode="right_side"), ext),
        (dict(stereo_mode="left_side", part_order=4),
         rng.integers(-32768, 32768, (8192, 2)).astype(np.int16)),
    ]
    for kw, x in cases:
        dec, _ = decode_flac(encode_flac(x, **kw))
        x2 = x[:, None] if x.ndim == 1 else x
        np.testing.assert_array_equal(dec, x2, err_msg=str(kw))


def test_tampered_subframe_type_never_silent():
    """Rewriting a subframe type byte (even with a recomputed header
    CRC) must surface as an error — the CRC-16 / MD5 ladder guarantees
    corruption is never silent."""
    x = np.zeros(256, dtype=np.int16)
    enc = bytearray(encode_flac(x, block_size=256))
    fstart = 4 + 4 + 34
    assert enc[fstart] == 0xFF and enc[fstart + 1] & 0xFC == 0xF8
    sub = fstart + 8
    enc[sub] = (enc[sub] & 0x81) | (0b100000 << 1)  # type := LPC order 1
    with pytest.raises(ValueError):
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


def test_wasted_bits_roundtrip_exact():
    """Wasted-bits subframes (r9): blocks whose samples share trailing
    zero bits store at reduced width and shift back on decode — exact
    through every subframe type, alone and combined with LPC and
    mid/side."""
    rng = np.random.default_rng(9)
    cases = [
        ((2 * rng.integers(-5000, 5000, 9000)).astype(np.int16), {}),
        ((8 * rng.integers(-1000, 1000, 5000)).astype(np.int16), {}),
        (
            (8 * rng.integers(-1000, 1000, 5000)).astype(np.int16),
            dict(lpc=([2, -1], 3, 0)),
        ),
        (
            np.concatenate(
                [
                    4 * rng.integers(-100, 100, 4096),
                    rng.integers(-32768, 32768, 4096),
                ]
            ).astype(np.int16),
            {},
        ),
        (
            np.stack(
                [
                    2 * rng.integers(-500, 500, 8192),
                    2 * rng.integers(-500, 500, 8192),
                ],
                axis=1,
            ).astype(np.int16),
            dict(stereo_mode="mid_side"),
        ),
    ]
    for x, kw in cases:
        dec, _ = decode_flac(encode_flac(x, **kw))
        x2 = x[:, None] if x.ndim == 1 else x
        np.testing.assert_array_equal(dec, x2, err_msg=str(kw))


def test_fuzz_garbage_and_mutations_never_silent():
    """Robustness: random garbage bytes (with and without the magic)
    must raise, and random bit mutations of a valid stream must either
    raise or decode to the EXACT original — the CRC-8/CRC-16/MD5
    ladder leaves no silent-corruption path.  Also a no-hang check:
    the whole fuzz runs in bounded time."""
    rng = np.random.RandomState(11)
    for _ in range(80):
        data = bytes(rng.randint(0, 256, rng.randint(1, 400), dtype=np.uint8))
        if rng.rand() < 0.5:
            data = b"fLaC" + data
        with pytest.raises(Exception):
            decode_flac(data)
    x = (500 * np.sin(np.arange(6000) / 20)).astype(np.int16)
    enc = encode_flac(x)
    for _ in range(80):
        m = bytearray(enc)
        for _ in range(rng.randint(1, 4)):
            m[rng.randint(0, len(m))] ^= 1 << rng.randint(0, 8)
        try:
            dec, _ = decode_flac(bytes(m))
        except Exception:
            continue
        np.testing.assert_array_equal(dec[:, 0], x)


# ---------------------------------------------------------------------------
# r10: depth generalization (8/12/16/20/24/32-bit) + the five ADVICE
# regressions (extended frame-number coding, 0-bit raw escape, unknown
# total_samples, empty streams, rice-quotient escape fallback).
# ---------------------------------------------------------------------------
def test_roundtrip_every_standard_depth():
    rng = np.random.default_rng(11)
    for bps in (8, 12, 16, 20, 24, 32):
        lim = 1 << (bps - 1)
        x = rng.integers(-lim, lim, 6000, dtype=np.int64)
        x[:10] = [0, 1, -1, lim - 1, -lim, 0, lim - 1, -lim, 3, -3]
        dec, rate = decode_flac(encode_flac(x, rate=48000, bps=bps))
        assert rate == 48000
        assert dec.dtype == (np.int16 if bps <= 16 else np.int32)
        np.testing.assert_array_equal(dec[:, 0].astype(np.int64), x)


def test_depth_stereo_lpc_partitions_wasted_bits():
    # every decoder branch at the two non-16 real-world depths
    rng = np.random.default_rng(13)
    for bps in (8, 24):
        lim = 1 << (bps - 1)
        smooth = (0.4 * lim * np.sin(np.arange(9001) / 37)).astype(np.int64)
        noisy = rng.integers(-lim // 4, lim // 4, 9001, dtype=np.int64)
        x = np.stack([smooth, noisy], axis=1)
        for mode in ("independent", "left_side", "right_side", "mid_side"):
            dec, _ = decode_flac(
                encode_flac(
                    x, bps=bps, stereo_mode=mode,
                    lpc=([3, -1], 6, 1), part_order=2,
                )
            )
            np.testing.assert_array_equal(dec.astype(np.int64), x)
        # wasted bits: samples sharing trailing zeros
        w = (x // 16) * 16
        dec, _ = decode_flac(encode_flac(w, bps=bps, stereo_mode="mid_side"))
        np.testing.assert_array_equal(dec.astype(np.int64), w)


def test_depth_range_validation():
    with pytest.raises(ValueError, match="signed range"):
        encode_flac(np.array([300], dtype=np.int64), bps=8)
    with pytest.raises(ValueError, match="unsupported depth"):
        encode_flac(np.array([1], dtype=np.int64), bps=13)


def test_frame_number_coding_full_36_bit_range():
    # ADVICE r9: chr().encode round-trip raised on surrogates (55296)
    # and could not reach the 36-bit spec range at all.
    from pyspec_spark.operators.flac import _read_utf8_code, _utf8_code
    from pyspec_spark.operators.h264 import BitReader

    for n in (0, 1, 0x7F, 0x80, 2047, 2048, 55296, 0xFFFF, 0x10FFFF,
              0x110000, (1 << 31) - 1, (1 << 36) - 1):
        assert _read_utf8_code(BitReader(_utf8_code(n))) == n
    with pytest.raises(ValueError, match="36 bits"):
        _utf8_code(1 << 36)


def test_frame_55296_stream_roundtrips():
    # a stream whose SECOND frame number would be a surrogate is not
    # constructible cheaply; pin the encoder path by encoding enough
    # blocks to cross 0x80 (2-byte coding) and checking losslessness
    x = np.arange(0, 200 * 16, dtype=np.int64) % 251 - 125
    dec, _ = decode_flac(encode_flac(x, block_size=16, bps=16))
    np.testing.assert_array_equal(dec[:, 0].astype(np.int64), x)


def test_raw_escape_zero_bits_decodes_as_zero_partition():
    # ADVICE r9: a conformant stream may store an all-zero partition as
    # a 0-bit raw escape; _signed(bits=0) used to raise.
    from pyspec_spark.operators.flac import _read_residuals
    from pyspec_spark.operators.h264 import BitReader, BitWriter

    w = BitWriter()
    w.u(0, 2)        # method 0 (4-bit params)
    w.u(0, 4)        # partition order 0
    w.u(0b1111, 4)   # escape
    w.u(0, 5)        # raw_bits = 0 -> all-zero partition
    while len(w._bits) % 8:
        w.u(0, 1)
    res = _read_residuals(BitReader(w.bytes()), 12, 0)
    np.testing.assert_array_equal(res, np.zeros(12, dtype=np.int64))


def test_unknown_total_samples_decodes_to_payload_end():
    # ADVICE r9: STREAMINFO total == 0 means UNKNOWN, not empty.
    x = (np.arange(7000, dtype=np.int64) * 13 % 2001) - 1000
    enc = bytearray(encode_flac(x, bps=16))
    # zero the 36-bit total: bits 108..143 of the STREAMINFO body,
    # which starts at byte 8 (4 magic + 4 block header)
    enc[8 + 13] &= 0xF0
    enc[8 + 14 : 8 + 18] = b"\x00" * 4
    dec, _ = decode_flac(bytes(enc))
    np.testing.assert_array_equal(dec[:, 0].astype(np.int64), x)


def test_empty_stream_roundtrips():
    # ADVICE r9: encode of 0 samples used to emit a stream its own
    # decoder could not read (np.concatenate on an empty list).
    for ch_shape in ((0,), (0, 2)):
        dec, rate = decode_flac(
            encode_flac(np.zeros(ch_shape, dtype=np.int64), rate=8000)
        )
        assert rate == 8000
        assert dec.shape == (0, 1 if len(ch_shape) == 1 else 2)


def test_rice_quotient_blowup_falls_back_to_escape():
    # ADVICE r9: spiky residuals around a tiny mean used to raise
    # 'rice quotient blowup'; the partition must escape to raw binary
    # instead.  A forced low-order LPC over a mostly-flat 32-bit signal
    # with huge spikes makes max-quotient >> 10k at the chosen k.
    x = np.zeros(5000, dtype=np.int64)
    x[100] = (1 << 29)
    x[3000] = -(1 << 29)
    enc = encode_flac(x, bps=32, lpc=([1], 2, 0))
    dec, _ = decode_flac(enc)
    np.testing.assert_array_equal(dec[:, 0].astype(np.int64), x)


def test_residual_beyond_raw_escape_width_raises_clearly():
    # the spec's own 31-bit raw-escape ceiling: a forced-LPC plan whose
    # residuals exceed it raises the documented error (the cost-based
    # planner never picks such a plan — VERBATIM is cheaper)
    x = np.zeros(5000, dtype=np.int64)
    x[100] = (1 << 31) - 1
    x[101] = -(1 << 31)
    with pytest.raises(ValueError, match="raw escape"):
        encode_flac(x, bps=32, lpc=([1], 2, 0))


def test_24bit_flac_through_generic_audio_features(spark):
    """Non-16-bit FLAC must flow through the generic media operators
    end-to-end: a 24-bit stream's windowed RMS/ZCR features equal the
    same math computed directly on the source samples (the extractors
    promote to float64, so the int32 decode path changes nothing)."""
    import numpy as np

    from pyspec_spark.operators.flac import encode_flac
    from pyspec_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_audio_features,
    )

    n, win = 4096, 1024
    i = np.arange(n, dtype=np.int64)
    x = ((i * 9973 + 12345) % 2_000_001) - 1_000_000  # needs >16 bits
    media = spark.createDataFrame(
        [(0, "audio", "flac", None, None, n,
          bytearray(encode_flac(x, rate=16000, bps=24)))],
        MEDIA_SCHEMA,
    )
    got = {
        r["window_id"]: (r["rms"], r["zcr"])
        for r in extract_audio_features(media, window=win).collect()
    }
    xf = x.astype(np.float64)
    for w in range(n // win):
        seg = xf[w * win : (w + 1) * win]
        rms = float(np.sqrt(np.mean(seg * seg)))
        zc = float(np.mean(np.abs(np.diff(np.signbit(seg))).astype(np.float64)))
        assert got[w][0] == pytest.approx(rms, rel=1e-12)
        assert got[w][1] == pytest.approx(zc, rel=1e-12)


def test_vectorized_rice_matches_scalar_reference():
    """The r10 vectorized Rice decode (pointer-doubled terminator
    chase + bit-matrix remainders) against a straight per-bit scalar
    reference, across every k the format can emit (0..30, incl. far
    past the encoder's own cap), adversarial value shapes, and
    arbitrary non-byte-aligned start offsets.  The round-trip tests
    pin stream-level behavior; this pins the kernel itself."""
    import numpy as np

    from pyspec_spark.operators.flac import _read_rice
    from pyspec_spark.operators.h264 import BitReader, BitWriter

    def scalar_rice(r, n, k):
        out = np.empty(n, dtype=np.int64)
        for i in range(n):
            q = 0
            while r.u(1) == 0:
                q += 1
            u = (q << k) | (r.u(k) if k else 0)
            out[i] = (u >> 1) ^ -(u & 1)
        return out

    rng = np.random.default_rng(1234)
    for trial in range(60):
        k = int(rng.integers(0, 31))
        n = int(rng.integers(1, 400))
        shape = trial % 4
        if shape == 0:
            vals = rng.integers(-(1 << k) - 3, (1 << k) + 4, n)
        elif shape == 1:
            vals = np.zeros(n, dtype=np.int64)  # all-zero: q=0 runs
        elif shape == 2:
            vals = rng.integers(-5000, 5000, n)  # quotient-heavy at low k
            if k < 4:
                vals = vals // 50
        else:
            vals = ((-1) ** np.arange(n)) * np.arange(n)  # alternating
        vals = vals.astype(np.int64)
        w = BitWriter()
        pad = int(rng.integers(0, 8))
        for _ in range(pad):
            w.u(1, 1)  # non-aligned start, all-ones prefix
        for v in vals:
            u = int(v) * 2 if v >= 0 else -2 * int(v) - 1
            w.u(0, u >> k)
            w.u(1, 1)
            if k:
                w.u(u & ((1 << k) - 1), k)
        w.u(0b10101, 5)  # trailing noise the decode must not consume
        while len(w._bits) % 8:
            w.u(1, 1)  # byte-align (writer asserts alignment)
        data = w.bytes()
        rv = BitReader(data)
        rv._pos = pad
        rs = BitReader(data)
        rs._pos = pad
        got = _read_rice(rv, n, k)
        want = scalar_rice(rs, n, k)
        assert np.array_equal(got, want), (trial, k, n)
        assert rv._pos == rs._pos  # identical consumption

    # truncated stream: loud, never a hang or wrong output
    w = BitWriter()
    w.u(0b10000000, 8)
    short = w.bytes()
    with pytest.raises(ValueError):
        _read_rice(BitReader(short), 50, 3)
