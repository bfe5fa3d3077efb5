"""Baseline JPEG codec tests — SURVEY.md §2.12 L7 (operators/jpeg.py).

Strategy mirrors test_codecs.py: closed-form goldens where the math is
exact (uniform blocks survive quantization exactly at high quality),
tolerance goldens for lossy paths, Hypothesis round-trip fuzz at
quality 100 (all-ones quantization tables, so the only loss is YCbCr
and DCT float rounding), and corrupt-stream error paths — a bad
payload must raise, never return garbage pixels.
"""

import numpy as np
import pytest

from pyspec_spark.operators.codecs import count_frames, decode_frame_at
from pyspec_spark.operators.jpeg import (
    AC_CHROMA_BITS,
    AC_CHROMA_VALS,
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    DC_CHROMA_BITS,
    DC_CHROMA_VALS,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    ZIGZAG,
    _HuffDecoder,
    decode_jpeg_one,
    encode_jpeg,
    jpeg_end,
)
from pyspec_spark.operators.multimodal import synth_image


def test_annex_k_tables_consistent():
    """Each default Huffman table is a valid canonical code: counts sum
    to the value count and the decoder tables build without error."""
    for bits, vals in [
        (DC_LUMA_BITS, DC_LUMA_VALS),
        (DC_CHROMA_BITS, DC_CHROMA_VALS),
        (AC_LUMA_BITS, AC_LUMA_VALS),
        (AC_CHROMA_BITS, AC_CHROMA_VALS),
    ]:
        assert sum(bits) == len(vals)
        _HuffDecoder(bits, vals)  # raises on mismatch
    assert len(AC_LUMA_VALS) == 162 and len(AC_CHROMA_VALS) == 162
    # AC tables cover every (run, size) symbol with size 1..10 plus EOB/ZRL
    for vals in (AC_LUMA_VALS, AC_CHROMA_VALS):
        assert set(vals) == {0x00, 0xF0} | {
            (r << 4) | s for r in range(16) for s in range(1, 11)
        }


def test_zigzag_order():
    """First and last entries of the T.81 zigzag scan, and bijectivity."""
    assert list(ZIGZAG[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert ZIGZAG[63] == 63
    assert sorted(ZIGZAG.tolist()) == list(range(64))


def test_golden_uniform_exact():
    """A uniform image has only DC energy; at quality 92 the DC quant
    step is small enough that every pixel decodes exactly — a
    closed-form golden with known mean and std == 0."""
    img = np.full((16, 24, 3), 120, dtype=np.uint8)
    dec, end = decode_jpeg_one(encode_jpeg(img, quality=92), 0)
    np.testing.assert_array_equal(dec, img)
    assert float(dec.mean()) == 120.0 and float(dec.std()) == 0.0


def test_golden_8x8_block_mean_std():
    """Known 8x8-block image -> known mean/std (VERDICT r3 item 2
    done-criterion): two uniform 8x8 blocks of 64 and 192 give exact
    mean 128 and std 64 after decode at high quality."""
    img = np.zeros((8, 16, 3), dtype=np.uint8)
    img[:, :8] = 64
    img[:, 8:] = 192
    dec, _ = decode_jpeg_one(encode_jpeg(img, quality=95), 0)
    np.testing.assert_array_equal(dec, img)
    assert float(dec.mean()) == 128.0
    assert float(dec.std()) == 64.0


def test_smooth_gradient_tolerance_both_samplings():
    y, x = np.mgrid[0:32, 0:48]
    img = np.stack(
        [
            (50 + x * 2).clip(0, 255),
            (80 + y * 3).clip(0, 255),
            (100 + x + y).clip(0, 255),
        ],
        axis=2,
    ).astype(np.uint8)
    for samp, bound in (("444", 4), ("420", 8)):
        dec, _ = decode_jpeg_one(encode_jpeg(img, quality=92, subsampling=samp), 0)
        err = np.abs(dec.astype(int) - img.astype(int))
        assert err.max() <= bound, (samp, err.max())


def test_grayscale_roundtrip():
    g = synth_image(1, 0, 17, 11)[:, :, 0]
    dec, _ = decode_jpeg_one(encode_jpeg(g, quality=95), 0)
    assert dec.shape == (11, 17, 3)
    np.testing.assert_array_equal(dec[:, :, 0], dec[:, :, 1])
    np.testing.assert_array_equal(dec[:, :, 0], dec[:, :, 2])
    assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).max() <= 2


def test_restart_markers_roundtrip():
    img = synth_image(2, 0, 24, 16)
    plain, _ = decode_jpeg_one(encode_jpeg(img, quality=95), 0)
    for ri in (1, 2, 5):
        enc = encode_jpeg(img, quality=95, restart_interval=ri)
        assert b"\xff\xdd" in enc  # DRI present
        dec, end = decode_jpeg_one(enc, 0)
        assert end == len(enc)
        np.testing.assert_array_equal(dec, plain)


def test_roundtrip_property_q100():
    """Hypothesis fuzz: arbitrary small RGB images at quality 100
    (all-ones quant tables) round-trip within the YCbCr+DCT float
    rounding budget — a tight bound that catches any entropy-coding,
    zigzag, or predictor bug."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    @given(
        img=st.integers(1, 20).flatmap(
            lambda h: st.integers(1, 20).flatmap(
                lambda w: arrays(np.uint8, (h, w, 3), elements=st.integers(0, 255))
            )
        ),
        ri=st.sampled_from([0, 0, 3]),
    )
    @settings(max_examples=60, deadline=None)
    def run(img, ri):
        enc = encode_jpeg(img, quality=100, restart_interval=ri)
        dec, end = decode_jpeg_one(enc, 0)
        assert end == len(enc)
        assert dec.shape == img.shape
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 6

    run()


def test_multiframe_concat_seek():
    """Concatenated JPEGs: frame k reached by marker-walk (jpeg_end)
    without entropy-decoding earlier frames."""
    frames = [synth_image(5, f, 16, 12) for f in range(3)]
    payload = b"".join(encode_jpeg(f, quality=92) for f in frames)
    assert count_frames("jpeg", payload) == 3
    for k, src in enumerate(frames):
        dec = decode_frame_at("jpeg", payload, k)
        assert np.abs(dec.astype(int) - src.astype(int)).mean() < 6
    # jpeg_end agrees with the decoder's own end offset
    p = jpeg_end(payload, 0)
    _, p2 = decode_jpeg_one(payload, 0)
    assert p == p2


def test_corrupt_streams_raise():
    img = synth_image(0, 0, 16, 12)
    enc = encode_jpeg(img, quality=92)
    # not a JPEG at all
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_one(b"\x00" * 32, 0)
    # truncated mid-scan
    with pytest.raises(ValueError):
        decode_jpeg_one(enc[: len(enc) // 2], 0)
    # progressive SOF2 is rejected, not mis-decoded
    prog = bytearray(enc)
    i = bytes(prog).index(b"\xff\xc0")
    prog[i + 1] = 0xC2
    with pytest.raises(ValueError, match="SOF2"):
        decode_jpeg_one(bytes(prog), 0)
    # flipped bytes inside entropy data: raises, never returns garbage
    bad = bytearray(enc)
    bad[-12:-4] = b"\xff\xd8\xff\xd8\xff\xd8\xff\xd8"
    with pytest.raises(ValueError):
        decode_jpeg_one(bytes(bad), 0)


def test_mixed_media_features_executor_side(spark):
    """The mixed PPM/PNG/JPEG corpus flows through extract_features:
    every jpeg row's features equal the local numpy encode->decode
    round-trip exactly (decode is deterministic) and sit within the
    lossy tolerance of the pristine source image."""
    from pyspec_spark.operators.multimodal import (
        extract_features,
        make_mixed_media,
    )

    media = make_mixed_media(spark, n=9, frames=2)
    rows = extract_features(media, sample_every=1).collect()
    # 3 png x1 + 3 ppm x2 + 3 jpeg x1
    assert len(rows) == 3 + 6 + 3
    payloads = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for r in rows:
        mid = r["media_id"]
        if mid % 3 != 2:
            continue
        local = decode_frame_at("jpeg", payloads[mid], 0).astype(np.float64)
        got = np.array(r["features"])
        np.testing.assert_allclose(got[:3], local.mean(axis=(0, 1)), rtol=1e-12)
        np.testing.assert_allclose(got[3:], local.std(axis=(0, 1)), rtol=1e-12)
        src = synth_image(mid, 0).astype(np.float64)
        assert np.abs(got[:3] - src.mean(axis=(0, 1))).max() < 3.0


def test_resize_jpeg_media(spark):
    """resize_media re-encodes jpeg rows losslessly enough: output
    decodes to target dims and approximates the NN-resampled source."""
    from pyspec_spark.operators.multimodal import (
        decode_frame,
        make_mixed_media,
        resize_media,
    )

    media = make_mixed_media(spark, n=3, frames=2, width=8, height=6)
    out = {r["media_id"]: r for r in resize_media(media, 16, 12).collect()}
    r = out[2]
    assert r["codec"] == "jpeg" and r["width"] == 16 and r["height"] == 12
    img = decode_frame("jpeg", bytes(r["payload"]), 16, 12, 0)
    assert img.shape == (12, 16, 3)
    src_dec = decode_frame("jpeg", bytes(
        {m["media_id"]: m for m in media.collect()}[2]["payload"]
    ), 8, 6, 0)
    nn = np.repeat(np.repeat(src_dec, 2, 0), 2, 1)
    assert np.abs(img.astype(int) - nn.astype(int)).mean() < 6


def test_roundtrip_property_q100_420():
    """Hypothesis fuzz of the 4:2:0 path: images built from flat 2x2
    blocks make chroma averaging lossless, so at quality 100 the
    round-trip must stay within the same tight YCbCr+DCT budget as
    4:4:4 — catching multi-block-MCU ordering and upsampling bugs."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    @given(
        base=st.integers(1, 10).flatmap(
            lambda h: st.integers(1, 10).flatmap(
                lambda w: arrays(np.uint8, (h, w, 3), elements=st.integers(0, 255))
            )
        ),
        ri=st.sampled_from([0, 2]),
    )
    @settings(max_examples=40, deadline=None)
    def run(base, ri):
        img = np.repeat(np.repeat(base, 2, 0), 2, 1)
        enc = encode_jpeg(img, quality=100, subsampling="420", restart_interval=ri)
        dec, end = decode_jpeg_one(enc, 0)
        assert end == len(enc)
        assert dec.shape == img.shape
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 6

    run()


def test_non_interleaved_scans_rejected():
    """ADVICE r4: a legal baseline file with per-component scans (or a
    single-component frame declaring sampling >1) must be a clean
    ValueError, not a KeyError / misplaced-block decode."""
    img = synth_image(0, 0, 16, 12)
    enc = bytearray(encode_jpeg(img, quality=92))
    # shrink the SOS header to cover only the first component: a
    # 3-component frame followed by a 1-component scan
    i = bytes(enc).index(b"\xff\xda")
    ln = (enc[i + 2] << 8) | enc[i + 3]
    assert ln == 2 + 1 + 2 * 3 + 3  # 3-component interleaved scan
    one_comp = (
        enc[: i + 2]
        + bytes([0, 2 + 1 + 2 + 3, 1])      # new length, ns=1
        + enc[i + 5 : i + 7]                 # comp 1 spec
        + enc[i + 2 + ln - 3 : ]             # Ss/Se/Ah-Al + entropy
    )
    with pytest.raises(ValueError, match="interleaved"):
        decode_jpeg_one(bytes(one_comp), 0)

    # grayscale frame whose single component claims 2x2 sampling
    genc = bytearray(encode_jpeg(synth_image(0, 0, 20, 12)[:, :, 0]))
    j = bytes(genc).index(b"\xff\xc0")
    # SOF0 payload: len(2) prec(1) h(2) w(2) nc(1) [cid hv tq]
    assert genc[j + 9] == 1  # nc == 1
    genc[j + 11] = 0x22      # hv: 2x2
    with pytest.raises(ValueError, match="non-interleaved"):
        decode_jpeg_one(bytes(genc), 0)
