"""Real image codecs (operators/codecs.py) + the de-stubbed L7 pipeline.

Golden strategy: `synth_image` is a closed-form per-channel affine
gradient, so expected frame means are computable without running any
codec — encode -> decode -> feature means must reproduce them exactly
(uint8 arithmetic, no lossy step anywhere in PPM/PGM/PNG).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspec_spark.operators.codecs import (
    count_frames,
    decode_frame_at,
    encode_pgm,
    encode_png,
    encode_ppm,
)
from pyspec_spark.operators.multimodal import synth_image


def _img(seed: int = 0, h: int = 12, w: int = 16) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


# ---------------------------------------------------------------------------
# PPM / PGM
# ---------------------------------------------------------------------------
def test_ppm_roundtrip():
    img = _img(1)
    out = decode_frame_at("ppm", encode_ppm(img), 0)
    np.testing.assert_array_equal(out, img)


def test_pgm_roundtrip_replicates_gray():
    gray = _img(2)[:, :, 0]
    out = decode_frame_at("pgm", encode_pgm(gray), 0)
    assert out.shape == (*gray.shape, 3)
    for c in range(3):
        np.testing.assert_array_equal(out[:, :, c], gray)


def test_ppm_header_comments_and_whitespace():
    img = _img(3, h=2, w=3)
    raw = b"P6 # a comment\n# another\n 3\t2 # dims\n255\n" + img.tobytes()
    np.testing.assert_array_equal(decode_frame_at("ppm", raw, 0), img)


def test_ppm_truncated_raises():
    data = encode_ppm(_img(4))[:-5]
    with pytest.raises(ValueError, match="truncated"):
        decode_frame_at("ppm", data, 0)


def test_ppm_multiframe_concat_seek():
    frames = [_img(s) for s in range(5)]
    payload = b"".join(encode_ppm(f) for f in frames)
    assert count_frames("ppm", payload) == 5
    for k in (0, 2, 4):
        np.testing.assert_array_equal(decode_frame_at("ppm", payload, k), frames[k])


# ---------------------------------------------------------------------------
# PNG — every filter type and channel count
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_filters(filter_type):
    img = _img(10 + filter_type)
    out = decode_frame_at("png", encode_png(img, filter_type), 0)
    np.testing.assert_array_equal(out, img)


def test_png_grayscale_and_alpha_channels():
    rng = np.random.default_rng(7)
    gray = rng.integers(0, 256, (5, 9), dtype=np.uint8)
    out = decode_frame_at("png", encode_png(gray, 4), 0)
    for c in range(3):
        np.testing.assert_array_equal(out[:, :, c], gray)
    # gray+alpha -> gray replicated
    ga = rng.integers(0, 256, (5, 9, 2), dtype=np.uint8)
    out = decode_frame_at("png", encode_png(ga, 1), 0)
    for c in range(3):
        np.testing.assert_array_equal(out[:, :, c], ga[:, :, 0])
    # RGBA -> alpha dropped
    rgba = rng.integers(0, 256, (5, 9, 4), dtype=np.uint8)
    out = decode_frame_at("png", encode_png(rgba, 3), 0)
    np.testing.assert_array_equal(out, rgba[:, :, :3])


def test_png_multiframe_concat_seek():
    frames = [_img(20 + s) for s in range(3)]
    payload = b"".join(encode_png(f, ft) for ft, f in enumerate(frames))
    assert count_frames("png", payload) == 3
    for k in range(3):
        np.testing.assert_array_equal(decode_frame_at("png", payload, k), frames[k])


def test_png_bad_signature_raises():
    with pytest.raises(ValueError, match="signature"):
        decode_frame_at("png", b"NOTAPNG" + b"\x00" * 64, 0)


def test_png_16bit_rejected():
    data = bytearray(encode_png(_img(30)))
    # IHDR depth byte lives at offset 8(sig)+8(len/type)+8(w,h) = 24
    data[24] = 16
    with pytest.raises(ValueError, match="8-bit"):
        decode_frame_at("png", bytes(data), 0)


# ---------------------------------------------------------------------------
# Golden: known image -> known mean/std (VERDICT r2 item 1 done-criterion)
# ---------------------------------------------------------------------------
def test_golden_mean_std_png():
    """synth_image(0,0) red channel is (3x+5y)%256 on 16x12 — mean is
    closed-form: no value reaches 256, so mean = 3*mean(x)+5*mean(y)
    = 3*7.5 + 5*5.5 = 50.0."""
    img = synth_image(0, 0)
    assert float(img[:, :, 0].mean()) == 50.0
    decoded = decode_frame_at("png", encode_png(img, 2), 0)
    np.testing.assert_array_equal(decoded, img)
    assert float(decoded[:, :, 0].mean()) == 50.0
    assert float(decoded[:, :, 0].std()) == pytest.approx(
        float(img[:, :, 0].std())
    )


def test_extract_features_real_decode_golden(spark):
    """The declared L7 pipeline end-to-end: real PNG/PPM payloads,
    decode inside mapInPandas on executors, feature means equal the
    numpy means of the source images exactly."""
    from pyspec_spark.operators.multimodal import extract_features, make_real_media

    media = make_real_media(spark, n=6, frames=4)
    rows = extract_features(media, sample_every=2).collect()
    assert len(rows) == 3 * 1 + 3 * 2  # 3 images x 1 frame + 3 videos x 2
    for r in rows:
        expect = synth_image(r["media_id"], r["frame_id"]).astype(np.float64)
        got = np.array(r["features"])
        np.testing.assert_allclose(got[:3], expect.mean(axis=(0, 1)), rtol=1e-12)
        np.testing.assert_allclose(got[3:], expect.std(axis=(0, 1)), rtol=1e-12)


def test_resize_media_real(spark):
    """Resize decodes, NN-resamples, and re-encodes every frame: output
    payloads decode to the target dims, and a 2x integer upscale is
    exact block replication of the source pixels."""
    from pyspec_spark.operators.multimodal import (
        decode_frame,
        extract_features,
        make_real_media,
        resize_media,
    )

    media = make_real_media(spark, n=4, frames=3, width=8, height=6)
    out = resize_media(media, width=16, height=12)
    rows = {r["media_id"]: r for r in out.collect()}
    assert all(r["width"] == 16 and r["height"] == 12 for r in rows.values())
    for mid, r in rows.items():
        n = int(r["n_frames"])
        for f in range(n):
            img = decode_frame(r["codec"], bytes(r["payload"]), 16, 12, f)
            assert img.shape == (12, 16, 3)
            src = synth_image(mid, f if r["kind"] == "video" else 0, 8, 6)
            # nearest-neighbor 2x: each source pixel becomes a 2x2 block
            np.testing.assert_array_equal(img, np.repeat(np.repeat(src, 2, 0), 2, 1))
    # resized media flows through the rest of the pipeline unchanged
    feats = extract_features(out, sample_every=2).collect()
    assert all(len(r["features"]) == 6 for r in feats)


def test_png_roundtrip_property():
    """Hypothesis fuzz: arbitrary small images x all channel counts x
    all filter types round-trip exactly (the unfilter paths 1/3/4 have
    per-pixel predictor arithmetic worth fuzzing)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    @given(
        img=st.integers(1, 7).flatmap(
            lambda h: st.integers(1, 7).flatmap(
                lambda w: st.sampled_from([1, 2, 3, 4]).flatmap(
                    lambda c: arrays(
                        np.uint8,
                        (h, w, c),
                        elements=st.integers(0, 255),
                    )
                )
            )
        ),
        ft=st.sampled_from([0, 1, 2, 3, 4]),
    )
    @settings(max_examples=200, deadline=None)
    def run(img, ft):
        data = encode_png(img, ft)
        out = decode_frame_at("png", data, 0)
        c = img.shape[2]
        if c == 1:
            np.testing.assert_array_equal(out[:, :, 0], img[:, :, 0])
        elif c == 2:  # gray+alpha -> replicated gray
            np.testing.assert_array_equal(out[:, :, 0], img[:, :, 0])
        else:
            np.testing.assert_array_equal(out, img[:, :, :3])

    run()


def test_ppm_wav_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    @given(
        img=st.integers(1, 9).flatmap(
            lambda h: st.integers(1, 9).flatmap(
                lambda w: arrays(np.uint8, (h, w, 3), elements=st.integers(0, 255))
            )
        )
    )
    @settings(max_examples=100, deadline=None)
    def run_img(img):
        np.testing.assert_array_equal(
            decode_frame_at("ppm", encode_ppm(img), 0), img
        )

    run_img()

    from pyspec_spark.operators.codecs import decode_wav, encode_wav

    @given(
        s=st.integers(1, 200).flatmap(
            lambda n: st.sampled_from([1, 2]).flatmap(
                lambda ch: arrays(
                    np.int16, (n, ch), elements=st.integers(-32768, 32767)
                )
            )
        )
    )
    @settings(max_examples=100, deadline=None)
    def run_wav(s):
        out, rate = decode_wav(encode_wav(s, 8000))
        assert rate == 8000
        np.testing.assert_array_equal(out, s)

    run_wav()


def test_wav_roundtrip():
    from pyspec_spark.operators.codecs import decode_wav, encode_wav

    rng = np.random.default_rng(5)
    mono = rng.integers(-32768, 32767, 1000, dtype=np.int16)
    out, rate = decode_wav(encode_wav(mono, 8000))
    assert rate == 8000 and out.shape == (1000, 1)
    np.testing.assert_array_equal(out[:, 0], mono)
    stereo = rng.integers(-32768, 32767, (500, 2), dtype=np.int16)
    out, rate = decode_wav(encode_wav(stereo, 44100))
    assert rate == 44100
    np.testing.assert_array_equal(out, stereo)
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"nope" + b"\x00" * 64)


def test_audio_features_golden(spark):
    """Sine at f=100(i+1) Hz, amplitude 1000(i+1): every full window's
    RMS ~ A/sqrt(2) and zero-crossing rate ~ 2f/rate."""
    from pyspec_spark.operators.multimodal import (
        extract_audio_features,
        make_audio_media,
    )

    media = make_audio_media(spark, n=3, rate=16000)
    rows = extract_audio_features(media, window=1024).collect()
    assert len(rows) == 3 * (16000 // 1024)
    for r in rows:
        i = r["media_id"]
        a, f = 1000.0 * (i + 1), 100.0 * (i + 1)
        assert r["rms"] == pytest.approx(a / math.sqrt(2), rel=0.02)
        assert r["zcr"] == pytest.approx(2 * f / 16000, rel=0.15)


def test_q_audio_features_declared(spark):
    from pyspec_spark.queries.llm_advanced import q_audio_features

    out = q_audio_features.__wrapped__(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert out.columns == ["media_id", "window_id", "rms", "zcr"]
    assert len(rows) == 8 * (16000 // 1024)
    # deterministic
    assert rows == q_audio_features.__wrapped__(spark, "/root/testdata/sf0.001").collect()


def test_audio_arr_oracle_twin_matches_codec_path(spark):
    """q_audio_features_arr (oracle-checked declarative feature math)
    and extract_audio_features (WAV codec + mapInPandas) must produce
    IDENTICAL numbers on the same sample stream: encode the query's
    integer stream as real WAV PCM, run the codec path, compare.  This
    closes the loop the oracle can't — DuckDB can't parse RIFF, but
    both engines agree on the math, and the codec path agrees with the
    math path."""
    from pyspec_spark.operators.codecs import encode_wav
    from pyspec_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_audio_features,
    )
    from pyspec_spark.queries.llm_advanced import (
        _AUDIO_N,
        _AUDIO_N_MEDIA,
        _AUDIO_WINDOW,
        audio_arr_sample,
        q_audio_features_arr,
    )

    rows = []
    for i in range(_AUDIO_N_MEDIA):
        k = np.arange(_AUDIO_N, dtype=np.int64)
        s = audio_arr_sample(i, k).astype(np.int16)
        rows.append((i, "audio", "wav", None, None, _AUDIO_N,
                     bytearray(encode_wav(s, 16000))))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    codec_rows = {
        (r["media_id"], r["window_id"]): (round(r["rms"], 6), round(r["zcr"], 6))
        for r in extract_audio_features(media, window=_AUDIO_WINDOW).collect()
    }
    arr_rows = {
        (r["media_id"], r["window_id"]): (r["rms"], r["zcr"])
        for r in q_audio_features_arr.__wrapped__(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert codec_rows == arr_rows
    assert len(arr_rows) == _AUDIO_N_MEDIA * (_AUDIO_N // _AUDIO_WINDOW)


def test_resize_non_integer_scale(spark):
    """NN resampling at a non-integer ratio: output pixel (y, x) must
    equal source pixel (y*src_h//dst_h, x*src_w//dst_w) exactly."""
    from pyspec_spark.operators.multimodal import (
        decode_frame,
        make_real_media,
        resize_media,
    )

    media = make_real_media(spark, n=2, frames=2, width=7, height=5)
    out = {r["media_id"]: r for r in resize_media(media, width=11, height=4).collect()}
    for mid, r in out.items():
        img = decode_frame(r["codec"], bytes(r["payload"]), 11, 4, 0)
        src = synth_image(mid, 0, 7, 5)
        ry = (np.arange(4) * 5) // 4
        rx = (np.arange(11) * 7) // 11
        np.testing.assert_array_equal(img, src[ry][:, rx])


def test_png_corrupt_idat_raises_cleanly():
    data = bytearray(encode_png(_img(77)))
    # find the IDAT chunk and flip bytes in its zlib body
    i = bytes(data).index(b"IDAT")
    data[i + 8 : i + 12] = b"\xff\xff\xff\xff"
    with pytest.raises(Exception):  # zlib error or size mismatch, never garbage
        decode_frame_at("png", bytes(data), 0)


def test_q_multimodal_features_runs_on_real_bytes(spark):
    from pyspec_spark.queries.llm_advanced import q_multimodal_features

    out = q_multimodal_features(spark, "/root/testdata/sf0.001").collect()
    # mixed corpus (n=18): 6 PNG images x1 + 6 PPM videos x2 sampled
    # frames + 6 JPEG images x1
    assert len(out) == 6 * 1 + 6 * 2 + 6 * 1
    # spot-check a golden: media 0 (PNG, lossless) frame 0 mean_r is exactly 50.0
    first = out[0]
    assert (first["media_id"], first["frame_id"]) == (0, 0)
    assert first["mean_r"] == pytest.approx(50.0)
    # jpeg rows (media_id % 3 == 2) are lossy: mean_r within 2 of source
    for r in out:
        if r["media_id"] % 3 == 2:
            src = synth_image(r["media_id"], 0)
            assert abs(r["mean_r"] - float(src[:, :, 0].mean())) < 2.0
