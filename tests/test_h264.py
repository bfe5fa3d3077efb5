"""H.264 parameter-set codec (operators/h264.py): exp-Golomb + RBSP
escaping properties, SPS/avcC roundtrips, crop arithmetic, and the
q_avc_params media path."""

from __future__ import annotations

import pytest

from pyspec_spark.operators.h264 import (
    BitReader,
    BitWriter,
    _escape_rbsp,
    _unescape_rbsp,
    decode_sps,
    encode_pps,
    encode_sps,
    make_avcc,
    parse_avcc,
)


def test_exp_golomb_roundtrip():
    w = BitWriter()
    vals = list(range(64)) + [255, 1023, 2**16, 2**20 - 1]
    svals = [0, 1, -1, 2, -2, 31, -31, 4096, -4096]
    for v in vals:
        w.ue(v)
    for v in svals:
        w.se(v)
    w.rbsp_trailing()
    r = BitReader(w.bytes())
    assert [r.ue() for _ in vals] == vals
    assert [r.se() for _ in svals] == svals


def test_rbsp_escape_property():
    """Escaped stream never contains 00 00 {00,01,02} and unescape
    inverts escape — including the adversarial all-zero / boundary
    cases hypothesis-style sweeps hit."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(raw=st.binary(max_size=24))
    def prop(raw):
        e = _escape_rbsp(raw)
        for i in range(len(e) - 2):
            assert not (e[i] == 0 and e[i + 1] == 0 and e[i + 2] <= 2)
        assert _unescape_rbsp(e) == raw

    prop()


def test_sps_roundtrip_lattice():
    for pf in (66, 77, 88):
        for wd in (16, 320, 322, 334, 1920):
            for ht in (16, 240, 242, 1080):
                for lv in (10, 30, 41, 51):
                    d = decode_sps(encode_sps(wd, ht, pf, lv))
                    assert (
                        d["profile_idc"], d["level_idc"], d["width"], d["height"]
                    ) == (pf, lv, wd, ht)


def test_sps_escaping_fires_and_roundtrips():
    """sps_id=1024 forces a 00 00 00 run in the raw RBSP, so the NAL
    must carry an emulation-prevention byte and still decode."""
    sps = encode_sps(320, 240, 66, 0, sps_id=1024)
    assert b"\x00\x00\x03" in sps
    d = decode_sps(sps)
    assert (d["width"], d["height"], d["sps_id"]) == (320, 240, 1024)


def test_sps_rejects_odd_and_high_profile():
    with pytest.raises(ValueError, match="even"):
        encode_sps(321, 240)
    with pytest.raises(ValueError, match="profiles"):
        encode_sps(320, 240, profile_idc=100)
    with pytest.raises(ValueError, match="SPS NAL"):
        decode_sps(b"\x68\x00")


def test_avcc_roundtrip_and_mp4_embedding():
    rec = make_avcc(encode_sps(322, 242, 77, 31), encode_pps())
    d = parse_avcc(rec)
    assert (d["profile_idc"], d["level_idc"], d["width"], d["height"]) == (
        77, 31, 322, 242,
    )
    assert d["n_sps"] == d["n_pps"] == 1

    from pyspec_spark.operators.mp4 import make_minimal_mp4, parse_mp4_metadata

    b = make_minimal_mp4(width=334, height=244, codec="avc1", avc_params=(66, 40))
    t = parse_mp4_metadata(b)["tracks"][0]
    # container coded size is mb-rounded; the SPS carries the truth
    assert t["avc"]["width"] == 334 and t["avc"]["height"] == 244
    assert t["codec"] == "avc1"
    # non-avc payloads keep parsing with no avc key set
    t2 = parse_mp4_metadata(make_minimal_mp4(codec="hvc1"))["tracks"][0]
    assert t2.get("avc") is None


def test_q_avc_params_true_dims_differ_from_coded(spark):
    """The declared query reports SPS-cropped dimensions, which differ
    from the mb-rounded coded size for the non-16-multiple media."""
    from pyspec_spark import registry

    registry.load_all()
    rows = registry.QUERIES["q_avc_params"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 8
    n_cropped = sum(
        1 for r in rows if r["width"] % 16 != 0 or r["height"] % 16 != 0
    )
    assert n_cropped >= 5  # crop arithmetic is exercised, not vacuous


# ---------------------------------------------------------------------------
# H.265 twin (operators/h265.py)
# ---------------------------------------------------------------------------
def test_hevc_sps_roundtrip_lattice():
    from pyspec_spark.operators.h265 import decode_hevc_sps, encode_hevc_sps

    for pf in (1, 2):
        for tier in (0, 1):
            for wd in (8, 320, 322, 426, 1918):
                for ht in (8, 238, 242, 1078):
                    for lv in (90, 120, 153):
                        d = decode_hevc_sps(
                            encode_hevc_sps(wd, ht, pf, lv, tier)
                        )
                        assert (
                            d["profile_idc"], d["tier"], d["level_idc"],
                            d["width"], d["height"],
                        ) == (pf, tier, lv, wd, ht)


def test_hvcc_roundtrip_and_mp4_embedding():
    from pyspec_spark.operators.h265 import (
        encode_hevc_sps,
        make_hvcc,
        parse_hvcc,
    )
    from pyspec_spark.operators.mp4 import make_minimal_mp4, parse_mp4_metadata

    d = parse_hvcc(make_hvcc(encode_hevc_sps(426, 238, 2, 120, 1)))
    assert (d["profile_idc"], d["tier"], d["level_idc"], d["width"], d["height"]) == (
        2, 1, 120, 426, 238,
    )
    b = make_minimal_mp4(
        width=426, height=238, codec="hvc1", hevc_params=(1, 0, 93)
    )
    t = parse_mp4_metadata(b)["tracks"][0]
    assert t["hevc"]["width"] == 426 and t["hevc"]["height"] == 238
    assert t["codec"] == "hvc1"


def test_q_hevc_params_window_exercised(spark):
    from pyspec_spark import registry

    registry.load_all()
    rows = registry.QUERIES["q_hevc_params"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 8
    assert sum(1 for r in rows if r["width"] % 8 or r["height"] % 8) >= 5


# ---------------------------------------------------------------------------
# AV1 third (operators/av1.py)
# ---------------------------------------------------------------------------
def test_av1_leb128_roundtrip():
    from pyspec_spark.operators.av1 import _leb128, _read_leb128

    for v in [0, 1, 127, 128, 255, 16383, 16384, 2**28 - 1, 2**32]:
        buf = b"\xaa" + _leb128(v)          # offset start exercised
        got, end = _read_leb128(buf, 1)
        assert got == v and end == len(buf)


def test_av1_seq_header_roundtrip_lattice():
    from pyspec_spark.operators.av1 import (
        decode_seq_header_obu,
        encode_seq_header_obu,
        make_av1c,
        parse_av1c,
    )

    for pf in (0, 1, 2):
        for lvl in (0, 7, 8, 19):
            for tier in (0, 1) if lvl > 7 else (0,):
                for hb in (0, 1):
                    for wd, ht in ((1, 1), (426, 238), (1920, 1080), (4096, 2160)):
                        obu = encode_seq_header_obu(wd, ht, pf, lvl, tier, hb)
                        d = decode_seq_header_obu(obu)
                        assert (
                            d["seq_profile"], d["seq_level_idx"],
                            d["seq_tier"], d["width"], d["height"],
                        ) == (pf, lvl, tier, wd, ht)
                        assert d["bit_depth"] == (10 if hb else 8)
                        assert parse_av1c(make_av1c(obu)) == d


def test_av1_rejects_bad_combinations():
    from pyspec_spark.operators.av1 import (
        decode_seq_header_obu,
        encode_seq_header_obu,
        parse_av1c,
    )

    with pytest.raises(ValueError, match="seq_tier"):
        encode_seq_header_obu(320, 240, 0, 5, 1)
    with pytest.raises(ValueError, match="monochrome"):
        encode_seq_header_obu(320, 240, 1, 8, 0, 0, 1)
    with pytest.raises(ValueError, match="sequence header"):
        decode_seq_header_obu(bytes([0x32, 0x01, 0x00]))  # OBU_FRAME type
    with pytest.raises(ValueError, match="av1C"):
        parse_av1c(b"\x01\x00\x00\x00")  # marker bit missing


def test_av1c_mp4_embedding():
    from pyspec_spark.operators.mp4 import make_minimal_mp4, parse_mp4_metadata

    b = make_minimal_mp4(
        width=640, height=360, codec="av01", av1_params=(0, 12, 1, 1)
    )
    t = parse_mp4_metadata(b)["tracks"][0]
    assert t["codec"] == "av01"
    assert t["av1"] == {
        "seq_profile": 0, "seq_level_idx": 12, "seq_tier": 1,
        "width": 640, "height": 360, "bit_depth": 10, "monochrome": 0,
        "subsampling_x": 1, "subsampling_y": 1,
    }
    # avc media has no av1 key and vice versa
    assert parse_mp4_metadata(
        make_minimal_mp4(codec="avc1", avc_params=(66, 30))
    )["tracks"][0].get("av1") is None


def test_q_av1_params_fields_only_in_obu(spark):
    """Profile/level/tier/bit-depth have no typed container slot — the
    query must surface them from the OBU, and the lattice covers both
    profiles, both tiers, and both bit depths."""
    from pyspec_spark import registry

    registry.load_all()
    rows = registry.QUERIES["q_av1_params"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 8
    assert {r["seq_profile"] for r in rows} == {0, 1}
    assert {r["seq_tier"] for r in rows} == {0, 1}
    assert {r["bit_depth"] for r in rows} == {8, 10}


# ---------------------------------------------------------------------------
# I_PCM frame decode (r8)
# ---------------------------------------------------------------------------
def test_ipcm_roundtrip_exact_random_planes():
    import numpy as np

    from pyspec_spark.operators.h264 import decode_ipcm_idr, encode_ipcm_idr

    rng = np.random.default_rng(5)
    for mbs_w, mbs_h in ((1, 1), (3, 2), (4, 4)):
        y = rng.integers(0, 256, (mbs_h * 16, mbs_w * 16), dtype=np.uint8)
        cb = rng.integers(0, 256, (mbs_h * 8, mbs_w * 8), dtype=np.uint8)
        cr = rng.integers(0, 256, (mbs_h * 8, mbs_w * 8), dtype=np.uint8)
        y2, cb2, cr2 = decode_ipcm_idr(encode_ipcm_idr(y, cb, cr), mbs_w, mbs_h)
        assert (y2 == y).all() and (cb2 == cb).all() and (cr2 == cr).all()


def test_ipcm_zero_planes_stress_emulation_prevention():
    """All-zero samples produce maximal 00-runs in the RBSP — the
    escaping inserts one 03 every two zeros and the decoder must strip
    every one of them."""
    import numpy as np

    from pyspec_spark.operators.h264 import decode_ipcm_idr, encode_ipcm_idr

    y = np.zeros((16, 16), dtype=np.uint8)
    c = np.zeros((8, 8), dtype=np.uint8)
    nal = encode_ipcm_idr(y, c, c)
    assert b"\x00\x00\x03" in nal  # escaping actually fired
    y2, cb2, cr2 = decode_ipcm_idr(nal, 1, 1)
    assert not y2.any() and not cb2.any() and not cr2.any()


def test_ipcm_decoder_rejects_non_ipcm_macroblocks():
    import pytest

    from pyspec_spark.operators.h264 import (
        BitWriter,
        _escape_rbsp,
        decode_ipcm_idr,
    )

    w = BitWriter()
    w.ue(0); w.ue(7); w.ue(0); w.u(0, 4); w.ue(0)
    w.u(0, 1); w.u(0, 1); w.se(0); w.ue(1)
    w.ue(3)  # mb_type I_4x4-class, NOT I_PCM
    w.rbsp_trailing()
    nal = b"\x65" + _escape_rbsp(w.bytes())
    with pytest.raises(NotImplementedError, match="I_PCM"):
        decode_ipcm_idr(nal, 1, 1)


def test_avc_ipcm_movie_decodes_through_generic_frame_path(spark):
    """decode_frame + extract_features run end-to-end on a real avc1
    I_PCM movie — the generic multimodal pipeline, not a special
    path."""
    import numpy as np

    from pyspec_spark.operators.multimodal import (
        decode_frame,
        extract_features,
        ipcm_pattern,
        make_avc_ipcm_media,
    )

    media = make_avc_ipcm_media(spark, n=2, frames=2)
    rows = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    img = decode_frame("mp4", rows[1], 48, 32, 0)
    assert img.shape == (32, 48, 3) and img.dtype == np.uint8
    # the RGB must equal the JFIF conversion of the EXACT source planes
    # (decode is lossless; only the colorspace matrix + clip follow)
    y_src, cb_src, cr_src = ipcm_pattern(1, 0, 48, 32)
    yf = y_src.astype(np.float64)
    cbf = np.repeat(np.repeat(cb_src, 2, 0), 2, 1).astype(np.float64)
    crf = np.repeat(np.repeat(cr_src, 2, 0), 2, 1).astype(np.float64)
    want = np.clip(
        np.round(
            np.stack(
                [
                    yf + 1.402 * (crf - 128.0),
                    yf - 0.344136 * (cbf - 128.0) - 0.714136 * (crf - 128.0),
                    yf + 1.772 * (cbf - 128.0),
                ],
                axis=2,
            )
        ),
        0,
        255,
    ).astype(np.uint8)
    np.testing.assert_array_equal(img, want)
    feats = extract_features(media, sample_every=1).collect()
    assert len(feats) == 4  # 2 media x 2 frames


def test_ipcm_roundtrip_hypothesis_adversarial_bytes():
    """Property pin: ANY byte content round-trips through the I_PCM
    slice — hypothesis drives the plane bytes (shrinking toward the
    00/01/02/03 runs that stress emulation prevention)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pyspec_spark.operators.h264 import decode_ipcm_idr, encode_ipcm_idr

    @given(
        data=st.binary(min_size=384, max_size=384),
    )
    @settings(max_examples=30, deadline=None)
    def prop(data):
        buf = np.frombuffer(data, dtype=np.uint8)
        y = buf[:256].reshape(16, 16)
        cb = buf[256:320].reshape(8, 8)
        cr = buf[320:384].reshape(8, 8)
        y2, cb2, cr2 = decode_ipcm_idr(encode_ipcm_idr(y, cb, cr), 1, 1)
        assert (y2 == y).all() and (cb2 == cb).all() and (cr2 == cr).all()

    prop()
