"""HEVC PCM I-slice frame decode (r9) — the hvc1 twin of the r8 avc1
I_PCM suite (tests/test_h264.py), plus CABAC-engine-specific pins:
the all-PCM path exercises real context-coded decisions, terminate
bins, per-PCM engine re-init, and the written-bits == fetched-bits
flush invariant that makes mid-stream byte alignment unambiguous."""

from __future__ import annotations

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# CABAC engine
# ---------------------------------------------------------------------------
def test_cabac_decision_roundtrip_random_bin_sequences():
    """Arbitrary bin sequences through ONE shared context round-trip
    exactly, and encoder/decoder context states stay in lockstep
    (state divergence would corrupt every later bin)."""
    from pyspec_spark.operators.h264 import BitReader, BitWriter
    from pyspec_spark.operators.h265 import (
        _CabacDecoder,
        _CabacEncoder,
        _ctx_init,
        _PART_MODE_INIT,
    )

    rng = np.random.default_rng(11)
    for trial in range(20):
        bins = rng.integers(0, 2, size=int(rng.integers(1, 200))).tolist()
        w = BitWriter()
        enc = _CabacEncoder(w)
        ectx = _ctx_init(_PART_MODE_INIT)
        for b in bins:
            enc.decision(ectx, int(b))
        enc.terminate(1)
        while len(w._bits) % 8:
            w.u(0, 1)
        r = BitReader(w.bytes())
        dec = _CabacDecoder(r)
        dctx = _ctx_init(_PART_MODE_INIT)
        got = [dec.decision(dctx) for _ in bins]
        assert got == bins, trial
        assert dec.terminate() == 1
        assert dctx == ectx  # lockstep adaptation


def test_cabac_flush_bit_accounting_invariant():
    """After a terminate-1 flush the encoder has WRITTEN exactly the
    bits the decoder has FETCHED (9-bit init + renorms) — the
    invariant that pins where pcm_alignment/pcm_sample bytes start.
    Checked across many random prefixes."""
    from pyspec_spark.operators.h264 import BitReader, BitWriter
    from pyspec_spark.operators.h265 import (
        _CabacDecoder,
        _CabacEncoder,
        _ctx_init,
        _PART_MODE_INIT,
    )

    rng = np.random.default_rng(3)
    for trial in range(30):
        bins = rng.integers(0, 2, size=int(rng.integers(0, 60))).tolist()
        w = BitWriter()
        enc = _CabacEncoder(w)
        ectx = _ctx_init(_PART_MODE_INIT)
        for b in bins:
            enc.decision(ectx, int(b))
        enc.terminate(1)
        written = len(w._bits)
        while len(w._bits) % 8:
            w.u(0, 1)
        r = BitReader(w.bytes())
        dec = _CabacDecoder(r)
        dctx = _ctx_init(_PART_MODE_INIT)
        for _ in bins:
            dec.decision(dctx)
        assert dec.terminate() == 1
        assert r._pos == written, (trial, r._pos, written)


def test_cabac_terminate_zero_then_continue():
    """terminate(0) bins (end_of_slice on non-last CTUs) must leave the
    engine consistent for further decisions."""
    from pyspec_spark.operators.h264 import BitReader, BitWriter
    from pyspec_spark.operators.h265 import (
        _CabacDecoder,
        _CabacEncoder,
        _ctx_init,
        _PART_MODE_INIT,
    )

    w = BitWriter()
    enc = _CabacEncoder(w)
    ectx = _ctx_init(_PART_MODE_INIT)
    seq = [1, 0, 1, 1, 0]
    for b in seq:
        enc.decision(ectx, b)
        enc.terminate(0)
    enc.terminate(1)
    while len(w._bits) % 8:
        w.u(0, 1)
    dec = _CabacDecoder(BitReader(w.bytes()))
    dctx = _ctx_init(_PART_MODE_INIT)
    for b in seq:
        assert dec.decision(dctx) == b
        assert dec.terminate() == 0
    assert dec.terminate() == 1


# ---------------------------------------------------------------------------
# PCM I-slice codec
# ---------------------------------------------------------------------------
def test_hevc_pcm_roundtrip_exact_random_planes():
    from pyspec_spark.operators.h265 import decode_pcm_islice, encode_pcm_islice

    rng = np.random.default_rng(5)
    for ctbs_w, ctbs_h in ((1, 1), (3, 2), (4, 4)):
        y = rng.integers(0, 256, (ctbs_h * 16, ctbs_w * 16), dtype=np.uint8)
        cb = rng.integers(0, 256, (ctbs_h * 8, ctbs_w * 8), dtype=np.uint8)
        cr = rng.integers(0, 256, (ctbs_h * 8, ctbs_w * 8), dtype=np.uint8)
        y2, cb2, cr2 = decode_pcm_islice(
            encode_pcm_islice(y, cb, cr), ctbs_w, ctbs_h
        )
        assert (y2 == y).all() and (cb2 == cb).all() and (cr2 == cr).all()


def test_hevc_pcm_zero_planes_stress_emulation_prevention():
    from pyspec_spark.operators.h265 import decode_pcm_islice, encode_pcm_islice

    y = np.zeros((16, 16), dtype=np.uint8)
    c = np.zeros((8, 8), dtype=np.uint8)
    nal = encode_pcm_islice(y, c, c)
    assert b"\x00\x00\x03" in nal  # escaping actually fired
    y2, cb2, cr2 = decode_pcm_islice(nal, 1, 1)
    assert not y2.any() and not cb2.any() and not cr2.any()


def test_hevc_pcm_roundtrip_hypothesis_adversarial_bytes():
    """ANY byte content round-trips through the PCM coding unit —
    hypothesis drives the plane bytes (shrinking toward 00/03 runs
    that stress emulation prevention AND toward values that flip
    CABAC renorm paths in the framing bins)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pyspec_spark.operators.h265 import decode_pcm_islice, encode_pcm_islice

    @given(data=st.binary(min_size=384, max_size=384))
    @settings(max_examples=30, deadline=None)
    def prop(data):
        buf = np.frombuffer(data, dtype=np.uint8)
        y = buf[:256].reshape(16, 16)
        cb = buf[256:320].reshape(8, 8)
        cr = buf[320:384].reshape(8, 8)
        y2, cb2, cr2 = decode_pcm_islice(encode_pcm_islice(y, cb, cr), 1, 1)
        assert (y2 == y).all() and (cb2 == cb).all() and (cr2 == cr).all()

    prop()


def test_hevc_pcm_decoder_rejects_non_pcm_bins():
    """A slice whose first CU codes part_mode=NxN or pcm_flag=0 must
    hit the contract NotImplementedError, not decode garbage."""
    from pyspec_spark.operators.h264 import BitWriter, _escape_rbsp
    from pyspec_spark.operators.h265 import (
        _CabacEncoder,
        _ctx_init,
        _PART_MODE_INIT,
        _write_slice_header,
        decode_pcm_islice,
    )

    # part_mode = 0 (PART_NxN)
    w = BitWriter()
    _write_slice_header(w)
    enc = _CabacEncoder(w)
    enc.decision(_ctx_init(_PART_MODE_INIT), 0)
    enc.terminate(1)
    while len(w._bits) % 8:
        w.u(0, 1)
    nal = bytes([19 << 1, 1]) + _escape_rbsp(w.bytes())
    with pytest.raises(NotImplementedError, match="PART_NxN"):
        decode_pcm_islice(nal, 1, 1)

    # part_mode = 2Nx2N but pcm_flag = 0
    w = BitWriter()
    _write_slice_header(w)
    enc = _CabacEncoder(w)
    enc.decision(_ctx_init(_PART_MODE_INIT), 1)
    enc.terminate(0)
    enc.terminate(1)
    while len(w._bits) % 8:
        w.u(0, 1)
    nal = bytes([19 << 1, 1]) + _escape_rbsp(w.bytes())
    with pytest.raises(NotImplementedError, match="pcm_flag=0"):
        decode_pcm_islice(nal, 1, 1)


def test_hevc_pcm_sps_parses_with_window():
    """pcm=True SPS: canvas rounds to 16, the conformance window
    recovers the true size through the existing parser."""
    from pyspec_spark.operators.h265 import decode_hevc_sps, encode_hevc_sps

    d = decode_hevc_sps(encode_hevc_sps(36, 24, pcm=True))
    assert (d["width"], d["height"]) == (36, 24)
    d = decode_hevc_sps(encode_hevc_sps(64, 32, pcm=True))
    assert (d["width"], d["height"]) == (64, 32)


def test_hvcc_carries_pps_array_and_still_parses():
    from pyspec_spark.operators.h265 import (
        encode_hevc_pps,
        encode_hevc_sps,
        make_hvcc,
        parse_hvcc,
    )

    sps = encode_hevc_sps(36, 24, pcm=True)
    rec = make_hvcc(sps, encode_hevc_pps())
    d = parse_hvcc(rec)
    assert (d["width"], d["height"]) == (36, 24)


# ---------------------------------------------------------------------------
# end-to-end through the generic multimodal path
# ---------------------------------------------------------------------------
def test_hevc_pcm_movie_decodes_through_generic_frame_path(spark):
    from pyspec_spark.operators.multimodal import (
        decode_frame,
        extract_features,
        ipcm_pattern,
        make_hevc_ipcm_media,
    )

    media = make_hevc_ipcm_media(spark, n=2, frames=2)
    rows = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    img = decode_frame("mp4", rows[1], 40, 28, 0)
    assert img.shape == (28, 40, 3) and img.dtype == np.uint8
    y_src, cb_src, cr_src = ipcm_pattern(1, 0, 40, 28)
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


def test_hevc_metadata_only_movie_still_hits_contract_error(spark):
    """An hvc1 movie WITHOUT PCM payload (the r7 metadata fixtures)
    must still raise the contract NotImplementedError, not a demux
    ValueError."""
    from pyspec_spark.operators.multimodal import decode_frame, make_hevc_media

    media = make_hevc_media(spark, n=1)
    payload = bytes(media.collect()[0]["payload"])
    with pytest.raises(NotImplementedError):
        decode_frame("mp4", payload, 16, 16, 0)


def test_cabac_table_structural_invariants():
    """The rangeTabLps / transIdxLps tables are transcribed from the
    public spec; pin the structural properties a transcription typo
    would break: 64 rows x 4 cols; each row strictly increasing in the
    range quantile; each column non-increasing down the states (the
    LPS probability shrinks as the state adapts); the terminate row
    (state 63) is the constant 2; LPS transitions never increase the
    state and are monotone non-decreasing."""
    from pyspec_spark.operators.h265 import _RANGE_TAB_LPS, _TRANS_IDX_LPS

    assert len(_RANGE_TAB_LPS) == 64
    assert all(len(r) == 4 for r in _RANGE_TAB_LPS)
    for s, row in enumerate(_RANGE_TAB_LPS[:63]):  # 63 is the constant trm row
        assert row[0] < row[1] < row[2] < row[3], s
    for q in range(4):
        col = [r[q] for r in _RANGE_TAB_LPS[:63]]  # 63 is the trm row
        assert all(a >= b for a, b in zip(col, col[1:])), q
    assert _RANGE_TAB_LPS[63] == (2, 2, 2, 2)
    assert len(_TRANS_IDX_LPS) == 64
    assert all(
        t <= s for s, t in enumerate(_TRANS_IDX_LPS)
    )  # LPS never advances adaptation
    body = _TRANS_IDX_LPS[:63]
    assert all(a <= b for a, b in zip(body, body[1:]))
    assert _TRANS_IDX_LPS[63] == 63  # terminate state is absorbing
