"""H.264/AVC parameter-set codec — SPS/PPS synthesis and parsing, pure
Python (clean-room from the public ITU-T H.264 (08/2021) spec §7.3.2
and ISO/IEC 14496-15 §5.3.3 for the avcC record).

Scope: the PARAMETER SETS — the metadata a curation pipeline gates
on before shipping payloads to a GPU decoder: profile_idc, level_idc,
and the TRUE cropped display dimensions (SPS dimensions are stored in
16-px macroblock units plus frame-crop offsets; naive readers that
trust the container's tkhd width/height mis-size every non-multiple-
of-16 video) — PLUS, since r8, FRAME decode for IDR/I_PCM streams
(encode_ipcm_idr / decode_ipcm_idr below): raw byte-aligned samples,
exact reconstruction, no transform machinery.  Transformed/predicted
macroblocks remain the documented NotImplementedError boundary
(operators/multimodal.decode_frame), now per-macroblock.

Everything round-trips through real bytes: `encode_sps` emits a
spec-conformant NAL with emulation-prevention (00 00 0x -> 00 00 03 0x)
and `decode_sps` inverts it through the same escaping, so the pytest
property (encode -> decode == identity over the parameter lattice) and
the q_avc_params oracle pin the bit-level arithmetic (exp-Golomb,
trailing bits, crop units).
"""

from __future__ import annotations

import struct


class BitWriter:
    """MSB-first bit accumulator (H.264 bitstream order)."""

    def __init__(self) -> None:
        self._bits: list[int] = []

    def u(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self._bits.append((value >> i) & 1)

    def ue(self, value: int) -> None:
        """Unsigned exp-Golomb: leadingZeros(len(v+1)-1) + bin(v+1)."""
        v = value + 1
        n = v.bit_length()
        self.u(0, n - 1)
        self.u(v, n)

    def se(self, value: int) -> None:
        """Signed exp-Golomb: v>0 -> 2v-1, v<=0 -> -2v."""
        self.ue(2 * value - 1 if value > 0 else -2 * value)

    def rbsp_trailing(self) -> None:
        self._bits.append(1)
        while len(self._bits) % 8:
            self._bits.append(0)

    def bytes(self) -> bytes:
        assert len(self._bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self._bits), 8):
            b = 0
            for bit in self._bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


class BitReader:
    """MSB-first reader over an (already unescaped) RBSP."""

    def __init__(self, data: bytes) -> None:
        self._d = data
        self._pos = 0

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self._d[self._pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self._pos & 7))) & 1)
            self._pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("h264: malformed exp-Golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


def _escape_rbsp(raw: bytes) -> bytes:
    """Insert emulation-prevention bytes: 00 00 {00,01,02,03} ->
    00 00 03 xx (spec §7.4.1.1)."""
    out = bytearray()
    zeros = 0
    for b in raw:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _unescape_rbsp(nal_payload: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    i = 0
    while i < len(nal_payload):
        b = nal_payload[i]
        if zeros >= 2 and b == 3 and i + 1 < len(nal_payload) and nal_payload[i + 1] <= 3:
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


# Chroma 4:2:0, frame_mbs_only=1 -> crop units are 2 px both axes
_CROP_UNIT = 2


def encode_sps(
    width: int,
    height: int,
    profile_idc: int = 66,
    level_idc: int = 30,
    sps_id: int = 0,
) -> bytes:
    """A conformant SPS NAL (header 0x67) for even `width`/`height`
    (4:2:0 crop units are 2 px — odd dimensions are not representable,
    same restriction every real encoder has).  Uses pic_order_cnt_type
    2 and baseline/main profile_idc so no optional field groups are
    needed; dimensions round up to macroblocks with frame-crop right/
    bottom offsets carrying the remainder."""
    if width % 2 or height % 2:
        raise ValueError("h264: 4:2:0 dimensions must be even")
    if profile_idc not in (66, 77, 88):
        raise ValueError(
            "h264: only profiles without chroma_format fields (66/77/88)"
        )
    mbs_w = (width + 15) // 16
    mbs_h = (height + 15) // 16
    crop_r = (mbs_w * 16 - width) // _CROP_UNIT
    crop_b = (mbs_h * 16 - height) // _CROP_UNIT
    w = BitWriter()
    w.u(profile_idc, 8)
    w.u(0, 8)                      # constraint flags + reserved
    w.u(level_idc, 8)
    w.ue(sps_id)
    w.ue(0)                        # log2_max_frame_num_minus4
    w.ue(2)                        # pic_order_cnt_type 2: no POC fields
    w.ue(1)                        # max_num_ref_frames
    w.u(0, 1)                      # gaps_in_frame_num_value_allowed
    w.ue(mbs_w - 1)                # pic_width_in_mbs_minus1
    w.ue(mbs_h - 1)                # pic_height_in_map_units_minus1
    w.u(1, 1)                      # frame_mbs_only_flag
    w.u(0, 1)                      # direct_8x8_inference_flag
    if crop_r or crop_b:
        w.u(1, 1)                  # frame_cropping_flag
        w.ue(0)                    # left
        w.ue(crop_r)               # right
        w.ue(0)                    # top
        w.ue(crop_b)               # bottom
    else:
        w.u(0, 1)
    w.u(0, 1)                      # vui_parameters_present_flag
    w.rbsp_trailing()
    return b"\x67" + _escape_rbsp(w.bytes())


def encode_pps(pps_id: int = 0, sps_id: int = 0) -> bytes:
    """Minimal conformant PPS NAL (header 0x68, CAVLC, 1 slice group)."""
    w = BitWriter()
    w.ue(pps_id)
    w.ue(sps_id)
    w.u(0, 1)                      # entropy_coding_mode: CAVLC
    w.u(0, 1)                      # bottom_field_pic_order_in_frame
    w.ue(0)                        # num_slice_groups_minus1
    w.ue(0)                        # num_ref_idx_l0_default_active_minus1
    w.ue(0)                        # num_ref_idx_l1_default_active_minus1
    w.u(0, 1)                      # weighted_pred_flag
    w.u(0, 2)                      # weighted_bipred_idc
    w.se(0)                        # pic_init_qp_minus26
    w.se(0)                        # pic_init_qs_minus26
    w.se(0)                        # chroma_qp_index_offset
    w.u(1, 1)                      # deblocking_filter_control_present
    w.u(0, 1)                      # constrained_intra_pred_flag
    w.u(0, 1)                      # redundant_pic_cnt_present_flag
    w.rbsp_trailing()
    return b"\x68" + _escape_rbsp(w.bytes())


def decode_sps(nal: bytes) -> dict:
    """Invert encode_sps (and parse any baseline/main SPS using the
    same field subset).  Returns profile_idc, level_idc, and the TRUE
    cropped width/height."""
    if not nal or (nal[0] & 0x1F) != 7:
        raise ValueError("h264: not an SPS NAL")
    r = BitReader(_unescape_rbsp(nal[1:]))
    profile_idc = r.u(8)
    r.u(8)                         # constraint flags
    level_idc = r.u(8)
    sps_id = r.ue()
    if profile_idc in (100, 110, 122, 244, 44, 83, 86, 118, 128):
        raise ValueError("h264: high-profile chroma fields unsupported")
    r.ue()                         # log2_max_frame_num_minus4
    poc_type = r.ue()
    if poc_type == 0:
        r.ue()                     # log2_max_pic_order_cnt_lsb_minus4
    elif poc_type == 1:
        r.u(1)
        r.se()
        r.se()
        for _ in range(r.ue()):
            r.se()
    r.ue()                         # max_num_ref_frames
    r.u(1)                         # gaps allowed
    mbs_w = r.ue() + 1
    mbs_h = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        r.u(1)                     # mb_adaptive_frame_field_flag
    r.u(1)                         # direct_8x8_inference_flag
    crop_l = crop_r = crop_t = crop_b = 0
    if r.u(1):                     # frame_cropping_flag
        crop_l, crop_r, crop_t, crop_b = r.ue(), r.ue(), r.ue(), r.ue()
    height_mult = 2 - frame_mbs_only
    crop_unit_y = _CROP_UNIT * height_mult
    return {
        "profile_idc": profile_idc,
        "level_idc": level_idc,
        "sps_id": sps_id,
        "width": mbs_w * 16 - _CROP_UNIT * (crop_l + crop_r),
        "height": height_mult * mbs_h * 16 - crop_unit_y * (crop_t + crop_b),
    }


def make_avcc(sps: bytes, pps: bytes) -> bytes:
    """AVCDecoderConfigurationRecord (14496-15 §5.3.3.1) holding one
    SPS and one PPS."""
    return (
        bytes([1, sps[1], sps[2], sps[3]])   # ver, profile, compat, level
        + bytes([0xFF])                      # reserved + lengthSizeMinusOne=3
        + bytes([0xE1])                      # reserved + numOfSPS=1
        + struct.pack(">H", len(sps)) + sps
        + bytes([1])                         # numOfPPS
        + struct.pack(">H", len(pps)) + pps
    )


def parse_avcc(buf: bytes) -> dict:
    """Parse an avcC record: per-stream profile/level plus the decoded
    first SPS (true dimensions)."""
    if len(buf) < 7 or buf[0] != 1:
        raise ValueError("h264: bad avcC record")
    n_sps = buf[5] & 0x1F
    pos = 6
    sps_list = []
    for _ in range(n_sps):
        ln = struct.unpack(">H", buf[pos : pos + 2])[0]
        sps_list.append(buf[pos + 2 : pos + 2 + ln])
        pos += 2 + ln
    n_pps = buf[pos]
    pos += 1
    pps_list = []
    for _ in range(n_pps):
        ln = struct.unpack(">H", buf[pos : pos + 2])[0]
        pps_list.append(buf[pos + 2 : pos + 2 + ln])
        pos += 2 + ln
    out = decode_sps(sps_list[0]) if sps_list else {}
    out["n_sps"] = n_sps
    out["n_pps"] = n_pps
    return out


# ---------------------------------------------------------------------------
# I_PCM slice codec (r8) — FRAME decode for the one H.264 coding mode a
# pure-numpy engine can serve EXACTLY: I_PCM macroblocks (ITU-T H.264
# §7.3.5 macroblock_layer, mb_type 25 in I slices, Table 7-11) carry
# raw byte-aligned samples — no transform, no prediction, no entropy
# coding — so encode -> decode is the identity on every pixel.  This
# narrows the long-documented avc1 frame-decode boundary: conformant
# IDR/I_PCM streams (what lossless archival intermediates use) decode
# natively; transformed/predicted macroblocks still raise the contract
# NotImplementedError in decode_avc_frame.
#
# Slice header scope matches the parameter sets this module emits
# (encode_sps: log2_max_frame_num_minus4=0, pic_order_cnt_type=2,
# frame_mbs_only=1; encode_pps: CAVLC, deblocking control present) —
# deblocking is explicitly disabled per slice (idc=1), which the spec
# requires for bit-exact I_PCM reconstruction to hold at the block
# edges (§8.7 skips filtering only when disabled or qp bounds exclude).
# ---------------------------------------------------------------------------
_I_PCM_MB_TYPE = 25  # Table 7-11: I slice mb_type for I_PCM


def encode_ipcm_idr(
    y: "np.ndarray", cb: "np.ndarray", cr: "np.ndarray"
) -> bytes:
    """IDR slice NAL (header 0x65) whose macroblocks are all I_PCM.
    ``y`` is (H, W) uint8 with H, W multiples of 16 (pad to the SPS'
    macroblock canvas first — frame cropping recovers the true size);
    ``cb``/``cr`` are the (H/2, W/2) 4:2:0 chroma planes."""
    import numpy as np

    y = np.asarray(y, dtype=np.uint8)
    cb = np.asarray(cb, dtype=np.uint8)
    cr = np.asarray(cr, dtype=np.uint8)
    hh, ww = y.shape
    if hh % 16 or ww % 16:
        raise ValueError("h264: I_PCM canvas must be macroblock-aligned")
    if cb.shape != (hh // 2, ww // 2) or cr.shape != (hh // 2, ww // 2):
        raise ValueError("h264: chroma planes must be (H/2, W/2)")
    w = BitWriter()
    # slice_header (§7.3.3) for IDR under this module's SPS/PPS layout
    w.ue(0)          # first_mb_in_slice
    w.ue(7)          # slice_type: I (all slices in picture are I)
    w.ue(0)          # pic_parameter_set_id
    w.u(0, 4)        # frame_num (log2_max_frame_num_minus4=0 -> 4 bits)
    w.ue(0)          # idr_pic_id
    # pic_order_cnt_type 2 -> no POC fields
    # dec_ref_pic_marking (IdrPicFlag=1):
    w.u(0, 1)        # no_output_of_prior_pics_flag
    w.u(0, 1)        # long_term_reference_flag
    w.se(0)          # slice_qp_delta
    w.ue(1)          # disable_deblocking_filter_idc=1 (PPS control on)
    # slice_data (§7.3.4, CAVLC): I slices carry no mb_skip_run
    for mby in range(hh // 16):
        for mbx in range(ww // 16):
            w.ue(_I_PCM_MB_TYPE)
            while len(w._bits) % 8:       # pcm_alignment_zero_bit
                w.u(0, 1)
            blk_y = y[mby * 16:(mby + 1) * 16, mbx * 16:(mbx + 1) * 16]
            for b in blk_y.reshape(-1):
                w.u(int(b), 8)            # pcm_sample_luma
            for plane in (cb, cr):        # pcm_sample_chroma (Cb, Cr)
                blk = plane[mby * 8:(mby + 1) * 8, mbx * 8:(mbx + 1) * 8]
                for b in blk.reshape(-1):
                    w.u(int(b), 8)
    w.rbsp_trailing()
    return b"\x65" + _escape_rbsp(w.bytes())


def decode_ipcm_idr(
    nal: bytes, mbs_w: int, mbs_h: int
) -> tuple["np.ndarray", "np.ndarray", "np.ndarray"]:
    """Invert encode_ipcm_idr: (y, cb, cr) planes on the macroblock
    canvas (crop with the SPS dimensions afterwards).  Raises
    NotImplementedError on any non-I_PCM macroblock — that is the
    documented remaining boundary, now per-macroblock instead of
    per-codec."""
    import numpy as np

    if not nal or (nal[0] & 0x1F) not in (1, 5):
        raise ValueError("h264: not a slice NAL")
    r = BitReader(_unescape_rbsp(nal[1:]))
    first_mb = r.ue()
    slice_type = r.ue()
    if slice_type % 5 != 2:
        raise NotImplementedError(
            f"h264: only I slices decode (slice_type {slice_type})"
        )
    if first_mb != 0:
        raise NotImplementedError("h264: multi-slice pictures unsupported")
    r.ue()           # pic_parameter_set_id
    r.u(4)           # frame_num
    if nal[0] & 0x1F == 5:
        r.ue()       # idr_pic_id
        r.u(1)       # no_output_of_prior_pics_flag
        r.u(1)       # long_term_reference_flag
    r.se()           # slice_qp_delta
    dfi = r.ue()     # disable_deblocking_filter_idc
    if dfi > 2:
        raise ValueError("h264: bad disable_deblocking_filter_idc")
    if dfi != 1:
        r.se()       # slice_alpha_c0_offset_div2
        r.se()       # slice_beta_offset_div2
    y = np.zeros((mbs_h * 16, mbs_w * 16), dtype=np.uint8)
    cb = np.zeros((mbs_h * 8, mbs_w * 8), dtype=np.uint8)
    cr = np.zeros((mbs_h * 8, mbs_w * 8), dtype=np.uint8)
    for mby in range(mbs_h):
        for mbx in range(mbs_w):
            mb_type = r.ue()
            if mb_type != _I_PCM_MB_TYPE:
                raise NotImplementedError(
                    f"h264: mb_type {mb_type} needs transform/prediction "
                    "decode — only I_PCM macroblocks are in scope"
                )
            while r._pos % 8:             # pcm_alignment_zero_bit
                if r.u(1):
                    raise ValueError("h264: nonzero pcm alignment bit")
            buf = np.frombuffer(
                r._d[r._pos >> 3:(r._pos >> 3) + 384], dtype=np.uint8
            )
            if buf.size != 384:
                raise ValueError("h264: truncated I_PCM macroblock")
            r._pos += 384 * 8
            y[mby * 16:(mby + 1) * 16, mbx * 16:(mbx + 1) * 16] = (
                buf[:256].reshape(16, 16)
            )
            cb[mby * 8:(mby + 1) * 8, mbx * 8:(mbx + 1) * 8] = (
                buf[256:320].reshape(8, 8)
            )
            cr[mby * 8:(mby + 1) * 8, mbx * 8:(mbx + 1) * 8] = (
                buf[320:384].reshape(8, 8)
            )
    return y, cb, cr
