"""H.265/HEVC parameter-set codec — SPS/hvcC synthesis and parsing,
pure Python (clean-room from the public ITU-T H.265 (V10) spec §7.3.2.2
and ISO/IEC 14496-15 §8.3.3 for the hvcC record).

Same scope and rationale as operators/h264.py: the metadata a curation
pipeline gates on for ``hvc1`` tracks — general profile / tier / level
and the TRUE display dimensions (HEVC stores luma sizes rounded to the
minimum CU and carries a conformance window; readers that skip the
window mis-size non-8-multiple video).  CTU/slice decode stays the
documented NotImplementedError boundary — and unlike H.264 (whose
CAVLC slice data let r8 implement exact I_PCM frame decode with
plain exp-Golomb reads, h264.py), HEVC slice data is CABAC-only:
even the per-CU pcm_flag is arithmetic-coded behind the
coding-quadtree, so a lossless-PCM fast path would still require a
full CABAC engine + quadtree parser.  That is why the per-macroblock
narrowing stops at avc1.

Shares the BitWriter/BitReader/escaping primitives with h264.py — the
RBSP emulation-prevention scheme is byte-identical across the two
specs.
"""

from __future__ import annotations

import struct

from pyspec_spark.operators.h264 import (
    BitReader,
    BitWriter,
    _escape_rbsp,
    _unescape_rbsp,
)

# 4:2:0 -> conformance-window offsets are in 2-px units (SubWidthC/
# SubHeightC = 2), and luma dimensions must be multiples of MinCbSizeY
# (8 with log2_min_luma_coding_block_size_minus3 = 0)
_WIN_UNIT = 2
_MIN_CB = 8


def _profile_tier_level(w: BitWriter, profile_idc: int, tier: int, level_idc: int) -> None:
    """general_profile_tier_level with sps_max_sub_layers_minus1 = 0
    (no sub-layer flags follow)."""
    w.u(0, 2)                        # general_profile_space
    w.u(tier, 1)                     # general_tier_flag
    w.u(profile_idc, 5)              # general_profile_idc
    w.u(1 << (31 - profile_idc) if profile_idc < 32 else 0, 32)
    w.u(1, 1)                        # general_progressive_source_flag
    w.u(0, 1)                        # general_interlaced_source_flag
    w.u(0, 1)                        # general_non_packed_constraint
    w.u(1, 1)                        # general_frame_only_constraint
    w.u(0, 32)                       # reserved 43 bits (+11 below)
    w.u(0, 11)
    w.u(0, 1)                        # general_inbld / reserved
    w.u(level_idc, 8)                # general_level_idc


def _parse_profile_tier_level(r: BitReader) -> tuple[int, int, int]:
    r.u(2)
    tier = r.u(1)
    profile_idc = r.u(5)
    r.u(32)                          # compatibility flags
    r.u(4)                           # progressive/interlaced/non-packed/frame-only
    r.u(32)
    r.u(11)
    r.u(1)
    level_idc = r.u(8)
    return profile_idc, tier, level_idc


def encode_hevc_sps(
    width: int,
    height: int,
    profile_idc: int = 1,
    level_idc: int = 93,
    tier: int = 0,
) -> bytes:
    """A conformant HEVC SPS NAL (nal_unit_type 33) for dimensions that
    are multiples of 2 (conformance-window units); luma sizes round up
    to the 8-px minimum coding block with the window carrying the
    remainder.  Single layer, 4:2:0, 8-bit, no VUI/extensions."""
    if width % _WIN_UNIT or height % _WIN_UNIT:
        raise ValueError("h265: 4:2:0 dimensions must be even")
    luma_w = (width + _MIN_CB - 1) // _MIN_CB * _MIN_CB
    luma_h = (height + _MIN_CB - 1) // _MIN_CB * _MIN_CB
    win_r = (luma_w - width) // _WIN_UNIT
    win_b = (luma_h - height) // _WIN_UNIT
    w = BitWriter()
    w.u(0, 4)                        # sps_video_parameter_set_id
    w.u(0, 3)                        # sps_max_sub_layers_minus1
    w.u(1, 1)                        # sps_temporal_id_nesting_flag
    _profile_tier_level(w, profile_idc, tier, level_idc)
    w.ue(0)                          # sps_seq_parameter_set_id
    w.ue(1)                          # chroma_format_idc: 4:2:0
    w.ue(luma_w)                     # pic_width_in_luma_samples
    w.ue(luma_h)                     # pic_height_in_luma_samples
    if win_r or win_b:
        w.u(1, 1)                    # conformance_window_flag
        w.ue(0)                      # left
        w.ue(win_r)                  # right
        w.ue(0)                      # top
        w.ue(win_b)                  # bottom
    else:
        w.u(0, 1)
    w.ue(0)                          # bit_depth_luma_minus8
    w.ue(0)                          # bit_depth_chroma_minus8
    w.ue(4)                          # log2_max_pic_order_cnt_lsb_minus4
    w.u(0, 1)                        # sps_sub_layer_ordering_info_present
    w.ue(1)                          # sps_max_dec_pic_buffering_minus1[0]
    w.ue(0)                          # sps_max_num_reorder_pics[0]
    w.ue(0)                          # sps_max_latency_increase_plus1[0]
    w.ue(0)                          # log2_min_luma_coding_block_size_minus3
    w.ue(3)                          # log2_diff_max_min_luma_coding_block
    w.ue(0)                          # log2_min_luma_transform_block_size_minus2
    w.ue(3)                          # log2_diff_max_min_luma_transform_block
    w.ue(0)                          # max_transform_hierarchy_depth_inter
    w.ue(0)                          # max_transform_hierarchy_depth_intra
    w.u(0, 1)                        # scaling_list_enabled_flag
    w.u(0, 1)                        # amp_enabled_flag
    w.u(0, 1)                        # sample_adaptive_offset_enabled
    w.u(0, 1)                        # pcm_enabled_flag
    w.ue(0)                          # num_short_term_ref_pic_sets
    w.u(0, 1)                        # long_term_ref_pics_present_flag
    w.u(0, 1)                        # sps_temporal_mvp_enabled_flag
    w.u(0, 1)                        # strong_intra_smoothing_enabled
    w.u(0, 1)                        # vui_parameters_present_flag
    w.u(0, 1)                        # sps_extension_present_flag
    w.rbsp_trailing()
    # NAL header: forbidden(1)=0, type(6)=33, layer_id(6)=0, tid+1(3)=1
    return bytes([33 << 1, 1]) + _escape_rbsp(w.bytes())


def decode_hevc_sps(nal: bytes) -> dict:
    """Invert encode_hevc_sps (and parse any single-sub-layer HEVC SPS
    through the conformance window).  Returns profile/tier/level and
    the TRUE windowed width/height."""
    if len(nal) < 2 or ((nal[0] >> 1) & 0x3F) != 33:
        raise ValueError("h265: not an SPS NAL")
    r = BitReader(_unescape_rbsp(nal[2:]))
    r.u(4)
    max_sub_layers = r.u(3)
    if max_sub_layers != 0:
        raise ValueError("h265: multi-sub-layer SPS unsupported")
    r.u(1)
    profile_idc, tier, level_idc = _parse_profile_tier_level(r)
    sps_id = r.ue()
    chroma = r.ue()
    if chroma == 3:
        r.u(1)                       # separate_colour_plane_flag
    luma_w = r.ue()
    luma_h = r.ue()
    win_l = win_r = win_t = win_b = 0
    if r.u(1):
        win_l, win_r, win_t, win_b = r.ue(), r.ue(), r.ue(), r.ue()
    sub_w = 2 if chroma in (1, 2) else 1
    sub_h = 2 if chroma == 1 else 1
    return {
        "profile_idc": profile_idc,
        "tier": tier,
        "level_idc": level_idc,
        "sps_id": sps_id,
        "width": luma_w - sub_w * (win_l + win_r),
        "height": luma_h - sub_h * (win_t + win_b),
    }


def make_hvcc(sps: bytes) -> bytes:
    """HEVCDecoderConfigurationRecord (14496-15 §8.3.3.1) holding one
    SPS array.  Header fields mirror the SPS's profile/tier/level."""
    d = decode_hevc_sps(sps)
    return (
        bytes([1])                                   # configurationVersion
        + bytes([(d["tier"] << 5) | d["profile_idc"]])  # space/tier/profile
        + struct.pack(">I", 0)                       # compatibility flags
        + b"\x00" * 6                                # constraint flags (48b)
        + bytes([d["level_idc"]])
        + struct.pack(">H", 0xF000)                  # reserved + spatial seg
        + bytes([0xFC])                              # reserved + parallelism
        + bytes([0xFC | 1])                          # chroma_format 4:2:0
        + bytes([0xF8])                              # luma depth - 8
        + bytes([0xF8])                              # chroma depth - 8
        + struct.pack(">H", 0)                       # avgFrameRate
        + bytes([0x03])                              # flags + lengthSizeMinusOne=3
        + bytes([1])                                 # numOfArrays
        + bytes([(1 << 7) | 33])                     # array_completeness + type
        + struct.pack(">H", 1)                       # numNalus
        + struct.pack(">H", len(sps)) + sps
    )


def parse_hvcc(buf: bytes) -> dict:
    """Parse an hvcC record: decode the first SPS NAL in the type-33
    array (true dimensions + profile/tier/level)."""
    if len(buf) < 23 or buf[0] != 1:
        raise ValueError("h265: bad hvcC record")
    n_arrays = buf[22]
    pos = 23
    for _ in range(n_arrays):
        nal_type = buf[pos] & 0x3F
        (n_nalus,) = struct.unpack_from(">H", buf, pos + 1)
        pos += 3
        for _ in range(n_nalus):
            (ln,) = struct.unpack_from(">H", buf, pos)
            nal = buf[pos + 2 : pos + 2 + ln]
            pos += 2 + ln
            if nal_type == 33:
                return decode_hevc_sps(nal)
    raise ValueError("h265: no SPS array in hvcC")
