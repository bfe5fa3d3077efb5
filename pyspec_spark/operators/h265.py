"""H.265/HEVC parameter-set codec — SPS/hvcC synthesis and parsing,
pure Python (clean-room from the public ITU-T H.265 (V10) spec §7.3.2.2
and ISO/IEC 14496-15 §8.3.3 for the hvcC record).

Same scope and rationale as operators/h264.py: the metadata a curation
pipeline gates on for ``hvc1`` tracks — general profile / tier / level
and the TRUE display dimensions (HEVC stores luma sizes rounded to the
minimum CU and carries a conformance window; readers that skip the
window mis-size non-8-multiple video).

r9 extends the boundary one honest step past metadata: **PCM I-slice
FRAME decode** (the HEVC twin of r8's avc1 I_PCM path).  HEVC slice
data is CABAC-only — even pcm_flag is arithmetic-coded — but an
all-PCM I slice under the parameter sets this module emits needs only
a bounded slice of the CABAC engine: context initialization
(§9.3.2.2), one context-coded bin per CTU (part_mode, §9.3.4.3.2
DecodeDecision), the terminate bins (pcm_flag and
end_of_slice_segment_flag, §9.3.4.3.5), and the engine re-init after
each pcm_sample block (§9.3.1).  PCM samples themselves are raw
byte-aligned bytes (§7.3.8.7) — encode→decode is the identity on
every pixel, the same contract avc1 I_PCM meets.  Any OTHER bin
pattern (split, NxN partitions, pcm_flag=0, non-I slices) raises the
contract NotImplementedError — the boundary is now per-CU for hvc1;
av01 remains metadata-only (AV1 has no raw-sample coding mode).

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
    pcm: bool = False,
) -> bytes:
    """A conformant HEVC SPS NAL (nal_unit_type 33) for dimensions that
    are multiples of 2 (conformance-window units); luma sizes round up
    to the 8-px minimum coding block with the window carrying the
    remainder.  Single layer, 4:2:0, 8-bit, no VUI/extensions.

    ``pcm=True`` emits the PCM-I-slice layout encode_pcm_islice
    assumes: CtbSizeY = MinCbSizeY = 16 (so neither split_cu_flag nor
    any quadtree state is coded — split is inferred 0, §7.3.8.4),
    pcm_enabled with Min/MaxIpcmCbSizeY pinned to 16, 8-bit PCM
    sample depths, and pcm_loop_filter_disabled (required for
    bit-exact reconstruction at CU edges).  The luma canvas then
    rounds to 16 (pic dims must be multiples of MinCbSizeY) with the
    conformance window carrying the remainder — the same
    canvas-plus-crop model as the avc1 macroblock path."""
    if width % _WIN_UNIT or height % _WIN_UNIT:
        raise ValueError("h265: 4:2:0 dimensions must be even")
    min_cb = 16 if pcm else _MIN_CB
    luma_w = (width + min_cb - 1) // min_cb * min_cb
    luma_h = (height + min_cb - 1) // min_cb * min_cb
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
    if pcm:
        w.ue(1)                      # log2_min_luma_coding_block_size_minus3: 16
        w.ue(0)                      # log2_diff_max_min: CtbSizeY = MinCbSizeY = 16
        w.ue(0)                      # log2_min_luma_transform_block_size_minus2: 4
        w.ue(2)                      # log2_diff: MaxTbLog2SizeY = 4 <= CtbLog2SizeY
    else:
        w.ue(0)                      # log2_min_luma_coding_block_size_minus3
        w.ue(3)                      # log2_diff_max_min_luma_coding_block
        w.ue(0)                      # log2_min_luma_transform_block_size_minus2
        w.ue(3)                      # log2_diff_max_min_luma_transform_block
    w.ue(0)                          # max_transform_hierarchy_depth_inter
    w.ue(0)                          # max_transform_hierarchy_depth_intra
    w.u(0, 1)                        # scaling_list_enabled_flag
    w.u(0, 1)                        # amp_enabled_flag
    w.u(0, 1)                        # sample_adaptive_offset_enabled
    if pcm:
        w.u(1, 1)                    # pcm_enabled_flag
        w.u(7, 4)                    # pcm_sample_bit_depth_luma_minus1: 8-bit
        w.u(7, 4)                    # pcm_sample_bit_depth_chroma_minus1
        w.ue(1)                      # log2_min_pcm_luma_coding_block_size_minus3: 16
        w.ue(0)                      # log2_diff_max_min_pcm: MaxIpcmCbSizeY = 16
        w.u(1, 1)                    # pcm_loop_filter_disabled_flag
    else:
        w.u(0, 1)                    # pcm_enabled_flag
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


def make_hvcc(sps: bytes, pps: bytes | None = None) -> bytes:
    """HEVCDecoderConfigurationRecord (14496-15 §8.3.3.1) holding an
    SPS array (and a PPS array when given).  Header fields mirror the
    SPS's profile/tier/level."""
    d = decode_hevc_sps(sps)
    arrays = bytes([(1 << 7) | 33]) + struct.pack(">H", 1) + struct.pack(
        ">H", len(sps)
    ) + sps
    n_arrays = 1
    if pps is not None:
        arrays += bytes([(1 << 7) | 34]) + struct.pack(">H", 1) + struct.pack(
            ">H", len(pps)
        ) + pps
        n_arrays = 2
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
        + bytes([n_arrays])                          # numOfArrays
        + arrays
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


def encode_hevc_pps() -> bytes:
    """Minimal PPS NAL (nal_unit_type 34, §7.3.2.3) matching the
    PCM-I-slice path: CABAC defaults (init_qp 26), no tiles/WPP/
    dependent slices, transquant bypass OFF (so coding_unit starts at
    part_mode for I slices), deblocking disabled at PPS level with
    override off (so the slice header carries NO deblocking syntax and
    PCM reconstruction is bit-exact, §8.7)."""
    w = BitWriter()
    w.ue(0)          # pps_pic_parameter_set_id
    w.ue(0)          # pps_seq_parameter_set_id
    w.u(0, 1)        # dependent_slice_segments_enabled_flag
    w.u(0, 1)        # output_flag_present_flag
    w.u(0, 3)        # num_extra_slice_header_bits
    w.u(0, 1)        # sign_data_hiding_enabled_flag
    w.u(0, 1)        # cabac_init_present_flag
    w.ue(0)          # num_ref_idx_l0_default_active_minus1
    w.ue(0)          # num_ref_idx_l1_default_active_minus1
    w.se(0)          # init_qp_minus26  (SliceQpY = 26 with delta 0)
    w.u(0, 1)        # constrained_intra_pred_flag
    w.u(0, 1)        # transform_skip_enabled_flag
    w.u(0, 1)        # cu_qp_delta_enabled_flag
    w.se(0)          # pps_cb_qp_offset
    w.se(0)          # pps_cr_qp_offset
    w.u(0, 1)        # pps_slice_chroma_qp_offsets_present_flag
    w.u(0, 1)        # weighted_pred_flag
    w.u(0, 1)        # weighted_bipred_flag
    w.u(0, 1)        # transquant_bypass_enabled_flag
    w.u(0, 1)        # tiles_enabled_flag
    w.u(0, 1)        # entropy_coding_sync_enabled_flag
    w.u(0, 1)        # pps_loop_filter_across_slices_enabled_flag
    w.u(1, 1)        # deblocking_filter_control_present_flag
    w.u(0, 1)        # deblocking_filter_override_enabled_flag
    w.u(1, 1)        # pps_deblocking_filter_disabled_flag
    w.u(0, 1)        # pps_scaling_list_data_present_flag
    w.u(0, 1)        # lists_modification_present_flag
    w.ue(0)          # log2_parallel_merge_level_minus2
    w.u(0, 1)        # slice_segment_header_extension_present_flag
    w.u(0, 1)        # pps_extension_present_flag
    w.rbsp_trailing()
    return bytes([34 << 1, 1]) + _escape_rbsp(w.bytes())


# ---------------------------------------------------------------------------
# CABAC (§9.3) — exactly the slice the all-PCM I-slice path exercises:
# DecodeDecision / DecodeBypass-free path / DecodeTerminate, context
# initialization, and the matching arithmetic ENCODER (the spec's
# informative encoding process: RenormE/PutBit with first-bit
# suppression and outstanding-bit carry, EncodeFlush after a
# terminate-1 bin).
#
# Byte-position invariant that makes mid-stream PCM byte alignment
# unambiguous (the subtle part of mixing ae(v) with f(n)/b(8) reads):
# per arithmetic segment, the DECODER fetches 9 bits at init plus one
# per renormalization; the ENCODER emits one bit per renormalization
# (same count — the range trajectory is identical on both sides),
# suppresses the segment's first PutBit, and the flush after a
# terminate-1 bin emits exactly 10 more (7 RenormE bits from range=2,
# then PutBit((low>>9)&1) and the 2-bit ((low>>7)&3)|1 stop pattern).
# So written = R - 1 + 10 = R + 9 = fetched: when pcm_flag decodes 1,
# both sides sit at the SAME bit offset, and pcm_alignment_zero_bit /
# the PCM bytes land at the same byte boundary.  After pcm_sample the
# engine re-initializes (§9.3.1) at that boundary; context variables
# persist across the re-init (only the engine resets).
#
# The rangeTabLps / transIdxLps tables are transcribed from the public
# spec (H.265 Tables 9-46/9-47, byte-identical to H.264's 9-44/9-45).
# ---------------------------------------------------------------------------
_RANGE_TAB_LPS = [
    (128, 176, 208, 240), (128, 167, 197, 227), (128, 158, 187, 216),
    (123, 150, 178, 205), (116, 142, 169, 195), (111, 135, 160, 185),
    (105, 128, 152, 175), (100, 122, 144, 166), (95, 116, 137, 158),
    (90, 110, 130, 150), (85, 104, 123, 142), (81, 99, 117, 135),
    (77, 94, 111, 128), (73, 89, 105, 122), (69, 85, 100, 116),
    (66, 80, 95, 110), (62, 76, 90, 104), (59, 72, 86, 99),
    (56, 69, 81, 94), (53, 65, 77, 89), (51, 62, 73, 85),
    (48, 59, 69, 80), (46, 56, 66, 76), (43, 53, 63, 72),
    (41, 50, 59, 69), (39, 48, 56, 65), (37, 45, 54, 62),
    (35, 43, 51, 59), (33, 41, 48, 56), (32, 39, 46, 53),
    (30, 37, 43, 50), (28, 35, 41, 48), (27, 33, 39, 45),
    (26, 31, 37, 43), (24, 30, 35, 41), (23, 28, 33, 39),
    (22, 27, 32, 37), (21, 26, 30, 35), (20, 24, 29, 33),
    (19, 23, 27, 31), (18, 22, 26, 30), (17, 21, 25, 28),
    (16, 20, 23, 27), (15, 19, 22, 25), (14, 18, 21, 24),
    (14, 17, 20, 23), (13, 16, 19, 22), (12, 15, 18, 21),
    (12, 14, 17, 20), (11, 14, 16, 19), (11, 13, 15, 18),
    (10, 12, 15, 17), (10, 12, 14, 16), (9, 11, 13, 15),
    (9, 11, 12, 14), (8, 10, 12, 14), (8, 9, 11, 13),
    (7, 9, 11, 12), (7, 9, 10, 12), (7, 8, 10, 11),
    (6, 8, 9, 11), (6, 7, 9, 10), (6, 7, 8, 9), (2, 2, 2, 2),
]
_TRANS_IDX_LPS = [
    0, 0, 1, 2, 2, 4, 4, 5, 6, 7, 8, 9, 9, 11, 11, 12,
    13, 13, 15, 15, 16, 16, 18, 18, 19, 19, 21, 21, 23, 23, 24, 24,
    25, 26, 26, 27, 27, 28, 29, 29, 30, 30, 30, 31, 32, 32, 33, 33,
    33, 34, 34, 35, 35, 35, 36, 36, 36, 37, 37, 37, 38, 38, 38, 63,
]

# part_mode context 0 initValue for I slices (HEVC Table 9-12 family;
# the HM initializer constant 184).  part_mode is the ONLY
# context-coded bin on the all-PCM path: with CtbSizeY == MinCbSizeY
# the quadtree codes no split_cu_flag, and for I slices part_mode is
# present exactly when log2CbSize == MinCbLog2SizeY (§7.3.8.5) with
# binarization "1" = PART_2Nx2N (ctx 0, no neighbor dependence).
_PART_MODE_INIT = 184


def _ctx_init(init_value: int, qp: int = 26) -> list[int]:
    """§9.3.2.2: initValue -> [pStateIdx, valMps] at SliceQpY."""
    slope = (init_value >> 4) * 5 - 45
    offset = ((init_value & 15) << 3) - 16
    pre = min(126, max(1, ((slope * min(max(qp, 0), 51)) >> 4) + offset))
    return [pre - 64, 1] if pre > 63 else [63 - pre, 0]


class _CabacEncoder:
    """Arithmetic encoder over a BitWriter (one segment at a time)."""

    def __init__(self, w: BitWriter) -> None:
        self.w = w
        self.start()

    def start(self) -> None:
        self.low = 0
        self.range = 510
        self.outstanding = 0
        self.first = True

    def _put(self, b: int) -> None:
        if self.first:
            self.first = False
        else:
            self.w.u(b, 1)
        while self.outstanding:
            self.w.u(1 - b, 1)
            self.outstanding -= 1

    def _renorm(self) -> None:
        while self.range < 256:
            if self.low < 256:
                self._put(0)
            elif self.low >= 512:
                self.low -= 512
                self._put(1)
            else:
                self.low -= 256
                self.outstanding += 1
            self.range <<= 1
            self.low <<= 1

    def decision(self, ctx: list[int], bin_val: int) -> None:
        lps = _RANGE_TAB_LPS[ctx[0]][(self.range >> 6) & 3]
        self.range -= lps
        if bin_val != ctx[1]:
            self.low += self.range
            self.range = lps
            if ctx[0] == 0:
                ctx[1] = 1 - ctx[1]
            ctx[0] = _TRANS_IDX_LPS[ctx[0]]
        else:
            ctx[0] = min(ctx[0] + 1, 62)
        self._renorm()

    def terminate(self, bin_val: int) -> None:
        self.range -= 2
        if bin_val:
            self.low += self.range
            self.range = 2            # EncodeFlush
            self._renorm()            # 7 bits
            self._put((self.low >> 9) & 1)
            self.w.u(((self.low >> 7) & 3) | 1, 2)  # raw stop pattern
        else:
            self._renorm()


class _CabacDecoder:
    """Arithmetic decoder over a BitReader (mirrors _CabacEncoder)."""

    def __init__(self, r: BitReader) -> None:
        self.r = r
        self.start()

    def start(self) -> None:
        self.range = 510
        self.offset = self.r.u(9)

    def decision(self, ctx: list[int]) -> int:
        lps = _RANGE_TAB_LPS[ctx[0]][(self.range >> 6) & 3]
        self.range -= lps
        if self.offset >= self.range:
            bin_val = 1 - ctx[1]
            self.offset -= self.range
            self.range = lps
            if ctx[0] == 0:
                ctx[1] = 1 - ctx[1]
            ctx[0] = _TRANS_IDX_LPS[ctx[0]]
        else:
            bin_val = ctx[1]
            ctx[0] = min(ctx[0] + 1, 62)
        while self.range < 256:
            self.range <<= 1
            self.offset = (self.offset << 1) | self.r.u(1)
        return bin_val

    def terminate(self) -> int:
        self.range -= 2
        if self.offset >= self.range:
            return 1
        while self.range < 256:
            self.range <<= 1
            self.offset = (self.offset << 1) | self.r.u(1)
        return 0


def _write_slice_header(w: BitWriter) -> None:
    """IDR I-slice segment header (§7.3.6.1) under encode_hevc_pps'
    layout; ends with byte_alignment so CABAC starts byte-aligned."""
    w.u(1, 1)        # first_slice_segment_in_pic_flag
    w.u(0, 1)        # no_output_of_prior_pics_flag (IRAP nal type)
    w.ue(0)          # slice_pic_parameter_set_id
    w.ue(2)          # slice_type: I
    # IDR: no POC / ref-pic-set syntax; SAO off; I slice: no ref lists
    w.se(0)          # slice_qp_delta
    # deblocking override off + loop-filter-across condition false +
    # no tiles/WPP entry points + no extension -> nothing else
    w.u(1, 1)        # byte_alignment: alignment_bit_equal_to_one
    while len(w._bits) % 8:
        w.u(0, 1)    # alignment_bit_equal_to_zero


def encode_pcm_islice(
    y: "np.ndarray", cb: "np.ndarray", cr: "np.ndarray"
) -> bytes:
    """IDR_W_RADL slice NAL (type 19) whose CTUs are all PCM coding
    units.  ``y`` is (H, W) uint8 with H, W multiples of 16 (the
    CtbSizeY = MinCbSizeY = 16 canvas of encode_hevc_sps(pcm=True) —
    the conformance window recovers the true size); ``cb``/``cr`` are
    the (H/2, W/2) 4:2:0 chroma planes."""
    import numpy as np

    y = np.asarray(y, dtype=np.uint8)
    cb = np.asarray(cb, dtype=np.uint8)
    cr = np.asarray(cr, dtype=np.uint8)
    hh, ww = y.shape
    if hh % 16 or ww % 16:
        raise ValueError("h265: PCM canvas must be CTU(16)-aligned")
    if cb.shape != (hh // 2, ww // 2) or cr.shape != (hh // 2, ww // 2):
        raise ValueError("h265: chroma planes must be (H/2, W/2)")
    w = BitWriter()
    _write_slice_header(w)
    enc = _CabacEncoder(w)
    ctx_part = _ctx_init(_PART_MODE_INIT)
    n_ctb_w, n_ctb_h = ww // 16, hh // 16
    last = (n_ctb_h - 1, n_ctb_w - 1)
    for cy in range(n_ctb_h):
        for cx in range(n_ctb_w):
            # coding_quadtree: split_cu_flag absent (CtbSize==MinCbSize,
            # inferred 0); coding_unit: I slice, transquant bypass off ->
            # first element is part_mode (log2CbSize == MinCbLog2SizeY)
            enc.decision(ctx_part, 1)   # PART_2Nx2N
            enc.terminate(1)            # pcm_flag = 1 (+ flush)
            while len(w._bits) % 8:
                w.u(0, 1)               # pcm_alignment_zero_bit
            blk = y[cy * 16:(cy + 1) * 16, cx * 16:(cx + 1) * 16]
            for b in blk.reshape(-1):
                w.u(int(b), 8)          # pcm_sample_luma
            for plane in (cb, cr):      # pcm_sample_chroma (Cb then Cr)
                cblk = plane[cy * 8:(cy + 1) * 8, cx * 8:(cx + 1) * 8]
                for b in cblk.reshape(-1):
                    w.u(int(b), 8)
            enc.start()                 # §9.3.1: engine re-init after PCM
            enc.terminate(1 if (cy, cx) == last else 0)
    while len(w._bits) % 8:             # rbsp trailing alignment (the
        w.u(0, 1)                       # flush already emitted the stop 1)
    return bytes([19 << 1, 1]) + _escape_rbsp(w.bytes())


def decode_pcm_islice(
    nal: bytes, ctbs_w: int, ctbs_h: int
) -> tuple["np.ndarray", "np.ndarray", "np.ndarray"]:
    """Invert encode_pcm_islice: (y, cb, cr) planes on the CTU canvas
    (crop with the SPS conformance window afterwards).  Raises
    NotImplementedError on any bin pattern other than the all-PCM
    I-slice path — the per-CU boundary (NxN partitions, pcm_flag=0,
    non-I slices need prediction/transform/full-residual CABAC)."""
    import numpy as np

    if len(nal) < 2:
        raise ValueError("h265: truncated NAL")
    nal_type = (nal[0] >> 1) & 0x3F
    if not 0 <= nal_type <= 31:
        raise ValueError("h265: not a VCL (slice) NAL")
    r = BitReader(_unescape_rbsp(nal[2:]))
    if r.u(1) != 1:
        raise NotImplementedError("h265: non-first slice segments unsupported")
    if 16 <= nal_type <= 23:
        r.u(1)               # no_output_of_prior_pics_flag
    r.ue()                   # slice_pic_parameter_set_id
    slice_type = r.ue()
    if slice_type != 2:
        raise NotImplementedError(
            f"h265: only I slices decode (slice_type {slice_type})"
        )
    if not 16 <= nal_type <= 23:
        r.u(16)              # slice_pic_order_cnt_lsb (non-IRAP layout)
        raise NotImplementedError("h265: non-IRAP slices unsupported")
    r.se()                   # slice_qp_delta
    if r.u(1) != 1:
        raise ValueError("h265: bad slice-header alignment bit")
    while r._pos % 8:
        if r.u(1):
            raise ValueError("h265: nonzero slice-header alignment bit")
    dec = _CabacDecoder(r)
    ctx_part = _ctx_init(_PART_MODE_INIT)
    y = np.zeros((ctbs_h * 16, ctbs_w * 16), dtype=np.uint8)
    cb = np.zeros((ctbs_h * 8, ctbs_w * 8), dtype=np.uint8)
    cr = np.zeros((ctbs_h * 8, ctbs_w * 8), dtype=np.uint8)
    last = (ctbs_h - 1, ctbs_w - 1)
    for cy in range(ctbs_h):
        for cx in range(ctbs_w):
            if dec.decision(ctx_part) != 1:
                raise NotImplementedError(
                    "h265: PART_NxN intra CU needs prediction decode — "
                    "only PCM coding units are in scope"
                )
            if dec.terminate() != 1:
                raise NotImplementedError(
                    "h265: pcm_flag=0 CU needs intra prediction + "
                    "residual CABAC — only PCM coding units are in scope"
                )
            while r._pos % 8:
                if r.u(1):
                    raise ValueError("h265: nonzero pcm alignment bit")
            buf = np.frombuffer(
                r._d[r._pos >> 3:(r._pos >> 3) + 384], dtype=np.uint8
            )
            if buf.size != 384:
                raise ValueError("h265: truncated PCM coding unit")
            r._pos += 384 * 8
            y[cy * 16:(cy + 1) * 16, cx * 16:(cx + 1) * 16] = (
                buf[:256].reshape(16, 16)
            )
            cb[cy * 8:(cy + 1) * 8, cx * 8:(cx + 1) * 8] = (
                buf[256:320].reshape(8, 8)
            )
            cr[cy * 8:(cy + 1) * 8, cx * 8:(cx + 1) * 8] = (
                buf[320:384].reshape(8, 8)
            )
            dec.start()                 # engine re-init after PCM
            eos = dec.terminate()
            if eos != (1 if (cy, cx) == last else 0):
                raise ValueError("h265: end_of_slice_segment_flag mismatch")
    return y, cb, cr
