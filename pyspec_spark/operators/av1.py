"""AV1 sequence-header codec — OBU/av1C synthesis and parsing, pure
Python (clean-room from the public AV1 Bitstream & Decoding Process
Specification v1.0.0 §5.3 (OBU syntax) / §5.5 (sequence header) and
the AV1 Codec ISO Media File Format Binding §2.3 for the av1C record).

Completes the h264/h265 trilogy for the ``av01`` fourcc: the metadata
a curation pipeline gates on — seq_profile, seq_level_idx, seq_tier,
bit depth, monochrome flag, chroma subsampling, and max frame
dimensions — none of which the ISO container carries in a typed field
(the av1C header bits duplicate a subset, and real muxers have been
observed to contradict the OBU; the OBU is the truth).  Tile/frame
decode stays the documented NotImplementedError boundary
(operators/multimodal.decode_frame); AV1 has no raw-sample coding
mode at all (every block goes through the transform/prediction
pipeline with entropy-coded symbols), so no I_PCM-style exact
narrowing (the r8 avc1 path) exists to implement.

Unlike H.264/H.265 RBSP there is NO emulation-prevention escaping in
AV1 — OBUs are length-delimited (leb128 obu_size) instead, so the
writer/reader pair here pins leb128 + the unaligned bit layout rather
than an escape scheme.  BitWriter/BitReader are shared with h264.py
(MSB-first order is identical).
"""

from __future__ import annotations

from pyspec_spark.operators.h264 import BitReader, BitWriter

_OBU_SEQUENCE_HEADER = 1


def _leb128(value: int) -> bytes:
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_leb128(buf: bytes, pos: int) -> tuple[int, int]:
    v = 0
    for i in range(8):
        b = buf[pos + i]
        v |= (b & 0x7F) << (7 * i)
        if not (b & 0x80):
            return v, pos + i + 1
    raise ValueError("av1: leb128 too long")


def encode_seq_header_obu(
    width: int,
    height: int,
    seq_profile: int = 0,
    seq_level_idx: int = 8,
    seq_tier: int = 0,
    high_bitdepth: int = 0,
    monochrome: int = 0,
) -> bytes:
    """A conformant OBU_SEQUENCE_HEADER (full header path, one
    operating point, no timing/decoder-model/display-delay info, no
    film grain).  seq_tier is only codable when seq_level_idx > 7
    (spec: levels <= 3.x have no tier bit); profile 0 = 4:2:0 8/10-bit,
    profile 1 = 4:4:4.  monochrome requires profile 0 or 2."""
    if seq_tier and seq_level_idx <= 7:
        raise ValueError("av1: seq_tier requires seq_level_idx > 7")
    if monochrome and seq_profile == 1:
        raise ValueError("av1: profile 1 has no monochrome mode")
    w = BitWriter()
    w.u(seq_profile, 3)
    w.u(0, 1)                        # still_picture
    w.u(0, 1)                        # reduced_still_picture_header
    w.u(0, 1)                        # timing_info_present_flag
    w.u(0, 1)                        # initial_display_delay_present
    w.u(0, 5)                        # operating_points_cnt_minus_1
    w.u(0, 12)                       # operating_point_idc[0]
    w.u(seq_level_idx, 5)
    if seq_level_idx > 7:
        w.u(seq_tier, 1)
    wbits = max((width - 1).bit_length(), 1)
    hbits = max((height - 1).bit_length(), 1)
    w.u(wbits - 1, 4)                # frame_width_bits_minus_1
    w.u(hbits - 1, 4)                # frame_height_bits_minus_1
    w.u(width - 1, wbits)            # max_frame_width_minus_1
    w.u(height - 1, hbits)           # max_frame_height_minus_1
    w.u(0, 1)                        # frame_id_numbers_present_flag
    w.u(1, 1)                        # use_128x128_superblock
    w.u(0, 1)                        # enable_filter_intra
    w.u(0, 1)                        # enable_intra_edge_filter
    w.u(0, 1)                        # enable_interintra_compound
    w.u(0, 1)                        # enable_masked_compound
    w.u(0, 1)                        # enable_warped_motion
    w.u(0, 1)                        # enable_dual_filter
    w.u(0, 1)                        # enable_order_hint
    w.u(1, 1)                        # seq_choose_screen_content_tools
    w.u(0, 1)                        # seq_choose_integer_mv (tools=2)
    w.u(0, 1)                        # seq_force_integer_mv = 0
    w.u(0, 1)                        # enable_superres
    w.u(0, 1)                        # enable_cdef
    w.u(0, 1)                        # enable_restoration
    # color_config()
    w.u(high_bitdepth, 1)
    if seq_profile == 2 and high_bitdepth:
        w.u(0, 1)                    # twelve_bit
    if seq_profile != 1:
        w.u(monochrome, 1)
    w.u(0, 1)                        # color_description_present_flag
    if monochrome:
        w.u(0, 1)                    # color_range
    else:
        w.u(0, 1)                    # color_range
        if seq_profile == 0:
            pass                     # subsampling_x = subsampling_y = 1
        elif seq_profile == 1:
            pass                     # subsampling_x = subsampling_y = 0
        else:                        # profile 2: 8/10-bit -> 4:2:2
            pass
        if seq_profile == 0:
            w.u(0, 2)                # chroma_sample_position
        w.u(0, 1)                    # separate_uv_delta_q
    w.u(0, 1)                        # film_grain_params_present
    w.rbsp_trailing()                # trailing_one_bit + alignment
    payload = w.bytes()
    # obu_header: forbidden(1)=0 type(4) extension(1)=0 has_size(1)=1
    # reserved(1)=0
    header = bytes([(_OBU_SEQUENCE_HEADER << 3) | 0x02])
    return header + _leb128(len(payload)) + payload


def decode_seq_header_obu(obu: bytes) -> dict:
    """Invert encode_seq_header_obu (and parse any single-operating-
    point full-header sequence OBU without timing/decoder-model
    info)."""
    if not obu:
        raise ValueError("av1: empty OBU")
    h = obu[0]
    if h & 0x80:
        raise ValueError("av1: forbidden bit set")
    obu_type = (h >> 3) & 0x0F
    if obu_type != _OBU_SEQUENCE_HEADER:
        raise ValueError("av1: not a sequence header OBU")
    pos = 1
    if h & 0x04:                     # obu_extension_flag
        pos += 1
    if h & 0x02:                     # obu_has_size_field
        size, pos = _read_leb128(obu, pos)
        payload = obu[pos : pos + size]
    else:
        payload = obu[pos:]
    r = BitReader(payload)
    seq_profile = r.u(3)
    r.u(1)                           # still_picture
    if r.u(1):                       # reduced_still_picture_header
        seq_level_idx = r.u(5)
        seq_tier = 0
    else:
        if r.u(1):
            raise ValueError("av1: timing_info unsupported")
        r.u(1)                       # initial_display_delay_present
        op_cnt = r.u(5) + 1
        seq_level_idx = seq_tier = 0
        for i in range(op_cnt):
            r.u(12)                  # operating_point_idc[i]
            lvl = r.u(5)
            tier = r.u(1) if lvl > 7 else 0
            if i == 0:
                seq_level_idx, seq_tier = lvl, tier
    wbits = r.u(4) + 1
    hbits = r.u(4) + 1
    width = r.u(wbits) + 1
    height = r.u(hbits) + 1
    # full-header path continues with frame_id / tool flags; stop at
    # color_config for the gate-relevant fields
    r.u(1)                           # frame_id_numbers_present (=0 here)
    r.u(3)                           # superblock + 2 intra filter flags
    r.u(4)                           # compound/warp/dual-filter flags
    enable_order_hint = r.u(1)
    if enable_order_hint:
        r.u(2)                       # jnt_comp + ref_frame_mvs
    if r.u(1) == 0:                  # seq_choose_screen_content_tools
        tools = r.u(1)
    else:
        tools = 2
    if tools > 0:
        if r.u(1) == 0:              # seq_choose_integer_mv
            r.u(1)
    if enable_order_hint:
        r.u(3)                       # order_hint_bits_minus_1
    r.u(3)                           # superres + cdef + restoration
    high_bitdepth = r.u(1)
    twelve_bit = r.u(1) if (seq_profile == 2 and high_bitdepth) else 0
    bit_depth = 12 if twelve_bit else (10 if high_bitdepth else 8)
    monochrome = r.u(1) if seq_profile != 1 else 0
    if r.u(1):                       # color_description_present_flag
        r.u(24)
    if seq_profile == 0:
        sub_x = sub_y = 1
    elif seq_profile == 1:
        sub_x = sub_y = 0
    else:
        sub_x, sub_y = 1, 0
    return {
        "seq_profile": seq_profile,
        "seq_level_idx": seq_level_idx,
        "seq_tier": seq_tier,
        "width": width,
        "height": height,
        "bit_depth": bit_depth,
        "monochrome": monochrome,
        "subsampling_x": sub_x if not monochrome else 1,
        "subsampling_y": sub_y if not monochrome else 1,
    }


def make_av1c(seq_obu: bytes) -> bytes:
    """AV1CodecConfigurationRecord (AV1-ISOBMFF §2.3.3) wrapping one
    sequence header OBU; header bits mirror the OBU per the binding's
    requirement that they match."""
    d = decode_seq_header_obu(seq_obu)
    b0 = 0x80 | 1                                    # marker + version
    b1 = (d["seq_profile"] << 5) | d["seq_level_idx"]
    b2 = (
        (d["seq_tier"] << 7)
        | ((1 if d["bit_depth"] > 8 else 0) << 6)    # high_bitdepth
        | ((1 if d["bit_depth"] == 12 else 0) << 5)  # twelve_bit
        | (d["monochrome"] << 4)
        | (d["subsampling_x"] << 3)
        | (d["subsampling_y"] << 2)
        | 0                                          # chroma_sample_position
    )
    b3 = 0                                           # no presentation delay
    return bytes([b0, b1, b2, b3]) + seq_obu


def parse_av1c(buf: bytes) -> dict:
    """Parse an av1C record: find and decode the sequence header OBU in
    configOBUs (the OBU is authoritative; the 3 header bytes are
    ignored except for the marker/version sanity check)."""
    if len(buf) < 4 or buf[0] != 0x81:
        raise ValueError("av1: bad av1C record")
    pos = 4
    while pos < len(buf):
        h = buf[pos]
        obu_type = (h >> 3) & 0x0F
        p = pos + 1
        if h & 0x04:
            p += 1
        if not (h & 0x02):
            raise ValueError("av1: config OBU without size field")
        size, p = _read_leb128(buf, p)
        if obu_type == _OBU_SEQUENCE_HEADER:
            return decode_seq_header_obu(buf[pos : p + size])
        pos = p + size
    raise ValueError("av1: no sequence header OBU in av1C")
