"""Metadata-only MP4 / ISO-BMFF box parser — SURVEY.md §2.12 L7 (r5).

A real mixed crawl carries video columns; full H.264/H.265 frame decode
is permanently out of scope for a pure-numpy repo (and documented as
the one remaining stub boundary in operators/multimodal.py), but the
CONTAINER is a published standard (ISO/IEC 14496-12: a tree of
length-prefixed "boxes"), so duration, track geometry, codec fourcc and
sample counts are all parseable without any codec library.  That is
exactly what a curation pipeline needs from video at scale: filter by
duration/resolution/codec BEFORE shipping payloads to a GPU decode
fleet.

Implemented from the public ISO 14496-12 structure:
- box header: u32 size + fourcc; size==1 -> u64 largesize follows;
  size==0 -> box extends to end of enclosing scope
- containers walked recursively: moov, trak, mdia, minf, stbl, edts
- ftyp (major/compatible brands), mvhd (movie timescale+duration,
  v0/v1), tkhd (track id, 16.16-fixed width/height, v0/v1), mdhd
  (media timescale+duration, 5-bit-packed language, v0/v1), hdlr
  (handler fourcc: vide/soun/...), stsd (first sample-entry fourcc =
  the codec), stsz (sample count)

Corrupt input (truncated box, size < 8, child overrunning its parent,
missing moov) raises ValueError with the offending offset — never a
silent partial parse.
"""

from __future__ import annotations

import struct
from typing import Iterator

_CONTAINERS = {"moov", "trak", "mdia", "minf", "stbl", "edts", "udta", "mvex"}


def iter_boxes(
    data: bytes, start: int = 0, end: int | None = None
) -> Iterator[tuple[str, int, int]]:
    """Yield (fourcc, body_start, body_end) for each box in [start, end).

    Raises ValueError on structurally invalid sizes or truncation."""
    end = len(data) if end is None else end
    p = start
    while p < end:
        if p + 8 > end:
            raise ValueError(f"mp4: truncated box header at offset {p}")
        (size,) = struct.unpack_from(">I", data, p)
        fourcc = data[p + 4 : p + 8].decode("latin-1")
        body = p + 8
        if size == 1:
            if p + 16 > end:
                raise ValueError(f"mp4: truncated largesize at offset {p}")
            (size,) = struct.unpack_from(">Q", data, p + 8)
            body = p + 16
        elif size == 0:  # to end of enclosing scope
            size = end - p
        if size < body - p:
            raise ValueError(f"mp4: box size {size} too small at offset {p}")
        if p + size > end:
            raise ValueError(
                f"mp4: box {fourcc!r} at offset {p} overruns its scope "
                f"({p + size} > {end})"
            )
        yield fourcc, body, p + size
        p += size


def _find(data: bytes, start: int, end: int, fourcc: str) -> tuple[int, int] | None:
    for fc, s, e in iter_boxes(data, start, end):
        if fc == fourcc:
            return s, e
    return None


def _need(e: int, upto: int, box: str) -> None:
    """Bounds guard: every fixed-offset read below must land inside the
    box's DECLARED extent — a short box raises the documented
    ValueError instead of silently reading the next sibling's bytes
    (garbage metadata) or dying with struct.error at the buffer end."""
    if upto > e:
        raise ValueError(
            f"mp4: {box} box too short (needs {upto}, ends at {e})"
        )


def _full_box(data: bytes, s: int, e: int, box: str) -> tuple[int, int]:
    """(version, flags) of a FullBox body starting at s."""
    _need(e, s + 4, box)
    (vf,) = struct.unpack_from(">I", data, s)
    return vf >> 24, vf & 0xFFFFFF


def _parse_mvhd(data: bytes, s: int, e: int) -> tuple[int, int]:
    v, _ = _full_box(data, s, e, "mvhd")
    if v == 1:
        _need(e, s + 4 + 16 + 12, "mvhd")
        ts, dur = struct.unpack_from(">IQ", data, s + 4 + 16)
    else:
        _need(e, s + 4 + 8 + 8, "mvhd")
        ts, dur = struct.unpack_from(">II", data, s + 4 + 8)
    return ts, dur


def _parse_tkhd(data: bytes, s: int, e: int) -> tuple[int, float, float]:
    v, _ = _full_box(data, s, e, "tkhd")
    if v == 1:
        _need(e, s + 4 + 16 + 4, "tkhd")
        (track_id,) = struct.unpack_from(">I", data, s + 4 + 16)
        geo = s + 4 + 16 + 4 + 4 + 8  # +reserved +duration(8)
    else:
        _need(e, s + 4 + 8 + 4, "tkhd")
        (track_id,) = struct.unpack_from(">I", data, s + 4 + 8)
        geo = s + 4 + 8 + 4 + 4 + 4  # +reserved +duration(4)
    # reserved(8) layer(2) alternate_group(2) volume(2) reserved(2)
    # matrix(36) then width/height as 16.16 fixed point
    _need(e, geo + 8 + 2 + 2 + 2 + 2 + 36 + 8, "tkhd")
    w_fx, h_fx = struct.unpack_from(">II", data, geo + 8 + 2 + 2 + 2 + 2 + 36)
    return track_id, w_fx / 65536.0, h_fx / 65536.0


def _parse_mdhd(data: bytes, s: int, e: int) -> tuple[int, int, str]:
    v, _ = _full_box(data, s, e, "mdhd")
    if v == 1:
        ts_off, lang_off = s + 4 + 16, s + 4 + 16 + 12
        _need(e, lang_off + 2, "mdhd")
        ts, dur = struct.unpack_from(">IQ", data, ts_off)
    else:
        ts_off, lang_off = s + 4 + 8, s + 4 + 8 + 8
        _need(e, lang_off + 2, "mdhd")
        ts, dur = struct.unpack_from(">II", data, ts_off)
    (packed,) = struct.unpack_from(">H", data, lang_off)
    lang = "".join(
        chr(((packed >> sh) & 0x1F) + 0x60) for sh in (10, 5, 0)
    )
    return ts, dur, lang


def parse_mp4_metadata(data: bytes) -> dict:
    """Parse an ISO-BMFF byte string into typed metadata.

    Returns {brand, compatible_brands, duration_s, timescale, tracks:
    [{track_id, handler, codec, width, height, duration_s, language,
    n_samples}]}.  Raises ValueError on malformed structure or a
    missing moov box."""
    # eager structural pass over the top level: a truncated or
    # overrunning trailing box (e.g. cut mdat) must fail the parse even
    # though the metadata boxes precede it — callers use this as the
    # is-this-file-intact gate before shipping payloads downstream
    list(iter_boxes(data))
    brand, compat = None, []
    ftyp = _find(data, 0, len(data), "ftyp")
    if ftyp:
        s, e = ftyp
        brand = data[s : s + 4].decode("latin-1")
        compat = [
            data[p : p + 4].decode("latin-1") for p in range(s + 8, e, 4)
        ]
    moov = _find(data, 0, len(data), "moov")
    if moov is None:
        raise ValueError("mp4: no moov box — not a valid ISO-BMFF movie")
    ms, me = moov
    mvhd = _find(data, ms, me, "mvhd")
    if mvhd is None:
        raise ValueError("mp4: moov without mvhd")
    ts, dur = _parse_mvhd(data, mvhd[0], mvhd[1])
    out = {
        "brand": brand,
        "compatible_brands": compat,
        "timescale": ts,
        "duration_s": round(dur / ts, 6) if ts else None,
        "tracks": [],
    }
    for fc, trs, tre in iter_boxes(data, ms, me):
        if fc != "trak":
            continue
        tr: dict = {
            "track_id": None,
            "handler": None,
            "codec": None,
            "width": None,
            "height": None,
            "duration_s": None,
            "language": None,
            "n_samples": None,
        }
        tkhd = _find(data, trs, tre, "tkhd")
        if tkhd:
            tr["track_id"], tr["width"], tr["height"] = _parse_tkhd(
                data, tkhd[0], tkhd[1]
            )
        mdia = _find(data, trs, tre, "mdia")
        if mdia:
            mdhd = _find(data, mdia[0], mdia[1], "mdhd")
            if mdhd:
                mts, mdur, lang = _parse_mdhd(data, mdhd[0], mdhd[1])
                tr["duration_s"] = round(mdur / mts, 6) if mts else None
                tr["language"] = lang
            hdlr = _find(data, mdia[0], mdia[1], "hdlr")
            if hdlr:
                _need(hdlr[1], hdlr[0] + 12, "hdlr")
                tr["handler"] = data[hdlr[0] + 8 : hdlr[0] + 12].decode(
                    "latin-1"
                )
            minf = _find(data, mdia[0], mdia[1], "minf")
            if minf:
                stbl = _find(data, minf[0], minf[1], "stbl")
                if stbl:
                    stsd = _find(data, stbl[0], stbl[1], "stsd")
                    if stsd:
                        s = stsd[0]
                        _need(stsd[1], s + 8, "stsd")
                        (n_entries,) = struct.unpack_from(">I", data, s + 4)
                        if n_entries > 0 and s + 16 <= stsd[1]:
                            tr["codec"] = data[s + 12 : s + 16].decode(
                                "latin-1"
                            )
                            # the visual sample entry may carry child
                            # boxes after its 78-byte fixed body (avcC
                            # holds the SPS with the TRUE cropped
                            # dimensions — tkhd lies for non-16-multiple
                            # sizes)
                            (esz,) = struct.unpack_from(">I", data, s + 8)
                            entry_end = min(s + 8 + esz, stsd[1])
                            child = s + 16 + 78
                            if child + 8 <= entry_end:
                                avcc = _find(
                                    data, child, entry_end, "avcC"
                                )
                                if avcc:
                                    from pyspec_spark.operators.h264 import (
                                        parse_avcc,
                                    )

                                    try:
                                        tr["avc"] = parse_avcc(
                                            data[avcc[0] : avcc[1]]
                                        )
                                    except ValueError:
                                        tr["avc"] = None
                                hvcc = _find(
                                    data, child, entry_end, "hvcC"
                                )
                                if hvcc:
                                    from pyspec_spark.operators.h265 import (
                                        parse_hvcc,
                                    )

                                    try:
                                        tr["hevc"] = parse_hvcc(
                                            data[hvcc[0] : hvcc[1]]
                                        )
                                    except ValueError:
                                        tr["hevc"] = None
                                av1c = _find(
                                    data, child, entry_end, "av1C"
                                )
                                if av1c:
                                    from pyspec_spark.operators.av1 import (
                                        parse_av1c,
                                    )

                                    try:
                                        tr["av1"] = parse_av1c(
                                            data[av1c[0] : av1c[1]]
                                        )
                                    except ValueError:
                                        tr["av1"] = None
                    stsz = _find(data, stbl[0], stbl[1], "stsz")
                    if stsz:
                        _need(stsz[1], stsz[0] + 12, "stsz")
                        _, n = struct.unpack_from(
                            ">II", data, stsz[0] + 4
                        )
                        tr["n_samples"] = n
        out["tracks"].append(tr)
    return out


# ---------------------------------------------------------------------------
# Deterministic minimal-file synthesizer (tests + corpus builder): a
# structurally valid single-video-track movie, built from the same box
# layout the parser reads.
# ---------------------------------------------------------------------------
def _box(fourcc: str, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc.encode("latin-1") + body


def make_minimal_mp4(
    width: int = 64,
    height: int = 48,
    duration_s: float = 2.0,
    timescale: int = 1000,
    codec: str = "avc1",
    n_samples: int = 48,
    language: str = "und",
    avc_params: tuple[int, int] | None = None,
    hevc_params: tuple[int, int, int] | None = None,
    av1_params: tuple[int, int, int, int] | None = None,
) -> bytes:
    """Synthesize a minimal valid MP4: ftyp + moov(mvhd, trak(tkhd,
    mdia(mdhd, hdlr, minf(stbl(stsd(codec), stsz))))) + tiny mdat.

    ``avc_params = (profile_idc, level_idc)`` embeds a real avcC child
    box (one conformant SPS + PPS, operators/h264.py) in the sample
    entry; the tkhd/entry dimensions are then the MACROBLOCK-rounded
    size while the SPS carries the true cropped ``width``/``height`` —
    exactly the mismatch real files exhibit for non-16-multiple video,
    which is what makes parsing the SPS worth doing."""
    dur = int(round(duration_s * timescale))
    ftyp = _box("ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mvhd = _box(
        "mvhd",
        struct.pack(">I", 0)                       # version 0 + flags
        + struct.pack(">II", 0, 0)                 # ctime mtime
        + struct.pack(">II", timescale, dur)
        + struct.pack(">I", 0x00010000)            # rate 1.0
        + struct.pack(">H", 0x0100) + b"\x00" * 10  # volume + reserved
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24                             # predefined
        + struct.pack(">I", 2),                    # next track id
    )
    tkhd = _box(
        "tkhd",
        struct.pack(">I", 7)                       # v0, flags: enabled
        + struct.pack(">II", 0, 0)                 # ctime mtime
        + struct.pack(">I", 1)                     # track id
        + struct.pack(">I", 0)                     # reserved
        + struct.pack(">I", dur)
        + b"\x00" * 8                              # reserved
        + struct.pack(">HHHH", 0, 0, 0, 0)         # layer alt vol res
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    packed_lang = 0
    for c in language[:3]:
        packed_lang = (packed_lang << 5) | (ord(c) - 0x60)
    mdhd = _box(
        "mdhd",
        struct.pack(">I", 0)
        + struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, dur)
        + struct.pack(">HH", packed_lang, 0),
    )
    hdlr = _box(
        "hdlr",
        struct.pack(">I", 0) + struct.pack(">I", 0) + b"vide"
        + b"\x00" * 12 + b"video\x00",
    )
    # minimal visual sample entry per 14496-12 §12.1.3; with
    # avc_params the stored entry size is the mb-rounded one (as real
    # muxers write) and the truth lives in the avcC SPS
    entry_w, entry_h = width, height
    children = b""
    if avc_params is not None:
        from pyspec_spark.operators.h264 import (
            encode_pps,
            encode_sps,
            make_avcc,
        )

        profile_idc, level_idc = avc_params
        entry_w = (width + 15) // 16 * 16
        entry_h = (height + 15) // 16 * 16
        children = _box(
            "avcC",
            make_avcc(
                encode_sps(width, height, profile_idc, level_idc),
                encode_pps(),
            ),
        )
    elif hevc_params is not None:
        from pyspec_spark.operators.h265 import encode_hevc_sps, make_hvcc

        profile_idc, tier, level_idc = hevc_params
        entry_w = (width + 7) // 8 * 8   # HEVC min CU rounding
        entry_h = (height + 7) // 8 * 8
        children = _box(
            "hvcC",
            make_hvcc(
                encode_hevc_sps(width, height, profile_idc, level_idc, tier)
            ),
        )
    elif av1_params is not None:
        from pyspec_spark.operators.av1 import (
            encode_seq_header_obu,
            make_av1c,
        )

        profile_idc, level_idx, tier, high_bd = av1_params
        # AV1 frames are exact-sized (no mb rounding/crop); what the
        # container CANNOT express is profile/level/tier/bit-depth —
        # the OBU is the only source for those
        children = _box(
            "av1C",
            make_av1c(
                encode_seq_header_obu(
                    width, height, profile_idc, level_idx, tier, high_bd
                )
            ),
        )
    entry_rest = (
        b"\x00" * 6 + struct.pack(">H", 1)         # reserved + dref idx
        + b"\x00" * 16                             # predef/reserved
        + struct.pack(">HH", entry_w, entry_h)
        + struct.pack(">II", 0x480000, 0x480000)   # 72 dpi
        + struct.pack(">I", 0) + struct.pack(">H", 1)
        + b"\x00" * 32                             # compressor name
        + struct.pack(">Hh", 24, -1)
        + children
    )
    entry = (
        struct.pack(">I", 8 + len(entry_rest))
        + codec.encode("latin-1")
        + entry_rest
    )
    stsd = _box("stsd", struct.pack(">I", 0) + struct.pack(">I", 1) + entry)
    stsz = _box(
        "stsz",
        struct.pack(">I", 0) + struct.pack(">II", 0, n_samples)
        + b"".join(struct.pack(">I", 16) for _ in range(n_samples)),
    )
    stbl = _box("stbl", stsd + stsz)
    minf = _box("minf", stbl)
    mdia = _box("mdia", mdhd + hdlr + minf)
    trak = _box("trak", tkhd + mdia)
    moov = _box("moov", mvhd + trak)
    mdat = _box("mdat", bytes(16) * n_samples)
    return ftyp + moov + mdat


# ---------------------------------------------------------------------------
# MJPEG-in-MP4 (round 6, VERDICT #4): Motion JPEG stores each video
# sample as a COMPLETE baseline-JPEG image ('jpeg' sample-entry fourcc
# per ISO 14496-12 / QuickTime), so the container needs only the sample
# tables — no bitstream codec.  This closes the mp4 frame-decode stub
# for the one codec the in-repo T.81 decoder (operators/jpeg.py) can
# serve; r8 additionally closed avc1 for IDR/I_PCM streams
# (make_avc_ipcm_mp4 below, operators/h264.py); HEVC/AV1 frames and
# transformed H.264 macroblocks remain the documented out-of-scope
# boundary.  The synthesizer writes REAL stsc/stco/stsz tables (one
# chunk holding all samples, per-sample sizes, absolute chunk offset)
# and the extractor reads frames back through them — the same
# offset-walk a production demuxer does, so seeking frame k touches
# only frame k's bytes.
# ---------------------------------------------------------------------------
def make_mjpeg_mp4(
    frames: list[bytes],
    width: int,
    height: int,
    fps: float = 24.0,
    timescale: int = 1000,
    language: str = "und",
    entry_fourcc: str = "jpeg",
    entry_children: bytes = b"",
    entry_dims: tuple[int, int] | None = None,
) -> bytes:
    """Valid single-track movie whose mdat holds ``frames`` addressed by
    real stsz/stsc/stco.  Default sample entry is MJPEG ('jpeg', each
    frame a complete JPEG byte string); ``entry_fourcc``/
    ``entry_children``/``entry_dims`` generalize it (r8: 'avc1' +
    an avcC child + the macroblock-rounded coded size, frames =
    length-prefixed NAL samples — see make_avc_ipcm_mp4)."""
    n_samples = len(frames)
    dur = int(round(n_samples / fps * timescale))
    ftyp = _box("ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")

    def moov_for(chunk_offset: int) -> bytes:
        mvhd = _box(
            "mvhd",
            struct.pack(">I", 0)
            + struct.pack(">II", 0, 0)
            + struct.pack(">II", timescale, dur)
            + struct.pack(">I", 0x00010000)
            + struct.pack(">H", 0x0100) + b"\x00" * 10
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + b"\x00" * 24
            + struct.pack(">I", 2),
        )
        tkhd = _box(
            "tkhd",
            struct.pack(">I", 7)
            + struct.pack(">II", 0, 0)
            + struct.pack(">I", 1)
            + struct.pack(">I", 0)
            + struct.pack(">I", dur)
            + b"\x00" * 8
            + struct.pack(">HHHH", 0, 0, 0, 0)
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", width << 16, height << 16),
        )
        packed_lang = 0
        for c in language[:3]:
            packed_lang = (packed_lang << 5) | (ord(c) - 0x60)
        mdhd = _box(
            "mdhd",
            struct.pack(">I", 0)
            + struct.pack(">II", 0, 0)
            + struct.pack(">II", timescale, dur)
            + struct.pack(">HH", packed_lang, 0),
        )
        hdlr = _box(
            "hdlr",
            struct.pack(">I", 0) + struct.pack(">I", 0) + b"vide"
            + b"\x00" * 12 + b"video\x00",
        )
        ew, eh = entry_dims or (width, height)
        entry_rest = (
            b"\x00" * 6 + struct.pack(">H", 1)
            + b"\x00" * 16
            + struct.pack(">HH", ew, eh)
            + struct.pack(">II", 0x480000, 0x480000)
            + struct.pack(">I", 0) + struct.pack(">H", 1)
            + b"\x00" * 32
            + struct.pack(">Hh", 24, -1)
            + entry_children
        )
        entry = (
            struct.pack(">I", 8 + len(entry_rest))
            + entry_fourcc.encode("latin-1")
            + entry_rest
        )
        stsd = _box("stsd", struct.pack(">I", 0) + struct.pack(">I", 1) + entry)
        stsz = _box(
            "stsz",
            struct.pack(">I", 0) + struct.pack(">II", 0, n_samples)
            + b"".join(struct.pack(">I", len(f)) for f in frames),
        )
        # one chunk, all samples in it, first sample-description
        stsc = _box(
            "stsc",
            struct.pack(">I", 0) + struct.pack(">I", 1)
            + struct.pack(">III", 1, n_samples, 1),
        )
        stco = _box(
            "stco",
            struct.pack(">I", 0) + struct.pack(">I", 1)
            + struct.pack(">I", chunk_offset),
        )
        stbl = _box("stbl", stsd + stsz + stsc + stco)
        minf = _box("minf", stbl)
        mdia = _box("mdia", mdhd + hdlr + minf)
        trak = _box("trak", tkhd + mdia)
        return _box("moov", mvhd + trak)

    # stco holds an ABSOLUTE file offset, which depends on moov's own
    # size — build once with a placeholder to learn the size (the size
    # does not depend on the offset value), then rebuild with the real
    # offset of the mdat body.
    moov_len = len(moov_for(0))
    chunk_offset = len(ftyp) + moov_len + 8  # +8 = mdat header
    moov = moov_for(chunk_offset)
    mdat = _box("mdat", b"".join(frames))
    return ftyp + moov + mdat


def extract_mp4_samples(
    data: bytes, frame_ids: list[int] | None = None
) -> tuple[str, list[bytes]]:
    """(sample_codec_fourcc, sample byte strings) for the first video
    track, addressed through stsz/stsc/stco like a real demuxer.

    ``frame_ids=None`` returns every sample; otherwise only the
    requested ones (seek = offset arithmetic, untouched samples are
    never sliced).  Supports the one-chunk layout make_mjpeg_mp4 writes
    plus the general N-chunk stsc walk.  Raises ValueError on missing
    sample tables or a sample overrunning the file (truncated mdat)."""
    list(iter_boxes(data))  # structural gate, same as parse_mp4_metadata
    moov = _find(data, 0, len(data), "moov")
    if moov is None:
        raise ValueError("mp4: no moov box — not a valid ISO-BMFF movie")
    for fc, trs, tre in iter_boxes(data, moov[0], moov[1]):
        if fc != "trak":
            continue
        mdia = _find(data, trs, tre, "mdia")
        if not mdia:
            continue
        hdlr = _find(data, mdia[0], mdia[1], "hdlr")
        if not hdlr or data[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        minf = _find(data, mdia[0], mdia[1], "minf")
        stbl = minf and _find(data, minf[0], minf[1], "stbl")
        if not stbl:
            raise ValueError("mp4: video track without stbl")
        stsd = _find(data, stbl[0], stbl[1], "stsd")
        if not stsd:
            raise ValueError("mp4: video track without stsd")
        _need(stsd[1], stsd[0] + 16, "stsd")
        codec = data[stsd[0] + 12 : stsd[0] + 16].decode("latin-1")
        stsz = _find(data, stbl[0], stbl[1], "stsz")
        if not stsz:
            raise ValueError("mp4: video track without stsz")
        s, e = stsz
        _need(e, s + 12, "stsz")
        fixed, n = struct.unpack_from(">II", data, s + 4)
        if fixed:
            sizes = [fixed] * n
        else:
            _need(e, s + 12 + 4 * n, "stsz")
            sizes = list(struct.unpack_from(f">{n}I", data, s + 12))
        stco = _find(data, stbl[0], stbl[1], "stco")
        if not stco:
            raise ValueError("mp4: video track without stco")
        s, e = stco
        _need(e, s + 8, "stco")
        (n_chunks,) = struct.unpack_from(">I", data, s + 4)
        _need(e, s + 8 + 4 * n_chunks, "stco")
        chunk_offsets = list(struct.unpack_from(f">{n_chunks}I", data, s + 8))
        stsc = _find(data, stbl[0], stbl[1], "stsc")
        if not stsc:
            raise ValueError("mp4: video track without stsc")
        s, e = stsc
        _need(e, s + 8, "stsc")
        (n_ent,) = struct.unpack_from(">I", data, s + 4)
        _need(e, s + 8 + 12 * n_ent, "stsc")
        runs = [
            struct.unpack_from(">III", data, s + 8 + 12 * i)
            for i in range(n_ent)
        ]
        # expand stsc runs -> samples-per-chunk, then absolute offsets
        offsets: list[int] = []
        sample = 0
        for ci in range(n_chunks):
            per = 0
            for first_chunk, spc, _desc in runs:
                if ci + 1 >= first_chunk:
                    per = spc
            off = chunk_offsets[ci]
            for _ in range(per):
                if sample >= n:
                    break
                offsets.append(off)
                off += sizes[sample]
                sample += 1
        if sample < n:
            raise ValueError(
                f"mp4: stsc/stco address only {sample} of {n} samples"
            )
        want = range(n) if frame_ids is None else frame_ids
        out: list[bytes] = []
        for k in want:
            if not 0 <= k < n:
                raise ValueError(f"mp4: frame {k} out of range (n={n})")
            lo, hi = offsets[k], offsets[k] + sizes[k]
            if hi > len(data):
                raise ValueError(
                    f"mp4: sample {k} overruns file ({hi} > {len(data)})"
                )
            out.append(data[lo:hi])
        return codec, out
    raise ValueError("mp4: no video (hdlr=vide) track")


def make_avc_ipcm_mp4(
    planes: list[tuple],
    width: int,
    height: int,
    fps: float = 24.0,
) -> bytes:
    """Valid single-track avc1 movie whose samples are REAL H.264
    IDR/I_PCM access units (r8): each element of ``planes`` is a
    (y, cb, cr) tuple on the true width x height geometry; planes pad
    to the macroblock canvas (edge-replication — cropped away at
    decode), encode as an I_PCM IDR NAL, and land in mdat as the
    4-byte-length-prefixed samples the avcC lengthSizeMinusOne=3
    contract prescribes (ISO 14496-15 §5.3.4.2).  The sample entry
    carries the coded (macroblock-rounded) size and a real avcC; the
    SPS carries the true cropped dimensions — the same mismatch
    make_minimal_mp4 plants, now with decodable payload behind it."""
    import numpy as np

    from pyspec_spark.operators.h264 import (
        encode_ipcm_idr,
        encode_pps,
        encode_sps,
        make_avcc,
    )

    if width % 2 or height % 2:
        raise ValueError("mp4/avc: 4:2:0 dimensions must be even")
    ew = (width + 15) // 16 * 16
    eh = (height + 15) // 16 * 16
    sps, pps = encode_sps(width, height), encode_pps()
    samples = []
    for y, cb, cr in planes:
        y = np.asarray(y, dtype=np.uint8)
        cb = np.asarray(cb, dtype=np.uint8)
        cr = np.asarray(cr, dtype=np.uint8)
        if y.shape != (height, width):
            raise ValueError("mp4/avc: luma plane must be height x width")
        yp = np.pad(y, ((0, eh - height), (0, ew - width)), mode="edge")
        cbp = np.pad(
            cb,
            ((0, eh // 2 - height // 2), (0, ew // 2 - width // 2)),
            mode="edge",
        )
        crp = np.pad(
            cr,
            ((0, eh // 2 - height // 2), (0, ew // 2 - width // 2)),
            mode="edge",
        )
        nal = encode_ipcm_idr(yp, cbp, crp)
        samples.append(struct.pack(">I", len(nal)) + nal)
    return make_mjpeg_mp4(
        samples,
        width,
        height,
        fps=fps,
        entry_fourcc="avc1",
        entry_children=_box("avcC", make_avcc(sps, pps)),
        entry_dims=(ew, eh),
    )


def make_hevc_ipcm_mp4(
    planes: list[tuple],
    width: int,
    height: int,
    fps: float = 24.0,
) -> bytes:
    """Valid single-track hvc1 movie whose samples are REAL HEVC
    IDR/PCM access units (r9, the hvc1 twin of make_avc_ipcm_mp4):
    each element of ``planes`` is a (y, cb, cr) tuple on the true
    width x height geometry; planes pad to the 16-px CTU canvas
    (edge-replication — cropped away at decode via the SPS conformance
    window), encode as an all-PCM IDR_W_RADL NAL
    (operators/h265.py encode_pcm_islice — real CABAC-framed PCM
    coding units), and land in mdat as the 4-byte-length-prefixed
    samples the hvcC lengthSizeMinusOne=3 contract prescribes (ISO
    14496-15 §8.3.3).  The sample entry carries the coded
    (CTU-rounded) size and a real hvcC with SPS+PPS arrays; the SPS
    carries the true windowed dimensions."""
    import numpy as np

    from pyspec_spark.operators.h265 import (
        encode_hevc_pps,
        encode_hevc_sps,
        encode_pcm_islice,
        make_hvcc,
    )

    if width % 2 or height % 2:
        raise ValueError("mp4/hevc: 4:2:0 dimensions must be even")
    ew = (width + 15) // 16 * 16
    eh = (height + 15) // 16 * 16
    sps = encode_hevc_sps(width, height, pcm=True)
    pps = encode_hevc_pps()
    samples = []
    for y, cb, cr in planes:
        y = np.asarray(y, dtype=np.uint8)
        cb = np.asarray(cb, dtype=np.uint8)
        cr = np.asarray(cr, dtype=np.uint8)
        if y.shape != (height, width):
            raise ValueError("mp4/hevc: luma plane must be height x width")
        yp = np.pad(y, ((0, eh - height), (0, ew - width)), mode="edge")
        cbp = np.pad(
            cb,
            ((0, eh // 2 - height // 2), (0, ew // 2 - width // 2)),
            mode="edge",
        )
        crp = np.pad(
            cr,
            ((0, eh // 2 - height // 2), (0, ew // 2 - width // 2)),
            mode="edge",
        )
        nal = encode_pcm_islice(yp, cbp, crp)
        samples.append(struct.pack(">I", len(nal)) + nal)
    return make_mjpeg_mp4(
        samples,
        width,
        height,
        fps=fps,
        entry_fourcc="hvc1",
        entry_children=_box("hvcC", make_hvcc(sps, pps)),
        entry_dims=(ew, eh),
    )
