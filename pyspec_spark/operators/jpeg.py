"""Baseline JPEG codec in pure numpy + stdlib — SURVEY.md §2.12 L7.

Baseline sequential DCT JPEG per the published ITU-T T.81 spec (the
public standard; quantization / Huffman defaults from its Annex K):
8-bit precision, grayscale (1 component) and YCbCr (3 components) with
4:4:4 or 4:2:0 sampling, restart markers, byte-stuffed entropy data.
Progressive (SOF2), arithmetic coding, 12-bit, and hierarchical modes
raise ``ValueError`` — they are outside baseline.

The encoder exists so tests and fixtures can generate real JPEG bytes
deterministically (same policy as the PNG/PPM/WAV codecs in
``operators/codecs.py``); the engine itself only needs decode.  The
encoder always emits the Annex K default Huffman tables; the decoder
reads whatever tables the stream declares.

Multi-frame ("video") payloads are plain concatenations of single JPEG
interchange streams (SOI..EOI); frame k is reached by marker-walking —
segment lengths for marker segments, a byte scan for stuffed entropy
data — without entropy-decoding the skipped frames.

Scale notes: decode runs per-row inside Arrow batches on executors
(``operators/multimodal.py``); payloads never touch the driver.  The
r5 rewrite made the decoder table-driven: a 16-bit-lookahead Huffman
LUT, the whole scan's bit state in function locals (no per-symbol
method calls), and ONE batched dequant+zigzag+IDCT matmul over all of
a component's blocks — measured 2.0–2.3× faster, bit-identical, at
~0.6–0.8 MB/s of entropy data per core (BASELINE.md r5 note).  The
residual cost is CPython interpreter dispatch on the inherently serial
per-symbol loop; a production deployment would swap this module for a
C codec behind the same ``decode_frames`` signature (same caveat as
the PNG unfilter loop, codecs.py:22).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Tables (ITU-T T.81 Annex K — published defaults)
# ---------------------------------------------------------------------------

# K.1 / K.2 base quantization tables, row-major natural order.
QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# K.3 default Huffman tables: (bits[1..16], values).
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# Zigzag scan order: position k in the scan -> flat row-major index.
# Diagonal s runs toward increasing row when s is odd, increasing
# column when s is even (T.81 Figure 5).
ZIGZAG = np.array(
    sorted(
        range(64),
        key=lambda f: (
            (f // 8) + (f % 8),
            (f // 8) if ((f // 8) + (f % 8)) % 2 else (f % 8),
        ),
    ),
    dtype=np.int64,
)

# Orthonormal 8-point DCT-II matrix: T[u, x] = c(u) cos((2x+1)u*pi/16),
# c(0)=sqrt(1/8), else sqrt(2/8).  Forward 2-D DCT: F = T f T^T;
# inverse: f = T^T F T — exactly T.81's FDCT/IDCT up to float rounding.
_DCT_T = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(1.0 / 8.0) if _u == 0 else np.sqrt(2.0 / 8.0)
    for _x in range(8):
        _DCT_T[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    """Scale an Annex K base table by a 1..100 quality factor (the
    widely-published linear scaling convention)."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _build_huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) by canonical assignment (T.81 C.2)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffDecoder:
    """16-bit-lookahead LUT decoder (the table-driven form of T.81
    F.2.2.3's MINCODE/MAXCODE/VALPTR walk): lut[peek16] packs
    (value << 5) | code_length, with 0 marking an invalid prefix.
    Built once per DHT (65 536 slots filled by numpy slices, then
    .tolist() — scalar list indexing beats numpy scalar indexing ~3×
    in the decode loop); the per-symbol decode costs one peek + one
    list load instead of the former bit-by-bit loop.  Together with the
    locals-based scan loop and batched IDCT this measured 2.0–2.3×
    (bit-identical) on a 512×512 decode — the r5 BASELINE.md note pins
    the remaining per-symbol interpreter floor."""

    def __init__(self, bits: list[int], vals: list[int]):
        if sum(bits) != len(vals):
            raise ValueError("DHT: bits/values count mismatch")
        lut = np.zeros(1 << 16, dtype=np.uint16)
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                start = code << (16 - ln)
                lut[start : start + (1 << (16 - ln))] = (vals[k] << 5) | ln
                code += 1
                k += 1
            code <<= 1
        # plain list: scalar indexing is ~3x faster than a numpy array's
        # in the per-symbol Python loop
        self.lut = lut.tolist()


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_jpeg_one(data: bytes, pos: int) -> tuple[np.ndarray, int]:
    """Decode one baseline JPEG starting at ``pos`` ->
    ((h, w, 3) uint8, next_pos)."""
    if data[pos : pos + 2] != b"\xff\xd8":
        raise ValueError(f"not a JPEG (no SOI) at offset {pos}")
    p = pos + 2
    qtables: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    restart_interval = 0
    frame = None  # (w, h, comps) with comps = [(cid, h_i, v_i, tq)]

    while True:
        # Markers may be preceded by fill bytes (0xFF padding, T.81 B.1.1.2).
        while p < len(data) and data[p] == 0xFF and data[p + 1 : p + 2] == b"\xff":
            p += 1
        if p + 2 > len(data) or data[p] != 0xFF:
            raise ValueError(f"expected marker at offset {p}")
        marker = data[p + 1]
        p += 2
        if marker == 0xD9:  # EOI with no scan
            raise ValueError("JPEG ended before any scan (no SOS)")
        if marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                      0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"SOF{marker - 0xC0}: only baseline sequential (SOF0) is supported"
            )
        (seg_len,) = struct.unpack(">H", data[p : p + 2])
        body = data[p + 2 : p + seg_len]
        if len(body) != seg_len - 2:
            raise ValueError("truncated JPEG marker segment")
        p += seg_len

        if marker == 0xDB:  # DQT
            q = 0
            while q < len(body):
                pq, tq = body[q] >> 4, body[q] & 15
                q += 1
                if pq == 0:
                    tbl = np.frombuffer(body[q : q + 64], dtype=np.uint8)
                    q += 64
                else:
                    tbl = np.frombuffer(body[q : q + 128], dtype=">u2")
                    q += 128
                if tbl.size != 64:
                    raise ValueError("truncated DQT table")
                qtables[tq] = tbl.astype(np.int64)  # zigzag order
        elif marker == 0xC4:  # DHT
            q = 0
            while q < len(body):
                tc, th = body[q] >> 4, body[q] & 15
                bits = list(body[q + 1 : q + 17])
                n = sum(bits)
                vals = list(body[q + 17 : q + 17 + n])
                q += 17 + n
                dec = _HuffDecoder(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = dec
        elif marker == 0xC0:  # SOF0
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError(f"only 8-bit JPEG supported (precision={prec})")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (w, h, comps)
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = body[0]
            # T.81 also allows a sequence of per-component
            # (non-interleaved) scans; this decoder implements the
            # single-interleaved-scan layout every baseline encoder in
            # the wild (and ours) emits — reject the rest explicitly
            # rather than KeyError mid-MCU.
            if ns != len(frame[2]):
                raise ValueError(
                    "only a single interleaved scan covering all frame "
                    f"components is supported (scan has {ns} of "
                    f"{len(frame[2])} components)"
                )
            if len(frame[2]) == 1 and (
                frame[2][0][1] > 1 or frame[2][0][2] > 1
            ):
                # per T.81 a single-component scan is non-interleaved
                # and ignores sampling factors; decoding it with
                # interleaved-MCU geometry would misplace blocks for
                # non-MCU-aligned widths
                raise ValueError(
                    "single-component frames with sampling factors > 1 "
                    "are non-interleaved per T.81 and not supported"
                )
            scan_tables = {}
            for i in range(ns):
                cs, tdta = body[1 + 2 * i : 3 + 2 * i]
                scan_tables[cs] = (tdta >> 4, tdta & 15)
            img, end = _decode_scan(
                data, p, frame, scan_tables, qtables, huff_dc, huff_ac,
                restart_interval,
            )
            return img, end
        # else: APPn / COM / DNL etc. — skipped


def _decode_scan(data, p, frame, scan_tables, qtables, huff_dc, huff_ac,
                 restart_interval):
    w, h, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcx = -(-w // (8 * hmax))
    mcy = -(-h // (8 * vmax))
    planes = {}
    for cid, hi, vi, _tq in comps:
        if hmax % hi or vmax % vi:
            raise ValueError(f"unsupported sampling {hi}x{vi} vs max {hmax}x{vmax}")
        planes[cid] = np.zeros((mcy * vi * 8, mcx * hi * 8), dtype=np.float64)

    # ---- per-MCU block schedule + per-component LUTs (validated once,
    # not per block) --------------------------------------------------------
    sched = []  # (cid, lut_dc, lut_ac, by, bx, hi, vi) per block in MCU order
    for cid, hi, vi, tq in comps:
        if tq not in qtables:
            raise ValueError(f"missing quantization table {tq}")
        if cid not in scan_tables:
            raise ValueError(f"SOS references unknown component id {cid}")
        td, ta = scan_tables[cid]
        if td not in huff_dc or ta not in huff_ac:
            raise ValueError(f"missing Huffman table DC{td}/AC{ta}")
        for by in range(vi):
            for bx in range(hi):
                sched.append(
                    (cid, huff_dc[td].lut, huff_ac[ta].lut, by, bx, hi, vi)
                )

    # ---- pass 1: entropy decode every block's 64 zigzag coefficients
    # with the bit state in LOCALS (attribute access and method calls
    # per symbol were the dominant cost — see the r5 BASELINE.md note).
    # Coefficients land in flat Python lists per component; dequant +
    # IDCT + placement happen vectorized in pass 2. ----------------------
    coeffs: dict[int, list[int]] = {cid: [] for cid, *_ in comps}
    posn: dict[int, list[tuple[int, int]]] = {cid: [] for cid, *_ in comps}
    dc_pred = {cid: 0 for cid, *_ in comps}
    buf = 0
    n = 0
    pad = 0
    pos = p
    dlen = len(data)
    rst_n = 0
    mcu_count = 0
    for my in range(mcy):
        for mx in range(mcx):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # byte-align + consume RSTn (T.81 F.2.1.3.1); pos never
                # advances past a marker during refill, so it sits on it
                buf = n = pad = 0
                if pos + 2 > dlen or data[pos] != 0xFF:
                    raise ValueError("expected restart marker, found none")
                m = data[pos + 1]
                if not (0xD0 <= m <= 0xD7):
                    raise ValueError(f"expected RSTn, found 0xFF{m:02X}")
                if (m & 7) != (rst_n & 7):
                    raise ValueError(f"restart marker out of order: RST{m & 7}")
                pos += 2
                rst_n = (rst_n + 1) & 7
                dc_pred = {cid: 0 for cid, *_ in comps}
            for cid, lut_dc, lut_ac, by, bx, hi, vi in sched:
                zz = [0] * 64
                # DC ----------------------------------------------------
                while n < 32:  # one refill covers code(<=16)+extend(<=11)
                    if pos < dlen:
                        b = data[pos]
                        if b != 0xFF:
                            pos += 1
                            buf = (buf << 8) | b
                            n += 8
                            continue
                        if pos + 1 < dlen and data[pos + 1] == 0:
                            pos += 2
                            buf = (buf << 8) | 0xFF
                            n += 8
                            continue
                    buf = (buf << 8) | 0xFF  # EOF/marker: 1-bit padding
                    n += 8
                    pad += 8
                e = lut_dc[(buf >> (n - 16)) & 0xFFFF]
                ln = e & 31
                if ln == 0:
                    raise ValueError("corrupt Huffman code (no match in 16 bits)")
                n -= ln
                s = e >> 5
                if s:
                    if s > 11:
                        raise ValueError(f"corrupt DC size {s}")
                    n -= s
                    v = (buf >> n) & ((1 << s) - 1)
                    if v < 1 << (s - 1):
                        v -= (1 << s) - 1
                    dc_pred[cid] += v
                if n < pad:
                    raise ValueError("JPEG entropy data truncated")
                buf &= (1 << n) - 1
                zz[0] = dc_pred[cid]
                # AC ----------------------------------------------------
                k = 1
                while k < 64:
                    while n < 32:
                        if pos < dlen:
                            b = data[pos]
                            if b != 0xFF:
                                pos += 1
                                buf = (buf << 8) | b
                                n += 8
                                continue
                            if pos + 1 < dlen and data[pos + 1] == 0:
                                pos += 2
                                buf = (buf << 8) | 0xFF
                                n += 8
                                continue
                        buf = (buf << 8) | 0xFF
                        n += 8
                        pad += 8
                    e = lut_ac[(buf >> (n - 16)) & 0xFFFF]
                    ln = e & 31
                    if ln == 0:
                        raise ValueError(
                            "corrupt Huffman code (no match in 16 bits)"
                        )
                    n -= ln
                    rs = e >> 5
                    sz = rs & 15
                    if sz == 0:
                        if n < pad:
                            raise ValueError("JPEG entropy data truncated")
                        buf &= (1 << n) - 1
                        if rs == 0xF0:  # ZRL: 16 zeros
                            k += 16
                            continue
                        break  # EOB
                    k += rs >> 4
                    if k > 63:
                        raise ValueError("AC run past end of block")
                    n -= sz
                    if n < pad:
                        raise ValueError("JPEG entropy data truncated")
                    v = (buf >> n) & ((1 << sz) - 1)
                    buf &= (1 << n) - 1
                    if v < 1 << (sz - 1):
                        v -= (1 << sz) - 1
                    zz[k] = v
                    k += 1
                coeffs[cid].extend(zz)
                posn[cid].append(((my * vi + by) * 8, (mx * hi + bx) * 8))
            mcu_count += 1

    # ---- pass 2: vectorized dequant + zigzag + 2-D IDCT over ALL of a
    # component's blocks at once (batched matmul), then 8x8 placement ----
    for cid, hi, vi, tq in comps:
        zzs = np.array(coeffs[cid], dtype=np.float64).reshape(-1, 64)
        coef = np.zeros_like(zzs)
        coef[:, ZIGZAG] = zzs * qtables[tq][None, :]
        blocks = _DCT_T.T @ coef.reshape(-1, 8, 8) @ _DCT_T + 128.0
        plane = planes[cid]
        for (y0, x0), blk in zip(posn[cid], blocks):
            plane[y0 : y0 + 8, x0 : x0 + 8] = blk

    # Byte-align, then expect EOI (possibly after fill bytes).
    end = pos
    while end < len(data) and data[end] == 0xFF and data[end + 1 : end + 2] == b"\xff":
        end += 1
    if data[end : end + 2] != b"\xff\xd9":
        raise ValueError("JPEG scan not terminated by EOI")
    end += 2

    # Upsample each component to full resolution by pixel replication.
    full = []
    for cid, hi, vi, _tq in comps:
        pl = np.repeat(np.repeat(planes[cid], vmax // vi, axis=0), hmax // hi, axis=1)
        full.append(pl[:h, :w])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2), end
    if len(full) != 3:
        raise ValueError(f"unsupported component count {len(full)}")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    img = np.stack([r, g, b], axis=2)
    return np.clip(np.round(img), 0, 255).astype(np.uint8), end


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.buf = (self.buf << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.buf >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self.buf &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-bits padding (T.81 F.1.2.3)


def _magnitude(v: int) -> tuple[int, int]:
    """(size category, value bits) for a DC diff / AC coefficient."""
    s = abs(v).bit_length()
    bits = v if v >= 0 else v + (1 << s) - 1
    return s, bits


def _encode_block(bw, block, qt, dc_codes, ac_codes, dc_pred, ci):
    f = _DCT_T @ (block - 128.0) @ _DCT_T.T
    zz = np.round(f.reshape(-1)[ZIGZAG] / qt).astype(np.int64)
    diff = int(zz[0]) - dc_pred[ci]
    dc_pred[ci] = int(zz[0])
    s, bits = _magnitude(diff)
    bw.write(*dc_codes[s])
    if s:
        bw.write(bits, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        if k > last_nz:
            bw.write(*ac_codes[0x00])  # EOB
            break
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.write(*ac_codes[0xF0])  # ZRL
            run -= 16
        s, bits = _magnitude(v)
        bw.write(*ac_codes[(run << 4) | s])
        bw.write(bits, s)
        run = 0


def _dht_segment(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt_segment(tq: int, table_zz: np.ndarray) -> bytes:
    body = bytes([tq]) + bytes(int(x) for x in table_zz)
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(h, w) or (h, w, 3) uint8 -> baseline JPEG bytes.

    ``subsampling``: '444' (no chroma subsampling) or '420' (2x2 chroma
    averaging, 16x16 MCUs).  ``restart_interval`` > 0 emits DRI + RSTn
    markers every that many MCUs (exercises the decoder's restart path).
    """
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if not gray and img.shape[2] != 3:
        raise ValueError(f"JPEG encoder takes gray or RGB; got shape {img.shape}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    if gray:
        subsampling = "444"

    qt_l_zz = _quality_scale(QT_LUMA, quality)[ZIGZAG]
    qt_c_zz = _quality_scale(QT_CHROMA, quality)[ZIGZAG]

    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
        qsel = [0]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "420":
            cb = _downsample2(cb)
            cr = _downsample2(cr)
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qsel = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcx = -(-w // (8 * hmax))
    mcy = -(-h // (8 * vmax))
    # Edge-replicate each plane to its MCU-aligned size.
    padded = []
    for pl, (hi, vi) in zip(planes, samp):
        th_, tw_ = mcy * vi * 8, mcx * hi * 8
        pl = np.pad(
            pl, ((0, th_ - pl.shape[0]), (0, tw_ - pl.shape[1])), mode="edge"
        )
        padded.append(pl)

    dc_l = _build_huff_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_huff_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_huff_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_huff_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _dqt_segment(0, qt_l_zz)
    if not gray:
        out += _dqt_segment(1, qt_c_zz)
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sof += bytes([i + 1, (samp[i][0] << 4) | samp[i][1], qsel[i]])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += _dht_segment(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if not gray:
        out += _dht_segment(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += _dht_segment(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    bw = _BitWriter()
    dc_pred = [0] * nc
    rst_n = 0
    mcu_count = 0
    qts = [qt_l_zz if q == 0 else qt_c_zz for q in qsel]
    for my in range(mcy):
        for mx in range(mcx):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst_n])
                rst_n = (rst_n + 1) & 7
                dc_pred = [0] * nc
            for ci in range(nc):
                hi, vi = samp[ci]
                dct = dc_l if ci == 0 else dc_c
                act = ac_l if ci == 0 else ac_c
                for by in range(vi):
                    for bx in range(hi):
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        _encode_block(
                            bw, padded[ci][y0 : y0 + 8, x0 : x0 + 8],
                            qts[ci], dct, act, dc_pred, ci,
                        )
            mcu_count += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _downsample2(pl: np.ndarray) -> np.ndarray:
    """2x2 mean downsample with edge replication for odd dims."""
    h, w = pl.shape
    pl = np.pad(pl, ((0, h % 2), (0, w % 2)), mode="edge")
    return 0.25 * (pl[0::2, 0::2] + pl[0::2, 1::2] + pl[1::2, 0::2] + pl[1::2, 1::2])


# ---------------------------------------------------------------------------
# Frame-stream support (skip without entropy-decoding) for codecs.py
# ---------------------------------------------------------------------------


def jpeg_end(data: bytes, pos: int) -> int:
    """Byte offset just past the EOI of the JPEG starting at pos,
    found by marker walk + entropy-data byte scan (no decode)."""
    if data[pos : pos + 2] != b"\xff\xd8":
        raise ValueError(f"not a JPEG (no SOI) at offset {pos}")
    p = pos + 2
    while p + 2 <= len(data):
        if data[p] != 0xFF:
            raise ValueError(f"expected marker at offset {p}")
        marker = data[p + 1]
        if marker == 0xFF:  # fill byte
            p += 1
            continue
        p += 2
        if marker == 0xD9:  # EOI
            return p
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / RSTn: bare
            continue
        (seg_len,) = struct.unpack(">H", data[p : p + 2])
        p += seg_len
        if marker == 0xDA:  # SOS: scan entropy data for next real marker
            while p + 1 < len(data):
                if data[p] == 0xFF and data[p + 1] != 0x00:
                    if 0xD0 <= data[p + 1] <= 0xD7:
                        p += 2  # restart marker inside scan
                        continue
                    break
                p += 1
    raise ValueError("JPEG stream ended without EOI")
