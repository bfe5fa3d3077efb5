"""FLAC codec — clean-room from the public FLAC format specification
(xiph.org / RFC 9639), pure Python + numpy.  SURVEY.md §2.12 L7 (r9):
the audio half of the multimodal boundary narrowed one honest step —
speech corpora (LibriSpeech and kin) ship FLAC, so an engine that
curates audio at scale must read it natively.

Scope (and why it is exact): FLAC is LOSSLESS, so encode → decode is
the identity on every sample — the same testable contract as the r8/r9
PCM video paths.  This implementation covers the subset its own
encoder emits and every structural feature needed to read it back:

- STREAMINFO metadata block (the mandatory first block; other blocks
  are skipped structurally by length).
- Fixed-blocking frames: 14-bit sync, UTF-8-coded frame number,
  16-bit (blocksize−1) tail, CRC-8 header check, CRC-16 frame check.
- Subframe types CONSTANT, VERBATIM, and FIXED orders 0–4 with
  Rice-coded residuals (4-bit parameters, partition order 0, plus the
  0b1111 escape to raw binary) — the complete lossless fixed-predictor
  tier of the spec.  LPC subframes and mid/side stereo raise the
  contract NotImplementedError (they are a compression-ratio upgrade,
  not a correctness boundary: every FLAC re-encodes losslessly into
  the fixed tier).
- Channels stored independently; 16-bit samples; MD5 of the raw
  interleaved PCM verified on decode (the spec's end-to-end check).

The encoder picks per block the cheapest of CONSTANT / FIXED 0–2 /
VERBATIM, so smooth synthetic signals genuinely compress while
adversarial noise falls back to VERBATIM — both paths round-trip.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

from pyspec_spark.operators.h264 import BitReader, BitWriter

_MAGIC = b"fLaC"
_BPS = 16


# ---------------------------------------------------------------------------
# CRCs (FLAC frame checks): CRC-8 poly 0x07, CRC-16 poly 0x8005, both
# init 0, MSB-first, no reflection.
# ---------------------------------------------------------------------------
def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
            )
    return crc


def _utf8_code(n: int) -> bytes:
    """The frame-number coding: standard UTF-8 of the integer value."""
    return chr(n).encode("utf-8")


def _read_utf8_code(r: BitReader) -> int:
    b0 = r.u(8)
    if b0 < 0x80:
        return b0
    n_cont = 0
    mask = 0x40
    while b0 & mask:
        n_cont += 1
        mask >>= 1
    val = b0 & (mask - 1)
    for _ in range(n_cont):
        b = r.u(8)
        if b & 0xC0 != 0x80:
            raise ValueError("flac: bad UTF-8 continuation in frame number")
        val = (val << 6) | (b & 0x3F)
    return val


# ---------------------------------------------------------------------------
# Rice residual coding (zigzag fold + unary quotient / binary remainder)
# ---------------------------------------------------------------------------
def _zigzag(x: np.ndarray) -> np.ndarray:
    return np.where(x >= 0, x.astype(np.int64) * 2, -2 * x.astype(np.int64) - 1)


def _rice_param(res: np.ndarray) -> int:
    """Cheap near-optimal parameter: smallest k with mean(folded) < 2^k."""
    if res.size == 0:
        return 0
    mean = float(_zigzag(res).mean())
    k = 0
    while (1 << k) < mean and k < 14:
        k += 1
    return k


def _write_rice(w: BitWriter, res: np.ndarray, k: int) -> None:
    for u in _zigzag(res):
        q = int(u) >> k
        if q > 10_000:  # pathological parameter; encoder avoids via escape
            raise ValueError("flac: rice quotient blowup")
        w.u(0, q)
        w.u(1, 1)
        if k:
            w.u(int(u) & ((1 << k) - 1), k)


def _read_rice(r: BitReader, n: int, k: int) -> np.ndarray:
    out = np.empty(n, dtype=np.int64)
    for i in range(n):
        q = 0
        while r.u(1) == 0:
            q += 1
        u = (q << k) | (r.u(k) if k else 0)
        out[i] = (u >> 1) ^ -(u & 1)
    return out


_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _fixed_restore(warm: np.ndarray, res: np.ndarray, order: int) -> np.ndarray:
    """Invert _fixed_residual given the first `order` warmup samples."""
    out = np.concatenate([warm.astype(np.int64), np.empty(len(res), np.int64)])
    coef = _FIXED_COEFFS[order]
    for i in range(len(res)):
        j = order + i
        pred = sum(c * out[j - 1 - t] for t, c in enumerate(coef))
        out[j] = res[i] + pred
    return out


def _signed(r: BitReader, bits: int) -> int:
    v = r.u(bits)
    return v - (1 << bits) if v & (1 << (bits - 1)) else v


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------
def _encode_subframe(w: BitWriter, x: np.ndarray) -> None:
    """Pick the cheapest of CONSTANT / FIXED 0-2 / VERBATIM for one
    channel's block and emit it."""
    n = len(x)
    if np.all(x == x[0]):
        w.u(0, 1)
        w.u(0b000000, 6)  # CONSTANT
        w.u(0, 1)
        w.u(int(x[0]) & 0xFFFF, _BPS)
        return
    best_order, best_cost = None, n * _BPS  # VERBATIM baseline
    plans = {}
    for order in (0, 1, 2):
        if n <= order:
            continue
        res = _fixed_residual(x, order)
        k = _rice_param(res)
        folded = _zigzag(res)
        cost = order * _BPS + 2 + 4 + 4 + int((folded >> k).sum()) + res.size * (1 + k)
        plans[order] = (res, k)
        if cost < best_cost:
            best_order, best_cost = order, cost
    if best_order is None:
        w.u(0, 1)
        w.u(0b000001, 6)  # VERBATIM
        w.u(0, 1)
        for v in x:
            w.u(int(v) & 0xFFFF, _BPS)
        return
    res, k = plans[best_order]
    w.u(0, 1)
    w.u(0b001000 | best_order, 6)  # FIXED, order in the low bits
    w.u(0, 1)  # no wasted bits
    for v in x[:best_order]:
        w.u(int(v) & 0xFFFF, _BPS)  # warmup samples
    w.u(0, 2)  # residual method: 4-bit rice
    w.u(0, 4)  # partition order 0 (one partition)
    if k <= 14:
        w.u(k, 4)
        _write_rice(w, res, k)
    else:  # escape: raw binary residuals
        w.u(0b1111, 4)
        bits = int(max(1, int(np.abs(res)).max())).bit_length() + 1
        w.u(bits, 5)
        for v in res:
            w.u(int(v) & ((1 << bits) - 1), bits)


def encode_flac(
    samples: np.ndarray, rate: int = 16000, block_size: int = 4096
) -> bytes:
    """(n,) or (n, channels) int16 -> FLAC bytes (independent channels,
    fixed blocking, CONSTANT/FIXED/VERBATIM subframes)."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    if not 1 <= ch <= 8:
        raise ValueError("flac: 1..8 channels")
    # STREAMINFO
    md5 = hashlib.md5(s.astype("<i2").tobytes()).digest()
    si = BitWriter()
    si.u(block_size, 16)
    si.u(block_size, 16)
    si.u(0, 24)  # min frame size unknown
    si.u(0, 24)  # max frame size unknown
    si.u(rate, 20)
    si.u(ch - 1, 3)
    si.u(_BPS - 1, 5)
    si.u(n & ((1 << 36) - 1), 36)
    info = si.bytes() + md5
    out = bytearray(_MAGIC)
    out += bytes([0x80 | 0]) + len(info).to_bytes(3, "big") + info  # last block
    for fi, lo in enumerate(range(0, n, block_size)):
        blk = s[lo : lo + block_size]
        bs = len(blk)
        h = BitWriter()
        h.u(0b11111111111110, 14)
        h.u(0, 1)  # reserved
        h.u(0, 1)  # fixed blocking: frame number coded
        h.u(0b0111, 4)  # blocksize: 16-bit (n-1) at header end
        h.u(0b0000, 4)  # sample rate: from STREAMINFO
        h.u(ch - 1, 4)  # independent channels
        h.u(0b100, 3)  # 16 bits per sample
        h.u(0, 1)  # reserved
        hdr = h.bytes() + _utf8_code(fi) + struct.pack(">H", bs - 1)
        hdr += bytes([_crc8(hdr)])
        fw = BitWriter()
        for c in range(ch):
            _encode_subframe(fw, blk[:, c])
        while len(fw._bits) % 8:
            fw.u(0, 1)
        frame = hdr + fw.bytes()
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------
def decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes -> ((n, channels) int16, sample_rate).  Verifies the
    header CRC-8, frame CRC-16, and STREAMINFO MD5; raises the contract
    NotImplementedError on LPC subframes / mid-side stereo / non-16-bit
    depths (see module docstring)."""
    if payload[:4] != _MAGIC:
        raise ValueError("flac: bad magic")
    pos = 4
    info = None
    while True:
        hdr = payload[pos : pos + 4]
        if len(hdr) < 4:
            raise ValueError("flac: truncated metadata")
        last, btype = hdr[0] >> 7, hdr[0] & 0x7F
        ln = int.from_bytes(hdr[1:4], "big")
        body = payload[pos + 4 : pos + 4 + ln]
        pos += 4 + ln
        if btype == 0:
            info = body
        if last:
            break
    if info is None or len(info) < 34:
        raise ValueError("flac: missing STREAMINFO")
    r = BitReader(info[:18])
    r.u(16)
    r.u(16)
    r.u(24)
    r.u(24)
    rate = r.u(20)
    ch = r.u(3) + 1
    bps = r.u(5) + 1
    total = r.u(36)
    want_md5 = info[18:34]
    if bps != _BPS:
        raise NotImplementedError(f"flac: {bps}-bit depth (16-bit only)")
    chans: list[list[np.ndarray]] = [[] for _ in range(ch)]
    got = 0
    while got < total:
        frame_start = pos
        r = BitReader(payload[pos:])
        if r.u(14) != 0b11111111111110:
            raise ValueError("flac: lost frame sync")
        r.u(1)
        r.u(1)  # blocking strategy (frame-number coded either way here)
        bs_code = r.u(4)
        sr_code = r.u(4)
        ch_code = r.u(4)
        ss_code = r.u(3)
        r.u(1)
        _read_utf8_code(r)
        if bs_code == 0b0110:
            bs = r.u(8) + 1
        elif bs_code == 0b0111:
            bs = r.u(16) + 1
        elif bs_code >= 0b1000:
            bs = 256 << (bs_code - 8)
        elif bs_code == 0b0001:
            bs = 192
        elif 0b0010 <= bs_code <= 0b0101:
            bs = 576 << (bs_code - 2)
        else:
            raise ValueError("flac: reserved blocksize code")
        if sr_code in (0b1100, 0b1101, 0b1110):
            r.u(8 if sr_code == 0b1100 else 16)  # inline rates: skip
        if ch_code > 7:
            raise NotImplementedError(
                "flac: mid/side stereo decorrelation not in the fixed tier"
            )
        if ch_code + 1 != ch:
            raise ValueError("flac: frame/streaminfo channel mismatch")
        if ss_code not in (0b000, 0b100):
            raise NotImplementedError("flac: frame sample size != 16 bit")
        # header CRC-8 covers bytes from sync to just before the crc byte
        hdr_len = (r._pos + 7) // 8
        if _crc8(payload[frame_start : frame_start + hdr_len]) != r.u(8):
            raise ValueError("flac: frame header CRC-8 mismatch")
        for c in range(ch):
            if r.u(1):
                raise ValueError("flac: bad subframe padding bit")
            stype = r.u(6)
            wasted = r.u(1)
            if wasted:
                raise NotImplementedError("flac: wasted-bits subframes")
            if stype == 0b000000:  # CONSTANT
                v = _signed(r, _BPS)
                chans[c].append(np.full(bs, v, dtype=np.int64))
            elif stype == 0b000001:  # VERBATIM
                vals = np.empty(bs, dtype=np.int64)
                for i in range(bs):
                    vals[i] = _signed(r, _BPS)
                chans[c].append(vals)
            elif 0b001000 <= stype <= 0b001100:  # FIXED 0..4
                order = stype & 0x07
                warm = np.array(
                    [_signed(r, _BPS) for _ in range(order)], dtype=np.int64
                )
                method = r.u(2)
                if method not in (0, 1):
                    raise ValueError("flac: reserved residual method")
                part_order = r.u(4)
                pbits = 4 if method == 0 else 5
                n_parts = 1 << part_order
                res_parts = []
                for p in range(n_parts):
                    cnt = (bs >> part_order) - (order if p == 0 else 0)
                    k = r.u(pbits)
                    if k == (1 << pbits) - 1:  # escape: raw binary
                        raw_bits = r.u(5)
                        res_parts.append(
                            np.array(
                                [_signed(r, raw_bits) for _ in range(cnt)],
                                dtype=np.int64,
                            )
                        )
                    else:
                        res_parts.append(_read_rice(r, cnt, k))
                res = np.concatenate(res_parts) if res_parts else np.empty(0)
                chans[c].append(_fixed_restore(warm, res, order))
            elif stype >= 0b100000:
                raise NotImplementedError(
                    "flac: LPC subframes not in the fixed tier — re-encode "
                    "losslessly with encode_flac to read through this engine"
                )
            else:
                raise ValueError(f"flac: reserved subframe type {stype:#08b}")
        while r._pos % 8:
            if r.u(1):
                raise ValueError("flac: nonzero frame padding")
        body_len = r._pos // 8
        (crc,) = struct.unpack(
            ">H", payload[frame_start + body_len : frame_start + body_len + 2]
        )
        if _crc16(payload[frame_start : frame_start + body_len]) != crc:
            raise ValueError("flac: frame CRC-16 mismatch")
        pos = frame_start + body_len + 2
        got += bs
    s = np.stack([np.concatenate(c)[:total] for c in chans], axis=1)
    if np.any(s < -(1 << 15)) or np.any(s >= (1 << 15)):
        raise ValueError("flac: decoded sample out of 16-bit range")
    s16 = s.astype(np.int16)
    if hashlib.md5(s16.astype("<i2").tobytes()).digest() != want_md5:
        raise ValueError("flac: STREAMINFO MD5 mismatch (corrupt stream)")
    return s16, rate
