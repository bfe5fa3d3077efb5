"""FLAC codec — clean-room from the public FLAC format specification
(xiph.org / RFC 9639), pure Python + numpy.  SURVEY.md §2.12 L7 (r9,
depth-generalized r10): the audio half of the multimodal boundary —
speech corpora (LibriSpeech and kin) ship FLAC, so an engine that
curates audio at scale must read it natively.

Scope (and why it is exact): FLAC is LOSSLESS, so encode → decode is
the identity on every sample — the same testable contract as the r8/r9
PCM video paths.  The DECODER covers the full lossless surface a
real-world stream uses:

- STREAMINFO metadata block (the mandatory first block; other blocks
  are skipped structurally by length).
- Fixed-blocking frames: 14-bit sync, the UTF-8-style coded frame
  number extended to 36 bits (the spec's 7-byte form — NOT Python
  str.encode, which rejects surrogates and stops at 0x10FFFF), all
  blocksize/sample-rate code forms, CRC-8 header check, CRC-16 frame
  check, MD5-verified PCM (the spec's end-to-end integrity ladder —
  corruption is never silent).  STREAMINFO total_samples == 0 means
  UNKNOWN per the spec: the decoder then consumes frames to the end
  of the payload instead of trusting a count.
- Subframe types CONSTANT, VERBATIM, FIXED orders 0–4, and LPC
  orders 1–32 (quantized-coefficient integer prediction with the
  arithmetic-shift rounding the spec prescribes — exactly invertible,
  so losslessness survives), all with partitioned Rice residuals
  (4-/5-bit parameters + the raw-binary escape, including the
  spec-legal 0-bit escape meaning an all-zero partition).
- All three stereo decorrelation modes (left-side / right-side /
  mid-side; the side channel carries bps+1 bits).
- ALL standard sample depths: 8/12/16/20/24/32-bit (r10 — 24-bit is
  the standard music/production depth; 16-bit covers speech corpora).
  Decoded output is int16 for depths <= 16 and int32 above.

The ENCODER picks per block the cheapest of CONSTANT / FIXED 0–2 /
VERBATIM (smooth signals compress, noise falls back to VERBATIM), and
can be forced onto the LPC / decorrelation / partition paths so every
decoder branch is round-trip-testable without an external encoder.
A partition whose Rice quotients would blow up (spiky data at a small
mean) falls back to the raw-binary escape instead of raising.  Wasted-
bits subframes (the quiet-passage optimization) are encoded and
decoded too.  The one residual limit is the spec's own: the raw escape
stores at most 31-bit residuals, so a forced-LPC plan whose residuals
exceed that raises (the cost-based planner never picks such a plan —
VERBATIM is always cheaper there).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

from pyspec_spark.operators.h264 import BitReader, BitWriter

_MAGIC = b"fLaC"

# Frame-header sample-size codes (RFC 9639 §9.1.3) <-> depth in bits.
_SS_CODE = {8: 0b001, 12: 0b010, 16: 0b100, 20: 0b101, 24: 0b110, 32: 0b111}
_SS_BITS = {v: k for k, v in _SS_CODE.items()}


# ---------------------------------------------------------------------------
# CRCs (FLAC frame checks): CRC-8 poly 0x07, CRC-16 poly 0x8005, both
# init 0, MSB-first, no reflection.
# ---------------------------------------------------------------------------
def _make_crc_table(poly: int, width: int) -> list[int]:
    mask = (1 << width) - 1
    top = 1 << (width - 1)
    table = []
    for b in range(256):
        crc = b << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) & mask if crc & top else (crc << 1) & mask
        table.append(crc)
    return table


_CRC8_TABLE = _make_crc_table(0x07, 8)
_CRC16_TABLE = _make_crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    crc = 0
    t = _CRC8_TABLE
    for b in data:
        crc = t[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    t = _CRC16_TABLE
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ t[(crc >> 8) ^ b]
    return crc


def _utf8_code(n: int) -> bytes:
    """The frame-number coding: the UTF-8 bit layout extended to 36
    bits (7-byte form, 0xFE lead byte with zero payload bits).  Emitted
    directly from the integer — round-tripping through chr().encode()
    would raise on surrogate code points (frame 55296 of a stream) and
    cannot reach the spec's 36-bit range at all."""
    if n < 0x80:
        return bytes([n])
    for cont in range(1, 7):
        if n < (1 << (6 * cont + (6 - cont))):
            break
    else:
        raise ValueError("flac: frame number exceeds 36 bits")
    lead = (0x100 - (1 << (7 - cont))) | (n >> (6 * cont))
    out = bytearray([lead])
    for i in range(cont - 1, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


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
        w.u(0, q)
        w.u(1, 1)
        if k:
            w.u(int(u) & ((1 << k) - 1), k)


def _bit_array(r: BitReader) -> np.ndarray:
    """The reader's payload as a 0/1 uint8 array, unpacked once per
    payload and cached on the reader (bytes are immutable, so the
    cache can never go stale).

    Memory contract: the unpacked bits cost 8 bytes per payload byte
    and the set-bit index (~4 more on typical audio), held for the
    DURATION OF ONE decode_flac call (the decoder frees both before
    assembling its output).  Executor-side that bounds peak at ~12x
    the largest single file in the current mapInPandas batch — fine
    for audio-corpus file sizes; a future >1 GB-file tier would want
    per-frame unpacking instead (same total work, bounded peak)."""
    ba = getattr(r, "_flac_bits", None)
    if ba is None:
        ba = np.unpackbits(np.frombuffer(r._d, dtype=np.uint8))
        r._flac_bits = ba
    return ba


def _ones_array(r: BitReader) -> np.ndarray:
    """Sorted global positions of the payload's set bits (the unary-
    terminator candidates), computed once per payload."""
    oa = getattr(r, "_flac_ones", None)
    if oa is None:
        oa = np.flatnonzero(_bit_array(r)).astype(np.int64)
        r._flac_ones = oa
    return oa


def _read_rice(r: BitReader, n: int, k: int) -> np.ndarray:
    """Vectorized Rice partition decode (r10 — replaces the per-bit
    Python loop SCALING.md r9d named as the per-sample constant).

    A Rice stream is [0^q 1 r_k] × n.  The only sequential dependency
    is WHICH set bits are terminators (a remainder's bits may contain
    1s that must be skipped), and that dependency lives in ones-index
    space: if terminator i sits at set-bit index j, terminator i+1 is
    the first set bit at/after position ones[j]+k+1 — a successor
    function g computable for EVERY candidate at once with one array
    searchsorted.  The orbit 0, g(0), g²(0), … is then materialized
    for all n samples with pointer doubling (log₂n fancy-index
    passes), after which quotients (terminator − start gaps) and
    remainders (a [n,k] bit-matrix dot powers-of-two) fall out in
    single numpy expressions.  Per orbit step the counting bound is
    1 terminator + ≤k skipped ones, so a slice of n(k+1)+1 candidates
    provably contains the whole orbit — an exhausted slice means a
    truncated stream and raises instead of hanging (the fuzz-test
    contract)."""
    if n == 0:
        return np.empty(0, dtype=np.int64)
    bits = _bit_array(r)
    ones = _ones_array(r)
    j0 = int(np.searchsorted(ones, r._pos))
    seg = ones[j0 : j0 + n * (k + 1) + 1]
    m = len(seg)
    if m == 0:
        raise ValueError("flac: truncated rice partition")
    # successor in seg-index space, with sentinel m = "past end"
    g = np.empty(m + 1, dtype=np.int64)
    g[:m] = np.searchsorted(seg, seg + (k + 1))
    g[m] = m
    # orbit of 0 under g for all sample indices 0..n-1: binary jumps
    j_idx = np.zeros(n, dtype=np.int64)
    sample = np.arange(n)
    level = g
    bit = 1
    while bit < n:
        sel = (sample & bit) != 0
        j_idx[sel] = level[j_idx[sel]]
        bit <<= 1
        if bit < n:
            nxt = np.empty(m + 1, dtype=np.int64)
            nxt[:m] = level[level[:m]]
            nxt[m] = m
            level = nxt
    if j_idx.max() >= m:
        raise ValueError("flac: truncated rice partition")
    ts = seg[j_idx]
    starts = np.empty(n, dtype=np.int64)
    starts[0] = r._pos
    starts[1:] = ts[:-1] + k + 1
    q = ts - starts
    if k:
        rem_idx = ts[:, None] + 1 + np.arange(k, dtype=np.int64)
        if int(rem_idx[-1, -1]) >= len(bits):
            raise ValueError("flac: truncated rice partition")
        powers = np.left_shift(
            np.int64(1), np.arange(k - 1, -1, -1, dtype=np.int64)
        )
        rem = bits[rem_idx].astype(np.int64) @ powers
        u = (q << k) | rem
    else:
        u = q
    r._pos = int(ts[-1]) + 1 + k
    return (u >> 1) ^ -(u & 1)


def _read_raw_signed(r: BitReader, n: int, bits_per: int) -> np.ndarray:
    """Vectorized raw-binary escape read: n two's-complement values of
    ``bits_per`` bits as one [n, bits_per] bit-matrix."""
    if n == 0:
        return np.empty(0, dtype=np.int64)
    bits = _bit_array(r)
    end = r._pos + n * bits_per
    if end > len(bits):
        raise ValueError("flac: truncated raw partition")
    mat = bits[r._pos : end].reshape(n, bits_per).astype(np.int64)
    powers = np.left_shift(
        np.int64(1), np.arange(bits_per - 1, -1, -1, dtype=np.int64)
    )
    v = mat @ powers
    r._pos = end
    return v - (mat[:, 0] << np.int64(bits_per))


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
    """Invert _fixed_residual given the first `order` warmup samples.
    A FIXED predictor's residual is diff^order(x), so restore is
    ``order`` iterated cumsums, each seeded with the last value of the
    corresponding warmup difference level (r10 — replaces the
    per-sample Python recurrence; exact in int64, which has >30 bits
    of headroom over the 33-bit worst-case side-channel samples)."""
    warm = warm.astype(np.int64)
    out = res.astype(np.int64)
    for j in range(order, 0, -1):
        seed = warm if j == 1 else np.diff(warm, j - 1)
        out = (seed[-1] if len(seed) else np.int64(0)) + np.cumsum(out)
    return np.concatenate([warm, out])


def _signed(r: BitReader, bits: int) -> int:
    v = r.u(bits)
    return v - (1 << bits) if v & (1 << (bits - 1)) else v


def _pack_pcm(s: np.ndarray, bps: int) -> bytes:
    """Interleaved little-endian two's-complement PCM bytes at
    ceil(bps/8) bytes per sample — the byte stream STREAMINFO's MD5
    covers (shared by encoder and decoder, so the integrity check can
    never drift between them)."""
    nb = (bps + 7) // 8
    b = np.ascontiguousarray(s.astype("<i4")).tobytes()
    if nb == 4:
        return b
    return np.frombuffer(b, np.uint8).reshape(-1, 4)[:, :nb].tobytes()


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------
_RICE_Q_MAX = 10_000  # above this a unary quotient is pathological


def _write_residuals(
    w: BitWriter, res: np.ndarray, bs: int, order: int, part_order: int
) -> None:
    """Rice residual section: method 0 (4-bit params), the given
    partition order, per-partition parameter choice with the 0b1111
    escape to raw binary.  The spec requires the block size to divide
    evenly into the partitions and the first partition to still have
    residuals after the warmup — clamp the requested order down until
    both hold (a trailing partial block typically forces order 0).
    A partition whose max unary quotient would blow past _RICE_Q_MAX
    (spiky samples around a small mean) is written with the raw-binary
    escape instead of raising (ADVICE r9)."""
    while part_order > 0 and (
        bs % (1 << part_order) or (bs >> part_order) <= order
    ):
        part_order -= 1
    w.u(0, 2)                 # residual method: 4-bit rice
    w.u(part_order, 4)
    n_parts = 1 << part_order
    off = 0
    for p in range(n_parts):
        cnt = (bs >> part_order) - (order if p == 0 else 0)
        part = res[off : off + cnt]
        off += cnt
        k = _rice_param(part)
        folded = _zigzag(part) if part.size else np.zeros(0, np.int64)
        q_max = int(folded.max() >> k) if part.size else 0
        if q_max <= _RICE_Q_MAX:
            w.u(k, 4)
            _write_rice(w, part, k)
        else:                 # escape: raw binary residuals
            bits = int(max(1, int(np.abs(part).max()))).bit_length() + 1
            if bits > 31:
                raise ValueError(
                    "flac: residual magnitude exceeds the 31-bit raw "
                    "escape (use VERBATIM for this block)"
                )
            w.u(0b1111, 4)
            w.u(bits, 5)
            for v in part:
                w.u(int(v) & ((1 << bits) - 1), bits)


def _write_wasted(w: BitWriter, wasted: int) -> None:
    """Subframe wasted-bits field: flag 0 = none; flag 1 + unary
    (count-1 zeroes then a 1) = samples stored at sbps-count bits and
    shifted back up on decode — the spec's quiet-passage optimization,
    emitted whenever the block's samples share trailing zero bits."""
    if wasted == 0:
        w.u(0, 1)
    else:
        w.u(1, 1)
        w.u(0, wasted - 1)
        w.u(1, 1)


def _encode_subframe(
    w: BitWriter,
    x: np.ndarray,
    sbps: int,
    lpc: tuple[list[int], int, int] | None = None,
    part_order: int = 0,
) -> None:
    """Emit one channel's subframe: the cheapest of CONSTANT / FIXED
    0-2 / VERBATIM, or — when ``lpc=(coeffs, precision, shift)`` is
    forced — an LPC subframe with those quantized coefficients (used
    to exercise the LPC decode path; the integer predictor is exactly
    invertible so the round-trip stays lossless)."""
    n = len(x)
    xi64 = np.asarray(x, dtype=np.int64)
    wasted = 0
    if np.any(xi64):  # common trailing-zero count across the block
        orall = 0
        for v in xi64:
            orall |= int(v)
        while wasted < sbps - 1 and not (orall >> wasted) & 1:
            wasted += 1
    if wasted:
        x = (xi64 >> wasted).astype(np.int64)
        sbps -= wasted
    n = len(x)
    mask = (1 << sbps) - 1
    if lpc is not None and n > len(lpc[0]):
        coeffs, precision, shift = lpc
        order = len(coeffs)
        xi = x.astype(np.int64)
        pred = np.zeros(n - order, dtype=np.int64)
        for t, c in enumerate(coeffs):
            pred += c * xi[order - 1 - t : n - 1 - t]
        res = xi[order:] - (pred >> shift)
        w.u(0, 1)
        w.u(0b100000 | (order - 1), 6)   # LPC, order-1 in the low bits
        _write_wasted(w, wasted)
        for v in x[:order]:
            w.u(int(v) & mask, sbps)     # warmup
        w.u(precision - 1, 4)
        w.u(shift & 0x1F, 5)
        for c in coeffs:
            w.u(int(c) & ((1 << precision) - 1), precision)
        _write_residuals(w, res, n, order, part_order)
        return
    if np.all(x == x[0]):
        w.u(0, 1)
        w.u(0b000000, 6)  # CONSTANT
        _write_wasted(w, wasted)
        w.u(int(x[0]) & mask, sbps)
        return
    best_order, best_cost = None, n * sbps  # VERBATIM baseline
    plans = {}
    for order in (0, 1, 2):
        if n <= order or (n >> part_order) <= order:
            continue
        res = _fixed_residual(x, order)
        k = _rice_param(res)
        folded = _zigzag(res)
        cost = order * sbps + 2 + 4 + 4 + int((folded >> k).sum()) + res.size * (1 + k)
        plans[order] = res
        if cost < best_cost:
            best_order, best_cost = order, cost
    if best_order is None:
        w.u(0, 1)
        w.u(0b000001, 6)  # VERBATIM
        _write_wasted(w, wasted)
        for v in x:
            w.u(int(v) & mask, sbps)
        return
    res = plans[best_order]
    w.u(0, 1)
    w.u(0b001000 | best_order, 6)  # FIXED, order in the low bits
    _write_wasted(w, wasted)
    for v in x[:best_order]:
        w.u(int(v) & mask, sbps)  # warmup samples
    _write_residuals(w, res, n, best_order, part_order)


def encode_flac(
    samples: np.ndarray,
    rate: int = 16000,
    block_size: int = 4096,
    stereo_mode: str = "independent",
    lpc: tuple[list[int], int, int] | None = None,
    part_order: int = 0,
    bps: int = 16,
) -> bytes:
    """(n,) or (n, channels) integer samples -> FLAC bytes.

    ``bps`` is any standard depth (8/12/16/20/24/32); samples must fit
    the signed range of that depth.  ``stereo_mode`` (2-channel input
    only): "independent" (default), or the spec's decorrelation modes
    "left_side" / "right_side" / "mid_side" — the side channel is
    coded at bps+1 bits, exactly as the format prescribes.
    ``lpc=(coeffs, precision, shift)`` forces LPC subframes;
    ``part_order`` forces a Rice partition order > 0.  All
    combinations are lossless."""
    if bps not in _SS_CODE:
        raise ValueError(f"flac: unsupported depth {bps} (8/12/16/20/24/32)")
    s = np.asarray(samples, dtype=np.int64)
    if s.ndim == 1:
        s = s[:, None]
    lim = 1 << (bps - 1)
    if s.size and (s.min() < -lim or s.max() >= lim):
        raise ValueError(f"flac: sample out of {bps}-bit signed range")
    n, ch = s.shape
    if not 1 <= ch <= 8:
        raise ValueError("flac: 1..8 channels")
    if stereo_mode != "independent" and ch != 2:
        raise ValueError("flac: stereo decorrelation needs 2 channels")
    # STREAMINFO
    md5 = hashlib.md5(_pack_pcm(s, bps)).digest()
    si = BitWriter()
    si.u(block_size, 16)
    si.u(block_size, 16)
    si.u(0, 24)  # min frame size unknown
    si.u(0, 24)  # max frame size unknown
    si.u(rate, 20)
    si.u(ch - 1, 3)
    si.u(bps - 1, 5)
    si.u(n & ((1 << 36) - 1), 36)
    info = si.bytes() + md5
    out = bytearray(_MAGIC)
    out += bytes([0x80 | 0]) + len(info).to_bytes(3, "big") + info  # last block
    ch_code = {
        "independent": ch - 1,
        "left_side": 8,
        "right_side": 9,
        "mid_side": 10,
    }[stereo_mode]
    for fi, lo in enumerate(range(0, n, block_size)):
        blk = s[lo : lo + block_size].astype(np.int64)
        bs = len(blk)
        h = BitWriter()
        h.u(0b11111111111110, 14)
        h.u(0, 1)  # reserved
        h.u(0, 1)  # fixed blocking: frame number coded
        h.u(0b0111, 4)  # blocksize: 16-bit (n-1) at header end
        h.u(0b0000, 4)  # sample rate: from STREAMINFO
        h.u(ch_code, 4)
        h.u(_SS_CODE[bps], 3)
        h.u(0, 1)  # reserved
        hdr = h.bytes() + _utf8_code(fi) + struct.pack(">H", bs - 1)
        hdr += bytes([_crc8(hdr)])
        fw = BitWriter()
        if stereo_mode == "independent":
            stored = [(blk[:, c], bps) for c in range(ch)]
        else:
            left, right = blk[:, 0], blk[:, 1]
            side = left - right
            if stereo_mode == "left_side":
                stored = [(left, bps), (side, bps + 1)]
            elif stereo_mode == "right_side":
                stored = [(side, bps + 1), (right, bps)]
            else:  # mid_side
                mid = (left + right) >> 1
                stored = [(mid, bps), (side, bps + 1)]
        for xc, sbps in stored:
            _encode_subframe(fw, xc, sbps=sbps, lpc=lpc, part_order=part_order)
        while len(fw._bits) % 8:
            fw.u(0, 1)
        frame = hdr + fw.bytes()
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------
def _read_residuals(r: BitReader, bs: int, order: int) -> np.ndarray:
    method = r.u(2)
    if method not in (0, 1):
        raise ValueError("flac: reserved residual method")
    part_order = r.u(4)
    if part_order and (bs % (1 << part_order) or (bs >> part_order) <= order):
        raise ValueError("flac: partition order does not divide block size")
    pbits = 4 if method == 0 else 5
    res_parts = []
    for p in range(1 << part_order):
        cnt = (bs >> part_order) - (order if p == 0 else 0)
        k = r.u(pbits)
        if k == (1 << pbits) - 1:  # escape: raw binary
            raw_bits = r.u(5)
            if raw_bits == 0:
                # spec-legal: 0-bit residuals = an all-zero partition
                res_parts.append(np.zeros(cnt, dtype=np.int64))
            else:
                res_parts.append(_read_raw_signed(r, cnt, raw_bits))
        else:
            res_parts.append(_read_rice(r, cnt, k))
    return np.concatenate(res_parts) if res_parts else np.empty(0, np.int64)


def _decode_subframe(r: BitReader, bs: int, sbps: int) -> np.ndarray:
    """One channel's subframe -> int64 samples (CONSTANT / VERBATIM /
    FIXED 0-4 / LPC 1-32 with partitioned Rice residuals)."""
    if r.u(1):
        raise ValueError("flac: bad subframe padding bit")
    stype = r.u(6)
    wasted = 0
    if r.u(1):  # wasted-bits flag: unary count follows (k zeroes + 1)
        wasted = 1
        while r.u(1) == 0:
            wasted += 1
        sbps -= wasted
        if sbps <= 0:
            raise ValueError("flac: wasted bits exceed sample size")
    if stype == 0b000000:  # CONSTANT
        return np.full(bs, _signed(r, sbps), dtype=np.int64) << wasted
    if stype == 0b000001:  # VERBATIM
        return _read_raw_signed(r, bs, sbps) << wasted
    if 0b001000 <= stype <= 0b001100:  # FIXED 0..4
        order = stype & 0x07
        warm = np.array([_signed(r, sbps) for _ in range(order)], dtype=np.int64)
        return (
            _fixed_restore(warm, _read_residuals(r, bs, order), order) << wasted
        )
    if stype >= 0b100000:  # LPC, order 1..32 (r9: the real-world tier)
        order = (stype & 0x1F) + 1
        warm = np.array([_signed(r, sbps) for _ in range(order)], dtype=np.int64)
        prec = r.u(4) + 1
        if prec == 16:
            raise ValueError("flac: invalid qlp precision escape")
        shift = _signed(r, 5)
        if shift < 0:
            raise ValueError("flac: negative qlp shift")
        coeffs = [_signed(r, prec) for _ in range(order)]
        res = _read_residuals(r, bs, order)
        out = np.concatenate([warm, np.empty(len(res), np.int64)])
        for i in range(len(res)):
            j = order + i
            pred = 0
            for t, c in enumerate(coeffs):
                pred += c * out[j - 1 - t]
            out[j] = res[i] + (pred >> shift)  # arithmetic shift per spec
        return out << wasted
    raise ValueError(f"flac: reserved subframe type {stype:#08b}")


def decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes -> ((n, channels) int16/int32, sample_rate).
    Verifies the header CRC-8, frame CRC-16, and STREAMINFO MD5.
    Decodes the full lossless surface a real-world stream uses:
    CONSTANT / VERBATIM / FIXED / LPC subframes, partitioned Rice
    residuals with the raw-binary escape (incl. the 0-bit all-zero
    form), all three stereo decorrelation modes (side channel at
    bps+1), wasted-bits subframes, and every standard depth
    8/12/16/20/24/32 (int16 out for depths <= 16, int32 above).
    STREAMINFO total_samples == 0 means UNKNOWN: frames are decoded to
    the end of the payload instead."""
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
    if bps not in _SS_CODE:
        raise NotImplementedError(f"flac: nonstandard {bps}-bit depth")
    chans: list[list[np.ndarray]] = [[] for _ in range(ch)]
    got = 0
    # ONE reader over the whole payload, seeked per frame: a per-frame
    # payload[pos:] slice would copy O(frames x bytes) AND discard the
    # unpacked-bit / set-bit caches the vectorized Rice decode keys on
    # the reader instance (r10)
    r = BitReader(payload)
    # total == 0 means UNKNOWN (spec): decode frames to end of payload
    while (got < total) if total else (pos < len(payload)):
        frame_start = pos
        r._pos = frame_start * 8
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
        if ch_code > 10:
            raise ValueError("flac: reserved channel assignment")
        if ch_code <= 7 and ch_code + 1 != ch:
            raise ValueError("flac: frame/streaminfo channel mismatch")
        if ch_code > 7 and ch != 2:
            raise ValueError("flac: stereo decorrelation in a non-stereo stream")
        if ss_code != 0 and _SS_BITS.get(ss_code) != bps:
            raise ValueError("flac: frame/streaminfo sample-size mismatch")
        # header CRC-8 covers bytes from sync to just before the crc byte
        hdr_len = (r._pos - frame_start * 8 + 7) // 8
        if _crc8(payload[frame_start : frame_start + hdr_len]) != r.u(8):
            raise ValueError("flac: frame header CRC-8 mismatch")
        # side channels carry one extra bit (spec: the decorrelated
        # difference needs bps+1); index of the side channel per mode
        side_idx = {8: 1, 9: 0, 10: 1}.get(ch_code)
        stored = []
        for c in range(ch):
            sbps = bps + (1 if c == side_idx else 0)
            stored.append(_decode_subframe(r, bs, sbps))
        if ch_code <= 7:
            for c in range(ch):
                chans[c].append(stored[c])
        elif ch_code == 8:  # left/side
            left, side = stored
            chans[0].append(left)
            chans[1].append(left - side)
        elif ch_code == 9:  # right/side (side stored first)
            side, right = stored
            chans[0].append(right + side)
            chans[1].append(right)
        else:  # 10: mid/side
            mid, side = stored
            m2 = (mid.astype(np.int64) << 1) | (side & 1)
            chans[0].append((m2 + side) >> 1)
            chans[1].append((m2 - side) >> 1)
        while r._pos % 8:
            if r.u(1):
                raise ValueError("flac: nonzero frame padding")
        body_len = r._pos // 8 - frame_start
        (crc,) = struct.unpack(
            ">H", payload[frame_start + body_len : frame_start + body_len + 2]
        )
        if _crc16(payload[frame_start : frame_start + body_len]) != crc:
            raise ValueError("flac: frame CRC-16 mismatch")
        pos = frame_start + body_len + 2
        got += bs
    # release the unpacked-bit caches BEFORE assembling the output —
    # peak memory is then max(bit caches, pcm), not their sum (the
    # _bit_array memory contract)
    for attr in ("_flac_bits", "_flac_ones"):
        if hasattr(r, attr):
            delattr(r, attr)
    if chans[0]:
        s = np.stack([np.concatenate(c) for c in chans], axis=1)
        if total:
            s = s[:total]
    else:
        s = np.zeros((0, ch), dtype=np.int64)
    lim = 1 << (bps - 1)
    if np.any(s < -lim) or np.any(s >= lim):
        raise ValueError(f"flac: decoded sample out of {bps}-bit range")
    out = s.astype(np.int16 if bps <= 16 else np.int32)
    if hashlib.md5(_pack_pcm(out, bps)).digest() != want_md5:
        raise ValueError("flac: STREAMINFO MD5 mismatch (corrupt stream)")
    return out, rate
