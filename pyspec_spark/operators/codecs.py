"""Public-format image codecs in pure numpy + stdlib — SURVEY.md §2.12 L7.

Real decoders for the multimodal column: Netpbm binary PPM (P6) / PGM
(P5), PNG (8-bit gray / gray+alpha / RGB / RGBA, non-interlaced, all
five scanline filters) via stdlib ``zlib``/``struct``, and baseline
JPEG (ITU-T T.81, gray + 4:4:4/4:2:0 color, restart markers — see
``operators/jpeg.py``).  All are published specs (Netpbm man pages;
PNG = RFC 2083 / ISO 15948; JPEG = ITU-T T.81 with Annex K defaults),
so nothing here depends on codec libraries absent from this container.

Multi-frame ("video") payloads are plain concatenations of single-frame
encodings: both formats are self-delimiting (PPM by its header + exact
payload size, PNG by chunk lengths up to IEND), so frame k is reached by
skipping k frames without decompressing them (PNG skip is chunk-walk
only; PPM skip is header-parse only).

Encoders exist so tests and fixtures can generate real bytes
deterministically; the engine itself only needs decode.

Scale notes: decode is per-row inside Arrow batches on executors (see
``operators/multimodal.py``); a payload never leaves its executor and
nothing here touches the driver.  The unfiltering loops for PNG filter
types 1/3/4 are per-scanline numpy-assisted Python — fine for the
fixture sizes tested here; a production deployment would swap this
module for a C codec behind the same ``decode_frames`` signature.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# ---------------------------------------------------------------------------
# Netpbm PPM (P6) / PGM (P5) — binary variants, maxval <= 255
# ---------------------------------------------------------------------------


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6)."""
    img = np.asarray(img, dtype=np.uint8)
    h, w, c = img.shape
    if c != 3:
        raise ValueError(f"PPM is 3-channel; got {c}")
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def encode_pgm(img: np.ndarray) -> bytes:
    """(h, w) uint8 -> binary PGM (P5)."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape
    return b"P5\n%d %d\n255\n" % (w, h) + img.tobytes()


def _pnm_header(data: bytes, pos: int) -> tuple[bytes, int, int, int, int]:
    """Parse 'P6 <w> <h> <maxval>' allowing comments/whitespace per the
    Netpbm spec.  Returns (magic, w, h, maxval, data_start)."""
    magic = data[pos : pos + 2]
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary PGM/PPM at offset {pos}: {magic!r}")
    i = pos + 2
    fields: list[int] = []
    while len(fields) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":  # comment to end of line
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        fields.append(int(data[i:j]))
        i = j
    i += 1  # single whitespace byte after maxval, then raster
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError(f"16-bit PNM not supported (maxval={maxval})")
    return magic, w, h, maxval, i


def _decode_pnm_one(data: bytes, pos: int) -> tuple[np.ndarray, int]:
    """Decode one PNM image starting at pos -> ((h,w,3) uint8, next_pos)."""
    magic, w, h, _, start = _pnm_header(data, pos)
    nch = 3 if magic == b"P6" else 1
    n = w * h * nch
    raster = np.frombuffer(data[start : start + n], dtype=np.uint8)
    if raster.size != n:
        raise ValueError(f"truncated PNM raster: want {n}, have {raster.size}")
    img = raster.reshape(h, w, nch)
    if nch == 1:
        img = np.repeat(img, 3, axis=2)
    return img, start + n


# ---------------------------------------------------------------------------
# PNG — RFC 2083; 8-bit depth, color types 0/2/4/6, no interlace
# ---------------------------------------------------------------------------


def _png_chunk(typ: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + typ
        + body
        + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """(h, w) or (h, w, {1,2,3,4}) uint8 -> PNG bytes.

    ``filter_type`` applies one filter to every scanline (0=None, 1=Sub,
    2=Up, 3=Average, 4=Paeth) — exercising the decoder's unfilter paths
    is exactly why the encoder supports them."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    bpp = c  # bytes per pixel at depth 8
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.uint8)
    for y in range(h):
        line = img[y].reshape(-1)
        raw.append(filter_type)
        raw += _png_filter(line, prev, bpp, filter_type).tobytes()
        prev = line
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def _png_filter(line: np.ndarray, prev: np.ndarray, bpp: int, ft: int) -> np.ndarray:
    x = line.astype(np.int32)
    a = np.zeros_like(x)
    a[bpp:] = x[:-bpp]
    b = prev.astype(np.int32)
    cc = np.zeros_like(b)
    cc[bpp:] = b[:-bpp]
    if ft == 0:
        out = x
    elif ft == 1:
        out = x - a
    elif ft == 2:
        out = x - b
    elif ft == 3:
        out = x - ((a + b) >> 1)
    elif ft == 4:
        out = x - _paeth(a, b, cc)
    else:
        raise ValueError(f"bad filter {ft}")
    return (out % 256).astype(np.uint8)


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def _png_walk(data: bytes, pos: int):
    """Yield (type, body_start, body_len) chunks from pos (after sig)."""
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        yield typ, pos + 8, ln
        pos += 12 + ln
        if typ == b"IEND":
            return
    raise ValueError("PNG stream ended without IEND")


def _png_end(data: bytes, pos: int) -> int:
    """Byte offset just past the IEND chunk of the PNG starting at pos."""
    for typ, body, ln in _png_walk(data, pos + 8):
        if typ == b"IEND":
            return body + ln + 4
    raise ValueError("no IEND")


def _decode_png_one(data: bytes, pos: int) -> tuple[np.ndarray, int]:
    if data[pos : pos + 8] != PNG_SIG:
        raise ValueError(f"bad PNG signature at offset {pos}")
    w = h = None
    ctype = 0
    idat = bytearray()
    end = pos + 8
    for typ, body, ln in _png_walk(data, pos + 8):
        end = body + ln + 4
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(
                ">IIBBBBB", data[body : body + 13]
            )
            if depth != 8:
                raise ValueError(f"only 8-bit PNG supported (depth={depth})")
            if inter != 0:
                raise ValueError("interlaced PNG not supported")
        elif typ == b"IDAT":
            idat += data[body : body + ln]
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG without IHDR")
    nch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    raw = zlib.decompress(bytes(idat))
    stride = w * nch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG raster size mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)], dtype=np.uint8
        ).astype(np.int32)
        if ft == 0:
            cur = line
        elif ft == 2:
            cur = (line + prev) % 256
        elif ft in (1, 3, 4):
            # left-dependent filters are sequential per scanline
            cur = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                a = cur[i - nch] if i >= nch else 0
                b = prev[i]
                c = prev[i - nch] if i >= nch else 0
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + b) >> 1
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (line[i] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter byte {ft}")
        out[y] = cur
        prev = cur
    img = out.reshape(h, w, nch)
    if nch == 1:
        img = np.repeat(img, 3, axis=2)
    elif nch == 2:  # gray + alpha: replicate gray, drop alpha
        img = np.repeat(img[:, :, :1], 3, axis=2)
    elif nch == 4:  # RGBA: drop alpha
        img = img[:, :, :3]
    return np.ascontiguousarray(img), end


# ---------------------------------------------------------------------------
# WAV (RIFF/PCM) — the audio modality; published container spec
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """(n,) or (n, channels) int16 -> WAV PCM bytes."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.tobytes()  # interleaved little-endian PCM16
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV PCM16 bytes -> ((n, channels) int16, sample_rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    rate = None
    ch = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (ln,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            audio_fmt, ch, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if audio_fmt != 1 or bits != 16:
                raise ValueError(
                    f"only PCM16 WAV supported (fmt={audio_fmt}, bits={bits})"
                )
        elif cid == b"data":
            data = body
    if rate is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    s = np.frombuffer(data, dtype="<i2")
    return s.reshape(-1, ch), rate


# ---------------------------------------------------------------------------
# Frame-stream API used by operators/multimodal.py
# ---------------------------------------------------------------------------

def _decode_jpeg_one(data: bytes, pos: int):
    from pyspec_spark.operators.jpeg import decode_jpeg_one

    return decode_jpeg_one(data, pos)


_DECODERS = {
    "ppm": _decode_pnm_one,
    "pgm": _decode_pnm_one,
    "png": _decode_png_one,
    "jpeg": _decode_jpeg_one,
}


def _skip_one(codec: str, data: bytes, pos: int) -> int:
    """Next-frame offset WITHOUT decoding pixel data."""
    if codec in ("ppm", "pgm"):
        magic, w, h, _, start = _pnm_header(data, pos)
        return start + w * h * (3 if magic == b"P6" else 1)
    if codec == "png":
        if data[pos : pos + 8] != PNG_SIG:
            raise ValueError(f"bad PNG signature at offset {pos}")
        return _png_end(data, pos)
    if codec == "jpeg":
        from pyspec_spark.operators.jpeg import jpeg_end

        return jpeg_end(data, pos)
    raise ValueError(f"unknown codec {codec!r}")


def decode_frame_at(codec: str, payload: bytes, frame_id: int) -> np.ndarray:
    """Decode frame ``frame_id`` of a (possibly concatenated) payload to
    (h, w, 3) uint8, skipping earlier frames without decompressing them."""
    decoder = _DECODERS.get(codec)
    if decoder is None:
        raise ValueError(f"unknown codec {codec!r}")
    pos = 0
    for _ in range(frame_id):
        pos = _skip_one(codec, payload, pos)
    img, _ = decoder(payload, pos)
    return img


def count_frames(codec: str, payload: bytes) -> int:
    n, pos = 0, 0
    while pos < len(payload):
        pos = _skip_one(codec, payload, pos)
        n += 1
    return n
