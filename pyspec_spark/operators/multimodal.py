"""Multimodal (image/audio/video) column plumbing — SURVEY.md §2.12 L7.

Design (north-star brief): media payloads are opaque `binary` columns
with a typed metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched pandas functions over `mapInPandas`.

Image decode is REAL for the public formats implemented in
``operators/codecs.py`` / ``operators/jpeg.py`` (binary PPM/PGM, 8-bit
PNG, and baseline JPEG per ITU-T T.81; multi-frame via concatenation) —
no codec library needed.  MP4 CONTAINER metadata is REAL too
(operators/mp4.py parses the ISO 14496-12 box tree: duration, track
geometry, codec fourcc, sample counts — see ``video_metadata``), and
mp4 FRAME decode is real for MJPEG samples (r6) and avc1 IDR/I_PCM
streams (r8, operators/h264.py).  Transformed/predicted bitstream
macroblocks (HEVC/AV1, non-I_PCM H.264) raise NotImplementedError at
a clearly-marked boundary (a full entropy/transform decoder is out of
scope for pure numpy — plug PIL/av in at that one seam).  The
deterministic `fake-rgb8` codec remains for plumbing tests.

Scale notes: one media blob never leaves its executor; decode is
per-row inside Arrow batches; frame sampling happens *before* feature
extraction (frame k is seeked by header-skipping, not decoded), so the
decode cost is bounded by the sampled frames, not the payload.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),        # image | audio | video
        StructField("codec", StringType()),       # png | jpeg | wav | fake-rgb8 ...
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("payload", BinaryType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_id", IntegerType()),
        StructField("features", ArrayType(DoubleType())),  # mean RGB + moments
    ]
)

DECODED_CODECS = ("ppm", "pgm", "png", "jpeg")  # real image decoders (codecs.py)
AUDIO_CODECS = ("wav", "flac")              # real audio decoders (codecs.py, flac.py)
STUBBED_CODECS = ("mp4",)                   # decoder libs absent from container


def decode_frame(codec: str, payload: bytes, width: int, height: int, frame_id: int) -> np.ndarray:
    """Decode one frame to (h, w, 3) uint8."""
    if codec in DECODED_CODECS:
        from pyspec_spark.operators.codecs import decode_frame_at

        return decode_frame_at(codec, payload, frame_id)
    if codec == "fake-rgb8":
        # deterministic synthetic decode: bytes seed a generator
        seed = int.from_bytes(payload[:8], "little", signed=False) + frame_id
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, (height, width, 3), dtype=np.uint8)
    if codec in AUDIO_CODECS:
        raise ValueError(
            f"codec {codec!r} is audio — use decode_audio / extract_audio_features"
        )
    if codec in STUBBED_CODECS:
        # MJPEG-in-MP4 (round 6): each sample is a complete baseline
        # JPEG, demuxed through the real stsz/stsc/stco tables and
        # decoded by the in-repo T.81 decoder.  avc1 IDR/I_PCM (r8)
        # and hvc1 all-PCM IDR (r9, bounded-CABAC path) also decode
        # natively; the remaining stub is transformed/predicted CUs
        # and av01 (no raw-sample mode exists in AV1).
        from pyspec_spark.operators.jpeg import decode_jpeg_one
        from pyspec_spark.operators.mp4 import (
            extract_mp4_samples,
            parse_mp4_metadata,
        )

        # Decide the codec from stsd metadata FIRST: a non-MJPEG movie
        # must hit the documented NotImplementedError boundary even
        # when it lacks full sample tables (metadata-only movies have
        # stsz but no stsc/stco — the r6 review caught those dying
        # with the demux ValueError instead of the contract error).
        meta = parse_mp4_metadata(payload)
        video = next(
            (t for t in meta["tracks"] if t["handler"] == "vide"), None
        )
        sample_codec = video and video["codec"]
        if sample_codec == "avc1" and (video.get("avc") or {}).get("width"):
            # r8: IDR/I_PCM access units decode natively and exactly
            # (operators/h264.py); any transformed/predicted macroblock
            # raises the contract NotImplementedError inside
            # decode_ipcm_idr — the boundary is now per-macroblock.
            from pyspec_spark.operators.mp4 import extract_mp4_samples

            w, h = video["avc"]["width"], video["avc"]["height"]
            try:
                _, samples = extract_mp4_samples(payload, [frame_id])
                y, cb, cr = decode_avc_ipcm_sample(samples[0], w, h)
            except ValueError as e:
                # metadata-only movies (stsz without stsc/stco) and
                # non-I_PCM payloads without a slice NAL must still hit
                # the CONTRACT error, not a demux ValueError (the r6
                # review class)
                raise NotImplementedError(
                    f"avc1: no decodable I_PCM access unit ({e}) — only "
                    "IDR/I_PCM streams decode natively"
                ) from None
            yf = y.astype(np.float64)
            cbf = np.repeat(np.repeat(cb, 2, axis=0), 2, axis=1)[
                :h, :w
            ].astype(np.float64)
            crf = np.repeat(np.repeat(cr, 2, axis=0), 2, axis=1)[
                :h, :w
            ].astype(np.float64)
            # same JFIF full-range conversion the JPEG decoder applies
            r_ = yf + 1.402 * (crf - 128.0)
            g_ = yf - 0.344136 * (cbf - 128.0) - 0.714136 * (crf - 128.0)
            b_ = yf + 1.772 * (cbf - 128.0)
            img = np.stack([r_, g_, b_], axis=2)
            return np.clip(np.round(img), 0, 255).astype(np.uint8)
        if sample_codec == "hvc1" and (video.get("hevc") or {}).get("width"):
            # r9: all-PCM IDR access units decode natively and exactly
            # through the bounded CABAC path (operators/h265.py); any
            # other bin pattern (split/NxN/pcm_flag=0/non-I) raises the
            # contract NotImplementedError inside decode_pcm_islice —
            # the hvc1 boundary is now per-CU.
            w, h = video["hevc"]["width"], video["hevc"]["height"]
            try:
                _, samples = extract_mp4_samples(payload, [frame_id])
                y, cb, cr = decode_hevc_ipcm_sample(samples[0], w, h)
            except ValueError as e:
                raise NotImplementedError(
                    f"hvc1: no decodable PCM access unit ({e}) — only "
                    "all-PCM IDR streams decode natively"
                ) from None
            yf = y.astype(np.float64)
            cbf = np.repeat(np.repeat(cb, 2, axis=0), 2, axis=1)[
                :h, :w
            ].astype(np.float64)
            crf = np.repeat(np.repeat(cr, 2, axis=0), 2, axis=1)[
                :h, :w
            ].astype(np.float64)
            r_ = yf + 1.402 * (crf - 128.0)
            g_ = yf - 0.344136 * (cbf - 128.0) - 0.714136 * (crf - 128.0)
            b_ = yf + 1.772 * (cbf - 128.0)
            img = np.stack([r_, g_, b_], axis=2)
            return np.clip(np.round(img), 0, 255).astype(np.uint8)
        if sample_codec not in ("jpeg", "mjpa"):
            raise NotImplementedError(
                f"mp4 sample codec {sample_codec!r}: FRAME decoder "
                "library not available in this container — plug a "
                "decoder in here (PIL/av); MJPEG ('jpeg'/'mjpa'), "
                "avc1 I_PCM and hvc1 PCM decode natively, container "
                "METADATA parses without any codec (video_metadata / "
                "operators/mp4.py)"
            )
        _, samples = extract_mp4_samples(payload, [frame_id])
        img, _ = decode_jpeg_one(samples[0], 0)
        return img
    raise ValueError(f"unknown codec {codec!r}")


def make_fake_media(spark: SparkSession, n: int = 8, frames: int = 4) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    rows = []
    for i in range(n):
        payload = int(i * 2654435761 % 2**63).to_bytes(8, "little") * 4
        rows.append((i, "video" if i % 2 else "image", "fake-rgb8", 16, 12,
                     frames if i % 2 else 1, bytearray(payload)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("window_id", IntegerType()),
        StructField("rms", DoubleType()),
        StructField("zcr", DoubleType()),
    ]
)


def synth_audio(media_id: int, n: int = 16000, rate: int = 16000) -> np.ndarray:
    """Deterministic int16 mono test signal: a sine whose frequency and
    amplitude are closed-form in media_id (golden-checkable RMS ≈ A/√2
    and zero-crossing rate ≈ 2f/rate)."""
    freq = 100.0 * (media_id + 1)
    amp = 1000.0 * (media_id + 1)
    t = np.arange(n, dtype=np.float64) / rate
    return np.round(amp * np.sin(2 * np.pi * freq * t)).astype(np.int16)


def decode_audio(codec: str, payload: bytes):
    """Dispatch an audio payload to its decoder: WAV RIFF/PCM16 or
    FLAC (r9/r10, the full lossless surface at every standard depth —
    operators/flac.py).  Returns ((n, channels) int16 — int32 for
    FLAC depths above 16 — and the sample rate); the feature
    extractors promote to float64 either way."""
    if codec == "wav":
        from pyspec_spark.operators.codecs import decode_wav

        return decode_wav(payload)
    if codec == "flac":
        from pyspec_spark.operators.flac import decode_flac

        return decode_flac(payload)
    raise ValueError(f"decode_audio: codec {codec!r} is not audio")


def make_audio_media(spark: SparkSession, n: int = 8, rate: int = 16000) -> DataFrame:
    """Media table of real WAV PCM payloads (kind='audio'; width/height
    unused for audio, n_frames carries the sample count)."""
    from pyspec_spark.operators.codecs import encode_wav

    rows = []
    for i in range(n):
        samples = synth_audio(i, n=rate, rate=rate)  # 1 second each
        rows.append(
            (i, "audio", "wav", None, None, len(samples),
             bytearray(encode_wav(samples, rate)))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def make_flac_media(spark: SparkSession, n: int = 8, rate: int = 16000) -> DataFrame:
    """FLAC twin of make_audio_media: the same deterministic signals
    land as real FLAC payloads (CONSTANT/FIXED/VERBATIM subframes, real
    CRCs + MD5), so every audio operator exercises the compressed
    container too."""
    from pyspec_spark.operators.flac import encode_flac

    rows = []
    for i in range(n):
        samples = synth_audio(i, n=rate, rate=rate)
        rows.append(
            (i, "audio", "flac", None, None, len(samples),
             bytearray(encode_flac(samples, rate)))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_audio_features(media: DataFrame, window: int = 1024) -> DataFrame:
    """Per-window audio features (RMS, zero-crossing rate) via
    mapInPandas: decode WAV PCM16 executor-side, window the first
    channel, one output row per (media, window).  The trailing partial
    window is dropped (fixed-size windows keep features comparable)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                if r["codec"] not in AUDIO_CODECS:
                    raise ValueError(
                        f"extract_audio_features: codec {r['codec']!r} is not audio"
                    )
                samples, _rate = decode_audio(r["codec"], bytes(r["payload"]))
                x = samples[:, 0].astype(np.float64)
                n_win = len(x) // window
                for w in range(n_win):
                    seg = x[w * window : (w + 1) * window]
                    rms = float(np.sqrt(np.mean(seg * seg)))
                    zc = float(np.mean(np.abs(np.diff(np.signbit(seg))).astype(np.float64)))
                    out.append(
                        {
                            "media_id": int(r["media_id"]),
                            "window_id": w,
                            "rms": rms,
                            "zcr": zc,
                        }
                    )
            yield pd.DataFrame(
                out, columns=["media_id", "window_id", "rms", "zcr"]
            )

    return media.mapInPandas(run, AUDIO_FEATURE_SCHEMA)


def synth_image(media_id: int, frame_id: int, width: int = 16, height: int = 12) -> np.ndarray:
    """Deterministic test image: per-channel affine gradients keyed by
    (media_id, frame_id) — closed-form, so goldens can state exact
    means without running the pipeline."""
    y = np.arange(height, dtype=np.int64)[:, None]
    x = np.arange(width, dtype=np.int64)[None, :]
    r = (7 * media_id + 13 * frame_id + 3 * x + 5 * y) % 256
    g = (11 * media_id + 17 * frame_id + 5 * x + 7 * y) % 256
    b = (23 * media_id + 29 * frame_id + 7 * x + 11 * y) % 256
    return np.stack(
        [np.broadcast_to(c, (height, width)) for c in (r, g, b)], axis=2
    ).astype(np.uint8)


def make_real_media(
    spark: SparkSession, n: int = 16, frames: int = 4, width: int = 16, height: int = 12
) -> DataFrame:
    """Media table with REAL encoded payloads: even ids are single-frame
    PNG images, odd ids are multi-frame "videos" of concatenated PPMs.
    Deterministic in (n, frames, width, height)."""
    from pyspec_spark.operators.codecs import encode_png, encode_ppm

    rows = []
    for i in range(n):
        if i % 2:
            payload = b"".join(
                encode_ppm(synth_image(i, f, width, height)) for f in range(frames)
            )
            rows.append((i, "video", "ppm", width, height, frames, bytearray(payload)))
        else:
            payload = encode_png(synth_image(i, 0, width, height), filter_type=i // 2 % 5)
            rows.append((i, "image", "png", width, height, 1, bytearray(payload)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def make_mixed_media(
    spark: SparkSession, n: int = 18, frames: int = 4, width: int = 16, height: int = 12
) -> DataFrame:
    """Media table mixing all three real image codecs: id%3==0 -> PNG
    (cycling scanline filters), id%3==1 -> multi-frame PPM "video",
    id%3==2 -> baseline JPEG (cycling 4:4:4 / 4:2:0 sampling, one row
    per cycle with restart markers).  The dominant real-world format is
    first-class here, not a stub boundary."""
    from pyspec_spark.operators.codecs import encode_png, encode_ppm
    from pyspec_spark.operators.jpeg import encode_jpeg

    rows = []
    for i in range(n):
        if i % 3 == 0:
            payload = encode_png(synth_image(i, 0, width, height), filter_type=i // 3 % 5)
            rows.append((i, "image", "png", width, height, 1, bytearray(payload)))
        elif i % 3 == 1:
            payload = b"".join(
                encode_ppm(synth_image(i, f, width, height)) for f in range(frames)
            )
            rows.append((i, "video", "ppm", width, height, frames, bytearray(payload)))
        else:
            payload = encode_jpeg(
                synth_image(i, 0, width, height),
                quality=92,
                subsampling="420" if i % 2 else "444",
                restart_interval=2 if i % 9 == 2 else 0,
            )
            rows.append((i, "image", "jpeg", width, height, 1, bytearray(payload)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


VIDEO_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("codec", StringType()),
        StructField("brand", StringType(), True),
        StructField("duration_s", DoubleType(), True),
        StructField("track_codec", StringType(), True),
        StructField("track_w", IntegerType(), True),
        StructField("track_h", IntegerType(), True),
        StructField("language", StringType(), True),
        StructField("n_samples", IntegerType(), True),
    ]
)


def make_video_media(spark: SparkSession, n: int = 6) -> DataFrame:
    """Media table of synthesized minimal MP4s with metadata that is a
    closed-form function of media_id (golden-checkable)."""
    from pyspec_spark.operators.mp4 import make_minimal_mp4

    codecs = ("avc1", "hvc1", "av01")
    langs = ("eng", "und", "fra")
    rows = []
    for i in range(n):
        payload = make_minimal_mp4(
            width=64 + 16 * i,
            height=48 + 12 * i,
            duration_s=1.0 + 0.5 * i,
            codec=codecs[i % 3],
            n_samples=24 * (i + 1),
            language=langs[i % 3],
        )
        rows.append(
            (i, "video", "mp4", 64 + 16 * i, 48 + 12 * i, 24 * (i + 1),
             bytearray(payload))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def make_avc_media(spark: SparkSession, n: int = 8) -> DataFrame:
    """Media table of minimal MP4s whose avc1 sample entries embed REAL
    avcC records (conformant SPS+PPS, operators/h264.py) with metadata
    a closed-form function of media_id; true cropped dimensions are
    deliberately non-16-multiples so the SPS disagrees with the coded
    size and parsing it is load-bearing."""
    from pyspec_spark.operators.mp4 import make_minimal_mp4

    rows = []
    for i in range(n):
        w = 320 + 16 * i - 2 * (i % 4)
        h = 240 + 16 * i - 2 * (i % 3)
        payload = make_minimal_mp4(
            width=w,
            height=h,
            duration_s=1.0,
            codec="avc1",
            n_samples=8,
            avc_params=(66 if i % 2 == 0 else 77, 30 + i),
        )
        rows.append((i, "video", "mp4", w, h, 8, bytearray(payload)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


AVC_PARAMS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("profile_idc", IntegerType(), True),
        StructField("level_idc", IntegerType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)


def avc_track_params(media: DataFrame) -> DataFrame:
    """Per-payload H.264 stream parameters from the avcC SPS (profile,
    level, TRUE cropped dimensions) via mapInPandas — the codec-level
    complement of video_metadata's container fields; payloads never
    leave executors."""
    from pyspec_spark.operators.mp4 import parse_mp4_metadata

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                if r["codec"] != "mp4":
                    continue
                meta = parse_mp4_metadata(bytes(r["payload"]))
                avc = next(
                    (
                        t["avc"]
                        for t in meta["tracks"]
                        if t.get("avc") is not None
                    ),
                    None,
                )
                if avc is None:
                    continue
                out.append(
                    {
                        "media_id": int(r["media_id"]),
                        "profile_idc": avc["profile_idc"],
                        "level_idc": avc["level_idc"],
                        "width": avc["width"],
                        "height": avc["height"],
                    }
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in AVC_PARAMS_SCHEMA.fields]
            )

    return media.mapInPandas(run, AVC_PARAMS_SCHEMA)


def make_hevc_media(spark: SparkSession, n: int = 8) -> DataFrame:
    """hvc1 twin of make_avc_media: minimal MP4s whose sample entries
    embed REAL hvcC records (conformant HEVC SPS, operators/h265.py);
    true dimensions are non-8-multiples so the conformance window is
    load-bearing."""
    from pyspec_spark.operators.mp4 import make_minimal_mp4

    rows = []
    for i in range(n):
        w = 426 + 8 * i - 2 * (i % 3)
        h = 238 + 8 * i - 2 * (i % 2)
        payload = make_minimal_mp4(
            width=w,
            height=h,
            duration_s=1.0,
            codec="hvc1",
            n_samples=8,
            hevc_params=(1 if i % 2 == 0 else 2, i % 2, 90 + 3 * i),
        )
        rows.append((i, "video", "mp4", w, h, 8, bytearray(payload)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


HEVC_PARAMS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("profile_idc", IntegerType(), True),
        StructField("tier", IntegerType(), True),
        StructField("level_idc", IntegerType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)


def hevc_track_params(media: DataFrame) -> DataFrame:
    """Per-payload HEVC stream parameters from the hvcC SPS via
    mapInPandas (profile/tier/level + conformance-windowed true
    dimensions)."""
    from pyspec_spark.operators.mp4 import parse_mp4_metadata

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                if r["codec"] != "mp4":
                    continue
                meta = parse_mp4_metadata(bytes(r["payload"]))
                hv = next(
                    (
                        t["hevc"]
                        for t in meta["tracks"]
                        if t.get("hevc") is not None
                    ),
                    None,
                )
                if hv is None:
                    continue
                out.append(
                    {
                        "media_id": int(r["media_id"]),
                        "profile_idc": hv["profile_idc"],
                        "tier": hv["tier"],
                        "level_idc": hv["level_idc"],
                        "width": hv["width"],
                        "height": hv["height"],
                    }
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in HEVC_PARAMS_SCHEMA.fields]
            )

    return media.mapInPandas(run, HEVC_PARAMS_SCHEMA)


def make_av1_media(spark: SparkSession, n: int = 8) -> DataFrame:
    """av01 member of the codec-trilogy media tables: minimal MP4s
    whose sample entries embed REAL av1C records (conformant sequence
    header OBU, operators/av1.py) with profile/level/tier/bit-depth a
    closed-form function of media_id — fields the container has no
    typed slot for, so parsing the OBU is the only way to gate on
    them."""
    from pyspec_spark.operators.mp4 import make_minimal_mp4

    rows = []
    for i in range(n):
        w = 640 + 2 * i
        h = 360 + 2 * i
        payload = make_minimal_mp4(
            width=w,
            height=h,
            duration_s=1.0,
            codec="av01",
            n_samples=8,
            av1_params=(
                i % 2,             # seq_profile 0/1 alternating
                8 + i,             # seq_level_idx (>7 so tier codable)
                i % 2,             # seq_tier
                (i // 2) % 2,      # high_bitdepth
            ),
        )
        rows.append((i, "video", "mp4", w, h, 8, bytearray(payload)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


AV1_PARAMS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("seq_profile", IntegerType(), True),
        StructField("seq_level_idx", IntegerType(), True),
        StructField("seq_tier", IntegerType(), True),
        StructField("bit_depth", IntegerType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)


def av1_track_params(media: DataFrame) -> DataFrame:
    """Per-payload AV1 stream parameters from the av1C sequence header
    OBU via mapInPandas (profile/level/tier/bit-depth + max frame
    dimensions)."""
    from pyspec_spark.operators.mp4 import parse_mp4_metadata

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                if r["codec"] != "mp4":
                    continue
                meta = parse_mp4_metadata(bytes(r["payload"]))
                av = next(
                    (
                        t["av1"]
                        for t in meta["tracks"]
                        if t.get("av1") is not None
                    ),
                    None,
                )
                if av is None:
                    continue
                out.append(
                    {
                        "media_id": int(r["media_id"]),
                        "seq_profile": av["seq_profile"],
                        "seq_level_idx": av["seq_level_idx"],
                        "seq_tier": av["seq_tier"],
                        "bit_depth": av["bit_depth"],
                        "width": av["width"],
                        "height": av["height"],
                    }
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in AV1_PARAMS_SCHEMA.fields]
            )

    return media.mapInPandas(run, AV1_PARAMS_SCHEMA)


def make_phash_media(spark: SparkSession, n_base: int = 8) -> DataFrame:
    """Image near-dup media: n_base deterministic synth pictures, each
    present TWICE — media 2i is a quality-92 4:4:4 encode, media 2i+1
    a quality-30 4:2:0 re-encode of the SAME picture (the crawl's
    "same image, different encoder" case; the payloads share no
    bytes).  Distinct pictures measure >= 10 bits apart in pHash,
    re-encode pairs <= 6 (tests pin the margin), so the planted truth
    is exactly the (2i, 2i+1) pairs."""
    from pyspec_spark.operators.jpeg import encode_jpeg

    w, h = 48, 36
    rows = []
    for i in range(n_base):
        img = synth_image(i, 0, w, h)
        for j, (q, sub) in enumerate(((92, "444"), (30, "420"))):
            payload = encode_jpeg(img, quality=q, subsampling=sub)
            rows.append(
                (2 * i + j, "image", "jpeg", w, h, 1, bytearray(payload))
            )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


PHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("phash", LongType(), True),
    ]
)


def image_phash(media: DataFrame) -> DataFrame:
    """Per-image 64-bit perceptual hash (operators/phash.py) via
    mapInPandas: decode the JPEG payload executor-side, hash the
    pixels; only the 8-byte fingerprint leaves the batch — the image
    analog of the text corpus' minhash signature stage."""
    from pyspec_spark.operators.jpeg import decode_jpeg_one
    from pyspec_spark.operators.phash import phash64

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                if r["codec"] != "jpeg":
                    continue
                img, _ = decode_jpeg_one(bytes(r["payload"]), 0)
                out.append(
                    {
                        "media_id": int(r["media_id"]),
                        "phash": phash64(img),
                    }
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in PHASH_SCHEMA.fields]
            )

    return media.mapInPandas(run, PHASH_SCHEMA)


def make_video_phash_media(
    spark: SparkSession,
    n_base: int = 6,
    frames: int = 8,
    width: int = 64,
    height: int = 48,
) -> DataFrame:
    """Video near-dup media (L37b): n_base deterministic synth CLIPS,
    each present TWICE — media 2i a quality-92 4:4:4 MJPEG-MP4, media
    2i+1 a quality-30 4:2:0 re-encode of the SAME frames (two uploads
    of one video through different encoders: the payloads share no
    bytes, text/byte dedup sees nothing).  Planted truth = exactly the
    (2i, 2i+1) pairs; distinct clips inherit the image fixture's
    >= 10-bit per-frame margins (same synth_image family at the same
    geometry — pinned in tests/test_video_phash.py)."""
    from pyspec_spark.operators.jpeg import encode_jpeg
    from pyspec_spark.operators.mp4 import make_mjpeg_mp4

    rows = []
    for i in range(n_base):
        for j, (q, sub) in enumerate(((92, "444"), (30, "420"))):
            jpegs = [
                encode_jpeg(
                    synth_image(i, f, width, height),
                    quality=q,
                    subsampling=sub,
                )
                for f in range(frames)
            ]
            payload = make_mjpeg_mp4(jpegs, width, height, fps=24.0)
            rows.append(
                (
                    2 * i + j, "video", "mp4", width, height, frames,
                    bytearray(payload),
                )
            )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


VIDEO_PHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("phash", LongType(), True),
    ]
)


def video_phash(media: DataFrame, sample_every: int = 4) -> DataFrame:
    """Frame-sampled perceptual signature of a video column (L37b):
    demux ONLY frames 0, s, 2s, … through the real stsz/stco sample
    tables (extract_mp4_samples seeks by offset arithmetic — the
    skipped samples are never sliced out of the payload, the frame-
    sample analog of column pruning), decode each sampled JPEG
    executor-side, pHash the pixels.  Only (media_id, frame_idx,
    8-byte hash) rows leave the batch — a clip's signature is
    ceil(n_frames/s) longs regardless of payload size, so the dedup
    join downstream shuffles signatures, never video bytes."""
    from pyspec_spark.operators.jpeg import decode_jpeg_one
    from pyspec_spark.operators.mp4 import extract_mp4_samples
    from pyspec_spark.operators.phash import phash64

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                if r["codec"] != "mp4":
                    continue
                idxs = list(
                    range(0, int(r["n_frames"]), max(1, sample_every))
                )
                _, samples = extract_mp4_samples(
                    bytes(r["payload"]), idxs
                )
                for fi, sm in zip(idxs, samples):
                    img, _ = decode_jpeg_one(sm, 0)
                    out.append(
                        {
                            "media_id": int(r["media_id"]),
                            "frame_idx": int(fi),
                            "phash": phash64(img),
                        }
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in VIDEO_PHASH_SCHEMA.fields]
            )

    return media.mapInPandas(run, VIDEO_PHASH_SCHEMA)


def synth_melody(media_id: int, n_notes: int = 8, note_len: int = 2000,
                 rate: int = 16000) -> np.ndarray:
    """Deterministic int16 test melody: n_notes segments, each a
    fundamental + half-amplitude octave harmonic, note frequencies
    centered on FFT bins 10+8·media_id .. 17+8·media_id so every clip
    owns a disjoint bin range (distinct clips share landmark hashes
    only through rare harmonic coincidences — measured <=29 in
    tests/test_audiofp.py)."""
    from pyspec_spark.operators.audiofp import FP_WIN

    x = np.zeros(n_notes * note_len)
    t = np.arange(note_len, dtype=np.float64) / rate
    for k in range(n_notes):
        f = (10 + 8 * media_id + k) * rate / FP_WIN
        x[k * note_len : (k + 1) * note_len] = 600 * np.sin(
            2 * np.pi * f * t
        ) + 300 * np.sin(2 * np.pi * 2 * f * t)
    return np.round(x).astype(np.int16)


def degrade_audio(samples: np.ndarray, seed: int, level: float = 0.4,
                  noise_sigma: float = 600.0) -> np.ndarray:
    """The planted 'same recording, different capture' transform: a
    level drop plus additive Gaussian noise that DOMINATES the signal
    in the time domain (0.4×900 peak vs σ=600) — byte/sample-level
    comparison sees two unrelated vectors; the spectral landmarks
    survive because a sine's FFT gain is N/2·A against the noise's
    √N·σ."""
    rng = np.random.default_rng(seed)
    y = level * np.asarray(samples, dtype=np.float64) + rng.normal(
        0.0, noise_sigma, len(samples)
    )
    return np.clip(np.round(y), -32768, 32767).astype(np.int16)


def make_audiofp_media(spark: SparkSession, n_base: int = 8) -> DataFrame:
    """Audio near-dup media: n_base deterministic melodies, each
    present TWICE — media 2i is the clean recording, media 2i+1 a
    degraded re-capture (0.4× level + σ=600 noise) of the SAME melody.
    True pairs share >=149 landmark hashes, distinct clips <=29 (pinned
    in tests/test_audiofp.py), so the planted truth is exactly the
    (2i, 2i+1) pairs."""
    from pyspec_spark.operators.codecs import encode_wav

    rows = []
    for i in range(n_base):
        clean = synth_melody(i)
        for j, samples in enumerate((clean, degrade_audio(clean, seed=i))):
            rows.append(
                (2 * i + j, "audio", "wav", None, None, len(samples),
                 bytearray(encode_wav(samples)))
            )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


LANDMARK_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("lhash", LongType()),
    ]
)


def audio_landmark_table(media: DataFrame) -> DataFrame:
    """Exploded (media_id, lhash) landmark rows via mapInPandas: decode
    the WAV payload executor-side, fingerprint the first channel
    (operators/audiofp.py); only the bounded hash set leaves the batch
    — the audio analog of the text corpus' shingle/minhash stage."""
    from pyspec_spark.operators.audiofp import audio_landmarks

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                if r["codec"] not in AUDIO_CODECS:
                    continue
                samples, _rate = decode_audio(r["codec"], bytes(r["payload"]))
                for h in sorted(audio_landmarks(samples[:, 0])):
                    out.append({"media_id": int(r["media_id"]), "lhash": h})
            yield pd.DataFrame(
                out, columns=[f.name for f in LANDMARK_SCHEMA.fields]
            )

    return media.mapInPandas(run, LANDMARK_SCHEMA)


def make_mjpeg_media(
    spark: SparkSession, n: int = 6, frames: int = 4, width: int = 16, height: int = 12
) -> DataFrame:
    """Media table of real MJPEG-in-MP4 movies: each sample is a
    baseline JPEG of the deterministic synth_image, muxed behind real
    stsz/stsc/stco tables.  Subsampling alternates 4:4:4 / 4:2:0 per
    media so both JPEG paths are exercised through the demuxer."""
    from pyspec_spark.operators.jpeg import encode_jpeg
    from pyspec_spark.operators.mp4 import make_mjpeg_mp4

    rows = []
    for i in range(n):
        jpegs = [
            encode_jpeg(
                synth_image(i, f, width, height),
                quality=92,
                subsampling="420" if i % 2 else "444",
            )
            for f in range(frames)
        ]
        payload = make_mjpeg_mp4(jpegs, width, height, fps=24.0)
        rows.append(
            (i, "video", "mp4", width, height, frames, bytearray(payload))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def video_metadata(media: DataFrame) -> DataFrame:
    """Typed container metadata for video rows — the r5 answer to the
    mp4 boundary: a mixed crawl's video column yields duration /
    geometry / codec-fourcc ROWS (what curation filters on) without any
    codec library; FRAME decode of transformed/predicted bitstreams
    remains the documented NotImplementedError in decode_frame (MJPEG
    and avc1 I_PCM decode natively).  Runs inside mapInPandas on
    executors; only the parsed metadata (not payloads) leaves the
    batch."""
    from pyspec_spark.operators.mp4 import parse_mp4_metadata

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                if r["codec"] != "mp4":
                    continue
                meta = parse_mp4_metadata(bytes(r["payload"]))
                video = next(
                    (t for t in meta["tracks"] if t["handler"] == "vide"),
                    None,
                )
                out.append(
                    {
                        "media_id": int(r["media_id"]),
                        "codec": r["codec"],
                        "brand": meta["brand"],
                        "duration_s": meta["duration_s"],
                        "track_codec": video and video["codec"],
                        # a vide track without tkhd parses with
                        # width/height None — emit nulls, don't
                        # int(None)-crash the whole batch
                        "track_w": int(video["width"])
                        if video and video["width"] is not None
                        else None,
                        "track_h": int(video["height"])
                        if video and video["height"] is not None
                        else None,
                        "language": video and video["language"],
                        "n_samples": video and video["n_samples"],
                    }
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in VIDEO_META_SCHEMA.fields]
            )

    return media.mapInPandas(run, VIDEO_META_SCHEMA)


def extract_features(
    media: DataFrame, sample_every: int = 2
) -> DataFrame:
    """Frame-sample + per-frame feature extraction (mean/std per RGB
    channel) via mapInPandas — the full multimodal batch shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                n_frames = int(r["n_frames"] or 1)
                for f in range(0, n_frames, sample_every):
                    img = decode_frame(
                        r["codec"], bytes(r["payload"]), int(r["width"]),
                        int(r["height"]), f
                    )
                    feats = np.concatenate(
                        [img.mean(axis=(0, 1)), img.std(axis=(0, 1))]
                    ).astype(np.float64)
                    out.append(
                        {
                            "media_id": int(r["media_id"]),
                            "frame_id": f,
                            "features": feats.tolist(),
                        }
                    )
            yield pd.DataFrame(out, columns=["media_id", "frame_id", "features"])

    return media.mapInPandas(run, FEATURE_SCHEMA)


def rgb_to_ycbcr420(
    img: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """JFIF forward matrix + 2x2 chroma mean subsample — the encode
    inverse of decode_frame's upsample+convert path (dimensions must be
    even, the 4:2:0 contract)."""
    h, w = img.shape[:2]
    if h % 2 or w % 2:
        raise ValueError("rgb_to_ycbcr420: dimensions must be even")
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    def q(p):
        return np.clip(np.round(p), 0, 255).astype(np.uint8)

    def sub(p):
        return q(p.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3)))

    return q(y), sub(cb), sub(cr)


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """REAL resize for the decodable codecs: every frame is decoded,
    nearest-neighbor resampled to (height, width), and re-encoded with
    the same codec inside mapInPandas — payloads never leave their
    executor.  mp4 movies re-mux with their own sample codec (r8/r9):
    MJPEG frames re-encode as baseline JPEGs, avc1 I_PCM frames
    re-encode as I_PCM access units, hvc1 PCM frames re-encode as
    all-PCM IDR slices; other bitstream codecs raise, same boundary
    as decode_frame."""
    from pyspec_spark.operators.codecs import encode_pgm, encode_png, encode_ppm

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                codec = r["codec"]
                n_frames = int(r["n_frames"] or 1)
                frames = []
                for f in range(n_frames):
                    img = decode_frame(
                        codec, bytes(r["payload"]), int(r["width"]),
                        int(r["height"]), f
                    )
                    ry = (np.arange(height) * img.shape[0]) // height
                    rx = (np.arange(width) * img.shape[1]) // width
                    frames.append(img[ry][:, rx])
                if codec == "png":
                    payload = b"".join(encode_png(fr) for fr in frames)
                elif codec == "ppm":
                    payload = b"".join(encode_ppm(fr) for fr in frames)
                elif codec == "pgm":
                    # pgm decode replicates gray into RGB; channel 0 is it
                    payload = b"".join(encode_pgm(fr[:, :, 0]) for fr in frames)
                elif codec == "jpeg":
                    from pyspec_spark.operators.jpeg import encode_jpeg

                    # lossy re-encode at high quality, same policy as any
                    # real image pipeline's jpeg->jpeg resize
                    payload = b"".join(encode_jpeg(fr, quality=95) for fr in frames)
                elif codec == "mp4":
                    from pyspec_spark.operators.mp4 import (
                        make_avc_ipcm_mp4,
                        make_mjpeg_mp4,
                        parse_mp4_metadata,
                    )

                    meta = parse_mp4_metadata(bytes(r["payload"]))
                    video = next(
                        t for t in meta["tracks"] if t["handler"] == "vide"
                    )
                    if video["codec"] in ("jpeg", "mjpa"):
                        from pyspec_spark.operators.jpeg import encode_jpeg

                        payload = make_mjpeg_mp4(
                            [encode_jpeg(fr, quality=95) for fr in frames],
                            width,
                            height,
                        )
                    elif video["codec"] == "avc1":
                        # the frames decoded, so the stream was I_PCM:
                        # re-encode losslessly modulo the 4:2:0 colorspace
                        payload = make_avc_ipcm_mp4(
                            [rgb_to_ycbcr420(fr) for fr in frames],
                            width,
                            height,
                        )
                    elif video["codec"] == "hvc1":
                        # same contract (r9): decoded means all-PCM, so
                        # the re-mux is lossless modulo 4:2:0
                        from pyspec_spark.operators.mp4 import (
                            make_hevc_ipcm_mp4,
                        )

                        payload = make_hevc_ipcm_mp4(
                            [rgb_to_ycbcr420(fr) for fr in frames],
                            width,
                            height,
                        )
                    else:
                        raise NotImplementedError(
                            f"resize for mp4 sample codec {video['codec']!r}: "
                            "no encoder available"
                        )
                else:
                    raise NotImplementedError(
                        f"resize for codec {codec!r}: no encoder available"
                    )
                out.append(
                    {
                        "media_id": int(r["media_id"]),
                        "kind": r["kind"],
                        "codec": codec,
                        "width": width,
                        "height": height,
                        "n_frames": n_frames,
                        "payload": bytearray(payload),
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "kind", "codec", "width", "height",
                    "n_frames", "payload",
                ],
            )

    return media.mapInPandas(run, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# avc1 I_PCM frame decode (r8) — the long-documented H.264 frame-decode
# boundary narrowed from per-codec to per-macroblock: IDR/I_PCM access
# units (raw byte-aligned samples, operators/h264.py) decode natively
# and EXACTLY; transformed/predicted macroblocks still raise the
# contract NotImplementedError inside decode_ipcm_idr.
# ---------------------------------------------------------------------------
def ipcm_pattern(
    media_id: int, frame_id: int, width: int, height: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Closed-form YCbCr 4:2:0 planes (values 1..254 — integer modular
    patterns an SQL oracle replays exactly; chroma generated AT half
    resolution so the 4:2:0 round-trip is lossless)."""
    xx, yy = np.meshgrid(np.arange(width), np.arange(height))
    y = ((xx * 7 + yy * 13 + media_id * 31 + frame_id * 17) % 254 + 1).astype(
        np.uint8
    )
    cxx, cyy = np.meshgrid(np.arange(width // 2), np.arange(height // 2))
    cb = ((cxx * 5 + cyy * 11 + media_id * 7 + frame_id * 3) % 254 + 1).astype(
        np.uint8
    )
    cr = ((cxx * 3 + cyy * 7 + media_id * 13 + frame_id * 5) % 254 + 1).astype(
        np.uint8
    )
    return y, cb, cr


def make_avc_ipcm_media(
    spark: SparkSession, n: int = 4, frames: int = 2
) -> DataFrame:
    """Media table of real avc1 movies whose samples are decodable
    IDR/I_PCM access units; dimensions are non-16-multiples so the SPS
    crop is load-bearing at decode."""
    from pyspec_spark.operators.mp4 import make_avc_ipcm_mp4

    rows = []
    for i in range(n):
        w, h = 44 + 4 * i, 28 + 4 * i
        planes = [ipcm_pattern(i, f, w, h) for f in range(frames)]
        payload = make_avc_ipcm_mp4(planes, w, h)
        rows.append((i, "video", "mp4", w, h, frames, bytearray(payload)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_avc_ipcm_sample(
    sample: bytes, width: int, height: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One avc1 sample (4-byte-length-prefixed NALs, lengthSizeMinusOne=3)
    -> cropped (y, cb, cr).  Non-VCL NALs (SPS/PPS/SEI riding in-band)
    are skipped; the first slice NAL decodes."""
    import struct as _struct

    from pyspec_spark.operators.h264 import decode_ipcm_idr

    mbs_w, mbs_h = (width + 15) // 16, (height + 15) // 16
    pos = 0
    while pos + 4 <= len(sample):
        (ln,) = _struct.unpack_from(">I", sample, pos)
        nal = sample[pos + 4 : pos + 4 + ln]
        pos += 4 + ln
        if nal and (nal[0] & 0x1F) in (1, 5):
            y, cb, cr = decode_ipcm_idr(nal, mbs_w, mbs_h)
            return (
                y[:height, :width],
                cb[: height // 2, : width // 2],
                cr[: height // 2, : width // 2],
            )
    raise ValueError("avc1 sample holds no slice NAL")


def make_hevc_ipcm_media(
    spark: SparkSession, n: int = 4, frames: int = 2
) -> DataFrame:
    """Media table of real hvc1 movies whose samples are decodable
    IDR/PCM access units (r9 hvc1 twin of make_avc_ipcm_media);
    dimensions are non-16-multiples so the SPS conformance window is
    load-bearing at decode."""
    from pyspec_spark.operators.mp4 import make_hevc_ipcm_mp4

    rows = []
    for i in range(n):
        w, h = 36 + 4 * i, 24 + 4 * i
        planes = [ipcm_pattern(i, f, w, h) for f in range(frames)]
        payload = make_hevc_ipcm_mp4(planes, w, h)
        rows.append((i, "video", "mp4", w, h, frames, bytearray(payload)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_hevc_ipcm_sample(
    sample: bytes, width: int, height: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One hvc1 sample (4-byte-length-prefixed NALs,
    lengthSizeMinusOne=3) -> windowed (y, cb, cr).  Non-VCL NALs
    (parameter sets/SEI riding in-band) are skipped; the first VCL NAL
    decodes through the CABAC-framed PCM path."""
    import struct as _struct

    from pyspec_spark.operators.h265 import decode_pcm_islice

    ctbs_w, ctbs_h = (width + 15) // 16, (height + 15) // 16
    pos = 0
    while pos + 4 <= len(sample):
        (ln,) = _struct.unpack_from(">I", sample, pos)
        nal = sample[pos + 4 : pos + 4 + ln]
        pos += 4 + ln
        if nal and ((nal[0] >> 1) & 0x3F) <= 31:   # VCL NAL types 0..31
            y, cb, cr = decode_pcm_islice(nal, ctbs_w, ctbs_h)
            return (
                y[:height, :width],
                cb[: height // 2, : width // 2],
                cr[: height // 2, : width // 2],
            )
    raise ValueError("hvc1 sample holds no slice NAL")
