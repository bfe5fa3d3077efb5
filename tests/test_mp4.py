"""MP4 / ISO-BMFF metadata parser tests — operators/mp4.py (r5).

Golden strategy: the synthesizer emits metadata as a closed form of its
arguments; the parser must invert it exactly through real bytes.  The
corrupt-input cases pin the ValueError boundary (never a silent partial
parse), and hand-built v1 / largesize boxes cover the layouts the
synthesizer itself doesn't emit."""

from __future__ import annotations

import struct

import pytest

from pyspec_spark.operators.mp4 import (
    _box,
    iter_boxes,
    make_minimal_mp4,
    parse_mp4_metadata,
)


def test_roundtrip_goldens():
    data = make_minimal_mp4(
        width=320, height=240, duration_s=7.25, timescale=4000,
        codec="av01", n_samples=29, language="deu",
    )
    meta = parse_mp4_metadata(data)
    assert meta["brand"] == "isom"
    assert meta["compatible_brands"] == ["isom", "iso2"]
    assert meta["timescale"] == 4000
    assert meta["duration_s"] == 7.25
    (t,) = meta["tracks"]
    assert t["track_id"] == 1
    assert t["handler"] == "vide"
    assert t["codec"] == "av01"
    assert (t["width"], t["height"]) == (320.0, 240.0)
    assert t["duration_s"] == 7.25
    assert t["language"] == "deu"
    assert t["n_samples"] == 29


def test_box_walk_structure():
    data = make_minimal_mp4()
    tops = [fc for fc, _, _ in iter_boxes(data)]
    assert tops == ["ftyp", "moov", "mdat"]


def test_version1_boxes():
    """v1 mvhd/mdhd carry 64-bit times; the parser must read them."""
    ts, dur = 90_000, 90_000 * 3
    mvhd_v1 = _box(
        "mvhd",
        struct.pack(">I", 1 << 24)
        + struct.pack(">QQ", 0, 0)
        + struct.pack(">IQ", ts, dur)
        + struct.pack(">I", 0x00010000)
        + struct.pack(">H", 0x0100) + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    moov = _box("moov", mvhd_v1)
    meta = parse_mp4_metadata(_box("ftyp", b"isom" + b"\x00" * 4) + moov)
    assert meta["timescale"] == ts and meta["duration_s"] == 3.0


def test_largesize_box():
    """size==1 -> u64 largesize header variant."""
    body = b"isom" + b"\x00" * 4
    big = (
        struct.pack(">I", 1) + b"ftyp" + struct.pack(">Q", 16 + len(body))
        + body
    )
    data = make_minimal_mp4()
    moov_start = data.index(b"moov") - 4
    fcs = [fc for fc, _, _ in iter_boxes(big + data[moov_start:])]
    assert fcs[0] == "ftyp"


def test_corrupt_boxes_raise():
    data = make_minimal_mp4()
    # truncated mid-box
    with pytest.raises(ValueError, match="overruns|truncated"):
        parse_mp4_metadata(data[: len(data) // 2])
    # size < 8
    bad = bytearray(data)
    bad[0:4] = struct.pack(">I", 4)
    with pytest.raises(ValueError, match="too small"):
        parse_mp4_metadata(bytes(bad))
    # declared size overruns the file
    bad = bytearray(data)
    bad[0:4] = struct.pack(">I", len(data) + 64)
    with pytest.raises(ValueError, match="overruns"):
        parse_mp4_metadata(bytes(bad))
    # no moov at all
    with pytest.raises(ValueError, match="moov"):
        parse_mp4_metadata(_box("ftyp", b"isom" + b"\x00" * 4))


def test_video_metadata_dataframe(spark):
    """The mapInPandas wrapper: typed metadata rows for a media table
    of real mp4 bytes; non-mp4 rows are ignored, payloads never
    collected."""
    from pyspec_spark.operators.multimodal import (
        make_mixed_media,
        make_video_media,
        video_metadata,
    )

    vids = make_video_media(spark, n=4)
    rows = {r["media_id"]: r for r in video_metadata(vids).collect()}
    assert set(rows) == {0, 1, 2, 3}
    assert rows[2]["track_codec"] == "av01"
    assert rows[2]["track_w"] == 96 and rows[2]["track_h"] == 72
    assert rows[3]["duration_s"] == 2.5 and rows[3]["n_samples"] == 96
    # a mixed (image-only) table yields no video-metadata rows
    assert video_metadata(make_mixed_media(spark, n=6)).count() == 0


def test_truncated_tkhd_raises_value_error():
    """A structurally valid but short tkhd must raise the documented
    ValueError, not read sibling bytes or die with struct.error."""
    import struct

    import pytest

    from pyspec_spark.operators.mp4 import (
        _box,
        make_minimal_mp4,
        parse_mp4_metadata,
    )

    good = make_minimal_mp4()
    # locate the tkhd box and shrink its declared body to 8 bytes
    i = good.index(b"tkhd") - 4
    (size,) = struct.unpack(">I", good[i : i + 4])
    short_tkhd = _box("tkhd", good[i + 8 : i + 16])  # 8-byte body
    # rebuild: replace tkhd with the short one, fixing ancestor sizes
    # by re-synthesizing is complex — instead parse a hand-built moov
    mvhd_body = good[good.index(b"mvhd") + 4 : good.index(b"mvhd") + 4 + 100]
    moov = _box("moov", _box("mvhd", mvhd_body) + _box("trak", short_tkhd))
    data = _box("ftyp", b"isom\x00\x00\x02\x00isom") + moov
    with pytest.raises(ValueError, match="tkhd box too short"):
        parse_mp4_metadata(data)


def test_truncated_stsz_and_hdlr_raise():
    import pytest

    from pyspec_spark.operators.mp4 import _box, parse_mp4_metadata

    mvhd = _box("mvhd", b"\x00" + b"\x00" * 3 + b"\x00" * 8 +
                (1000).to_bytes(4, "big") + (5000).to_bytes(4, "big") + b"\x00" * 80)
    hdlr_short = _box("hdlr", b"\x00" * 8)  # needs 12
    mdia = _box("mdia", hdlr_short)
    moov = _box("moov", mvhd + _box("trak", mdia))
    with pytest.raises(ValueError, match="hdlr box too short"):
        parse_mp4_metadata(moov)


def test_video_metadata_survives_track_without_tkhd(spark):
    """A vide track with no tkhd (width/height unknown) must yield null
    dims, not kill the Spark batch with int(None)."""
    from pyspec_spark.operators.mp4 import _box
    from pyspec_spark.operators.multimodal import video_metadata

    mvhd = _box(
        "mvhd",
        b"\x00" * 4 + b"\x00" * 8
        + (1000).to_bytes(4, "big") + (5000).to_bytes(4, "big")
        + b"\x00" * 80,
    )
    hdlr = _box("hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 12)
    moov = _box("moov", mvhd + _box("trak", _box("mdia", hdlr)))
    media = spark.createDataFrame(
        [(1, "mp4", bytearray(moov))], "media_id long, codec string, payload binary"
    )
    rows = video_metadata(media).collect()
    assert len(rows) == 1
    assert rows[0]["track_w"] is None and rows[0]["track_h"] is None
    assert rows[0]["duration_s"] == 5.0


def test_mp4_parser_fuzz_never_crashes_unstructured():
    """Byte-mutation fuzz over a valid movie: every mutation must
    either parse cleanly or raise ValueError — the parser's documented
    contract — never IndexError/struct.error/KeyError.  Exercises the
    r5 bounds guards (_need) under arbitrary size-field corruption."""
    import random

    from pyspec_spark.operators.mp4 import make_minimal_mp4, parse_mp4_metadata

    base = bytearray(make_minimal_mp4())
    rng = random.Random(1234)
    outcomes = {"ok": 0, "value_error": 0}
    for _ in range(400):
        data = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            pos = rng.randrange(len(data))
            data[pos] = rng.randrange(256)
        try:
            parse_mp4_metadata(bytes(data))
            outcomes["ok"] += 1
        except ValueError:
            outcomes["value_error"] += 1
        # any other exception propagates and fails the test
    # both outcomes must actually occur (the fuzz is biting)
    assert outcomes["ok"] > 0 and outcomes["value_error"] > 0, outcomes


def test_mp4_parser_fuzz_truncations():
    """Every prefix-truncation of a valid movie parses or raises
    ValueError (the classic cut-upload shape)."""
    from pyspec_spark.operators.mp4 import make_minimal_mp4, parse_mp4_metadata

    base = make_minimal_mp4()
    for cut in range(0, len(base), 7):
        try:
            parse_mp4_metadata(base[:cut])
        except ValueError:
            pass
