"""MP4/ISO-BMFF probe: box grammar, version variants, malformed inputs,
distributed operator error channel."""

from __future__ import annotations

import struct

import pytest

from space_launch_telemetry_analyzer_spark.operators import multimodal as M
from space_launch_telemetry_analyzer_spark.operators.mp4 import (
    _box,
    make_mp4,
    parse_mp4,
)


def test_roundtrip_video_and_audio():
    d = parse_mp4(make_mp4(1000, 95000, 384, 272, "hvc1", "mp4a", "mp42"))
    assert d == {"major_brand": "mp42", "timescale": 1000,
                 "duration_ms": 95000, "n_tracks": 2, "video_codec": "hvc1",
                 "audio_codec": "mp4a", "width": 384, "height": 272,
                 "n_frames": None, "fps": None}


def test_duration_scaling_and_video_only():
    d = parse_mp4(make_mp4(90000, 123456, 320, 240))
    assert d["duration_ms"] == 123456 * 1000 // 90000
    assert d["n_tracks"] == 1 and d["audio_codec"] is None
    assert d["video_codec"] == "avc1"


def test_mvhd_v1_and_largesize_box():
    # hand-build an mvhd v1 (64-bit times) inside a largesize moov
    mvhd = _box(b"mvhd", bytes((1, 0, 0, 0)) + struct.pack(">QQ", 0, 0)
                + struct.pack(">IQ", 48000, 96000) + bytes(80))
    moov_payload = mvhd
    moov = (struct.pack(">I", 1) + b"moov"
            + struct.pack(">Q", 16 + len(moov_payload)) + moov_payload)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    d = parse_mp4(ftyp + moov)
    assert d["timescale"] == 48000 and d["duration_ms"] == 2000
    assert d["n_tracks"] == 0 and d["width"] is None


def test_size_zero_box_extends_to_eof():
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    mvhd = _box(b"mvhd", bytes(4) + struct.pack(">II", 0, 0)
                + struct.pack(">II", 1000, 5000) + bytes(80))
    moov = struct.pack(">I", 0) + b"moov" + mvhd  # size 0 = to EOF
    d = parse_mp4(ftyp + moov)
    assert d["duration_ms"] == 5000


def test_malformed_inputs_raise_valueerror():
    with pytest.raises(ValueError, match="too short"):
        parse_mp4(b"\x00")
    with pytest.raises(ValueError, match="no ftyp"):
        parse_mp4(_box(b"free", b""))
    with pytest.raises(ValueError, match="overruns"):
        parse_mp4(b"\xff\xff\xff\xffftypisom")
    with pytest.raises(ValueError, match="truncated mvhd"):
        ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
        parse_mp4(ftyp + _box(b"moov", _box(b"mvhd", bytes(8))))
    # non-mp4 magic: sizes read as garbage -> ValueError, never crash
    for junk in (b"GIF89a..", b"\x89PNG\r\n\x1a\nXXXX", b"RIFF1234WEBP"):
        with pytest.raises(ValueError):
            parse_mp4(junk)


def test_first_video_track_wins():
    # splice a second video trak (different dims/codec) into the moov:
    # take the trak box out of another make_mp4 file and append it
    v1 = make_mp4(1000, 1000, 100, 50, "avc1")
    v2 = make_mp4(1000, 1000, 640, 480, "hvc1")
    # moov is the last top-level box; its first child is the 108+8-byte
    # mvhd, after which the trak box runs to the end
    def moov_span(buf):
        import struct as _s
        pos = 0
        while pos < len(buf):
            size = _s.unpack(">I", buf[pos:pos + 4])[0]
            if buf[pos + 4:pos + 8] == b"moov":
                return pos, pos + size
            pos += size
        raise AssertionError("no moov")
    import struct as _s
    ms, me = moov_span(v2)
    mvhd_size = _s.unpack(">I", v2[ms + 8:ms + 12])[0]
    second_trak = v2[ms + 8 + mvhd_size:me]
    s1, e1 = moov_span(v1)
    spliced = (v1[:e1] + second_trak)
    # regrow the moov size to include the splice
    spliced = (spliced[:s1]
               + _s.pack(">I", e1 - s1 + len(second_trak))
               + spliced[s1 + 4:])
    d = parse_mp4(spliced)
    assert d["n_tracks"] == 2
    # FIRST video track wins for dims and codec
    assert (d["width"], d["height"], d["video_codec"]) == (100, 50, "avc1")


def test_mvhd_v1_truncated_raises():
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    # v1 mvhd with a 28-byte payload (4 short of the 32 the fields need)
    bad = _box(b"mvhd", bytes((1, 0, 0, 0)) + bytes(24))
    with pytest.raises(ValueError, match="truncated mvhd v1"):
        parse_mp4(ftyp + _box(b"moov", bad))


def test_tkhd_spec_payload_length():
    # the sink twin must emit the ISO 14496-12 v0 tkhd payload size (84)
    buf = make_mp4(1000, 1000, 12, 34)
    i = buf.find(b"tkhd")
    size = struct.unpack(">I", buf[i - 4:i])[0]
    assert size == 8 + 84
    # and a truncated 80-byte real-world tkhd must raise, not mis-read
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    trak = _box(b"trak", _box(b"tkhd", bytes(80)))
    with pytest.raises(ValueError, match="truncated tkhd"):
        parse_mp4(ftyp + _box(b"moov", trak))


def test_media_probe_operator_error_channel(spark):
    rows = [(1, bytearray(make_mp4(1000, 7000, 64, 32, "vp09"))),
            (2, bytearray(b"not a container")),
            (3, None)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in
           M.media_probe(df, "media_id", "payload").collect()}
    assert got[1]["duration_ms"] == 7000 and got[1]["video_codec"] == "vp09"
    assert got[1]["error"] is None
    assert got[2]["error"] is not None and got[2]["width"] is None
    assert got[3]["error"] == "ValueError: null payload"


def test_fps_and_frame_count_from_stts():
    # constant frame duration: 120 frames of 25 ticks at media ts 600
    d = parse_mp4(make_mp4(1000, 5000, 320, 240, media_timescale=600,
                           frame_deltas=[(100, 25), (20, 25)]))
    assert d["n_frames"] == 120 and d["fps"] == 24.0
    # variable frame durations average out
    d2 = parse_mp4(make_mp4(1000, 5000, 320, 240, media_timescale=90000,
                            frame_deltas=[(50, 3000), (50, 3750)]))
    assert d2["n_frames"] == 100
    assert d2["fps"] == 90000 * 100 / (50 * 3000 + 50 * 3750)
    # stts whose declared entries overrun the box -> ValueError
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    bad_stts = _box(b"stts", bytes(4) + struct.pack(">I", 9))
    trak = _box(b"trak", _box(b"mdia", _box(
        b"hdlr", bytes(8) + b"vide" + bytes(13)) + _box(
        b"minf", _box(b"stbl", bad_stts))))
    with pytest.raises(ValueError, match="stts entries overrun"):
        parse_mp4(ftyp + _box(b"moov", trak))
