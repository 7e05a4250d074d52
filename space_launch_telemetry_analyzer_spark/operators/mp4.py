"""ISO BMFF / MP4 container probe: duration, dimensions, track layout and
codec fourcc straight from the box structure — no codec decode.

This is the engine-side analog of the reference's video property read
(/root/reference/processing/video_processing/main_processing.py:56-58:
cv2.CAP_PROP_FPS / FRAME_COUNT before processing, and validation.py's
openability probe): a crawl pipeline needs duration/dims/codec for every
video BLOB it meets, at header-read cost, long before it decides what to
decode. Pure stdlib parsing of the ISO 14496-12 box grammar:

- boxes are [u32 size][4cc type][payload]; size==1 -> u64 largesize
  follows; size==0 -> box extends to end of enclosing scope;
- `moov > mvhd` carries timescale + duration (v0: u32s, v1: u64s);
- `moov > trak > tkhd` carries the track's 16.16-fixed width/height;
- `moov > trak > mdia > hdlr` names the handler (vide/soun/...);
- `moov > trak > mdia > mdhd` carries the MEDIA timescale;
- `... > minf > stbl > stsd` lists sample entries whose 4cc is the codec;
- `... > stbl > stts` (decoding time-to-sample) gives the frame count
  (sum of entry counts) and, with mdhd's timescale, the average fps —
  the literal cv2.CAP_PROP_FPS / CAP_PROP_FRAME_COUNT pair.

`make_mp4` is the deterministic sink twin (builds the same subset), so
probe semantics are pinned end-to-end without any media library.
Malformed boxes raise ValueError into the operators' row-level error
channel. Scale shape: the distributed probe (multimodal.media_probe)
column-prunes to (id, payload) and never shuffles; at crawl scale the
probe reads only header bytes of each blob.
"""

from __future__ import annotations

import struct

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _iter_boxes(buf: bytes, pos: int, end: int):
    """Yield (type, payload_start, payload_end) over one box scope."""
    while pos + 8 <= end:
        size = struct.unpack(">I", buf[pos:pos + 4])[0]
        btype = buf[pos + 4:pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated mp4 largesize box")
            size = struct.unpack(">Q", buf[pos + 8:pos + 16])[0]
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError("mp4 box overruns its scope")
        yield btype, pos + hdr, pos + size
        pos += size


def parse_mp4(payload: bytes) -> dict:
    """Probe an MP4/ISO-BMFF payload: {major_brand, timescale,
    duration_ms, n_tracks, video_codec, audio_codec, width, height}.
    width/height come from the FIRST video track's tkhd (16.16 fixed,
    truncated to int); codecs from the first stsd entry of the first
    track of each handler kind; missing pieces are None."""
    if len(payload) < 8:
        raise ValueError("not an mp4: too short")
    out: dict = {
        "major_brand": None, "timescale": None, "duration_ms": None,
        "n_tracks": 0, "video_codec": None, "audio_codec": None,
        "width": None, "height": None, "n_frames": None, "fps": None,
    }
    saw_box = False

    def walk(pos: int, end: int, ctx: dict) -> None:
        nonlocal saw_box
        for btype, ps, pe in _iter_boxes(payload, pos, end):
            saw_box = True
            if btype == b"ftyp":
                if pe - ps >= 4 and out["major_brand"] is None:
                    out["major_brand"] = payload[ps:ps + 4].decode(
                        "latin-1").strip()
            elif btype == b"mvhd":
                if pe - ps < 4:
                    raise ValueError("truncated mvhd")
                ver = payload[ps]
                if ver == 1:
                    if pe - ps < 32:
                        raise ValueError("truncated mvhd v1")
                    ts, dur = struct.unpack(">IQ", payload[ps + 20:ps + 32])
                else:
                    if pe - ps < 24:
                        raise ValueError("truncated mvhd v0")
                    ts, dur = struct.unpack(">II", payload[ps + 12:ps + 20])
                out["timescale"] = ts
                out["duration_ms"] = int(dur * 1000 // ts) if ts else None
            elif btype == b"trak":
                out["n_tracks"] += 1
                tctx = {"kind": None, "w": None, "h": None, "codec": None,
                        "media_ts": None, "n_samples": None, "ticks": None}
                walk(ps, pe, tctx)
                if tctx["kind"] == "vide":
                    if out["video_codec"] is None:
                        out["video_codec"] = tctx["codec"]
                    if out["width"] is None:
                        out["width"] = tctx["w"]
                        out["height"] = tctx["h"]
                    if (out["n_frames"] is None
                            and tctx["n_samples"] is not None):
                        out["n_frames"] = tctx["n_samples"]
                        if tctx["media_ts"] and tctx["ticks"]:
                            out["fps"] = (
                                tctx["media_ts"] * tctx["n_samples"]
                            ) / tctx["ticks"]
                elif tctx["kind"] == "soun" and out["audio_codec"] is None:
                    out["audio_codec"] = tctx["codec"]
                continue
            elif btype == b"tkhd" and ctx is not None:
                ver = payload[ps] if pe > ps else 0
                # spec payload sizes (ISO 14496-12 §8.3.2): v0 = 84
                # (4 ver/flags + 20 times/id/dur + 16 layer block
                # + 36 matrix + 8 w/h), v1 = 96 (64-bit times)
                need = 96 if ver == 1 else 84
                if pe - ps < need:
                    raise ValueError("truncated tkhd")
                w_fix, h_fix = struct.unpack(">II", payload[pe - 8:pe])
                ctx["w"], ctx["h"] = w_fix >> 16, h_fix >> 16
            elif btype == b"hdlr" and ctx is not None:
                if pe - ps >= 12:
                    ctx["kind"] = payload[ps + 8:ps + 12].decode("latin-1")
            elif btype == b"mdhd" and ctx is not None:
                ver = payload[ps] if pe > ps else 0
                off, need = (20, 32) if ver == 1 else (12, 24)
                if pe - ps < need:
                    raise ValueError("truncated mdhd")
                ctx["media_ts"] = struct.unpack(
                    ">I", payload[ps + off:ps + off + 4])[0]
            elif btype == b"stts" and ctx is not None:
                if pe - ps < 8:
                    raise ValueError("truncated stts")
                n_ent = struct.unpack(">I", payload[ps + 4:ps + 8])[0]
                if pe - ps < 8 + 8 * n_ent:
                    raise ValueError("stts entries overrun the box")
                n_samples = 0
                ticks = 0
                for k in range(n_ent):
                    c, d = struct.unpack(
                        ">II", payload[ps + 8 + 8 * k:ps + 16 + 8 * k])
                    n_samples += c
                    ticks += c * d
                ctx["n_samples"] = n_samples
                ctx["ticks"] = ticks
            elif btype == b"stsd" and ctx is not None:
                if pe - ps >= 16:
                    ctx["codec"] = payload[ps + 12:ps + 16].decode(
                        "latin-1").strip()
            if btype in _CONTAINERS and btype != b"trak":
                walk(ps, pe, ctx)

    walk(0, len(payload), None)
    if not saw_box or out["major_brand"] is None:
        raise ValueError("not an mp4: no ftyp box")
    return out


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def make_mp4(
    timescale: int,
    duration: int,
    width: int,
    height: int,
    video_codec: str = "avc1",
    audio_codec: str | None = None,
    major_brand: str = "isom",
    media_timescale: int | None = None,
    frame_deltas: list | None = None,
) -> bytes:
    """Deterministic minimal MP4 (the sink twin of parse_mp4): ftyp + moov
    with mvhd and one video trak (tkhd dims, hdlr vide, stsd codec), plus
    an optional audio trak. `media_timescale` + `frame_deltas`
    [(count, delta_ticks), ...] add an mdhd + stts pair to the video trak
    so fps/n_frames probe back out. Media data (mdat) is intentionally
    absent — the probe reads structure, not samples."""
    ftyp = _box(b"ftyp", major_brand.encode("latin-1").ljust(4) +
                struct.pack(">I", 0) + b"isom")
    mvhd = _box(b"mvhd", bytes(4) + struct.pack(">II", 0, 0) +
                struct.pack(">II", timescale, duration) + bytes(80))

    def trak(kind: str, codec: str, w: int, h: int, timed: bool) -> bytes:
        # spec-exact v0 tkhd: 76 bytes of ver/flags, times, track id,
        # duration, layer block and identity-free matrix before w/h = 84
        tkhd = _box(b"tkhd", bytes(76) +
                    struct.pack(">II", w << 16, h << 16))
        entry = _box(codec.encode("latin-1").ljust(4)[:4].replace(b"\x00", b" "),
                     bytes(8))
        stbl_body = _box(b"stsd", bytes(4) + struct.pack(">I", 1) + entry)
        mdia_body = _box(b"hdlr", bytes(8) + kind.encode("latin-1")
                         + bytes(13))
        if timed and media_timescale is not None:
            mdia_body += _box(b"mdhd", bytes(4) + struct.pack(">II", 0, 0)
                              + struct.pack(">II", media_timescale, 0)
                              + bytes(4))
            if frame_deltas:
                stts = bytes(4) + struct.pack(">I", len(frame_deltas))
                for c, d in frame_deltas:
                    stts += struct.pack(">II", c, d)
                stbl_body += _box(b"stts", stts)
        minf = _box(b"minf", _box(b"stbl", stbl_body))
        mdia = _box(b"mdia", mdia_body + minf)
        return _box(b"trak", tkhd + mdia)

    traks = trak("vide", video_codec, width, height, True)
    if audio_codec is not None:
        traks += trak("soun", audio_codec, 0, 0, False)
    return ftyp + _box(b"moov", mvhd + traks)
