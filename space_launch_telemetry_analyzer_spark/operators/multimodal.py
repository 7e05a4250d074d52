"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side machinery — schema, partitioning, Arrow batch shape, UDF
signatures — is real and tested. The codec layer: PNG decodes FOR REAL
(pure stdlib zlib + numpy unfiltering — `decode_png` below handles 8-bit
gray/RGB/palette/alpha, all five scanline filters); JPEG and the other
formats stay STUBBED (their codecs aren't stdlib and the sandbox has no
image libraries): for them `decode_image` raises NotImplementedError
unless `fake=True`, in which case a deterministic fake decoder produces
stable per-payload features so the distributed plumbing can be exercised
end-to-end. `encode_png` is the matching sink (filter-0 scanlines), so
image bytes can be both produced and consumed without any external lib.

Scale notes: binary payloads dominate row size, so the operators here
aggressively column-prune before the Python stage, bound Arrow batch bytes
(maxRecordsPerBatch in session.py), and emit fixed-size feature vectors so
downstream joins/aggs never carry the blobs.
"""

from __future__ import annotations

import hashlib
import struct as _struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_DDL = (
    "media_id long, kind string, n_bytes long, sha256 string, magic string"
)
IMAGE_FEATURES_DDL = (
    "media_id long, width int, height int, channels int, mean_luma double, "
    "feature array<float>, error string"
)
FRAME_SAMPLE_DDL = "media_id long, frame_idx int, frame_sha256 string"

_MAGIC = {
    b"\x89PNG": "png", b"\xff\xd8\xff": "jpeg", b"GIF8": "gif",
    b"RIFF": "riff", b"\x00\x00\x00": "mp4ish", b"ID3": "mp3", b"OggS": "ogg",
    b"%PDF": "pdf",
}


def sniff_magic(payload: bytes | None) -> str:
    if not payload:
        return "empty"
    for prefix, name in _MAGIC.items():
        if payload[: len(prefix)] == prefix:
            return name
    return "unknown"


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# channels per PNG color type (3 = palette: 1 index byte -> 3 RGB via PLTE)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunks(payload: bytes):
    """(type, data) chunks of a PNG byte string; validates signature and
    framing (length fields), not CRCs (corrupt data fails in zlib/shape
    checks anyway — CRC-strictness buys nothing for a feature pipeline)."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    while pos + 8 <= len(payload):
        (length,) = _struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if len(data) < length:
            raise ValueError("truncated PNG chunk")
        yield ctype, data
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return
    raise ValueError("PNG missing IEND")


def _png_unfilter(raw: bytes, width: int, height: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering -> (height, width*bpp) uint8 array.
    Filters 0/2 are pure numpy; 1 (Sub) is a per-byte-lane cumsum; 3/4
    (Average/Paeth) fall back to a per-byte loop — row-local, and rare in
    practice for the small fixtures this in-sandbox path serves."""
    stride = width * bpp
    if len(raw) < height * (1 + stride):
        raise ValueError("IDAT too short for declared dimensions")
    out = np.zeros((height, stride), dtype=np.uint8)
    zero_row = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        base = y * (1 + stride)
        ftype = raw[base]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=base + 1)
        prev = out[y - 1] if y else zero_row
        if ftype == 0:  # None
            out[y] = line
        elif ftype == 2:  # Up
            out[y] = line + prev  # uint8 arithmetic wraps mod 256
        elif ftype == 1:  # Sub: recon[x] = line[x] + recon[x-bpp]
            for k in range(bpp):
                out[y, k::bpp] = np.cumsum(line[k::bpp], dtype=np.uint64) & 0xFF
        elif ftype == 3:  # Average
            row = out[y]
            for x in range(stride):
                a = int(row[x - bpp]) if x >= bpp else 0
                row[x] = (int(line[x]) + ((a + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            row = out[y]
            for x in range(stride):
                a = int(row[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return out


def decode_png(payload: bytes) -> dict:
    """Real pure-stdlib PNG decode: dimensions, channels, Rec.601 mean
    luma, and a 4x4 block-mean luma grid as the 16-dim feature vector.
    Supports bit depth 8, color types 0/2/3/4/6, non-interlaced — the
    overwhelmingly common web case; 16-bit and Adam7 raise ValueError into
    the row-level error channel. Returns the same dict shape as
    decode_image's fake path plus 'luma_sum' (exact integer sum of the
    rounded per-pixel luma — integer, so oracles can check it bitwise)."""
    ihdr = None
    plte = None
    idat = bytearray()
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat += data
    if ihdr is None or len(ihdr) < 13:
        raise ValueError("PNG missing IHDR")
    width, height, depth, color_type, comp, filt, interlace = _struct.unpack(
        ">IIBBBBB", ihdr[:13]
    )
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth} (only 8)")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"unknown PNG color type {color_type}")
    if comp != 0 or filt != 0:
        raise ValueError("nonstandard PNG compression/filter method")
    if interlace != 0:
        raise ValueError("unsupported: Adam7 interlaced PNG")
    if width == 0 or height == 0:
        raise ValueError("zero-dimension PNG")
    bpp = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    px = _png_unfilter(raw, width, height, bpp)

    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8)
        pal = pal[: (len(pal) // 3) * 3].reshape(-1, 3)
        rgb = pal[px.reshape(height, width)].astype(np.float64)
        luma = rgb @ np.array([0.299, 0.587, 0.114])
        channels = 3
    else:
        px = px.reshape(height, width, bpp).astype(np.float64)
        channels = bpp
        if color_type in (0, 4):
            luma = px[:, :, 0]
        else:  # 2 (RGB) / 6 (RGBA): luma from the color channels
            luma = px[:, :, :3] @ np.array([0.299, 0.587, 0.114])

    luma_round = np.rint(luma).astype(np.int64)
    # 4x4 block-mean grid (blocks sized by index // ceil-split; images
    # smaller than 4 px reuse rows/cols — deterministic either way)
    ys = np.array_split(np.arange(height), min(4, height))
    xs = np.array_split(np.arange(width), min(4, width))
    grid = [
        float(luma[np.ix_(yb, xb)].mean() / 255.0)
        for yb in ys for xb in xs
    ]
    grid += [0.0] * (16 - len(grid))  # tiny images pad to the fixed width
    return {
        "width": int(width), "height": int(height), "channels": int(channels),
        "mean_luma": float(luma.mean() / 255.0),
        "luma_sum": int(luma_round.sum()),
        "feature": [float(np.float32(g)) for g in grid],
    }


def encode_png(pixels: "np.ndarray") -> bytes:
    """Minimal PNG encoder (the sink twin of decode_png): (h, w) uint8 ->
    8-bit grayscale, (h, w, 3) -> 8-bit RGB; filter-0 scanlines, one IDAT.
    Output round-trips through decode_png and any standard viewer."""
    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        color_type, h, w = 0, arr.shape[0], arr.shape[1]
        flat = arr
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type, h, w = 2, arr.shape[0], arr.shape[1]
        flat = arr.reshape(h, w * 3)
    else:
        raise ValueError("encode_png wants (h,w) gray or (h,w,3) rgb uint8")
    scanlines = b"".join(b"\x00" + flat[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (_struct.pack(">I", len(data)) + ctype + data
                + _struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = _struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(scanlines))
            + chunk(b"IEND", b""))


def decode_image(payload: bytes, fake: bool = False) -> dict:
    """PNG payloads decode FOR REAL (decode_png, pure stdlib). Other
    formats need codecs absent from this container: they raise
    NotImplementedError unless fake=True, where a deterministic fake
    derives stable pseudo-features from the payload hash so tests can
    exercise the full distributed path."""
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if not fake:
        raise NotImplementedError(
            "non-PNG image decode requires an imaging library "
            "(Pillow/opencv); not available in this environment — pass "
            "fake=True for the deterministic test decoder"
        )
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    rng = np.frombuffer(h, dtype=np.uint8).astype(np.float64)
    feature = (rng[:16] / 255.0).astype(np.float32)
    return {
        "width": int(width), "height": int(height), "channels": 3,
        "mean_luma": float(rng.mean() / 255.0), "feature": feature.tolist(),
    }


def media_metadata(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Typed metadata WITHOUT touching Python: size, hash, magic-sniff are
    all JVM expressions, so this runs at scan speed and the blobs never
    cross the Arrow boundary."""
    p = F.col(payload_col)
    magic = (
        F.when(p.isNull() | (F.octet_length(p) == 0), F.lit("empty"))
        .when(F.startswith(p, F.lit(b"\x89PNG")), F.lit("png"))
        .when(F.startswith(p, F.lit(b"\xff\xd8\xff")), F.lit("jpeg"))
        .when(F.startswith(p, F.lit(b"GIF8")), F.lit("gif"))
        .when(F.startswith(p, F.lit(b"RIFF")), F.lit("riff"))
        .when(F.startswith(p, F.lit(b"ID3")), F.lit("mp3"))
        .when(F.startswith(p, F.lit(b"OggS")), F.lit("ogg"))
        .when(F.startswith(p, F.lit(b"%PDF")), F.lit("pdf"))
        .otherwise(F.lit("unknown"))
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        magic.alias("magic"),
        F.octet_length(p).cast("long").alias("n_bytes"),
        F.sha2(F.coalesce(p, F.lit(b"")), 256).alias("sha256"),
    )


def image_features(df: DataFrame, id_col: str, payload_col: str, fake: bool = True) -> DataFrame:
    """decode/feature-extract via mapInPandas: blobs in, fixed-size features
    out. Column-prunes to (id, payload) before the Python boundary; per-row
    failures land in `error` (the engine's row-level error channel)."""
    narrow = df.select(F.col(id_col).alias("media_id"), F.col(payload_col).alias("payload"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": pdf["media_id"].values, "width": [], "height": [],
                   "channels": [], "mean_luma": [], "feature": [], "error": []}
            for payload in pdf["payload"]:
                try:
                    if payload is None:
                        raise ValueError("null payload")
                    d = decode_image(bytes(payload), fake=fake)
                    out["width"].append(d["width"]); out["height"].append(d["height"])
                    out["channels"].append(d["channels"]); out["mean_luma"].append(d["mean_luma"])
                    out["feature"].append(d["feature"]); out["error"].append(None)
                except Exception as e:
                    out["width"].append(None); out["height"].append(None)
                    out["channels"].append(None); out["mean_luma"].append(None)
                    out["feature"].append(None); out["error"].append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(out)

    return narrow.mapInPandas(kernel, schema=IMAGE_FEATURES_DDL)


def sample_frames(df: DataFrame, id_col: str, payload_col: str, every_n_bytes: int = 4096,
                  max_frames: int = 8) -> DataFrame:
    """Video frame-sample analog: slice the payload at fixed offsets ("key
    frames") and hash each slice — real video decode is stubbed, but the
    fan-out shape (1 row -> N frame rows, explode after mapInPandas) is the
    production shape."""
    narrow = df.select(F.col(id_col).alias("media_id"), F.col(payload_col).alias("payload"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                data = bytes(payload)
                for fi in range(min(max_frames, max(1, len(data) // every_n_bytes))):
                    chunk = data[fi * every_n_bytes : (fi + 1) * every_n_bytes]
                    ids.append(mid); idxs.append(fi)
                    hashes.append(hashlib.sha256(chunk).hexdigest())
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame_sha256": hashes})

    return narrow.mapInPandas(kernel, schema=FRAME_SAMPLE_DDL)
