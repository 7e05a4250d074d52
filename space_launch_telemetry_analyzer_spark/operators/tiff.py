"""TIFF codec, pure stdlib + numpy — the last named fake-path image format.

Written from the public TIFF 6.0 specification. Scope: baseline TIFF,
both byte orders (II/MM), chunky planar config, strip-organized data,
compressions 1 (none), 5 (LZW with the spec's EarlyChange code widths),
8/32946 (Deflate), 32773 (PackBits); photometric 0/1 (gray + WhiteIsZero),
2 (RGB, 8-bit, with or without alpha), 3 (palette via ColorMap);
horizontal-differencing predictor 2; bit depths 1/4/8 for gray, 8 for
RGB/palette. Tiled layouts, planar=2, 16-bit samples, and fax (G3/G4)
compression raise ValueError into the row-level error channel.

encode_tiff is the sink twin: single-strip chunky little-endian TIFF,
uncompressed / PackBits / LZW — its output round-trips through decode_tiff
and the system libtiff (cross-validated both directions in
tests/test_tiff.py).

Reference analog: the cv2 frame reads this codec layer replaces for crawl
payloads (/root/reference/processing/video_processing/batch_processing.py:59-69).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# tag ids (TIFF 6.0 section 8)
_T_WIDTH, _T_HEIGHT = 256, 257
_T_BITS, _T_COMPRESSION, _T_PHOTOMETRIC = 258, 259, 262
_T_STRIP_OFFSETS, _T_SPP, _T_ROWS_PER_STRIP, _T_STRIP_COUNTS = 273, 277, 278, 279
_T_PLANAR, _T_PREDICTOR, _T_COLORMAP = 284, 317, 320

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8,
              11: 4, 12: 8}


def _read_ifd(payload: bytes, endian: str):
    """First IFD -> {tag: list-of-values} (SHORT/LONG/BYTE types only —
    the ones the baseline tag set uses)."""
    if len(payload) < 8:
        raise ValueError("truncated TIFF header")
    (ifd_off,) = struct.unpack(endian + "I", payload[4:8])
    if ifd_off + 2 > len(payload):
        raise ValueError("TIFF IFD offset out of range")
    (n_entries,) = struct.unpack(endian + "H", payload[ifd_off:ifd_off + 2])
    tags: dict[int, list[int]] = {}
    pos = ifd_off + 2
    for _ in range(n_entries):
        if pos + 12 > len(payload):
            raise ValueError("truncated TIFF IFD")
        tag, typ, count = struct.unpack(endian + "HHI", payload[pos:pos + 8])
        size = _TYPE_SIZE.get(typ, 1) * count
        if size <= 4:
            data = payload[pos + 8:pos + 12]
        else:
            (off,) = struct.unpack(endian + "I", payload[pos + 8:pos + 12])
            data = payload[off:off + size]
            if len(data) < size:
                raise ValueError("TIFF tag data out of range")
        if typ == 3:  # SHORT
            vals = list(struct.unpack(endian + "H" * count, data[:2 * count]))
        elif typ == 4:  # LONG
            vals = list(struct.unpack(endian + "I" * count, data[:4 * count]))
        elif typ in (1, 6, 7):  # BYTE-ish
            vals = list(data[:count])
        else:  # rationals etc. — not needed by the baseline tag set
            vals = []
        tags[tag] = vals
        pos += 12
    return tags


def _lzw_decode_tiff(data: bytes, expected: int) -> bytearray:
    """TIFF-flavor LZW: MSB-first code packing, 9-bit initial width,
    Clear=256 / EOI=257, and the spec's EarlyChange (width bumps when the
    NEXT code would overflow, one entry early vs GIF)."""
    out = bytearray()
    dict_: list[bytes] = [bytes((i,)) for i in range(256)] + [b"", b""]
    width = 9
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for b in data:
        acc = (acc << 8) | b
        nbits += 8
        while nbits >= width:
            nbits -= width
            code = (acc >> nbits) & ((1 << width) - 1)
            if code == 256:  # Clear
                dict_ = [bytes((i,)) for i in range(256)] + [b"", b""]
                width = 9
                prev = None
                continue
            if code == 257:  # EOI
                return out
            if prev is None:
                if code >= len(dict_):
                    raise ValueError("TIFF LZW bad first code")
                entry = dict_[code]
            elif code < len(dict_):
                entry = dict_[code]
                dict_.append(prev + entry[:1])
            elif code == len(dict_):
                entry = prev + prev[:1]
                dict_.append(entry)
            else:
                raise ValueError("TIFF LZW code out of range")
            out += entry
            prev = entry
            # EarlyChange (verified against libtiff streams): widen when
            # the table reaches 511/1023/2047 — one short of capacity
            if len(dict_) >= (1 << width) - 1 and width < 12:
                width += 1
            if len(out) >= expected:
                return out
    return out


def _packbits_decode(data: bytes, expected: int) -> bytearray:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < expected:
        b = data[i]
        i += 1
        if b < 128:
            out += data[i:i + b + 1]
            i += b + 1
        elif b > 128:
            if i < n:
                out += bytes((data[i],)) * (257 - b)
                i += 1
        # 128: no-op
    return out


def decode_tiff(payload: bytes, return_luma: bool = False) -> dict:
    """Baseline TIFF -> the shared luma_features contract."""
    if payload[:4] == b"II*\x00":
        endian = "<"
    elif payload[:4] == b"MM\x00*":
        endian = ">"
    else:
        raise ValueError("not a TIFF: bad byte-order header")
    tags = _read_ifd(payload, endian)

    def one(tag, default=None):
        v = tags.get(tag)
        if not v:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    w = one(_T_WIDTH)
    h = one(_T_HEIGHT)
    if w == 0 or h == 0 or w > 1 << 20 or h > 1 << 20:
        raise ValueError("TIFF dimensions out of range")
    spp = one(_T_SPP, 1)
    bits_list = tags.get(_T_BITS, [1])
    depth = bits_list[0] if bits_list else 1
    if any(b != depth for b in bits_list):
        raise ValueError("TIFF mixed bits-per-sample unsupported")
    compression = one(_T_COMPRESSION, 1)
    photometric = one(_T_PHOTOMETRIC, 1)
    planar = one(_T_PLANAR, 1)
    predictor = one(_T_PREDICTOR, 1)
    if planar != 1:
        raise ValueError("TIFF planar configuration 2 unsupported")
    if depth == 16 or depth not in (1, 4, 8):
        raise ValueError(f"TIFF bits-per-sample {depth} unsupported")
    if depth != 8 and (spp != 1 or photometric not in (0, 1, 3)):
        raise ValueError("TIFF sub-byte depth only for grayscale/palette")
    if compression in (2, 3, 4):
        raise ValueError("TIFF fax (G3/G4/RLE) compression unsupported")
    if compression not in (1, 5, 8, 32946, 32773):
        raise ValueError(f"TIFF compression {compression} unsupported")
    if photometric not in (0, 1, 2, 3):
        raise ValueError(f"TIFF photometric {photometric} unsupported")
    if photometric == 3 and _T_COLORMAP not in tags:
        raise ValueError("palette TIFF without ColorMap")

    offsets = tags.get(_T_STRIP_OFFSETS)
    counts = tags.get(_T_STRIP_COUNTS)
    if not offsets:
        raise ValueError("TIFF has no strip offsets (tiled layouts unsupported)")
    if not counts or len(counts) != len(offsets):
        raise ValueError("TIFF strip byte counts missing/mismatched")
    rows_per_strip = one(_T_ROWS_PER_STRIP, h)
    stride = (w * spp * depth + 7) // 8

    rows = bytearray()
    remaining_rows = h
    for off, cnt in zip(offsets, counts):
        strip = payload[off:off + cnt]
        if len(strip) < cnt:
            raise ValueError("TIFF strip out of range")
        n_rows = min(rows_per_strip, remaining_rows)
        expected = n_rows * stride
        if compression == 1:
            data = strip[:expected]
            if len(data) < expected:
                raise ValueError("TIFF strip too short")
        elif compression == 5:
            data = _lzw_decode_tiff(strip, expected)
        elif compression in (8, 32946):
            try:
                data = zlib.decompress(strip)
            except zlib.error as e:
                raise ValueError(f"bad TIFF deflate strip: {e}")
        else:
            data = _packbits_decode(strip, expected)
        if len(data) < expected:
            raise ValueError("TIFF strip decodes short")
        rows += data[:expected]
        remaining_rows -= n_rows
    if remaining_rows > 0:
        raise ValueError("TIFF strips cover fewer rows than ImageLength")

    arr = np.frombuffer(bytes(rows), dtype=np.uint8).reshape(h, stride)
    if depth == 8:
        samples = arr[:, : w * spp].reshape(h, w, spp).copy()
    else:
        bits = np.unpackbits(arr, axis=1)
        vals = bits.reshape(h, -1, depth)
        weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
        samples = ((vals * weights).sum(axis=2).astype(np.uint8)
                   [:, :w].reshape(h, w, 1))

    if predictor == 2:
        if depth != 8:
            raise ValueError("TIFF predictor 2 with sub-byte depth unsupported")
        samples = np.cumsum(samples.astype(np.uint64), axis=1).astype(np.uint8)
    elif predictor != 1:
        raise ValueError(f"TIFF predictor {predictor} unsupported")

    from .multimodal import REC601, luma_features

    if photometric == 3:
        cmap = tags[_T_COLORMAP]
        n = 1 << depth
        if len(cmap) < 3 * n:
            raise ValueError("TIFF ColorMap too short")
        # 16-bit colormap entries -> 8-bit (spec: full range 0..65535)
        pal = (np.array(cmap[: 3 * n], dtype=np.float64)
               .reshape(3, n).T / 257.0)
        idx = np.minimum(samples[:, :, 0].astype(np.int64), n - 1)
        rgb = pal[idx]
        luma = rgb @ REC601
        channels = 3
    elif photometric == 2:
        if spp < 3:
            raise ValueError("TIFF RGB with fewer than 3 samples")
        px = samples[:, :, :3].astype(np.float64)
        luma = px @ REC601
        channels = 3
    else:
        maxv = float((1 << depth) - 1)
        g = samples[:, :, 0].astype(np.float64) * (255.0 / maxv)
        if photometric == 0:  # WhiteIsZero
            g = 255.0 - g
        luma = g
        channels = 1

    out = luma_features(luma, channels)
    if return_luma:
        out["luma"] = luma
    return out


# ---------------------------------------------------------------------------
# encoder twin
# ---------------------------------------------------------------------------


def _lzw_encode_tiff(data: bytes) -> bytes:
    """TIFF LZW with EarlyChange: emits Clear first, bumps code width when
    the next table entry would overflow (one early), Clear at 4094."""
    out = bytearray()
    acc = 0
    nbits = 0
    width = 9

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    table: dict[bytes, int] = {bytes((i,)): i for i in range(256)}
    next_code = 258
    emit(256)  # Clear
    prefix = b""
    for b in data:
        cand = prefix + bytes((b,))
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix])
        table[cand] = next_code
        next_code += 1
        # the K=1 decoder (above) widens one table entry later than the
        # naive early-change reading; bump at full capacity so the next
        # emitted code matches its width (verified against libtiff both
        # directions)
        if next_code == (1 << width) and width < 12:
            width += 1
        prefix = bytes((b,))
        if next_code >= 4094:
            emit(table[prefix])
            emit(256)
            table = {bytes((i,)): i for i in range(256)}
            next_code = 258
            width = 9
            prefix = b""
    if prefix:
        emit(table[prefix])
    emit(257)  # EOI
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def encode_tiff(pixels: "np.ndarray", compression: str = "none") -> bytes:
    """(h, w) uint8 gray or (h, w, 3) uint8 RGB -> single-strip chunky
    little-endian TIFF. compression: 'none' | 'packbits' | 'lzw'.
    Round-trips through decode_tiff and the system libtiff."""
    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError("encode_tiff wants (h,w) gray or (h,w,3) rgb uint8")
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("zero-dimension image")
    spp = 1 if gray else 3
    raw = arr.tobytes()
    comp_id = {"none": 1, "packbits": 32773, "lzw": 5}.get(compression)
    if comp_id is None:
        raise ValueError("compression must be none|packbits|lzw")
    if comp_id == 1:
        strip = raw
    elif comp_id == 5:
        strip = _lzw_encode_tiff(raw)
    else:
        # PackBits per spec: encode each ROW independently
        stride = w * spp
        pieces = []
        for r in range(h):
            row = raw[r * stride:(r + 1) * stride]
            i = 0
            while i < len(row):
                # find a run
                j = i
                while j + 1 < len(row) and row[j + 1] == row[j] and j - i < 127:
                    j += 1
                if j > i:  # run of j-i+1 identical bytes
                    pieces.append(bytes([(257 - (j - i + 1)) & 0xFF]))
                    pieces.append(row[i:i + 1])
                    i = j + 1
                else:
                    k = i
                    while (k + 1 < len(row) and k - i < 127
                           and not (k + 2 < len(row)
                                    and row[k + 1] == row[k + 2] == row[k])):
                        k += 1
                    pieces.append(bytes(((k - i) & 0xFF,)))
                    pieces.append(row[i:k + 1])
                    i = k + 1
        strip = b"".join(pieces)

    # layout: header(8) + strip + IFD; tag data that exceeds 4 bytes
    # (BitsPerSample for RGB) appended after the IFD
    strip_off = 8
    strip_len = len(strip)  # recorded BEFORE the alignment pad
    ifd_off = strip_off + len(strip)
    if ifd_off & 1:
        strip += b"\x00"
        ifd_off += 1

    entries = []

    def tag(tid, typ, count, value_bytes):
        entries.append((tid, typ, count, value_bytes))

    def short(v):
        return struct.pack("<H", v) + b"\x00\x00"

    def long_(v):
        return struct.pack("<I", v)

    n_tags = 9
    extra_off = ifd_off + 2 + n_tags * 12 + 4
    extra = b""

    tag(_T_WIDTH, 3, 1, short(w))
    tag(_T_HEIGHT, 3, 1, short(h))
    if gray:
        tag(_T_BITS, 3, 1, short(8))
    else:
        tag(_T_BITS, 3, 3, long_(extra_off + len(extra)))
        extra += struct.pack("<HHH", 8, 8, 8)
    tag(_T_COMPRESSION, 3, 1, short(comp_id))
    tag(_T_PHOTOMETRIC, 3, 1, short(1 if gray else 2))
    tag(_T_STRIP_OFFSETS, 4, 1, long_(strip_off))
    tag(_T_SPP, 3, 1, short(spp))
    tag(_T_ROWS_PER_STRIP, 3, 1, short(h))
    tag(_T_STRIP_COUNTS, 4, 1, long_(strip_len))
    assert len(entries) == n_tags

    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += strip
    out += struct.pack("<H", len(entries))
    for tid, typ, count, vb in sorted(entries):
        out += struct.pack("<HHI", tid, typ, count) + vb
    out += struct.pack("<I", 0)  # next IFD
    out += extra
    return bytes(out)
