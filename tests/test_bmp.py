"""BMP/DIB + ICO codecs: byte-exact 24-bit roundtrips, hand-built
palette/RLE/bitfield fixtures with closed-form pixel math, top-down and
core-header layouts, ICO directories (PNG and DIB+AND-mask entries),
router/sniff integration, chaos corpus."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from space_launch_telemetry_analyzer_spark.operators import bmp as B
from space_launch_telemetry_analyzer_spark.operators import multimodal as M


def _luma_sum(rgb: np.ndarray) -> int:
    return int(np.rint(rgb.astype(np.float64) @ M.REC601).astype(
        np.int64).sum())


def _bmp_with(dib: bytes, palette: bytes, data: bytes) -> bytes:
    off = 14 + len(dib) + len(palette)
    return (b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off) +
            dib + palette + data)


def _info_header(w: int, h: int, bpp: int, compression: int = 0,
                 clr_used: int = 0) -> bytes:
    return struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, compression,
                       0, 2835, 2835, clr_used, 0)


def test_roundtrip_24bit_exact():
    rng = np.random.default_rng(3)
    for shape in [(1, 1), (5, 3), (7, 4, 3), (16, 16, 3), (9, 31, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        d = B.decode_bmp(B.encode_bmp(img))
        rgb = np.stack([img] * 3, axis=2) if img.ndim == 2 else img
        assert (d["width"], d["height"], d["channels"]) == (
            rgb.shape[1], rgb.shape[0], 3)
        assert d["luma_sum"] == _luma_sum(rgb)


def test_palette_depths_1_4_8():
    # 2-entry palette, 1bpp: row bits MSB-first, stride padded to 4 bytes
    pal = bytes([0, 0, 255, 0, 0, 255, 255, 0])  # BGRA: red, yellow
    # 1bpp, 5x2: rows 10110 / 01001
    rows = bytes([0b10110000, 0, 0, 0, 0b01001000, 0, 0, 0])
    payload = _bmp_with(_info_header(5, 2, 1), pal, rows)
    d = B.decode_bmp(payload)
    # bottom-up: file row 0 is image row 1
    exp = np.array([[0, 1, 0, 0, 1], [1, 0, 1, 1, 0]])
    colors = np.array([[255, 0, 0], [255, 255, 0]])
    assert d["luma_sum"] == _luma_sum(colors[exp])
    assert (d["width"], d["height"], d["channels"]) == (5, 2, 3)

    # 4bpp, 3x1: nibbles high-first
    pal16 = bytes(64)
    pal16 = bytearray(pal16)
    pal16[4 * 3:4 * 3 + 3] = [10, 20, 30]  # index 3 = BGR(10,20,30)
    payload = _bmp_with(_info_header(3, 1, 4), bytes(pal16),
                        bytes([0x33, 0x30, 0, 0]))
    d = B.decode_bmp(payload)
    assert d["luma_sum"] == _luma_sum(np.array([[[30, 20, 10]] * 3]))

    # 8bpp with clr_used=2
    pal2 = bytes([1, 2, 3, 0, 100, 110, 120, 0])
    payload = _bmp_with(_info_header(2, 2, 8, clr_used=2), pal2,
                        bytes([0, 1, 0, 0, 1, 1, 0, 0]))
    d = B.decode_bmp(payload)
    colors = np.array([[3, 2, 1], [120, 110, 100]])
    exp = np.array([[1, 1], [0, 1]])  # flipped bottom-up
    assert d["luma_sum"] == _luma_sum(colors[exp])


def test_rle8_and_rle4():
    pal = bytearray(256 * 4)
    pal[4 * 7:4 * 7 + 3] = [70, 71, 72]   # idx 7 -> BGR
    pal[4 * 9:4 * 9 + 3] = [90, 91, 92]
    # 6x2 RLE8: row0(bottom): run 3x7, abs run [7,9,9] (3 bytes + pad),
    # EOL; row1: 6x9, EOF
    rle = bytes([3, 7, 0, 3, 7, 9, 9, 0, 0, 0, 6, 9, 0, 1])
    payload = _bmp_with(_info_header(6, 2, 8, compression=1), bytes(pal), rle)
    d = B.decode_bmp(payload)
    c7, c9 = np.array([72, 71, 70]), np.array([92, 91, 90])
    img = np.stack([np.stack([c9] * 6), np.stack([c7] * 4 + [c9] * 2)])
    # bottom row: 3x7 then abs [7,9,9]; top row: 6x9
    assert (d["width"], d["height"]) == (6, 2)
    assert d["luma_sum"] == _luma_sum(img)

    # 4x1 RLE4: encoded run 4 pixels alternating nibbles 7,9
    pal4 = bytearray(16 * 4)
    pal4[4 * 7:4 * 7 + 3] = [70, 71, 72]
    pal4[4 * 9:4 * 9 + 3] = [90, 91, 92]
    rle4 = bytes([4, 0x79, 0, 1])
    payload = _bmp_with(_info_header(4, 1, 4, compression=2),
                        bytes(pal4), rle4)
    d = B.decode_bmp(payload)
    img = np.stack([np.stack([c7, c9, c7, c9])])
    assert d["luma_sum"] == _luma_sum(img)


def test_16bpp_555_and_565_bitfields():
    # default 555: value r=31 g=0 b=31 -> magenta 255,0,255
    px = struct.pack("<HH", (31 << 10) | 31, 0)
    payload = _bmp_with(_info_header(2, 1, 16), b"", px)
    d = B.decode_bmp(payload)
    img = np.array([[[255, 0, 255], [0, 0, 0]]])
    assert d["luma_sum"] == _luma_sum(img)

    # 565 via BI_BITFIELDS (masks after the 40-byte header)
    masks = struct.pack("<III", 0xF800, 0x07E0, 0x001F)
    val = (10 << 11) | (32 << 5) | 20  # r5=10 g6=32 b5=20
    px = struct.pack("<HH", val, val)
    payload = _bmp_with(_info_header(2, 1, 16, compression=3),
                        masks, px)
    d = B.decode_bmp(payload)
    r8 = (10 * 255 + 15) // 31
    g8 = (32 * 255 + 31) // 63
    b8 = (20 * 255 + 15) // 31
    img = np.array([[[r8, g8, b8]] * 2])
    assert d["luma_sum"] == _luma_sum(img)


def test_32bpp_alpha_and_topdown():
    # 32bpp BGRA, top-down (negative height)
    px = bytes([5, 6, 7, 200, 8, 9, 10, 100])  # two pixels
    dib = struct.pack("<IiiHHIIiiII", 40, 2, -1, 1, 32, 0, 0,
                      2835, 2835, 0, 0)
    payload = _bmp_with(dib, b"", px)
    d = B.decode_bmp(payload)
    assert d["channels"] == 4
    img = np.array([[[7, 6, 5], [10, 9, 8]]])
    assert d["luma_sum"] == _luma_sum(img)


def test_core_header():
    # 12-byte BITMAPCOREHEADER, 24bpp, 1x1
    dib = struct.pack("<IHHHH", 12, 1, 1, 1, 24)
    payload = _bmp_with(dib, b"", bytes([40, 50, 60, 0]))
    d = B.decode_bmp(payload)
    assert (d["width"], d["height"]) == (1, 1)
    assert d["luma_sum"] == _luma_sum(np.array([[[60, 50, 40]]]))


def test_ico_png_and_dib_entries():
    rng = np.random.default_rng(9)
    img1 = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    img2 = rng.integers(0, 256, (4, 4), dtype=np.uint8)
    ico = B.encode_ico([img1, img2])
    d = B.decode_ico(ico)
    assert d["n_images"] == 2
    assert (d["width"], d["height"]) == (8, 8)
    assert d["luma_sum"] == _luma_sum(img1)

    # DIB entry with AND mask: 2x2 24bpp white, mask hides one pixel
    dib = _info_header(2, 4, 24)  # doubled height
    xor = bytes([255] * 6 + [0, 0] + [255] * 6 + [0, 0])
    mask = bytes([0b01000000, 0, 0, 0, 0, 0, 0, 0])  # row0(bottom): pixel1
    entry_data = dib + xor + mask
    ico = (b"\x00\x00\x01\x00\x01\x00" +
           bytes([2, 2, 0, 0]) + struct.pack("<HHII", 1, 24,
                                             len(entry_data), 22) +
           entry_data)
    d = B.decode_ico(ico)
    assert d["n_images"] == 1
    assert d["channels"] == 4
    assert (d["width"], d["height"]) == (2, 2)
    assert d["luma_sum"] == 255 * 4  # luma ignores the AND mask


def test_router_and_magic():
    img = np.full((3, 3), 128, dtype=np.uint8)
    payload = B.encode_bmp(img)
    assert M.sniff_magic(payload) == "bmp"
    d = M.decode_image(payload)
    assert d["luma_sum"] == 128 * 9
    ico = B.encode_ico([img])
    assert M.sniff_magic(ico) == "ico"
    assert M.decode_image(ico)["n_images"] == 1


def test_chaos_corpus():
    rng = np.random.default_rng(17)
    base = B.encode_bmp(rng.integers(0, 256, (9, 7, 3), dtype=np.uint8))
    corpus = [b"BM", base[:20], base[:40], base[:-5],
              b"BM" + bytes(50),
              b"\x00\x00\x01\x00\x02\x00" + bytes(8),
              base[:14] + b"\xff" * 40]
    for i in range(30):
        b = bytearray(base)
        pos = int(rng.integers(2, len(b)))
        b[pos] = int(rng.integers(0, 256))
        corpus.append(bytes(b))
    survived = 0
    for payload in corpus:
        try:
            d = B.decode_bmp(payload) if payload[:2] == b"BM" else \
                B.decode_ico(payload)
            assert 0 < d["width"] * d["height"] <= (1 << 24)
            survived += 1
        except (ValueError, NotImplementedError):
            pass
    assert survived >= 1  # many single-byte flips still decode


def test_adversarial_dimension_cap():
    dib = _info_header(60000, 60000, 24)
    payload = _bmp_with(dib, b"", b"")
    with pytest.raises(ValueError, match="16.7MP"):
        B.decode_bmp(payload)
