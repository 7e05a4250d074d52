"""TIFF codec: lossless roundtrips (none/PackBits/LZW), bidirectional
cross-validation against the system libtiff, predictor/palette/WhiteIsZero
paths, chaos corpus, decode_image routing."""

from __future__ import annotations

import ctypes
import os
import struct
import tempfile
import zlib

import numpy as np
import pytest

from space_launch_telemetry_analyzer_spark.operators import multimodal as M
from space_launch_telemetry_analyzer_spark.operators import tiff as T


def test_roundtrip_all_compressions():
    rng = np.random.default_rng(1)
    for shape in [(1, 1), (5, 3), (16, 16), (9, 13, 3), (33, 31, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for comp in ("none", "packbits", "lzw"):
            d = T.decode_tiff(T.encode_tiff(img, compression=comp),
                              return_luma=True)
            if img.ndim == 2:
                assert np.array_equal(d["luma"], img.astype(np.float64))
                assert d["luma_sum"] == int(img.astype(np.int64).sum())
            else:
                lum = img.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
                assert np.allclose(d["luma"], lum)


def test_lzw_table_growth_and_clear():
    """Random 200x300 forces width bumps through 10/11/12 bits and a
    mid-stream Clear; flat/repetitive data exercise long matches."""
    rng = np.random.default_rng(2)
    for img in (rng.integers(0, 256, (200, 300), dtype=np.uint8),
                np.full((64, 64), 9, dtype=np.uint8),
                np.tile(np.arange(16, dtype=np.uint8), (64, 32))):
        d = T.decode_tiff(T.encode_tiff(img, compression="lzw"),
                          return_luma=True)
        assert np.array_equal(d["luma"], img.astype(np.float64))


def test_predictor_and_photometrics():
    """Hand-built fixtures: horizontal-differencing predictor 2, palette
    via 16-bit ColorMap, and WhiteIsZero inversion."""
    # predictor 2 gray: stored row deltas, uncompressed
    img = np.array([[10, 20, 15], [200, 100, 250]], dtype=np.uint8)
    deltas = np.diff(img.astype(np.int16), axis=1, prepend=0).astype(np.uint8)
    strip = deltas.tobytes()

    def build(extra_tags, strip, w, h):
        entries = [(256, 3, [w]), (257, 3, [h]), (258, 3, [8]),
                   (259, 3, [1]), (273, 4, [8]), (277, 3, [1]),
                   (278, 3, [h]), (279, 4, [len(strip)])] + extra_tags
        entries.sort()
        ifd_off = 8 + len(strip) + (len(strip) & 1)
        out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
        out += strip + (b"\x00" if len(strip) & 1 else b"")
        extra = b""
        extra_off = ifd_off + 2 + len(entries) * 12 + 4
        body = struct.pack("<H", len(entries))
        for tag, typ, vals in entries:
            fmt = {3: "H", 4: "I"}[typ]
            sz = {3: 2, 4: 4}[typ]
            if len(vals) * sz <= 4:
                vb = b"".join(struct.pack("<" + fmt, v) for v in vals)
                vb += b"\x00" * (4 - len(vb))
            else:
                vb = struct.pack("<I", extra_off + len(extra))
                extra += b"".join(struct.pack("<" + fmt, v) for v in vals)
            body += struct.pack("<HHI", tag, typ, len(vals)) + vb
        body += struct.pack("<I", 0)
        return bytes(out) + body + extra

    payload = build([(262, 3, [1]), (317, 3, [2])], strip, 3, 2)
    d = T.decode_tiff(payload, return_luma=True)
    assert np.array_equal(d["luma"], img.astype(np.float64))

    # WhiteIsZero: luma inverts
    payload = build([(262, 3, [0])], img.tobytes(), 3, 2)
    d = T.decode_tiff(payload, return_luma=True)
    assert np.array_equal(d["luma"], 255.0 - img.astype(np.float64))

    # palette: spec requires 2^depth entries — 256 at depth 8, 16-bit
    # colormap values (v*257 -> v back)
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    cmap_r = [0, 257 * 255, 0, 257 * 10] + [0] * 252
    cmap_g = [0, 0, 257 * 255, 257 * 20] + [0] * 252
    cmap_b = [0, 0, 0, 257 * 30] + [0] * 252
    payload = build([(262, 3, [3]), (320, 3, cmap_r + cmap_g + cmap_b)],
                    idx.tobytes(), 2, 2)
    d = T.decode_tiff(payload, return_luma=True)
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [10, 20, 30]],
                   dtype=np.float64)
    want = pal[idx] @ np.array([0.299, 0.587, 0.114])
    assert np.allclose(d["luma"], want)


def _libtiff():
    try:
        lib = ctypes.CDLL("libtiff.so.6")
    except OSError:
        return None
    lib.TIFFOpen.restype = ctypes.c_void_p
    lib.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.TIFFClose.argtypes = [ctypes.c_void_p]
    lib.TIFFWriteScanline.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                      ctypes.c_uint32, ctypes.c_uint16]
    lib.TIFFReadRGBAImageOriented.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int, ctypes.c_int]
    lib.TIFFSetErrorHandler(None)
    lib.TIFFSetWarningHandler(None)
    return lib


@pytest.mark.skipif(_libtiff() is None, reason="system libtiff unavailable")
def test_cross_validated_against_system_libtiff():
    """Both directions: our encoder's output reads pixel-exact through
    libtiff; libtiff-written strips (incl. its LZW width schedule, which
    pinned our EarlyChange off-by-one) decode pixel-exact through ours."""
    lib = _libtiff()

    def read_rgb(payload):
        with tempfile.NamedTemporaryFile(suffix=".tif", delete=False) as f:
            f.write(payload)
            path = f.name
        try:
            tif = lib.TIFFOpen(path.encode(), b"r")
            assert tif
            t = ctypes.c_void_p(tif)
            w = ctypes.c_uint32()
            h = ctypes.c_uint32()
            lib.TIFFGetField(t, ctypes.c_uint32(256), ctypes.byref(w))
            lib.TIFFGetField(t, ctypes.c_uint32(257), ctypes.byref(h))
            buf = (ctypes.c_uint32 * (w.value * h.value))()
            assert lib.TIFFReadRGBAImageOriented(t, w.value, h.value, buf, 1, 0)
            lib.TIFFClose(t)
            a = np.frombuffer(buf, dtype=np.uint32).reshape(h.value, w.value)
            return np.stack([a & 0xFF, (a >> 8) & 0xFF, (a >> 16) & 0xFF],
                            axis=2).astype(np.uint8)
        finally:
            os.unlink(path)

    def write(img, comp):
        h, w = img.shape[:2]
        spp = 1 if img.ndim == 2 else img.shape[2]
        with tempfile.NamedTemporaryFile(suffix=".tif", delete=False) as f:
            path = f.name
        tif = lib.TIFFOpen(path.encode(), b"w")
        t = ctypes.c_void_p(tif)
        for tag, val in [(256, ctypes.c_uint32(w)), (257, ctypes.c_uint32(h)),
                         (258, ctypes.c_uint16(8)),
                         (259, ctypes.c_uint16(comp)),
                         (262, ctypes.c_uint16(1 if spp == 1 else 2)),
                         (277, ctypes.c_uint16(spp)),
                         (278, ctypes.c_uint32(h)),
                         (284, ctypes.c_uint16(1))]:
            lib.TIFFSetField(t, ctypes.c_uint32(tag), val)
        for r in range(h):
            row = np.ascontiguousarray(img[r]).tobytes()
            buf = ctypes.create_string_buffer(row, len(row))
            assert lib.TIFFWriteScanline(t, buf, r, 0) == 1
        lib.TIFFClose(t)
        data = open(path, "rb").read()
        os.unlink(path)
        return data

    rng = np.random.default_rng(5)
    for shape in [(9, 13), (16, 16, 3), (100, 100), (33, 31, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        rgb = np.stack([img] * 3, axis=2) if img.ndim == 2 else img
        want = img.astype(np.float64) if img.ndim == 2 else \
            rgb.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
        for comp_name, comp_id in [("none", 1), ("packbits", 32773),
                                   ("lzw", 5)]:
            assert np.array_equal(
                read_rgb(T.encode_tiff(img, compression=comp_name)), rgb)
            d = T.decode_tiff(write(img, comp_id), return_luma=True)
            assert np.allclose(d["luma"], want)
        d = T.decode_tiff(write(img, 8), return_luma=True)  # deflate
        assert np.allclose(d["luma"], want)


def test_unsupported_and_malformed():
    img = np.arange(24, dtype=np.uint8).reshape(4, 6)
    good = T.encode_tiff(img)
    with pytest.raises(ValueError, match="byte-order"):
        T.decode_tiff(b"not a tiff")
    # flip compression tag to G4
    mut = bytearray(good)
    i = mut.find(struct.pack("<HH", 259, 3))
    mut[i + 8] = 4
    with pytest.raises(ValueError, match="fax"):
        T.decode_tiff(bytes(mut))
    with pytest.raises(ValueError):
        T.decode_tiff(good[:20])


def test_chaos_corpus():
    img = np.arange(13 * 7, dtype=np.uint8).reshape(13, 7) % 251
    good = T.encode_tiff(img, compression="lzw")
    rng = np.random.default_rng(7)
    for trial in range(300):
        mut = bytearray(good)
        mode = trial % 3
        if mode == 0:
            mut[rng.integers(0, len(mut))] = rng.integers(0, 256)
        elif mode == 1:
            del mut[rng.integers(0, len(mut))]
        else:
            mut = mut[: rng.integers(0, len(mut))]
        try:
            d = T.decode_tiff(bytes(mut))
            assert set(d) >= {"width", "height", "channels", "luma_sum"}
        except ValueError:
            pass


def test_decode_image_routing_and_magic():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    enc = T.encode_tiff(img, compression="lzw")
    assert M.sniff_magic(enc) == "tiff"
    d = M.decode_image(enc, fake=False)
    assert (d["width"], d["height"], d["channels"]) == (8, 8, 1)
    p = M.decode_image(M.encode_png(img), fake=False)
    assert d["luma_sum"] == p["luma_sum"]  # lossless twins agree
    assert zlib  # imported for the deflate fixture path above
