"""VP8 (lossy WebP) keyframe codec: bit-exact decode of real libwebp-encoded
streams (all intra modes, segmentation, loop filter, skip MBs), the
conformant flat-frame encoder twin (self + libwebp agreement, closed-form
pixel value), bool-coder roundtrip, router integration, chaos corpus."""

from __future__ import annotations

import ctypes
import struct

import numpy as np
import pytest

from space_launch_telemetry_analyzer_spark.operators import multimodal as M
from space_launch_telemetry_analyzer_spark.operators import vp8 as V


# ---------------------------------------------------------------------------
# libwebp oracle plumbing (same pattern as tests/test_webp.py)
# ---------------------------------------------------------------------------


def _libwebp():
    try:
        lib = ctypes.CDLL("libwebp.so.7")
    except OSError:
        return None
    lib.WebPEncodeRGB.restype = ctypes.c_size_t
    lib.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
    lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    return lib


def _lib_encode(lib, rgb: np.ndarray, quality: float) -> bytes:
    h, w, _ = rgb.shape
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGB(rgb.tobytes(), w, h, w * 3,
                          ctypes.c_float(quality), ctypes.byref(out))
    assert n > 0
    data = bytes(bytearray(
        ctypes.cast(out, ctypes.POINTER(ctypes.c_uint8 * n)).contents))
    lib.WebPFree(out)
    return data


def _lib_decode_yuv(lib, data: bytes):
    W = ctypes.c_int()
    H = ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_uint8)()
    vp = ctypes.POINTER(ctypes.c_uint8)()
    st = ctypes.c_int()
    ust = ctypes.c_int()
    yp = lib.WebPDecodeYUV(data, len(data), ctypes.byref(W), ctypes.byref(H),
                           ctypes.byref(up), ctypes.byref(vp),
                           ctypes.byref(st), ctypes.byref(ust))
    assert yp, "libwebp rejected the stream"
    w, h, s, us = W.value, H.value, st.value, ust.value
    cw, ch = (w + 1) // 2, (h + 1) // 2
    y = np.ctypeslib.as_array(yp, (h * s,)).reshape(h, s)[:, :w].copy()
    u = np.ctypeslib.as_array(up, (ch * us,)).reshape(ch, us)[:, :cw].copy()
    v = np.ctypeslib.as_array(vp, (ch * us,)).reshape(ch, us)[:, :cw].copy()
    lib.WebPFree(yp)
    return y, u, v


def _vp8_body(webp: bytes) -> bytes:
    pos = 12
    while pos + 8 <= len(webp):
        tag = webp[pos:pos + 4]
        size = int.from_bytes(webp[pos + 4:pos + 8], "little")
        if tag == b"VP8 ":
            return webp[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise AssertionError("no VP8 chunk")


# ---------------------------------------------------------------------------
# bool coder
# ---------------------------------------------------------------------------


def test_bool_coder_roundtrip():
    rng = np.random.default_rng(0)
    probs = rng.integers(1, 255, 500).tolist()
    bits = rng.integers(0, 2, 500).tolist()
    be = V.BoolEncoder()
    for p, b in zip(probs, bits):
        be.put_bool(p, b)
    bd = V.BoolDecoder(be.flush())
    assert [bd.get_bool(p) for p in probs] == bits


def test_bool_coder_literals_and_trees():
    be = V.BoolEncoder()
    be.put_literal(7, 93)
    be.put_tree(V.KF_YMODE_TREE, V.KF_YMODE_PROBS, V.TM_PRED)
    be.put_tree(V.BMODE_TREE, V.KF_BMODE_PROBS[:9], V.B_HD)
    bd = V.BoolDecoder(be.flush())
    assert bd.get_literal(7) == 93
    assert bd.get_tree(V.KF_YMODE_TREE, V.KF_YMODE_PROBS) == V.TM_PRED
    assert bd.get_tree(V.BMODE_TREE, V.KF_BMODE_PROBS[:9]) == V.B_HD


def test_bool_decoder_exhaustion_raises():
    bd = V.BoolDecoder(b"\xff")
    with pytest.raises(ValueError, match="exhausted"):
        for _ in range(200):
            bd.get_bool(128)


# ---------------------------------------------------------------------------
# encoder twin: closed-form flat frames
# ---------------------------------------------------------------------------


def test_flat_twin_closed_form():
    for val, w, h, nparts in ((200, 5, 7, 1), (128, 16, 16, 1),
                              (30, 33, 17, 2), (255, 40, 24, 4),
                              (0, 3, 3, 1), (77, 50, 40, 8), (99, 1, 1, 1)):
        payload = V.encode_webp_lossy_flat(val, w, h, nparts=nparts)
        y, u, v = V.decode_vp8(_vp8_body(payload))
        assert y.shape == (h, w)
        assert (y == val).all()
        assert (u == 128).all() and (v == 128).all()


def test_flat_twin_validation():
    with pytest.raises(ValueError, match="range"):
        V.encode_webp_lossy_flat(256, 4, 4)
    with pytest.raises(ValueError, match="dimensions"):
        V.encode_webp_lossy_flat(10, 0, 4)
    with pytest.raises(ValueError, match="nparts"):
        V.encode_webp_lossy_flat(10, 4, 4, nparts=3)


@pytest.mark.skipif(_libwebp() is None, reason="system libwebp unavailable")
def test_flat_twin_is_conformant_vp8():
    """libwebp must decode our from-scratch streams to the identical
    planes — proves the twin emits real spec-conformant VP8, not just
    something our own decoder happens to accept."""
    lib = _libwebp()
    for val, w, h, nparts in ((200, 5, 7, 1), (30, 33, 17, 2),
                              (255, 40, 24, 4), (77, 50, 40, 8)):
        payload = V.encode_webp_lossy_flat(val, w, h, nparts=nparts)
        ly, lu, lv = _lib_decode_yuv(lib, payload)
        y, u, v = V.decode_vp8(_vp8_body(payload))
        assert (ly == y).all() and (lu == u).all() and (lv == v).all()


# ---------------------------------------------------------------------------
# bit-exact decode of real libwebp-encoded lossy streams
# ---------------------------------------------------------------------------


@pytest.mark.skipif(_libwebp() is None, reason="system libwebp unavailable")
def test_decodes_real_libwebp_streams_bit_exact():
    """Structured-gradient + noise images over a size/quality sweep: odd
    dimensions (MB padding + crop), 1-pixel-wide/tall frames, qualities
    spanning heavy quantization to near-lossless.  Exercises all 4x4/16x16
    intra modes, token trees incl. cat1-6 extra bits, skip flags, and the
    normal loop filter; Y/U/V must equal WebPDecodeYUV exactly."""
    lib = _libwebp()
    rng = np.random.default_rng(42)
    for w, h in ((33, 17), (64, 48), (15, 15), (16, 16), (100, 1), (1, 100)):
        for q in (5.0, 50.0, 95.0):
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.clip((xx * 3 + yy * 5) % 256 +
                          rng.integers(-30, 30, (h, w)), 0, 255).astype(np.uint8)
            rgb = np.stack([img, np.roll(img, 3, 0), 255 - img],
                           axis=-1).astype(np.uint8).copy()
            data = _lib_encode(lib, rgb, q)
            ly, lu, lv = _lib_decode_yuv(lib, data)
            my, mu, mv = V.decode_vp8(_vp8_body(data))
            assert (my == ly).all(), (w, h, q, "luma")
            assert (mu == lu).all() and (mv == lv).all(), (w, h, q, "chroma")


@pytest.mark.skipif(_libwebp() is None, reason="system libwebp unavailable")
def test_decodes_segmented_stream_bit_exact():
    """Mixed flat/noisy content pushes libwebp's encoder to enable
    quantizer segmentation (verified via parse_frame_header), covering the
    segment-map tree + per-segment dequant path."""
    lib = _libwebp()
    rng = np.random.default_rng(7)
    h, w = 128, 160
    img = np.zeros((h, w), np.uint8)
    img[:, :80] = 40
    img[:, 80:] = rng.integers(0, 255, (h, 80))
    img[:40, :40] = 220
    rgb = np.stack([img, img, img], axis=-1).astype(np.uint8).copy()
    data = _lib_encode(lib, rgb, 50.0)
    hdr = V.parse_frame_header(_vp8_body(data))
    assert hdr["seg_enabled"] and hdr["seg_update_map"]
    ly, lu, lv = _lib_decode_yuv(lib, data)
    my, mu, mv = V.decode_vp8(_vp8_body(data))
    assert (my == ly).all() and (mu == lu).all() and (mv == lv).all()


# ---------------------------------------------------------------------------
# router integration + error contract
# ---------------------------------------------------------------------------


def test_decode_image_router_vp8():
    payload = V.encode_webp_lossy_flat(77, 50, 40)
    d = M.decode_image(payload)
    assert (d["width"], d["height"], d["channels"]) == (50, 40, 3)
    assert d["luma_sum"] == 77 * 50 * 40
    assert d["mean_luma"] == pytest.approx(77 / 255)
    assert M.sniff_magic(payload) == "webp"


def test_malformed_streams_raise_valueerror():
    good = _vp8_body(V.encode_webp_lossy_flat(200, 33, 17))
    with pytest.raises(ValueError):
        V.decode_vp8(good[:8])          # truncated header
    with pytest.raises(ValueError):
        V.decode_vp8(b"")               # empty
    bad_sync = bytearray(good)
    bad_sync[3] = 0x00
    with pytest.raises(ValueError, match="start code"):
        V.decode_vp8(bytes(bad_sync))
    inter = bytearray(good)
    inter[0] |= 1                       # frame_type=interframe
    with pytest.raises(ValueError, match="interframe"):
        V.decode_vp8(bytes(inter))
    zero_dim = bytearray(good)
    zero_dim[6:8] = b"\x00\x00"
    with pytest.raises(ValueError, match="dimension"):
        V.decode_vp8(bytes(zero_dim))


def test_truncation_chaos_never_foreign_exceptions():
    """Every truncation point must either decode (short tails are legal:
    the bool decoder allows 4 virtual zero bytes) or raise ValueError —
    never IndexError/struct.error (the jpeg.py ADVICE r4 lesson applied
    here from day one)."""
    good = _vp8_body(V.encode_webp_lossy_flat(13, 40, 24, nparts=2))
    for cut in range(0, len(good)):
        try:
            V.decode_vp8(good[:cut])
        except ValueError:
            pass
    rng = np.random.default_rng(3)
    for _ in range(30):
        blob = bytes(rng.integers(0, 256, 60, dtype=np.uint8))
        try:
            V.decode_vp8(blob)
        except ValueError:
            pass


# ---------------------------------------------------------------------------
# table sanity
# ---------------------------------------------------------------------------


def test_table_anchors():
    """RFC 6386 anchor values; KF_BMODE_PROBS is stored in RFC submode
    ordering (the extractor permutes libwebp's RD/VR/LD-swapped enum —
    getting this wrong shows up as ±2 pixel drift on B_RD/B_VR/B_HD
    blocks, which is exactly how it was caught)."""
    from space_launch_telemetry_analyzer_spark.operators.vp8_tables import (
        AC_QLOOKUP, COEF_BANDS, DC_QLOOKUP, KF_BMODE_PROBS)
    assert DC_QLOOKUP[:4] == (4, 5, 6, 7) and DC_QLOOKUP[127] == 157
    assert AC_QLOOKUP[:4] == (4, 5, 6, 7) and AC_QLOOKUP[127] == 284
    assert COEF_BANDS == (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
    # kf_bmode_prob[0][0] / [0][1] straight from the RFC 6386 table
    assert KF_BMODE_PROBS[:9] == (231, 120, 48, 89, 115, 113, 120, 152, 112)
    assert KF_BMODE_PROBS[9:18] == (152, 179, 64, 126, 170, 118, 46, 70, 95)
