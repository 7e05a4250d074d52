"""Property-based codec guarantees (hypothesis): lossless roundtrips for
PNG/GIF on arbitrary images, JPEG flat-block exactness, PDF string-escape
totality, robots percent-normalization idempotence, and a media chaos pass
— random/truncated/corrupt payloads may only ever produce error rows,
never task failures or foreign exception types.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from space_launch_telemetry_analyzer_spark.operators import jpeg as J
from space_launch_telemetry_analyzer_spark.operators import layout as L
from space_launch_telemetry_analyzer_spark.operators import multimodal as M


@st.composite
def gray_images(draw, max_side=24):
    h = draw(st.integers(1, max_side))
    w = draw(st.integers(1, max_side))
    data = draw(st.binary(min_size=h * w, max_size=h * w))
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w)


@settings(max_examples=40, deadline=None)
@given(gray_images())
def test_png_lossless_roundtrip_property(arr):
    d = M.decode_png(M.encode_png(arr))
    assert (d["width"], d["height"]) == (arr.shape[1], arr.shape[0])
    assert d["luma_sum"] == int(arr.astype(np.int64).sum())


@settings(max_examples=40, deadline=None)
@given(gray_images())
def test_gif_lossless_roundtrip_property(arr):
    d = M.decode_gif(M.encode_gif(arr))
    assert (d["width"], d["height"]) == (arr.shape[1], arr.shape[0])
    assert d["luma_sum"] == int(arr.astype(np.int64).sum())
    assert d["n_frames"] == 1


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 255), st.integers(1, 3), st.integers(1, 3),
       st.integers(30, 95))
def test_jpeg_flat_blocks_near_exact_property(v, bh, bw, quality):
    """Flat images are DC-only: the reconstruction error is bounded by half
    the DC quant step spread over the 8x8 block (step/16), at ANY quality —
    an analytic bound, not a tuned tolerance."""
    flat = np.full((8 * bh, 8 * bw), v, dtype=np.uint8)
    d = J.decode_jpeg(J.encode_jpeg(flat, quality=quality), return_luma=True)
    dc_step = float(J._scaled_quant(J.QUANT_LUMA, quality)[0])
    assert np.abs(d["luma"] - float(v)).max() <= dc_step / 16.0 + 1e-9


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=40))
def test_pdf_string_escape_totality(payload):
    """_pdf_string never raises on any byte content wrapped as a literal
    string token (escapes, octal, stray backslashes, high bytes)."""
    body = payload.replace(b"(", b"").replace(b")", b"")
    out = L._pdf_string(b"(" + body + b")")
    assert isinstance(out, bytes)  # r5: decode happens at emit, per font


def test_robots_pct_normalization_idempotent_cases(spark):
    """normalize_pct is idempotent: applying it twice equals once — checked
    over a grid of escape-heavy paths in one Spark pass."""
    from pyspark.sql import functions as F

    from space_launch_telemetry_analyzer_spark.operators.robots import normalize_pct

    cases = [
        "/a%2fb", "/%7Euser", "/%7euser", "/x%2Ay", "/%zz", "/%4", "%",
        "/a%41%42c", "/%2F%2f%2F", "", "plain", "/%00x", "%25%25", "/%ff",
        "/nested%252Fescape", "/~already", "/%2f%41%7e%2A",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    out = df.select(
        normalize_pct(F.col("s")).alias("once"),
    ).withColumn("twice", normalize_pct(F.col("once"))).collect()
    for r in out:
        assert r.once == r.twice, r


def test_media_chaos_corpus_never_fails_tasks(spark):
    """Adversarial media payloads through the REAL decoders in one
    distributed pass: every row comes back, bad ones as error rows."""
    rng = np.random.RandomState(20260817)
    arr = ((np.arange(64) * 37) % 256).astype(np.uint8).reshape(8, 8)
    good_png = M.encode_png(arr)
    good_gif = M.encode_gif(arr)
    good_jpg = J.encode_jpeg(arr)
    rows = [
        (1, good_png), (2, good_gif), (3, good_jpg),
        (4, good_png[:30]),                       # truncated PNG
        (5, good_gif[: len(good_gif) // 2]),      # truncated GIF
        (6, good_jpg[: len(good_jpg) - 10]),      # truncated JPEG
        (7, b"\x89PNG\r\n\x1a\n" + bytes(rng.randint(0, 256, 100, dtype=np.uint8).tolist())),
        (8, b"GIF89a" + bytes(rng.randint(0, 256, 60, dtype=np.uint8).tolist())),
        (9, b"\xff\xd8\xff" + bytes(rng.randint(0, 256, 80, dtype=np.uint8).tolist())),
        (10, None),
        (11, b""),
        (12, bytes(rng.randint(0, 256, 200, dtype=np.uint8).tolist())),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in
           M.image_features(df, "media_id", "payload", fake=False).collect()}
    assert len(out) == 12  # every row survived
    for mid in (1, 2, 3):
        assert out[mid]["error"] is None and out[mid]["width"] == 8
    for mid in (4, 5, 6, 7, 8, 9, 10):
        assert out[mid]["error"] is not None, mid
    # 11/12 are non-image payloads without fake: NotImplementedError text
    assert "NotImplementedError" in out[12]["error"]
