"""Plot/PNG sink (S8): raster geometry golden checks, PNG roundtrip,
reference-semantics trendline/event filtering, distributed per-series sink.
"""

from __future__ import annotations

import numpy as np
import pytest
import zlib

from space_launch_telemetry_analyzer_spark.operators import multimodal as M
from space_launch_telemetry_analyzer_spark.operators import plot as P


def _decode_rgb(png: bytes) -> np.ndarray:
    """Raw RGB pixels back out of our own filter-0 PNG (test-side inverse)."""
    d = M.decode_png(png)
    h, w = d["height"], d["width"]
    # reuse the module's chunk walker for the raw IDAT
    idat = b"".join(data for ctype, data in M._png_chunks(png) if ctype == b"IDAT")
    raw = zlib.decompress(idat)
    px = M._png_unfilter(raw, w, h, 3)
    return px.reshape(h, w, 3)


def test_raster_frame_ticks_and_marker_positions():
    # two points at the range corners land at the plot-rect corners
    img = P.render_scatter_array(np.array([0.0, 10.0]), np.array([0.0, 20.0]))
    x0, x1 = P.MARGIN_L, P.WIDTH - P.MARGIN_R - 1
    y0, y1 = P.MARGIN_T, P.HEIGHT - P.MARGIN_B - 1
    assert tuple(img[y0, x0]) == P.FRAME and tuple(img[y1, x1]) == P.FRAME
    assert tuple(img[y1 + 1, x0]) == P.FRAME  # tick below frame
    # (0,0) -> bottom-left marker; (10,20) -> top-right marker
    assert tuple(img[y1 - 2, x0 + 2]) == P.MARKER
    assert tuple(img[y0 + 2, x1 - 2]) == P.MARKER
    # background stays white away from ink
    assert tuple(img[5, 5]) == P.BG


def test_raster_survives_png_roundtrip_exactly():
    arr = P.render_scatter_array(np.arange(20.0), np.arange(20.0) ** 2)
    back = _decode_rgb(M.encode_png(arr))
    assert np.array_equal(arr, back)


def test_event_vlines_range_filtered_and_dashed():
    x = np.array([0.0, 10.0])
    y = np.array([0.0, 1.0])
    img_in = P.render_scatter_array(x, y, events=[5.0])
    img_out = P.render_scatter_array(x, y, events=[55.0])  # outside range
    x0, x1 = P.MARGIN_L + 2, P.WIDTH - P.MARGIN_R - 3
    ex = int(round(x0 + 0.5 * (x1 - x0)))
    col_in = img_in[:, ex]
    assert (col_in == P.EVENT).all(axis=1).sum() > 100  # dashed line present
    col_out = img_out[:, ex]
    assert (col_out == P.EVENT).all(axis=1).sum() == 0  # filtered (P17)


def test_trendline_drawn_in_crimson():
    x = np.arange(30.0)
    y = np.sin(x / 5) * 10
    trend = np.convolve(y, np.ones(5) / 5, mode="same")
    img = P.render_scatter_array(x, y, trend=trend)
    assert (np.all(img == P.TREND, axis=2)).sum() > 50


def test_degenerate_inputs():
    # single point: centered, no crash; empty: frame only
    img1 = P.render_scatter_array(np.array([3.0]), np.array([7.0]))
    assert (np.all(img1 == P.MARKER, axis=2)).sum() == 4  # one 2x2 marker
    img0 = P.render_scatter_array(np.array([]), np.array([]))
    assert (np.all(img0 == P.MARKER, axis=2)).sum() == 0
    # NaNs dropped
    imgn = P.render_scatter_array(np.array([0.0, np.nan, 1.0]),
                                  np.array([0.0, 5.0, np.nan]))
    assert (np.all(imgn == P.MARKER, axis=2)).sum() == 4  # only (0,0) plots


def test_plot_metric_distributed(spark):
    """One png per series; trendline kicks in only above 10 valid points
    (flight_plotting.py:207); metadata columns read back via decode."""
    import pandas as pd

    rows = []
    for i in range(40):
        rows.append(("s16", float(i % 16), float((i * 7) % 23), ))
    for i in range(6):
        rows.append(("s6", float(i), float(i * 2)))
    df = spark.createDataFrame(rows, "vehicle string, t double, v double")

    out = {r["series"]: r for r in
           P.plot_metric(df, "vehicle", "t", "v", with_trend=True).collect()}
    assert set(out) == {"s16", "s6"}
    big, small = out["s16"], out["s6"]
    assert big["n_points"] == 40 and small["n_points"] == 6
    assert big["png_width"] == P.WIDTH and big["png_height"] == P.HEIGHT
    assert (big["x_min"], big["x_max"]) == (0.0, 15.0)

    big_img = _decode_rgb(bytes(big["png"]))
    small_img = _decode_rgb(bytes(small["png"]))
    # >10 points -> crimson trend drawn; <=10 -> none
    assert (np.all(big_img == P.TREND, axis=2)).sum() > 0
    assert (np.all(small_img == P.TREND, axis=2)).sum() == 0


def test_plot_metric_null_heavy_group(spark):
    df = spark.createDataFrame(
        [("a", 1.0, None), ("a", 2.0, 5.0), ("a", None, 3.0)],
        "vehicle string, t double, v double",
    )
    row = P.plot_metric(df, "vehicle", "t", "v").first()
    assert row["series"] == "a" and row["n_points"] == 1
    assert row["png_width"] == P.WIDTH
