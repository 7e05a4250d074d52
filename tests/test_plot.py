"""Plot/PNG sink (S8): raster geometry golden checks, PNG roundtrip,
reference-semantics trendline/event filtering, distributed per-series sink.
"""

from __future__ import annotations

import numpy as np
import pytest
import zlib

from pyspark.sql import functions as F

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


def test_bucketed_sink_pixel_identical_to_point_render(spark):
    """The distributed pixel-bucketed path must produce EXACTLY the same
    ink as the point-level renderer for the same data (markers/frame/
    ticks/events; trend off — its per-column averaging is the one
    documented deviation)."""
    rng = np.random.default_rng(11)
    xs = rng.uniform(0, 50, 500)
    ys = rng.uniform(-10, 10, 500)
    df = spark.createDataFrame(
        [("s", float(a), float(b)) for a, b in zip(xs, ys)],
        "vehicle string, t double, v double")
    row = P.plot_metric(df, "vehicle", "t", "v", events=[10.0, 99.0]).first()
    direct = P.render_scatter_array(xs, ys, events=[10.0, 99.0])
    assert np.array_equal(_decode_rgb(bytes(row["png"])), direct)


def test_bucketed_sink_bounds_group_size(spark):
    """VERDICT r4 #1: a 10M-point series must reach the Python render
    stage as canvas-bounded buckets, not raw points. The plan must show
    the (series, px, py) aggregate BELOW the python UDF node, and the
    job must complete returning one row."""
    big = (spark.range(10_000_000)
           .select(F.lit("big").alias("vehicle"),
                   (F.col("id") % 100_000).cast("double").alias("t"),
                   ((F.col("id") * 37) % 997).cast("double").alias("v")))
    out = P.plot_metric(big, "vehicle", "t", "v")
    plan = out._jdf.queryExecution().executedPlan().toString()
    python_at = plan.find("FlatMapGroupsInPandas")
    assert python_at >= 0
    below = plan[python_at:]
    assert "px" in below and "py" in below  # bucket agg feeds the UDF
    row = out.first()
    assert row["n_points"] == 10_000_000
    assert row["png_width"] == P.WIDTH
    # the render saw at most plot-area many marker buckets
    area = (P.WIDTH - P.MARGIN_L - P.MARGIN_R) * \
        (P.HEIGHT - P.MARGIN_T - P.MARGIN_B)
    img = _decode_rgb(bytes(row["png"]))
    assert 0 < (np.all(img == P.MARKER, axis=2)).sum() <= 4 * area


def test_all_null_series_emits_no_row(spark):
    """ADVICE r4: the oracle's WHERE drops groups with zero valid points;
    the sink must agree instead of emitting an n_points=0 row."""
    df = spark.createDataFrame(
        [("dead", 1.0, None), ("dead", None, 2.0), ("live", 1.0, 2.0)],
        "vehicle string, t double, v double")
    rows = P.plot_metric(df, "vehicle", "t", "v").collect()
    assert [r["series"] for r in rows] == ["live"]


def test_font_renders_labels_and_ticks():
    """5x7 font: tick value labels always render; title/xlabel/ylabel on
    request; glyph metrics are consistent."""
    assert P.text_width("ABC") == 3 * P.FONT_PITCH - 1
    img = P.render_scatter_array(
        np.array([0.0, 10.0]), np.array([0.0, 20.0]),
        title="SPEED U1", xlabel="TIME (S)", ylabel="KM/H")
    # title ink in the top margin, centered-ish
    top = img[: P.MARGIN_T - 8]
    assert (np.all(top == P.TEXT, axis=2)).sum() > 40
    # x tick labels under the axis: '0' and '10' leave ink below the frame
    y1 = P.HEIGHT - P.MARGIN_B - 1
    band = img[y1 + P.TICK_LEN + 3: y1 + P.TICK_LEN + 3 + 7]
    assert (np.all(band == P.TEXT, axis=2)).sum() > 10
    # y-axis label ink in the left margin
    left = img[:, :12]
    assert (np.all(left == P.TEXT, axis=2)).sum() > 20
    # unknown glyphs blank, not crash
    P.draw_text(img, 0, 0, "é中")


def test_title_includes_series_key(spark):
    df = spark.createDataFrame([("u7", 1.0, 2.0), ("u7", 3.0, 4.0)],
                               "vehicle string, t double, v double")
    row = P.plot_metric(df, "vehicle", "t", "v", title="ALT").first()
    img = _decode_rgb(bytes(row["png"]))
    direct = P.render_scatter_array(np.array([1.0, 3.0]),
                                    np.array([2.0, 4.0]), title="ALT u7")
    assert np.array_equal(img, direct)
