"""Plot/PNG sink (SURVEY §2.1 S8) — the reference's per-launch metric
charts (plot/flight_plotting.py:160-278: seaborn scatter + optional
10-point rolling trendline for acceleration/g-force + event vlines
range-filtered to the plotted data, one PNG per metric per launch),
re-expressed distributed: one applyInPandas group per (series) renders a
deterministic raster with a pure-numpy rasterizer and encodes it with the
engine's own PNG encoder (operators.multimodal.encode_png) — no
matplotlib/seaborn/fonts anywhere.

Scope note (documented deviation): the raster carries the GEOMETRY of the
reference plot — markers, trendline, event vlines, axes frame and ticks —
while titles/axis labels travel as metadata COLUMNS next to the png
(beautified via the same label rules, queries.path_identity P19/P20);
glyph rasterization is presentation polish with no font tables in scope.
Everything else mirrors the reference semantics: trendline = sort-by-x
then 10-point centered rolling mean with min_periods=5, drawn only when
>10 valid points (flight_plotting.py:207-223); events outside
[min(x), max(x)] of the plotted data are discarded (:243-267).

Scale shape: one shuffle on the series key; each plot renders from its
own group's points in one Python batch; the png bytes (~10-60 KB) are
orders smaller than the input points, so the sink SHRINKS data like the
reference's savefig does — never a collect, never a driver-side loop.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# reference styling analogs (FIGURE_SIZE/MARKER_SIZE, flight_plotting.py)
WIDTH, HEIGHT = 640, 480
MARGIN_L, MARGIN_R, MARGIN_T, MARGIN_B = 60, 20, 30, 40
BG = (255, 255, 255)
FRAME = (0, 0, 0)
MARKER = (31, 80, 180)     # scatter points
TREND = (200, 30, 60)      # 'crimson' rolling average
EVENT = (128, 128, 128)    # gray dashed vlines
N_TICKS = 5
TICK_LEN = 4


def _scale(vals: np.ndarray, lo: float, hi: float, a: int, b: int) -> np.ndarray:
    """Linear data->pixel mapping; degenerate ranges center the points."""
    if hi <= lo:
        return np.full(len(vals), (a + b) // 2, dtype=np.int64)
    t = (vals - lo) / (hi - lo)
    return np.clip(np.rint(a + t * (b - a)), min(a, b), max(a, b)).astype(np.int64)


def render_scatter_array(
    x: np.ndarray,
    y: np.ndarray,
    trend: np.ndarray | None = None,
    events: list[float] | None = None,
    width: int = WIDTH,
    height: int = HEIGHT,
) -> np.ndarray:
    """Deterministic raster: white canvas, black plot frame with N_TICKS
    ticks per axis, 2x2 markers per point, optional trend polyline,
    dashed event vlines. Returns the (height, width, 3) uint8 array;
    render_scatter_png wraps it in the engine's PNG encoder."""
    img = np.empty((height, width, 3), dtype=np.uint8)
    img[:, :] = BG
    x0, x1 = MARGIN_L, width - MARGIN_R - 1
    y0, y1 = MARGIN_T, height - MARGIN_B - 1

    # plot frame + ticks
    img[y0, x0:x1 + 1] = FRAME
    img[y1, x0:x1 + 1] = FRAME
    img[y0:y1 + 1, x0] = FRAME
    img[y0:y1 + 1, x1] = FRAME
    for t in np.linspace(x0, x1, N_TICKS).astype(int):
        img[y1 + 1:y1 + 1 + TICK_LEN, t] = FRAME
    for t in np.linspace(y0, y1, N_TICKS).astype(int):
        img[t, x0 - TICK_LEN:x0] = FRAME

    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    ok = ~(np.isnan(x) | np.isnan(y))
    xv, yv = x[ok], y[ok]
    if len(xv):
        lo_x, hi_x = float(xv.min()), float(xv.max())
        lo_y, hi_y = float(yv.min()), float(yv.max())
        px = _scale(xv, lo_x, hi_x, x0 + 2, x1 - 2)
        # y axis points UP: hi maps to the top row
        py = _scale(yv, lo_y, hi_y, y1 - 2, y0 + 2)

        # event vlines first (markers draw over them, like z-order in mpl)
        for sec in (events or []):
            if sec < lo_x or sec > hi_x:
                continue  # range filter (P17)
            ex = int(_scale(np.array([sec]), lo_x, hi_x, x0 + 2, x1 - 2)[0])
            img[y0 + 1:y1:2, ex] = EVENT  # dashed: every other row

        # trendline polyline (under markers, reference draws it as a line)
        if trend is not None:
            tv = np.asarray(trend, dtype=np.float64)[ok]
            tok = ~np.isnan(tv)
            if tok.sum() >= 2:
                txp = px[tok]
                typ = _scale(tv[tok], lo_y, hi_y, y1 - 2, y0 + 2)
                o = np.argsort(txp, kind="stable")
                txp, typ = txp[o], typ[o]
                for i in range(len(txp) - 1):
                    n = int(max(abs(txp[i + 1] - txp[i]),
                                abs(typ[i + 1] - typ[i]))) + 1
                    xs = np.linspace(txp[i], txp[i + 1], n).astype(int)
                    ys = np.linspace(typ[i], typ[i + 1], n).astype(int)
                    img[ys, xs] = TREND

        # 2x2 markers
        for dx in (0, 1):
            for dy in (0, 1):
                img[np.clip(py + dy, y0, y1), np.clip(px + dx, x0, x1)] = MARKER

    return img


def render_scatter_png(*args, **kwargs) -> bytes:
    """render_scatter_array -> real PNG bytes via the engine's encoder."""
    from .multimodal import encode_png

    return encode_png(render_scatter_array(*args, **kwargs))


def plot_metric(
    df: DataFrame,
    series_col: str,
    x_col: str,
    y_col: str,
    with_trend: bool = False,
    events: list[float] | None = None,
    width: int = WIDTH,
    height: int = HEIGHT,
) -> DataFrame:
    """Distributed plot sink: one PNG per series value. Output schema
    (series, n_points, x_min, x_max, y_min, y_max, png_width, png_height,
    png binary) — the dimensional columns are read back by DECODING the
    freshly-encoded png, so a raster/codec break surfaces in the metadata,
    not just in the bytes. NaN/null y rows are dropped from the plot (the
    reference's notna scatter); with_trend adds the 10-point centered
    rolling mean (min_periods 5) when >10 valid points remain."""
    import pandas as pd

    from .multimodal import decode_png

    narrow = df.select(
        F.col(series_col).alias("series"),
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
    )

    def render(pdf: "pd.DataFrame") -> "pd.DataFrame":
        key = pdf["series"].iloc[0]  # before dropna: group key survives
        pdf = pdf.dropna(subset=["x", "y"]).sort_values("x", kind="stable")
        xs = pdf["x"].to_numpy()
        ys = pdf["y"].to_numpy()
        trend = None
        if with_trend and len(xs) > 10:
            trend = (
                pd.Series(ys).rolling(window=10, center=True, min_periods=5)
                .mean().to_numpy()
            )
        png = render_scatter_png(xs, ys, trend=trend, events=events,
                                 width=width, height=height)
        meta = decode_png(png)
        return pd.DataFrame({
            "series": [key],
            "n_points": [len(xs)],
            "x_min": [float(xs.min()) if len(xs) else None],
            "x_max": [float(xs.max()) if len(xs) else None],
            "y_min": [float(ys.min()) if len(ys) else None],
            "y_max": [float(ys.max()) if len(ys) else None],
            "png_width": [meta["width"]],
            "png_height": [meta["height"]],
            "png": [png],
        })

    return narrow.groupBy("series").applyInPandas(
        render,
        schema="series string, n_points long, x_min double, x_max double, "
               "y_min double, y_max double, png_width int, png_height int, "
               "png binary",
    )
