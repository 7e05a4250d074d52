"""Window/validation operator tests, cross-checked against pandas
implementations that replicate the reference *exactly* (FIXTURES.md F4:
synthetic series with injected outliers and closed-form expectations)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from space_launch_telemetry_analyzer_spark.operators import windows as W


def make_series(n=200, seed=7) -> pd.DataFrame:
    """Smooth ramp + noise + injected outliers (5%), two series."""
    rng = np.random.RandomState(seed)
    rows = []
    for sid in ("launch_a", "launch_b"):
        t = np.arange(n, dtype=float) * 0.5
        speed = np.clip(t * 12.0 + rng.randn(n), 0, None)
        alt = t * 0.4 + rng.randn(n) * 0.05
        # inject outliers: +200 km/h jumps, +5 km altitude jumps
        out_idx = rng.choice(np.arange(1, n), size=n // 20, replace=False)
        speed[out_idx] += 200.0
        alt[out_idx] += 5.0
        # inject some nulls
        null_idx = rng.choice(np.arange(n), size=n // 25, replace=False)
        speed[null_idx] = np.nan
        lox = np.clip(100 - t * 0.3, 0, 100)
        ch4 = lox.copy()
        div_idx = rng.choice(np.arange(n), size=n // 10, replace=False)
        ch4[div_idx] = np.clip(lox[div_idx] - 45.0, 0, 100)
        for i in range(n):
            rows.append(
                dict(series_id=sid, row_idx=i, real_time_seconds=float(t[i]),
                     speed=None if np.isnan(speed[i]) else float(speed[i]),
                     altitude=float(alt[i]), lox=float(lox[i]), ch4=float(ch4[i]))
            )
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def series_df(spark):
    pdf = make_series()
    df = spark.createDataFrame(pdf).cache()
    df.count()
    return df, pdf


def ref_clean(pdf: pd.DataFrame, col: str, threshold: float) -> pd.Series:
    """Exact reference semantics (plot/data_cleaning.py:41-59) per series."""
    out = []
    for _, g in pdf.groupby("series_id", sort=True):
        s = g.sort_values("row_idx")[col].astype(float).copy()
        diff = s.diff().abs()
        s[diff > threshold] = np.nan
        out.append(s)
    return pd.concat(out)


def test_delta_outlier_null(series_df):
    df, pdf = series_df
    w = W.series_window("series_id", "row_idx")
    got = (
        df.select("series_id", "row_idx",
                  W.delta_outlier_null(F.col("speed"), w, W.SPEED_CHANGE_THRESHOLD).alias("speed"),
                  W.delta_outlier_null(F.col("altitude"), w, W.ALTITUDE_CHANGE_THRESHOLD).alias("altitude"))
        .orderBy("series_id", "row_idx").toPandas()
    )
    exp_speed = ref_clean(pdf, "speed", 50.0).to_numpy()
    exp_alt = ref_clean(pdf, "altitude", 1.0).to_numpy()
    assert np.allclose(got["speed"].to_numpy(), exp_speed, equal_nan=True)
    assert np.allclose(got["altitude"].to_numpy(), exp_alt, equal_nan=True)


def ref_accel(g: pd.DataFrame, k=30, cap=100.0) -> np.ndarray:
    """Exact port of compute_acceleration (plot/data_computation.py:10-74)."""
    v = g["speed"].astype(float).to_numpy() * (1000 / 3600)
    t = g["real_time_seconds"].to_numpy()
    n = len(g)
    a = np.full(n, np.nan)
    idx = np.arange(n - k)
    dv = v[idx + k] - v[idx]
    dt = t[idx + k] - t[idx]
    valid = ~np.isnan(v[idx]) & ~np.isnan(v[idx + k]) & (dt > 0)
    vals = np.full(len(idx), np.nan)
    vals[valid] = dv[valid] / dt[valid]
    ok = valid & (np.abs(vals) <= cap)
    a[idx[ok]] = vals[ok]
    return a


def test_lead_acceleration_and_gforce(series_df):
    df, pdf = series_df
    w = W.series_window("series_id", "row_idx")
    accel = W.lead_acceleration(F.col("speed"), F.col("real_time_seconds"), w)
    got = (
        df.select("series_id", "row_idx", accel.alias("a"), W.g_force(accel).alias("g"))
        .orderBy("series_id", "row_idx").toPandas()
    )
    exp = np.concatenate(
        [ref_accel(g.sort_values("row_idx")) for _, g in pdf.groupby("series_id", sort=True)]
    )
    assert np.allclose(got["a"].to_numpy(), exp, equal_nan=True)
    assert np.allclose(got["g"].to_numpy(), exp / 9.81, equal_nan=True)


def test_rolling_trend(series_df):
    df, pdf = series_df
    w = W.series_window("series_id", "row_idx")
    got = (
        df.select("series_id", "row_idx", W.rolling_trend(F.col("speed"), w).alias("trend"))
        .orderBy("series_id", "row_idx").toPandas()
    )
    exp = np.concatenate(
        [
            g.sort_values("row_idx")["speed"].astype(float)
            .rolling(window=10, center=True, min_periods=5).mean().to_numpy()
            for _, g in pdf.groupby("series_id", sort=True)
        ]
    )
    assert np.allclose(got["trend"].to_numpy(), exp, equal_nan=True)


def ref_fuel(g: pd.DataFrame) -> pd.DataFrame:
    """Exact port of normalize_fuel_levels (plot/fuel_processing.py:56-114)."""
    g = g.copy()
    for idx, row in g.iterrows():
        if abs(row["lox"] - row["ch4"]) > 30:
            chosen = max(row["lox"], row["ch4"]) if row["real_time_seconds"] < 200 else min(row["lox"], row["ch4"])
            g.at[idx, "lox"] = chosen
            g.at[idx, "ch4"] = chosen
    return g


def test_fuel_pair_normalize(series_df):
    df, pdf = series_df
    lox, ch4 = W.fuel_pair_normalize(F.col("lox"), F.col("ch4"), F.col("real_time_seconds"))
    got = (
        df.select("series_id", "row_idx", lox.alias("lox"), ch4.alias("ch4"))
        .orderBy("series_id", "row_idx").toPandas()
    )
    exp = pd.concat(
        [ref_fuel(g.sort_values("row_idx")) for _, g in pdf.groupby("series_id", sort=True)]
    )
    assert np.allclose(got["lox"].to_numpy(), exp["lox"].to_numpy())
    assert np.allclose(got["ch4"].to_numpy(), exp["ch4"].to_numpy())


def test_fuel_coalesce(spark):
    df = spark.createDataFrame(
        [(None, 5.0), (3.0, None), (None, None)], "a double, b double"
    )
    got = [r["f"] for r in df.select(
        W.fuel_coalesce(F.col("a"), F.col("b")).alias("f")).collect()]
    assert got == [5.0, 3.0, 0.0]


def test_engine_active_count(spark):
    df = spark.createDataFrame(
        [([True, False, True],), ([False] * 4,), (None,)],
        "engines array<boolean>",
    )
    got = [r["n"] for r in df.select(W.engine_active_count(F.col("engines")).alias("n")).collect()]
    assert got == [2, 0, 0]  # null array -> 0 (data_cleaning.py:134-136)


def test_zero_time_anchor_and_real_time(spark):
    rows = [
        ("a", 10, 0, 1, 0), ("a", 11, 0, 0, 0), ("a", 12, 0, 0, 0), ("a", 13, 0, 0, 1),
        ("b", 5, 0, 0, 5), ("b", 6, 0, 0, 4),  # no T-0 in series b
    ]
    df = spark.createDataFrame(rows, "sid string, fid long, h int, m int, s int")
    anchors = W.zero_time_anchor(df, "sid", "fid", F.col("h"), F.col("m"), F.col("s"))
    got = {r["sid"]: r["zero_id"] for r in anchors.collect()}
    assert got == {"a": 11, "b": None}

    joined = df.join(F.broadcast(anchors), "sid")
    rt = W.real_time_columns(F.col("fid"), F.col("zero_id"), fps=2.0)
    out = joined.select("sid", "fid", *[c.alias(k) for k, c in rt.items()]) \
        .where(F.col("sid") == "a").orderBy("fid").collect()
    assert [r["real_time_seconds"] for r in out] == [-0.5, 0.0, 0.5, 1.0]
    # negative decomposition: python floor/mod semantics (results.py:36-47)
    assert (out[0]["rt_hours"], out[0]["rt_minutes"], out[0]["rt_seconds"], out[0]["rt_milliseconds"]) == (-1, 59, 59, 500)


def test_after_anchor_flag(spark):
    df = spark.createDataFrame(
        [("a", 1, 5), ("a", 2, 0), ("a", 3, 7), ("a", 4, 0), ("b", 1, 3)],
        "sid string, i long, v int",
    )
    w = W.series_window("sid", "i")
    got = df.select("sid", "i", W.after_anchor_flag(w, F.col("v") == 0).alias("met")) \
        .orderBy("sid", "i").collect()
    assert [r["met"] for r in got] == [False, True, True, True, False]


def test_summarize_and_sampling_and_window(series_df, spark):
    df, _ = series_df
    summ = W.summarize_buckets(df, "series_id", "row_idx").orderBy("series_id").collect()
    assert summ[0]["start_id"] == 0 and summ[0]["end_id"] == 199 and summ[0]["n_rows"] == 200

    sampled = W.sample_every_nth(df, "row_idx", 10)
    assert sampled.count() == 2 * 20

    filt = W.time_window_filter(df, "real_time_seconds", 10.0, 20.0)
    r = filt.agg(F.min("real_time_seconds"), F.max("real_time_seconds")).first()
    assert r[0] >= 10.0 and r[1] <= 20.0
    open_end = W.time_window_filter(df, "real_time_seconds", 10.0, -1)
    assert open_end.agg(F.max("real_time_seconds")).first()[0] == 99.5


def test_event_range_filter(spark):
    """P17: events outside [min, max] of the data's x-range are discarded
    (flight_plotting.py:243-267)."""
    events = spark.createDataFrame(
        [(1, 5.0), (2, 50.0), (3, 150.0), (4, 250.0)], "event_id long, t double"
    )
    data = spark.createDataFrame([(10.0,), (200.0,), (120.0,)], "x double")
    kept = sorted(
        r["event_id"]
        for r in W.event_range_filter(events, "t", data, "x").collect()
    )
    assert kept == [2, 3]  # 5 < min(10), 250 > max(200)
