"""Validation & derived-metric layer: pure DataFrame window/column operators.

The analysis half of the reference (plot/data_cleaning.py,
plot/data_computation.py, plot/fuel_processing.py,
processing/video_processing/results.py and batch_processing.py), re-expressed
as JVM-side expressions — zero Python UDFs, fully whole-stage-codegen,
shuffling only on the series key (one `Window.partitionBy(series)` shuffle is
shared by every operator here when composed in one select).

At 100 TB scale these windows partition by series/url and order by the series
clock; a per-series window never needs a global sort, so the plan is one hash
shuffle on the (low-cardinality-safe) series key + in-partition sorts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

from ..functions.parse import G_FORCE_CONVERSION

# thresholds from plot/data_cleaning.py:42-45
SPEED_CHANGE_THRESHOLD = 50.0  # km/h
ALTITUDE_CHANGE_THRESHOLD = 1.0  # km
# defaults from plot/data_computation.py:10
DEFAULT_FRAME_DISTANCE = 30
DEFAULT_MAX_ACCEL = 100.0
# fuel-pair rule constants, plot/fuel_processing.py:100-102
FUEL_PAIR_DIFF = 30.0
FUEL_PAIR_T_SPLIT = 200.0
# rolling trendline, plot/flight_plotting.py:214-223 (center=True, window=10,
# min_periods=5 → row offsets −5..+4)
TREND_BEFORE, TREND_AFTER, TREND_MIN_PERIODS = -5, 4, 5


def series_window(series_col: str | Column | None, order_col: str | Column) -> WindowSpec:
    """The one shared window: partition by series (≅ one launch/url host
    series), order by the series clock (≅ real_time_seconds sort at
    plot/data_processing.py:115)."""
    w = Window.partitionBy(series_col) if series_col is not None else Window.partitionBy()
    return w.orderBy(order_col)


# --- A5: abrupt-change outlier nulling (plot/data_cleaning.py:41-59) --------
def delta_outlier_null(value: Column, w: WindowSpec, threshold: float) -> Column:
    """NULL out values whose abs diff vs the previous ROW exceeds threshold.

    Exact pandas `.diff()` semantics: the diff is against the previous row's
    value (NULL prev → NULL diff → keep), computed against ORIGINAL values in
    one pass (nulled rows do not cascade into later diffs).
    """
    diff = F.abs(value - F.lag(value, 1).over(w))
    return F.when(diff > F.lit(threshold), F.lit(None)).otherwise(value)


# --- A9: fixed-offset lead acceleration (plot/data_computation.py:10-74) ----
def lead_acceleration(
    speed_kmh: Column,
    time_seconds: Column,
    w: WindowSpec,
    frame_distance: int = DEFAULT_FRAME_DISTANCE,
    max_accel: float = DEFAULT_MAX_ACCEL,
) -> Column:
    """a[i] = (v[i+k] − v[i]) / (t[i+k] − t[i]) with v in m/s.

    Row-offset (`lead(k)`), NOT time-offset — the reference indexes by
    position (data_computation.py:32-38). Invalid when either speed is NULL
    or Δt ≤ 0; |a| > max_accel → NULL (the cap at :58).
    """
    v = speed_kmh * F.lit(1000.0 / 3600.0)
    v_lead = F.lead(v, frame_distance).over(w)
    t_lead = F.lead(time_seconds, frame_distance).over(w)
    dt = t_lead - time_seconds
    a = F.when(v.isNotNull() & v_lead.isNotNull() & (dt > 0), (v_lead - v) / dt)
    return F.when(F.abs(a) <= F.lit(max_accel), a)


# --- A10: g-force (plot/data_computation.py:77-105) -------------------------
def g_force(acceleration_ms2: Column) -> Column:
    return acceleration_ms2 / F.lit(G_FORCE_CONVERSION)


# --- A11: centered rolling trendline (plot/flight_plotting.py:214-223) ------
def rolling_trend(value: Column, w: WindowSpec) -> Column:
    """pandas rolling(window=10, center=True, min_periods=5).mean():
    row offsets −5..+4; NULL when fewer than 5 non-null values in window."""
    ww = w.rowsBetween(TREND_BEFORE, TREND_AFTER)
    return F.when(F.count(value).over(ww) >= TREND_MIN_PERIODS, F.avg(value).over(ww))


# --- A7: fuel pair normalization (plot/fuel_processing.py:56-114) -----------
def fuel_pair_normalize(lox: Column, ch4: Column, time_seconds: Column) -> tuple[Column, Column]:
    """If |lox − ch4| > 30: both become max(...) when t < 200 else min(...).
    The reference iterates rows (iterrows); this is the same rule as one
    branch-free column expression."""
    diverged = F.abs(lox - ch4) > F.lit(FUEL_PAIR_DIFF)
    chosen = F.when(time_seconds < F.lit(FUEL_PAIR_T_SPLIT), F.greatest(lox, ch4)).otherwise(
        F.least(lox, ch4)
    )
    out = F.when(diverged, chosen)
    return out.otherwise(lox), out.otherwise(ch4)


# --- A8: fuel column coalesce (plot/fuel_processing.py:8-53) -----------------
def fuel_coalesce(*candidates: Column) -> Column:
    """First non-null of the naming variants, default 0 (the reference tries
    4 column-name spellings and falls back to 0, :48-51)."""
    return F.coalesce(*candidates, F.lit(0.0))


# --- A6: engine-count aggregation (plot/data_cleaning.py:65-157) -------------
def engine_active_count(bools: Column) -> Column:
    """size(filter(arr, x→x)); non-list/NULL → 0 (:134-136)."""
    return F.coalesce(F.size(F.filter(bools, lambda x: x)), F.lit(0))


# --- A1: zero-time anchor (batch_processing.py:174-180) ----------------------
def zero_time_anchor(df: DataFrame, series_col: str | None, id_col: str,
                     h: Column, m: Column, s: Column) -> DataFrame:
    """Per-series min id where time == 0:0:0 (sign ignored, as in the
    reference). The reference scans batch results in *completion order* (a
    nondeterminism); WX takes the deterministic global minimum."""
    cond = (h == 0) & (m == 0) & (s == 0)
    keys = [series_col] if series_col else []
    return df.groupBy(*keys).agg(F.min(F.when(cond, F.col(id_col))).alias("zero_id"))


# --- A2: real-time normalization (results.py:12-49) --------------------------
def real_time_columns(id_col: Column, zero_id: Column, fps: float) -> dict[str, Column]:
    """real_time_seconds = (id − zero)/fps plus the h/m/s/ms decomposition.
    Python's `//`/`%` are floor/positive-mod — floor()/pmod() here, so
    negative (pre-T0) times decompose identically."""
    sec = (id_col - zero_id) / F.lit(float(fps))
    return {
        "real_time_seconds": sec,
        "rt_hours": F.floor(sec / 3600).cast("int"),
        "rt_minutes": F.floor(F.pmod(sec, 3600) / 60).cast("int"),
        "rt_seconds": F.floor(F.pmod(sec, 60)).cast("int"),
        "rt_milliseconds": F.floor(F.pmod(sec, 1) * 1000).cast("int"),
    }


# --- ST2: zero-time short-circuit (extract_data.py:112-115) ------------------
def after_anchor_flag(w: WindowSpec, cond: Column) -> Column:
    """True for every row at/after the first row where cond held, within the
    window's partition — the cross-batch `zero_time_met` flag re-expressed as
    a running max (deterministic, series-scoped; the reference scopes it per
    process batch, SURVEY.md §2.4 ST2 documents the deviation)."""
    return F.max(cond.cast("int")).over(w.rowsBetween(Window.unboundedPreceding, 0)) == 1


# --- A3: batch summarize (batch_processing.py:189-208) ------------------------
def summarize_buckets(df: DataFrame, bucket_col: str, id_col: str) -> DataFrame:
    """Per-bucket metrics row: the distributed analog of summarize_batch
    (start/end/count) — feeds the north_rule lineage/metrics sink."""
    return df.groupBy(bucket_col).agg(
        F.min(id_col).alias("start_id"),
        F.max(id_col).alias("end_id"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --- ST3: sampling pushdown (batch_processing.py:30-31) -----------------------
def sample_every_nth(df: DataFrame, id_col: str, n: int) -> DataFrame:
    """Process every Nth row — a pushdown-able filter, evaluated at the scan."""
    return df.where(F.pmod(F.col(id_col), F.lit(n)) == 0)


# --- P14: time-window filter (flight_plotting.py:337-341) ---------------------
def time_window_filter(df: DataFrame, t_col: str, start: float, end: float | None) -> DataFrame:
    """t >= start, and t <= end unless end is None/−1 (the sentinel at
    comparison_plotting.py:154-158)."""
    out = df.where(F.col(t_col) >= F.lit(start))
    if end is not None and end != -1:
        out = out.where(F.col(t_col) <= F.lit(end))
    return out


# --- P17: event range filter (flight_plotting.py:243-267) ---------------------
def event_range_filter(events: DataFrame, t_col: str, data: DataFrame,
                       data_t_col: str) -> DataFrame:
    """Discard event rows outside [min(x), max(x)] of the plotted data
    (flight_plotting.py:243-267; same pattern at engine_plotting.py:88-115,
    fuel_plotting.py:102-129). The bounds are a 1-row aggregate broadcast
    into a crossJoin — one scan of `data`, one filter over `events`, no
    per-row driver logic; at scale the agg is a partial-aggregated 1-row
    shuffle and the join side is trivially broadcastable."""
    bounds = data.agg(
        F.min(data_t_col).alias("__lo"), F.max(data_t_col).alias("__hi")
    )
    return (
        events.crossJoin(F.broadcast(bounds))
        .where(F.col(t_col).between(F.col("__lo"), F.col("__hi")))
        .drop("__lo", "__hi")
    )


def sessionize(df: DataFrame, series_col: str, ts_col: str, id_col: str,
               gap_seconds: float = 30.0) -> DataFrame:
    """Gap-based sessionization: a new session starts whenever the series
    clock jumps more than `gap_seconds` past the previous row. Adds
    `session_id` (0-based per series) via the canonical lag-diff → boundary
    flag → running-sum composition — one shuffle on the series key shared
    with every other window in this module, no state beyond the window
    frame. (The streaming analog lives in streaming.stream_sessionize;
    this batch form is the oracle-checkable twin.)"""
    w = series_window(series_col, ts_col).orderBy(F.col(ts_col), F.col(id_col))
    prev = F.lag(ts_col).over(w)
    boundary = F.when(
        prev.isNull() | (F.col(ts_col) - prev > gap_seconds), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn(
        "session_id",
        (F.sum(boundary).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ) - F.lit(1)).cast("int"),
    )
