"""Analysis-layer composite pipelines: EP2/EP3 re-expressed (SURVEY.md §3).

EP2 ("visualize flight data", flight_plotting.py:296-456 minus the plotting):
read results -> star-expand nested structs -> engine counts -> series sort ->
fuel coalesce + pair rule -> numeric coercion + Δ-outlier nulling -> lead-k
acceleration + g-force + rolling trend. One DataFrame in, one analysis-ready
DataFrame out; a single series-window shuffle serves every windowed step.

EP3 ("compare multiple launches", comparison_plotting.py:119-237): N result
tables -> per-launch EP2 -> unionByName with a label column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import windows as W


def flatten_results(results: DataFrame) -> DataFrame:
    """A16/A17 analog (plot/data_processing.py:79-112): hoist nested structs
    to flat dot-free columns, drop the raw time struct in favor of the
    normalized timeline downstream."""
    cols = [
        "url", "warc_ts", "bucket",
        F.col("extracted_text"),
        F.col("speed"), F.col("altitude"),
        F.col("fuel_lox"), F.col("fuel_ch4"),
        F.col("time.sign").alias("time_sign"),
        F.col("time.hours").alias("time_hours"),
        F.col("time.minutes").alias("time_minutes"),
        F.col("time.seconds").alias("time_seconds"),
        F.col("engines"), F.col("error"),
    ]
    return results.select(*[c for c in cols])


def analyze_series(
    flat: DataFrame,
    series_col: str,
    order_col: str,
    time_col: str,
    frame_distance: int = W.DEFAULT_FRAME_DISTANCE,
) -> DataFrame:
    """EP2 core (load_and_clean_data + compute_* chain): validation and
    derived metrics in dependency order, all expressions over ONE window."""
    w = W.series_window(series_col, order_col)
    speed_c = W.delta_outlier_null(
        F.col("speed").cast("double"), w, W.SPEED_CHANGE_THRESHOLD
    )
    alt_c = W.delta_outlier_null(
        F.col("altitude").cast("double"), w, W.ALTITUDE_CHANGE_THRESHOLD
    )
    lox = W.fuel_coalesce(F.col("fuel_lox"))
    ch4 = W.fuel_coalesce(F.col("fuel_ch4"))
    lox_n, ch4_n = W.fuel_pair_normalize(lox, ch4, F.col(time_col))
    step1 = flat.select(
        "*",
        speed_c.alias("speed_clean"),
        alt_c.alias("altitude_clean"),
        lox_n.alias("fuel_lox_norm"),
        ch4_n.alias("fuel_ch4_norm"),
    )
    accel = W.lead_acceleration(
        F.col("speed_clean"), F.col(time_col), w, frame_distance=frame_distance
    )
    step2 = step1.withColumn("acceleration", accel)
    return (
        step2.withColumn("g_force", W.g_force(F.col("acceleration")))
        .withColumn("accel_trend", W.rolling_trend(F.col("acceleration"), w))
    )


def metric_sweep(
    df: DataFrame,
    patterns: tuple[str, ...],
    id_cols: tuple[str, ...] = (),
) -> DataFrame:
    """A14: dynamic metric-column sweep. Discovers metric columns by suffix
    pattern over the SCHEMA (driver-side metadata only — the reference walks
    df.columns the same way, comparison_plotting.py:283-304), derives the
    series name from the column prefix (data_processing.py:16-49), and
    unpivots every match into long (series, metric, value) rows.

    Documented deviation: the reference derives the series via
    col.rsplit('_', 1)[0], which mangles multi-token metrics
    ('booster_g_force' -> series 'booster_g'); we strip the MATCHED pattern
    plus its separator ('booster_g_force' -> 'booster'), the intended
    semantics (same precedent as P8).

    Scale shape: one narrow projection + explode — per-row fan-out only, no
    shuffle, no UDF; at 100 TB this pipelines inside the scan stage."""
    numeric = {
        f.name
        for f in df.schema.fields
        if f.dataType.simpleString()
        in ("double", "float", "int", "bigint", "smallint", "tinyint")
        or f.dataType.simpleString().startswith("decimal")
    }
    matches: list[tuple[str, str, str]] = []  # (column, series, metric)
    for col in df.columns:
        for pat in patterns:
            if col == pat or col.endswith("_" + pat):
                if col not in numeric:
                    # a string column matching a metric suffix would cast to
                    # all-NULL doubles and silently corrupt downstream aggs
                    raise TypeError(
                        f"column {col!r} matches metric pattern {pat!r} but "
                        f"is non-numeric ({dict(df.dtypes)[col]})"
                    )
                series = col[: -len(pat)].rstrip("_") or col
                matches.append((col, series, pat))
                break
    if not matches:
        raise ValueError(
            f"no column matches any metric pattern {patterns}: {df.columns}"
        )
    entries = F.array(
        *[
            F.struct(
                F.lit(series).alias("series"),
                F.lit(metric).alias("metric"),
                F.col(col).cast("double").alias("value"),
            )
            for col, series, metric in matches
        ]
    )
    return df.select(*id_cols, F.explode(entries).alias("e")).select(
        *id_cols, "e.series", "e.metric", "e.value"
    )


def compare_launches(labeled: list[tuple[str, DataFrame]]) -> DataFrame:
    """EP3: union per-launch analysis frames under a label column, sorted by
    label (comparison_plotting.py:193-196)."""
    out = None
    for label, df in sorted(labeled, key=lambda kv: kv[0]):
        cur = df.withColumn("label", F.lit(label))
        out = cur if out is None else out.unionByName(cur)
    assert out is not None, "at least one launch required"
    return out
