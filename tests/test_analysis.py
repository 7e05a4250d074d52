"""EP2/EP3 composite pipelines + input validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from space_launch_telemetry_analyzer_spark.operators.extract import extract_pages
from space_launch_telemetry_analyzer_spark.plans.analysis import (
    analyze_series,
    compare_launches,
    flatten_results,
)
from space_launch_telemetry_analyzer_spark.sources.pages import synth_pages_df
from space_launch_telemetry_analyzer_spark.sources.validate import validate_pages


@pytest.fixture(scope="module")
def results(spark):
    pages = synth_pages_df(spark, 300, partitions=4)
    return extract_pages(pages).cache()


def test_flatten_results(results):
    flat = flatten_results(results)
    assert "time_sign" in flat.columns and "time" not in flat.columns
    assert flat.count() == 300
    # hoisted struct fields preserved
    row = flat.where(F.col("url").endswith("/page/42")).first()
    assert row["time_sign"] in ("+", "-") and row["speed"] is not None


def test_analyze_series_end_to_end(spark, results):
    flat = flatten_results(results).withColumn(
        "host", F.regexp_extract("url", r"^[a-z]+://([^/]+)", 1)
    ).withColumn("t", F.col("warc_ts").cast("timestamp").cast("double"))
    out = analyze_series(flat, "host", "t", "t", frame_distance=5)
    assert out.count() == 300
    for c in ("speed_clean", "altitude_clean", "fuel_lox_norm", "fuel_ch4_norm",
              "acceleration", "g_force", "accel_trend"):
        assert c in out.columns
    # fuel pair rule: normalized values never diverge by > 30
    bad = out.where(F.abs(F.col("fuel_lox_norm") - F.col("fuel_ch4_norm")) > 30).count()
    assert bad == 0
    # g-force consistent with acceleration
    chk = out.where(F.col("acceleration").isNotNull()) \
        .where(F.abs(F.col("g_force") * 9.81 - F.col("acceleration")) > 1e-9).count()
    assert chk == 0


def test_compare_launches(spark, results):
    flat = flatten_results(results)
    a = flat.limit(50)
    b = flat.limit(80)
    u = compare_launches([("launch_b", b), ("launch_a", a)])
    assert u.count() == 130
    labels = [r["label"] for r in u.select("label").distinct().orderBy("label").collect()]
    assert labels == ["launch_a", "launch_b"]


def test_validate_pages_ok(spark):
    pages = synth_pages_df(spark, 50, partitions=2)
    rep = validate_pages(pages.select("url", "warc_ts", "html", "text", "lang"))
    assert rep.ok and rep.n_rows == 50 and not rep.reasons()


def test_validate_pages_catches_problems(spark):
    bad = spark.createDataFrame(
        [("u1", None), ("u1", None), (None, b"<p>x</p>")], "url string, html binary"
    )
    rep = validate_pages(bad)
    assert not rep.ok
    reasons = " ".join(rep.reasons())
    assert "missing column" in reasons  # warc_ts/text/lang absent
    assert rep.n_null_url == 1 and rep.n_dup_url == 1 and rep.n_null_html == 2

    empty = spark.createDataFrame([], "url string, warc_ts timestamp, html binary, text string, lang string")
    rep2 = validate_pages(empty)
    assert not rep2.ok and any("empty table" in r for r in rep2.reasons())


def test_metric_sweep_introspection(spark):
    """A14: suffix-pattern discovery over the schema — matched columns
    unpivot to (series, metric, value); non-matching columns are skipped;
    multi-token metrics strip cleanly (not the reference's rsplit mangle)."""
    from space_launch_telemetry_analyzer_spark.plans.analysis import metric_sweep

    df = spark.createDataFrame(
        [(1, 10.0, 20.0, 3.5, 7)],
        "fid long, booster_speed double, ship_altitude double, "
        "ship_g_force double, frame_number int",
    )
    rows = {(r.series, r.metric): r.value
            for r in metric_sweep(df, ("speed", "altitude", "g_force"),
                                  id_cols=("fid",)).collect()}
    assert rows == {("booster", "speed"): 10.0,
                    ("ship", "altitude"): 20.0,
                    ("ship", "g_force"): 3.5}


def test_metric_sweep_exact_name_and_no_match(spark):
    from space_launch_telemetry_analyzer_spark.plans.analysis import metric_sweep

    df = spark.createDataFrame([(1.0,)], "speed double")
    out = metric_sweep(df, ("speed",)).collect()
    # a bare metric column is its own series (no prefix to strip)
    assert [(r.series, r.metric, r.value) for r in out] == [("speed", "speed", 1.0)]
    with pytest.raises(ValueError, match="no column matches"):
        metric_sweep(df, ("altitude",))


def test_metric_sweep_rejects_non_numeric_match(spark):
    from space_launch_telemetry_analyzer_spark.plans.analysis import metric_sweep

    df = spark.createDataFrame([("high", 1.0)], "wind_speed string, alt double")
    with pytest.raises(TypeError, match="non-numeric"):
        metric_sweep(df, ("speed",))
