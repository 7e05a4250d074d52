"""Flagship pipeline: bucketing, salting, lineage/metrics, checkpoint resume."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from space_launch_telemetry_analyzer_spark.plans.pipeline import (
    run_extraction,
    salted_repartition,
    with_bucket,
    with_host,
)
from space_launch_telemetry_analyzer_spark.sources.io import ResultStore
from space_launch_telemetry_analyzer_spark.sources.pages import synth_pages_df

N_PAGES = 1200


@pytest.fixture(scope="module")
def pages(spark):
    df = synth_pages_df(spark, N_PAGES, partitions=8).cache()
    df.count()
    return df


def test_full_run_and_idempotent_rerun(spark, pages, tmp_path_factory):
    store = ResultStore(str(tmp_path_factory.mktemp("store")))
    summary = run_extraction(spark, pages, store, run_id="r1", n_buckets=32)
    assert summary["n_results"] == N_PAGES

    res = store.read_results(spark)
    joined = res.join(pages.select("url", "text"), "url")
    assert joined.where(F.col("extracted_text") != F.col("text")).count() == 0

    # metrics: every row accounted for, lineage keys present
    m = store.read_metrics(spark)
    agg = m.agg(F.sum("n_rows"), F.sum("n_errors"), F.sum("input_bytes")).first()
    assert agg[0] == N_PAGES and agg[1] == 0 and agg[2] > 0
    assert m.where(F.col("partition_id") < 0).count() == 0

    # re-run same run_id: all buckets checkpointed -> nothing reprocessed,
    # results unchanged (exactly-once per bucket)
    summary2 = run_extraction(spark, pages, store, run_id="r1", n_buckets=32)
    assert summary2["n_skipped_buckets"] == 32
    assert store.read_results(spark).count() == N_PAGES


def test_resume_after_partial_run(spark, pages, tmp_path_factory):
    """Crash-resume: first run covers only half the buckets; the second run
    (same run_id) must process exactly the remainder."""
    store = ResultStore(str(tmp_path_factory.mktemp("store")))
    half = with_bucket(pages, 32).where(F.col("bucket") < 16).drop("bucket")
    run_extraction(spark, half, store, run_id="r2", n_buckets=32)
    n_half = store.read_results(spark).count()
    assert 0 < n_half < N_PAGES

    summary = run_extraction(spark, pages, store, run_id="r2", n_buckets=32)
    assert summary["n_skipped_buckets"] == 16
    res = store.read_results(spark)
    assert res.count() == N_PAGES  # no duplicates, no gaps
    assert res.select("url").distinct().count() == N_PAGES
    # byte-identity still holds across the resumed halves
    joined = res.join(pages.select("url", "text"), "url")
    assert joined.where(F.col("extracted_text") != F.col("text")).count() == 0


def test_bucketed_input_skips_shuffle(spark, pages, tmp_path_factory):
    """Pre-bucketed input (Iceberg bucket-transform analog): same results,
    zero runtime Exchange before the kernel."""
    import io
    from contextlib import redirect_stdout

    from space_launch_telemetry_analyzer_spark.operators.extract import extract_pages

    root = tmp_path_factory.mktemp("bucketed")
    with_bucket(pages, 32).write.partitionBy("bucket").parquet(str(root / "pages"))
    bucketed = spark.read.parquet(str(root / "pages")).drop("bucket")

    store = ResultStore(str(root / "store"))
    summary = run_extraction(spark, bucketed, store, run_id="rb", n_buckets=32,
                             input_is_bucketed=True)
    assert summary["n_results"] == N_PAGES
    res = store.read_results(spark)
    joined = res.join(pages.select("url", "text"), "url")
    assert joined.where(F.col("extracted_text") != F.col("text")).count() == 0

    # the plan for the bucketed path has no Exchange before the Python stage
    buf = io.StringIO()
    with redirect_stdout(buf):
        extract_pages(bucketed, n_buckets=32).explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan


def _partition_sizes(df) -> list[int]:
    return [
        r["c"]
        for r in df.groupBy(F.spark_partition_id().alias("p")).agg(F.count("*").alias("c")).collect()
    ]


def test_salting_splits_skewed_host(spark, pages):
    """The synthetic mega-host holds ~30% of rows. Partitioning by host alone
    puts all of it in one partition; the salt must spread it (north_rule:
    salting effectiveness demonstrated via partition-size metrics)."""
    hosts = with_host(pages)
    mega = hosts.groupBy("host").count().orderBy(F.desc("count")).first()
    assert mega["host"] == "mega.example.com" and mega["count"] >= 0.25 * N_PAGES

    unsalted = hosts.repartition(8, F.col("host"))
    salted = salted_repartition(hosts, 8, ["host"], salt_mod=8)
    max_unsalted = max(_partition_sizes(unsalted))
    max_salted = max(_partition_sizes(salted))
    assert max_unsalted >= mega["count"]  # skew visible without salt
    assert max_salted < 0.6 * max_unsalted  # salt split the heavy key


def test_poison_pages_become_error_rows(spark, tmp_path_factory):
    """Null html, invalid UTF-8, and tag soup flow through the WHOLE pipeline
    as data — rows preserved, errors counted in the lineage metrics, never a
    task failure (frame_processing.py:41-50 semantics end-to-end)."""
    rows = [
        ("https://p.example.com/ok",
         b"<p>a perfectly fine page with enough words here</p>", 1),
        ("https://p.example.com/null", None, 2),
        ("https://p.example.com/badutf", b"<p>bad \xff\xfe bytes but still words enough here</p>", 3),
        ("https://p.example.com/soup", b"<<<< &&& >>>>", 4),
    ]
    df = spark.createDataFrame(rows, "url string, html binary, row_idx long")
    store = ResultStore(str(tmp_path_factory.mktemp("poison")))
    summary = run_extraction(spark, df, store, run_id="p", n_buckets=4)
    assert summary["n_results"] == 4  # every row survived
    res = {r["url"].rsplit("/", 1)[-1]: r for r in store.read_results(spark).collect()}
    assert res["ok"]["error"] is None and res["ok"]["extracted_text"].startswith("a perfectly")
    assert res["null"]["error"] == "null html"
    assert res["badutf"]["error"] is None  # decoded with replacement chars
    assert "words enough here" in res["badutf"]["extracted_text"]
    m = store.read_metrics(spark).agg(F.sum("n_rows"), F.sum("n_errors")).first()
    assert m[0] == 4 and m[1] == 1


def test_large_pages(spark, tmp_path_factory):
    """Real-CC-sized pages (~120 KB html): the adaptive byte-budget batch
    sizing must keep the job memory-safe and correct."""
    from space_launch_telemetry_analyzer_spark.sources.pages import (
        expected_text, paragraphs_of, render_page,
    )

    def big_paragraphs(i: int) -> list[str]:
        return [p * 100 for p in paragraphs_of(i, n_paras=8)]

    rows = [
        (f"https://big.example.com/{i}",
         render_page(i, big_paragraphs(i)).encode(),
         "\n".join(big_paragraphs(i)), i)
        for i in range(64)
    ]
    df = spark.createDataFrame(rows, "url string, html binary, text string, row_idx long")
    assert df.select(F.max(F.octet_length("html"))).first()[0] > 100_000

    store = ResultStore(str(tmp_path_factory.mktemp("big")))
    run_extraction(spark, df, store, run_id="big", n_buckets=8)
    res = store.read_results(spark)
    joined = res.join(df.select("url", "text"), "url")
    assert joined.where(F.col("extracted_text") != F.col("text")).count() == 0
    # adaptive sizing picked a smaller batch for fat rows
    assert int(spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")) < 8192


def test_bucket_uniformity(spark, pages):
    """url-hash buckets stay uniform despite host skew (the reason the
    flagship layout buckets by url hash, not host)."""
    sizes = [r["c"] for r in with_bucket(pages, 32).groupBy("bucket").agg(F.count("*").alias("c")).collect()]
    assert len(sizes) == 32
    assert max(sizes) < 3 * (N_PAGES / 32)
