"""Chaos-corpus integration: one mixed adversarial corpus through the WHOLE
flagship path (ingest -> charset decode -> extraction -> store -> dedup +
quality), asserting the error channel and row accounting add up exactly —
no row lost, no task failure, every malformed input visible in data."""

from __future__ import annotations

import codecs

import pytest
from pyspark.sql import functions as F

from space_launch_telemetry_analyzer_spark.operators.charset import decode_html
from space_launch_telemetry_analyzer_spark.operators.dedup import exact_dedup
from space_launch_telemetry_analyzer_spark.operators.extract import extract_pages
from space_launch_telemetry_analyzer_spark.operators.text_analysis import quality_score
from space_launch_telemetry_analyzer_spark.sources.pages import (
    expected_text, paragraphs_of, render_page,
)

N_GOLDEN = 40


@pytest.fixture(scope="module")
def chaos(spark):
    """~60 pages: golden html (incl. one exact-dup pair and utf-16
    variants), null html, empty html, multi-megabyte page, binary junk,
    tag soup, 1-token docs."""
    rows = []
    for i in range(N_GOLDEN):
        html = render_page(i, paragraphs_of(i)).encode()
        if i % 10 == 3:
            html = codecs.BOM_UTF16_LE + render_page(i, paragraphs_of(i)).encode("utf-16-le")
        rows.append((f"https://chaos.example/golden/{i}", html, "golden"))
    # exact duplicate of golden/0 under a new url
    rows.append(("https://chaos.example/dup-of-0",
                 render_page(0, paragraphs_of(0)).encode(), "dup"))
    rows.append(("https://chaos.example/null", None, "null"))
    rows.append(("https://chaos.example/empty", b"", "empty"))
    para = (b"<p>" + b"long pad sentence with many plain words that reads "
            b"like genuine article content for the density classifier " * 4
            + b"</p>")
    rows.append(("https://chaos.example/huge",
                 b"<html><body>" + para * 12_000 + b"</body></html>",
                 "huge"))  # ~5 MB, 12k content-density blocks
    rows.append(("https://chaos.example/binary",
                 bytes(range(256)) * 40, "binary"))
    rows.append(("https://chaos.example/soup",
                 b"<div><p>un<closed <b>bold<i>nested</div></p></span>",
                 "soup"))
    rows.append(("https://chaos.example/short", b"<p>hi</p>", "short"))
    df = spark.createDataFrame(rows, "url string, html binary, kind string")
    return df.repartition(7).cache()


def test_chaos_end_to_end_accounting(spark, chaos):
    n_in = chaos.count()

    # charset decode never drops or fails a row
    dec = decode_html(chaos)
    assert dec.count() == n_in
    utf16 = dec.where(F.col("charset") == "utf-16-le").count()
    assert utf16 == len([i for i in range(N_GOLDEN) if i % 10 == 3])

    # extraction: exactly one output row per input row; only null html errors
    res = extract_pages(
        dec.select("url", F.col("html_utf8").alias("html"), "kind")
        .withColumn("warc_ts", F.lit(None).cast("timestamp"))
    ).cache()
    assert res.count() == n_in
    errs = {r.url: r.error for r in res.where(F.col("error").isNotNull()).collect()}
    assert set(errs) == {"https://chaos.example/null"}

    # golden byte-identity holds through the chaos mix (incl. utf-16 originals)
    got = {r.url: r.extracted_text for r in res.collect()}
    for i in range(N_GOLDEN):
        assert got[f"https://chaos.example/golden/{i}"] == expected_text(i), i

    # huge page processed linearly, content preserved
    assert "long pad sentence" in got["https://chaos.example/huge"]

    # downstream ops run over the full mixed output without losing rows
    texted = res.select("url", F.coalesce("extracted_text", F.lit("")).alias("text"))
    q = texted.select("url", quality_score(F.col("text")).alias("q"))
    assert q.count() == n_in

    groups = exact_dedup(texted.where(F.length("text") > 0), "text", "url")
    # the planted dup pair collapses into one group of size 2
    pair = groups.where(F.col("n_dups") >= 2).collect()
    assert any(
        r.n_dups == 2 and r.keep_id in
        ("https://chaos.example/dup-of-0", "https://chaos.example/golden/0")
        for r in pair
    )
