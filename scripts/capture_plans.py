#!/usr/bin/env python
"""Regenerate PLANS.md: capture `explain("formatted")` for the flagship
extraction layouts and a representative query set, so physical plans are
reviewable without a Spark session.

Usage: python scripts/capture_plans.py [sf_dir]   (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

QUERY_SET = [
    "pricing_summary",
    "nation_revenue",
    "outlier_nulling",
    "minhash_pairs",
    "dedup_survivors",
    "paragraph_dedup",
    "dup_ngram_mask",
    "embedding_topk",
    "ann_lsh_topk",
    "ivf_ann_topk",
    "decontaminate",
    "event_range_filter",
    "flatten_results",
    "pii_redact",
    "repetition_filter",
    "hash_sample",
    "quota_sample",
    "doc_frequency",
    "tfidf_topk",
    "kmeans_centroids",
    "sessionize",
    "link_graph",
    "pagerank",
    "pagerank_dangling",
    "bpe_token_count",
    "pack_sequences_bpe",
    "bpe_chunk_documents",
    "lm_bigram_score",
    "quality_clf_filter",
    "decontaminate_bloom",
    "semdedup",
    "subtitle_lang_route",
    "mix_sample",
    "markdown_pages",
    "dsir_select",
    "quality_signals",
    "gopher_repetition",
    "html_tables",
    "split_sentences",
    "mix_plan",
    "perplexity_buckets",
    "inverted_index",
    "bm25_from_index",
    "ccnet_paragraphs",
    "langid_clf",
    "metric_sweep",
    "normalize_text_nfc",
    "robots_filter",
    "plot_sink",
    "png_decode",
    "jpeg_decode",
    "webp_decode",
    "vp8_decode",
    "gif_anim_frames",
    "webp_anim_frames",
    "mp4_probe",
    "subtitle_cues",
    "pdf_layout",
    "pdf_winansi",
    "page_metadata",
    "hreflang_clusters",
    "sitemap_parse",
    "feed_parse",
    "robots_sitemaps",
    "anchor_texts",
    "fetch_waves",
    "frontier_new",
    "cdx_index",
    "wet_roundtrip",
    "wat_roundtrip",
    "gopher_filter",
    "c4_line_filter",
    "pack_sequences",
    "bm25_topk",
    "url_blocklist",
]


def formatted(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import functions as F  # noqa: F401

    from space_launch_telemetry_analyzer_spark.operators.extract import extract_pages
    from space_launch_telemetry_analyzer_spark.plans.pipeline import (
        salted_repartition, with_bucket,
    )
    from space_launch_telemetry_analyzer_spark.queries import QUERIES
    from space_launch_telemetry_analyzer_spark.session import get_spark
    from space_launch_telemetry_analyzer_spark.sources.pages import synth_pages_df

    spark = get_spark(app_name="capture-plans", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    sections: list[tuple[str, str]] = []

    # flagship layouts over a written parquet pages table (so scans are real)
    import tempfile

    tmp = tempfile.mkdtemp(prefix="plans_pages_")
    pages_path = os.path.join(tmp, "pages")
    synth_pages_df(spark, 2000).write.mode("overwrite").parquet(pages_path)
    pages = spark.read.parquet(pages_path)
    # r3 shape: kernel on the scan splits, salted (bucket, salt) layout
    # exchange AFTER it (BENCH.md #17) — check: NO Exchange below MapInArrow
    res = extract_pages(with_bucket(pages))
    post = salted_repartition(
        res.select("url", "bucket", "extracted_text", "speed", "error"),
        64, ["bucket"], 4)
    sections.append(
        ("Flagship extraction (mapInArrow on scan splits -> salted bucket layout)",
         formatted(post))
    )
    clustered_path = os.path.join(tmp, "clustered")
    with_bucket(pages, 32).write.partitionBy("bucket").parquet(clustered_path)
    clustered = spark.read.parquet(clustered_path).drop("bucket")
    sections.append(
        ("Flagship extraction, bucket-clustered input (shuffle-free)",
         formatted(extract_pages(clustered, n_buckets=32)))
    )

    for name in QUERY_SET:
        sections.append((f"query: {name}", formatted(QUERIES[name](spark, sf_dir))))

    # frontier bloom pre-filter (r6): executedPlan (not explain-formatted —
    # the localCheckpoint truncates lineage, so capture both halves).
    # Facts to check: the _maybe_seen Filter sits BELOW the anti-join's
    # candidate-side Exchange (only bloom hits shuffle); the definite-new
    # branch reaches the Union join-free; the probe is ArrowEvalPython in
    # the pre-checkpoint plan.
    from space_launch_telemetry_analyzer_spark.operators.sitemap import (
        bloom_might_contain, frontier_bloom, frontier_new,
    )
    cand = spark.createDataFrame(
        [(f"https://h/{i}",) for i in range(50)], "url string")
    seen = spark.createDataFrame(
        [(f"https://h/{i}",) for i in range(0, 50, 2)], "url string")
    bloom = frontier_bloom(seen)
    full = frontier_new(cand, seen, bloom=bloom) \
        ._jdf.queryExecution().executedPlan().toString()
    probe = cand.withColumn("hit", bloom_might_contain(bloom, F.col("url"))) \
        ._jdf.queryExecution().executedPlan().toString()
    sections.append((
        "operator: frontier_new(bloom=...) — bloom pre-filter (r6)",
        "DOWNSTREAM (post-checkpoint):\n" + full
        + "\nPROBE (pre-checkpoint):\n" + probe))

    out = [
        '# PLANS — captured physical plans (`explain("formatted")`, local[8])',
        "",
        "Regenerated by scripts/capture_plans.py so the plans are reviewable",
        "without a Spark session. Things to check: `ReadSchema` column pruning,",
        "`PushedFilters`, join strategies (BroadcastHashJoin everywhere a dim is",
        "small), single `Exchange` per window chain, and the absence of any",
        "Exchange before `MapInArrow` on bucket-clustered input.",
        "",
    ]
    for title, plan in sections:
        lines = plan.rstrip().splitlines()
        if len(lines) > 400:
            lines = lines[:400] + [f"... [{len(lines) - 400} lines truncated]"]
        out += [f"## {title}", "", "```", "\n".join(lines), "```", ""]
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "PLANS.md"),
              "w", encoding="utf-8") as f:
        f.write("\n".join(out))
    print(f"PLANS.md regenerated ({len(sections)} sections)")
    spark.stop()


if __name__ == "__main__":
    main()
