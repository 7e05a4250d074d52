#!/usr/bin/env python
"""spark-submit entry point for the flagship extraction job.

Local:    python scripts/run_extraction.py --pages /tmp/pages --out /tmp/results
Cluster:  spark-submit --py-files <pkg.zip> scripts/run_extraction.py \
              --pages s3://bucket/pages --out s3://bucket/results \
              --run-id backfill-2026-08 --buckets 4096 --salt 8

Re-running with the same --run-id resumes from the checkpoint table
(bucket-level anti-join; already-written buckets are skipped).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="input pages table (parquet path)")
    ap.add_argument("--out", required=True, help="result store root")
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--rules", default=None, help="extraction-rule config JSON")
    ap.add_argument("--buckets", type=int, default=256)
    ap.add_argument("--salt", type=int, default=4)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--master", default=None)
    ap.add_argument("--no-audit", action="store_true",
                    help="skip the per-bucket lineage read-back: metrics come "
                         "from df.observe() on the write action (zero passes "
                         "over the output)")
    ap.add_argument("--input-format", default="parquet",
                    choices=["parquet", "jsonl", "warc"],
                    help="pages input format (jsonl is coerced to "
                         "PAGES_SCHEMA; warc reads ISO-28500 archives, one "
                         "task per file, malformed records dropped with a "
                         "logged count)")
    ap.add_argument("--decode-charset", action="store_true",
                    help="sniff charset (BOM > HTTP header label for WARC "
                         "input > meta tag) and re-encode html to utf-8 "
                         "before extraction (non-utf8 corpora)")
    args = ap.parse_args()

    from space_launch_telemetry_analyzer_spark.plans.pipeline import run_extraction
    from space_launch_telemetry_analyzer_spark.rules import RuleConfig, default_config
    from space_launch_telemetry_analyzer_spark.session import get_spark
    from space_launch_telemetry_analyzer_spark.sources.io import ResultStore, iceberg_available
    from space_launch_telemetry_analyzer_spark.sources.pages import load_pages

    spark = get_spark(app_name="sla-extract", master=args.master)
    cfg = RuleConfig.load(args.rules) if args.rules else default_config()
    store = ResultStore(args.out, use_iceberg=False if "/" in args.out else iceberg_available(spark))
    if args.input_format == "warc":
        from pyspark.sql import functions as F

        from space_launch_telemetry_analyzer_spark.sources.validate import (
            validate_pages,
        )
        from space_launch_telemetry_analyzer_spark.sources.warc import load_warc

        raw = load_warc(spark, args.pages)
        # same PAGES_SCHEMA contract + fail-fast gate as load_pages gives
        # parquet/jsonl inputs (url uniqueness, typed optional columns); the
        # validation aggregate is ONE pass and also surfaces the count of
        # malformed records dropped — no separate counting job
        pages = raw.where(F.col("error").isNull()).select(
            "url", "warc_ts", "html",
            F.lit(None).cast("string").alias("text"),
            F.lit(None).cast("string").alias("lang"),
            "http_charset",  # HTTP header label, consumed by --decode-charset
        )
        # re-fetches of one url are routine in real crawl archives: dup
        # urls WARN instead of failing (parquet/jsonl inputs keep the
        # strict gate via load_pages). Dedupe to newest capture with
        # operators.sampling.latest_capture downstream if needed.
        report = validate_pages(pages, require_unique_url=False)
        if not report.ok:
            raise ValueError(f"WARC pages failed validation: {report.reasons()}")
        if report.n_dup_url:
            print(f"warning: {report.n_dup_url} duplicate urls in WARC input "
                  "(kept; dedupe with latest_capture if unintended)",
                  file=sys.stderr)
    else:
        pages = load_pages(spark, args.pages, fmt=args.input_format)
    if args.decode_charset:
        from pyspark.sql import functions as F

        from space_launch_telemetry_analyzer_spark.operators.charset import decode_html

        # WARC inputs carry the HTTP Content-Type charset label — WHATWG
        # ranks it above in-document <meta>, so honor it when present
        hdr_col = "http_charset" if "http_charset" in pages.columns else None
        others = [c for c in pages.columns
                  if c not in ("html", "http_charset")]
        pages = decode_html(pages, header_charset_col=hdr_col).select(
            *others, F.col("html_utf8").alias("html")
        )
    elif "http_charset" in pages.columns:
        pages = pages.drop("http_charset")
    summary = run_extraction(
        spark,
        pages,
        store,
        cfg=cfg,
        run_id=args.run_id,
        n_buckets=args.buckets,
        num_partitions=args.partitions,
        salt_mod=args.salt,
        audit=not args.no_audit,
    )
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
