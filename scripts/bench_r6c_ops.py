#!/usr/bin/env python
"""Throughput of the late-r6 operators: HTML -> Markdown conversion and
DSIR importance resampling.

Protocol (memory/bench discipline): one session, generation excluded
(inputs written to parquet first), each leg timed cold then warm with
spark.catalog.clearCache() between; the WARM pass is the number of record.
Run machine-exclusive.

Usage: python scripts/bench_r6c_ops.py [n_docs] [cores]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
CORES = int(sys.argv[2]) if len(sys.argv) > 2 else 32

VOCAB = ("the data and results have merit with careful analysis of every "
         "part spark table row scan filter group value batch window order "
         "column join line query key hash merge sort stream vector").split()


def materialize(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, thunk, results, n, unit="docs"):
    from space_launch_telemetry_analyzer_spark.session import get_spark

    for phase in ("cold", "warm"):
        t0 = time.perf_counter()
        thunk()
        dt = time.perf_counter() - t0
        if phase == "warm":
            results[label] = {"sec": round(dt, 3),
                              f"{unit}_per_sec": round(n / dt, 1)}
        get_spark().catalog.clearCache()


def main() -> None:
    from pyspark.sql import functions as F

    from space_launch_telemetry_analyzer_spark.functions import dsir
    from space_launch_telemetry_analyzer_spark.operators.markdown import (
        to_markdown_pages,
    )
    from space_launch_telemetry_analyzer_spark.session import get_spark

    spark = get_spark(app_name=f"bench-r6c-{CORES}", master=f"local[{CORES}]",
                      shuffle_partitions=max(CORES, 8))
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="bench_r6c_")
    results: dict = {"n_docs": N, "cores": CORES}
    try:
        # ---- inputs (not timed) -----------------------------------------
        vocab_arr = F.array(*[F.lit(w) for w in VOCAB])
        docs = (
            spark.range(N).repartition(CORES * 2)
            .select(
                F.col("id").alias("doc_id"),
                F.concat_ws(" ", *[
                    vocab_arr[F.pmod(F.xxhash64("id", F.lit(i)),
                                     F.lit(len(VOCAB)))]
                    for i in range(40)
                ]).alias("text"),
            )
        )
        docs.write.mode("overwrite").parquet(f"{tmp}/docs")
        docs = spark.read.parquet(f"{tmp}/docs")

        # structured page fixture for the converter (the markdown_pages
        # shape: headings, lists, blockquote, pre, links, emphasis)
        sid = F.col("doc_id").cast("string")
        pages = docs.select(
            F.concat(F.lit("doc://"), sid).alias("url"),
            F.concat(
                F.lit("<html><head><title>x</title></head><body>"
                      "<h1>Doc <em>"), sid,
                F.lit("</em></h1><p>"), F.col("text"),
                F.lit("</p><ul><li>one <strong>a</strong></li><li>two "
                      '<a href="/d">d</a><ul><li>n</li></ul></li></ul>'
                      "<blockquote><p>q</p></blockquote><pre>\nc="), sid,
                F.lit("\n</pre><hr><p>fin <code>t</code></p></body></html>"),
            ).cast("binary").alias("html"),
        )
        pages.write.mode("overwrite").parquet(f"{tmp}/pages")
        pages = spark.read.parquet(f"{tmp}/pages")

        # ---- HTML -> Markdown conversion --------------------------------
        timed("to_markdown_pages",
              lambda: materialize(to_markdown_pages(pages)),
              results, N)

        # ---- DSIR weights + top-k selection -----------------------------
        timed("dsir_weights",
              lambda: materialize(dsir.dsir_weights(docs, "doc_id", "text")),
              results, N)
        timed("dsir_select_topk",
              lambda: dsir.dsir_topk(
                  dsir.dsir_weights(docs, "doc_id", "text"), 1000).collect(),
              results, N)

        # ---- corpus-adaptive raw fit (one extra corpus pass) ------------
        timed("dsir_fit_raw",
              lambda: dsir.fit_raw_bucket_counts(docs),
              results, N)

        # ---- one-pass quality-signal bundle (scan-stage Project) --------
        from space_launch_telemetry_analyzer_spark.operators.text_analysis import (
            gopher_repetition,
            quality_signals,
        )
        timed("quality_signals",
              lambda: materialize(quality_signals(docs, "doc_id", "text")),
              results, N)

        # ---- Gopher repetition rules (scan-stage sorted fold) -----------
        timed("gopher_repetition",
              lambda: materialize(gopher_repetition(docs, "doc_id", "text")),
              results, N)
        timed("gopher_repetition_hashed",
              lambda: materialize(gopher_repetition(
                  docs, "doc_id", "text", exact=False)),
              results, N)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()

    print(json.dumps(results))


if __name__ == "__main__":
    main()
