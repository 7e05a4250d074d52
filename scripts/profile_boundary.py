#!/usr/bin/env python
"""Round-3 boundary profiling: where do the ~470 us/doc-core of Spark-side
overhead (vs the no-Spark control) go at high core counts?

Legs, all in ONE session, sequence run twice and the WARM (second) pass
reported (BENCH.md discipline — JIT/codegen warmup otherwise lies):

  scan        JVM-only parquet scan + length agg (no Python)
  kernel      scan -> mapInArrow extraction -> select 5 -> noop  (no shuffle)
  pre_shuffle current flagship: salted bucket repartition of RAW HTML before
              the kernel
  post_shuffle candidate: kernel first, salted repartition of the (smaller)
              RESULT columns

Usage: python scripts/profile_boundary.py [cores] [n_pages]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORES = int(sys.argv[1]) if len(sys.argv) > 1 else 32
N = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000


def materialize(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    from pyspark.sql import functions as F

    from space_launch_telemetry_analyzer_spark.operators.extract import extract_pages
    from space_launch_telemetry_analyzer_spark.plans.pipeline import (
        salted_repartition, with_bucket,
    )
    from space_launch_telemetry_analyzer_spark.session import get_spark
    from space_launch_telemetry_analyzer_spark.sources.pages import write_synth_pages

    spark = get_spark(app_name=f"profile-{CORES}", master=f"local[{CORES}]",
                      shuffle_partitions=max(CORES, 8))
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="sla_prof_")
    pages_path = os.path.join(tmp, "pages")
    # one file per core so every leg runs full-width (single-row-group
    # files floor the scan-split width; bench does the same)
    write_synth_pages(spark, pages_path, N, partitions=CORES)
    pages = spark.read.parquet(pages_path)
    pages.count()

    OUT = ["url", "bucket", "extracted_text", "speed", "error"]

    def leg_scan():
        materialize(pages.select(F.length("html").alias("l"), "url"))

    def leg_kernel():
        materialize(extract_pages(pages).select(*OUT))

    def leg_pre_shuffle():
        arranged = salted_repartition(with_bucket(pages), CORES * 5, ["bucket"], 4)
        materialize(extract_pages(arranged).select(*OUT))

    def leg_post_shuffle():
        res = extract_pages(pages).select(*OUT)
        materialize(salted_repartition(res, CORES * 5, ["bucket"], 4))

    legs = {"scan": leg_scan, "kernel": leg_kernel,
            "pre_shuffle": leg_pre_shuffle, "post_shuffle": leg_post_shuffle}

    results: dict[str, list[float]] = {k: [] for k in legs}
    for _pass in range(2):
        for name, fn in legs.items():
            t0 = time.perf_counter()
            fn()
            results[name].append(round(time.perf_counter() - t0, 3))

    warm = {k: v[-1] for k, v in results.items()}
    out = {
        "cores": CORES, "n_pages": N,
        "all_passes_sec": results,
        "warm_sec": warm,
        "warm_docs_per_sec": {k: round(N / v, 1) for k, v in warm.items()},
    }
    print(json.dumps(out))
    spark.stop()
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
