#!/usr/bin/env python
"""Throughput of the late-r5 operators at 1M synthetic documents.

Protocol (memory/bench discipline): one session, generation excluded
(parquet written first), each operator timed cold then warm with
spark.catalog.clearCache() between operators; the WARM pass is the number
of record. Run machine-exclusive.

Usage: python scripts/bench_late_r5_ops.py [n_docs] [cores]
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


def main() -> None:
    from pyspark.sql import functions as F

    from space_launch_telemetry_analyzer_spark.operators import dedup as D
    from space_launch_telemetry_analyzer_spark.operators import (
        text_analysis as TA,
    )
    from space_launch_telemetry_analyzer_spark.session import get_spark

    spark = get_spark(master=f"local[{CORES}]")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="later5_")
    path = os.path.join(tmp, "docs")

    # ---- generate 1M 4-paragraph docs, ~64 words each (not timed) ------
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    nv = len(VOCAB)

    def para(seed: int, words: int):
        return F.concat_ws(" ", *[
            F.element_at(vocab, ((F.col("id") * 7 + seed * 13 + k * 3)
                                 % nv + 1).cast("int"))
            for k in range(words)
        ])

    text = F.concat_ws(
        "\n\n",
        para(1, 20),
        # shared boilerplate paragraph on 25% of docs (dedup target)
        F.when(F.col("id") % 4 == 0,
               F.lit("subscribe to our newsletter for updates and offers"))
        .otherwise(para(2, 16)),
        para(3, 16),
        para(4, 12),
    )
    spark.range(N).select(
        F.col("id").alias("doc_id"), text.alias("text")
    ).repartition(CORES).write.mode("overwrite").parquet(path)

    results: dict = {"n_docs": N, "cores": CORES}

    def leg(name, build):
        docs = spark.read.parquet(path)
        for phase in ("cold", "warm"):
            t0 = time.monotonic()
            materialize(build(docs))
            dt = time.monotonic() - t0
            if phase == "warm":
                results[name] = {
                    "warm_sec": round(dt, 3),
                    "docs_per_sec": round(N / dt, 1),
                }
        spark.catalog.clearCache()

    leg("exact_dedup", lambda d: D.exact_dedup(d, "text", "doc_id"))
    leg("paragraph_dedup",
        lambda d: D.paragraph_dedup(d, "doc_id", "text"))
    leg("dup_ngram_mask",
        lambda d: D.dup_ngram_mask(d, "doc_id", "text", k=10))
    leg("gopher_filter", lambda d: TA.gopher_filter(d, "doc_id", "text"))
    leg("c4_line_filter", lambda d: TA.c4_line_filter(d, "doc_id", "text"))
    leg("pack_sequences",
        lambda d: TA.pack_sequences(d, "doc_id", "text", seq_len=2048))

    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
