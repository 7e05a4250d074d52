#!/usr/bin/env python
"""Throughput of the late-r6 retrieval/bucketing ops at 1M docs, local[32].

Same discipline as bench_r6c_ops.py: run in an EXCLUSIVE window (no
concurrent pytest/bench), warm legs = min of runs 2..N in one session.
Usage: python scripts/bench_r6d_ops.py [n_docs]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from space_launch_telemetry_analyzer_spark.session import get_spark  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark(master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    from space_launch_telemetry_analyzer_spark.functions import lm as LM
    from space_launch_telemetry_analyzer_spark.functions import (
        langid_clf as LC,
    )
    from space_launch_telemetry_analyzer_spark.operators import (
        text_analysis as TA,
    )

    # ~15 distinct words/doc from a zipf-ish pool; ascii so lm scores all
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", F.lit("the"),
            *[F.concat(F.lit(f"w{j}_"),
                       F.pmod(F.col("id") * (2 * j + 3), F.lit(50 + j * 997)))
              for j in range(12)],
            F.lit("of data"),
        ).alias("text"),
    ).repartition(32).persist()
    docs.count()
    # 3-paragraph docs for the paragraph-level leg
    docs_paras = docs.select(
        "doc_id",
        F.concat_ws("\n\n", "text", F.lit("the data was clear"),
                    F.reverse("text")).alias("text"),
    ).persist()
    docs_paras.count()

    legs = {
        "inverted_index": lambda: TA.build_inverted_index(
            docs, "doc_id", "text", min_df=2).count(),
        "bm25_from_index": lambda: TA.bm25_from_index(
            TA.build_inverted_index(docs, "doc_id", "text"),
            TA.doc_lengths(docs, "doc_id", "text"),
            ["the", "data", "w0_17"], k=15).count(),
        "perplexity_buckets": lambda: LM.perplexity_buckets(
            docs, "doc_id", "text").count(),
        "ccnet_paragraphs": lambda: LM.ccnet_paragraph_filter(
            docs_paras, "doc_id", "text").count(),
        "langid_clf": lambda: LC.langid_clf_score(
            docs, "doc_id", "text").count(),
    }
    out = {}
    for name, fn in legs.items():
        times = []
        for _ in range(3):
            t = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t)
        warm = min(times[1:])
        out[name] = {"warm_sec": round(warm, 2),
                     "docs_per_sec": round(n / warm),
                     "runs": [round(t, 2) for t in times]}
    print(json.dumps({"n_docs": n, "ops": out}))
    spark.stop()


if __name__ == "__main__":
    main()
