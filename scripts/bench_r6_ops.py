#!/usr/bin/env python
"""Throughput of the r6 operators: real byte-level BPE token counting and
the frontier bloom pre-filter A/B.

Protocol (memory/bench discipline): one session, generation excluded
(inputs written to parquet first), each leg timed cold then warm with
spark.catalog.clearCache() between; the WARM pass is the number of record.
Run machine-exclusive.

Usage: python scripts/bench_r6_ops.py [n_docs] [cores]
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
    for phase in ("cold", "warm"):
        t0 = time.perf_counter()
        thunk()
        dt = time.perf_counter() - t0
        if phase == "warm":
            results[label] = {"sec": round(dt, 3),
                              f"{unit}_per_sec": round(n / dt, 1)}
        # clear between and after so later legs aren't timed under this
        # leg's storage pressure
        from space_launch_telemetry_analyzer_spark.session import get_spark
        get_spark().catalog.clearCache()


def main() -> None:
    from pyspark.sql import functions as F

    from space_launch_telemetry_analyzer_spark.functions.bpe import (
        bpe_token_count,
    )
    from space_launch_telemetry_analyzer_spark.operators.sitemap import (
        frontier_bloom,
        frontier_new,
    )
    from space_launch_telemetry_analyzer_spark.session import get_spark

    spark = get_spark(app_name=f"bench-r6-{CORES}", master=f"local[{CORES}]",
                      shuffle_partitions=max(CORES, 8))
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="bench_r6_")
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

        # frontier tables: seen = 2M urls; two candidate mixes of 500k —
        # "steady" (80% already seen: mature-crawl worst case for the
        # bloom, small bypass fraction) and "expand" (80% new: frontier
        # expansion, most candidates bypass the anti-join shuffle)
        n_seen, n_cand = 2_000_000, 500_000
        spark.range(n_seen).select(
            F.concat(F.lit("https://h"), F.pmod(F.col("id"), F.lit(997)),
                     F.lit(".example/p/"), F.col("id")).alias("url")
        ).write.mode("overwrite").parquet(f"{tmp}/seen")
        for mix, seen_pct in (("steady", 4), ("expand", 1)):
            spark.range(n_cand).select(
                F.when(F.pmod("id", F.lit(5)) < seen_pct,
                       F.pmod(F.abs(F.xxhash64("id")), F.lit(n_seen)))
                .otherwise(
                    F.pmod(F.abs(F.xxhash64("id", F.lit(9))),
                           F.lit(n_seen)) + n_seen).alias("nid")
            ).select(
                F.concat(F.lit("https://h"),
                         F.pmod(F.col("nid"), F.lit(997)),
                         F.lit(".example/p/"), F.col("nid")).alias("url")
            ).write.mode("overwrite").parquet(f"{tmp}/cand_{mix}")
        seen = spark.read.parquet(f"{tmp}/seen")

        # ---- BPE token counting ------------------------------------------
        timed("bpe_token_count",
              lambda: materialize(docs.select(
                  "doc_id", bpe_token_count(F.col("text")).alias("n"))),
              results, N)

        # ---- bigram LM scoring ---------------------------------------------
        from space_launch_telemetry_analyzer_spark.functions.lm import (
            bigram_lm_score,
        )
        timed("lm_bigram_score",
              lambda: materialize(bigram_lm_score(docs, "doc_id", "text")),
              results, N)

        # ---- quality classifier + BPE chunker ------------------------------
        from space_launch_telemetry_analyzer_spark.functions.bpe import (
            bpe_chunk_documents,
        )
        from space_launch_telemetry_analyzer_spark.functions.quality_clf import (
            quality_clf_score,
        )
        timed("quality_clf_score",
              lambda: materialize(quality_clf_score(docs, "doc_id", "text")),
              results, N)
        timed("bpe_chunk_documents",
              lambda: materialize(bpe_chunk_documents(
                  docs, "doc_id", "text", max_tokens=32)),
              results, N)

        # ---- decontamination: broadcast set vs bloom -----------------------
        from space_launch_telemetry_analyzer_spark.operators.dedup import (
            decontaminate,
            decontaminate_bloom,
        )
        bench_docs = docs.where(F.col("doc_id") % 13 == 0).select("text")
        timed("decontaminate_exact",
              lambda: materialize(decontaminate(
                  docs, bench_docs, "doc_id", "text", "text")),
              results, N)
        timed("decontaminate_bloom",
              lambda: materialize(decontaminate_bloom(
                  docs, bench_docs, "doc_id", "text", "text",
                  m_bits=1 << 26, hashes=10)),
              results, N)

        # ---- SemDeDup (embedding-cluster dedup) -----------------------------
        # n^2/k within-cluster pairs is the operator's inherent cost; the
        # leg sizes n=20k, k=128 (~3M candidate pairs, 64-dim fold cosine)
        from space_launch_telemetry_analyzer_spark.operators.similarity import (
            semdedup,
        )
        n_vec, n_cent = 20_000, 128
        emb = spark.range(n_vec).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(64)),
                lambda i: (F.pmod(F.xxhash64("id", i), F.lit(1000))
                           .cast("double") / 500.0 - 1.0),
            ).alias("vec"))
        emb.write.mode("overwrite").parquet(f"{tmp}/emb")
        emb = spark.read.parquet(f"{tmp}/emb")
        cents = emb.where(F.col("vec_id") < n_cent).select(
            F.col("vec_id").alias("cid"), F.col("vec").alias("cvec"))
        timed("semdedup_exact",
              lambda: materialize(semdedup(
                  emb, "vec_id", "vec", cents, "cid", "cvec",
                  threshold=0.95)),
              results, n_vec, unit="vec")
        timed("semdedup_fast",
              lambda: materialize(semdedup(
                  emb, "vec_id", "vec", cents, "cid", "cvec",
                  threshold=0.95, exact=False)),
              results, n_vec, unit="vec")

        # ---- frontier A/B -------------------------------------------------
        t0 = time.perf_counter()
        bloom = frontier_bloom(seen)
        results["bloom_build_sec"] = round(time.perf_counter() - t0, 3)
        results["bloom_mib"] = round(bloom.m / 8 / 2**20, 1)
        for mix in ("steady", "expand"):
            cand = spark.read.parquet(f"{tmp}/cand_{mix}")
            timed(f"frontier_plain_{mix}",
                  lambda: materialize(frontier_new(cand, seen)),
                  results, n_cand, unit="cand")
            timed(f"frontier_bloom_{mix}",
                  lambda: materialize(frontier_new(cand, seen, bloom=bloom)),
                  results, n_cand, unit="cand")
    finally:
        spark.stop()
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
