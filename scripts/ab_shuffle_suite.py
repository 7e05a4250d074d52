"""Machine-exclusive A/B of the shuffle-heavy query suite (VERDICT r4 item 1).

The driver's r4 bench window showed ann_lsh_topk/simhash_pairs/dedup_survivors/
minhash_pairs/pagerank/kmeans_centroids 1.4-4.2x slower than r3 while git
diffstat shows ZERO changes to their source between rounds.  This script runs
the exact bench.py protocol (cold, clearCache, warm, clearCache) for just that
suite, several passes, in a window with nothing else running, so the result can
be compared to both driver windows: parity with the r3 band == contention
confirmed; parity with the r4 band == a real (environmental or code) slowdown
that needs bisecting.

Usage: python scripts/ab_shuffle_suite.py [passes]
"""
from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SUITE = [
    "minhash_pairs",
    "dedup_survivors",
    "simhash_pairs",
    "embedding_topk",
    "ann_lsh_topk",
    "pagerank",
    "kmeans_centroids",
]


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("ab-shuffle-suite")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from space_launch_telemetry_analyzer_spark.queries import QUERIES

    results: dict[str, dict] = {q: {"cold": None, "warm": []} for q in SUITE}
    for p in range(passes):
        for name in SUITE:
            t0 = time.perf_counter()
            QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            spark.catalog.clearCache()
            if p == 0:
                results[name]["cold"] = dt
            else:
                results[name]["warm"].append(dt)
        print(f"pass {p} done", file=sys.stderr)
    spark.stop()
    out = {
        q: {
            "cold": r["cold"],
            "warm_min": min(r["warm"]) if r["warm"] else None,
            "warm": r["warm"],
        }
        for q, r in results.items()
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
