#!/usr/bin/env python
"""Extra benchmarks for optimization work (guide §1): per-query isolated
warm timing with the noop sink, plus .explain("formatted") capture.

bench.py is FROZEN for the driver's measurement; this file exists so the
optimization rounds can time subsets quickly and capture plans without
touching it. Methodology matches bench.py's query loop: full materialize
via noop sink, clearCache between runs, cold + N warm runs, min-of-warm
reported (contention only inflates readings).

Usage:
  python bench_extra.py [--sf DIR] [--queries a,b,c] [--warm N] [--explain OUTDIR] [--tag NAME]
Prints one JSON line {"sf":..., "queries": {name: warm_sec}, "queries_cold": {...}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import HEADLINE, materialize, new_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default=None,
                    help="comma-separated query names (default: bench.py HEADLINE)")
    ap.add_argument("--warm", type=int, default=2)
    ap.add_argument("--explain", default=None,
                    help="directory to write <query>.txt explain('formatted') dumps")
    ap.add_argument("--tag", default="")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    names = args.queries.split(",") if args.queries else list(HEADLINE)

    spark = new_session(cpus, f"bench-extra{('-' + args.tag) if args.tag else ''}")
    spark.sparkContext.setLogLevel("ERROR")
    from space_launch_telemetry_analyzer_spark.queries import QUERIES

    def timed_run(name: str) -> float:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        t0 = time.perf_counter()
        materialize(QUERIES[name](spark, args.sf))
        dt = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        return dt

    queries: dict[str, float] = {}
    queries_cold: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for name in names:
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = QUERIES[name](spark, args.sf)
            with open(os.path.join(args.explain, f"{name}.txt"), "w") as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        queries_cold[name] = timed_run(name)
        reads = [timed_run(name) for _ in range(args.warm)]
        samples[name] = reads
        queries[name] = min(reads)
        print(f"# {name}: cold={queries_cold[name]} warm={reads}", file=sys.stderr)
    spark.stop()

    print(json.dumps({
        "sf": args.sf, "cpus": cpus, "tag": args.tag,
        "queries": queries, "queries_cold": queries_cold,
        "queries_samples": samples,
        "value": round(sum(queries.values()), 3),
    }))


if __name__ == "__main__":
    main()
