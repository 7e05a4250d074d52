#!/usr/bin/env python
"""Capture .explain('formatted') for queries into a directory (no execution).

Usage: python scripts/capture_plans.py OUTDIR [--sf DIR] [--queries a,b,c]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--sf", default="/root/testdata/sf1.0")
    ap.add_argument("--queries", default=None)
    args = ap.parse_args()

    from bench import HEADLINE, new_session
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    names = args.queries.split(",") if args.queries else list(HEADLINE)
    spark = new_session(cpus, "capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    from space_launch_telemetry_analyzer_spark.queries import QUERIES

    os.makedirs(args.outdir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, args.sf)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        with open(os.path.join(args.outdir, f"{name}.txt"), "w") as fh:
            fh.write(txt)
        print(name, "ok", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
