"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship extraction query on /root/testdata/sf0.001
queries()     -> one entry per implemented operator (SURVEY.md §2 + the
                 training-data operators), each (spark, sf_dir) -> DataFrame
oracle_sql()  -> exact DuckDB twins for EVERY query: minhash/simhash use
                 planted-exact-dup fixtures (LSH recall provably 1.0, pair set
                 = shingle-set/token-multiset equality joins); the embedding
                 LSH oracles are structural twins (closed-form hyperplane
                 weights reproduced as explicit left-fold SQL).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from space_launch_telemetry_analyzer_spark.queries import ORACLES, QUERIES  # noqa: E402
from space_launch_telemetry_analyzer_spark.session import ship_package  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: deterministic telemetry pages built over sf0.001 documents,
    run through the full DOM-extraction kernel (boilerplate strip + field
    spans). Driver checks rows > 0 and a stable schema."""
    ship_package(spark)  # executors must import the kernel's module
    return QUERIES["extract_field_spans"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ship_package(spark)
            # oracle parity requires UTC wall-clock interpretation of the
            # parquet TIMESTAMP_NTZ columns regardless of the host session
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
