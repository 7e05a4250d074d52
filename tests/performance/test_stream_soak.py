"""Streaming soak for the stateful twins (VERDICT r2 item 9): 100k events
through many micro-batch triggers, asserting (a) batch/stream equality holds
at soak scale and (b) the state store stays BOUNDED — watermark eviction
observed for dropDuplicatesWithinWatermark, constant two-scalar state per
series for sessionization.

Env-gated like the rest of the perf suite:

    SLA_PERF=1 python -m pytest tests/performance/test_stream_soak.py -q -s
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

RUN_PERF = bool(os.environ.get("SLA_PERF"))
pytestmark = pytest.mark.skipif(not RUN_PERF, reason="set SLA_PERF=1 to run perf tests")

N_EVENTS = 100_000
N_FILES = 20


def _state_rows(query) -> list[int]:
    """numRowsTotal of the (single) state operator per completed trigger."""
    out = []
    for p in query.recentProgress:
        ops = p.get("stateOperators") or []
        if ops:
            out.append(int(ops[0]["numRowsTotal"]))
    return out


def test_stream_exact_dedup_soak_state_bounded(spark, tmp_path):
    """20 files x 5k docs; each file re-sends 1k texts from the PREVIOUS file
    (in-horizon dups, must drop) while event time advances 10 min/file
    against a 15-min watermark, so fingerprints older than ~2 files must be
    EVICTED: peak state stays near 2 files' worth, nowhere near the 81k
    distinct texts seen overall."""
    from space_launch_telemetry_analyzer_spark.streaming.stream import (
        stream_exact_dedup,
    )

    per_file = N_EVENTS // N_FILES
    in_path = tmp_path / "pages"
    in_path.mkdir()
    for i in range(N_FILES):
        start = i * per_file
        fresh = spark.range(start, start + per_file - 1000 if i else start + per_file)
        cur = fresh.select(
            F.concat(F.lit("doc://"), F.col("id")).alias("url"),
            (F.lit(1_700_000_000 + i * 600) + (F.col("id") % 60))
            .cast("timestamp").alias("warc_ts"),
            F.concat(F.lit("text body number "), F.col("id")).alias("text"),
        )
        if i:
            prev_start = (i - 1) * per_file
            dup = spark.range(prev_start, prev_start + 1000).select(
                F.concat(F.lit("dup://"), F.col("id")).alias("url"),
                (F.lit(1_700_000_000 + i * 600) + (F.col("id") % 60))
                .cast("timestamp").alias("warc_ts"),
                F.concat(F.lit("text body number "), F.col("id")).alias("text"),
            )
            cur = cur.unionByName(dup)
        cur.coalesce(1).write.parquet(str(in_path / f"f{i:03d}"))

    stream = (
        spark.readStream.schema("url string, warc_ts timestamp, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_path / "*"))
    )
    out_path = str(tmp_path / "out")
    q = (
        stream_exact_dedup(stream, watermark="15 minutes")
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=600)
    states = _state_rows(q)
    out = spark.read.parquet(out_path)

    n_distinct = N_EVENTS - (N_FILES - 1) * 1000  # every text unique once
    assert out.count() == n_distinct
    assert out.where(F.col("url").startswith("dup://")).count() == 0

    # the watermark must have evicted: ≥2 triggers observed, peak state well
    # under the distinct-text total and near the 2-file horizon
    assert len(states) >= N_FILES
    peak = max(states)
    horizon = 3 * (per_file + 1000)  # watermark lag makes ~2-3 files live
    assert peak <= horizon, f"state grew to {peak} (> {horizon}): no eviction"
    assert peak < n_distinct // 4
    # eviction actually observed: state shrank at least once mid-run
    assert any(b < a for a, b in zip(states, states[1:])), states
    print(f"\ndedup soak: out={out.count()} peak_state={peak} states={states}")


def test_stream_sessionize_soak_matches_batch(spark, tmp_path):
    """100k events, 200 series, 10 triggers: session ids equal the batch
    operator's at soak scale and state is exactly one row per series."""
    from space_launch_telemetry_analyzer_spark.operators.windows import sessionize
    from space_launch_telemetry_analyzer_spark.streaming.stream import (
        stream_sessionize,
    )

    n_series = 200
    n_files = 10
    per_file = N_EVENTS // n_files
    schema = "series string, row_id long, ts double"
    in_path = tmp_path / "ev"
    in_path.mkdir()
    # ts strictly increases with row_id within each series (10s steps); every
    # 37th per-series event jumps by an extra 1000s, far over the 30s gap, so
    # sessions split at deterministic points
    def frame(lo, hi):
        j = (F.col("id") / n_series).cast("long")  # per-series event index
        return spark.range(lo, hi).select(
            F.concat(F.lit("s"), (F.col("id") % n_series)).alias("series"),
            F.col("id").alias("row_id"),
            (j * 10.0 + (j / 37).cast("long") * 1000.0).alias("ts"),
        )

    for i in range(n_files):
        frame(i * per_file, (i + 1) * per_file).coalesce(1).write.parquet(
            str(in_path / f"f{i:02d}")
        )

    q = (
        stream_sessionize(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(in_path / "*")),
            gap_seconds=30.0,
        )
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "cp"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=600)
    states = _state_rows(q)
    assert states and max(states) <= n_series, states  # 2 scalars per series

    got = spark.read.parquet(str(tmp_path / "out"))
    batch = frame(0, N_EVENTS)
    want = sessionize(batch, "series", "ts", "row_id", gap_seconds=30.0)
    assert got.count() == N_EVENTS
    diff = (
        got.select("row_id", "session_id")
        .join(
            want.select("row_id", F.col("session_id").alias("want_sid")),
            "row_id",
        )
        .where(F.col("session_id") != F.col("want_sid"))
        .count()
    )
    assert diff == 0
    print(f"\nsessionize soak: rows={N_EVENTS} max_state={max(states)}")
