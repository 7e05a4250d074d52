"""DSIR importance resampling (functions/dsir.py): model determinism,
engine-vs-Python weight exactness, the corpus-adaptive raw fit, selection
tie-break totality, partition invariance, and the plan shape."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from space_launch_telemetry_analyzer_spark.functions import dsir


def _py_weight(text: str, delta: dict, default: int) -> tuple[int, int]:
    feats = dsir._features(text)
    w = sum(delta.get(dsir.feature_bucket(f), default) for f in feats)
    return len(feats), w


def test_delta_table_is_deterministic_and_discriminates():
    d1, def1 = dsir.dsir_delta_table()
    d2, def2 = dsir.dsir_delta_table()
    assert d1 == d2 and def1 == def2
    # a target-corpus phrase scores positive, a raw-corpus phrase negative
    _, w_good = _py_weight("the engine scans the table", d1, def1)
    _, w_junk = _py_weight("click here to subscribe now", d1, def1)
    assert w_good > 0 > w_junk


def test_frozen_weight_pin():
    """Regression pin: the shipped reference corpora and bucket formula
    produce THIS weight for this sentence. Fails if anyone touches
    RAW_REFERENCE_CORPUS, the lexer, N_BUCKETS, or the micro rounding."""
    delta, default = dsir.dsir_delta_table()
    n, w = _py_weight("a fast scan beats a slow scan", delta, default)
    assert (n, w) == (13, 13817150)
    assert default == -137342


def test_spark_weights_match_python(spark):
    delta, default = dsir.dsir_delta_table()
    rows = [
        (1, "the engine scans the table and the planner prunes"),
        (2, "click here to subscribe now limited offer"),
        (3, "a hash join needs a build side"),
        (4, ""),                      # zero tokens -> NULL weight
        (5, "zzzqx unseen words only"),  # default-delta path
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {r["id"]: (r["n_feats"], r["weight_micro"])
           for r in dsir.dsir_weights(df, "id", "text").collect()}
    for i, text in rows:
        n, w = _py_weight(text, delta, default)
        assert got[i] == (n, w if n else None), f"doc {i}"


def test_partition_invariance(spark):
    df = spark.createDataFrame(
        [(i, f"the table scan number {i} runs fast") for i in range(40)],
        "id int, text string")
    a = sorted(map(tuple, dsir.dsir_weights(
        df.coalesce(1), "id", "text").collect()))
    b = sorted(map(tuple, dsir.dsir_weights(
        df.repartition(8), "id", "text").collect()))
    assert a == b


def test_topk_tie_break_is_total(spark):
    # identical text => identical weight; rank must follow id ascending
    df = spark.createDataFrame(
        [(i, "the engine scans the table") for i in (7, 3, 9, 1)],
        "id int, text string")
    top = dsir.dsir_topk(dsir.dsir_weights(df, "id", "text"), 3).collect()
    assert [r["id"] for r in top] == [1, 3, 7]
    assert [r["rank"] for r in top] == [1, 2, 3]


def test_null_weight_sorts_last(spark):
    df = spark.createDataFrame(
        [(1, "the table"), (2, "")], "id int, text string")
    top = dsir.dsir_topk(dsir.dsir_weights(df, "id", "text"), 2).collect()
    assert [r["id"] for r in top] == [1, 2]
    assert top[1]["weight_micro"] is None


def test_fit_raw_bucket_counts_matches_python(spark):
    texts = ["the engine scans the table", "click here to subscribe",
             "a hash join needs a build side"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, text string")
    got = dsir.fit_raw_bucket_counts(df)
    want: Counter = Counter()
    for t in texts:
        for f in dsir._features(t):
            want[dsir.feature_bucket(f)] += 1
    assert got == tuple(sorted(want.items()))


def test_adaptive_raw_fit_demotes_corpus_typical_text(spark):
    """With the raw side fit on the live corpus, a document that IS the
    corpus mode scores lower than under the off-corpus web-junk
    reference — the self-referential discount DSIR exists for."""
    texts = ["the table scan runs fast"] * 20 + ["novel prose here"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, text string")
    raw = dsir.fit_raw_bucket_counts(df)
    probe = spark.createDataFrame(
        [(0, "the table scan runs fast")], "id int, text string")
    w_ref = dsir.dsir_weights(probe, "id", "text").collect()[0]["weight_micro"]
    w_ada = dsir.dsir_weights(
        probe, "id", "text", raw_counts=raw).collect()[0]["weight_micro"]
    assert w_ada < w_ref
    # and the adaptive weight matches the Python recompute exactly
    delta, default = dsir.dsir_delta_table(raw)
    _, w_py = _py_weight("the table scan runs fast", delta, default)
    assert w_ada == w_py


def test_plan_shape(spark):
    df = spark.createDataFrame(
        [(1, "the table scan")], "id int, text string")
    plan = (dsir.dsir_topk(dsir.dsir_weights(df, "id", "text"), 10)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan     # delta table never shuffles
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan  # top-k, not a global sort
    assert "BatchEvalPython" not in plan    # pure JVM expressions


def test_oracle_sql_embeds_integer_table_only():
    sql = dsir.dsir_oracle_sql(250)
    assert "ln(" not in sql and "log(" not in sql  # no libm in the twin
    assert "VALUES" in sql and "LIMIT 250" in sql
