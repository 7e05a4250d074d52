"""fastText-style quality classifier (functions/quality_clf.py)."""

from __future__ import annotations

import importlib.util
import os
import sys

import duckdb

from space_launch_telemetry_analyzer_spark.functions.quality_clf import (
    CLF_DIM,
    _features,
    _load_weights,
    hash_feature,
    quality_clf_oracle_sql,
    quality_clf_score,
    train_quality_clf,
)


def _trainer():
    path = os.path.join(os.path.dirname(__file__), "..", "scripts",
                        "train_quality_clf.py")
    spec = importlib.util.spec_from_file_location("train_quality_clf", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["train_quality_clf"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_committed_weights_match_a_fresh_retrain():
    mod = _trainer()
    pos, neg = mod.build_examples()
    w, b = train_quality_clf(pos, neg, CLF_DIM, iters=2000, lr=2.0, l2=1e-4)
    want = {i: round(x * 1_000_000) for i, x in enumerate(w)
            if round(x * 1_000_000) != 0}
    got_w, got_b, got_d = _load_weights()
    assert got_d == CLF_DIM
    assert got_b == round(b * 1_000_000)
    assert got_w == want, "quality_clf_weights.py drifted from the trainer"


def _py_score(text: str) -> float | None:
    w, b, d = _load_weights()
    fs = _features(text)
    if not fs:
        return None
    return (sum(w.get(hash_feature(f, d), 0) for f in fs) / len(fs)
            / 1_000_000.0 + b / 1_000_000.0)


def test_separates_natural_text_from_noise():
    # held-out probes (not literal training lines)
    natural = [
        "the window orders the rows by key and keeps the first value",
        "a small filter runs before the big join in every query plan",
        "the customer reads the line items and sums the values",
    ]
    noise = [
        "zq xv 7jw kq9 vz0 jx mm2 pp3",
        "table table table table table table table",
        "aaaa bbbb cccc dddd eeee ffff gggg",
    ]
    worst_nat = min(_py_score(t) for t in natural)
    best_noise = max(_py_score(t) for t in noise)
    assert worst_nat > -0.7 > best_noise, (worst_nat, best_noise)


CASES = [
    "The fast scan beats the slow scan.",
    "zq xv gibberish qqq",
    "table table table table",
    "single",
    "",
    "it's the planner's job; we've seen it",
]


def test_spark_matches_independent_recompute(spark):
    df = spark.createDataFrame(
        list(enumerate(CASES)) + [(99, None)], "doc_id long, text string")
    rows = {r["id"]: r for r in quality_clf_score(
        df, "doc_id", "text", keep_threshold=-0.7).collect()}
    for i, t in enumerate(CASES):
        want = _py_score(t)
        if want is None:
            assert rows[i]["score"] is None and rows[i]["keep"] is False
        else:
            assert rows[i]["score"] == want, t
            assert rows[i]["keep"] == (want >= -0.7)
    assert rows[99]["n_feats"] == 0 and rows[99]["keep"] is False


def test_oracle_twin_matches_on_adversarial_values():
    con = duckdb.connect()
    con.sql("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    for i, t in enumerate(CASES + ["trailing newline\n", "café"]):
        con.execute("INSERT INTO documents VALUES (?, ?)", [i, t])
    got = {r[0]: r for r in con.sql(
        quality_clf_oracle_sql(keep_threshold=-0.7)).fetchall()}
    assert len(got) == len(CASES)  # \n and non-ASCII rows scoped out
    for i, t in enumerate(CASES):
        want = _py_score(t)
        if want is None:
            assert got[i][3] is None and got[i][4] is False
        else:
            assert got[i][3] == want, t
            assert got[i][4] == (want >= -0.7)
