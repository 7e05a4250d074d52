"""Bigram-LM quality scoring (functions/lm.py — CCNet-style perplexity
filter with exact integer micro-nat cross-engine arithmetic)."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from space_launch_telemetry_analyzer_spark.functions import lm as LM
from space_launch_telemetry_analyzer_spark.functions.lm import (
    LM_TOKEN_PATTERN,
    _TOKEN_RE,
    bigram_lm_oracle_sql,
    bigram_lm_score,
    bigram_lm_tables,
)


def test_tables_shape_and_determinism():
    bg, ug, oov = bigram_lm_tables()
    bg2, ug2, oov2 = bigram_lm_tables()
    assert (bg, ug, oov) == (bg2, ug2, oov2)
    assert len(bg) > 150 and len(ug) > 100
    # every log-prob is negative; a seen bigram beats the same w1's
    # unseen fallback (c12+1 >= 2 > 1 in the same-denominator ratio)
    assert all(lp < 0 for lp in bg.values()) and oov < 0
    assert all(bg[(a, b)] > ug[a] for (a, b) in bg)


def _py_score(text: str) -> tuple[int, int | None]:
    """Independent recompute of (n_bigrams, sum_lp_micro) straight from
    the tables — no shared scoring code with the Spark operator."""
    bg, ug, oov = bigram_lm_tables()
    toks = _TOKEN_RE.findall(text.lower())
    pairs = list(zip(toks, toks[1:]))
    if not pairs:
        return 0, None
    return len(pairs), sum(
        bg.get(p, ug.get(p[0], oov)) for p in pairs)


CASES = [
    "The fast scan beats the slow scan.",
    "it's the planner's job",
    "zzz qqq xxx unseen words everywhere",
    "single",
    "",
    "12 34 the 56",
    "a a a a a",
]


def test_spark_scores_match_independent_recompute(spark):
    df = spark.createDataFrame(
        list(enumerate(CASES)) + [(99, None)], "doc_id long, text string")
    rows = {r["id"]: r for r in bigram_lm_score(df, "doc_id", "text").collect()}
    for i, t in enumerate(CASES):
        n, s = _py_score(t)
        assert rows[i]["n_bigrams"] == n, t
        assert rows[i]["sum_lp_micro"] == s, t
        if n:
            want = s / n / 1_000_000.0
            assert rows[i]["avg_logprob"] == want
            assert rows[i]["keep"] == (want >= -6.0)
        else:
            assert rows[i]["avg_logprob"] is None
            assert rows[i]["keep"] is False
    # null text: no tokens -> 0 bigrams, keep=false (never a crash)
    assert rows[99]["n_bigrams"] == 0 and rows[99]["keep"] is False


def test_oracle_twin_matches_on_adversarial_values():
    con = duckdb.connect()
    con.sql("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    for i, t in enumerate(CASES):
        con.execute("INSERT INTO documents VALUES (?, ?)", [i, t])
    got = {r[0]: r for r in con.sql(bigram_lm_oracle_sql()).fetchall()}
    for i, t in enumerate(CASES):
        n, s = _py_score(t)
        assert got[i][1] == n and got[i][2] == s, t
        if n:
            assert got[i][3] == s / n / 1_000_000.0


def test_natural_text_outscores_gibberish(spark):
    df = spark.createDataFrame(
        [(0, "the query plans the scan and the filter and the join"),
         (1, "zq xv qj wk vz jx kq zx vq jw")],
        "doc_id long, text string")
    rows = {r["id"]: r["avg_logprob"]
            for r in bigram_lm_score(df, "doc_id", "text").collect()}
    assert rows[0] > rows[1]


def test_token_pattern_is_re2_safe():
    # same lexer both engines (no lookahead; leftmost-first is moot for a
    # single character-class pattern, but pin it anyway)
    con = duckdb.connect()
    for s in ["it's 42 ok", "", "a1b", "''", "UPPER lower"]:
        got = con.execute(
            "SELECT regexp_extract_all(lower(?), ?)",
            [s, LM_TOKEN_PATTERN]).fetchone()[0]
        assert got == _TOKEN_RE.findall(s.lower()), s


# ---------------------------------------------------------------------------
# perplexity_buckets (CCNet head/middle/tail)
# ---------------------------------------------------------------------------

def _bucket_fixture_rows():
    """10 scoreable docs with strictly distinct LM quality (natural text
    down to gibberish) + 2 unscorable (< 2 tokens)."""
    natural = "the launch was a success and the data was clear"
    rows = []
    for i in range(10):
        # progressively corrupt: replace i words with OOV junk
        words = natural.split()
        for j in range(i):
            words[j % len(words)] = f"zzq{i}x{j}"
        rows.append((i, " ".join(words)))
    rows += [(100, "single"), (101, "   ")]
    return rows


def test_perplexity_buckets_thirds_and_unscored(spark):
    df = spark.createDataFrame(_bucket_fixture_rows(),
                               "doc_id long, text string")
    out = LM.perplexity_buckets(df, "doc_id", "text")
    rows = {r["id"]: r for r in out.collect()}
    assert len(rows) == 12
    scored = [r for r in rows.values() if r["bucket"] != "unscored"]
    assert len(scored) == 10
    from collections import Counter
    c = Counter(r["bucket"] for r in scored)
    # n=10: head = rank*3<=10 -> ranks 1-3, middle ranks 4-6, tail 7-10
    assert c == {"head": 3, "middle": 3, "tail": 4}
    assert rows[100]["bucket"] == "unscored" and rows[100]["rank"] is None
    assert rows[101]["bucket"] == "unscored"
    # ranks are a permutation of 1..10 and ordered by avg_logprob desc
    by_rank = sorted(scored, key=lambda r: r["rank"])
    assert [r["rank"] for r in by_rank] == list(range(1, 11))
    avgs = [r["avg_logprob"] for r in by_rank]
    assert avgs == sorted(avgs, reverse=True)


def test_perplexity_buckets_partition_independent(spark):
    """The distributed prefix-sum rank must not depend on the physical
    partitioning (the pack_sequences guarantee)."""
    rows = _bucket_fixture_rows()
    want = None
    for parts in (1, 3, 16):
        df = spark.createDataFrame(
            rows, "doc_id long, text string").repartition(parts)
        got = sorted(
            (r["id"], r["rank"], r["bucket"])
            for r in LM.perplexity_buckets(df, "doc_id", "text").collect())
        if want is None:
            want = got
        assert got == want, f"partitioning {parts} changed ranks"


def test_perplexity_buckets_tie_break_by_id(spark):
    """Identical texts score identically; the deterministic tie-break is
    the smaller id ranked first."""
    df = spark.createDataFrame(
        [(7, "the launch was a success"), (3, "the launch was a success"),
         (5, "zzq gibberish tokens qqz")],
        "doc_id long, text string")
    rows = {r["id"]: r["rank"] for r in
            LM.perplexity_buckets(df, "doc_id", "text").collect()}
    # identical scores -> adjacent ranks with the smaller id first
    assert rows[7] == rows[3] + 1


# ---------------------------------------------------------------------------
# ccnet_paragraph_filter (paragraph-level cleaning)
# ---------------------------------------------------------------------------

def test_ccnet_paragraph_filter_drops_tail_and_rebuilds(spark):
    """9 scoreable paragraphs across 3 docs -> tail third dropped;
    unscored (short) paragraphs are kept; rebuild preserves positional
    order with the blank-line separator."""
    good = "the launch was a success and the data was clear"
    def noisy(i):
        return " ".join(f"zzq{i}x{j}" for j in range(8))
    docs = [
        (1, "\n\n".join([good, noisy(1), good])),
        (2, "\n\n".join([noisy(2), "ok", good])),        # 'ok' unscored
        (3, "\n\n".join([good, noisy(3), noisy(4)])),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           LM.ccnet_paragraph_filter(df, "doc_id", "text").collect()}
    assert all(out[d]["n_paras"] == 3 for d in (1, 2, 3))
    # 8 scored paras: keep rank*3 <= 2*8 -> ranks 1..5; +1 unscored = 6
    total_kept = sum(out[d]["n_kept"] for d in (1, 2, 3))
    assert total_kept == 6
    # the strongest invariant: kept text contains good, order preserved
    assert out[1]["text_clean"].startswith(good)
    assert out[2]["text_clean"].endswith(good)
    assert "ok" in out[2]["text_clean"]


def test_ccnet_paragraph_filter_keeps_fully_dropped_doc_row(spark):
    df = spark.createDataFrame(
        [(7, "solo")], "doc_id long, text string")
    # one unscored paragraph -> kept; now force a drop of everything
    out = LM.ccnet_paragraph_filter(
        df, "doc_id", "text", drop=("tail", "unscored")).collect()
    assert [(r["doc_id"], r["text_clean"], r["n_paras"], r["n_kept"])
            for r in out] == [(7, "", 1, 0)]


def test_ccnet_paragraph_filter_empty_paragraphs_survive(spark):
    """Runs of blank lines yield empty paragraphs — unscored, kept, and
    rebuilt in place so document structure is stable."""
    df = spark.createDataFrame(
        [(1, "a b\n\n\n\nc d")], "doc_id long, text string")
    # drop=() keeps every bucket: the rebuild must reproduce the text
    out = LM.ccnet_paragraph_filter(
        df, "doc_id", "text", drop=()).collect()[0]
    assert out["n_paras"] == 3 and out["n_kept"] == 3
    assert out["text_clean"] == "a b\n\n\n\nc d"
    # default drop: the worse of the two scored paragraphs goes
    out2 = LM.ccnet_paragraph_filter(df, "doc_id", "text").collect()[0]
    assert out2["n_kept"] == 2
