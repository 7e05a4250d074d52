"""Byte-level BPE tokenizer (functions/bpe.py, VERDICT r5 Missing #2).

Verification layers, strongest first:
1. the committed merge table equals a fresh retrain (determinism pin);
2. the fast min-rank encoder equals an INDEPENDENT naive reference that
   applies merges in training order (the classic BPE equivalence, checked
   rather than assumed);
3. exact byte round-trip over arbitrary unicode (byte fallback);
4. the DuckDB unrolled SQL twin equals the Python encoder on adversarial
   inputs (same-char runs, contractions, unroll-bound-length words);
5. the pre-tokenizer lexes identically under Python re and DuckDB RE2;
6. the 15-step unroll bound covers every pre-token in the test corpora
   (measured, not assumed).
"""

from __future__ import annotations

import random
import re

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from space_launch_telemetry_analyzer_spark.functions.bpe import (
    _PRETOK_RE,
    PRETOK_PATTERN,
    TRAINING_CORPUS,
    ByteBPE,
    bpe_token_count_oracle_sql,
    default_bpe,
    train_bpe,
)
from space_launch_telemetry_analyzer_spark.functions.bpe_merges import MERGES

ASCII = re.compile(r"\A[ -~]*\Z")


def test_committed_table_matches_a_fresh_retrain():
    got = train_bpe(TRAINING_CORPUS, 256)
    want = [(bytes(a), bytes(b)) for a, b in MERGES]
    assert got == want, "bpe_merges.py drifted from scripts/train_bpe_table.py"


def test_table_is_bijective_and_nontrivial():
    bpe = default_bpe()
    assert len(bpe.merges) >= 100
    assert len(bpe.id_of) == 256 + len(bpe.merges)  # assert in ctor also fires
    # multi-step merges exist (a merged symbol used as a merge operand)
    merged = {a + b for a, b in bpe.merges}
    assert any(a in merged or b in merged for a, b in bpe.merges)


def _naive_encode(bpe: ByteBPE, word: bytes) -> tuple[int, ...]:
    """Independent reference: apply each merge in TRAINING ORDER, scanning
    left-to-right, repeating the full table until fixpoint. No shared code
    with the min-rank loop."""
    syms = [bytes([c]) for c in word]
    changed = True
    while changed:
        changed = False
        for lhs, rhs in bpe.merges:
            i, out = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                    changed = True
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
    return tuple(bpe.id_of[s] for s in syms)


def test_min_rank_loop_equals_training_order_reference():
    bpe = default_bpe()
    rng = random.Random(7)
    alphabet = " abcdefghijklmnopqrstuvwxyzTHE'.,!0123456789"
    words = ["the", " the", "tables", " customer", "it's", "aaaa", "a" * 17,
             "thethethe", " merge", "123456789", "!?!?", ""]
    words += ["".join(rng.choice(alphabet) for _ in range(rng.randint(1, 20)))
              for _ in range(300)]
    for w in words:
        b = w.encode("utf-8")
        assert bpe._encode_word(b) == _naive_encode(bpe, b), w


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_roundtrip_any_unicode(s):
    bpe = default_bpe()
    ids = bpe.encode(s)
    assert bpe.decode(ids) == s.encode("utf-8")
    assert bpe.count(s) == len(ids)
    assert all(0 <= i < 256 + len(bpe.merges) for i in ids)


def test_pretokens_partition_the_text():
    # findall segments must concatenate back to the input (no byte lost)
    for s in [TRAINING_CORPUS, "a  b\t\nc", " leading", "trailing ", "'s'll"]:
        assert "".join(_PRETOK_RE.findall(s)) == s


def test_pretokenizer_matches_duckdb_re2():
    """Python re and DuckDB RE2 must lex identically — the oracle twin's
    ground assumption (leftmost-first alternation, greedy quantifiers)."""
    con = duckdb.connect()
    rng = random.Random(11)
    alphabet = " aZ09'!.\t\n-(&"
    cases = [TRAINING_CORPUS[:500], "it's  they're   i'll", "a1b2c3", ""]
    cases += ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 80)))
              for _ in range(200)]
    for s in cases:
        got = con.execute(
            "SELECT regexp_extract_all(?, ?)", [s, PRETOK_PATTERN]
        ).fetchone()[0]
        assert got == _PRETOK_RE.findall(s), repr(s)


def _oracle_counts(cases: list[str]) -> dict[int, int]:
    con = duckdb.connect()
    con.sql("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    for i, t in enumerate(cases):
        con.execute("INSERT INTO documents VALUES (?, ?)", [i, t])
    return dict(con.sql(bpe_token_count_oracle_sql()).fetchall())


def test_sql_twin_matches_python_on_adversarial_inputs():
    rng = random.Random(42)
    cases = [
        "", " ", "   ", "aaaa", "the the  the   the",
        "it's they're we've i'll he'd isn't",
        "thethethethetheth", "a" * 16, "a" * 17,
        "!!!???...,,,---", "(parens) [brackets] {braces}",
        "123456789012345", "mixedCASEword lowerUPPER",
        '"quoted" & ampersand; semi: colon',
        "tab\tand\nnewline",  # excluded by the ASCII scope filter
        "trailing newline\n",  # excluded: \z (not $) ends the scope filter
        "café résumé",  # ditto (non-ASCII)
    ]
    cases += ["".join(rng.choice(" abcdeTHE',.!0123") for _ in range(rng.randint(0, 60)))
              for _ in range(40)]
    got = _oracle_counts(cases)
    bpe = default_bpe()
    want = {i: bpe.count(t) for i, t in enumerate(cases) if ASCII.match(t)}
    assert got == want


def _encode_steps(bpe: ByteBPE, word: bytes) -> int:
    """How many unrolled SQL steps this word needs (= min-rank loop
    iterations)."""
    syms = [bytes([c]) for c in word]
    steps = 0
    while len(syms) > 1:
        ranks = [bpe.ranks.get(p) for p in zip(syms, syms[1:])]
        ranks = [r for r in ranks if r is not None]
        if not ranks:
            break
        lhs, rhs = bpe.merges[min(ranks)]
        i, out = 0, []
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                out.append(lhs + rhs)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
        steps += 1
    return steps


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_unroll_depth_covers_the_corpus(sf):
    """The oracle unrolls 15 merge steps; every pre-token in every test
    corpus must converge within that bound (measured here, so a corpus or
    merge-table change that breaks the bound fails loudly instead of
    silently under-merging in the oracle)."""
    import pyarrow.dataset as ds
    bpe = default_bpe()
    words = set()
    tbl = ds.dataset(f"/root/testdata/{sf}/documents.parquet").to_table(
        columns=["text"])
    for t in tbl.column("text").to_pylist():
        words.update(_PRETOK_RE.findall(t))
    worst = max(_encode_steps(bpe, w.encode("utf-8")) for w in words)
    assert worst <= 15, f"{sf}: deepest pre-token needs {worst} steps"


def test_pack_sequences_rejects_unknown_counter(spark):
    from space_launch_telemetry_analyzer_spark.operators import text_analysis as TA
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="unknown counter"):
        TA.pack_sequences(df, "doc_id", "text", counter="chars")


def test_spark_udf_nulls_and_counts(spark):
    from pyspark.sql import functions as F

    from space_launch_telemetry_analyzer_spark.functions.bpe import (
        bpe_encode,
        bpe_token_count,
    )
    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "the table"), (3, "café")],
        "doc_id long, text string")
    rows = {r["doc_id"]: (r["n"], r["ids"]) for r in df.select(
        "doc_id",
        bpe_token_count(F.col("text")).alias("n"),
        bpe_encode(F.col("text")).alias("ids"),
    ).collect()}
    bpe = default_bpe()
    assert rows[0] == (None, None)
    assert rows[1] == (0, [])
    assert rows[2][0] == bpe.count("the table") == len(rows[2][1])
    assert bpe.decode(rows[3][1]) == "café".encode("utf-8")


def test_chunks_reassemble_documents_and_respect_budget(spark):
    from pyspark.sql import functions as F

    from space_launch_telemetry_analyzer_spark.functions.bpe import (
        bpe_chunk_documents,
    )
    texts = [
        "the table the value " * 30,
        "short",
        "",
        "punctuation! and, numbers 12345 " * 10,
    ]
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    rows = bpe_chunk_documents(df, "doc_id", "text", max_tokens=16) \
        .orderBy("id", "chunk_id").collect()
    bpe = default_bpe()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["id"], []).append(r)
    for i, t in enumerate(texts):
        got = by_doc.get(i, [])
        # chunks reassemble the document byte-for-byte, in chunk order
        assert "".join(r["text"] for r in got) == t, i
        # chunk ids start at 0 and strictly increase; they are NOT
        # guaranteed dense — a single pre-token costing > max_tokens
        # jumps floor(cum/max) past intermediate ids (review-verified:
        # an 80-token word at max_tokens=16 yields ids [0, 5])
        ids = [r["chunk_id"] for r in got]
        assert ids == sorted(set(ids)) and (not ids or ids[0] == 0)
        # token accounting is exact
        assert sum(r["n_tokens"] for r in got) == bpe.count(t)
        # budget: every chunk except possibly via its LAST pre-token
        # stays under max_tokens + the longest pre-token's cost
        for r in got:
            if r["chunk_id"] < len(got) - 1 or len(got) == 1:
                assert r["n_tokens"] < 16 + 32
    assert by_doc.get(2, []) == []  # empty doc emits no rows


def test_java_pretokenizer_matches_python(spark):
    """bpe_chunk_documents lexes with Spark's Java regexp_extract_all;
    the counts inside come from Python findall — the two engines must
    segment identically on the ASCII scope."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(5)
    cases = ["it's  they're   i'll", "a1b2c3", "", "x" * 40,
             TRAINING_CORPUS[:400].replace("\n", " ")]
    cases += ["".join(rng.choice(" aZ09'!.-(&") for _ in range(rng.randint(0, 80)))
              for _ in range(120)]
    df = spark.createDataFrame(list(enumerate(cases)), "i long, t string")
    got = {r["i"]: r["toks"] for r in df.select(
        "i", F.regexp_extract_all(
            "t", F.lit(PRETOK_PATTERN), F.lit(0)).alias("toks")).collect()}
    for i, s in enumerate(cases):
        assert got[i] == _PRETOK_RE.findall(s), repr(s)


def test_chunk_ids_can_gap_past_a_giant_pretoken(spark):
    """A pre-token costing more than max_tokens jumps chunk ids (floor-
    based assignment, identical in the oracle) — pinned so no consumer
    assumes density."""
    from space_launch_telemetry_analyzer_spark.functions.bpe import (
        bpe_chunk_documents,
    )
    giant = "zq" * 40  # no merges apply -> ~80 tokens
    df = spark.createDataFrame([(0, f"the {giant} end")],
                               "doc_id long, text string")
    ids = [r["chunk_id"] for r in bpe_chunk_documents(
        df, "doc_id", "text", max_tokens=16).orderBy("chunk_id").collect()]
    assert ids[0] == 0 and ids[-1] >= 5 and len(ids) < ids[-1] + 1
