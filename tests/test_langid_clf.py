"""Trained char-n-gram language classifier (functions/langid_clf.py —
the fastText-style lang-id CCNet fronts its pipeline with)."""

from __future__ import annotations

import duckdb

from space_launch_telemetry_analyzer_spark.functions.langid_clf import (
    LANGID_CLASSES,
    _char_grams,
    _hash_gram,
    langid_clf_oracle_sql,
    langid_clf_score,
    langid_clf_tables,
)

# held-out sentences — none appear in the training corpora
HELD_OUT = [
    (0, "the ship sails in the morning and the sky is blue", "en"),
    (1, "das schiff faehrt am morgen und der himmel ist blau", "de"),
    (2, "le navire part le matin et le ciel est bleu", "fr"),
    (3, "we measure the speed of the booster during the test", "en"),
    (4, "wir messen die geschwindigkeit der stufe bei der pruefung", "de"),
    (5, "nous mesurons la vitesse de la fusee pendant le test", "fr"),
    (6, "", "und"),
    (7, "   ", "und"),
]


def _py_decide(text: str) -> tuple[str, list[int], int]:
    """Independent recompute straight from the tables."""
    w, b = langid_clf_tables()
    grams = _char_grams(text)
    if not grams:
        return "und", [0, 0, 0], 0
    sums = [0, 0, 0]
    for g in grams:
        row = w.get(_hash_gram(g))
        if row:
            for c in range(3):
                sums[c] += row[c]
    t = [b[c] * len(grams) + sums[c] for c in range(3)]
    if t[0] >= t[1] and t[0] >= t[2]:
        lang = "de"
    elif t[1] >= t[2]:
        lang = "en"
    else:
        lang = "fr"
    return lang, t, len(grams)


def test_tables_deterministic_and_integer():
    w1, b1 = langid_clf_tables()
    w2, b2 = langid_clf_tables()
    assert (w1, b1) == (w2, b2)
    assert len(w1) > 300
    assert all(isinstance(x, int) for row in w1.values() for x in row)
    assert all(isinstance(x, int) for x in b1)


def test_held_out_separation_python():
    for _, text, want in HELD_OUT:
        got, _, _ = _py_decide(text)
        assert got == want, (text, got, want)


def test_spark_matches_independent_recompute(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in HELD_OUT] + [(99, None)],
        "doc_id long, text string")
    rows = {r["id"]: r for r in
            langid_clf_score(df, "doc_id", "text").collect()}
    for i, text, want in HELD_OUT:
        lang, t, n = _py_decide(text)
        assert rows[i]["lang"] == want == lang
        assert rows[i]["n_feats"] == n
        assert [rows[i][f"t_{c}"] for c in LANGID_CLASSES] == t
    assert rows[99]["lang"] == "und" and rows[99]["n_feats"] == 0


def test_oracle_twin_matches(spark):
    con = duckdb.connect()
    con.sql("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    for i, t, _ in HELD_OUT:
        con.execute("INSERT INTO documents VALUES (?, ?)", [i, t])
    got = {r[0]: r for r in con.sql(langid_clf_oracle_sql()).fetchall()}
    for i, text, want in HELD_OUT:
        lang, t, n = _py_decide(text)
        assert got[i][5] == want == lang, text
        assert got[i][1] == n and list(got[i][2:5]) == t
