"""Unit tests for the training-data text operators added in round 2:
PII redaction, Gopher-style repetition stats, deterministic sampling.
(Their oracle parity runs in test_entry_parity; these cover edge cases the
synthetic fixtures can't plant.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from space_launch_telemetry_analyzer_spark.operators import pii
from space_launch_telemetry_analyzer_spark.operators import sampling as sa
from space_launch_telemetry_analyzer_spark.operators import text_analysis as ta


# --- PII redaction ---------------------------------------------------------

def test_redact_all_categories(spark):
    df = spark.createDataFrame(
        [(1, "mail a.b+c@ex.org or x@y.io, ip 10.0.0.1, call +44 20-7946-0958 ok")],
        "id long, text string",
    )
    row = pii.redact_pii(df).first()
    assert row.redacted_text == "mail <EMAIL> or <EMAIL>, ip <IP>, call <PHONE> ok"
    assert (row.n_email, row.n_ip, row.n_phone, row.n_redacted) == (2, 1, 1, 4)


def test_redact_clean_and_empty_text(spark):
    df = spark.createDataFrame(
        [(1, "no pii here at all"), (2, "")], "id long, text string"
    )
    rows = {r.id: r for r in pii.redact_pii(df).collect()}
    assert rows[1].redacted_text == "no pii here at all"
    assert rows[1].n_redacted == 0
    assert rows[2].redacted_text == ""
    assert rows[2].n_redacted == 0


def test_redact_counts_follow_sequential_redaction(spark):
    # an email whose domain part contains digits-with-dots counts as ONE
    # email and ZERO ips: the email rule consumes the whole address before
    # the IP rule ever sees the text, and counts report replacements
    # actually performed (n_redacted == tokens inserted)
    df = spark.createDataFrame([(1, "u@10.0.0.1.example.com end")], "id long, text string")
    row = pii.redact_pii(df).first()
    assert row.n_email == 1
    assert row.redacted_text == "<EMAIL> end"
    assert row.n_ip == 0
    assert row.n_redacted == 1


def test_redact_cross_engine_fuzz(spark):
    """The PII patterns claim to live in the Java-regex/RE2 common subset —
    fuzz that claim: 300 seeded adversarial strings (regex metachars, partial
    matches, planted PII in odd positions) through Spark AND DuckDB; the
    redacted text and every count must agree exactly."""
    import random

    import duckdb

    rng = random.Random(20260816)
    alphabet = "ab z.09@+-()#:/\\[]{}*?^$|%_'\"\n\t"
    pii_bits = [
        "x.y@z.io", "a@b.cd", "not@an@email", "1.2.3.4", "999.999.999.999",
        "1.2.3.4.5", "+1 23-456", "+123 4567 890", "++1 23-45", "@.", "0..1",
        "user+tag@multi.part.domain.org", " +44 20-7946-0958 ",
    ]
    rows = []
    for i in range(300):
        n = rng.randint(0, 40)
        s = "".join(rng.choice(alphabet) for _ in range(n))
        if i % 3 == 0:
            pos = rng.randint(0, len(s))
            s = s[:pos] + rng.choice(pii_bits) + s[pos:]
        rows.append((i, s))

    from space_launch_telemetry_analyzer_spark.operators.pii import redact_pii

    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r.id: (r.redacted_text, r.n_email, r.n_ip, r.n_phone)
        for r in redact_pii(df).collect()
    }

    from space_launch_telemetry_analyzer_spark.operators.pii import (
        EMAIL_RE, IPV4_RE, PHONE_RE,
    )

    con = duckdb.connect()
    for i, s in rows:
        want = con.execute(
            """SELECT regexp_replace(regexp_replace(regexp_replace(?, ?, '<EMAIL>', 'g'),
                                                    ?, '<IP>', 'g'), ?, '<PHONE>', 'g'),
                      len(regexp_extract_all(?, ?)), len(regexp_extract_all(?, ?)),
                      len(regexp_extract_all(?, ?))""",
            [s, EMAIL_RE, IPV4_RE, PHONE_RE, s, EMAIL_RE, s, IPV4_RE, s, PHONE_RE],
        ).fetchone()
        assert got[i] == want, f"row {i}: spark={got[i]!r} duckdb={want!r} input={s!r}"


# --- repetition stats ------------------------------------------------------

def test_repetition_flags_degenerate_doc(spark):
    df = spark.createDataFrame(
        [
            (1, "spam " * 50),
            (2, "a healthy document with a wide and varied vocabulary overall"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in ta.repetition_stats(df).collect()}
    assert rows[1].repetitive and rows[1].top_token == "spam"
    assert rows[1].top_token_ratio == 1.0 and rows[1].n_distinct == 1
    assert not rows[2].repetitive
    assert rows[2].top_token == "a"  # 2 of 10 tokens


def test_repetition_tie_break_is_largest_token(spark):
    # equal counts: struct-max picks the lexicographically largest token
    df = spark.createDataFrame([(1, "bb aa bb aa")], "doc_id long, text string")
    row = ta.repetition_stats(df).first()
    assert row.top_token == "bb"
    assert row.n_tokens == 4 and row.n_distinct == 2


# --- sampling --------------------------------------------------------------

def test_hash_sample_is_partition_invariant(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = sorted(r.doc_id for r in sa.hash_sample(df, "doc_id", 10).collect())
    b = sorted(
        r.doc_id
        for r in sa.hash_sample(df.repartition(17), "doc_id", 10).collect()
    )
    assert a == b and 100 < len(a) < 300  # ~10% of 2000


def test_hash_sample_buckets_partition_the_corpus(spark):
    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    n = df.count()
    taken = sa.hash_sample(df, "doc_id", 100).count()  # pct=100 -> everything
    assert taken == n
    none = sa.hash_sample(df, "doc_id", 0).count()
    assert none == 0


def test_quota_sample_caps_each_strata(spark):
    rows = [(i, "en", f"site{i % 3}", float(i)) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, source string, q double")
    out = sa.quota_sample(df, ["lang", "source"], "q", 4, "doc_id")
    per = out.groupBy("source").count().collect()
    assert all(r["count"] == 4 for r in per)
    # highest-q rows survive: source 'site0' holds ids 0,3,...,27 -> top4 by q
    ids = sorted(r.doc_id for r in out.where(F.col("source") == "site0").collect())
    assert ids == [18, 21, 24, 27]


def test_quota_sample_two_phase_matches_single_phase(spark):
    # heavily skewed strata: one source holds 90% of rows
    rows = [(i, "en", "hot" if i % 10 else "cold", float(i % 97)) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, source string, q double")
    one = sa.quota_sample(df, ["source"], "q", 7, "doc_id")
    two = sa.quota_sample_two_phase(df, ["source"], "q", 7, "doc_id", n_salts=8)
    key = lambda r: (r.source, r.strata_rank, r.doc_id)  # noqa: E731
    assert sorted(map(key, one.collect())) == sorted(map(key, two.collect()))


def test_quota_sample_deterministic_ties(spark):
    rows = [(i, "en", "s", 1.0) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, source string, q double")
    out = sa.quota_sample(df, ["lang", "source"], "q", 3, "doc_id")
    assert sorted(r.doc_id for r in out.collect()) == [0, 1, 2]


def test_normalize_nfc_composes_and_passes_through(spark):
    """Decomposed sequences compose; already-NFC batches take the zero-copy
    fast path; NULLs survive; non-text columns pass through untouched."""
    import unicodedata

    from space_launch_telemetry_analyzer_spark.operators.text_analysis import (
        normalize_nfc,
    )

    decomposed = "café and Ångström"
    rows = [(1, decomposed), (2, "plain ascii"), (3, None), (4, "café")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.text_nfc for r in normalize_nfc(df).collect()}
    assert got[1] == unicodedata.normalize("NFC", decomposed)
    assert got[1] == "café and Ångström"
    assert got[2] == "plain ascii"
    assert got[3] is None
    assert got[4] == "café"
    # input frame must NOT grow a phantom column (schema.add mutation trap)
    assert df.columns == ["doc_id", "text"]


def test_normalize_nfc_unknown_column_raises(spark):
    from space_launch_telemetry_analyzer_spark.operators.text_analysis import (
        normalize_nfc,
    )

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="not in"):
        normalize_nfc(df, "txt")


def test_chunk_tokens_covers_every_token(spark):
    """n=100, chunk=50, stride=40: chunks must cover tokens 1-100 — the
    floor form dropped tokens 91-100 (the doc tail) from every chunk."""
    text = " ".join(f"t{i}" for i in range(1, 101))
    df = spark.createDataFrame([(text,)], "text string")
    rows = df.select(
        F.explode(ta.chunk_tokens(F.col("text"), 50, 40)).alias("c")
    ).select("c.chunk_idx", "c.chunk_text").collect()
    covered = set()
    for r in rows:
        covered |= set(r.chunk_text.split())
    assert covered == {f"t{i}" for i in range(1, 101)}
    assert [r.chunk_idx for r in rows] == [0, 1, 2]
    assert rows[2].chunk_text.split()[-1] == "t100"


def test_normalize_text_vertical_tab_cross_engine(spark):
    """Java's \\v matches all vertical whitespace (incl. U+0085 NEL,
    U+2028/29) while the oracle's RE2 \\v matches only \\x0B — the class
    is spelled with the explicit byte so both engines agree. A NEL
    character must pass through UNCHANGED on both sides (it is not a C0
    control and not in the spelled class)."""
    import duckdb

    vt = chr(0x0B)
    nel = chr(0x85)
    text = "ab" + vt + "cd " + nel + " ef"
    got = spark.createDataFrame([(text,)], "t string").select(
        ta.normalize_text(F.col("t")).alias("n")
    ).first()["n"]
    want = duckdb.execute(
        "SELECT trim(regexp_replace(regexp_replace(regexp_replace(?, "
        "'[\\t\\n\\r\\f\\x0B]', ' ', 'g'), "
        "'[\\x00-\\x08\\x0e-\\x1f\\x7f]', '', 'g'), "
        "' {2,}', ' ', 'g'))", [text]
    ).fetchone()[0]
    assert got == want == "ab cd " + nel + " ef"


def test_pii_counts_equal_actual_replacements(spark):
    """A phone-looking span already consumed by the email rule must not be
    counted: n_redacted == placeholder tokens actually inserted."""
    txt = "call +1 555-0100@ex.com now"  # email rule eats the digits
    df = spark.createDataFrame([(txt,)], "text string")
    r = pii.redact_pii(df).first()
    n_tokens = sum(r.redacted_text.count(t) for t in ("<EMAIL>", "<IP>", "<PHONE>"))
    assert r.n_redacted == n_tokens
    assert r.n_email == 1 and r.n_phone == 0


def test_canonicalize_and_normalize_idempotent(spark):
    """The defining property of a canonicalizer/normalizer: applying it
    twice equals applying it once — over a seeded soup of urls and texts."""
    import random

    rng = random.Random(20260817)
    schemes = ["http", "https", "HTTP", "Https"]
    hosts = ["Ex.Com", "a.b.c", "X9.example", "UPPER.ORG", "h-h.io"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/A/b", "/p%20q", "/x/y/z", "/._~-"]
    queries = ["", "?b=2&a=1", "?z=9", "?a=1&a=1", "?b&a"]
    frags = ["", "#frag", "#x/y"]
    urls = [
        rng.choice(schemes) + "://" + rng.choice(hosts) + rng.choice(ports)
        + rng.choice(paths) + rng.choice(queries) + rng.choice(frags)
        for _ in range(80)
    ]

    from space_launch_telemetry_analyzer_spark.operators.text_analysis import (
        canonicalize_urls, normalize_text,
    )

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = canonicalize_urls(df, "url").select(
        F.col("canonical_url").alias("url")
    )
    twice = canonicalize_urls(once, "url")
    bad = twice.where(F.col("url") != F.col("canonical_url")).collect()
    assert not bad, [(r.url, r.canonical_url) for r in bad[:3]]

    texts = [
        "a\tb\n\nc", "  x  y  ", "", "one", "\x01ctl\x1f", "a  b   c",
        "tab\t\ttab", "mix \r\n of\fthings", "\x0bvt",
    ]
    tdf = spark.createDataFrame([(t,) for t in texts], "t string")
    n1 = tdf.select(normalize_text(F.col("t")).alias("t"))
    n2 = n1.select(F.col("t").alias("orig"), normalize_text(F.col("t")).alias("t2"))
    bad2 = n2.where(F.col("orig") != F.col("t2")).collect()
    assert not bad2, bad2[:3]


# --- gopher_filter / c4_line_filter ---------------------------------------------

_GOOD_DOC = " ".join(
    "the data and results have merit with careful analysis of every part"
    .split() * 6
)  # 72 words, all alphabetic, plenty of stopwords


def _gopher(spark, rows):
    df = spark.createDataFrame(rows, "id long, text string")
    return {r["id"]: r for r in ta.gopher_filter(df, "id", "text").collect()}


def test_gopher_passes_clean_doc(spark):
    r = _gopher(spark, [(1, _GOOD_DOC)])[1]
    assert r["keep"] and all(
        r[k] for k in ("ok_words", "ok_mwl", "ok_symbols", "ok_bullets",
                       "ok_ellipsis", "ok_alpha", "ok_stopwords"))
    assert r["n_words"] == 72 and r["n_stopwords"] >= 2


def test_gopher_individual_rules(spark):
    got = _gopher(spark, [
        (1, "too few words here."),                       # word count
        (2, " ".join(["a"] * 60)),                        # mwl < 3
        (3, _GOOD_DOC + " " + "# " * 20),                 # symbol ratio
        (4, "\n".join(["- b " + _GOOD_DOC[:40]] * 10)),   # bullets > 0.9
        (5, "\n".join([_GOOD_DOC[:60] + "..."] * 5)),     # ellipsis > 0.3
        (6, _GOOD_DOC + " " + "123 456 789 " * 8),        # alpha < 0.8
        (7, " ".join(["datum rows columns"] * 30)),       # no stopwords
    ])
    assert not got[1]["ok_words"]
    assert not got[2]["ok_mwl"]
    assert not got[3]["ok_symbols"]
    assert not got[4]["ok_bullets"]
    assert not got[5]["ok_ellipsis"]
    assert not got[6]["ok_alpha"]
    assert not got[7]["ok_stopwords"] and got[7]["n_stopwords"] == 0
    assert not any(r["keep"] for r in got.values())


def test_gopher_unicode_ellipsis_and_blank(spark):
    got = _gopher(spark, [(1, _GOOD_DOC + "\nto be continued…"), (2, "")])
    assert got[1]["ellipsis_ratio"] == 0.5
    assert got[2]["n_words"] == 0 and not got[2]["keep"]


def test_c4_line_filter_rules(spark):
    rows = [
        (1, "this good sentence has enough words in it.\n"
            "short one.\n"
            "no terminal punctuation on this longer line here\n"
            "enable javascript to view this page properly.\n"
            "another proper closing sentence with several words.\n"
            "a third proper closing sentence with several words!"),
        (2, "only one good sentence lives in this document here.\nnope\nnope"),
        (3, "lorem ipsum dolor sit amet is fine to spot.\n"
            "second proper sentence with more than five words.\n"
            "third proper sentence with more than five words."),
        (4, "var f = function() { return 1; } and so on it goes.\n"
            "second proper sentence with more than five words.\n"
            "third proper sentence with more than five words."),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r for r in ta.c4_line_filter(df, "id", "text").collect()}
    r1 = got[1]
    assert r1["n_lines"] == 6 and r1["n_kept"] == 3 and r1["keep"]
    assert "short one." not in r1["text_clean"]
    assert "javascript" not in r1["text_clean"].lower()
    assert "no terminal" not in r1["text_clean"]
    assert not got[2]["keep"]          # < 3 surviving lines
    assert got[2]["n_kept"] == 1
    assert not got[3]["keep"]          # lorem ipsum
    assert not got[4]["keep"]          # curly brace
    assert got[3]["n_kept"] == 3       # lines survive; doc flag kills it


# --- pack_sequences -------------------------------------------------------------

def test_pack_sequences_partition_invariant_and_exact(spark):
    rows = [(i, " ".join(["w"] * (5 + i % 7))) for i in range(50)] \
        + [(50, ""), (51, "x")]
    df = spark.createDataFrame(rows, "id long, text string")
    outs = [sorted(tuple(r) for r in
                   ta.pack_sequences(df, "id", "text", seq_len=16,
                                     partitions=p).collect())
            for p in (1, 3, 16)]
    # the distributed prefix-sum must not depend on the partition count
    assert outs[0] == outs[1] == outs[2]
    per_seq: dict = {}
    for (_id, n, gs, seq, st, en, k) in outs[0]:
        assert 0 <= st < en <= n and k == en - st
        per_seq[seq] = per_seq.get(seq, 0) + k
    seqs = sorted(per_seq)
    # every sequence is exactly full except possibly the last
    assert all(per_seq[s] == 16 for s in seqs[:-1])
    assert sum(per_seq.values()) == sum(5 + i % 7 for i in range(50)) + 1
    # zero-token docs emit nothing; sequences are contiguous from 0
    assert 50 not in {r[0] for r in outs[0]}
    assert seqs == list(range(len(seqs)))


def test_pack_sequences_doc_spanning_many_sequences(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, " ".join(["t"] * 40)), (3, "z")],
        "id long, text string")
    out = sorted(tuple(r) for r in
                 ta.pack_sequences(df, "id", "text", seq_len=8).collect())
    # doc 2 (40 tokens at global offset 3) spans sequences 0..5
    doc2 = [r for r in out if r[0] == 2]
    assert [r[3] for r in doc2] == [0, 1, 2, 3, 4, 5]
    assert doc2[0][4:] == (0, 5, 5)     # fills seq 0 after doc 1's 3 tokens
    assert doc2[-1][4:] == (37, 40, 3)  # tail lands in seq 5
    doc3 = [r for r in out if r[0] == 3][0]
    assert doc3[3] == 5 and doc3[4:] == (0, 1, 1)


# --- bm25_topk ------------------------------------------------------------------

def test_bm25_ranking_and_formula(spark):
    import math
    rows = [
        (1, "table table table filler words here"),     # high tf for 'table'
        (2, "table spark merge appear once each here"),  # all three terms
        (3, "completely unrelated words only here now"),
        (4, "table spark " + "pad " * 50),               # long doc penalized
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = ta.bm25_topk(df, "id", "text", ["table", "spark", "merge"], k=4)
    got = {r["id"]: r for r in out.collect()}
    # doc 3 matches nothing -> score 0 and ranks last
    assert got[3]["score"] == 0.0
    assert [r["id"] for r in out.collect()][-1] == 3
    # doc 2 (all three terms) outranks doc 1 (one repeated term)
    scores = {i: got[i]["score"] for i in got}
    assert scores[2] > scores[1] > 0
    # closed-form check of doc 3-free formula on doc 1
    dls = {1: 6, 2: 7, 3: 6, 4: 52}
    n, avgdl = 4, sum(dls.values()) / 4
    def idf(dfreq):
        return math.log(1.0 + (n - dfreq + 0.5) / (dfreq + 0.5))
    want1 = idf(3) * (3 * 2.2) / (3 + 1.2 * (0.25 + 0.75 * (dls[1] / avgdl)))
    assert got[1]["score"] == pytest.approx(want1, rel=1e-12)
    # length normalization: doc 4 has table+spark but long dl hurts it
    assert got[4]["dl"] == 52 and scores[4] < scores[2]


def test_bm25_k_limit_and_tie_break(spark):
    rows = [(i, "term filler") for i in range(10)]
    df = spark.createDataFrame(rows, "id long, text string")
    out = ta.bm25_topk(df, "id", "text", ["term"], k=3).collect()
    # identical docs tie on score; id ascending breaks the tie
    assert [r["id"] for r in out] == [0, 1, 2]


# --- url_blocklist_filter ---------------------------------------------------------

def test_url_blocklist_domains_and_prefixes(spark):
    urls = [
        ("https://good.example.org/a",),
        ("https://bad.example.net/a",),          # exact domain hit
        ("https://deep.sub.bad.example.net/a",),  # parent-suffix hit
        ("https://notbad.example.net/a",),        # no label boundary -> kept
        ("https://Mixed.BAD.example.NET/a",),     # case-insensitive host
        ("https://shop.example.org/ads/banner",),  # prefix hit
        ("https://shop.example.org/adsorption",),  # not the prefix
    ]
    df = spark.createDataFrame(urls, "url string")
    domains = spark.createDataFrame([("bad.example.net",)], "domain string")
    prefixes = spark.createDataFrame(
        [("shop.example.org", "https://shop.example.org/ads/")],
        "host string, prefix string")
    out = {r["url"]: r for r in ta.url_blocklist_filter(
        df, "url", domains=domains, prefixes=prefixes).collect()}
    assert out["https://good.example.org/a"]["keep"]
    assert out["https://bad.example.net/a"]["blocked_domain"]
    assert out["https://deep.sub.bad.example.net/a"]["blocked_domain"]
    assert out["https://notbad.example.net/a"]["keep"]
    assert out["https://Mixed.BAD.example.NET/a"]["blocked_domain"]
    assert out["https://shop.example.org/ads/banner"]["blocked_prefix"]
    assert not out["https://shop.example.org/ads/banner"]["blocked_domain"]
    assert out["https://shop.example.org/adsorption"]["keep"]
    assert all((not r["keep"]) == (r["blocked_domain"] or r["blocked_prefix"])
               for r in out.values())


def test_url_blocklist_optional_lists(spark):
    df = spark.createDataFrame([("https://x.example/a",)], "url string")
    r = ta.url_blocklist_filter(df, "url").collect()[0]
    assert r["keep"] and not r["blocked_domain"] and not r["blocked_prefix"]


def test_mix_sample_rates_whitelist_and_partition_invariance(spark):
    """Training-mix builder: per-source keep rates applied on the stable
    md5 bucket — rate 1.0 keeps everything, rate 0 and absent sources
    drop everything, fractional rates keep exactly the hash_bucket
    subset, and the row set ignores partitioning."""
    from pyspark.sql import functions as F

    from space_launch_telemetry_analyzer_spark.operators.sampling import (
        hash_bucket,
        mix_sample,
    )

    df = spark.createDataFrame(
        [(i, f"s{i % 4}") for i in range(400)], "doc_id long, source string")
    rates = {"s0": 1.0, "s1": 0.25, "s2": 0.0}  # s3 absent -> dropped
    got = {r["doc_id"] for r in mix_sample(
        df, "doc_id", "source", rates).collect()}
    expected_buckets = {r["doc_id"]: r["b"] for r in df.select(
        "doc_id", hash_bucket(F.col("doc_id"), 10000).alias("b")).collect()}
    want = set()
    for i in range(400):
        src = f"s{i % 4}"
        cut = {"s0": 10000, "s1": 2500, "s2": 0}.get(src)
        if cut and expected_buckets[i] < cut:
            want.add(i)
    assert got == want
    assert {i for i in got if i % 4 == 0} == {i for i in range(400)
                                              if i % 4 == 0}
    assert not any(i % 4 in (2, 3) for i in got)
    got2 = {r["doc_id"] for r in mix_sample(
        df.repartition(13), "doc_id", "source", rates).collect()}
    assert got2 == got


def test_mix_sample_validates_rates(spark):
    import pytest as _pytest

    from space_launch_telemetry_analyzer_spark.operators.sampling import (
        mix_sample,
    )
    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with _pytest.raises(ValueError, match="in \\[0, 1\\]"):
        mix_sample(df, "doc_id", "source", {"a": 1.5})
    with _pytest.raises(ValueError, match="at least one"):
        mix_sample(df, "doc_id", "source", {})


# ---------------------------------------------------------------------------
# one-pass quality_signals bundle
# ---------------------------------------------------------------------------

_SIGNAL_FIXTURE = [
    (1, "the quick brown fox jumps over the lazy dog and that is that.\n"
        "- a bullet item here\nto be continued...\nplain closing line of "
        "the day with many more words to have with that."),
    (2, "der hund und die katze und der vogel"),
    (3, "#### #### ####\n{ code } lorem ipsum dolor"),
    (4, ""),
]


def test_quality_signals_matches_standalone_ops(spark):
    """The bundle's gopher/c4 columns must equal the standalone
    operators' output row-for-row (they share the same Column helpers;
    this pins that the wiring stays shared)."""
    df = spark.createDataFrame(_SIGNAL_FIXTURE, "id long, text string")
    sig = {r["id"]: r for r in ta.quality_signals(df, "id", "text").collect()}
    gop = {r["id"]: r for r in ta.gopher_filter(df, "id", "text").collect()}
    c4 = {r["id"]: r for r in ta.c4_line_filter(df, "id", "text").collect()}
    for i, _ in _SIGNAL_FIXTURE:
        assert sig[i]["gopher_keep"] == gop[i]["keep"], i
        assert sig[i]["symbol_ratio"] == gop[i]["symbol_ratio"], i
        assert sig[i]["alpha_ratio"] == gop[i]["alpha_ratio"], i
        assert sig[i]["n_gopher_stopwords"] == gop[i]["n_stopwords"], i
        assert sig[i]["c4_n_kept"] == c4[i]["n_kept"], i
        assert sig[i]["c4_keep"] == c4[i]["keep"], i
        assert sig[i]["n_tokens"] == gop[i]["n_words"], i


def test_quality_signals_values(spark):
    df = spark.createDataFrame(_SIGNAL_FIXTURE, "id long, text string")
    rows = {r["id"]: r for r in ta.quality_signals(df, "id", "text").collect()}
    assert rows[1]["lang_pred"] == "en"
    assert rows[2]["lang_pred"] == "de"
    assert rows[4]["lang_pred"] == "und"
    assert rows[4]["n_tokens"] == 0
    assert rows[4]["quality"] == 0.2  # punct_ok term alone
    assert rows[3]["c4_keep"] is False        # lorem ipsum + brace
    assert rows[3]["gopher_keep"] is False    # symbol spam


# ---------------------------------------------------------------------------
# gopher_repetition (Table A1 repetition rules)
# ---------------------------------------------------------------------------

def _rep_rows(spark, rows):
    df = spark.createDataFrame(rows, "id long, text string")
    return {r["id"]: r for r in ta.gopher_repetition(df, "id", "text").collect()}


def test_gopher_repetition_dup_lines_and_paras(spark):
    rows = _rep_rows(spark, [
        (1, "aa bb cc\naa bb cc\n\ndd ee ff gg"),
        (2, "p q\n\np q\n\nr s t u v w"),
        (3, "u1 u2 u3\nu4 u5 u6"),
    ])
    # 4 lines (incl. the empty one between paragraphs), one dup pair
    assert rows[1]["dup_line_frac"] == 0.25
    assert rows[1]["dup_line_char_frac"] == 8.0 / (8 + 8 + 0 + 11)
    assert rows[2]["dup_para_frac"] == 1.0 / 3.0
    assert rows[2]["dup_para_char_frac"] == 3.0 / (3 + 3 + 11)
    assert rows[3]["dup_line_frac"] == 0.0
    assert rows[3]["dup_para_frac"] == 0.0


def test_gopher_repetition_gram_coverage(spark):
    text = "spam spam spam spam spam spam"
    rows = _rep_rows(spark, [(1, text)])
    # top 2-gram 'spam spam' occurs 5x (overlapping), len 9, text len 29
    assert rows[1]["top_2gram_char_frac"] == 5 * 9 / 29
    # 5-gram occurs 2x, len 24 — overlap not subtracted (frozen)
    assert rows[1]["dup_5gram_char_frac"] == 2 * 24 / 29
    assert rows[1]["keep"] is False


def test_gopher_repetition_clean_doc_keeps(spark):
    text = ("many distinct words compose this entirely unrepetitive "
            "document body\nwith a second line of further fresh words "
            "continuing the prose\n\nand a closing paragraph that says "
            "something new once more before ending")
    rows = _rep_rows(spark, [(1, text)])
    assert rows[1]["keep"] is True
    assert rows[1]["dup_5gram_char_frac"] == 0.0


def test_gopher_repetition_empty_and_short(spark):
    rows = _rep_rows(spark, [(1, ""), (2, "one")])
    for i in (1, 2):
        assert rows[i]["dup_line_frac"] == 0.0
        assert rows[i]["dup_10gram_char_frac"] == 0.0
        assert rows[i]["keep"] is True


def test_gopher_repetition_partition_invariance(spark):
    rows = [(i, f"w{i} x y\nw{i} x y\n\nz{i} final words here") for i in range(30)]
    df = spark.createDataFrame(rows, "id long, text string")
    a = sorted(map(tuple, ta.gopher_repetition(df.coalesce(1), "id", "text").collect()))
    b = sorted(map(tuple, ta.gopher_repetition(df.repartition(8), "id", "text").collect()))
    assert a == b


def test_gopher_repetition_plan_shape(spark):
    """Scan-stage only: the sorted-fold form must never shuffle (the
    exploded first implementation moved 9x the tokens through two
    exchanges and ran 45x slower)."""
    df = spark.createDataFrame([(1, "a b c")], "id long, text string")
    plan = (ta.gopher_repetition(df, "id", "text")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Python" not in plan
    assert "Join" not in plan
    assert "Exchange" not in plan


def test_gopher_repetition_hashed_equals_exact(spark):
    """exact=False (xxhash64 gram keys, arithmetic lengths) must produce
    identical rows to exact=True on repetition-heavy fixtures — the only
    divergence channel is a 64-bit within-document hash collision."""
    rows = [(i, f"w{i} x y\nw{i} x y\n\nspam spam spam spam spam spam "
                f"one two three four five six one two three four five six")
            for i in range(20)] + [(99, ""), (100, "single")]
    df = spark.createDataFrame(rows, "id long, text string")
    a = sorted(map(tuple, ta.gopher_repetition(df, "id", "text", exact=True).collect()))
    b = sorted(map(tuple, ta.gopher_repetition(df, "id", "text", exact=False).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# sentence splitting
# ---------------------------------------------------------------------------

def _split(spark, text):
    df = spark.createDataFrame([(1, text)], "id long, text string")
    return df.select(ta.split_sentences(F.col("text")).alias("s")).first()["s"]


def test_split_sentences_rules(spark):
    assert _split(spark,
                  "Dr. Smith measured 3.14 km. Is it done? Yes! The end") == [
        "Dr. Smith measured 3.14 km.", "Is it done?", "Yes!", "The end"]
    assert _split(spark, 'He said "stop now." Then left.') == [
        'He said "stop now."', "Then left."]
    assert _split(spark, "versions 1.2.3 and 4.5 ship. done.") == [
        "versions 1.2.3 and 4.5 ship.", "done."]
    assert _split(spark, "Multi!!  spaces?  (Bracketed.) after.") == [
        "Multi!!", "spaces?", "(Bracketed.)", "after."]
    assert _split(spark, "") == []
    assert _split(spark, "no terminal") == ["no terminal"]


def test_split_sentences_sql_twin_matches(spark):
    """The structural DuckDB twin reproduces the kernel on adversarial
    punctuation (the registered oracle is closed-form; this pins the
    exported twin too)."""
    import duckdb

    cases = ["A. B? C!", "e.g. x vs. y etc. done.", "  lead. trail  ",
             "1.2 then 3.4.5 end.", 'q "a?" b.', "...", "a.b", "! ?"]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "id int, text string")
    got = {r["id"]: r["s"] for r in df.select(
        "id", ta.split_sentences(F.col("text")).alias("s")).collect()}
    con = duckdb.connect()
    sql = ta.split_sentences_sql("text")
    for i, c in enumerate(cases):
        want = con.execute(
            f"select {sql} from (select ? as text)", [c]).fetchone()[0]
        assert got[i] == want, (i, c, got[i], want)


# ---------------------------------------------------------------------------
# mix_plan (mix design: the step before mix_sample)
# ---------------------------------------------------------------------------

def test_mix_plan_binding_source_and_proportions(spark):
    rows = ([(i, "a", "w1 w2 w3 w4") for i in range(10)]      # 40 tokens
            + [(i, "b", "w1 w2") for i in range(100, 105)])   # 10 tokens
    df = spark.createDataFrame(rows, "id long, source string, text string")
    out = {r["source"]: r for r in
           sa.mix_plan(df, "source", "text", {"a": 1, "b": 1}).collect()}
    # equal weights: b (10 tokens) binds -> t = 10, a keeps 10 of 40
    assert out["b"]["keep_rate"] == 1.0
    assert out["b"]["keep_tokens"] == 10.0
    assert out["a"]["keep_tokens"] == 10.0
    assert out["a"]["keep_rate"] == 0.25
    # 3:1 the other way: a can serve 30:10 exactly -> both rates scale
    out2 = {r["source"]: r for r in
            sa.mix_plan(df, "source", "text", {"a": 3, "b": 1}).collect()}
    assert out2["b"]["keep_rate"] == 1.0
    assert out2["a"]["keep_tokens"] == 30.0


def test_mix_plan_is_a_whitelist_and_validates(spark):
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, "a", "x y"), (2, "c", "z")], "id long, source string, text string")
    out = sa.mix_plan(df, "source", "text", {"a": 1})
    assert [r["source"] for r in out.collect()] == ["a"]
    with _pytest.raises(ValueError, match="positive int"):
        sa.mix_plan(df, "source", "text", {"a": 0})
    with _pytest.raises(ValueError, match="at least one"):
        sa.mix_plan(df, "source", "text", {})


def test_mix_plan_feeds_mix_sample(spark):
    """The designed keep rates drive mix_sample directly — the full
    design->subsample loop."""
    rows = [(i, "a" if i % 3 else "b", "t1 t2 t3 t4") for i in range(600)]
    df = spark.createDataFrame(rows, "id long, source string, text string")
    plan = {r["source"]: r["keep_rate"] for r in
            sa.mix_plan(df, "source", "text", {"a": 1, "b": 1}).collect()}
    mixed = sa.mix_sample(df, "id", "source", plan)
    counts = {r["source"]: r["count"]
              for r in mixed.groupBy("source").count().collect()}
    # b binds (200 docs vs 400): kept fully; a subsamples to ~half
    assert counts["b"] == 200
    assert abs(counts["a"] - 200) < 40


# ---------------------------------------------------------------------------
# inverted index (build + lookup)
# ---------------------------------------------------------------------------

def test_inverted_index_postings_and_stats(spark):
    df = spark.createDataFrame(
        [(1, "a b a"), (2, "a c"), (3, "b b b"), (4, ""), (5, "   ")],
        "doc_id long, text string")
    idx = ta.build_inverted_index(df, "doc_id", "text", min_df=1,
                                  shard_size=100)
    rows = {r["term"]: r for r in idx.collect()}
    assert set(rows) == {"a", "b", "c"}           # blank docs emit nothing
    assert rows["a"]["df"] == 2 and rows["a"]["cf"] == 3
    assert [(p["id"], p["tf"]) for p in rows["a"]["postings"]] == [(1, 2), (2, 1)]
    assert rows["b"]["df"] == 2 and rows["b"]["cf"] == 4
    assert [(p["id"], p["tf"]) for p in rows["b"]["postings"]] == [(1, 1), (3, 3)]
    assert all(r["shard"] == 0 for r in rows.values())   # df < shard_size
    assert rows["c"]["shard_df"] == 1

    pruned = ta.build_inverted_index(df, "doc_id", "text", min_df=2,
                                     shard_size=100)
    assert {r["term"] for r in pruned.collect()} == {"a", "b"}


def test_inverted_index_sharding_partitions_postings(spark):
    """shard_size=3 over a 10-doc term: ceil(10/3)=4 shards via pmod(id),
    together covering every posting exactly once, each <= ceil-balanced."""
    df = spark.createDataFrame([(i, "t") for i in range(10)],
                               "doc_id long, text string")
    idx = ta.build_inverted_index(df, "doc_id", "text", shard_size=3)
    rows = idx.collect()
    assert {r["shard"] for r in rows} == {0, 1, 2, 3}
    assert all(r["df"] == 10 and r["cf"] == 10 for r in rows)
    seen = []
    for r in rows:
        assert r["shard_df"] == len(r["postings"])
        ids = [p["id"] for p in r["postings"]]
        assert ids == sorted(ids)
        assert all(i % 4 == r["shard"] for i in ids)
        seen += ids
    assert sorted(seen) == list(range(10))


def test_postings_lookup_round_trip(spark):
    df = spark.createDataFrame(
        [(1, "x y"), (2, "y y z"), (3, "x")], "doc_id long, text string")
    idx = ta.build_inverted_index(df, "doc_id", "text")
    got = {(r["term"], r["id"]): (r["tf"], r["df"], r["cf"])
           for r in ta.postings_lookup(idx, ["Y", "z"]).collect()}
    assert got == {("y", 1): (1, 2, 3), ("y", 2): (2, 2, 3),
                   ("z", 2): (1, 1, 1)}
    import pytest as _pytest
    with _pytest.raises(ValueError, match="at least one"):
        ta.postings_lookup(idx, [])
    with _pytest.raises(ValueError, match="shard_size"):
        ta.build_inverted_index(df, "doc_id", "text", shard_size=0)


def test_bm25_from_index_equals_corpus_scan(spark):
    """Index-served BM25 must equal bm25_topk at FULL precision (no
    rounding) — same scores, same order, same tie-breaks — including
    zero-score filler docs when k exceeds the hit count, and a query
    term absent from the corpus (df=0)."""
    rows = [
        (1, "spark merge table spark"),
        (2, "table table table"),
        (3, "nothing relevant here"),
        (4, ""),
        (5, "merge"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    terms = ["table", "SPARK", "merge", "absentterm"]
    want = [tuple(r) for r in
            ta.bm25_topk(df, "doc_id", "text", terms, k=5).collect()]
    idx = ta.build_inverted_index(df, "doc_id", "text")
    dls = ta.doc_lengths(df, "doc_id", "text")
    got = [tuple(r) for r in
           ta.bm25_from_index(idx, dls, terms, k=5).collect()]
    assert got == want
    # the zero-score tail is present (docs 3 and 4 score 0.0)
    assert [t[0] for t in got[-2:]] == [3, 4]
    assert got[-1][-1] == 0.0


def test_mix_plan_missing_source_binds_to_zero(spark):
    """A weighted source with NO corpus rows must appear with
    available_tokens 0 and drive t to 0 — an unservable mix reports
    itself instead of silently dropping the missing source."""
    df = spark.createDataFrame(
        [(1, "web", "a b c d")], "id long, source string, text string")
    out = {r["source"]: r for r in
           sa.mix_plan(df, "source", "text",
                       {"web": 1, "wiki": 2}).collect()}
    assert set(out) == {"web", "wiki"}
    assert out["wiki"]["available_tokens"] == 0
    assert out["wiki"]["keep_tokens"] == 0.0 and out["wiki"]["keep_rate"] == 0.0
    assert out["web"]["keep_tokens"] == 0.0 and out["web"]["keep_rate"] == 0.0


def test_ivf_assign_rejects_non_numeric_centroid_ids(spark):
    import pytest as _pytest

    from space_launch_telemetry_analyzer_spark.operators import similarity as S

    df = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id long, vec array<double>")
    cents = spark.createDataFrame([("c0", [1.0, 0.0])],
                                  "centroid_id string, cvec array<double>")
    with _pytest.raises(TypeError, match="numeric"):
        S.ivf_assign(df, "vec_id", "vec", cents, "centroid_id", "cvec")


def test_attach_global_prefix_rejects_column_clashes(spark):
    from space_launch_telemetry_analyzer_spark.operators.prefix import (
        attach_global_prefix,
    )

    df = spark.createDataFrame([(1, 2)], "id long, before long")
    with pytest.raises(ValueError, match="clobber"):
        attach_global_prefix(df, [F.col("id")])
    df2 = spark.createDataFrame([(1, 2)], "id long, _pid long")
    with pytest.raises(ValueError, match="clobber"):
        attach_global_prefix(df2, [F.col("id")], out_col="gp")
    out = attach_global_prefix(
        spark.createDataFrame([(3,), (1,), (2,)], "id long"),
        [F.col("id")], out_col="rnk0", total_col="n")
    rows = {r["id"]: (r["rnk0"], r["n"]) for r in out.collect()}
    assert rows == {1: (0, 3), 2: (1, 3), 3: (2, 3)}
