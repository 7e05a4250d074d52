"""Page head metadata extraction: first-wins semantics, attribute
order/quoting variants, entity handling, JSON-LD walking (@graph, lists,
malformed), feed autodiscovery, whole-document scan, error channel,
distributed operator + canonical clustering."""

from __future__ import annotations

import pytest

from space_launch_telemetry_analyzer_spark.operators.metadata import (
    canonical_clusters,
    page_metadata,
    parse_page_metadata,
)


def test_basic_head():
    d = parse_page_metadata(
        '<html lang="en"><head><title>T</title>'
        '<meta name="description" content="D">'
        '<link rel="canonical" href="https://e/c"></head><body></body></html>')
    assert d["title"] == "T"
    assert d["description"] == "D"
    assert d["canonical"] == "https://e/c"
    assert d["lang"] == "en"


def test_title_entities_and_whitespace_collapse():
    d = parse_page_metadata("<title>  A &amp;\n\t B&#33; </title>")
    assert d["title"] == "A & B!"


def test_first_wins_everywhere():
    d = parse_page_metadata(
        "<html lang='en'><html lang='de'>"
        "<title>one</title><title>two</title>"
        '<meta name=description content=first>'
        '<meta name=description content=second>'
        '<meta property="og:title" content="a">'
        '<meta property="og:title" content="b">'
        '<link rel=canonical href=/1><link rel=canonical href=/2>')
    assert d["lang"] == "en"
    assert d["title"] == "one"
    assert d["description"] == "first"
    assert d["og_title"] == "a"
    assert d["canonical"] == "/1"


def test_attr_order_quoting_and_case_insensitive():
    for html in (
        '<meta name="Description" content="X">',
        "<meta content='X' name='DESCRIPTION'>",
        "<meta content=X name=description>",
        '<META CONTENT="X" NAME="description">',
    ):
        assert parse_page_metadata(html)["description"] == "X", html


def test_og_via_name_or_property():
    d = parse_page_metadata(
        '<meta name="og:image" content="/i.png">'
        '<meta property="og:type" content="article">')
    assert d["og_image"] == "/i.png"
    assert d["og_type"] == "article"


def test_duplicate_attr_first_wins():
    # HTML5: later duplicate attributes are ignored
    d = parse_page_metadata('<meta name=description name=keywords content=V>')
    assert d["description"] == "V"


def test_feed_discovery_collects_all_in_order():
    d = parse_page_metadata(
        '<link rel="alternate" type="application/rss+xml" href="/a">'
        '<link rel="alternate" type="text/html" href="/skip">'
        '<link rel="alternate" type="application/atom+xml; charset=utf-8"'
        ' href="/b">'
        '<link rel="stylesheet" href="/skip2">')
    assert d["feeds"] == ["/a", "/b"]


def test_jsonld_graph_lists_and_malformed():
    d = parse_page_metadata(
        '<script type="application/ld+json">'
        '{"@graph":[{"@type":"Article"},{"@type":["A","B"]}]}</script>'
        '<script type="application/ld+json">[{"@type":"C"}]</script>'
        '<script type="application/ld+json">not json{</script>'
        '<script type="text/javascript">{"@type":"skipped"}</script>')
    assert d["jsonld_types"] == ["Article", "A", "B", "C"]
    assert d["n_jsonld_bad"] == 1


def test_body_metadata_still_scanned():
    d = parse_page_metadata(
        "<html><body><p>x</p>"
        '<meta property="og:url" content="https://e/u">'
        '<script type="application/ld+json">{"@type":"T"}</script></body>')
    assert d["og_url"] == "https://e/u"
    assert d["jsonld_types"] == ["T"]


def test_unclosed_and_degenerate_never_raise():
    for html in ("", "<", "<title>unclosed", "<meta", "<html><script "
                 "type=application/ld+json>{", "<title/></title>x</title>",
                 "<!-- <title>in comment</title> -->", "<link rel=canonical>"):
        parse_page_metadata(html)  # must not raise
    # comment-wrapped title is NOT extracted
    assert parse_page_metadata(
        "<!-- <title>no</title> --><title>yes</title>")["title"] == "yes"


def test_meta_count():
    d = parse_page_metadata(
        '<meta name=a content=1><meta name=b content=2><meta charset=utf-8>')
    assert d["n_meta"] == 2  # charset meta has no name/property+content pair


@pytest.mark.usefixtures("spark")
def test_operator_and_error_channel(spark):
    rows = [
        ("u1", b'<html lang="fr"><title>T1</title>'),
        ("u2", None),
        ("u3", "plain text no tags".encode()),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    out = {r["url"]: r for r in page_metadata(df).collect()}
    assert out["u1"]["title"] == "T1" and out["u1"]["lang"] == "fr"
    assert out["u1"]["error"] is None
    assert out["u2"]["error"] == "ValueError: null html"
    assert out["u3"]["title"] is None and out["u3"]["error"] is None


@pytest.mark.usefixtures("spark")
def test_canonical_clusters(spark):
    meta = spark.createDataFrame(
        [("a", "https://e/x"), ("b", "https://e/x"), ("c", None)],
        "url string, canonical string")
    got = {r["cluster_key"]: (r["n_pages"], r["representative_url"])
           for r in canonical_clusters(meta).collect()}
    assert got == {"https://e/x": (2, "a"), "c": (1, "c")}


def test_parse_anchors_semantics():
    from space_launch_telemetry_analyzer_spark.operators.metadata import (
        parse_anchors,
    )

    html = (
        '<p>pre <a href="https://e/1" rel="external NOFOLLOW">One &amp;'
        " two</a> mid <a href='/rel'>Rel</a> <a name=x>no href</a>"
        ' <a href=https://e/3>Three<a href="https://e/4">implicit</a>'
        "<script>var a = '<a href=\"https://skip\">decoy</a>';</script>"
        "<style>a{content:'</style>"
    )
    assert parse_anchors(html) == [
        ("https://e/1", "One & two", True),   # rel token, case-insensitive
        ("/rel", "Rel", False),               # single-quoted, relative kept
        ("https://e/3", "Three", False),      # unquoted; implicit close
        ("https://e/4", "implicit", False),
    ]
    assert parse_anchors("") == []
    # unclosed anchor flushes at EOF; whitespace collapses
    assert parse_anchors('<a href="u">a\n  b') == [("u", "a b", False)]


@pytest.mark.usefixtures("spark")
def test_anchor_texts_operator(spark):
    from space_launch_telemetry_analyzer_spark.operators.metadata import (
        anchor_texts,
    )

    df = spark.createDataFrame(
        [("p1", b'<a href="https://e/x">X</a><a href="https://e/y" '
                b'rel=nofollow>Y</a>'),
         ("p2", None)],
        "url string, html binary")
    rows = sorted(anchor_texts(df).collect(),
                  key=lambda r: (r["url"], r["ordinal"] or 0))
    assert [(r["url"], r["ordinal"], r["href"], r["anchor_text"],
             r["nofollow"], r["error"]) for r in rows] == [
        ("p1", 0, "https://e/x", "X", False, None),
        ("p1", 1, "https://e/y", "Y", True, None),
        ("p2", None, None, None, None, "ValueError: null html"),
    ]


@pytest.mark.usefixtures("spark")
def test_hreflang_alternates(spark):
    html = (b'<link rel="alternate" hreflang="en" href="https://e/en">'
            b'<link rel="alternate" hreflang="x-default" href="https://e/">'
            b'<link rel="alternate" type="application/rss+xml" href="/f">')
    df = spark.createDataFrame([("u", html)], "url string, html binary")
    r = page_metadata(df).collect()[0]
    assert [(h["lang"], h["href"]) for h in r["hreflangs"]] == [
        ("en", "https://e/en"), ("x-default", "https://e/")]
    assert r["feeds"] == ["/f"]


def test_whitespace_only_href_is_absent():
    d = parse_page_metadata(
        '<link rel="canonical" href=" ">'
        '<link rel="canonical" href="https://real">'
        '<link rel="alternate" type="application/rss+xml" href="  ">')
    # a blank canonical must not claim the first-wins slot (or every site
    # declaring one would collapse into a single "" dedup cluster)
    assert d["canonical"] == "https://real"
    assert d["feeds"] == []


def test_truncated_title_and_jsonld_flush_at_eof():
    d = parse_page_metadata('<title>cut off mid')
    assert d["title"] == "cut off mid"
    d2 = parse_page_metadata(
        '<script type="application/ld+json">{"@type":"T"')
    assert d2["jsonld_types"] == [] and d2["n_jsonld_bad"] == 1


def test_anchor_whitespace_href_skipped():
    from space_launch_telemetry_analyzer_spark.operators.metadata import (
        parse_anchors,
    )

    assert parse_anchors('<a href=" ">x</a><a href="u">y</a>') == \
        [("u", "y", False)]


# --- hreflang_clusters ----------------------------------------------------------

def _hl_page(url, alts):
    html = "".join(
        f'<link rel="alternate" hreflang="{l}" href="{h}">' for l, h in alts
    ).encode()
    return (url, html)


def test_hreflang_clusters_chain_and_singleton(spark):
    from space_launch_telemetry_analyzer_spark.operators.metadata import (
        hreflang_clusters,
    )

    # a <-> b declared by a; b -> c declared by b (chain, not identical
    # alternate sets); d declares nothing -> singleton
    rows = [
        _hl_page("https://e/a", [("en", "https://e/a"), ("de", "https://e/b")]),
        _hl_page("https://e/b", [("fr", "https://e/c")]),
        _hl_page("https://e/d", []),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {r["cluster_key"]: r for r in
           hreflang_clusters(page_metadata(df)).collect()}
    assert set(got) == {"https://e/a", "https://e/d"}
    abc = got["https://e/a"]
    # c was never crawled: glues the cluster but does not count as a page
    assert abc["n_pages"] == 2
    assert abc["representative_url"] == "https://e/a"
    assert abc["n_alternates"] == 3  # a, b, c
    assert abc["n_langs"] == 3  # en, de, fr
    d = got["https://e/d"]
    assert (d["n_pages"], d["n_alternates"], d["n_langs"]) == (1, 0, 0)


def test_hreflang_clusters_uncrawled_hub_merges(spark):
    from space_launch_telemetry_analyzer_spark.operators.metadata import (
        hreflang_clusters,
    )

    # two crawled pages that never reference each other, only a shared
    # uncrawled hub url -> still one cluster (set-equality keying would
    # split this; the graph walk must not)
    rows = [
        _hl_page("https://e/x", [("en", "https://e/hub")]),
        _hl_page("https://e/y", [("de", "https://e/hub")]),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    out = hreflang_clusters(page_metadata(df)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["cluster_key"] == "https://e/hub"  # min node is the hub
    assert r["n_pages"] == 2 and r["representative_url"] == "https://e/x"
    assert r["n_alternates"] == 1 and r["n_langs"] == 2
