"""HTML -> Markdown converter: golden conversions, edge cases, and the
Spark operator surface (operators/markdown.py)."""

from __future__ import annotations

import pytest

from space_launch_telemetry_analyzer_spark.operators.markdown import (
    html_to_markdown as md,
    to_markdown_pages,
)


# ---------------------------------------------------------------------------
# golden conversions (the frozen spec, byte-for-byte)
# ---------------------------------------------------------------------------

GOLDEN = [
    ("<h1>Title</h1>", "# Title"),
    ("<h3>deep</h3>", "### deep"),
    ("<p>plain para</p>", "plain para"),
    ("<p>a <strong>b</strong> c</p>", "a **b** c"),
    ("<p>a <b>b</b> and <i>c</i></p>", "a **b** and *c*"),
    ("<p><em>it</em></p>", "*it*"),
    ('<p><a href="/x">go</a></p>', "[go](/x)"),
    ('<p><a href="/x">go <strong>now</strong></a></p>', "[go **now**](/x)"),
    ("<p><a>nohref</a></p>", "[nohref]()"),
    ('<p><img src="/i.png" alt="pic"></p>', "![pic](/i.png)"),
    ("<p>x <code>f(1)&lt;2</code></p>", "x `f(1)<2`"),
    ("<ul><li>a</li><li>b</li></ul>", "- a\n- b"),
    ("<ol><li>a</li><li>b</li><li>c</li></ol>", "1. a\n2. b\n3. c"),
    (
        "<ul><li>a<ul><li>a1</li><li>a2</li></ul></li><li>b</li></ul>",
        "- a\n  - a1\n  - a2\n- b",
    ),
    ("<blockquote><p>q</p></blockquote>", "> q"),
    (
        "<blockquote><p>q1</p><p>q2</p></blockquote>",
        "> q1\n>\n> q2",
    ),
    ("<pre>x = 1\n  y = 2</pre>", "```\nx = 1\n  y = 2\n```"),
    ("<pre>\nkeep\n</pre>", "```\nkeep\n```"),  # one edge newline stripped
    ("<hr>", "---"),
    ("<h2>A</h2><p>b</p>", "## A\n\nb"),
    # entities unescape once
    ("<p>x &amp;&amp; y &lt; z</p>", "x && y < z"),
    # whitespace collapse in inline text
    ("<p>a\n   b\t\tc</p>", "a b c"),
    # <br> is a hard break that survives the collapse
    ("<p>l1<br>l2</p>", "l1\nl2"),
    # script/style/head/title dropped
    ("<head><title>t</title></head><p>body</p>", "body"),
    ("<script>var x=1</script><p>ok</p>", "ok"),
    ("<style>p{}</style><p>ok</p>", "ok"),
    ("<!-- c --><p>after</p>", "after"),
    # grouping tags are transparent block boundaries
    ("<div><div><p>deep</p></div></div>", "deep"),
    ("<div>loose text</div><p>para</p>", "loose text\n\npara"),
    # table cells degrade to paragraphs in the converter (structure is
    # extract_tables' job)
    ("<table><tr><td>c1</td><td>c2</td></tr></table>", "c1\n\nc2"),
    # malformed input tolerance
    ("<p>a<p>b", "a\n\nb"),  # implicit </p>
    ("<ul><li>a<li>b</ul>", "- a\n- b"),  # implicit </li>
    ("<p>unclosed <strong>bold", "unclosed **bold**"),
    ("<li>stray</li>", "- stray"),
    ("plain text only", "plain text only"),
    ("", ""),
    # empty inline wrappers vanish
    ("<p><b></b>x</p>", "x"),
    # self-closing forms
    ("<p>a<br/>b</p>", "a\nb"),
]


@pytest.mark.parametrize("html,expected", GOLDEN)
def test_golden(html, expected):
    assert md(html) == expected


def test_blockquote_with_break():
    assert md("<blockquote>line1<br><br>line2</blockquote>") == (
        "> line1\n>\n> line2"
    )


def test_full_page_composition():
    html = (
        '<html><head><title>x</title></head><body>'
        "<h2>Doc 7</h2>"
        '<p>See <a href="/d/7">details</a> for <strong>doc 7</strong>.</p>'
        "<ul><li>lang es</li><li>source src0</li></ul>"
        "<blockquote><p>some words here</p></blockquote>"
        "<pre>id=7</pre><hr></body></html>"
    )
    assert md(html) == (
        "## Doc 7\n\n"
        "See [details](/d/7) for **doc 7**.\n\n"
        "- lang es\n- source src0\n\n"
        "> some words here\n\n"
        "```\nid=7\n```\n\n"
        "---"
    )


def test_attr_quoting_forms():
    assert md("<p><a href='/s'>s</a></p>") == "[s](/s)"
    assert md("<p><a href=/u>u</a></p>") == "[u](/u)"
    assert md('<p><a HREF="/c">c</a></p>') == "[c](/c)"
    # entity in attribute unescapes
    assert md('<p><a href="/a&amp;b">x</a></p>') == "[x](/a&b)"


def test_determinism_on_soup():
    import random

    rng = random.Random(42)
    tags = ["<p>", "</p>", "<b>", "</b>", "<ul>", "<li>", "</ul>", "<pre>",
            "</pre>", "<br>", "<h1>", "</h1>", "text ", "&amp; ", "<a href=x>",
            "</a>", "<blockquote>", "</blockquote>", "<div>", "</div>"]
    for _ in range(200):
        soup = "".join(rng.choice(tags) for _ in range(rng.randint(1, 40)))
        assert md(soup) == md(soup)  # stable
        md(soup + "<")  # truncated tail never raises


def test_spark_operator(spark):
    df = spark.createDataFrame(
        [("u1", b"<h1>T</h1><p>body text</p>"), ("u2", None)],
        "url string, html binary",
    )
    rows = {r["url"]: r for r in to_markdown_pages(df).collect()}
    assert rows["u1"]["markdown"] == "# T\n\nbody text"
    assert rows["u1"]["error"] is None
    assert rows["u2"]["markdown"] is None
    assert rows["u2"]["error"] == "null html"


# --- review-caught parser fixes (r6) ---------------------------------------

def test_unclosed_head_implies_close():
    """HTML5 permits omitting </head>; any non-head tag implies it."""
    assert md(
        '<html><head><meta charset="utf-8"><body><p>Hello world</p>'
        "</body></html>") == "Hello world"
    # an unclosed <title> inside head still swallows only title text
    assert md(
        "<html><head><title>t<body><p>x</p>") == "x"


def test_loose_list_items_keep_their_text():
    assert md(
        "<ul><li><p>Hello</p></li><li>plain</li></ul>") == \
        "- Hello\n- plain"
    # multiple paragraphs merge into the item line
    assert md(
        "<ol><li><p>a</p><p>b</p></li></ol>") == "1. a b"
    # a pre child renders as indented continuation lines
    assert md(
        "<ul><li>x<pre>\ncode\n</pre></li></ul>") == \
        "- x\n  ```\n  code\n  ```"


def test_unquoted_attr_trailing_slash_is_not_self_closing():
    assert md('<p><a href=/docs/>Docs</a></p>') == \
        "[Docs](/docs/)"
    # a real self-closing tag (quoted value then '/') still works
    assert md('<p><img src="i.png" alt="a"/></p>') == \
        "![a](i.png)"
    assert md("<p>a<br/>b</p>") == "a\nb"


def test_data_attrs_do_not_alias_real_attrs():
    assert md('<p><a data-href="/track">x</a></p>') == "[x]()"
    assert md(
        '<p><img data-src="lazy.jpg" src="real.gif" alt="a"></p>') == \
        "![a](real.gif)"
