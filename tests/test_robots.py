"""robots.txt exclusion: RFC 9309 group selection, longest-match decision,
tie-break, empty-disallow, and the page-side filter."""

from __future__ import annotations

from pyspark.sql import functions as F

from space_launch_telemetry_analyzer_spark.operators import robots as R

ROBOTS_A = """# comments are stripped
User-agent: *
Disallow: /private/
Allow: /private/ok/
Disallow: /tmp

User-agent: specialbot
Disallow: /
"""

ROBOTS_B = """User-agent: otherbot
Disallow: /
User-agent: *
Disallow:
"""


def _rules(spark, ua="*"):
    df = spark.createDataFrame(
        [("a.example", ROBOTS_A), ("b.example", ROBOTS_B)], "host string, body string"
    )
    return R.parse_robots_rules(df, user_agent=ua)


def test_parse_group_selection_star(spark):
    got = {(r.host, r.rule, r.prefix) for r in _rules(spark).collect()}
    assert got == {
        ("a.example", "disallow", "/private/"),
        ("a.example", "allow", "/private/ok/"),
        ("a.example", "disallow", "/tmp"),
        ("b.example", "allow", ""),  # empty Disallow -> allow-all
    }


def test_parse_exact_agent_shadows_star(spark):
    got = {(r.host, r.rule, r.prefix) for r in _rules(spark, ua="specialbot").collect()}
    # a.example has an exact specialbot group -> only it applies there;
    # b.example has no specialbot group -> its * group applies
    assert got == {
        ("a.example", "disallow", "/"),
        ("b.example", "allow", ""),
    }


def test_filter_longest_match_and_ties(spark):
    pages = spark.createDataFrame(
        [
            ("https://a.example/public/x",),      # no match -> allowed
            ("https://a.example/private/x",),     # disallow /private/
            ("https://a.example/private/ok/x",),  # allow beats shorter disallow
            ("https://a.example/tmpfile",),       # prefix match (no slash req)
            ("https://b.example/anything",),      # empty disallow -> allowed
            ("https://norobots.example/x",),      # host without robots -> allowed
        ],
        "url string",
    )
    out = R.robots_filter(pages, _rules(spark), keep_blocked=True)
    got = {r.url: r.robots_allowed for r in out.collect()}
    assert got == {
        "https://a.example/public/x": True,
        "https://a.example/private/x": False,
        "https://a.example/private/ok/x": True,
        "https://a.example/tmpfile": False,
        "https://b.example/anything": True,
        "https://norobots.example/x": True,
    }
    kept = {r.url for r in R.robots_filter(pages, _rules(spark)).collect()}
    assert kept == {u for u, ok in got.items() if ok}


def test_filter_equal_length_tie_allows(spark):
    rules = spark.createDataFrame(
        [("t.example", "allow", "/p/"), ("t.example", "disallow", "/p/")],
        "host string, rule string, prefix string",
    )
    pages = spark.createDataFrame([("https://t.example/p/x",)], "url string")
    out = R.robots_filter(pages, rules, keep_blocked=True).first()
    assert out.robots_allowed is True


def test_filter_preserves_columns_and_root_path(spark):
    rules = spark.createDataFrame(
        [("r.example", "disallow", "/")], "host string, rule string, prefix string"
    )
    pages = spark.createDataFrame(
        [("https://r.example", 7), ("https://ok.example/x", 8)],
        "url string, payload int",
    )
    out = R.robots_filter(pages, rules)
    assert out.columns == ["url", "payload"]
    rows = out.collect()
    # bare host url normalizes to path '/', blocked by Disallow: /
    assert [(r.url, r.payload) for r in rows] == [("https://ok.example/x", 8)]


def test_filter_preserves_duplicate_urls(spark):
    """Re-fetched urls (same url, different payloads) must stay distinct
    rows with their own columns — the decision joins back, never collapses."""
    rules = spark.createDataFrame(
        [("d.example", "disallow", "/no/")], "host string, rule string, prefix string"
    )
    pages = spark.createDataFrame(
        [("https://d.example/ok", 1), ("https://d.example/ok", 2),
         ("https://d.example/no/x", 3)],
        "url string, fetch int",
    )
    out = R.robots_filter(pages, rules)
    rows = sorted((r.url, r.fetch) for r in out.collect())
    assert rows == [("https://d.example/ok", 1), ("https://d.example/ok", 2)]


def test_filter_wildcard_star_and_anchor(spark):
    """RFC 9309 §2.2.3 wildcard examples: `*` matches any run, trailing
    `$` anchors at end, a non-trailing `$` is literal."""
    rules = spark.createDataFrame(
        [
            ("w.example", "disallow", "/*.pdf$"),   # any .pdf, end-anchored
            ("w.example", "disallow", "/p*?"),      # query-string on /p...
            ("w.example", "allow", "/pdfs/"),       # literal, len 6
            ("q.example", "disallow", "/fish*"),    # trailing * == prefix
            ("q.example", "disallow", "/a$b"),      # mid-path $ is literal
        ],
        "host string, rule string, prefix string",
    )
    pages = spark.createDataFrame(
        [
            ("https://w.example/doc.pdf",),          # blocked by /*.pdf$
            ("https://w.example/doc.pdfx",),         # NOT end-anchored match
            ("https://w.example/a/b/deep.pdf",),     # * spans slashes
            ("https://w.example/page?x=1",),         # blocked by /p*?
            ("https://w.example/pdfs/doc.pdf",),     # allow(6 lits) vs disallow(5) -> allowed
            ("https://q.example/fishheads/x",),      # /fish* prefix
            ("https://q.example/a$b/c",),            # literal $ matches
            ("https://q.example/ab/c",),             # literal $ must NOT vanish
        ],
        "url string",
    )
    out = R.robots_filter(pages, rules, keep_blocked=True)
    got = {r.url: r.robots_allowed for r in out.collect()}
    assert got == {
        "https://w.example/doc.pdf": False,
        "https://w.example/doc.pdfx": True,
        "https://w.example/a/b/deep.pdf": False,
        "https://w.example/page?x=1": False,
        "https://w.example/pdfs/doc.pdf": True,
        "https://q.example/fishheads/x": False,
        "https://q.example/a$b/c": False,
        "https://q.example/ab/c": True,
    }


def test_filter_wildcard_specificity_is_literal_count(spark):
    """Specificity counts literal octets only: `/x*abc` (4 literals) loses
    to the 5-literal `/x/ab`; star runs collapse so `/x**y` == `/x*y`."""
    rules = spark.createDataFrame(
        [
            ("s.example", "disallow", "/x/ab"),
            ("s.example", "allow", "/x*abc"),
            ("s.example", "disallow", "/x**y"),
        ],
        "host string, rule string, prefix string",
    )
    pages = spark.createDataFrame(
        [("https://s.example/x/abc",), ("https://s.example/x123y",)],
        "url string",
    )
    got = {
        r.url: r.robots_allowed
        for r in R.robots_filter(pages, rules, keep_blocked=True).collect()
    }
    # /x/abc: allow /x*abc has 5 literals == disallow /x/ab's 5 -> tie -> allow
    assert got["https://s.example/x/abc"] is True
    assert got["https://s.example/x123y"] is False


def test_filter_regex_metachars_in_rule_are_literal(spark):
    """Rule paths with regex metachars (., +, (), []) must match literally
    once the rule is wild — `.` must not become match-any."""
    rules = spark.createDataFrame(
        [("m.example", "disallow", "/a.b(c)[d]+*")],
        "host string, rule string, prefix string",
    )
    pages = spark.createDataFrame(
        [("https://m.example/a.b(c)[d]+e",), ("https://m.example/aXb(c)[d]+e",)],
        "url string",
    )
    got = {
        r.url: r.robots_allowed
        for r in R.robots_filter(pages, rules, keep_blocked=True).collect()
    }
    assert got["https://m.example/a.b(c)[d]+e"] is False
    assert got["https://m.example/aXb(c)[d]+e"] is True


def test_filter_null_and_malformed_urls_survive_as_allowed(spark):
    """NULL or unparseable urls carry no host, match no rules, and must
    survive with robots_allowed=true — never be dropped by the join-back."""
    rules = spark.createDataFrame(
        [("n.example", "disallow", "/")], "host string, rule string, prefix string"
    )
    pages = spark.createDataFrame(
        [(None, 1), ("not-a-url", 2), ("https://n.example/x", 3)],
        "url string, payload int",
    )
    out = R.robots_filter(pages, rules, keep_blocked=True)
    got = {r.payload: (r.url, r.robots_allowed) for r in out.collect()}
    assert got == {
        1: (None, True),
        2: ("not-a-url", True),
        3: ("https://n.example/x", False),
    }
    kept = {r.payload for r in R.robots_filter(pages, rules).collect()}
    assert kept == {1, 2}


def test_filter_case_insensitive_scheme_and_host(spark):
    """RFC 3986: scheme and authority compare case-insensitively — an
    uppercase url must not slip past its host's rules."""
    rules = spark.createDataFrame(
        [("c.example", "disallow", "/private/")],
        "host string, rule string, prefix string",
    )
    pages = spark.createDataFrame(
        [("HTTPS://C.Example/private/x",), ("https://c.example/public/y",)],
        "url string",
    )
    kept = {r.url for r in R.robots_filter(pages, rules).collect()}
    assert kept == {"https://c.example/public/y"}


def test_percent_encoding_normalization(spark):
    """RFC 9309 §2.2.2 / RFC 3986 §6.2.2: unreserved escapes decode,
    other escapes compare hex-case-insensitively; %2A never becomes a
    wildcard."""
    rules = spark.createDataFrame(
        [
            ("p.example", "disallow", "/~user/"),     # plain rule
            ("p.example", "disallow", "/a%2fb"),      # lowercase escape rule
            ("p.example", "disallow", "/x%2Ay"),      # escaped '*': literal
            ("q.example", "disallow", "/%7Edocs/"),   # escaped rule, plain path
        ],
        "host string, rule string, prefix string",
    )
    pages = spark.createDataFrame(
        [
            ("https://p.example/%7Euser/f",),   # decodes -> /~user/ -> blocked
            ("https://p.example/%7euser/f",),   # lowercase hex too
            ("https://p.example/~user/f",),     # plain form -> blocked
            ("https://p.example/a%2Fb/c",),     # %2F vs rule %2f -> blocked
            ("https://p.example/x%2ay",),       # matches literal %2A rule
            ("https://p.example/xZZy",),        # must NOT match (no wildcard)
            ("https://q.example/~docs/d",),     # plain path vs escaped rule
            ("https://q.example/other",),       # allowed
        ],
        "url string",
    )
    out = R.robots_filter(pages, rules, keep_blocked=True)
    got = {r.url: r.robots_allowed for r in out.collect()}
    assert got == {
        "https://p.example/%7Euser/f": False,
        "https://p.example/%7euser/f": False,
        "https://p.example/~user/f": False,
        "https://p.example/a%2Fb/c": False,
        "https://p.example/x%2ay": False,
        "https://p.example/xZZy": True,
        "https://q.example/~docs/d": False,
        "https://q.example/other": True,
    }


def test_normalize_pct_expression(spark):
    df = spark.createDataFrame(
        [("/a%2fb%41c%7e%2A%zz%3",), ("plain",), ("",)], "s string"
    )
    from pyspark.sql import functions as F
    got = [r.n for r in df.select(R.normalize_pct(F.col("s")).alias("n")).collect()]
    # %2f -> %2F (reserved, uppercased); %41 -> A; %7e -> ~; %2A stays;
    # malformed %zz / trailing %3 untouched
    assert got == ["/a%2FbAc~%2A%zz%3", "plain", ""]


def test_robots_sitemaps_group_independent_and_cleaning(spark):
    body = (
        "# top comment\n"
        "Sitemap: https://h/sm-head.xml\n"
        "User-agent: otherbot\n"
        "Disallow: /\n"
        "sitemap: https://h/sm-a.xml.gz # note\r\n"
        "User-agent: *\n"
        "Allow: /\n"
        "SITEMAP: https://h/sm-b.xml\n"
        "Sitemap:\n"          # empty value dropped
        "Sitemap: \n"         # whitespace-only value dropped
    )
    df = spark.createDataFrame([("h", body), ("empty", "User-agent: *\n")],
                               "host string, body string")
    rows = R.robots_sitemaps(df).orderBy("host", "ordinal").collect()
    # group-independent: the otherbot group's directive counts too;
    # key case-insensitive, value case/trailing-comment handled, CRLF ok
    assert [(r.host, r.ordinal, r.sitemap_url) for r in rows] == [
        ("h", 0, "https://h/sm-head.xml"),
        ("h", 1, "https://h/sm-a.xml.gz"),
        ("h", 2, "https://h/sm-b.xml"),
    ]


def test_robots_crawl_delays_group_scoped(spark):
    body_star = "User-agent: *\nDisallow:\nCrawl-delay: 4\n"
    body_both = ("User-agent: mybot\nCrawl-delay: 1.5\n"
                 + body_star)
    body_junk = ("User-agent: *\nCrawl-delay: fast\nCrawl-delay: -2\n"
                 "Crawl-delay: 3\nCrawl-delay: 7\n")
    body_none = "User-agent: *\nDisallow: /x\n"
    df = spark.createDataFrame(
        [("star", body_star), ("both", body_both), ("junk", body_junk),
         ("none", body_none)],
        "host string, body string")
    got = {r["host"]: r["crawl_delay"]
           for r in R.robots_crawl_delays(df, user_agent="mybot").collect()}
    # exact-agent group SHADOWS * (group-scoped, unlike Sitemap lines);
    # junk/negative drop; several valid values keep the max; absent -> no row
    assert got == {"star": 4.0, "both": 1.5, "junk": 7.0}
