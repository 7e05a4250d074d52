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
