"""robots.txt exclusion: parse per-host robots bodies and filter a pages
table by the Robots Exclusion Protocol decision rule.

Companion to text_analysis.noindex_filter (meta-robots): that one reads the
page's own html; this one applies the HOST's crawl policy — the op a crawl
pipeline runs before fetch/extraction. Semantics follow RFC 9309 including
the `*` / trailing-`$` wildcard extensions (§2.2.3) that real robots.txt
files use constantly (`Disallow: /*?`, `Disallow: /*.pdf$`):

- group selection: consecutive `User-agent:` lines open a group; rules
  apply to all agents of their group; if any group names the exact agent,
  only exact groups apply, else `*` groups (RFC 9309 §2.2.1);
- matching: `*` in a rule path matches any character run; a trailing `$`
  anchors the rule to the end of the path; every other character is
  literal (a non-trailing `$` is literal);
- decision: the MOST SPECIFIC matching rule wins, specificity = count of
  literal (non-wildcard) octets in the rule path; tie -> allow; no
  matching rule or no robots.txt for the host -> allow (§2.2.2).
- NULL or unparseable urls yield no host, match no rules, and are
  therefore allowed — the row survives with robots_allowed=true (the
  row-multiplicity contract holds for them too).

Everything is JVM-side (split/explode/window/agg — no UDFs): parsing a
corpus of robots bodies is one explode + two window passes over lines, and
the page-side decision is one broadcastable join on host (the rules table
is tiny — one row per (host, rule)) plus a groupBy over matched rules.
Wildcard rules compile to anchored Java regexes ONCE per rule row at plan
build (pure column exprs); literal rules keep the `startswith` fast path,
so the common all-literal host never pays a regex. Percent-encoding
equivalence (§2.2.2 via RFC 3986 §6.2.2): both sides are normalized
before comparison — `%XX` escapes of UNRESERVED characters decode to the
character, all other escapes uppercase their hex — so `/%7Euser` matches
a `Disallow: /~user/` rule and `%2f` matches `%2F`. A literal `%2A`
stays escaped (reserved), so it can never turn into a `*` wildcard.
The normalization is a JVM higher-order expression (split-on-lookahead +
transform), no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _selected_group_lines(
    robots: DataFrame,
    host_col: str,
    body_col: str,
    user_agent: str,
    keys: tuple,
) -> DataFrame:
    """Shared RFC 9309 group machinery: explode lines, strip comments,
    key/value split, block segmentation on consecutive User-agent runs,
    and group selection (exact-name groups shadow `*` groups per host).
    Returns the (host, idx, key, value) rows whose key is in `keys`
    inside the selected groups."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), r"\r?\n")).alias("idx", "line"),
    ).select(
        "host", "idx",
        F.trim(F.regexp_replace("line", r"#.*$", "")).alias("line"),
    ).where(F.col("line") != "")

    kv = lines.select(
        "host", "idx",
        F.lower(F.trim(F.regexp_extract("line", r"^([^:]+):", 1))).alias("key"),
        F.trim(F.regexp_extract("line", r"^[^:]+:(.*)$", 1)).alias("value"),
    ).where(F.col("key").isin("user-agent", *keys))

    w = Window.partitionBy("host").orderBy("idx")
    blocks = kv.withColumn(
        "new_block",
        ((F.col("key") == "user-agent")
         & (F.coalesce(F.lag("key").over(w), F.lit("")) != "user-agent"))
        .cast("int"),
    ).withColumn("block_id", F.sum("new_block").over(w)).drop("new_block")

    agents = (
        blocks.where(F.col("key") == "user-agent")
        .groupBy("host", "block_id")
        .agg(
            F.max((F.lower("value") == user_agent.lower()).cast("int")).alias("exact"),
            F.max((F.col("value") == "*").cast("int")).alias("star"),
        )
    )
    host_has_exact = agents.groupBy("host").agg(
        F.max("exact").alias("host_exact")
    )
    selected = (
        agents.join(host_has_exact, "host")
        .where(
            (F.col("exact") == 1)
            | ((F.col("host_exact") == 0) & (F.col("star") == 1))
        )
        .select("host", "block_id")
    )
    return (
        blocks.where(F.col("key").isin(*keys))
        .join(selected, ["host", "block_id"])
    )


def parse_robots_rules(
    robots: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
    user_agent: str = "*",
) -> DataFrame:
    """robots(host, body) -> (host, rule 'allow'|'disallow', prefix).

    Only rules in the groups selected for `user_agent` survive (exact-name
    groups shadow `*` groups per host). Empty-prefix Disallow lines are
    RFC'd as allow-all and kept as zero-length allow rules (they only ever
    lose the longest-match comparison)."""
    sel = _selected_group_lines(
        robots, host_col, body_col, user_agent, ("allow", "disallow"))
    return sel.select(
        "host",
        # empty Disallow == allow-all (RFC): flip it to a 0-length allow
        F.when(
            (F.col("key") == "disallow") & (F.col("value") == ""), F.lit("allow")
        ).otherwise(F.col("key")).alias("rule"),
        F.col("value").alias("prefix"),
    )


def robots_crawl_delays(
    robots: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
    user_agent: str = "*",
) -> DataFrame:
    """robots(host, body) -> (host, crawl_delay) in seconds — the pacing
    input for operators/sitemap.fetch_waves.

    Crawl-delay is not in RFC 9309 but Bing/Yandex honor it and real
    robots.txt files carry it constantly; like Allow/Disallow it is
    GROUP-SCOPED, so the same exact-agent-shadows-`*` selection applies
    (unlike the group-independent Sitemap directive). Unparseable or
    negative values are dropped; when the selected groups carry several
    valid values the MAX (most conservative) wins. Hosts with no valid
    directive emit no row — the crawler's default cadence applies."""
    sel = _selected_group_lines(
        robots, host_col, body_col, user_agent, ("crawl-delay",))
    # try_cast, not cast: ANSI mode would make 'Crawl-delay: fast' a task
    # failure instead of a dropped directive
    d = sel.select(
        "host", F.col("value").try_cast("double").alias("crawl_delay"))
    return (
        d.where(F.col("crawl_delay").isNotNull() & (F.col("crawl_delay") >= 0))
        .groupBy("host")
        .agg(F.max("crawl_delay").alias("crawl_delay"))
    )


def robots_sitemaps(
    robots: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """robots(host, body) -> (host, ordinal, sitemap_url) — the `Sitemap:`
    directives that seed the crawl frontier (operators/sitemap.py consumes
    the fetched documents).

    Per the sitemaps.org protocol (and RFC 9309 §2.2.4 "other records"),
    Sitemap lines are GROUP-INDEPENDENT: every line counts regardless of
    which User-agent group it sits in, so no group selection runs here.
    The directive value keeps its case (URLs are case-sensitive) and is
    emitted verbatim — resolution of relative forms is the fetcher's job.
    `ordinal` is the 0-based file order within the host.

    Scan shape: split/explode + one window over (host, line index) — all
    JVM expressions, no Python; the output is one tiny row per directive.
    """
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), r"\r?\n")).alias("idx", "line"),
    ).select(
        "host", "idx",
        F.trim(F.regexp_replace("line", r"#.*$", "")).alias("line"),
    ).where(
        (F.lower(F.trim(F.regexp_extract("line", r"^([^:]+):", 1)))
         == "sitemap")
        & (F.trim(F.regexp_extract("line", r"^[^:]+:(.*)$", 1)) != "")
    )
    w = Window.partitionBy("host").orderBy("idx")
    return lines.select(
        "host",
        (F.row_number().over(w) - 1).alias("ordinal"),
        F.trim(F.regexp_extract("line", r"^[^:]+:(.*)$", 1))
        .alias("sitemap_url"),
    )


def normalize_pct(col) -> "F.Column":
    """RFC 3986 §6.2.2 percent-encoding normalization for robots matching:
    decode `%XX` where XX is an UNRESERVED character (ALPHA / DIGIT /
    '-' '.' '_' '~'), uppercase the hex of every other escape. Pure JVM:
    split on a `(?=%)` lookahead so every piece after the first starts
    with '%', transform each piece, concat back."""
    def fix(s):
        is_esc = s.rlike("^%[0-9A-Fa-f]{2}")
        code = F.conv(F.substring(s, 2, 2), 16, 10).cast("int")
        unreserved = (
            ((code >= 65) & (code <= 90))
            | ((code >= 97) & (code <= 122))
            | ((code >= 48) & (code <= 57))
            | code.isin(45, 46, 95, 126)
        )
        rest = F.substring(s, 4, 2147483647)
        return (
            F.when(is_esc & unreserved, F.concat(F.char(code), rest))
            .when(is_esc, F.concat(F.upper(F.substring(s, 1, 3)), rest))
            .otherwise(s)
        )

    return F.concat_ws("", F.transform(F.split(col, "(?=%)"), fix))


def compile_rule_patterns(rules: DataFrame) -> DataFrame:
    """Annotate a (host, rule, prefix) table with wildcard-match columns.

    Adds (pure column exprs, evaluated once per rule row):
    - `__prefix_n` — the rule path percent-normalized (normalize_pct);
      matching and specificity run on THIS, so `%7e` == `~` == `%7E`;
    - `__wild`     — rule path contains `*` or ends with the `$` anchor;
    - `__pattern`  — anchored Java regex for wild rules (`*` -> `.*`, all
      regex metachars escaped, trailing `$` -> end anchor), NULL otherwise;
    - `__lit_len`  — RFC 9309 §2.2.2 specificity: count of literal octets
      (normalized rule path length minus `*`s and the trailing anchor).
    """
    rules = rules.withColumn("__prefix_n", normalize_pct(F.col("prefix")))
    ends_anchor = F.col("__prefix_n").endswith("$")
    body = F.when(
        ends_anchor, F.expr("substring(__prefix_n, 1, length(__prefix_n) - 1)")
    ).otherwise(F.col("__prefix_n"))
    # escape every Java-regex metachar EXCEPT `*` (translated below)
    escaped = F.regexp_replace(body, r"[\\^$.|?+(){}\[\]]", r"\\$0")
    pattern = F.concat(
        F.lit("^"),
        F.regexp_replace(escaped, r"\*+", ".*"),  # runs of * collapse to one .*
        F.when(ends_anchor, F.lit("$")).otherwise(F.lit("")),
    )
    wild = F.col("__prefix_n").contains("*") | ends_anchor
    return (
        rules.withColumn("__wild", wild)
        .withColumn("__pattern", F.when(wild, pattern))
        .withColumn("__lit_len", F.length(F.regexp_replace(body, r"\*", "")))
    )


def robots_filter(
    pages: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    keep_blocked: bool = False,
) -> DataFrame:
    """Apply (host, rule, prefix) decisions to a pages table.

    Scale shape: decisions are computed over the DISTINCT (host, path)
    set — extract host+path at scan speed (case-normalized per RFC 3986:
    scheme and authority are case-insensitive), LEFT join the (tiny,
    broadcastable) rules table, most-specific-matching-rule groupBy keyed
    by the high-cardinality (host, path) pair — then joined back to the
    pages rows. Row multiplicity and every page column survive untouched
    (re-fetched duplicate urls stay duplicate rows; NULL/unparseable urls
    survive as allowed). Literal rules match via `startswith`; wildcard
    rules via their compiled anchored regex (see compile_rule_patterns).
    keep_blocked=True returns all rows with a `robots_allowed` flag
    instead of filtering."""
    # NULL url -> NULL host from regexp_extract; coalesce to "" so the
    # (host, path) keys are never NULL (NULL keys would vanish in the
    # join-back, silently dropping rows). "" matches no rule host -> allow,
    # identical to the malformed-url case where regexp_extract yields "".
    host = F.coalesce(
        F.lower(F.regexp_extract(F.col(url_col), r"(?i)^[a-z]+://([^/]+)", 1)),
        F.lit(""),
    )
    path = F.coalesce(
        F.nullif(
            F.regexp_extract(F.col(url_col), r"(?i)^[a-z]+://[^/]+(/.*)$", 1),
            F.lit(""),
        ),
        F.lit("/"),
    )
    keyed = pages.withColumn("__host", host).withColumn("__path", path)
    pairs = keyed.select("__host", "__path").distinct()

    norm_rules = compile_rule_patterns(
        rules.select(F.lower("host").alias("host"), "rule", "prefix")
    )
    # both sides percent-normalized before comparison (RFC 9309 §2.2.2);
    # the join-back key stays the RAW path — equivalent raw spellings each
    # carry their own (identical) decision
    path_n = normalize_pct(F.col("__path"))
    matches = F.when(
        F.col("__wild"), F.regexp_like(path_n, F.col("__pattern"))
    ).otherwise(path_n.startswith(F.col("__prefix_n")))
    decided = (
        pairs.join(F.broadcast(norm_rules), pairs["__host"] == norm_rules["host"], "left")
        .withColumn(
            "__m",
            F.when(
                F.col("rule").isNotNull() & matches,
                F.struct(
                    F.col("__lit_len").alias("len"),
                    # allow > disallow at equal specificity: allow sorts higher
                    (F.col("rule") == "allow").cast("int").alias("is_allow"),
                ),
            ),
        )
        .groupBy("__host", "__path")
        .agg(F.max("__m").alias("__best"))
        .withColumn(
            "robots_allowed",
            F.coalesce(
                (F.col("__best.is_allow") == 1) | F.col("__best.len").isNull(),
                F.lit(True),
            ),
        )
        .select("__host", "__path", "robots_allowed")
    )

    out = keyed.join(decided, ["__host", "__path"]).select(
        *pages.columns, "robots_allowed"
    )
    if keep_blocked:
        return out
    return out.where(F.col("robots_allowed")).drop("robots_allowed")
