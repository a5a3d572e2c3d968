"""RFC 9309 robots.txt gate (sources/robots.py). The driver entry
(`robots_filter`) hash-gates the corpus-wide decision; these pin the
parser/matcher contract on crafted rule sets — including the cases the
class fixture can't reach — and the codegen gate against the pure twin."""

import pytest

from kausaldb_spark.sources import robots as rb

FULL = (
    "# comment\n"
    "User-agent: otherbot\nDisallow: /\n\n"
    "User-agent: mybot\nUser-agent: twinbot\n"
    "Disallow: /private\n"
    "Allow: /private/ok\n"
    "Disallow: /*.pdf$\n"
    "Allow: /\n"
)


def _dec(txt, ua, path):
    return rb.robots_decision(rb.parse_robots_txt(txt, ua), path)


def test_group_selection_longest_token_and_fallback():
    # product token 'mybot/1.0' matches the mybot group, not otherbot/*
    assert _dec(FULL, "MyBot/1.0", "/anything") is True
    # shared group: the second UA line joins the same block
    assert _dec(FULL, "twinbot", "/private/x") is False
    # unknown bot falls back to * (absent here -> allowed)
    assert _dec(FULL, "randombot", "/private/x") is True
    star = FULL + "\nUser-agent: *\nDisallow: /\n"
    assert _dec(star, "randombot", "/private/x") is False


def test_longest_match_wildcard_and_anchor():
    ua = "mybot"
    assert _dec(FULL, ua, "/private/doc") is False      # /private (8) > / (1)
    assert _dec(FULL, ua, "/private/ok/doc") is True    # 11 > 8
    assert _dec(FULL, ua, "/files/a.pdf") is False      # /*.pdf$ matches
    assert _dec(FULL, ua, "/files/a.pdfx") is True      # $ anchor holds
    assert _dec(FULL, ua, "/") is True


def test_tie_resolves_to_allow_and_empty_disallow():
    tie = "User-agent: *\nAllow: /dir\nDisallow: /dir\n"
    assert _dec(tie, "x", "/dir/a") is True
    nothing = "User-agent: *\nDisallow:\n"
    assert _dec(nothing, "x", "/anything") is True


def test_no_rules_allows_and_regex_specials_are_literal():
    assert rb.robots_decision([], "/x") is True
    # regex metacharacters in a rule path must match literally
    lit = "User-agent: *\nDisallow: /a(b)+c\n"
    assert _dec(lit, "x", "/a(b)+c/d") is False
    assert _dec(lit, "x", "/abbc/d") is True  # would match if treated as regex


def test_spark_gate_matches_pure_twin(spark):
    """The codegen decision (broadcast rules + regexp filter + struct max)
    must agree with robots_decision on every (host, path) combination,
    including the no-robots host."""
    hosts = spark.createDataFrame(
        [("a.example.org", FULL)], "host string, content string"
    )
    rules = rb.robots_rules(hosts, "mybot")
    paths = [
        "/private/doc", "/private/ok/doc", "/files/a.pdf", "/files/a.pdfx",
        "/", "/public/x",
    ]
    urls = spark.createDataFrame(
        [(i, f"https://a.example.org{p}") for i, p in enumerate(paths)]
        + [(99, "https://norobots.example.org/private/doc")],
        "doc_id long, url string",
    )
    got = {
        r["doc_id"]: r["robots_allowed"]
        for r in rb.filter_urls_by_robots(urls, rules, keep_denied=True)
        .collect()
    }
    parsed = rb.parse_robots_txt(FULL, "mybot")
    for i, p in enumerate(paths):
        assert got[i] == rb.robots_decision(parsed, p), p
    assert got[99] is True  # no robots.txt -> allowed
    # drop mode removes exactly the denied rows
    kept = sorted(
        r["doc_id"]
        for r in rb.filter_urls_by_robots(urls, rules).collect()
    )
    assert kept == sorted(i for i, p in enumerate(paths)
                          if rb.robots_decision(parsed, p)) + [99]


def test_rule_regex_java_python_equivalence(spark):
    """The compiled rule regex is evaluated by PYTHON re in the pure twin
    and by JAVA regex in the codegen gate — a single escaping divergence
    silently flips decisions. Sweep rule paths over every metacharacter
    robots paths can contain and assert both engines agree on match/no."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    import re as _re

    alphabet = "ab/.*$+?()[]{}|^\\-_%0"
    rules = st.text(alphabet, min_size=1, max_size=8).map(lambda s: "/" + s)
    paths = st.text(alphabet, min_size=0, max_size=10).map(lambda s: "/" + s)

    cases = []

    @settings(max_examples=60, deadline=None)
    @given(rule=rules, path=paths)
    def collect(rule, path):
        rx = rb._rule_regex(rule)
        cases.append((rx, path, bool(_re.match(rx, path))))

    collect()
    df = spark.createDataFrame(
        [(rx, p) for rx, p, _m in cases], "rx string, p string"
    )
    from pyspark.sql import functions as F

    got = [
        r["m"]
        for r in df.select(F.regexp_like("p", F.col("rx")).alias("m"))
        .collect()
    ]
    # java regexp_like is unanchored 'find'; _rule_regex anchors with ^
    # so find == match — require exact agreement with python
    want = [m for _rx, _p, m in cases]
    assert got == want, [
        (c, g) for c, g in zip(cases, got) if c[2] != g
    ][:5]


def test_sitemap_directives_extraction(spark):
    from kausaldb_spark.sources import robots as rb

    hosts = spark.createDataFrame(
        [
            ("a.com",
             "User-agent: *\nDisallow: /x\n"
             "Sitemap: https://a.com/sm.xml\n"),
            ("b.com",
             "SITEMAP:   https://b.com/a.xml   # main\n"
             "sitemap: /rel/b.xml\n"),
            ("c.com", "User-agent: *\nDisallow: /\n"),       # none
            ("d.com",
             "Sitemap: ftp://bad/x.xml\r\n"
             "Sitemap: HTTP://d.com/up.xml\r\n"),            # scheme case
            ("e.com",
             "User-agent: bot\nDisallow: /\n"
             "Sitemap: https://cdn.example/e.xml"),          # cross-host ok
        ],
        "host string, content string",
    )
    got = sorted(
        (r["host"], r["sitemap_url"])
        for r in rb.sitemap_directives(hosts).collect()
    )
    assert got == [
        ("a.com", "https://a.com/sm.xml"),
        ("b.com", "https://b.com/a.xml"),
        ("b.com", "https://b.com/rel/b.xml"),
        ("d.com", "HTTP://d.com/up.xml"),
        ("e.com", "https://cdn.example/e.xml"),
    ]


def test_sitemap_directives_plan_is_codegen(spark):
    from kausaldb_spark.sources import robots as rb

    hosts = spark.createDataFrame(
        [("a.com", "Sitemap: https://a.com/s.xml")],
        "host string, content string",
    )
    plan = (
        rb.sitemap_directives(hosts)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, marker


def test_crawl_delay_group_selection():
    from kausaldb_spark.sources import robots as rb

    c = ("User-agent: bot\nCrawl-delay: 3\n\n"
         "User-agent: *\nCrawl-delay: 7\n")
    assert rb.parse_crawl_delay(c, "botcrawler") == 3   # longest match
    assert rb.parse_crawl_delay(c, "spider") == 7       # star fallback
    # matching group WITHOUT a delay: none — the star delay must not leak
    c2 = ("User-agent: bot\nDisallow: /a\n\n"
          "User-agent: *\nCrawl-delay: 7\n")
    assert rb.parse_crawl_delay(c2, "botcrawler") is None
    assert rb.parse_crawl_delay("User-agent: *\ncrawl-delay: 2.5\n",
                                "x") == 3               # ceil
    assert rb.parse_crawl_delay("User-agent: *\nCrawl-delay: junk\n",
                                "x") is None            # invalid ignored
    assert rb.parse_crawl_delay("", "x") is None


def test_crawl_delay_directives_stage(spark):
    from kausaldb_spark.sources import robots as rb

    hosts = spark.createDataFrame(
        [("a.com", "User-agent: *\nCrawl-delay: 4\n"),
         ("b.com", "User-agent: *\nDisallow: /\n")],
        "host string, content string",
    )
    got = {r["host"]: r["delay_s"]
           for r in rb.crawl_delay_directives(hosts, "bot").collect()}
    assert got == {"a.com": 4}
