"""functions/robots.py — RFC 9309 robots.txt parsing + URL gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_fastx_spark.functions import robots


def _rules(spark):
    rb = spark.createDataFrame(
        [
            (
                "a.com",
                "User-agent: *\nDisallow: /private/\n"
                "Allow: /private/ok.html\nDisallow: /*.pdf$\n",
            ),
            (
                "b.org",
                "# comment\nUser-agent: mybot\nUser-agent: otherbot\n"
                "Disallow: /\n\nUser-agent: *\nAllow: /\n",
            ),
            ("c.net", "User-agent: *\nDisallow:\n"),  # empty = allow
            ("d.io", ""),
        ],
        "domain string, robots_txt string",
    )
    return robots.parse_robots(rb)


def test_parse_groups_agents_and_patterns(spark):
    got = {
        (r["domain"], r["agent"], r["pattern"]): (
            r["allow"], r["pattern_len"], r["rx"],
        )
        for r in _rules(spark).collect()
    }
    # stacked user-agent lines share one group's rules
    assert got[("b.org", "mybot", "/")] == (False, 1, "^/")
    assert got[("b.org", "otherbot", "/")] == (False, 1, "^/")
    assert got[("b.org", "*", "/")] == (True, 1, "^/")
    # wildcard + anchor translation; metachars escaped
    assert got[("a.com", "*", "/*.pdf$")] == (False, 7, r"^/.*\.pdf$")
    assert got[("a.com", "*", "/private/ok.html")][2] == (
        r"^/private/ok\.html"
    )
    # empty Disallow and empty file parse to NO rules
    assert not [k for k in got if k[0] in ("c.net", "d.io")]


def test_gate_longest_match_allow_ties_and_fallbacks(spark):
    urls = spark.createDataFrame(
        [
            (1, "https://a.com/public/x"),
            (2, "https://a.com/private/secret"),
            (3, "https://a.com/private/ok.html"),  # Allow, longer match
            (4, "https://a.com/doc/file.pdf"),     # wildcard+anchor
            (5, "https://a.com/doc/file.pdf?x=1"), # query defeats $
            (6, "https://b.org/anything"),         # mybot group blocks
            (7, "https://c.net/x"),                # empty Disallow
            (8, "https://norobots.xyz/y"),         # no robots at all
        ],
        "id long, url string",
    )
    out = robots.robots_allowed(urls, _rules(spark), agent="MyBot")
    got = {r["id"]: r["allowed"] for r in out.collect()}
    assert got == {
        1: True, 2: False, 3: True, 4: False, 5: True, 6: False,
        7: True, 8: True,
    }
    # a generic agent falls back to b.org's '*' group (Allow /)
    other = robots.robots_allowed(urls, _rules(spark), agent="randombot")
    assert {r["id"]: r["allowed"] for r in other.collect()}[6] is True


def test_robots_gate_composition(spark):
    rb = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /no/\n")],
        "domain string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [(1, "https://a.com/yes/1"), (2, "https://a.com/no/2")],
        "id long, url string",
    )
    kept = robots.robots_gate(urls, rb, agent="anybot")
    assert [r["id"] for r in kept.collect()] == [1]
    assert kept.columns == ["id", "url"]  # verdict column dropped


def test_robots_gate_keeps_null_urls(spark):
    """A NULL url must get the inline-path verdict (path '/' →
    allowed), not vanish into a NULL semi-join key (round-8 ADVICE
    low #5): the gate's semi-join is null-safe."""
    rb = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /no/\n")],
        "domain string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [(1, "https://a.com/yes/1"), (2, "https://a.com/no/2"),
         (3, None)],
        "id long, url string",
    )
    kept = robots.robots_gate(urls, rb, agent="anybot")
    assert sorted(r["id"] for r in kept.collect()) == [1, 3]


def test_gate_plan_no_python(spark):
    urls = spark.range(100).selectExpr(
        "id", "concat('https://a.com/p/', id) AS url"
    )
    out = robots.robots_allowed(urls, _rules(spark))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_fragment_stripped_before_matching(spark):
    """RFC 9309 matches path+query ONLY: a '#frag' suffix must not
    let a URL evade '/*.pdf$' (round-7 ADVICE low #1)."""
    urls = spark.createDataFrame(
        [
            (1, "https://a.com/doc/file.pdf#sec"),   # frag can't save it
            (2, "https://a.com/doc/file.pdf?x=1#s"), # query defeats $
            (3, "https://a.com/private/x#/ok.html"), # frag can't free it
        ],
        "id long, url string",
    )
    out = robots.robots_allowed(urls, _rules(spark), agent="mybot")
    got = {r["id"]: r["allowed"] for r in out.collect()}
    assert got == {1: False, 2: True, 3: False}


def test_precedence_ranks_by_octets_not_chars(spark):
    """RFC 9309 §2.2.2 ranks rules by OCTETS (round-7 ADVICE low #3):
    Allow '/p/*x' (5 chars = 5 octets) vs Disallow '/p/éé' (5 chars
    but 7 octets in UTF-8). Char-count ranking ties them (Allow wins
    ties → allowed); octet ranking makes Disallow strictly longer →
    blocked."""
    rb = spark.createDataFrame(
        [("a.com", "User-agent: *\nAllow: /p/*x\nDisallow: /p/éé\n")],
        "domain string, robots_txt string",
    )
    rules = robots.parse_robots(rb)
    got = {
        r["pattern"]: r["pattern_len"] for r in rules.collect()
    }
    assert got == {"/p/*x": 5, "/p/éé": 7}
    urls = spark.createDataFrame(
        [(1, "https://a.com/p/ééx")], "id long, url string"
    )
    out = robots.robots_allowed(urls, rules, agent="anybot")
    assert out.collect()[0]["allowed"] is False


def test_parse_crawl_delays_agent_resolution(spark):
    rb = spark.createDataFrame(
        [
            ("a.com", "User-agent: *\nCrawl-delay: 2\nDisallow: /x\n"),
            ("b.org",
             "User-agent: mybot\nCrawl-delay: 0.5\n\n"
             "User-agent: *\nCrawl-delay: 10\n"),
            ("c.net", "User-agent: *\nCrawl-delay: abc\n"),  # junk drops
            ("d.io", "User-agent: *\nCrawl-delay: 3\nCrawl-delay: 7\n"),
        ],
        "domain string, robots_txt string",
    )
    got = {
        r["domain"]: r["crawl_delay"]
        for r in robots.parse_crawl_delays(rb, agent="MyBot").collect()
    }
    # named group beats '*'; several applicable values keep the MAX;
    # junk values drop the domain entirely (scheduler default covers)
    assert got == {"a.com": 2.0, "b.org": 0.5, "d.io": 7.0}


def test_fetch_schedule_offsets_and_default(spark):
    urls = spark.createDataFrame(
        [(f"https://a.com/p{i}",) for i in range(4)]
        + [(f"https://nodelay.net/q{i}",) for i in range(3)],
        "url string",
    )
    delays = spark.createDataFrame(
        [("a.com", 2.0)], "domain string, crawl_delay double"
    )
    out = robots.fetch_schedule(urls, delays, default_delay=1.0)
    rows = out.collect()
    by_dom = {}
    for r in rows:
        by_dom.setdefault(r["domain"], []).append(r["fetch_offset_s"])
    # per domain: offsets are (k-1)*delay for k=1..n, whatever the
    # (md5-deterministic) url order
    assert sorted(by_dom["a.com"]) == [0.0, 2.0, 4.0, 6.0]
    assert sorted(by_dom["nodelay.net"]) == [0.0, 1.0, 2.0]
    # determinism: recomputing yields the SAME url -> offset map
    again = {
        r["url"]: r["fetch_offset_s"]
        for r in robots.fetch_schedule(urls, delays).collect()
    }
    assert again == {r["url"]: r["fetch_offset_s"] for r in rows}


def test_crawl_delay_lines_do_not_disturb_rule_parse(spark):
    rb = spark.createDataFrame(
        [("a.com",
          "User-agent: *\nCrawl-delay: 5\nDisallow: /private/\n")],
        "domain string, robots_txt string",
    )
    rules = robots.parse_robots(rb)
    assert [r["pattern"] for r in rules.collect()] == ["/private/"]


def test_fetch_schedule_explicit_domain_col_no_duplicate(spark):
    urls = spark.createDataFrame(
        [("https://a.com/1", "a.com"), ("https://a.com/2", "a.com")],
        "url string, domain string",
    )
    delays = spark.createDataFrame(
        [("a.com", 2.0)], "domain string, crawl_delay double"
    )
    out = robots.fetch_schedule(urls, delays, domain_col="domain")
    assert out.columns.count("domain") == 1
    assert sorted(r["fetch_offset_s"] for r in out.collect()) == [0.0, 2.0]
