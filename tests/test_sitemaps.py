"""functions/sitemaps.py — sitemaps.org parsing + frontier seeding."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_fastx_spark.functions import sitemaps as sm


def test_parse_pairs_loc_with_own_lastmod(spark):
    xml = (
        '<?xml version="1.0"?><urlset xmlns="http://www.sitemaps.org/'
        'schemas/sitemap/0.9">'
        "<url><loc> https://a.com/p?x=1&amp;y=2 </loc>"
        "<lastmod>2026-01-05</lastmod></url>"
        "<url><loc>https://a.com/q</loc></url>"
        "<url><lastmod>2026-01-06</lastmod></url>"  # loc-less: drops
        "</urlset>"
    )
    df = spark.createDataFrame([(xml,)], "xml string")
    got = {
        r["loc"]: r["lastmod"]
        for r in sm.parse_sitemap(df, "xml").collect()
    }
    # entity decode + whitespace trim; missing lastmod is '' — NOT the
    # neighbor block's value
    assert got == {
        "https://a.com/p?x=1&y=2": "2026-01-05",
        "https://a.com/q": "",
    }


def test_index_detection_and_children(spark):
    idx = (
        "<sitemapindex><sitemap><loc>https://a.com/s1.xml</loc>"
        "</sitemap><sitemap><loc>https://a.com/s2.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    df = spark.createDataFrame(
        [(1, idx), (2, "<urlset><url><loc>/x</loc></url></urlset>")],
        "id long, xml string",
    )
    rows = {
        r["id"]: (r["i"], r["c"])
        for r in df.select(
            "id",
            sm.is_sitemap_index("xml").alias("i"),
            sm.sitemap_children("xml").alias("c"),
        ).collect()
    }
    assert rows[1] == (True, ["https://a.com/s1.xml",
                              "https://a.com/s2.xml"])
    assert rows[2] == (False, [])


def test_robots_sitemap_directive(spark):
    rb = (
        "User-agent: *\nDisallow: /private/\n"
        "Sitemap: https://a.com/sitemap.xml\n"
        "sitemap:https://a.com/news.xml\n"
    )
    got = (
        spark.createDataFrame([(rb,)], "t string")
        .select(sm.robots_sitemaps("t").alias("s"))
        .first()["s"]
    )
    assert got == [
        "https://a.com/sitemap.xml", "https://a.com/news.xml",
    ]


def test_seed_composition_crawled_and_robots(spark):
    xml = (
        "<urlset>"
        "<url><loc>https://a.com/new</loc></url>"
        "<url><loc>https://a.com/old</loc></url>"
        "<url><loc>https://a.com/private/x</loc></url>"
        "</urlset>"
    )
    smaps = spark.createDataFrame([(xml,)], "xml string")
    crawled = spark.createDataFrame(
        [("https://a.com/old",)], "url string"
    )
    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /private/\n")],
        "domain string, robots_txt string",
    )
    got = sm.sitemap_seeds(smaps, crawled, robots=robots)
    assert [r["url"] for r in got.collect()] == ["https://a.com/new"]
    # index documents contribute nothing to the seed set
    both = smaps.unionByName(
        spark.createDataFrame(
            [("<sitemapindex><sitemap><loc>https://a.com/new</loc>"
              "</sitemap></sitemapindex>",)],
            "xml string",
        )
    )
    assert sm.sitemap_seeds(both, crawled, robots=robots).count() == 1


def test_plan_no_python(spark):
    df = spark.range(10).selectExpr(
        "concat('<urlset><url><loc>https://a.com/', id, "
        "'</loc></url></urlset>') AS xml"
    )
    out = sm.parse_sitemap(df, "xml")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_recrawl_candidates_and_schedule(spark):
    """Round-9: the recrawl half of the sitemap signal — lastmod past
    the fetch time re-queues a KNOWN url (discovery's anti-join made
    those invisible), NULL/absent/backdated lastmod never does,
    duplicate entries take the max lastmod, and the schedule output
    follows the fetch_schedule politeness contract."""
    from polars_fastx_spark.functions import sitemaps as sm

    crawled = spark.createDataFrame(
        [
            ("https://a.net/stale", 100),
            ("https://a.net/fresh", 100),
            ("https://a.net/nolastmod", 100),
            ("https://a.net/unknown", 100),
            ("https://b.org/stale", 100),
        ],
        "url string, fetched_at long",
    )
    entries = spark.createDataFrame(
        [
            ("https://a.net/stale", 90),    # dup: max(90, 150) = 150
            ("https://a.net/stale", 150),
            ("https://a.net/fresh", 50),    # moved backwards
            ("https://a.net/nolastmod", None),
            ("https://b.org/stale", 101),
            ("https://b.org/never-crawled", 999),  # discovery's job
        ],
        "url string, lastmod long",
    )
    cand = {
        (r["url"], r["lastmod"])
        for r in sm.recrawl_candidates(crawled, entries).collect()
    }
    assert cand == {
        ("https://a.net/stale", 150),
        ("https://b.org/stale", 101),
    }
    delays = spark.createDataFrame(
        [("a.net", 3.0)], "domain string, crawl_delay double"
    )
    sched = {
        (r["url"], r["domain"], r["fetch_offset_s"])
        for r in sm.recrawl_schedule(
            crawled, entries, delays
        ).collect()
    }
    assert sched == {
        ("https://a.net/stale", "a.net", 0.0),
        ("https://b.org/stale", "b.org", 0.0),
    }


def test_recrawl_schedule_politeness_cap(spark):
    """cap= budgets stale candidates per registrable domain before
    scheduling (md5-deterministic survivors), so a mega-domain's
    stale backlog cannot flood the refetch queue."""
    from polars_fastx_spark.functions import sitemaps as sm

    crawled = spark.createDataFrame(
        [(f"https://big.net/p/{i}", 100) for i in range(20)]
        + [("https://small.org/x", 100)],
        "url string, fetched_at long",
    )
    entries = crawled.selectExpr("url", "CAST(200 AS LONG) AS lastmod")
    delays = spark.createDataFrame(
        [("big.net", 2.0)], "domain string, crawl_delay double"
    )
    out = sm.recrawl_schedule(crawled, entries, delays, cap=3).collect()
    by_dom: dict = {}
    for r in out:
        by_dom.setdefault(r["domain"], []).append(r["fetch_offset_s"])
    assert len(by_dom["big.net"]) == 3
    assert sorted(by_dom["big.net"]) == [0.0, 2.0, 4.0]
    assert by_dom["small.org"] == [0.0]
    # deterministic: a rerun picks the same survivors
    again = {r["url"] for r in sm.recrawl_schedule(
        crawled, entries, delays, cap=3).collect()}
    assert again == {r["url"] for r in out}
