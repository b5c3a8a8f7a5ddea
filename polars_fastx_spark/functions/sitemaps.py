"""Sitemap ingestion — frontier seeds from sitemaps.org XML.

The third leg of the polite-crawl stack (robots gate, domain cap,
and THIS): sites declare their canonical URL inventory in
``sitemap.xml`` (advertised by robots.txt ``Sitemap:`` lines), and a
crawl frontier seeded from sitemaps reaches content the link graph
alone misses. The sitemaps.org format is regex-tier XML — a flat
``<urlset>`` of ``<url><loc>..</loc><lastmod>..</lastmod></url>``
blocks, or a ``<sitemapindex>`` of child ``<sitemap><loc>`` pointers
— so extraction is pure codegen ``Column`` work (RE2∩Java-safe,
oracle-replayable), the same tier as ``functions/html.py``.

At scale: per-row regexes over sitemap documents (KB-to-MB strings),
zero Python, zero shuffles until the caller aggregates; the
lastmod column feeds recrawl scheduling (fetch what changed since
the last capture) and ``snapshot_diff`` does the rest.

Reference parity: the reference (apcamargo/polars-fastx) has no
crawl surface; north-star extension per /root/repo/BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


#: one <url>…</url> (or <sitemap>…</sitemap>) block — shared with the
#: SQL oracle so the engines cannot drift
_URL_BLOCK_RX = r"(?is)<url\s*>.*?</url\s*>"
_CHILD_BLOCK_RX = r"(?is)<sitemap\s*>.*?</sitemap\s*>"
_LOC_RX = r"(?is)<loc\s*>\s*(.*?)\s*</loc\s*>"
_LASTMOD_RX = r"(?is)<lastmod\s*>\s*(.*?)\s*</lastmod\s*>"


def robots_sitemaps(robots_txt: Column | str) -> Column:
    """Array of sitemap URLs a robots.txt advertises (``Sitemap:``
    lines live OUTSIDE user-agent groups per the spec, so no group
    logic applies)."""
    return F.transform(
        F.regexp_extract_all(
            _col(robots_txt),
            F.lit(r"(?im)^\s*sitemap\s*:\s*(\S+)\s*$"),
            1,
        ),
        lambda x: F.trim(x),
    )


def is_sitemap_index(xml: Column | str) -> Column:
    """True for a ``<sitemapindex>`` document (child pointers, not
    page URLs)."""
    return _col(xml).rlike(r"(?is)<sitemapindex[\s>]")


def sitemap_children(xml: Column | str) -> Column:
    """Array of child sitemap URLs of a ``<sitemapindex>`` document
    ('' entries never appear; non-index docs yield [])."""
    blocks = F.regexp_extract_all(
        _col(xml), F.lit(_CHILD_BLOCK_RX), 0
    )
    locs = F.transform(
        blocks, lambda b: F.regexp_extract(b, _LOC_RX, 1)
    )
    return F.filter(locs, lambda s: F.length(s) > 0)


def parse_sitemap(
    df: DataFrame,
    xml_col: str,
    out_loc: str = "loc",
    out_lastmod: str = "lastmod",
) -> DataFrame:
    """Explode a ``<urlset>`` sitemap column into one row per
    ``<url>`` block, pairing each ``<loc>`` with ITS OWN block's
    ``<lastmod>`` ('' when absent — extracting the two tag streams
    independently would mis-align them the moment one url omits
    lastmod). Core entity decode on the loc (``&amp;`` URLs are the
    common case). Other columns pass through."""
    blocks = F.explode(
        F.regexp_extract_all(F.col(xml_col), F.lit(_URL_BLOCK_RX), 0)
    )
    d = df.withColumn("__block", blocks)
    loc = F.regexp_extract(F.col("__block"), _LOC_RX, 1)
    for ent, rep in (
        ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", '"'), ("&#39;", "'"),
    ):
        loc = F.replace(loc, F.lit(ent), F.lit(rep))
    return (
        d.withColumn(out_loc, loc)
        .withColumn(
            out_lastmod,
            F.regexp_extract(F.col("__block"), _LASTMOD_RX, 1),
        )
        .filter(F.length(out_loc) > 0)
        .drop("__block")
    )


def sitemap_seeds(
    sitemaps: DataFrame,
    crawled: DataFrame,
    robots: DataFrame | None = None,
    xml_col: str = "xml",
    url_col: str = "url",
    agent: str = "mybot",
) -> DataFrame:
    """The frontier-seed composition: parse every fetched ``<urlset>``
    sitemap, drop URLs already crawled (anti-join on the url key —
    the crawled set is corpus-sized, so this is a key shuffle, never
    a broadcast), and, when ``robots`` (domain, robots_txt) is given,
    keep only fetchable seeds (:func:`...robots.robots_gate`).
    Returns (url, lastmod) — feed into ``urls.domain_cap`` for the
    politeness budget exactly like link-graph frontier candidates."""
    from polars_fastx_spark.functions.robots import robots_gate

    seeds = (
        parse_sitemap(
            sitemaps.filter(~is_sitemap_index(F.col(xml_col))), xml_col
        )
        .select(F.col("loc").alias(url_col), "lastmod")
        .distinct()
    )
    seeds = seeds.join(
        crawled.select(url_col).distinct(), url_col, "left_anti"
    )
    if robots is not None:
        seeds = robots_gate(seeds, robots, url_col=url_col, agent=agent)
    return seeds


def recrawl_candidates(
    crawled: DataFrame,
    entries: DataFrame,
    url_col: str = "url",
    fetched_col: str = "fetched_at",
    lastmod_col: str = "lastmod",
) -> DataFrame:
    """Already-crawled URLs whose sitemap ``lastmod`` moved past the
    recorded fetch time — the RECRAWL half of the sitemap signal
    (:func:`sitemap_seeds` is the discovery half: its anti-join keeps
    only never-crawled URLs, so changed-but-known pages were
    invisible to the loop until this). One equi-join on the url key
    (both sides corpus-sized → key shuffle) + one row-local compare;
    output = the ``crawled`` row plus ``lastmod``. The two columns
    must be mutually comparable — ISO-8601 strings compare correctly
    as strings (the sitemap wire format), epoch numbers as numbers;
    NULL lastmod (sitemap didn't say) never triggers a recrawl."""
    e = (
        entries.select(F.col(url_col), F.col(lastmod_col))
        .groupBy(url_col)
        .agg(F.max(lastmod_col).alias(lastmod_col))
    )
    return crawled.join(e, url_col, "inner").filter(
        F.col(lastmod_col) > F.col(fetched_col)
    )


def recrawl_schedule(
    crawled: DataFrame,
    entries: DataFrame,
    delays: DataFrame,
    url_col: str = "url",
    fetched_col: str = "fetched_at",
    lastmod_col: str = "lastmod",
    cap: int | None = None,
    default_delay: float = 1.0,
) -> DataFrame:
    """The full recrawl loop in one call: stale candidates
    (:func:`recrawl_candidates`) → optional per-domain politeness
    budget (``urls.domain_cap``) → Crawl-delay pacing
    (``robots.fetch_schedule``). Returns the candidates with
    ``domain`` and ``fetch_offset_s`` — the same schedule contract as
    the discovery frontier, so a fetch loop drains both queues with
    one discipline."""
    from polars_fastx_spark.functions.robots import fetch_schedule
    from polars_fastx_spark.functions.urls import domain_cap

    cand = recrawl_candidates(
        crawled, entries, url_col, fetched_col, lastmod_col
    )
    if cap is not None:
        cand = domain_cap(cand, url_col, cap=cap)
    return fetch_schedule(
        cand, delays, url_col=url_col, default_delay=default_delay
    )
