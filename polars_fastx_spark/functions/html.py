"""HTML → text extraction — the crawl-pipeline's first transform.

Training corpora built from web crawls (WARC → HTML payloads) need
the VISIBLE text out of markup before any quality/dedup tier runs.
This is the conservative, regex-expressible subset every production
extractor starts from (script/style/comment removal, tag strip,
block-level spacing, core entity decode, whitespace collapse) as a
pure Spark ``Column`` expression chain — whole-stage codegen, zero
Python per row, and exactly replayable by a SQL oracle. The
DOM-accurate tier (real block tree, full entity decode, main-content
/ boilerplate classification) EXISTS at the same column seam:
:mod:`polars_fastx_spark.functions.html_dom` (``dom_extract``,
Arrow-batched stdlib html.parser — differential-tested against this
tier on well-formed pages), selectable in ``crawl_to_corpus`` via
``extractor="dom"``/``"dom_main"``; the regex tier is what runs over
100 TB first.

All patterns are RE2-safe (non-greedy, no backrefs), so Spark's Java
regex and DuckDB's RE2 agree byte-for-byte — oracle-tested.

Reference parity: the reference (apcamargo/polars-fastx) has no HTML
surface; north-star extension per /root/repo/BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


#: entities worth decoding without a full table: the ones that carry
#: text semantics (amp LAST so '&amp;lt;' decodes to '&lt;' not '<')
_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
]

#: elements whose CONTENT is never visible text
_DROP_CONTENT = ("script", "style", "noscript", "template")

#: block-level closers that imply a text break (a space after strip)
_BLOCK_BREAK = (
    "p", "div", "li", "ul", "ol", "table", "tr", "td", "th",
    "h1", "h2", "h3", "h4", "h5", "h6", "section", "article",
    "header", "footer", "blockquote", "pre", "title", "head",
)


def html_title(html: Column | str) -> Column:
    """<title> content, entity-decoded and whitespace-collapsed (''
    when absent)."""
    t = F.regexp_extract(_col(html), r"(?is)<title[^>]*>(.*?)</title>", 1)
    for ent, rep in _ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def strip_html(html: Column | str) -> Column:
    """Visible text of an HTML document: drop script/style/noscript/
    template CONTENT and comments, break at block-element closers and
    <br>, strip every remaining tag, decode the core entities,
    collapse whitespace. One codegen expression chain."""
    s = _col(html)
    for el in _DROP_CONTENT:
        s = F.regexp_replace(
            s, f"(?is)<{el}[^>]*>.*?</{el}>", " "
        )
    s = F.regexp_replace(s, r"(?s)<!--.*?-->", " ")
    closers = "|".join(_BLOCK_BREAK)
    s = F.regexp_replace(s, f"(?i)</(?:{closers})>", " \n")
    s = F.regexp_replace(s, r"(?i)<br[^>]*>", " \n")
    s = F.regexp_replace(s, r"(?s)<[^>]*>", " ")
    for ent, rep in _ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(rep))
    s = F.regexp_replace(s, r"[ \t\r\f]+", " ")
    s = F.regexp_replace(s, r" ?\n[ \n]*", "\n")
    # Spark's trim strips spaces only; the block-break newlines need
    # the regex form
    return F.regexp_replace(s, r"^\s+|\s+$", "")


def html_links(html: Column | str) -> Column:
    """Array of ``<a href=...>`` targets (raw, in document order;
    fragments-only and empty hrefs excluded by the pattern) — the
    extraction that turns a crawl into the LINK GRAPH (per-domain
    PageRank quality priors, frontier discovery). RE2-safe, so the
    SQL oracle replays it; normalize with ``urls.normalize_url`` and
    aggregate to (src_domain, dst_domain) edges downstream."""
    # regexp_extract_all takes its pattern as a Column
    return F.regexp_extract_all(
        _col(html),
        F.lit(r"""(?is)<a[^>]+href\s*=\s*["']([^"'#][^"']*)["']"""),
        1,
    )


#: whole <a ...>...</a> elements with a non-fragment href (group 0 of
#: this is an anchor; _HREF_RX re-extracts the target from it) —
#: shared with the SQL oracle so the two engines cannot drift
_ANCHOR_RX = r"""(?is)<a[^>]+href\s*=\s*["'][^"'#][^"']*["'][^>]*>.*?</a>"""
_HREF_RX = r"""(?is)href\s*=\s*["']([^"'#][^"']*)["']"""


def html_anchors(html: Column | str) -> Column:
    """Array of ``struct<href, text>`` for every link — href plus its
    ANCHOR TEXT (inline markup stripped, entities decoded, whitespace
    collapsed). Anchor text is the classic web-IR description of the
    TARGET page (what other pages call it) — aggregated per target
    domain it becomes a relevance/quality prior the target can't spin,
    the companion signal to the :func:`html_links` link graph.
    RE2-safe; per-element work is row-local codegen."""

    def _one(a: Column) -> Column:
        href = F.regexp_extract(a, _HREF_RX, 1)
        txt = F.regexp_extract(a, r"(?is)^<a[^>]*>(.*)</a>$", 1)
        txt = F.regexp_replace(txt, r"(?s)<[^>]*>", " ")
        for ent, rep in _ENTITIES:
            txt = F.replace(txt, F.lit(ent), F.lit(rep))
        txt = F.trim(F.regexp_replace(txt, r"\s+", " "))
        return F.struct(href.alias("href"), txt.alias("text"))

    return F.transform(
        F.regexp_extract_all(_col(html), F.lit(_ANCHOR_RX), 0), _one
    )


def html_canonical(html: Column | str) -> Column:
    """The page's DECLARED canonical URL (``<link rel="canonical"
    href=...>``), '' when absent — production URL dedup prefers the
    site's own declaration over syntactic normalization when present
    (``coalesce(nullif(html_canonical(h), ''),
    normalize_url(u))`` is the standard composition). Handles either
    attribute order; RE2-safe (two alternated orderings instead of
    lookaround)."""
    h = _col(html)
    a = F.regexp_extract(
        h,
        r"""(?is)<link[^>]+rel\s*=\s*["']canonical["'][^>]*"""
        r"""href\s*=\s*["']([^"']+)["']""",
        1,
    )
    b = F.regexp_extract(
        h,
        r"""(?is)<link[^>]+href\s*=\s*["']([^"']+)["'][^>]*"""
        r"""rel\s*=\s*["']canonical["']""",
        1,
    )
    return F.when(a != "", a).otherwise(b)


def html_noindex(html: Column | str) -> Column:
    """True when the page opts out of indexing (``<meta
    name="robots" ... content="...noindex...">``, either attribute
    order) — the polite-crawl filter that runs right after the WARC
    scan. RE2-safe."""
    h = _col(html)
    return h.rlike(
        r"""(?is)<meta[^>]+name\s*=\s*["']robots["'][^>]*"""
        r"""content\s*=\s*["'][^"']*noindex"""
    ) | h.rlike(
        r"""(?is)<meta[^>]+content\s*=\s*["'][^"']*noindex[^"']*["']"""
        r"""[^>]*name\s*=\s*["']robots["']"""
    )


def text_density(html: Column | str) -> Column:
    """len(visible text) / len(markup) — the cheap boilerplate-page
    signal (chrome-heavy pages score low; article pages high). NULL
    or empty markup → NULL."""
    h = _col(html)
    return (
        F.length(strip_html(h))
        / F.nullif(F.length(h), F.lit(0))
    )
