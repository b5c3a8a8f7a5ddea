"""functions/html_dom.py — the DOM-accurate extraction tier.

Round-7 task: exercise the seam functions/html.py documented (the
way round 6 exercised the JPEG seam) — goldens on malformed/nested/
CDATA input, a differential against the regex tier on well-formed
pages, the Arrow UDF path, and extractor selection in
crawl_to_corpus.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_fastx_spark.functions import html as H
from polars_fastx_spark.functions import html_dom


def test_golden_full_document():
    doc = (
        "<html><head><title>My &amp; Title</title>"
        "<style>body{color:red}</style></head>"
        '<body><nav><a href="/a">Home</a> <a href="/b">About</a></nav>'
        "<article><h1>Short heading</h1>"
        "<p>First real paragraph of the article with plenty of text "
        "in it.</p>"
        "<p>Second paragraph, also long enough to count as main "
        "content.</p></article>"
        '<footer>Copyright <a href="/tos">Terms</a></footer>'
        '<script>var x = "<p>not text</p>";</script>'
        "<!-- hidden --><![CDATA[ not text either ]]></body></html>"
    )
    r = html_dom.extract_dom_py(doc)
    assert r["title"] == "My & Title"
    # script/style/comment/CDATA content never leaks
    assert "not text" not in r["text"] and "color:red" not in r["text"]
    # chrome (nav/footer) is in text but NOT in main_text
    assert "Home" in r["text"] and "Copyright" in r["text"]
    assert "Home" not in r["main_text"]
    assert "Copyright" not in r["main_text"]
    # the two long low-link-density paragraphs ARE the main content
    assert r["main_text"].splitlines() == [
        "First real paragraph of the article with plenty of text in it.",
        "Second paragraph, also long enough to count as main content.",
    ]
    # short heading fails MAIN_MIN_CHARS
    assert "Short heading" not in r["main_text"]
    assert r["n_blocks"] == 6


def test_golden_malformed_and_nested():
    # unclosed tags, bad nesting, stray '<', deep lists — the parser
    # must degrade, never raise
    r = html_dom.extract_dom_py(
        "<p>unclosed <b>bold <div>next & stray <notatag"
        "<ul><li>one<ul><li>two<li>three</ul></ul>"
    )
    assert "unclosed bold" in r["text"]
    assert "one" in r["text"] and "three" in r["text"]
    assert html_dom.extract_dom_py(None)["text"] == ""
    assert html_dom.extract_dom_py("")["n_blocks"] == 0
    # a link-farm block is boilerplate by link density
    farm = "<p>" + " ".join(
        f'<a href="/{i}">listing item {i} here</a>' for i in range(8)
    ) + "</p>"
    rf = html_dom.extract_dom_py(farm)
    assert rf["text"] and rf["main_text"] == ""
    assert rf["link_density"] > html_dom.MAIN_MAX_LINK_DENSITY


def test_differential_vs_regex_tier(spark):
    """On well-formed pages restricted to the regex tier's entity
    table, the DOM tier's full text must agree with strip_html up to
    whitespace shape (the regex tier's block breaks are approximate;
    the token stream is the contract)."""
    pages = [
        (
            i,
            f"<html><head><title>Doc {i} &amp; co</title></head>"
            f"<body><h1>Doc {i}</h1><p>alpha beta {i} gamma&nbsp;"
            f"delta</p><div>tail &lt;block&gt; {i}</div></body></html>",
        )
        for i in range(40)
    ]
    df = spark.createDataFrame(pages, "id long, html string")
    both = df.select(
        "id",
        H.strip_html("html").alias("rx"),
        html_dom.dom_extract("html").getField("text").alias("dom"),
        H.html_title("html").alias("rx_title"),
        html_dom.dom_extract("html").getField("title").alias(
            "dom_title"
        ),
    ).collect()
    for r in both:
        assert " ".join(r["rx"].split()) == " ".join(r["dom"].split()), (
            r["id"]
        )
        assert r["rx_title"] == r["dom_title"]


def test_spark_struct_and_with_columns(spark):
    df = spark.createDataFrame(
        [(1, "<p>a paragraph long enough to be main content text</p>")],
        "id long, html string",
    )
    out = html_dom.with_dom_extract(df, "html").collect()[0]
    assert out["dom_text"] == out["dom_main_text"]
    assert out["dom_n_blocks"] == 1 and out["dom_link_density"] == 0.0
    # plan: exactly one Arrow eval, no row-at-a-time Python
    plan = (
        html_dom.with_dom_extract(df, "html")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_crawl_to_corpus_dom_extractors(spark, tmp_path):
    """extractor='dom' matches the regex corpus on plain pages;
    'dom_main' additionally strips chrome so the boilerplate never
    reaches dedup. Invalid names raise."""
    from polars_fastx_spark.pipeline import crawl_to_corpus
    from polars_fastx_spark.sources import warc

    base = (
        "A perfectly ordinary very long paragraph of page text that "
        "clears the minimum length gate easily for this corpus. "
    ) * 3

    def _page(i, uri, text):
        body = (
            f"<html><head><title>T{i}</title></head><body>"
            f'<nav><a href="/h">Home</a><a href="/x">More</a>'
            f'<a href="/y">Nav</a></nav>'
            f"<p>{text}</p></body></html>"
        ).encode()
        return warc.render_warc_record(
            f"<urn:uuid:q-{i}>", "response", uri,
            "2026-08-01T00:00:00Z", warc.http_response_block(body),
        )

    src = tmp_path / "crawl"
    src.mkdir()
    warc.write_warc(
        str(src / "a.warc.gz"),
        [
            _page(0, "https://a.com/x", base + "alpha"),
            _page(1, "https://b.org/y", "different words " * 30),
        ],
    )
    pat = str(src) + "/*.warc.gz"
    rx = crawl_to_corpus(
        spark, pat, str(tmp_path / "o_rx"), extractor="regex"
    )
    dom = crawl_to_corpus(
        spark, pat, str(tmp_path / "o_dom"), extractor="dom"
    )
    main = crawl_to_corpus(
        spark, pat, str(tmp_path / "o_main"), extractor="dom_main"
    )
    rx_rows = {r["url"]: r["text"] for r in rx.collect()}
    dom_rows = {r["url"]: r["text"] for r in dom.collect()}
    main_rows = {r["url"]: r["text"] for r in main.collect()}
    assert set(rx_rows) == set(dom_rows) == set(main_rows)
    for u in rx_rows:
        # same token stream from regex and DOM full-text tiers
        assert rx_rows[u].split() == dom_rows[u].split()
        # main-content tier drops the nav chrome
        assert "Home" in dom_rows[u] and "Home" not in main_rows[u]
    with pytest.raises(ValueError, match="extractor"):
        crawl_to_corpus(
            spark, pat, str(tmp_path / "o_bad"), extractor="nope"
        )
