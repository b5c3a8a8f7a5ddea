"""URL canonicalization tier (functions/urls.py): RFC 3986 §6
syntax normalization + tracking cut, host/domain/path extraction, and
the per-domain cap."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from polars_fastx_spark.functions import urls


CASES = [
    # (input, normalized, host, domain)
    (
        "HTTP://WWW.Site.COM:80/a/?utm_source=x&b=2&a=1#frag",
        "http://site.com/a?a=1&b=2", "site.com", "site.com",
    ),
    (
        "https://shop.example.co.uk:443/p/",
        "https://shop.example.co.uk/p",
        "shop.example.co.uk", "example.co.uk",
    ),
    ("example.com/", "example.com", "example.com", "example.com"),
    (
        "https://example.com/?gclid=zz&fbclid=y&ref=rss",
        "https://example.com", "example.com", "example.com",
    ),
    (
        "https://x.org/a/b?z=9&y=8",
        "https://x.org/a/b?y=8&z=9", "x.org", "x.org",
    ),
    # non-default port is a distinct origin and SURVIVES
    (
        "https://api.example.com:8443/v1",
        "https://api.example.com:8443/v1",
        "api.example.com", "example.com",
    ),
    # default port for the OTHER scheme is not default here
    (
        "http://h.net:443/x", "http://h.net:443/x", "h.net", "h.net",
    ),
    # single-label host: domain falls back to the host
    ("http://localhost:80/", "http://localhost", "localhost",
     "localhost"),
    # 'ref' must match whole-param, not prefix: refresh=1 survives
    (
        "https://a.io/p?refresh=1&ref=x",
        "https://a.io/p?refresh=1", "a.io", "a.io",
    ),
]


def test_normalize_host_domain_table(spark):
    df = spark.createDataFrame([(u,) for u, _, _, _ in CASES], ["url"])
    got = df.select(
        "url",
        urls.normalize_url("url").alias("n"),
        urls.url_host("url").alias("h"),
        urls.url_domain("url").alias("d"),
    ).collect()
    by_url = {r["url"]: r for r in got}
    for u, n, h, d in CASES:
        r = by_url[u]
        assert r["n"] == n, (u, r["n"], n)
        assert r["h"] == h, (u, r["h"], h)
        assert r["d"] == d, (u, r["d"], d)


def test_normalization_is_idempotent(spark):
    """normalize(normalize(u)) == normalize(u) — canonical forms are
    fixed points."""
    df = spark.createDataFrame([(u,) for u, _, _, _ in CASES], ["url"])
    once = df.select(urls.normalize_url("url").alias("n"))
    twice = once.select(
        F.col("n"), urls.normalize_url("n").alias("n2")
    ).collect()
    for r in twice:
        assert r["n2"] == r["n"], r


def test_variant_collapse_for_dedup(spark):
    """The reason this tier exists: syntactic variants of one page
    collapse to ONE canonical key for exact dedup."""
    variants = [
        "https://www.news.example.com/story/42?utm_campaign=x",
        "HTTPS://news.example.com:443/story/42/",
        "https://news.example.com/story/42#comments",
    ]
    df = spark.createDataFrame([(u,) for u in variants], ["url"])
    keys = {
        r[0] for r in df.select(urls.normalize_url("url")).collect()
    }
    assert keys == {"https://news.example.com/story/42"}


def test_domain_cap_keeps_at_most_n_deterministically(spark):
    """≤ cap rows per registrable domain; the planted mega-domain is
    cut to cap while small domains pass whole; rerun == same rows
    (content-addressed md5 order)."""
    rows = [
        (i, f"https://cdn.mirror-farm.com/d/{i}")
        for i in range(40)
    ] + [
        (100 + i, f"https://www.site{i}.org/p/{i}") for i in range(5)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    kept = urls.domain_cap(df, "url", cap=3, order_col="doc_id")
    got = sorted(r["doc_id"] for r in kept.collect())
    doms = Counter(
        r[0]
        for r in kept.select(urls.url_domain("url")).collect()
    )
    assert doms["mirror-farm.com"] == 3
    assert all(v <= 3 for v in doms.values())
    assert {100, 101, 102, 103, 104} <= set(got)  # small domains whole
    again = sorted(
        r["doc_id"]
        for r in urls.domain_cap(
            df, "url", cap=3, order_col="doc_id"
        ).collect()
    )
    assert again == got


def test_domain_cap_two_phase_equals_naive_window(spark):
    """The two-phase selection (bucket histogram -> threshold bucket)
    must keep EXACTLY the cap md5-smallest rows per domain that the
    naive whole-domain window would — including a hot domain holding
    most rows and domains entirely under the cap."""
    from pyspark.sql import Window

    rows = (
        [(i, f"https://farm.com/p/{i}") for i in range(400)]  # hot
        + [(1000 + i, f"https://site{i % 7}.org/a/{i}") for i in range(70)]
        + [(2000, "https://lone.net/only")]  # under cap
    )
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    cap = 5
    got = {
        r["doc_id"]
        for r in urls.domain_cap(df, "url", cap=cap, order_col="doc_id")
        .collect()
    }
    key = F.col("doc_id").cast("string")
    w = Window.partitionBy(urls.url_domain(F.col("url"))).orderBy(
        F.md5(key).asc(), key.asc()
    )
    want = {
        r["doc_id"]
        for r in df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .collect()
    }
    assert got == want
    assert 2000 in got  # under-cap domain keeps everything


def test_domain_cap_null_domain_rows_are_capped(spark):
    """Round-6 ADVICE regression: NULL-url rows produce a NULL domain,
    and NULL keys never equi-match — before the '' sentinel coalesce
    they fell through the left_anti into 'cold' UNCAPPED. An over-cap
    flood of NULL-domain rows must cap like any other group."""
    rows = [(i, None) for i in range(40)] + [
        (100 + i, f"https://site{i}.org/p") for i in range(4)
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kept = urls.domain_cap(df, "url", cap=3, order_col="doc_id")
    out = kept.collect()
    null_kept = [r for r in out if r["url"] is None]
    assert len(null_kept) == 3  # the flood is capped
    assert len(out) == 3 + 4  # small real domains pass whole
    # deterministic: rerun keeps the same survivors
    again = urls.domain_cap(df, "url", cap=3, order_col="doc_id")
    assert sorted(r["doc_id"] for r in again.collect()) == sorted(
        r["doc_id"] for r in out
    )
