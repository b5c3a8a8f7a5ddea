"""URL canonicalization — the crawl-pipeline scalar tier.

Web-scale training corpora key almost everything on URLs: exact dedup
on normalized URL, per-domain caps against SEO farms, and
domain-level quality priors all need one CANONICAL form of a URL
that is stable across the syntactic variants crawlers see
(`HTTP://WWW.Site.com:80/a/?utm_source=x&b=1#frag` ==
`http://site.com/a?b=1`). Everything here is a pure Spark ``Column``
expression tree (regexp + split + higher-order array ops — zero
Python in the hot path, whole-stage codegen), so normalization runs
at scan speed over 100 TB and the DuckDB oracle replays it exactly.

Normalization steps (the conservative, widely-agreed subset — RFC
3986 §6 syntax-based normalization plus the standard tracking-param
cut; anything stronger, e.g. session-id heuristics, is corpus policy
and belongs to the caller):

1. lowercase scheme and host;
2. strip a leading ``www.`` label;
3. strip default ports (``:80`` for http, ``:443`` for https);
4. drop the fragment;
5. drop known tracking parameters (``utm_*``, ``gclid``, ``fbclid``,
   ``msclkid``, ``ref``, ``ref_src``);
6. sort surviving query parameters byte-wise (order-insensitive
   compare), dropping the ``?`` entirely when none survive;
7. collapse a bare ``/`` path before a query string and strip one
   trailing slash from non-root paths.

Reference parity: the reference (apcamargo/polars-fastx) has no URL
surface; north-star extension per /root/repo/BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: query parameters that never carry content identity
TRACKING_PARAMS = ("utm_", "gclid", "fbclid", "msclkid", "ref", "ref_src")

#: second-level labels under which the heuristic tier treats the
#: registrable domain as 3 labels (site.co.uk). Fallback only — the
#: accurate tier is functions/psl.py (bundled Public Suffix List
#: snapshot as a broadcast rule table, swappable for the full
#: publicsuffix.org download via psl.load_psl_file).
_SLD = ("co", "com", "ac", "gov", "net", "org", "edu")


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def url_scheme(url: Column | str) -> Column:
    """Lowercased scheme, '' when absent."""
    return F.lower(F.regexp_extract(_col(url), r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))


def url_host_full(url: Column | str) -> Column:
    """Lowercased host with the port stripped — the FULL host, every
    label kept. This is what the PSL tier consumes: ``www`` can be a
    registrable label (the PSL's own ``!www.ck`` exception), so
    stripping it before the rule match would deviate from the spec
    for exactly those hosts."""
    h = F.lower(
        F.regexp_extract(_col(url), r"^(?:[A-Za-z][A-Za-z0-9+.-]*://)?([^/?#]+)", 1)
    )
    return F.regexp_replace(h, r":\d+$", "")


def url_host(url: Column | str) -> Column:
    """Lowercased host with any ``www.`` prefix and port stripped —
    the COSMETIC host used by ``normalize_url`` (step 2) and display
    keys. Rule-accurate domain extraction must use
    :func:`url_host_full` (the PSL tier does)."""
    return F.regexp_replace(url_host_full(url), r"^www\.", "")


def url_path(url: Column | str) -> Column:
    """Path component ('' when absent; query/fragment excluded)."""
    return F.regexp_extract(
        _col(url), r"^(?:[A-Za-z][A-Za-z0-9+.-]*://)?[^/?#]*([^?#]*)", 1
    )


def url_domain(url: Column | str) -> Column:
    """Registrable domain, HEURISTIC tier: the last two host labels,
    or the last THREE when the penultimate label is a classic
    second-level registry label under a 2-letter ccTLD
    (``site.co.uk`` → ``site.co.uk``, not ``co.uk``). Zero-dependency
    pure-Column fallback only — it mis-groups hosting platforms
    (``user.github.io`` → ``github.io``) and non-tuple registries
    (``foo.com.au`` → ``com.au``). The ACCURATE tier is
    :func:`polars_fastx_spark.functions.psl.with_registrable_domain`
    (real Public Suffix List compiled into InSet literal tests —
    no join, no exchange), which ``domain_cap`` and the crawl
    queries use by default."""
    labels = F.split(url_host(url), r"\.")
    n = F.size(labels)
    second = F.element_at(labels, -2)
    tld = F.element_at(labels, -1)
    take3 = (
        (n >= 3)
        & second.isin(*_SLD)
        & (F.length(tld) == 2)
    )
    return F.when(
        take3, F.concat_ws(".", F.slice(labels, n - 2, 3))
    ).otherwise(
        F.when(n >= 2, F.concat_ws(".", F.slice(labels, n - 1, 2)))
        .otherwise(F.concat_ws(".", labels))
    )


def _clean_query(url: Column | str) -> Column:
    """Sorted, tracking-stripped query string ('' when none
    survives)."""
    q = F.regexp_extract(_col(url), r"\?([^#]*)", 1)
    parts = F.filter(
        F.split(q, "&"),
        lambda p: (F.length(p) > 0)
        & ~F.lower(p).startswith("utm_")
        & ~F.lower(p).rlike(r"^(gclid|fbclid|msclkid|ref|ref_src)="),
    )
    return F.array_join(F.array_sort(parts), "&")


def _url_port(url: Column | str) -> Column:
    """Explicit port as a string ('' when absent)."""
    return F.regexp_extract(
        _col(url), r"^(?:[A-Za-z][A-Za-z0-9+.-]*://)?[^/?#:]*:(\d+)", 1
    )


def normalize_url(url: Column | str) -> Column:
    """The canonical form (module docstring steps 1-7) as one codegen
    expression. Scheme-less inputs normalize their host/path/query the
    same way and stay scheme-less. Only the scheme's DEFAULT port is
    dropped (http :80, https :443) — a non-default port is a distinct
    origin and survives."""
    u = _col(url)
    scheme = url_scheme(u)
    host = url_host(u)
    port = _url_port(u)
    default_port = (
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    path = url_path(u)
    # strip ONE trailing slash from non-root paths; keep '' for root
    path = F.when(path == "/", F.lit("")).otherwise(
        F.regexp_replace(path, r"/$", "")
    )
    query = _clean_query(u)
    return F.concat(
        F.when(scheme == "", F.lit("")).otherwise(
            F.concat(scheme, F.lit("://"))
        ),
        host,
        F.when(default_port, F.lit("")).otherwise(
            F.concat(F.lit(":"), port)
        ),
        path,
        F.when(query == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), query)
        ),
    )


def domain_cap(
    df,
    url_col: str,
    cap: int,
    order_col: str | None = None,
    psl: bool = True,
):
    """Per-registrable-domain cap: keep at most ``cap`` rows per
    domain — the standard defense against SEO farms and mirror hosts
    dominating a crawl corpus. Deterministic survivor choice: the
    ``cap`` rows with the SMALLEST md5 of ``order_col`` (default: the
    url itself) per domain, so reruns and engines agree (the
    content-addressed convention of ``sampling.deterministic_sample``).

    Scale shape — hot/cold split, then two-phase distributed
    selection, NEVER a whole-domain sort: a naive per-domain
    ``row_number`` window puts every row of a mega-domain in ONE
    task, and mega-domains are precisely what this operator exists
    for. Instead:

    1. per-domain totals (one map-side-combining groupBy, output =
       one row per domain); domains UNDER the cap — virtually all of
       them — keep every row via a broadcast anti-join against the
       over-cap domain list (one STRING per offending domain — a few
       MB even at millions of farms; the rows of those domains are
       the only data that ever shuffles again);
    2. over-cap rows histogram their 4-hex md5 bucket (65,536
       buckets/domain); a window over the HISTOGRAM (bounded
       partitions) finds where the cumulative count crosses ``cap``;
    3. buckets fully under the cap keep outright; the straddling
       bucket ranks through a window partitioned by (domain, bucket)
       — ~domain_size/65,536 rows per task (a 1-billion-row domain
       ranks ~15k rows per task).

    The survivor SET is identical to the naive window's (both are the
    ``cap`` md5-smallest; bucket = md5 prefix, so bucket order IS md5
    order). Ties on (md5, order_col) — i.e. fully duplicate keys —
    are resolved arbitrarily within the threshold bucket, as they
    were within the naive window."""
    from pyspark.sql import Window

    key = (_col(order_col) if order_col else _col(url_col)).cast("string")
    # NULL-domain rows (NULL/unparseable urls) must flow through the
    # cap like any other group: the hot/cold split below uses plain
    # equi-joins, and a NULL key never equi-matches — it would fall
    # through the left_anti into 'cold' UNCAPPED. Coalesce to the ''
    # sentinel so the NULL partition groups, joins, and caps normally
    # ('' cannot collide: url_domain returns '' only for empty hosts,
    # which belong in the same degenerate group anyway; the PSL tier
    # coalesces internally).
    if psl:
        # PSL-accurate domains (functions/psl.py): user.github.io and
        # foo.com.au group correctly — one compiled InSet expression,
        # zero joins, still zero shuffle before the totals groupBy
        from polars_fastx_spark.functions.psl import (
            with_registrable_domain,
        )

        kd = with_registrable_domain(df, url_col, out="__dom")
    else:
        dom = F.coalesce(url_domain(_col(url_col)), F.lit(""))
        kd = df.withColumn("__dom", dom)
    # totals first — map-side combine shrinks the shuffle to one row
    # per domain; histogramming ALL rows instead would make the
    # under-cap domains (virtually all of them) the histogram
    over = (
        kd.groupBy("__dom")
        .agg(F.count(F.lit(1)).alias("__tot"))
        .filter(F.col("__tot") > cap)
        .select("__dom")
    )
    cold = kd.join(F.broadcast(over), "__dom", "left_anti").drop("__dom")
    hot = kd.join(F.broadcast(over), "__dom", "left_semi").withColumn(
        "__bkt", F.substring(F.md5(key), 1, 4)
    )
    hist = hot.groupBy("__dom", "__bkt").agg(F.count(F.lit(1)).alias("__n"))
    wc = Window.partitionBy("__dom").orderBy("__bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # per (domain, bucket): rows admitted before this bucket opens;
    # buckets at/after the cap cross are absent
    below = hist.select(
        "__dom", "__bkt",
        F.coalesce(F.sum("__n").over(wc), F.lit(0)).alias("__below"),
    ).filter(F.col("__below") < cap)
    # no broadcast hint: below holds up to ~cap buckets PER over-cap
    # domain, unbounded when many domains breach the cap — and the
    # join key (dom, bkt) is the window's partitioning anyway, so the
    # shuffle is reused; AQE still broadcasts when it actually fits
    joined = hot.join(below, ["__dom", "__bkt"], "inner")
    # a bucket that fits entirely under the cap keeps all its rows;
    # only the bucket straddling the cap ranks its rows
    wt = Window.partitionBy("__dom", "__bkt").orderBy(
        F.md5(key).asc(), key.asc()
    )
    capped = (
        joined.withColumn("__quota", F.lit(cap) - F.col("__below"))
        .withColumn("__rn", F.row_number().over(wt))
        .filter(F.col("__rn") <= F.col("__quota"))
        .drop("__dom", "__bkt", "__below", "__quota", "__rn")
    )
    return cold.unionByName(capped)
