"""robots.txt — RFC 9309 parsing and URL gating, fully relational.

A polite crawl pipeline must not fetch (or keep) URLs a site's
robots.txt disallows — at corpus-cleaning time this is a compliance
gate exactly like the noindex meta gate (`html.html_noindex`), one
tier earlier in the stack. The whole protocol is relational:

- **parse** (:func:`parse_robots`): a (domain, robots_txt) table
  explodes into lines; groups form per RFC 9309 §2.1 (consecutive
  ``User-agent`` lines open a group; the group's rules run until the
  next ``User-agent`` line that FOLLOWS a rule). Group assembly is a
  window prefix-scan partitioned by DOMAIN — a robots.txt is KBs, so
  partitions are tiny whatever the corpus size. Output: one row per
  (domain, agent, allow?, path pattern) with the pattern pre-compiled
  to a regex (``*`` → ``.*``, trailing ``$`` anchor, everything else
  escaped) and its PRECEDENCE length (octets of the original pattern,
  per spec).

- **gate** (:func:`robots_allowed`): resolve each URL's applicable
  group — exact agent match if the domain defines one, else ``*``
  (the spec's most-specific-token rule collapsed to the two cases a
  corpus crawler uses) — then the longest-pattern match decides;
  ties prefer Allow (RFC 9309 §2.2.2). No matching rule, no group,
  or no robots.txt at all → allowed. One join on the domain key (the
  rules side is tiny — AQE broadcasts it) + one aggregation keyed by
  URL; both engines replay it, so the catalog query is
  oracle-checked end to end.

Empty ``Disallow:`` (no value) means "no restriction" per spec and
parses to no rule. Patterns match against the URL's path+query ONLY
— the fragment is stripped before matching (RFC 9309 §2.2.2 matches
the path and its parameters; a ``#frag`` suffix must not let a URL
evade ``/*.pdf$``), and precedence length counts OCTETS of the
original pattern (§2.2.2 ranks by octets, so non-ASCII Allow/
Disallow pairs tie-break exactly as a compliant parser does).

Reference parity: the reference (apcamargo/polars-fastx) has no
crawl surface; north-star extension per /root/repo/BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from polars_fastx_spark.functions.urls import url_host


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def pattern_regex(pat: Column) -> Column:
    """robots path pattern → Java/RE2-safe regex string (both engines
    accept it): escape metachars, ``*`` → ``.*``, a trailing ``$``
    becomes the regex anchor, and the whole pattern anchors at the
    path start."""
    anchored = pat.endswith("$")
    body = F.when(
        anchored, F.substring(pat, 1, F.length(pat) - 1)
    ).otherwise(pat)
    # escape regex metachars EXCEPT '*' (translated after)
    esc = body
    for ch in ("\\", ".", "+", "?", "(", ")", "[", "]", "{", "}",
               "^", "|", "$"):
        esc = F.replace(esc, F.lit(ch), F.lit("\\" + ch))
    esc = F.replace(esc, F.lit("*"), F.lit(".*"))
    return F.concat(
        F.lit("^"), esc, F.when(anchored, F.lit("$")).otherwise(F.lit(""))
    )


def _grouped_directives(
    df: DataFrame,
    domain_col: str,
    text_col: str,
    directives: tuple[str, ...],
) -> DataFrame:
    """The shared parse core: (domain, robots_txt) → one row per
    recognized directive line, with its RFC 9309 §2.1 GROUP id
    (window prefix-scan per domain: consecutive ``User-agent`` lines
    open a group) and the group's collected agent set. Output:
    ``(domain, grp, directive, value, agents)`` for non-UA lines."""
    lines = df.select(
        F.col(domain_col).alias("domain"),
        F.posexplode(
            F.split(F.col(text_col), r"\r?\n")
        ).alias("pos", "line"),
    ).select(
        "domain", "pos",
        # strip comments + whitespace
        F.trim(F.regexp_replace("line", r"#.*$", "")).alias("line"),
    ).filter(F.col("line") != "")
    d = F.lower(F.regexp_extract("line", r"^([A-Za-z-]+)\s*:", 1))
    v = F.trim(F.regexp_extract("line", r"^[A-Za-z-]+\s*:(.*)$", 1))
    lines = lines.select(
        "domain", "pos", d.alias("directive"), v.alias("value")
    ).filter(F.col("directive").isin("user-agent", *directives))

    w = Window.partitionBy("domain").orderBy("pos")
    is_ua = F.col("directive") == "user-agent"
    prev_ua = F.lag(is_ua.cast("int"), 1, 0).over(w)
    # a group starts at a user-agent line NOT preceded by one
    start = (is_ua & (prev_ua == 0)).cast("int")
    lines = lines.withColumn("grp", F.sum(start).over(w))
    agents = (
        lines.filter(is_ua)
        .groupBy("domain", "grp")
        .agg(
            F.collect_set(F.lower(F.col("value"))).alias("agents")
        )
    )
    return lines.filter(~is_ua).join(agents, ["domain", "grp"])


def parse_robots(
    df: DataFrame,
    domain_col: str = "domain",
    text_col: str = "robots_txt",
) -> DataFrame:
    """(domain, robots_txt) → rule table
    ``(domain, agent, allow, pattern, pattern_len, rx)``.

    Window prefix-scan per domain (see module docstring): group ids
    accumulate over line positions, agents collected per group, rules
    inherit their group's agents. Lines that parse to nothing
    (comments, blanks, unknown directives, empty Disallow) drop."""
    grouped = _grouped_directives(
        df, domain_col, text_col, ("allow", "disallow")
    )
    rules = grouped.filter(F.col("value") != "").select(
        "domain",
        F.explode("agents").alias("agent"),
        (F.col("directive") == "allow").alias("allow"),
        F.col("value").alias("pattern"),
        # RFC 9309 §2.2.2 ranks rules by OCTETS, not characters
        F.octet_length("value").alias("pattern_len"),
    )
    return rules.withColumn("rx", pattern_regex(F.col("pattern")))


def parse_crawl_delays(
    df: DataFrame,
    domain_col: str = "domain",
    text_col: str = "robots_txt",
    agent: str = "mybot",
) -> DataFrame:
    """(domain, robots_txt) → ``(domain, crawl_delay)`` in seconds —
    the de-facto ``Crawl-delay`` directive (not in RFC 9309 but
    honored by every polite crawler). Same group assembly and agent
    resolution as the Allow/Disallow rules: a group naming OUR agent
    wins over the ``*`` group; several applicable values keep the
    LARGEST (the conservative read); non-numeric values drop. Domains
    with no directive are absent — the scheduler's ``default_delay``
    covers them."""
    agent = agent.lower()
    grouped = _grouped_directives(
        df, domain_col, text_col, ("crawl-delay",)
    )
    delays = grouped.select(
        "domain",
        F.explode("agents").alias("agent"),
        # try_cast: non-numeric delay values DROP instead of raising
        # under the session's ANSI mode
        F.col("value").try_cast("double").alias("crawl_delay"),
    ).filter(F.col("crawl_delay").isNotNull() & (F.col("crawl_delay") >= 0))
    named = delays.filter(F.col("agent") == agent)
    named_doms = named.select("domain").distinct()
    fallback = delays.filter(F.col("agent") == "*").join(
        named_doms, "domain", "left_anti"
    )
    return (
        named.unionByName(fallback)
        .groupBy("domain")
        .agg(F.max("crawl_delay").alias("crawl_delay"))
    )


def fetch_schedule(
    urls: DataFrame,
    delays: DataFrame,
    url_col: str = "url",
    domain_col: str | None = None,
    default_delay: float = 1.0,
    out: str = "fetch_offset_s",
) -> DataFrame:
    """Politeness scheduling for a frontier: per registrable domain,
    the k-th URL (md5-deterministic order, the content-addressed
    convention — every crawler replica computes the SAME schedule
    with no coordination) fetches at ``(k-1) * crawl_delay`` seconds
    from the domain's first fetch. ``delays`` is a
    :func:`parse_crawl_delays` table; absent domains use
    ``default_delay``.

    Compose AFTER ``domain_cap`` (the frontier is already budgeted,
    so the per-domain window ranks at most ``cap`` rows per task —
    never schedule an uncapped frontier: a mega-domain would put its
    whole backlog in one window partition AND into one fetch queue).
    One tiny-side join (AQE broadcasts the delay table) + one bounded
    per-domain window."""
    if domain_col is None:
        from polars_fastx_spark.functions.psl import (
            with_registrable_domain,
        )

        u = with_registrable_domain(urls, url_col, out="__dom")
    else:
        u = urls.withColumn("__dom", _col(domain_col))
    j = u.join(
        delays.select(
            F.col("domain").alias("__dom"),
            F.col("crawl_delay").alias("__delay"),
        ),
        "__dom",
        "left",
    )
    w = Window.partitionBy("__dom").orderBy(
        F.md5(_col(url_col)).asc(), _col(url_col).asc()
    )
    offset = (F.row_number().over(w) - 1) * F.coalesce(
        F.col("__delay"), F.lit(float(default_delay))
    )
    scheduled = j.withColumn(out, offset).drop("__delay")
    if domain_col is None:
        # PSL-derived grouping key surfaces as `domain`
        return scheduled.withColumnRenamed("__dom", "domain")
    # caller supplied the key — renaming would duplicate their column
    return scheduled.drop("__dom")


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    agent: str = "mybot",
    out: str = "allowed",
) -> DataFrame:
    """``urls`` + boolean ``out``: may ``agent`` fetch each URL under
    ``rules`` (a :func:`parse_robots` table)? Longest matching
    pattern decides, Allow wins ties, no match/group/file → allowed.

    One domain-key join (tiny build side — AQE broadcasts) and one
    aggregation keyed by the URL row. ``urls`` must expose unique
    rows per url value; the gate aggregates by the url string."""
    agent = agent.lower()
    host = url_host(_col(url_col))
    dom = F.coalesce(host, F.lit(""))
    # path+query ONLY — the fragment never reaches the matcher
    # (RFC 9309 §2.2.2; '/f.pdf#sec' must still match '/*.pdf$')
    path = F.regexp_extract(
        _col(url_col), r"^(?:[A-Za-z][A-Za-z0-9+.-]*://)?[^/?#]*([^#]*)", 1
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    u = urls.withColumn("__dom", dom).withColumn("__path", path)

    # agent resolution: a domain with a group for OUR agent uses only
    # those rules; otherwise its '*' group applies
    named = rules.filter(F.col("agent") == agent)
    named_doms = named.select("domain").distinct()
    fallback = rules.filter(F.col("agent") == "*").join(
        named_doms, "domain", "left_anti"
    )
    applicable = named.unionByName(fallback).select(
        F.col("domain").alias("__dom"), "allow", "pattern_len", "rx"
    )

    j = u.join(applicable, "__dom", "left")
    hit = F.col("rx").isNotNull() & F.expr("__path rlike rx")
    # winner per URL row: longest pattern, Allow breaking ties
    verdict = F.when(
        hit,
        F.struct(
            F.col("pattern_len").alias("l"),
            F.col("allow").cast("int").alias("a"),
        ),
    )
    keep_cols = [c for c in urls.columns]
    agg = (
        j.groupBy(*[F.col(c) for c in keep_cols])
        .agg(F.max(verdict).alias("__best"))
    )
    allowed = F.when(
        F.col("__best").isNull(), F.lit(True)
    ).otherwise(F.col("__best.a") == 1)
    return agg.withColumn(out, allowed).drop("__best")


def robots_gate(
    urls: DataFrame,
    robots: DataFrame,
    url_col: str = "url",
    agent: str = "mybot",
    domain_col: str = "domain",
    text_col: str = "robots_txt",
) -> DataFrame:
    """The one-call frontier/corpus gate: parse + keep allowed rows.
    Compose before ``domain_cap`` in a crawl loop — budget should not
    be spent on unfetchable URLs.

    The verdict computes over the DISTINCT url set and semi-joins
    back, so ``urls`` may carry arbitrarily wide payload columns
    (crawl rows drag full document text): the rule join and the
    per-URL aggregation only ever see the url string, instead of
    grouping by every payload column (which blows the plan tree up
    with the whole upstream expression duplicated per column).

    NULL urls: the semi-join is NULL-SAFE (``<=>`` — still a plain
    equi-join key), so a NULL url row gets the same verdict the
    inline ``robots_allowed`` path always gave it (host '' → path
    '/' → allowed unless a rule for the empty domain blocks '/')
    instead of being silently dropped by a NULL join key (round-8
    ADVICE finding)."""
    rules = parse_robots(robots, domain_col, text_col)
    keys = urls.select(_col(url_col).alias("__u")).distinct()
    allowed = (
        robots_allowed(keys, rules, "__u", agent)
        .filter(F.col("allowed"))
        .select(F.col("__u").alias("__allowed_u"))
    )
    # the semi-join would reorder columns (join key first): restore
    # the caller's layout
    return urls.join(
        allowed,
        _col(url_col).eqNullSafe(F.col("__allowed_u")),
        "left_semi",
    ).select(*urls.columns)
