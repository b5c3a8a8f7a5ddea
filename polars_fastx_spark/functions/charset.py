"""Charset-aware payload decoding — the crawl ingest's text seam.

A real web crawl is heavily non-UTF-8: a blind
``payload.cast("string")`` interprets windows-1252 / Shift_JIS / GBK
bytes as UTF-8, and every mojibake'd page then silently poisons the
downstream hashes (dedup), lang-ID, and quality scores as if it were
real text. This module resolves each record's charset RELATIONALLY
and decodes accordingly:

**Resolution priority** (one pure-Column expression, replayed by the
DuckDB oracle from the same regex/alias constants):

1. a byte-order mark on the payload (UTF-8 / UTF-16 LE / BE — per
   WHATWG the BOM beats EVERYTHING, including the transport layer:
   the bytes on the wire are the ground truth, and a UTF-8-BOM page
   served with a stale ``charset=iso-8859-1`` header must not
   mojibake — nor may a ``charset=utf-8`` header route a BOM'd body
   down the pure-cast path and leak U+FEFF into the corpus text);
2. the HTTP ``Content-Type`` header's ``charset=`` parameter (present
   for a large share of real responses; ``sources/warc.py`` surfaces
   it as ``http_content_type``);
3. a ``<meta charset=…>`` / ``http-equiv Content-Type`` sniff over a
   bounded byte prefix (the tag itself is ASCII, so scanning the
   lossy UTF-8 view of the prefix is sound whatever the body's
   encoding);
4. the ``windows-1252`` fallback (the WHATWG default for the web —
   it decodes every byte, so nothing ever errors out of the corpus).

Labels normalize through :data:`CHARSET_ALIASES` (the WHATWG mapping
for the labels that matter at crawl scale: every latin-1/ascii label
IS windows-1252 on the web, ``gb2312`` content is GBK in practice).

**Decode shape — UTF-8 stays codegen**: :func:`decode_payloads`
splits on the resolved charset. The UTF-8 branch (the vast majority
of a modern crawl) is a pure ``cast("string")`` — zero Python, fused
into the scan stage. Only the legacy-charset minority crosses the
Arrow boundary (``mapInPandas`` + Python ``codecs`` — the same seam
class as the JPEG decoder in ``operators/jpeg.py``), so the Python
cost scales with the non-UTF-8 fraction, not the corpus.

Reference parity: the reference (apcamargo/polars-fastx) has no web
surface; north-star extension per /root/repo/BASELINE.json:6.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

#: label → canonical Python codec name, the WHATWG-informed subset a
#: crawl actually meets. Keys are lowercase post-trim labels; anything
#: absent passes through unchanged (Python's codec registry resolves
#: its own aliases; a genuinely unknown label falls back to
#: windows-1252 at decode time). Shared verbatim with the oracle SQL
#: generator so engine and check cannot drift.
CHARSET_ALIASES: tuple[tuple[str, str], ...] = (
    # the web's "latin-1" is windows-1252 (WHATWG encoding standard)
    ("latin1", "windows-1252"),
    ("latin-1", "windows-1252"),
    ("iso-8859-1", "windows-1252"),
    ("iso8859-1", "windows-1252"),
    ("iso_8859-1", "windows-1252"),
    ("us-ascii", "windows-1252"),
    ("ascii", "windows-1252"),
    ("ansi_x3.4-1968", "windows-1252"),
    ("cp1252", "windows-1252"),
    ("windows1252", "windows-1252"),
    ("utf8", "utf-8"),
    ("utf_8", "utf-8"),
    ("shift-jis", "shift_jis"),
    ("shiftjis", "shift_jis"),
    ("sjis", "shift_jis"),
    ("x-sjis", "shift_jis"),
    ("windows-31j", "cp932"),
    ("gb2312", "gbk"),
    ("gb-2312", "gbk"),
    ("csgb2312", "gbk"),
    ("x-gbk", "gbk"),
    ("big-5", "big5"),
    ("euc-kr", "euc_kr"),
    ("ks_c_5601-1987", "euc_kr"),
    ("euc-jp", "euc_jp"),
    ("windows-874", "cp874"),
    ("tis-620", "cp874"),
)

#: charset parameter inside a Content-Type header value. Java∩RE2
#: dialect (no lookaround/backrefs) so the DuckDB oracle replays it.
HTTP_CHARSET_RX = r"""(?i)charset\s*=\s*["']?\s*([A-Za-z0-9._:-]+)"""

#: <meta charset=…> — HTML5 form.
META_CHARSET_RX = r"""(?i)<meta\s+[^>]*charset\s*=\s*["']?\s*([A-Za-z0-9._:-]+)"""

#: legacy <meta http-equiv="Content-Type" content="…charset=…"> form.
#: The content attribute carries its own charset= param, so the HTTP
#: regex re-applies to the tag text; this regex just SCOPES the match
#: to a meta tag (any attribute order) so stray 'charset=' words in
#: body text cannot vote.
META_TAG_RX = r"""(?i)<meta\s[^>]*>"""


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def normalize_charset(label: Column) -> Column:
    """Lowercased, trimmed, alias-mapped charset label ('' stays '').

    One map-literal lookup, not a when-chain: chained whens inline
    the (regexp-heavy) label expression once PER ALIAS and the
    generated code blows janino's 64 KB method limit — the map
    literal evaluates the label once and probes a constant map."""
    cs = F.lower(F.trim(label))
    alias_map = F.create_map(
        *[F.lit(x) for kv in CHARSET_ALIASES for x in kv]
    )
    return F.coalesce(F.element_at(alias_map, cs), cs)


def http_charset(content_type: Column | str) -> Column:
    """charset= parameter of an HTTP Content-Type value, normalized;
    NULL when absent."""
    raw = F.regexp_extract(
        F.coalesce(_col(content_type), F.lit("")), HTTP_CHARSET_RX, 1
    )
    return F.when(raw != "", normalize_charset(raw))


def bom_charset(payload: Column | str) -> Column:
    """Charset implied by a leading byte-order mark; NULL when none.
    UTF-8 maps to ``utf-8-sig`` and UTF-16 to ``utf-16`` so the
    Python decode drops the BOM instead of leaking U+FEFF into the
    corpus text (which would poison fingerprints downstream)."""
    p = _col(payload)
    b2 = F.substring(p, 1, 2)
    return (
        F.when(F.substring(p, 1, 3) == F.lit(b"\xef\xbb\xbf"), F.lit("utf-8-sig"))
        .when(b2 == F.lit(b"\xff\xfe"), F.lit("utf-16"))
        .when(b2 == F.lit(b"\xfe\xff"), F.lit("utf-16"))
    )


def meta_charset(payload: Column | str, sniff_bytes: int = 2048) -> Column:
    """Charset declared by a ``<meta>`` tag within the first
    ``sniff_bytes`` of the payload, normalized; NULL when none. The
    tag is ASCII, so the lossy UTF-8 view of the prefix is a sound
    search surface for any body encoding."""
    prefix = F.substring(_col(payload), 1, sniff_bytes).cast("string")
    prefix = F.coalesce(prefix, F.lit(""))
    # HTML5 <meta charset=…> first, then the http-equiv content=…
    # form — scoped to a meta tag so body text cannot vote
    m5 = F.regexp_extract(prefix, META_CHARSET_RX, 1)
    tag = F.regexp_extract(prefix, META_TAG_RX, 0)
    legacy = F.regexp_extract(tag, HTTP_CHARSET_RX, 1)
    raw = F.when(m5 != "", m5).when(legacy != "", legacy)
    return F.when(raw.isNotNull(), normalize_charset(raw))


def resolve_charset(
    content_type: Column | str,
    payload: Column | str,
    sniff_bytes: int = 2048,
    default: str = "windows-1252",
) -> Column:
    """The record's charset per the module-docstring priority chain:
    BOM → HTTP param → meta sniff → ``default``. Pure Column. The BOM
    outranks the HTTP header (WHATWG): a BOM'd body with a wrong or
    even agreeing ``charset=`` header always resolves from its bytes,
    so ``utf-8-sig``/``utf-16`` decode through the Python lane that
    strips the mark instead of the pure cast that would leak it."""
    return F.coalesce(
        bom_charset(payload),
        http_charset(content_type),
        meta_charset(payload, sniff_bytes),
        F.lit(default),
    )


def _decode_one(content, cs: str):
    """bytes → str under ``cs``; undecodable bytes become U+FFFD and
    an unknown codec label falls back to windows-1252 (which decodes
    every byte) — a charset gate must never throw a page out of the
    pipeline with an exception."""
    import codecs

    if content is None:
        return None
    try:
        codecs.lookup(cs)
    except LookupError:
        cs = "windows-1252"
    return bytes(content).decode(cs, errors="replace")


def decode_payloads(
    df: DataFrame,
    payload_col: str = "payload",
    content_type_col: str = "http_content_type",
    out: str = "text",
    sniff_bytes: int = 2048,
    charset_col: str | None = None,
    mode: str = "auto",
) -> DataFrame:
    """``df`` + string column ``out`` = the payload decoded under its
    resolved charset (``charset_col``, when named, also lands the
    resolution for observability).

    ``mode="utf-8"`` is the legacy blind cast — one codegen
    expression, the exact pre-charset plan (kept for corpora KNOWN to
    be UTF-8 and for plan-pin tests). ``mode="auto"`` splits on the
    resolved charset: UTF-8 rows keep the pure-Column cast (no
    Python, no Arrow — the fast path IS the old plan), the legacy
    minority decodes via one Arrow ``mapInPandas`` stage. The split
    scans the input twice at most; at crawl scale the scan is
    column-pruned to (payload, content_type, …) either way and the
    legacy branch's Arrow cost scales with the non-UTF-8 fraction,
    not the corpus.
    """
    if mode == "utf-8":
        res = df.withColumn(out, _col(payload_col).cast("string"))
        if charset_col:
            res = res.withColumn(charset_col, F.lit("utf-8"))
        return res
    if mode != "auto":
        raise ValueError(f"mode={mode!r}: expected 'auto' or 'utf-8'")

    cs_name = charset_col or "__charset"
    tagged = df.withColumn(
        cs_name,
        resolve_charset(content_type_col, payload_col, sniff_bytes),
    )
    fast = tagged.filter(F.col(cs_name) == "utf-8").withColumn(
        out, _col(payload_col).cast("string")
    )
    legacy = tagged.filter(F.col(cs_name) != "utf-8")

    out_schema = StructType(
        legacy.schema.fields + [StructField(out, StringType(), True)]
    )
    pay_idx = legacy.columns.index(payload_col)
    cs_idx = legacy.columns.index(cs_name)

    def _decode_batches(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            pdf = pdf.copy()
            pdf[out] = [
                _decode_one(p, c)
                for p, c in zip(pdf.iloc[:, pay_idx], pdf.iloc[:, cs_idx])
            ]
            yield pdf

    decoded = legacy.mapInPandas(_decode_batches, out_schema)
    res = fast.unionByName(decoded)
    if not charset_col:
        res = res.drop(cs_name)
    return res


def undecoded_flag(encoding_col: Column | str = "content_encoding") -> Column:
    """True for rows whose payload still carries an undecoded
    ``Content-Encoding`` residual (``sources/warc.py`` surfaces it:
    ``br``/``zstd``/corrupt streams the parser could not undo). The
    ONE quarantine predicate shared by the crawl front door (which
    drops flagged rows before the text tier) and the observability
    lane (which flags + nulls text): compressed bytes must never be
    charset-"decoded" — windows-1252 maps every byte, so the result
    is dense garbage that silently poisons dedup hashes, lang-ID and
    quality gates. Pure Column, shuffle-free."""
    c = _col(encoding_col)
    return c.isNotNull() & (F.trim(c) != "")


def quarantine_undecoded(
    df: DataFrame,
    encoding_col: str = "content_encoding",
    text_col: str = "text",
    flag_col: str = "quarantined",
) -> DataFrame:
    """Observability form of the quarantine: keep every row, flag the
    undecodable ones and NULL their text so no downstream tier can
    read compressed bytes as prose. The crawl front door uses the
    drop form (``filter(~undecoded_flag())``) — this form is for
    corpus audits that need the quarantine COUNTED per slice."""
    flag = undecoded_flag(encoding_col)
    return df.withColumn(flag_col, flag).withColumn(
        text_col, F.when(~flag, _col(text_col))
    )


# ---------------------------------------------------------------- SQL


def charset_alias_sql(expr: str) -> str:
    """The :data:`CHARSET_ALIASES` map as a DuckDB CASE over ``expr``
    (an already lower/trimmed label) — generated FROM the same tuples
    the Spark expression compiles, so the chains cannot drift."""
    whens = " ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in CHARSET_ALIASES
    )
    return f"(CASE {expr} {whens} ELSE {expr} END)"


def http_charset_sql(ct_expr: str) -> str:
    """DuckDB replay of :func:`http_charset` over a content-type
    string expression (NULL when absent)."""
    rx = HTTP_CHARSET_RX.replace("'", "''")
    raw = (
        f"lower(trim(coalesce(regexp_extract("
        f"coalesce({ct_expr}, ''), '{rx}', 1), '')))"
    )
    return f"nullif({charset_alias_sql(raw)}, '')"


def meta_charset_sql(prefix_expr: str) -> str:
    """DuckDB replay of :func:`meta_charset` over the ASCII prefix
    STRING of the payload (the oracle fixtures plant the prefix as a
    string column precisely so the sniff replays without BLOB
    regexes). NULL when no tag declares a charset."""
    m5 = META_CHARSET_RX.replace("'", "''")
    tag = META_TAG_RX.replace("'", "''")
    http = HTTP_CHARSET_RX.replace("'", "''")
    p = f"coalesce({prefix_expr}, '')"
    raw5 = f"coalesce(regexp_extract({p}, '{m5}', 1), '')"
    rawtag = f"coalesce(regexp_extract({p}, '{tag}', 0), '')"
    rawleg = f"coalesce(regexp_extract({rawtag}, '{http}', 1), '')"
    raw = (
        f"lower(trim(CASE WHEN {raw5} <> '' THEN {raw5} "
        f"WHEN {rawleg} <> '' THEN {rawleg} ELSE '' END))"
    )
    return f"nullif({charset_alias_sql(raw)}, '')"
