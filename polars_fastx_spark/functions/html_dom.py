"""DOM-accurate HTML extraction — the Arrow tier behind the regex one.

``functions/html.py`` is the 100 TB front line: pure-codegen regex
chains, SQL-replayable, zero Python per row. What regexes cannot do
is STRUCTURE: knowing which text sits inside ``<nav>``, how much of
a block is link text, where the article body starts. This module is
the DOM tier at the same column seam — a real parser
(stdlib ``html.parser``, no dependency) building a flat block list
with per-block metrics, batched through Arrow as a pandas UDF
(``dom_extract``), exactly the plug-in point the regex tier's
docstring has always promised (functions/html.py:9-14). The JPEG
codec set the precedent in round 6: the seam is only real once a
working implementation sits behind it.

**Block model**: visible character data accumulates into the current
block; opening or closing any block-level element flushes it. Each
block records its text, its link-text length (characters inside
``<a>``), and whether any open ancestor is page chrome
(``nav/header/footer/aside/form``). ``script/style/noscript/
template`` content, comments, and CDATA sections are dropped;
``convert_charrefs`` decodes ALL entities (the regex tier decodes
only the core table — the differential tests restrict themselves to
it).

**Main-content rule** (jusText-lite, deterministic, documented here
because it IS the contract): a block belongs to the main content iff
it is not inside chrome, its link density (link chars / text chars)
is ≤ 0.4, and it holds ≥ 25 visible characters. Everything else is
boilerplate. This is corpus policy — tune by subclassing
``_BlockParser`` or post-filtering the ``blocks()`` output.

**Scale shape**: parsing is row-local Python — the modality's cost,
same adjudication as JPEG decode: it rides ``pandas_udf`` over Arrow
batches (no per-row serialization), parallelizes per partition, and
exchanges nothing. The regex tier remains the default in
``crawl_to_corpus``; pass ``extractor="dom"`` to switch.

Reference parity: the reference (apcamargo/polars-fastx) has no HTML
surface; north-star extension per /root/repo/BASELINE.json:6.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser

from pyspark.sql import Column
from pyspark.sql import functions as F

#: elements whose content is never visible text
_SKIP = {"script", "style", "noscript", "template"}

#: elements that delimit text blocks (superset of the regex tier's
#: _BLOCK_BREAK closers plus the openers, since a parser sees both)
_BLOCK = {
    "p", "div", "li", "ul", "ol", "table", "tr", "td", "th",
    "h1", "h2", "h3", "h4", "h5", "h6", "section", "article",
    "header", "footer", "blockquote", "pre", "title", "head",
    "body", "main", "nav", "aside", "form", "figure", "figcaption",
    "dl", "dt", "dd",
}

#: page-chrome containers: text inside them is navigation/boilerplate
_CHROME = {"nav", "header", "footer", "aside", "form"}

#: main-content thresholds (module constants so tests and docs agree)
MAIN_MAX_LINK_DENSITY = 0.4
MAIN_MIN_CHARS = 25


@dataclass
class Block:
    text: str
    link_chars: int
    in_chrome: bool

    @property
    def link_density(self) -> float:
        return self.link_chars / len(self.text) if self.text else 0.0

    @property
    def is_main(self) -> bool:
        return (
            not self.in_chrome
            and len(self.text) >= MAIN_MIN_CHARS
            and self.link_density <= MAIN_MAX_LINK_DENSITY
        )


@dataclass
class _State:
    blocks: list[Block] = field(default_factory=list)
    buf: list[str] = field(default_factory=list)
    buf_link: int = 0
    title: list[str] = field(default_factory=list)


class _BlockParser(HTMLParser):
    """Lenient block-tree walk: stdlib html.parser never raises on
    malformed input (stray ``<``, unclosed tags, bad nesting all
    degrade to data or ignored events), which is exactly the
    tolerance a crawl needs."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.st = _State()
        self._skip = 0          # open script/style/... elements
        self._chrome = 0        # open nav/header/... elements
        self._links = 0         # open <a> elements
        self._in_title = False

    # -- block bookkeeping
    def _flush(self) -> None:
        text = " ".join("".join(self.st.buf).split())
        if text:
            self.st.blocks.append(
                Block(
                    text=text,
                    link_chars=min(self.st.buf_link, len(text)),
                    in_chrome=self._chrome > 0,
                )
            )
        self.st.buf = []
        self.st.buf_link = 0

    # -- parser events
    # Every tag boundary contributes a space, matching the regex
    # tier's "strip every tag to a space" convention: corpus text
    # prefers over-splitting ("word<b>s</b>" → "word s") to gluing
    # ("<a>Home</a><a>More</a>" → "HomeMore") — and it keeps the
    # regex-vs-DOM differential a pure token-stream equality.
    def handle_starttag(self, tag, attrs):
        if tag in _SKIP:
            self._skip += 1
            return
        if tag in _BLOCK:
            self._flush()
            if tag in _CHROME:
                self._chrome += 1
            if tag == "title":
                self._in_title = True
        else:
            self.st.buf.append(" ")
            if tag == "a":
                self._links += 1

    def handle_startendtag(self, tag, attrs):
        if tag not in _SKIP:
            self.st.buf.append(" ")

    def handle_endtag(self, tag):
        if tag in _SKIP:
            self._skip = max(0, self._skip - 1)
            return
        if tag in _BLOCK:
            self._flush()
            if tag in _CHROME:
                self._chrome = max(0, self._chrome - 1)
            if tag == "title":
                self._in_title = False
        else:
            self.st.buf.append(" ")
            if tag == "a":
                self._links = max(0, self._links - 1)

    def handle_data(self, data):
        if self._skip:
            return
        if self._in_title:
            self.st.title.append(data)
        self.st.buf.append(data)
        if self._links:
            self.st.buf_link += len("".join(data.split()))

    def unknown_decl(self, data):  # <![CDATA[...]]> — not HTML text
        pass

    def handle_comment(self, data):
        pass

    def close(self):
        super().close()
        self._flush()


def parse_blocks(html: str | None) -> tuple[list[Block], str]:
    """(blocks, title) of one document — the driver-side/testing entry
    point; the UDF below batches this per Arrow chunk."""
    p = _BlockParser()
    p.feed(html or "")
    p.close()
    title = " ".join("".join(p.st.title).split())
    return p.st.blocks, title


def extract_dom_py(html: str | None) -> dict:
    """One document → the extraction dict (text / title / main_text /
    n_blocks / link_density). ``text`` concatenates every visible
    block (the regex tier's contract); ``main_text`` keeps only
    blocks passing the main-content rule in the module docstring."""
    blocks, title = parse_blocks(html)
    text = "\n".join(b.text for b in blocks)
    main = "\n".join(b.text for b in blocks if b.is_main)
    total = sum(len(b.text) for b in blocks)
    links = sum(b.link_chars for b in blocks)
    return {
        "text": text,
        "title": title,
        "main_text": main,
        "n_blocks": len(blocks),
        "link_density": (links / total) if total else 0.0,
    }


#: the UDF's output shape — one struct column, exploded by callers
DOM_SCHEMA = (
    "struct<text:string,title:string,main_text:string,"
    "n_blocks:int,link_density:double>"
)


def dom_extract(html: Column | str) -> Column:
    """Column form: ``dom_extract("html")`` →
    ``struct<text,title,main_text,n_blocks,link_density>`` via an
    Arrow-batched pandas UDF. Use ``.getField`` or ``col("d.*")`` to
    project; prefer the codegen tier (:mod:`...functions.html`) when
    block structure is not needed."""
    import pandas as pd

    def _dom(batch):
        return pd.DataFrame(
            [extract_dom_py(h) for h in batch],
            columns=[
                "text", "title", "main_text", "n_blocks",
                "link_density",
            ],
        )

    # call form with explicit Series→DataFrame hints: the module's
    # string annotations (future-import) would not resolve inside
    # pyspark's hint inspection
    _dom.__annotations__ = {
        "batch": pd.Series, "return": pd.DataFrame
    }
    udf = F.pandas_udf(_dom, DOM_SCHEMA)
    return udf(F.col(html) if isinstance(html, str) else html)


def with_dom_extract(df, html_col: str, prefix: str = "dom_"):
    """``df`` + ``dom_text, dom_title, dom_main_text, dom_n_blocks,
    dom_link_density`` — the DataFrame convenience over
    :func:`dom_extract`."""
    d = df.withColumn("__dom", dom_extract(html_col))
    for f_name in (
        "text", "title", "main_text", "n_blocks", "link_density"
    ):
        d = d.withColumn(
            f"{prefix}{f_name}", F.col("__dom").getField(f_name)
        )
    return d.drop("__dom")
