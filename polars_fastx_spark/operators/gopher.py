"""Gopher/C4 quality rule-pack — the standard corpus gate set, ONE pass.

The published heuristic gates every web-corpus builder reaches for
first (Rae et al. 2021 "Scaling Language Models" — the Gopher rules —
plus the C4 paper's code/boilerplate tells): word-count bounds, mean
word length, symbol-to-word ratio, bullet/ellipsis line fractions,
fraction of alphabetic words, required-stopword presence, curly-brace
and "lorem ipsum" rejects. The rule TABLE (:data:`RULES` with
:data:`THRESHOLDS`) compiles into one row-local projection — per
document a boolean verdict plus the ordered reason list — so gating
100 TB costs a single scan-stage map, no shuffle, no Python (the
``operators/quality.py`` one-pass discipline, applied per-row instead
of per-table). The DuckDB oracle SQL is GENERATED from the same
metric expressions and thresholds, so engine and check cannot drift.

Tokenization is :func:`polars_fastx_spark.operators.text.tokens` —
unicode-aware (CJK bigrams), so the count/fraction gates stay
meaningful on multilingual corpora instead of reading a CJK page as
one giant word. The word-LENGTH and STOPWORD rules are the published
English-calibrated constants and structurally cannot pass unsegmented
scripts (a CJK bigram is always 2 chars; the stopword list is
English), so by default documents containing unsegmented-script runs
SKIP exactly those rules (:data:`UNSEG_RELAXED_RULES`,
``unseg_relax=``) — the one-pass equivalent of the per-language rule
packs the published pipelines run; every other rule still applies.

Reference parity: the reference (apcamargo/polars-fastx) has no text
surface; north-star extension per /root/repo/BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from polars_fastx_spark.operators.text import tokens, tokens_sql

#: Gopher's required-stopword list: a real natural-language document
#: contains at least MIN of these (word-salad and SEO keyword lists
#: do not).
GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)


def multilingual_stopwords() -> tuple[str, ...]:
    """The required-stopword vocabulary for MULTILINGUAL corpora: the
    published English list unioned with every Latin-tier language's
    ``text.STOPWORDS`` list (round-9 extension — en/de/es/fr/pt/it/
    nl/pl/id/sv/tr). A clean German or Portuguese page has zero hits
    against the English-only list and fails Gopher's stopword rule —
    the same English-calibration gap the unseg relaxation closes for
    CJK, one script-family over. Sorted-deduped so the Spark InSet
    and the generated SQL enumerate identically. Pass as
    ``gopher_gates(stopwords=multilingual_stopwords())``; the default
    stays the published English constants."""
    from polars_fastx_spark.operators.text import STOPWORDS

    pool = set(GOPHER_STOPWORDS)
    for lang, words in STOPWORDS.items():
        if lang != "zh":  # unsegmented scripts take the unseg path
            pool.update(words)
    return tuple(sorted(pool))

#: every numeric knob of the rule pack, in one place — the SQL
#: generator reads the SAME dict, and callers override per-corpus.
THRESHOLDS: dict[str, float] = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "max_symbol_word_ratio": 0.1,
    "max_bullet_line_frac": 0.9,
    "max_ellipsis_line_frac": 0.3,
    "min_alpha_word_frac": 0.8,
    "min_stopword_hits": 2,
    "max_curly_braces": 0,
    "max_lorem_hits": 0,
}

#: the rule table: (rule name, metric, op, threshold key). A row
#: passes when ``metric op THRESHOLDS[key]`` holds; a NULL metric
#: (empty document) FAILS the rule — a gate must never pass what it
#: cannot measure. Order defines the reasons-list order.
RULES: tuple[tuple[str, str, str, str], ...] = (
    ("words_min", "n_words", ">=", "min_words"),
    ("words_max", "n_words", "<=", "max_words"),
    ("mean_word_len_min", "mean_word_len", ">=", "min_mean_word_len"),
    ("mean_word_len_max", "mean_word_len", "<=", "max_mean_word_len"),
    ("symbol_ratio", "symbol_word_ratio", "<=", "max_symbol_word_ratio"),
    ("bullet_lines", "bullet_line_frac", "<=", "max_bullet_line_frac"),
    ("ellipsis_lines", "ellipsis_line_frac", "<=",
     "max_ellipsis_line_frac"),
    ("alpha_words", "alpha_word_frac", ">=", "min_alpha_word_frac"),
    ("stopwords", "stopword_hits", ">=", "min_stopword_hits"),
    ("no_curly_brace", "curly_braces", "<=", "max_curly_braces"),
    ("no_lorem_ipsum", "lorem_hits", "<=", "max_lorem_hits"),
)

#: rules that CANNOT be meaningfully evaluated on unsegmented-script
#: documents with the published (English-calibrated) constants: a CJK
#: bigram is always 2 chars (mean word length), and the required
#: stopwords are English words. With ``unseg_relax`` (default), docs
#: whose text contains unsegmented-script runs skip these three —
#: the same move the published pipelines make by running per-language
#: rule packs; every other rule (counts, line shapes, symbol ratio,
#: alpha fraction, code/lorem rejects) still applies.
UNSEG_RELAXED_RULES: tuple[str, ...] = (
    "mean_word_len_min", "mean_word_len_max", "stopwords",
)

#: line-shape regexes (Java ∩ RE2 — no lookaround/backrefs)
_BULLET_RX = r"^\s*[-*•‣▪]"
_ELLIPSIS_RX = r"(\.\.\.|…)\s*$"
_ALPHA_RX = r"\p{L}"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _count_occurrences(col: Column, needle: str) -> Column:
    """Occurrences of a literal substring, as a length difference —
    no explode, no regex."""
    return (
        F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit("")))
    ) / len(needle)


def _metrics_of(
    col: Column,
    toks: Column,
    lines: Column,
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
) -> dict[str, Column]:
    """The metric dict over ALREADY-BOUND token/line arrays — callers
    must let-bind ``toks``/``lines`` (see :func:`gopher_gates`):
    Spark inlines a referenced expression at every use site, and the
    rule table references the token array ~8 times, so an unbound
    tokenization would re-run per rule (measured 210x a trivial scan;
    let-bound it is one tokenization per row)."""
    n_words = F.size(toks).cast("bigint")
    total_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    nz_words = F.nullif(n_words, F.lit(0))
    n_lines = F.nullif(F.size(lines), F.lit(0))
    n_bullet = F.size(F.filter(lines, lambda l: l.rlike(_BULLET_RX)))
    n_ellipsis = F.size(F.filter(lines, lambda l: l.rlike(_ELLIPSIS_RX)))
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike(_ALPHA_RX)))
    sw = F.array(*[F.lit(w) for w in stopwords])
    sw_hits = F.size(
        F.array_intersect(F.transform(toks, lambda t: F.lower(t)), sw)
    )
    symbols = _count_occurrences(col, "#") + _count_occurrences(col, "...")
    return {
        "n_words": n_words,
        "mean_word_len": total_len / nz_words,
        "symbol_word_ratio": symbols / nz_words,
        "bullet_line_frac": n_bullet / n_lines,
        "ellipsis_line_frac": n_ellipsis / n_lines,
        "alpha_word_frac": n_alpha / nz_words,
        "stopword_hits": sw_hits.cast("bigint"),
        "curly_braces": _count_occurrences(col, "{").cast("bigint"),
        "lorem_hits": _count_occurrences(
            F.lower(col), "lorem ipsum"
        ).cast("bigint"),
    }


def gopher_metrics(
    c: Column | str, stopwords: tuple[str, ...] = GOPHER_STOPWORDS
) -> dict[str, Column]:
    """Every metric the rule table consumes, as pure Columns over one
    text column — the introspection/debug surface (each metric
    standalone re-tokenizes; the GATE goes through the let-bound
    single-tokenization path in :func:`gopher_gates`)."""
    col = F.coalesce(_col(c), F.lit(""))
    return _metrics_of(col, tokens(col), F.split(col, "\n"), stopwords)


def _passes(metric: Column, op: str, threshold) -> Column:
    cond = (metric >= threshold) if op == ">=" else (metric <= threshold)
    # NULL metric (empty doc) fails: a gate never passes the unmeasured
    return F.coalesce(cond, F.lit(False))


def gopher_gates(
    df: DataFrame,
    text_col: str = "text",
    out_pass: str = "passes_quality",
    out_reasons: str = "fail_reasons",
    thresholds: dict[str, float] | None = None,
    unseg_relax: bool = True,
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
) -> DataFrame:
    """``df`` + boolean ``out_pass`` + ``out_reasons`` (comma-joined
    failed-rule names in :data:`RULES` order, '' when clean). One
    row-local projection with the token and line arrays LET-BOUND so
    tokenization runs once per row however many rules read it —
    compose as a ``filter(col(out_pass))`` gate or keep the reasons
    for corpus-quality dashboards. ``unseg_relax`` (default) skips
    :data:`UNSEG_RELAXED_RULES` for documents containing
    unsegmented-script runs — without it every clean CJK/Thai page
    fails the English-calibrated word-length and stopword rules.
    ``stopwords`` widens the required-stopword vocabulary (pass
    :func:`multilingual_stopwords` on mixed-language corpora — the
    Latin-script analog of the unseg relaxation; still one InSet, no
    plan change)."""
    from polars_fastx_spark.functions.exprs import let
    from polars_fastx_spark.operators.text import UNSEG_CLASS_BODY

    th = {**THRESHOLDS, **(thresholds or {})}
    col = F.coalesce(_col(text_col), F.lit(""))
    is_unseg = (
        col.rlike(f"[{UNSEG_CLASS_BODY}]") if unseg_relax else F.lit(False)
    )

    def with_toks(toks: Column) -> Column:
        def with_lines(lines: Column) -> Column:
            m = _metrics_of(col, toks, lines, stopwords)
            verdicts = []
            for name, metric, op, key in RULES:
                ok = _passes(m[metric], op, th[key])
                if name in UNSEG_RELAXED_RULES:
                    ok = ok | is_unseg
                verdicts.append(F.when(~ok, F.lit(name)))
            return F.array_join(
                F.filter(F.array(*verdicts), lambda x: x.isNotNull()),
                ",",
            )

        return let(F.split(col, "\n"), with_lines)

    reasons = let(tokens(col), with_toks)
    return df.withColumn(out_reasons, reasons).withColumn(
        out_pass, F.col(out_reasons) == ""
    )


# ---------------------------------------------------------------- SQL


def gopher_metrics_sql(
    expr: str, stopwords: tuple[str, ...] = GOPHER_STOPWORDS
) -> dict[str, str]:
    """DuckDB twins of :func:`gopher_metrics`, generated from the
    same constants."""
    col = f"coalesce({expr}, '')"
    toks = tokens_sql(col)
    bullet = _BULLET_RX.replace("'", "''")
    ellipsis = _ELLIPSIS_RX.replace("'", "''")
    alpha = _ALPHA_RX.replace("'", "''")
    sw = ", ".join(f"'{w}'" for w in stopwords)
    n_words = f"len({toks})"
    nz = f"nullif({n_words}, 0)"
    total_len = f"list_sum(list_transform({toks}, t -> length(t)))"
    lines = f"string_split({col}, chr(10))"
    n_lines = f"nullif(len({lines}), 0)"

    def occ(needle: str, src: str = col) -> str:
        lit = needle.replace("'", "''")
        return (
            f"((length({src}) - length(replace({src}, '{lit}', '')))"
            f" / {len(needle)})"
        )

    return {
        "n_words": f"{n_words}::BIGINT",
        "mean_word_len": f"({total_len}::DOUBLE / {nz})",
        "symbol_word_ratio": f"(({occ('#')} + {occ('...')}) / {nz})",
        "bullet_line_frac": (
            f"(len(list_filter({lines}, l -> "
            f"regexp_matches(l, '{bullet}')))::DOUBLE / {n_lines})"
        ),
        "ellipsis_line_frac": (
            f"(len(list_filter({lines}, l -> "
            f"regexp_matches(l, '{ellipsis}')))::DOUBLE / {n_lines})"
        ),
        "alpha_word_frac": (
            f"(len(list_filter({toks}, t -> "
            f"regexp_matches(t, '{alpha}')))::DOUBLE / {nz})"
        ),
        "stopword_hits": (
            f"len(list_intersect(list_transform({toks}, "
            f"t -> lower(t)), [{sw}]))::BIGINT"
        ),
        "curly_braces": f"{occ('{')}::BIGINT",
        "lorem_hits": f"{occ('lorem ipsum', f'lower({col})')}::BIGINT",
    }


def gopher_reasons_sql(
    expr: str,
    thresholds: dict[str, float] | None = None,
    unseg_relax: bool = True,
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
) -> str:
    """DuckDB expression for the comma-joined failed-rule list —
    generated from :data:`RULES` + :data:`THRESHOLDS` (+ the
    :data:`UNSEG_RELAXED_RULES` relaxation), mirroring
    :func:`gopher_gates` (NULL metric fails)."""
    from polars_fastx_spark.operators.text import UNSEG_CLASS_BODY

    th = {**THRESHOLDS, **(thresholds or {})}
    m = gopher_metrics_sql(expr, stopwords)
    unseg_cls = f"[{UNSEG_CLASS_BODY}]".replace("'", "''")
    is_unseg = (
        f"regexp_matches(coalesce({expr}, ''), '{unseg_cls}')"
        if unseg_relax
        else "FALSE"
    )
    parts = []
    for name, metric, op, key in RULES:
        cond = f"coalesce({m[metric]} {op} {th[key]}, FALSE)"
        if name in UNSEG_RELAXED_RULES:
            cond = f"({cond} OR {is_unseg})"
        parts.append(f"CASE WHEN NOT {cond} THEN '{name}' END")
    arr = ", ".join(parts)
    # coalesce: DuckDB renders the all-pass empty list as NULL where
    # Spark's array_join gives ''
    return (
        f"coalesce(array_to_string("
        f"list_filter([{arr}], x -> x IS NOT NULL), ','), '')"
    )
