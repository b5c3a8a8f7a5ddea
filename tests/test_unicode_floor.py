"""The text tier's unicode floor (round-8 #2).

Round 7 flagged two live hazards: normalize_text stripped every
non-Latin char (all CJK/Cyrillic/Arabic docs → '' → ONE shared md5
fingerprint, a dedup collapse), and whitespace tokens() made an
unsegmented CJK document ONE token (every token statistic → noise).
These tests pin the fixes: unicode-category normalization, CJK
char-bigram tokenization, script-first lang-ID — and that Latin text
behaves byte-identically to before (the existing oracle contract).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_fastx_spark.operators import text as T

ZH_A = "今天天气很好我们去公园散步"
ZH_B = "机器学习模型需要大量训练数据"
JA = "これは日本語のテストです"
RU = "Это русский текст для проверки"
AR = "هذا نص عربي للاختبار"
TH = "ภาษาไทยไม่มีช่องว่าง"
EN = "The quick brown fox, and the lazy dog!"


def _one(spark, col_expr, value):
    df = spark.createDataFrame([(value,)], "t string")
    return df.select(col_expr.alias("v")).collect()[0]["v"]


def test_fingerprints_distinct_for_distinct_chinese_docs(spark):
    """THE round-7 hazard: two different Chinese documents must not
    share a fingerprint (the old [^a-z0-9] normalization sent both
    to md5(''))."""
    df = spark.createDataFrame(
        [(1, ZH_A), (2, ZH_B), (3, RU), (4, AR), (5, "")],
        "id long, t string",
    )
    got = {
        r["id"]: r["fp"]
        for r in df.select("id", T.fingerprint("t").alias("fp")).collect()
    }
    assert got[1] != got[2]
    assert len({got[1], got[2], got[3], got[4]}) == 4
    # and none of them collapsed to the empty-string fingerprint
    assert got[5] not in (got[1], got[2], got[3], got[4])


def test_normalize_keeps_unicode_letters(spark):
    assert _one(spark, T.normalize_text("t"), ZH_A) == ZH_A
    assert _one(spark, T.normalize_text("t"), "Héllo, Wörld! 42") == (
        "héllo wörld 42"
    )
    # punctuation still drops, case still folds, whitespace collapses
    assert _one(spark, T.normalize_text("t"), "  A..B\t\tC  ") == "ab c"


def test_tokens_latin_identical_to_whitespace_split(spark):
    """The no-regression pin: on Latin text the new tokenizer is
    byte-identical to split-on-\\s+ with empties dropped — this is
    what keeps every existing Latin-corpus oracle green."""
    texts = [EN, "  padded   text ", "", "one", "a,b.c!"]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    old = F.filter(F.split(F.trim(F.col("t")), r"\s+"), lambda x: x != "")
    rows = df.select(
        T.tokens("t").alias("new"), old.alias("old")
    ).collect()
    for r in rows:
        assert r["new"] == r["old"]


def test_tokens_cjk_bigrams(spark):
    # a run of n chars → n-1 overlapping bigrams
    got = _one(spark, T.tokens("t"), "中文分词")
    assert got == ["中文", "文分", "分词"]
    # lone char stays a unigram; mixed text interleaves correctly
    got2 = _one(spark, T.tokens("t"), "see 中 and 日本語 ok")
    assert got2 == ["see", "中", "and", "日本", "本語", "ok"]
    # Thai (unsegmented, no spaces) segments too
    got3 = _one(spark, T.tokens("t"), TH)
    assert len(got3) == len(TH) - 1
    # token_count is now meaningful for CJK: chars-1, not 1
    n = _one(spark, T.token_count("t"), ZH_A)
    assert n == len(ZH_A) - 1


def test_tokens_sql_twin_matches(spark):
    duckdb = pytest.importorskip("duckdb")
    texts = [EN, ZH_A, JA, TH, "see 中 and 日本語 ok", "", "  "]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, t string"
    )
    spark_got = {
        r["id"]: r["tk"]
        for r in df.select("id", T.tokens("t").alias("tk")).collect()
    }
    vals = ",".join(
        "({}, '{}')".format(i, t.replace("'", "''"))
        for i, t in enumerate(texts)
    )
    sql = (
        f"WITH x(id, t) AS (VALUES {vals}) "
        f"SELECT id, {T.tokens_sql('t')} AS tk FROM x"
    )
    duck_got = {r[0]: r[1] for r in duckdb.sql(sql).fetchall()}
    assert spark_got == duck_got
    # normalize twin too
    sqln = (
        f"WITH x(id, t) AS (VALUES {vals}) "
        f"SELECT id, {T.normalize_sql('t')} AS n FROM x"
    )
    duck_norm = {r[0]: r[1] for r in duckdb.sql(sqln).fetchall()}
    spark_norm = {
        r["id"]: r["n"]
        for r in df.select(
            "id", T.normalize_text("t").alias("n")
        ).collect()
    }
    assert spark_norm == duck_norm


def test_lang_id_script_first(spark):
    cases = {
        ZH_A: "zh", JA: "ja", RU: "ru", AR: "ar", TH: "th",
        "한국어 문서 텍스트": "ko",
        "Ελληνικό κείμενο εδώ": "el",
        "טקסט בעברית כאן": "he",
        "यह हिंदी पाठ है": "hi",
        # Latin still decides by stopwords
        "the cat sat on the mat and it was good": "en",
        "der Hund ist nicht mit der Katze": "de",
        # one quoted CJK word inside an English page: stays English
        'the word "中文" appears once in this english sentence '
        "and the text is long enough": "en",
        "zzz qqq xxx": "und",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "id long, t string"
    )
    got = {
        r["id"]: r["lang"]
        for r in df.select(
            "id", T.lang_id("t").alias("lang")
        ).collect()
    }
    for i, (t, want) in enumerate(cases.items()):
        assert got[i] == want, (t, got[i], want)


def test_mixed_corpus_vocab_and_bm25_stay_sane(spark):
    """A mixed-script corpus must keep usable token statistics: the
    vocab sees CJK bigrams (not one giant token per doc), and BM25
    retrieves the Chinese document for a Chinese query."""
    docs = spark.createDataFrame(
        [(1, EN), (2, ZH_A), (3, ZH_B), (4, JA)],
        "doc_id long, text string",
    )
    vocab = T.vocab_build(docs, "doc_id", "text")
    word_col = [c for c in vocab.columns if "word" in c or "term" in c]
    wc = word_col[0] if word_col else vocab.columns[0]
    terms = {r[0] for r in vocab.select(wc).collect()}
    assert "天气" in terms and "学习" in terms  # bigrams, not blobs
    assert ZH_A not in terms  # the giant-token degeneration is gone

    hits = T.bm25_scores(docs, "doc_id", "text", ["训练", "数据"])
    ranked = hits.orderBy(F.col("bm25").desc()).collect()
    assert ranked and ranked[0]["doc_id"] == 3  # training-data doc wins


def test_word_ngrams_and_repetition_on_cjk(spark):
    df = spark.createDataFrame([(1, ZH_A)], "id long, t string")
    grams = df.select(T.word_ngrams("t", 3).alias("g")).collect()[0]["g"]
    assert grams and all(len(g.split(" ")) == 3 for g in grams)
    rep = T.word_repetition(df, "id", "t").collect()
    assert rep  # a ratio exists instead of one 100% mega-token


def test_lang_id_extended_latin_tier(spark):
    """Round-9 #4: the Latin stopword tier covers pt/it/nl/pl/id/sv/
    tr (plus the original en/de/es/fr) — each language's planted
    sentence must classify as ITSELF, and a per-language corpus
    report over the mixed fixture segments instead of lumping the
    Latin web into 'und'."""
    sentences = {
        "en": "the cat and the dog that is in it for you",
        "de": "der hund und die katze ist nicht ein tier zu mit",
        "es": "el perro y la casa de que los una por con",
        "fr": "le chien et la maison les des est une dans pour pas",
        "pt": "não é uma coisa simples você já sabe disso também",
        "it": "il documento che non sono anche questo della gli più",
        "nl": "het huis een niet ook maar zijn voor van op",
        "pl": "nie jest się że jak ale czy tym dla przez",
        "id": "yang ini dan itu dengan untuk tidak adalah dari di",
        "sv": "och att det som är inte jag på för med",
        "tr": "bir ve bu için ile olarak gibi çok daha ama",
    }
    df = spark.createDataFrame(
        [(lang, s) for lang, s in sentences.items()],
        "expected string, text string",
    )
    got = {
        r["expected"]: r["pred"]
        for r in df.select(
            "expected", T.lang_id("text").alias("pred")
        ).collect()
    }
    assert got == {lang: lang for lang in sentences}
    # the corpus report: one row per language, no 'und' bucket
    report = (
        df.select(T.lang_id("text").alias("lang"))
        .groupBy("lang").count().collect()
    )
    assert {r["lang"] for r in report} == set(sentences)
    assert all(r["count"] == 1 for r in report)
