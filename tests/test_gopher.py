"""operators/gopher.py — the Gopher/C4 quality rule-pack (round-8 #3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_fastx_spark.operators import gopher as G

CLEAN = (
    "the quick brown fox jumps over and that is fine to have with " * 6
)


def _gate_one(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    return G.gopher_gates(df).collect()[0]


def test_each_rule_trips_on_its_planted_text(spark):
    cases = {
        CLEAN: "",
        "too short": "words_min,stopwords",
        "\n".join("- bullet point here of the and that" for _ in range(20)):
            "bullet_lines",
        "\n".join(
            f"the line {i} of it all trails far away off into more..."
            for i in range(12)
        ): "ellipsis_lines",
        "# ".join(f"tag{i}" for i in range(80))
        + " the of and that be to have with":
            "symbol_ratio",
        "function f() { return 1; } " + CLEAN: "no_curly_brace",
        "Lorem ipsum dolor sit amet " + CLEAN: "no_lorem_ipsum",
        ("zxqjw wvkyx " * 30): "stopwords",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "id long, text string"
    )
    got = {
        r["id"]: (r["passes_quality"], r["fail_reasons"])
        for r in G.gopher_gates(df).collect()
    }
    for i, (t, want) in enumerate(cases.items()):
        passed, reasons = got[i]
        assert passed == (want == ""), (t[:40], reasons)
        if want:
            for rule in want.split(","):
                assert rule in reasons, (t[:40], rule, reasons)


def test_reasons_are_rules_order_and_empty_doc_fails(spark):
    r = _gate_one(spark, "")
    assert r["passes_quality"] is False
    names = [name for name, *_ in G.RULES]
    got = r["fail_reasons"].split(",")
    # reasons appear in RULES order (subset preserving order)
    assert got == [n for n in names if n in got]
    assert "words_min" in got


def test_thresholds_override(spark):
    df = spark.createDataFrame(
        [("the quick brown foxes jumped over and that house have with",)],
        "text string",
    )
    strict = G.gopher_gates(df).collect()[0]
    assert strict["passes_quality"] is False  # < 50 words
    loose = G.gopher_gates(df, thresholds={"min_words": 5}).collect()[0]
    assert loose["passes_quality"] is True


def test_one_pass_plan_no_shuffle_no_python(spark):
    """The 100 TB pin: the whole rule table is one row-local
    projection — no exchange, no Python, fused into the scan."""
    df = spark.range(100).selectExpr("id", "'some text here' AS text")
    out = G.gopher_gates(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan


def test_sql_twin_matches_spark(spark):
    duckdb = pytest.importorskip("duckdb")
    texts = [
        CLEAN, "", "short one", "- a\n- b\n- c",
        "line one more of the end dot dot dot...\n" * 12,
        "{ code } " + CLEAN, "lorem ipsum " + CLEAN,
        "これは日本語のテキストです" * 10,
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    spark_got = {
        r["id"]: r["fail_reasons"]
        for r in G.gopher_gates(df).collect()
    }
    vals = ",".join(
        "({}, '{}')".format(i, t.replace("'", "''"))
        for i, t in enumerate(texts)
    )
    sql = (
        f"WITH x(id, text) AS (VALUES {vals}) "
        f"SELECT id, {G.gopher_reasons_sql('text')} AS r FROM x"
    )
    duck_got = {r[0]: r[1] for r in duckdb.sql(sql).fetchall()}
    assert spark_got == duck_got


def test_crawl_to_corpus_quality_tier(spark, tmp_path):
    """quality_gates=True drops rule-failing pages before the dedup
    tiers; the phase accounting reports the tier."""
    from polars_fastx_spark.pipeline import crawl_to_corpus
    from polars_fastx_spark.sources import warc

    def _rec(i, uri, body):
        return warc.render_warc_record(
            f"<urn:uuid:g-{i}>", "response", uri,
            "2026-08-01T00:00:00Z",
            warc.http_response_block(
                f"<html><body><p>{body}</p></body></html>".encode()
            ),
        )

    good = " ".join(
        f"word{i} the quick brown foxes jumped over and that house "
        "have with" for i in range(12)
    )
    junk = "zxq wvk " * 40  # no stopwords -> fails the pack
    recs = [
        _rec(0, "https://good.example/a", good),
        _rec(1, "https://junk.example/b", junk),
    ]
    src = tmp_path / "crawl"
    src.mkdir()
    warc.write_warc(str(src / "a.warc.gz"), recs)
    timings: dict = {}
    got = crawl_to_corpus(
        spark, str(src) + "/*.warc.gz", str(tmp_path / "out"),
        domain_cap_n=10, quality_gates=True, timings=timings,
    )
    urls = {r["url"] for r in got.collect()}
    assert urls == {"https://good.example/a"}
    assert timings["quality_gates"]["rows"] == 1


def test_unseg_relaxation(spark):
    """A clean CJK document passes via the unsegmented-script
    relaxation (English word-length/stopword rules skip); with
    unseg_relax=False it fails exactly those; and a CJK SPAM page
    still fails the non-relaxed rules."""
    clean_cjk = "这是一个质量良好的中文网页正文内容" * 8
    spam_cjk = "# 标签 " * 60 + "这是正文"
    df = spark.createDataFrame(
        [(1, clean_cjk), (2, spam_cjk)], "id long, text string"
    )
    got = {
        r["id"]: (r["passes_quality"], r["fail_reasons"])
        for r in G.gopher_gates(df).collect()
    }
    assert got[1] == (True, "")
    assert got[2][0] is False and "symbol_ratio" in got[2][1]
    strict = G.gopher_gates(df, unseg_relax=False).collect()
    r1 = [r for r in strict if r["id"] == 1][0]
    assert r1["passes_quality"] is False
    assert "mean_word_len_min" in r1["fail_reasons"]
    assert "stopwords" in r1["fail_reasons"]
    # the SQL twin relaxes identically
    import duckdb

    sql = (
        "WITH x(id, text) AS (VALUES (1, '" + clean_cjk + "')) "
        f"SELECT {G.gopher_reasons_sql('text')} AS r FROM x"
    )
    assert duckdb.sql(sql).fetchone()[0] == ""


def test_multilingual_stopword_vocabulary(spark):
    """Round-9: a clean German page fails the published English-only
    stopword rule; multilingual_stopwords() — the union of the
    11-language Latin STOPWORDS tier — passes it, while word salad
    with no language's stopwords still fails. The SQL twin widens
    from the same constants."""
    de = (
        "der hund und die katze ist nicht ein tier zu mit haus baum "
        "wasser licht " * 5
    )
    salad = (
        "zxqv wqkk pmln brzt gkfd vvrn ttsl ppwa hhjd rrkc mmvn bbsw "
        "ddql ffzt ggxp " * 5
    )
    df = spark.createDataFrame(
        [(1, de), (2, salad)], "id long, text string"
    )
    en_only = {
        r["id"]: r["fail_reasons"] for r in G.gopher_gates(df).collect()
    }
    assert "stopwords" in en_only[1]
    ml = {
        r["id"]: (r["passes_quality"], r["fail_reasons"])
        for r in G.gopher_gates(
            df, stopwords=G.multilingual_stopwords()
        ).collect()
    }
    assert ml[1] == (True, "")
    assert ml[2][0] is False and "stopwords" in ml[2][1]
    # the vocabulary is sorted-deduped and contains both tiers
    v = G.multilingual_stopwords()
    assert list(v) == sorted(set(v))
    assert "the" in v and "der" in v and "não" in v and "och" in v
    assert "的" not in v  # unsegmented scripts take the unseg path
    # SQL twin widens identically
    import duckdb

    sql = (
        "WITH x(id, text) AS (VALUES (1, '" + de + "')) "
        f"SELECT {G.gopher_reasons_sql('text', stopwords=G.multilingual_stopwords())}"
        " AS r FROM x"
    )
    assert duckdb.sql(sql).fetchone()[0] == ""
