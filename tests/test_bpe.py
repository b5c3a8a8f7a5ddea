"""operators.bpe: relational BPE merge training + encode.

Hand-computed micro-corpora pin the greedy semantics (leftmost
non-overlapping merge, count-then-lhs-then-rhs tiebreak); the catalog
oracle pins engine parity at three scales."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_fastx_spark.operators import bpe


def _docs(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def test_bpe_hand_computed_merges(spark):
    # 'aaab' x3: round 1 (a,a)x6 -> 'aa a b'; round 2 tie between
    # (aa,a) and (a,b) at 3 -> lhs 'a' < 'aa' wins; round 3 (aa,ab)
    d = _docs(spark, ["aaab aaab", "aaab"])
    got = [
        (r["round"], r.lhs, r.rhs, r.pair_count)
        for r in bpe.bpe_train(d, "text", 3).orderBy("round").collect()
    ]
    assert got == [(1, "a", "a", 6), (2, "a", "b", 3), (3, "aa", "ab", 3)]


def test_bpe_merge_is_leftmost_greedy_nonoverlapping(spark):
    # 'aaaa': pair (a,a) counts 3 per word but merges to TWO tokens
    # ('aa aa'), never the overlapping three
    d = _docs(spark, ["aaaa", "aaaa"])
    rules = bpe.bpe_train(d, "text", 2).orderBy("round").collect()
    assert (rules[0].lhs, rules[0].rhs, rules[0].pair_count) == ("a", "a", 6)
    assert (rules[1].lhs, rules[1].rhs, rules[1].pair_count) == ("aa", "aa", 2)
    toks = {
        r.token: r.n for r in bpe.bpe_token_counts(d, "text", 1).collect()
    }
    assert toks == {"aa": 4}


def test_bpe_token_counts_conserve_characters(spark):
    """Merging never creates or drops characters: sum(n * len(token))
    must equal the corpus character count (whitespace excluded) at
    every merge depth."""
    d = _docs(spark, ["the cat sat", "the cat", "a cat sat on the mat"])
    total_chars = d.agg(
        F.sum(F.length(F.regexp_replace("text", r"\s+", "")))
    ).collect()[0][0]
    for k in (1, 3, 5):
        toks = bpe.bpe_token_counts(d, "text", k)
        got = toks.agg(
            F.sum(F.length("token") * F.col("n"))
        ).collect()[0][0]
        assert got == total_chars, k


def test_bpe_encode_matches_train_rules_replayed(spark):
    """Applying bpe_train's rules manually (chained literal replaces
    in round order) over the vocabulary must reproduce
    bpe_token_counts — train and encode cannot drift."""
    d = _docs(spark, ["banana band", "banana", "ban ban banana"])
    k = 4
    rules = bpe.bpe_train(d, "text", k).orderBy("round").collect()
    state = bpe.word_counts(d, "text").select(
        F.array_join(F.expr("regexp_extract_all(word, '.', 0)"), " ").alias(
            "state"
        ),
        "cnt",
    )
    for r in rules:
        state = state.select(
            F.replace(
                F.col("state"),
                F.lit(r.lhs + " " + r.rhs),
                F.lit(r.lhs + r.rhs),
            ).alias("state"),
            "cnt",
        )
    manual = {
        (r.token, r.n)
        for r in state.select(
            F.explode(F.split("state", " ")).alias("token"), "cnt"
        )
        .groupBy("token")
        .agg(F.sum("cnt").alias("n"))
        .collect()
    }
    got = {
        (r.token, r.n)
        for r in bpe.bpe_token_counts(d, "text", k).collect()
    }
    assert got == manual


def test_bpe_rejects_bad_num_merges(spark):
    d = _docs(spark, ["ab"])
    with pytest.raises(ValueError):
        bpe.bpe_train(d, "text", 0)
    with pytest.raises(ValueError):
        bpe.bpe_token_counts(d, "text", -1)


def test_word_counts_skips_nulls_and_empties(spark):
    d = spark.createDataFrame(
        [("a a  b",), (None,), ("   ",), ("b",)], "text string"
    )
    got = {r.word: r.cnt for r in bpe.word_counts(d, "text").collect()}
    assert got == {"a": 2, "b": 2}


def test_bpe_survives_pair_exhaustion(spark):
    """Once every word is fully merged, later rounds have no pairs:
    the rule list just stops, and the vocabulary must pass through
    UNCHANGED (an empty argmax cross-joined in would erase it)."""
    d = _docs(spark, ["ab", "ab ab"])
    rules = bpe.bpe_train(d, "text", 4).collect()
    assert [(r["round"], r.lhs, r.rhs) for r in rules] == [(1, "a", "b")]
    toks = {r.token: r.n for r in bpe.bpe_token_counts(d, "text", 4).collect()}
    assert toks == {"ab": 3}
