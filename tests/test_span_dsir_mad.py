"""Unit tests for the round-3 pipeline operators: duplicated-span
stats (ExactSubstr-style), DSIR hashed-ngram reweighting, and MAD
outlier gating. Each also carries a DuckDB-checked catalog oracle
(l_span_dedup, l_dsir_sample, t_mad_outliers); these tests pin the
semantics on hand-computable micro-inputs."""

from __future__ import annotations


import pytest
from pyspark.sql import functions as F

from polars_fastx_spark.operators import text, timeseries


# ------------------------------------------------------- span dedup

def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_windows_count_and_positions(spark):
    d = _docs(spark, [(1, "a b c d"), (2, "a b")])
    w = text.ngram_windows(d, n=3).collect()
    # doc 1: windows at idx 0 ("a b c") and 1 ("b c d"); doc 2: too short
    assert sorted((r["doc_id"], r["win_idx"]) for r in w) == [(1, 0), (1, 1)]


def test_duplicated_span_stats_flags_shared_window(spark):
    d = _docs(
        spark,
        [
            (1, "x y z q r"),   # windows: "x y z", "y z q", "z q r"
            (2, "p x y z w"),   # windows: "p x y", "x y z", "y z w"
            (3, "unrelated words only here"),
        ],
    )
    w = text.ngram_windows(d, n=3)
    got = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["dup_frac"])
        for r in text.duplicated_span_stats(w).collect()
    }
    # "x y z" is the only window shared across >=2 docs
    assert got[1] == (3, 1, pytest.approx(round(1 / 3, 6)))
    assert got[2] == (3, 1, pytest.approx(round(1 / 3, 6)))
    assert got[3] == (2, 0, 0.0)


def test_span_stats_doc_internal_repeat_not_flagged(spark):
    # the same window repeated WITHIN one doc is not cross-corpus dup
    d = _docs(spark, [(1, "a b c a b c")])
    w = text.ngram_windows(d, n=3)
    row = text.duplicated_span_stats(w).collect()[0]
    assert (row["n_windows"], row["n_dup_windows"]) == (4, 0)


# ------------------------------------------------------------- DSIR

def test_dsir_prefers_target_like_docs(spark):
    # target docs speak "alpha beta"; doc 30 mimics them, doc 31 doesn't
    rows = [(i, "alpha beta alpha beta alpha beta") for i in range(10)]
    rows += [(30, "alpha beta alpha beta"), (31, "zork quux zork quux")]
    d = _docs(spark, rows)
    feats = text.hashed_ngram_buckets(d, num_buckets=64, n=2)
    target = d.filter(F.col("doc_id") < 10).select("doc_id")
    w = {
        r["doc_id"]: r["dsir_logw"]
        for r in text.dsir_logratio(feats, target, num_buckets=64).collect()
    }
    assert w[30] > w[31]


def test_dsir_exact_value_single_bucket_universe(spark):
    # one doc, one bigram occurring once -> weight is the closed-form
    # add-one LLR of its bucket. Target = the same doc.
    d = _docs(spark, [(1, "a b")])
    feats = text.hashed_ngram_buckets(d, num_buckets=16, n=2)
    target = d.select("doc_id")
    got = text.dsir_logratio(feats, target, num_buckets=16).collect()[0]
    # t_b = r_b = 1, T = R = 1, B = 16 -> llr = ln(2/17) - ln(2/17) = 0
    assert got["dsir_logw"] == 0.0


def test_dsir_feature_buckets_in_range(spark):
    d = _docs(spark, [(1, "one two three four five six")])
    rows = text.hashed_ngram_buckets(d, num_buckets=8, n=2).collect()
    assert len(rows) == 5  # 5 overlapping bigrams
    assert all(0 <= r["bucket"] < 8 for r in rows)


# ------------------------------------------------------ MAD outliers

def test_mad_outlier_stats_hand_computed(spark):
    # group g: values 1..9 plus a wild 1000
    rows = [("g", float(v)) for v in range(1, 10)] + [("g", 1000.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    got = timeseries.mad_outlier_stats(df, "k", "v", z=3.0).collect()[0]
    # median of 1..9,1000 = 5.5; adevs: 4.5,3.5,...,0.5,0.5,...,994.5
    # MAD = median(0.5,0.5,1.5,1.5,2.5,2.5,3.5,3.5,4.5,994.5) = 2.5
    assert got["n"] == 10
    assert got["median"] == 5.5
    assert got["mad"] == 2.5
    # threshold 3*1.4826*2.5 = 11.1195 -> only 1000 exceeds
    assert got["n_outliers"] == 1


def test_mad_threshold_not_dragged_by_outliers(spark):
    # a tight base distribution plus two extreme points: the MAD (and
    # hence the threshold) must stay at the base spread, not inflate
    base = [("m", 10.0 + 0.01 * i) for i in range(50)]
    rows = base + [("m", 500.0), ("m", -500.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    got = timeseries.mad_outlier_stats(df, "k", "v", z=3.0).collect()[0]
    assert got["n_outliers"] == 2
    assert got["mad"] < 0.3  # base spread, unmoved by the +-500 points


# ------------------------------------------------ distinctive terms

def test_distinctive_terms_ranks_group_exclusive_word_first(spark):
    # "zork" appears only in group A, "quux" only in B; shared filler
    # words must not win
    rows = [
        (1, "A", "common words zork zork zork"),
        (2, "A", "common zork words"),
        (3, "B", "common words quux quux quux"),
        (4, "B", "common quux words"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = text.distinctive_terms(d, "source", "text", top_k=1).collect()
    top = {r["source"]: r["word"] for r in got}
    assert top == {"A": "zork", "B": "quux"}
    assert all(r["z_logodds"] > 0 for r in got)


def test_distinctive_terms_z_symmetry_two_groups(spark):
    # with two groups, a word's z in A is the negative of its z in B
    # (same delta mirrored, same variance)
    rows = [
        (1, "A", "x x y"),
        (2, "B", "y y x"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = text.distinctive_terms(d, "source", "text", top_k=10)
    z = {(r["source"], r["word"]): r["z_logodds"] for r in got.collect()}
    assert z[("A", "x")] == pytest.approx(-z[("B", "x")], abs=1e-5)
    assert z[("A", "y")] == pytest.approx(-z[("B", "y")], abs=1e-5)


# ---------------------------------------------------------- winnowing

def test_winnow_guarantee_shared_substring_detected(spark):
    # the MOSS guarantee: a shared substring of length >= w+k-1
    # (4+12-1=15 chars here) must produce >= 1 shared fingerprint
    shared = "the quick brown fox jumps"
    rows = [
        (1, "AAAA " + shared + " BBBB padding text one"),
        (2, "CCCCCC " + shared + " DDDD other padding"),
        (3, "completely different content here with no overlap at all"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_fp"], r["n_shared_fp"])
        for r in text.winnow_shared_stats(d, k=12, w=4).collect()
    }
    assert got[1][1] >= 1
    assert got[2][1] >= 1
    assert got[3][1] == 0


def test_winnow_selects_fraction_of_kgrams(spark):
    # winnowing must DOWNSAMPLE: far fewer fingerprints than k-grams
    long_text = " ".join(f"tok{i}" for i in range(200))
    d = spark.createDataFrame([(1, long_text)], "doc_id long, text string")
    n_kgrams = len(long_text) - 12 + 1
    got = text.winnow_shared_stats(d, k=12, w=4).collect()[0]
    assert got["n_fp"] < n_kgrams * 0.6  # ~2/(w+1)=0.4 expected density


def test_winnow_short_text_keeps_all_hashes(spark):
    d = spark.createDataFrame(
        [(1, "abcdefghijklm"), (2, "xy")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["n_fp"] for r in
           text.winnow_shared_stats(d, k=12, w=4).collect()}
    assert got[1] == 2   # 13 chars -> 2 k-grams, fewer than w -> all kept
    assert 2 not in got  # shorter than k -> no k-grams, no row


def test_remove_duplicated_spans_semantics(spark):
    """ExactSubstr removal: the min-id doc keeps the shared span,
    every other doc excises exactly the covered tokens; untouched
    docs keep their ORIGINAL bytes (odd whitespace included); a doc
    fully made of a duplicated span becomes ''."""
    from polars_fastx_spark.operators.text import remove_duplicated_spans

    span = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, f"prefix one {span} tailone xx"),
            (2, f"prefix two {span} tailtwo yy"),
            (3, span),                        # fully duplicated
            (4, "totally  unrelated   text"), # odd whitespace preserved
            (5, "short doc"),                 # < n tokens: untouched
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_removed_tokens"], r["text_clean"])
        for r in remove_duplicated_spans(
            docs, n=8, min_docs=2
        ).collect()
    }
    # doc 1 is the min-id owner: keeps everything, byte-identical
    assert out[1] == (0, f"prefix one {span} tailone xx")
    # doc 2 excises the 8 covered tokens, keeps its own words
    assert out[2] == (8, "prefix two tailtwo yy")
    # doc 3: the whole text was the duplicated span
    assert out[3] == (8, "")
    # untouched docs keep raw bytes (no whitespace normalization)
    assert out[4] == (0, "totally  unrelated   text")
    assert out[5] == (0, "short doc")


def test_remove_duplicated_spans_overlapping_runs(spark):
    """A duplicated REGION longer than n removes the union of its
    overlapping windows, not n tokens per window."""
    from polars_fastx_spark.operators.text import remove_duplicated_spans

    region = " ".join(f"tok{i}" for i in range(12))  # 12-token region
    docs = spark.createDataFrame(
        [(1, f"{region} ownertail"), (2, f"head {region} tail")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_removed_tokens"], r["text_clean"])
        for r in remove_duplicated_spans(
            docs, n=8, min_docs=2
        ).collect()
    }
    assert out[1][0] == 0  # owner untouched
    assert out[2] == (12, "head tail")  # union of windows, once each


def test_remove_duplicated_spans_unseg_passthrough(spark):
    """Docs with unsegmented-script chars pass through UNTOUCHED
    (round-8 ADVICE medium #1): tokens() emits overlapping character
    bigrams there, so an array_join rebuild would duplicate nearly
    every surviving character (安倍晋三 → '安倍 倍晋 晋三'). Surgery
    is scoped to whitespace-tokenizable docs; CJK docs keep their
    bytes and never count toward the duplicated-window set."""
    from polars_fastx_spark.operators.text import remove_duplicated_spans

    span = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    cjk = "安倍晋三は日本の政治家でした。首相を務めた。" * 3
    docs = spark.createDataFrame(
        [
            (1, f"one {span} t1"),
            (2, f"two {span} t2"),
            (3, cjk),                       # pure CJK: untouched
            (4, cjk),                       # its exact duplicate: ALSO
                                            # untouched (whole-doc dedup
                                            # is a different operator)
            (5, f"mixed {span} 日本語 tail"),  # mixed: gated out whole
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_removed_tokens"], r["text_clean"])
        for r in remove_duplicated_spans(docs, n=8, min_docs=2).collect()
    }
    assert out[1] == (0, f"one {span} t1")     # owner keeps bytes
    assert out[2] == (8, "two t2")             # Latin surgery unaffected
    assert out[3] == (0, cjk)
    assert out[4] == (0, cjk)
    assert out[5] == (0, f"mixed {span} 日本語 tail")
    # no space-joined bigram artifacts anywhere
    assert "安倍 倍晋" not in out[3][1] and "安倍 倍晋" not in out[4][1]
