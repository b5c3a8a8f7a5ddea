"""Decontamination, unigram-LM scoring, int8 quantization (L3+/L4+):
hand-checkable micro-fixtures, plus invariants on driver testdata."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from polars_fastx_spark.operators import text as tx
from polars_fastx_spark.operators import vectors as vec

SF = "/root/testdata/sf0.001"


def test_decontaminate_flags_only_overlapping_docs(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # hits
            (2, "a completely different sentence with no overlap here"),
            (3, "short doc"),  # < 3 words -> no 3-grams at all
        ],
        "doc_id long, text string",
    )
    benchmark = spark.createDataFrame(
        [(100, "we saw the quick brown fox jumps yesterday")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in tx.decontaminate(corpus, benchmark, "doc_id", "text", n=3).collect()
    }
    assert len(out) == 3  # EVERY corpus doc gets a verdict row
    # shared 3-grams: "the quick brown", "quick brown fox", "brown fox jumps"
    assert out[1]["n_hit_ngrams"] == 3 and out[1]["contaminated"]
    assert out[2]["n_hit_ngrams"] == 0 and not out[2]["contaminated"]
    assert out[3]["n_hit_ngrams"] == 0 and not out[3]["contaminated"]


def test_bloom_decontaminate_never_undercounts(spark):
    """Bloom membership has no false negatives: every exact-contaminated
    doc is bloom-flagged, and bloom hit counts >= exact hit counts —
    even at a deliberately tiny m (high FP pressure)."""
    docs = spark.read.parquet(SF + "/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 11 != 0)
    benchmark = docs.filter(F.col("doc_id") % 11 == 0)
    exact = {
        r["doc_id"]: r["n_hit_ngrams"]
        for r in tx.decontaminate(corpus, benchmark, "doc_id", "text", n=5).collect()
    }
    bloom = {
        r["doc_id"]: r["n_hit_ngrams"]
        for r in tx.bloom_decontaminate(
            corpus, benchmark, "doc_id", "text", n=5, m_bits=1024, k=2
        ).collect()
    }
    assert set(bloom) == set(exact)  # a verdict row for every doc
    assert all(bloom[d] >= exact[d] for d in exact)


def test_bloom_decontaminate_matches_exact_at_design_rate(spark):
    """At a properly-sized m (load << 1) the FP probability is ~(set
    bits/m)^k ≈ 1e-12 — bloom and exact agree on every doc."""
    docs = spark.read.parquet(SF + "/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 11 != 0)
    benchmark = docs.filter(F.col("doc_id") % 11 == 0)
    exact = sorted(
        tuple(r)
        for r in tx.decontaminate(corpus, benchmark, "doc_id", "text", n=5).collect()
    )
    bloom = sorted(
        tuple(r)
        for r in tx.bloom_decontaminate(
            corpus, benchmark, "doc_id", "text", n=5, m_bits=1 << 20, k=4
        ).collect()
    )
    assert bloom == exact


def test_bloom_might_contain_generic_membership(spark):
    keys = spark.createDataFrame(
        [(f"key-{i}",) for i in range(200)], "k string"
    )
    mask = tx.bloom_bitmask(keys, "k", m_bits=1 << 16, k=4)
    assert mask.count() <= (1 << 16) // 63 + 1  # bounded regardless of keys
    probe = spark.createDataFrame(
        [(f"key-{i}",) for i in range(150, 250)]
        + [(f"other-{i}",) for i in range(50)]
        + [(None,)],
        "k string",
    )
    out = {
        r["k"]: r["bloom_hit"]
        for r in tx.bloom_might_contain(
            probe, "k", mask, m_bits=1 << 16, k=4
        ).collect()
    }
    # members always hit (no false negatives)
    assert all(out[f"key-{i}"] for i in range(150, 200))
    # at 800 set bits / 65536 the FP rate is ~2e-8: non-members all miss
    assert not any(out[f"key-{i}"] for i in range(200, 250))
    assert not any(out[f"other-{i}"] for i in range(50))
    assert out[None] is False  # NULL probe flags False, never errors


def test_unigram_logprob_hand_computed(spark):
    # corpus: 4 words total; p(a)=2/4, p(b)=1/4, p(c)=1/4
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a c")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in tx.unigram_logprob_score(df, "doc_id", "text").collect()
    }
    want1 = (math.log(0.5) + math.log(0.25)) / 2
    want2 = want1  # symmetric
    assert rows[1]["n_words"] == 2
    assert rows[1]["avg_logprob"] == pytest.approx(round(want1, 6), abs=1e-9)
    assert rows[2]["avg_logprob"] == pytest.approx(round(want2, 6), abs=1e-9)


def test_quantize_int8_bounds_and_fidelity(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = vec.quantize_int8(emb, "vec_id", "embedding")
    n = emb.count()
    assert out.count() == n
    stats = out.select(
        F.min(F.array_min("qvec")).alias("qmin"),
        F.max(F.array_max("qvec")).alias("qmax"),
        F.max("max_abs_err").alias("emax"),
    ).first()
    assert -127 <= stats["qmin"] and stats["qmax"] <= 127
    # per-dim error bound: half a quantization step of the LARGEST scale
    max_scale = (
        emb.select(F.posexplode(F.col("embedding").cast("array<double>")))
        .agg(F.max(F.abs("col")))
        .first()[0]
    )
    assert stats["emax"] <= max_scale / 254.0 + 1e-12
    # a saturated dimension must exist: some vector attains each dim's
    # absmax, quantizing to exactly ±127
    assert stats["qmax"] == 127 or stats["qmin"] == -127


def test_bm25_hand_computed(spark):
    import math as m

    df = spark.createDataFrame(
        [(1, "cat dog cat"), (2, "dog bird"), (3, "fish fish fish")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r["bm25"]
        for r in tx.bm25_scores(df, "doc_id", "text", ["cat", "dog"]).collect()
    }
    assert set(rows) == {1, 2}  # doc 3 has no query terms
    n, avgdl, k1, b = 3.0, 8.0 / 3.0, 1.2, 0.75

    def score(tf, dfq, dl):
        idf = m.log(1 + (n - dfq + 0.5) / (dfq + 0.5))
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    want1 = score(2, 1, 3) + score(1, 2, 3)  # cat×2, dog×1
    want2 = score(1, 2, 2)                   # dog×1
    assert rows[1] == pytest.approx(want1, abs=1e-9)
    assert rows[2] == pytest.approx(want2, abs=1e-9)


def test_line_dedup_drops_cross_doc_lines_keeps_order(spark):
    docs = spark.createDataFrame(
        [
            (1, "COOKIE BANNER\nunique alpha text\nCOPYRIGHT FOOTER"),
            (2, "COOKIE BANNER\nunique beta text\nCOPYRIGHT FOOTER"),
            (3, "only original content here\nsecond original line"),
            (4, "COOKIE BANNER"),  # fully-deduped doc must keep a row
            (5, "repeated inside\nrepeated inside\nunique gamma"),
        ],
        "doc_id long, text string",
    )
    segs = tx.segment_lines(docs, "doc_id", "text")
    out = {r["doc_id"]: r for r in tx.line_dedup(segs).collect()}

    assert set(out) == {1, 2, 3, 4, 5}
    # banner+footer in 3 and 2 docs respectively -> every copy dropped
    assert out[1]["n_kept"] == 1 and out[1]["text_kept"] == "unique alpha text"
    assert out[2]["n_kept"] == 1 and out[2]["text_kept"] == "unique beta text"
    # untouched doc reassembles to its original text, order preserved
    assert out[3]["n_segments"] == 2 and out[3]["text_kept"] == (
        "only original content here\nsecond original line"
    )
    # fully deduped -> empty text, not a missing row
    assert out[4]["n_kept"] == 0 and out[4]["text_kept"] == ""
    # within-ONE-doc repetition is NOT cross-doc duplication (countDistinct)
    assert out[5]["n_kept"] == 3 and out[5]["text_kept"] == (
        "repeated inside\nrepeated inside\nunique gamma"
    )


def test_line_dedup_min_docs_threshold(spark):
    docs = spark.createDataFrame(
        [(1, "shared\na1"), (2, "shared\nb1"), (3, "shared\nc1")],
        "doc_id long, text string",
    )
    segs = tx.segment_lines(docs, "doc_id", "text")
    loose = {r["doc_id"]: r for r in tx.line_dedup(segs, min_docs=4).collect()}
    assert all(loose[i]["n_kept"] == 2 for i in (1, 2, 3))  # below threshold
    tight = {r["doc_id"]: r for r in tx.line_dedup(segs, min_docs=3).collect()}
    assert all(tight[i]["n_kept"] == 1 for i in (1, 2, 3))


def test_segment_lines_drops_blank_and_trailing(spark):
    """Blank/trailing lines must not become corpus-wide dedupable ''
    boilerplate (ADVICE r2); positions keep original indices."""
    docs = spark.createDataFrame(
        [(1, "a\n\nb\n"), (2, "c\n\n")], "doc_id long, text string"
    )
    segs = tx.segment_lines(docs, "doc_id", "text")
    got = {(r["doc_id"], r["seg_idx"], r["seg"]) for r in segs.collect()}
    assert got == {(1, 0, "a"), (1, 2, "b"), (2, 0, "c")}
    # opt-out keeps the raw split
    raw = tx.segment_lines(docs, "doc_id", "text", drop_empty=False)
    assert raw.count() == 7


def test_line_dedup_null_segs_consistent(spark):
    """Null segs count toward neither n_segments nor n_kept, matching
    what array_join actually reassembles (ADVICE r2)."""
    segs = spark.createDataFrame(
        [(1, 0, "x"), (1, 1, None), (1, 2, "y")],
        "doc_id long, seg_idx int, seg string",
    )
    out = tx.line_dedup(segs).collect()[0]
    assert out["n_segments"] == 2
    assert out["n_kept"] == 2
    assert out["text_kept"] == "x\ny"


def test_vocab_build_ranking_and_min_count(spark):
    docs = spark.createDataFrame(
        [(1, "a b b c c c"), (2, "c b a a")], "doc_id long, text string"
    )
    got = {r["word"]: (r["count"], r["word_id"]) for r in
           tx.vocab_build(docs, "doc_id", "text").collect()}
    # counts: a=3, b=3, c=4 -> c rank 0; a before b on tie (word asc)
    assert got == {"c": (4, 0), "a": (3, 1), "b": (3, 2)}
    cut = {r["word"] for r in
           tx.vocab_build(docs, "doc_id", "text", min_count=4).collect()}
    assert cut == {"c"}


def test_tfidf_top_terms_hand_computed(spark):
    import math

    docs = spark.createDataFrame(
        [(1, "x x y"), (2, "y z")], "doc_id long, text string"
    )
    rows = tx.tfidf_top_terms(docs, "doc_id", "text", top=2).collect()
    got = {(r["doc_id"], r["word"]): r["tfidf"] for r in rows}
    idf = lambda df: math.log(3.0 / (df + 1)) + 1  # N=2 -> (N+1)=3
    assert got[(1, "x")] == pytest.approx(2 * idf(1))
    assert got[(1, "y")] == pytest.approx(1 * idf(2))
    assert got[(2, "z")] == pytest.approx(1 * idf(1))
    assert got[(2, "y")] == pytest.approx(1 * idf(2))


def test_bigram_logprob_hand_computed(spark):
    import math

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "solo")], "doc_id long, text string"
    )
    # bigrams: doc1 = ab, ba, ab; doc2 = ab. c(ab)=3, c(ba)=1, c(a.)=3, c(b.)=1
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_logprob"]) for r in
           tx.bigram_logprob_score(docs, "doc_id", "text").collect()}
    p_ab, p_ba = 3 / 3, 1 / 1  # p(b|a)=1, p(a|b)=1
    assert got[1] == (3, pytest.approx(round(
        (math.log(p_ab) * 2 + math.log(p_ba)) / 3, 6)))
    assert got[2] == (1, pytest.approx(round(math.log(p_ab), 6)))
    assert got[3] == (0, None)  # <2 words keeps a row, null score


def test_tokenize_to_ids_order_and_oov(spark):
    docs = spark.createDataFrame(
        [(1, "b a b zz"), (2, "a"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    # vocab min_count=2: a(2), b(2) -> ids by (count desc, word asc): a=0, b=1
    got = {r["doc_id"]: (r["n_tokens"], r["ids"]) for r in
           tx.tokenize_to_ids(docs, "doc_id", "text", min_count=2).collect()}
    assert got[1] == (4, [1, 0, 1, -1])  # order preserved, zz -> OOV
    assert got[2] == (1, [0])
    assert got[3] == (0, [])   # empty doc keeps a row
    assert got[4] == (0, [])   # null doc keeps a row
    # explicit external vocab wins over corpus-derived one
    vocab = spark.createDataFrame([("b", 7)], "word string, word_id long")
    got2 = {r["doc_id"]: r["ids"] for r in
            tx.tokenize_to_ids(docs, "doc_id", "text", vocab=vocab).collect()}
    assert got2[1] == [7, -1, 7, -1]


def test_unigram_logprob_restores_zero_token_docs(spark):
    """An empty/whitespace-only doc must come back as (n_words=0,
    avg_logprob=NULL) — mirroring bigram_logprob_score — not silently
    vanish from a quality-gating join."""
    df = spark.createDataFrame(
        [(1, "a b"), (2, "   "), (3, "")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: (r["n_words"], r["avg_logprob"])
        for r in tx.unigram_logprob_score(df, "doc_id", "text").collect()
    }
    assert set(rows) == {1, 2, 3}
    assert rows[2] == (0, None) and rows[3] == (0, None)
    assert rows[1][0] == 2 and rows[1][1] is not None


def test_chunk_overlap_no_contained_trailing_chunk(spark):
    """With overlap > 0 the last offset stops at len-overlap: no chunk
    that is a pure substring of its predecessor (duplicated training
    text)."""
    df = spark.createDataFrame(
        [(1, "abcde"), (2, "abcdef")], "id long, text string"
    )
    out = tx.chunk_text(df, "text", size=5, overlap=2)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r.id, []).append((r.chunk_idx, r.chunk))
    assert sorted(by_doc[1]) == [(0, "abcde")]            # no trailing 'de'
    assert sorted(by_doc[2]) == [(0, "abcde"), (1, "def")]

    toks = spark.createDataFrame(
        [(1, "t0 t1 t2 t3"), (2, "t0 t1 t2 t3 t4")], "id long, text string"
    )
    tout = tx.chunk_tokens(toks, "text", size=4, overlap=2)
    tb = {}
    for r in tout.collect():
        tb.setdefault(r.id, []).append((r.chunk_idx, r.chunk))
    assert sorted(tb[1]) == [(0, "t0 t1 t2 t3")]          # no 't2 t3' echo
    assert sorted(tb[2]) == [(0, "t0 t1 t2 t3"), (1, "t2 t3 t4")]


# ------------------------------------------------------- random projection


def test_random_project_preserves_pairwise_distances(spark):
    """JL lemma sanity on the real embeddings: squared distances after
    the 64->16 +/-1 projection stay within a generous multiplicative
    band for every sampled pair (eps ~ 1/sqrt(16) regime)."""
    import numpy as np

    from polars_fastx_spark.operators import vectors

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).limit(20)
    orig = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}
    proj = vectors.random_project(emb, "vec_id", "embedding", 64, 16)
    got = {}
    for r in proj.collect():
        got.setdefault(r.id, {})[r.j] = r.comp
    pv = {i: np.array([got[i][j] for j in range(16)]) for i in got}
    ids = sorted(orig)
    ratios = []
    for a in ids:
        for b in ids:
            if a >= b:
                continue
            d_o = float(np.sum((orig[a] - orig[b]) ** 2))
            d_p = float(np.sum((pv[a] - pv[b]) ** 2))
            ratios.append(d_p / d_o)
    assert len(ratios) == 190
    # per-pair distortion is chi^2_16/16-distributed: the worst of 190
    # pairs lands well inside [0.15, 2.5]; the bulk concentrates at 1
    assert min(ratios) > 0.15 and max(ratios) < 2.5, (min(ratios), max(ratios))
    assert 0.8 < float(np.median(ratios)) < 1.25, np.median(ratios)


def test_random_project_deterministic_and_salt_sensitive(spark):
    from polars_fastx_spark.operators import vectors

    emb = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0, 4.0])], "vec_id long, embedding array<double>"
    )
    a1 = {(r.j): r.comp for r in vectors.random_project(emb, "vec_id", "embedding", 4, 4).collect()}
    a2 = {(r.j): r.comp for r in vectors.random_project(emb, "vec_id", "embedding", 4, 4).collect()}
    b = {(r.j): r.comp for r in vectors.random_project(emb, "vec_id", "embedding", 4, 4, salt="other").collect()}
    assert a1 == a2
    assert a1 != b


def test_random_project_rejects_bad_dims(spark):
    import pytest as _pytest

    from polars_fastx_spark.operators import vectors

    emb = spark.createDataFrame([(0, [1.0])], "vec_id long, embedding array<double>")
    with _pytest.raises(ValueError):
        vectors.random_project(emb, "vec_id", "embedding", 1, 0)
