"""MinHash LSH recall property (SURVEY.md §2.11 L2): exact duplicates
(Jaccard 1) are ALWAYS candidates — every band agrees — for both hash
families; near-identical docs are recalled with high probability."""

from __future__ import annotations

import pytest

from polars_fastx_spark.operators import dedup


@pytest.mark.parametrize("family", ["md5", "xxhash64", "perm"])
def test_exact_dups_always_candidates(spark, family):
    base = (
        "the quick brown fox jumps over the lazy dog and keeps running "
        "until the river bends past the old mill town"
    )
    rows = [(i, f"unrelated document number {i} " + "filler words " * i) for i in range(10)]
    rows += [(100, base), (101, base)]                     # exact dup pair
    rows += [(102, base + " extra"), (103, base + " bonus")]  # near dups of base
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_candidates(
            df, "doc_id", "text", family=family
        ).collect()
    }
    assert (100, 101) in pairs  # Jaccard 1 -> all bands agree, guaranteed
    # near dups: high-Jaccard pairs among {100,101,102,103} should appear
    near = {p for p in pairs if p[0] >= 100 and p[1] >= 100}
    assert len(near) >= 4


@pytest.mark.parametrize("family", ["md5", "xxhash64", "perm"])
def test_verification_stage_filters_false_positives(spark, family):
    rows = [(1, "aaaa bbbb cccc dddd eeee"), (2, "aaaa bbbb cccc dddd eeee"),
            (3, "zzzz yyyy xxxx wwww vvvv")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    cand = dedup.minhash_lsh_candidates(df, "doc_id", "text", family=family)
    verified = dedup.ngram_jaccard(cand, df, "doc_id", "text", k=5)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in verified.collect()}
    assert got.get((1, 2)) == 1.0
    assert all(j == 1.0 or j < 0.5 for j in got.values())


def test_incremental_lsh_equals_full_corpus_pass(spark):
    """The incremental path's contract: candidates for the new batch
    against (persisted old index + itself) must equal exactly the
    full-corpus LSH pairs that touch a new id."""
    from polars_fastx_spark.operators import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    old = docs.filter("doc_id < 35")
    new = docs.filter("doc_id >= 35")
    ob = dedup.minhash_band_table(old, "doc_id", "text")
    nb = dedup.minhash_band_table(new, "doc_id", "text")
    incr = {
        (r["doc_id"], r["matched_id"])
        for r in dedup.minhash_lsh_candidates_between(nb, ob).collect()
    }
    full = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_candidates(docs, "doc_id", "text").collect()
    }
    # full pairs are (lo, hi); incremental emits (new_doc, matched).
    want = set()
    for lo, hi in full:
        if hi >= 35:  # pair touches the new batch (lo<hi, so hi is new)
            want.add((hi, lo))
    assert incr == want
