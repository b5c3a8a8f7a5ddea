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


def test_lsh_collapse_identical_flood_is_linear(spark):
    """10k byte-identical docs through the DEFAULT candidate path must
    come back as n-1 star edges (O(n)), not an O(n²) band bucket."""
    from pyspark.sql import functions as F

    from polars_fastx_spark.operators.dedup import minhash_lsh_candidates

    docs = spark.range(10_000).select(
        F.col("id").alias("doc_id"),
        F.lit("identical document text flooding one LSH bucket").alias("text"),
    )
    pairs = minhash_lsh_candidates(docs, "doc_id", "text")
    assert pairs.count() == 9_999
    assert pairs.filter(F.col("id_a") != 0).count() == 0  # star on min id


def test_lsh_bucket_cap_near_identical_flood_is_linear(spark):
    """10k DISTINCT-but-near-identical docs (byte-different, so the
    exact-collapse guard can't see them) flood a handful of band
    buckets; with bucket_cap the candidate volume must stay O(n) —
    the uncapped all-pairs contract would emit tens of millions."""
    from pyspark.sql import functions as F

    from polars_fastx_spark.operators.dedup import minhash_lsh_candidates

    base = "shared near identical document body " * 3  # ~108 chars
    docs = spark.range(10_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(base), F.col("id").cast("string")).alias("text"),
    )
    pairs = minhash_lsh_candidates(
        docs, "doc_id", "text", family="perm", bucket_cap=8
    )
    n = pairs.count()
    # each of the 4 bands contributes at most one star edge per doc
    # plus all-pairs inside <=8-sized buckets
    assert n < 50_000, n


def test_lsh_bucket_cap_preserves_components(spark):
    """Capped and uncapped candidate sets induce the SAME connected
    components: a star over a bucket spans that bucket's clique."""
    from polars_fastx_spark.operators.dedup import minhash_lsh_candidates
    from polars_fastx_spark.operators.graph import connected_components

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    def comps(cap):
        pairs = minhash_lsh_candidates(
            docs, "doc_id", "text", collapse_exact=False, bucket_cap=cap
        )
        return {
            (r["node"], r["component"])
            for r in connected_components(pairs).collect()
        }

    uncapped = comps(None)
    assert uncapped == comps(2)  # tightest meaningful cap
    assert uncapped == comps(4)


def test_lsh_bucket_profile_accounts_for_every_band_row(spark):
    """Histogram invariant: Σ bucket_size · n_buckets = rows of the
    band table (= 4 bands × docs with ≥1 shingle)."""
    from pyspark.sql import functions as F

    from polars_fastx_spark.operators.dedup import (
        lsh_bucket_profile,
        minhash_band_table,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    prof = lsh_bucket_profile(docs, "doc_id", "text")
    total = prof.select(
        F.sum(F.col("bucket_size") * F.col("n_buckets"))
    ).collect()[0][0]
    assert total == minhash_band_table(docs, "doc_id", "text").count()


def test_lsh_collapse_preserves_components(spark):
    """Star-edge collapse and the classic all-pairs contract induce the
    SAME connected components (what every dedup consumer computes)."""
    from pyspark.sql import functions as F

    from polars_fastx_spark.operators.dedup import minhash_lsh_candidates
    from polars_fastx_spark.operators.graph import connected_components

    rows = []
    for i in range(8):  # 8 identical docs
        rows.append((i, "the quick brown fox jumps over the lazy dog " * 3))
    for i in range(8, 14):  # near-dups of the identical family
        rows.append((i, "the quick brown fox jumps over the lazy dog " * 3 + f"x{i % 2}"))
    for i in range(14, 30):  # unrelated distinct docs
        rows.append((i, f"completely different content number {i} " * 4))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def comps(collapse):
        pairs = minhash_lsh_candidates(
            docs, "doc_id", "text", collapse_exact=collapse
        )
        return {
            (r["node"], r["component"])
            for r in connected_components(pairs).collect()
        }

    assert comps(True) == comps(False)


def test_lsh_collapse_keeps_null_text_docs(spark):
    """NULL-text docs form ONE exact-dup group (SQL window semantics:
    PARTITION BY md5(text) groups NULLs); the collapse path must not
    silently drop them from the id map via a NULL-keyed equi-join."""
    from pyspark.sql import functions as F

    from polars_fastx_spark.operators.dedup import minhash_lsh_candidates

    rows = [(1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, None), (4, None), (5, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(docs, "doc_id", "text").collect()
    }
    assert (1, 2) in pairs          # exact-dup star
    assert (3, 4) in pairs and (3, 5) in pairs  # NULL group star


def test_shingle_less_docs_are_never_banded(spark):
    """Docs shorter than one shingle (or NULL) carry no LSH evidence:
    they must not share an empty-signature band key (which would pair
    every short doc with every other), matching the SQL oracles'
    WHERE length(text) >= k."""
    from polars_fastx_spark.operators.dedup import (
        minhash_band_table,
        minhash_lsh_candidates,
    )

    rows = [(1, "abc"), (2, "xy"), (3, None), (4, ""),
            (5, "a long enough unrelated document body here")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    assert minhash_band_table(docs, "doc_id", "text").filter(
        "__id != 5"
    ).count() == 0
    pairs = minhash_lsh_candidates(
        docs, "doc_id", "text", collapse_exact=False
    ).collect()
    assert pairs == []  # no spurious short-doc cliques


def test_band_table_index_storage_roundtrip(spark, tmp_path):
    """The production dedup dataflow: the LSH band table persists to
    parquet PARTITIONED BY band, later batches read it back and dedup
    against it — results identical to the in-memory index, and a
    single-band probe prunes to that band's partition (scan, not
    full-index read)."""
    from pyspark.sql import functions as F

    from polars_fastx_spark.operators import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    old = docs.filter("doc_id < 35")
    new = docs.filter("doc_id >= 35")

    idx_path = str(tmp_path / "band_index")
    dedup.minhash_band_table(old, "doc_id", "text").write.partitionBy(
        "band"
    ).parquet(idx_path)
    stored = spark.read.parquet(idx_path)

    nb = dedup.minhash_band_table(new, "doc_id", "text")
    from_storage = {
        (r["doc_id"], r["matched_id"])
        for r in dedup.minhash_lsh_candidates_between(nb, stored).collect()
    }
    in_memory = {
        (r["doc_id"], r["matched_id"])
        for r in dedup.minhash_lsh_candidates_between(
            nb, dedup.minhash_band_table(old, "doc_id", "text")
        ).collect()
    }
    assert from_storage == in_memory

    # partition pruning: a one-band probe must carry the band predicate
    # as a PARTITION filter (directory pruning), not a data filter
    probe = stored.filter(F.col("band") == 2)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "band" in pf and pf.strip(), pf


def test_neardup_gate_drops_index_neighbors_keeps_novel(spark):
    """Per-document gating against a persisted band index: a
    near-duplicate of an indexed doc is dropped, a novel doc passes,
    and a shingle-less doc (no LSH evidence) passes; keep_hits=True
    inverts the routing exactly."""
    from polars_fastx_spark.operators import dedup

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "completely unrelated corpus document about spark plans"),
        ],
        "doc_id long, text string",
    )
    index = dedup.minhash_band_table(corpus, "doc_id", "text")
    batch = spark.createDataFrame(
        [
            # near-dup of doc 1 (one-word edit)
            (10, "the quick brown fox jumps over the lazy cat tonight"),
            # novel content
            (11, "nothing like anything the corpus has ever contained zzz"),
            # shingle-less (shorter than k=5)
            (12, "abc"),
        ],
        "doc_id long, text string",
    )
    kept = {
        r.doc_id
        for r in dedup.neardup_gate(batch, index, "doc_id", "text").collect()
    }
    assert 10 not in kept and {11, 12} <= kept
    hits = {
        r.doc_id
        for r in dedup.neardup_gate(
            batch, index, "doc_id", "text", keep_hits=True
        ).collect()
    }
    assert hits == {10}


# ----------------------------------------------------- containment (L2)

def _py_shingles(text, k=8):
    return {text[i : i + k] for i in range(len(text) - k + 1)}


def test_containment_detects_quotation_jaccard_misses(spark):
    """The motivating asymmetric case: a short doc quoted verbatim
    inside a much longer one has containment 1.0 but Jaccard far below
    any LSH band threshold — Jaccard-tuned candidate generation
    structurally misses it, containment_pairs finds it."""
    quote = "the defendant stated on the record that the contract was void"
    host = (
        "opening remarks about procedure and jurisdiction went on at "
        "length before the transcript reached the key passage where "
        + quote
        + " and the court adjourned for further deliberation on costs "
        "and the schedule of the remaining witnesses for the week"
    )
    rows = [(1, quote), (2, host), (3, "entirely unrelated filler text "
            "about gardening tools and seasonal vegetable planting")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["id_a"], r["id_b"]): r
        for r in dedup.containment_pairs(
            df, "doc_id", "text", k=8, threshold=0.9
        ).collect()
    }
    assert (1, 2) in got and len(got) == 1
    r = got[(1, 2)]
    assert r["containment_a_in_b"] == 1.0  # quote fully inside host
    jac = r["common"] / (r["size_a"] + r["size_b"] - r["common"])
    assert jac < 0.35  # symmetric similarity can't see this pair
    # and indeed Jaccard-tuned LSH (deterministic md5 family) misses it
    lsh = {
        (p["id_a"], p["id_b"])
        for p in dedup.minhash_lsh_candidates(df, "doc_id", "text").collect()
    }
    assert (1, 2) not in lsh


def test_containment_matches_python_reference(spark):
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "beta gamma delta epsilon zeta eta theta iota kappa lambda mu",
        "completely different content with no overlap whatsoever here",
        "alpha beta gamma delta",
        "zeta eta theta iota kappa lambda mu nu xi omicron pi rho",
    ]
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        (r["id_a"], r["id_b"]): (
            r["common"], r["size_a"], r["size_b"],
            r["containment_a_in_b"], r["containment_b_in_a"],
        )
        for r in dedup.containment_pairs(
            df, "doc_id", "text", k=8, threshold=0.0
        ).collect()
    }
    want = {}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            sa, sb = _py_shingles(texts[a]), _py_shingles(texts[b])
            c = len(sa & sb)
            if c:
                want[(a, b)] = (c, len(sa), len(sb), c / len(sa), c / len(sb))
    assert got == want


def test_containment_fractional_cap_equals_absolute(spark):
    rows = [(i, f"shared prefix words here doc {i} " + "tail " * (i + 1))
            for i in range(8)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    frac = dedup.containment_pairs(
        df, "doc_id", "text", k=8, threshold=0.0, max_shingle_df=0.875
    ).collect()
    absolute = dedup.containment_pairs(
        df, "doc_id", "text", k=8, threshold=0.0, max_shingle_df=7
    ).collect()
    assert sorted(map(tuple, frac)) == sorted(map(tuple, absolute))
    assert frac  # the cap left evidence: the comparison is not vacuous


def test_containment_cap_only_removes_evidence(spark):
    """The df cut is recall-only: capped containment is a lower bound
    pairwise, and the capped pair set is a subset of the uncapped."""
    rows = [(i, "very common boilerplate header line " + f"unique body {i} "
            + "more unique trailing content number " + str(i) * 3)
            for i in range(6)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    full = {
        (r["id_a"], r["id_b"]): r["max_containment"]
        for r in dedup.containment_pairs(
            df, "doc_id", "text", k=8, threshold=0.0
        ).collect()
    }
    capped = {
        (r["id_a"], r["id_b"]): r["max_containment"]
        for r in dedup.containment_pairs(
            df, "doc_id", "text", k=8, threshold=0.0, max_shingle_df=3
        ).collect()
    }
    assert set(capped) <= set(full)
    assert all(capped[p] <= full[p] for p in capped)
    assert capped != full  # the boilerplate shingles really were cut


def test_shingle_df_profile_accounts_for_every_posting(spark):
    rows = [(i, f"document number {i} with some shared words") for i in range(5)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    prof = dedup.shingle_df_profile(df, "doc_id", "text", k=8).collect()
    postings = dedup.shingle_postings(df, "doc_id", "text", k=8).count()
    assert sum(r["doc_freq"] * r["n_shingles"] for r in prof) == postings
    for r in prof:
        assert r["join_pairs"] == r["n_shingles"] * r["doc_freq"] * (r["doc_freq"] - 1) // 2


def test_containment_between_scores_planted_quote(spark):
    bench = spark.createDataFrame(
        [(100, "what is the boiling point of water at sea level exactly")],
        ["doc_id", "text"],
    )
    quoted = ("intro paragraph before the question section asks "
              "what is the boiling point of water at sea level exactly "
              "and then the article moves on to discuss altitude effects")
    corpus = spark.createDataFrame(
        [(1, quoted), (2, "totally unrelated prose about mountain trails")],
        ["doc_id", "text"],
    )
    got = {
        (r["corpus_id"], r["bench_id"]): r["containment"]
        for r in dedup.containment_pairs_between(
            corpus, bench, "doc_id", "text", k=8, threshold=0.25
        ).collect()
    }
    assert got == {(1, 100): 1.0}  # fully quoted; unrelated doc filtered


def test_containment_between_matches_python_reference(spark):
    btexts = {10: "alpha beta gamma delta epsilon", 11: "zeta eta theta iota"}
    ctexts = {0: "alpha beta gamma delta epsilon zeta eta theta iota",
              1: "beta gamma delta words and more words trailing on",
              2: "no shared material at all in this one honestly"}
    bench = spark.createDataFrame(list(btexts.items()), ["doc_id", "text"])
    corpus = spark.createDataFrame(list(ctexts.items()), ["doc_id", "text"])
    got = {
        (r["corpus_id"], r["bench_id"]): (r["common"], r["size_bench"], r["containment"])
        for r in dedup.containment_pairs_between(
            corpus, bench, "doc_id", "text", k=8, threshold=0.0
        ).collect()
    }
    want = {}
    for cid, ct in ctexts.items():
        for bid, bt in btexts.items():
            sb, sc = _py_shingles(bt), _py_shingles(ct)
            c = len(sb & sc)
            if c:
                want[(cid, bid)] = (c, len(sb), c / len(sb))
    assert got == want


def test_containment_hashed_shingles_match_strings(spark):
    """hash_shingles=True (8-byte join keys) is count-identical to the
    string-keyed path on both containment operators."""
    rows = [(i, f"shared prefix words here doc {i} " + "tail " * (i + 1))
            for i in range(8)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    a = sorted(tuple(r) for r in dedup.containment_pairs(
        df, "doc_id", "text", k=8, threshold=0.0, max_shingle_df=7
    ).collect())
    b = sorted(tuple(r) for r in dedup.containment_pairs(
        df, "doc_id", "text", k=8, threshold=0.0, max_shingle_df=7,
        hash_shingles=True,
    ).collect())
    assert a == b and a
    bench = spark.createDataFrame([(99, rows[3][1])], ["doc_id", "text"])
    c = sorted(tuple(r) for r in dedup.containment_pairs_between(
        df, bench, "doc_id", "text", k=8, threshold=0.5
    ).collect())
    d = sorted(tuple(r) for r in dedup.containment_pairs_between(
        df, bench, "doc_id", "text", k=8, threshold=0.5, hash_shingles=True
    ).collect())
    assert c == d and c


def test_containment_drop_decision_rules(spark):
    """Contained side drops; mutual containment drops the larger id;
    multi-host docs report their smallest dup_of."""
    pairs = spark.createDataFrame(
        [
            # a contained in b only -> drop a, dup_of b
            (1, 2, 10, 10, 40, 1.0, 0.25, 1.0),
            # b contained in a only -> drop b, dup_of a
            (3, 4, 10, 40, 10, 0.25, 1.0, 1.0),
            # mutual -> drop larger id (6), keep 5
            (5, 6, 10, 11, 10, 0.9, 1.0, 1.0),
            # doc 1 also contained in 9 -> dup_of stays min(2, 9) = 2
            (1, 9, 10, 10, 50, 1.0, 0.2, 1.0),
            # below threshold -> no decision
            (7, 8, 2, 40, 40, 0.05, 0.05, 0.05),
        ],
        "id_a long, id_b long, common long, size_a long, size_b long, "
        "containment_a_in_b double, containment_b_in_a double, "
        "max_containment double",
    )
    got = {
        r["doc_id"]: r["dup_of"]
        for r in dedup.containment_drop_decision(pairs, 0.5).collect()
    }
    assert got == {1: 2, 4: 3, 6: 5}
