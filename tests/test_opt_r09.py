"""Round-9 optimization pins — each optimization that changed an
operator's internals gets an equivalence test (optimized form ==
unoptimized form, value-level) and, where the win is a plan shape, a
plan pin so a regression that silently reverts it fails CI.

Covers: `_sort1` bounded presentation sorts, the `n=` sizing hint on
the blocked-gemm kNN, the `dim=` hint on PQ training/seeding, the
MinHash shingle let-binding, and the `_spine` explicit-width
repartition.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_fastx_spark import plans


def test_sort1_matches_global_orderby_and_drops_range_exchange(spark):
    """_sort1 (coalesce(1).sortWithinPartitions) must return the same
    rows in the same total order as a global orderBy, with the
    rangepartitioning Exchange (and its sampling job) gone."""
    from polars_fastx_spark.catalog import _sort1

    df = (
        spark.range(0, 1000)
        .withColumn("g", (F.col("id") % 7).cast("int"))
        .groupBy("g")
        .agg(F.sum("id").alias("s"), F.count("*").alias("n"))
    )
    expected = df.orderBy("g").collect()
    got = _sort1(df, "g")
    assert got.collect() == expected
    assert "rangepartitioning" not in plans.explain_str(got)
    assert "rangepartitioning" in plans.explain_str(df.orderBy("g"))


def _vec_table(spark, n, dim):
    """Deterministic (id, vec) rows — content-addressed, RNG-free."""
    rows = [
        (i, [float((i * 31 + j * 17) % 97) / 97.0 for j in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "id int, vec array<float>")


def test_cosine_topk_row_count_hint_is_identity(spark):
    """cosine_topk_numpy(n=<row count>) must equal the unhinted form:
    n only sizes the gemm blocks (it replaced a count() job on the
    critical path), never the result. An OVERestimate is documented
    safe too."""
    from polars_fastx_spark.operators.similarity import cosine_topk_numpy

    df = _vec_table(spark, 60, 8)

    def key(rows):
        return sorted((r[0], r[1], round(r[2], 9)) for r in rows)

    base = key(cosine_topk_numpy(df, "id", "vec", k=3).collect())
    hinted = key(cosine_topk_numpy(df, "id", "vec", k=3, n=60).collect())
    over = key(cosine_topk_numpy(df, "id", "vec", k=3, n=200).collect())
    assert hinted == base
    assert over == base


def test_pq_dim_hint_is_identity(spark):
    """pq_train/pq_seed_books with dim= (skips the one-row probe job)
    must produce byte-identical codebooks and codes."""
    from polars_fastx_spark.operators.vectors import pq_seed_books, pq_train

    df = _vec_table(spark, 40, 8)
    seeded = pq_seed_books(df, "id", "vec", m=2, k=4)
    seeded_hint = pq_seed_books(df, "id", "vec", m=2, k=4, dim=8)
    assert seeded == seeded_hint

    codes, books = pq_train(df, "id", "vec", m=2, k=4, iterations=2)
    codes_h, books_h = pq_train(
        df, "id", "vec", m=2, k=4, iterations=2, dim=8
    )
    assert books == books_h
    assert sorted(map(tuple, codes.collect())) == sorted(
        map(tuple, codes_h.collect())
    )


def test_minhash_shingle_binding_is_identity(spark):
    """The band build projects the shingle array into a named column
    before the 16 signature passes consume it (materialize once per
    row). A projection boundary must not change values: signatures
    computed over the bound column == signatures over the inline
    expression, for every family."""
    from polars_fastx_spark.operators.dedup import (
        char_shingles,
        minhash_signature,
    )

    df = spark.createDataFrame(
        [(i, f"document body {i} " + "abcdefgh"[i % 8] * (5 + i % 7))
         for i in range(50)],
        "id int, text string",
    ).filter(F.length("text") >= 5)

    for family in ("md5", "xxhash64", "perm"):
        inline = df.select(
            "id",
            minhash_signature(
                char_shingles("text", 5), 16, family
            ).alias("sig"),
        )
        bound = df.select(
            "id", char_shingles("text", 5).alias("__sh")
        ).select(
            "id", minhash_signature(F.col("__sh"), 16, family).alias("sig")
        )
        assert sorted(map(tuple, bound.collect())) == sorted(
            map(tuple, inline.collect())
        ), family


def test_band_table_plan_builds_shingles_once(spark):
    """Plan pin for the let-binding: the optimized band build carries
    exactly ONE array_distinct (the shingle construction) — inlined,
    each of the 16 array_min passes re-evaluated it (16 occurrences),
    the 4.15→2.64 s regression shape."""
    from polars_fastx_spark.operators.dedup import minhash_band_table

    df = spark.createDataFrame(
        [(i, f"some text body number {i}") for i in range(20)],
        "id int, text string",
    )
    bands = minhash_band_table(df, "id", "text")
    plan = plans.explain_str(bands)
    assert plan.count("array_distinct") == 1


def test_fuzzy_self_join_reuses_variant_exchange(spark):
    """Adjudication pin for the 'j_fuzzy2 self-join symmetry' item in
    OPTIMIZATION_r09.md: when both sides of the fuzzy join are the
    same column of the same table, the two variant-explode subplans
    are canonically equal (aliases cancel) and Spark ALREADY executes
    the O(len²/2) k=2 neighborhood fan-out once — the second side is a
    ReusedExchange (plans/r09/j_fuzzy2_before.txt node 20 → 18). A
    'build the neighborhood once' rewrite was implemented, produced a
    byte-identical physical plan, and was reverted. This pin fails if
    a future change breaks the canonical equality and silently doubles
    the fan-out stage."""
    from polars_fastx_spark.operators.fuzzyjoin import fuzzy_join_k2

    df = spark.createDataFrame(
        [(f"name{i:03d}",) for i in range(50)], "w string"
    )
    a = df.select(F.col("w").alias("wa"))
    b = df.select(F.col("w").alias("wb"))
    out = fuzzy_join_k2(a, b, "wa", "wb")
    out.collect()  # AQE materializes stage reuse in the final plan
    assert "ReusedExchange" in plans.explain_str(out)


def test_ngram_windows_tokenizes_once(spark):
    """The short-doc guard lives inside the let-bound window
    expression; the old df.filter(size(tokens(..)) >= n) form ran the
    whole tokenization a second time per row. Pin: exactly one
    tokenization (regexp_extract_all unit scan) in the plan, and
    short docs still contribute zero windows."""
    from polars_fastx_spark.operators.text import ngram_windows

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "too short"), (3, None)],
        "doc_id int, text string",
    )
    w = ngram_windows(df, n=3)
    assert plans.explain_str(w).count("regexp_extract_all") == 1
    got = w.collect()
    assert {r["doc_id"] for r in got} == {1}
    assert len(got) == 3  # 5 tokens, n=3 -> 3 windows


def test_span_removal_rebuild_only_touches_removal_docs(spark):
    """remove_duplicated_spans rebuilds text for TOUCHED docs only
    (semi-join against the removal set) — at corpus scale the token
    explode + rebuild shuffle is proportional to duplicated-span
    mass, not the corpus. Pins the LeftSemi in the plan and the exact
    old output semantics on every edge: untouched docs byte-identical
    (weird whitespace preserved), fully-removed docs '', null text
    untouched with 0 removed."""
    from polars_fastx_spark.operators.text import remove_duplicated_spans

    dup8 = "w1 w2 w3 w4 w5 w6 w7 w8"
    docs = spark.createDataFrame(
        [
            (1, f"{dup8} unique tail one"),   # owner (min id): untouched
            (2, f"{dup8} other tail here"),   # loses the span
            (3, "completely  unrelated\ttext body"),  # untouched, odd ws
            (4, dup8),                        # fully duplicated -> ''
            (5, None),                        # null text
            (6, "short doc"),                 # < n tokens
        ],
        "doc_id int, text string",
    )
    out = remove_duplicated_spans(docs, n=8, min_docs=2)
    assert "LeftSemi" in plans.explain_str(out)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["n_removed_tokens"] == 0
    assert rows[1]["text_clean"] == f"{dup8} unique tail one"
    assert rows[2]["n_removed_tokens"] == 8
    assert rows[2]["text_clean"] == "other tail here"
    assert rows[3]["n_removed_tokens"] == 0
    assert rows[3]["text_clean"] == "completely  unrelated\ttext body"
    assert rows[4]["n_removed_tokens"] == 8
    assert rows[4]["text_clean"] == ""
    assert rows[5]["n_removed_tokens"] == 0
    assert rows[5]["text_clean"] is None
    assert rows[6]["n_removed_tokens"] == 0
    assert rows[6]["text_clean"] == "short doc"


def test_containment_sizes_are_rowlocal(spark):
    """containment_pairs' per-doc set size is F.size of the (already
    distinct) shingle array — a row-local projection. The old
    postings.groupBy(__id).count() re-ran the whole shingle explode as
    its map side plus a full groupBy shuffle (the l_containment plan
    carried 3 explode executions; now 2). Pins the values (sizes ==
    len(distinct shingles), bigint), the pair set on a fixture with
    zero-shingle docs (short/null text must not disturb pairs), and
    the explode count in the plan."""
    from polars_fastx_spark.operators.dedup import containment_pairs

    host = "the quick brown fox jumps over the lazy dog repeatedly now"
    docs = spark.createDataFrame(
        [
            (1, host),
            (2, host[:30]),        # contained prefix
            (3, "completely different content lives here"),
            (4, "short"),          # < k chars -> zero shingles
            (5, None),             # null text -> zero shingles
        ],
        "doc_id int, text string",
    )
    out = containment_pairs(docs, "doc_id", "text", k=8, threshold=0.5)
    rows = out.collect()

    def shset(s):
        return {s[i : i + 8] for i in range(len(s) - 7)}

    texts = {1: host, 2: host[:30],
             3: "completely different content lives here"}
    assert {(r["id_a"], r["id_b"]) for r in rows} == {(1, 2)}
    r = rows[0]
    assert r["size_a"] == len(shset(texts[1]))
    assert r["size_b"] == len(shset(texts[2]))
    assert r["common"] == len(shset(texts[1]) & shset(texts[2]))
    assert dict(out.dtypes)["size_a"] == "bigint"  # count() parity
    # plan pin: postings + dfreq-map explodes only — no sizes explode.
    # Counted on the executed (final adaptive) plan so exchange reuse
    # is visible; the old sizes-by-groupBy form ran 3.
    capped = containment_pairs(
        docs, "doc_id", "text", k=8, threshold=0.5, max_shingle_df=0.9
    )
    capped.collect()
    final = plans.explain_str(capped, "simple").split("== Initial Plan ==")[0]
    assert final.count("Generate") == 2, final


def test_spine_explicit_repartition_survives_planning(spark):
    """The resample spine's spread repartition must stay in the plan:
    a width matching the child's hash partitioning is eliminated as
    redundant and AQE then coalesces the tiny bounds exchange to ~1
    task, serializing the explode + window passes (the 4.9 s vs 1.8 s
    regression). REPARTITION_BY_NUM is exempt from AQE coalescing."""
    from polars_fastx_spark.operators.resample import upsample_ffill

    df = spark.createDataFrame(
        [(u, b, float(u * 10 + b)) for u in range(5) for b in (0, 3, 9)],
        "user_id int, bucket int, v double",
    )
    out = upsample_ffill(df, "bucket", "user_id", ["v"])
    assert "REPARTITION_BY_NUM" in plans.explain_str(out)
    # and the spread width strictly exceeds the session shuffle width,
    # so Catalyst can never prove it redundant against the bounds agg
    width = 2 * max(
        spark.sparkContext.defaultParallelism,
        int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
    )
    shuffle_w = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    assert width > shuffle_w
