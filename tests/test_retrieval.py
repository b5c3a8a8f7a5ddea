"""Unit tests for operators.retrieval.rrf_fuse (hybrid rank fusion)."""

from __future__ import annotations

import pytest

from polars_fastx_spark.operators.retrieval import rrf_fuse


def _fuse(spark, a_rows, b_rows, **kw):
    a = spark.createDataFrame(a_rows, "id long, s double")
    b = spark.createDataFrame(b_rows, "id long, s double")
    out = rrf_fuse([(a, "s"), (b, "s")], "id", **kw)
    return {r["id"]: (r["rrf"], r["n_sources"]) for r in out.collect()}


def test_rrf_exact_values(spark):
    # retriever A ranks: 1 (0.9), 2 (0.5); retriever B ranks: 2 (0.8), 3 (0.1)
    got = _fuse(spark, [(1, 0.9), (2, 0.5)], [(2, 0.8), (3, 0.1)], k=60)
    assert got[1] == (pytest.approx(1 / 61), 1)
    assert got[2] == (pytest.approx(1 / 62 + 1 / 61), 2)
    assert got[3] == (pytest.approx(1 / 62), 1)


def test_rrf_tie_breaks_by_id_ascending(spark):
    # equal scores: lower id must get the better (smaller) rank
    got = _fuse(spark, [(7, 1.0), (3, 1.0)], [], k=60)
    assert got[3][0] == pytest.approx(1 / 61)
    assert got[7][0] == pytest.approx(1 / 62)


def test_rrf_missing_from_one_retriever(spark):
    got = _fuse(spark, [(1, 0.9)], [(2, 0.9)], k=60)
    assert got[1] == (pytest.approx(1 / 61), 1)
    assert got[2] == (pytest.approx(1 / 61), 1)


def test_rrf_top_n_cut_drops_tail(spark):
    # doc 9 is rank 3 in A; with top_n=2 it must not surface at all
    got = _fuse(
        spark, [(1, 0.9), (2, 0.8), (9, 0.7)], [(1, 0.5)], top_n=2, k=60
    )
    assert 9 not in got
    assert got[1] == (pytest.approx(1 / 61 + 1 / 61), 2)


def test_rrf_requires_sources(spark):
    with pytest.raises(ValueError):
        rrf_fuse([], "id")


def test_rrf_deterministic_across_runs(spark):
    rows_a = [(i, float((i * 37) % 11)) for i in range(40)]
    rows_b = [(i, float((i * 13) % 7)) for i in range(10, 50)]
    g1 = _fuse(spark, rows_a, rows_b, top_n=25)
    g2 = _fuse(spark, rows_a, rows_b, top_n=25)
    assert g1 == g2


# ---------------------------------------------------------------- MMR


def _np_mmr(vecs, qid, pool_n, k, lam):
    """Brute-force greedy MMR in numpy — the independent reference the
    relational unrolling must reproduce decision-for-decision."""
    import numpy as np

    ids = sorted(vecs)
    q = np.asarray(vecs[qid], dtype=np.float64)

    def cos(a, b):
        return float(
            np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
        )

    rel = {
        i: round(cos(np.asarray(vecs[i], dtype=np.float64), q), 9)
        for i in ids
        if i != qid
    }
    pool = sorted(rel, key=lambda i: (-rel[i], i))[:pool_n]
    selected, out = [], []
    for r in range(1, k + 1):
        if r == 1:
            best = min(pool, key=lambda i: (-rel[i], i))
            score = rel[best]
        else:
            cand = [i for i in pool if i not in selected]
            if not cand:
                break

            def mmr(i):
                ms = max(
                    round(
                        cos(
                            np.asarray(vecs[i], dtype=np.float64),
                            np.asarray(vecs[s], dtype=np.float64),
                        ),
                        9,
                    )
                    for s in selected
                )
                return lam * rel[i] - (1.0 - lam) * ms

            best = min(cand, key=lambda i: (-mmr(i), i))
            score = mmr(best)
        selected.append(best)
        out.append((r, best, round(score, 6)))
    return out


def test_mmr_matches_numpy_greedy_reference(spark):
    """Relational unrolled greedy == brute-force numpy greedy on the
    real sf0.001 embeddings, both queries, full (rank, id, score)."""
    from polars_fastx_spark.operators.retrieval import mmr_rerank

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    vecs = {r.vec_id: list(r.embedding) for r in emb.collect()}
    got = {
        (r.query_id, r.rank): (r.vec_id, r.mmr_score)
        for r in mmr_rerank(
            emb, "vec_id", "embedding", [1, 2], pool_n=16, k=5, lam=0.7
        ).collect()
    }
    for qid in (1, 2):
        for rank, vid, score in _np_mmr(vecs, qid, 16, 5, 0.7):
            gvid, gscore = got[(qid, rank)]
            assert gvid == vid, (qid, rank, gvid, vid)
            assert gscore == pytest.approx(score, abs=2e-6), (qid, rank)


def test_mmr_rank1_is_pure_relevance_and_diversity_kicks_in(spark):
    """A pool with a near-duplicate of the most relevant item: rank 1
    is the argmax-relevance item; rank 2 must SKIP its near-duplicate
    (which pure relevance would pick) in favor of the diverse item."""
    from polars_fastx_spark.operators.retrieval import mmr_rerank

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),        # query
        (1, [0.99, 0.14, 0.0, 0.0]),      # most relevant
        (2, [0.98, 0.15, 0.01, 0.0]),     # near-dup of 1, 2nd by relevance
        (3, [0.7, 0.0, 0.71, 0.0]),       # diverse, 3rd by relevance
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = [
        (r.rank, r.vec_id)
        for r in mmr_rerank(
            emb, "vec_id", "embedding", [0], pool_n=3, k=3, lam=0.5
        )
        .orderBy("rank")
        .collect()
    ]
    assert got == [(1, 1), (2, 3), (3, 2)]


def test_mmr_pool_smaller_than_k_stops_early(spark):
    from polars_fastx_spark.operators.retrieval import mmr_rerank

    rows = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = mmr_rerank(emb, "vec_id", "embedding", [0], pool_n=5, k=5).collect()
    assert sorted(r.rank for r in out) == [1, 2]
    assert {r.vec_id for r in out} == {1, 2}


def test_mmr_rejects_bad_k(spark):
    from polars_fastx_spark.operators.retrieval import mmr_rerank

    emb = spark.createDataFrame([(0, [1.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        mmr_rerank(emb, "vec_id", "embedding", [0], k=0)
