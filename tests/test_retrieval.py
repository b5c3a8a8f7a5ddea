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
