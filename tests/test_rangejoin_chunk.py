"""Binned range join + text chunking."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_fastx_spark import plans
from polars_fastx_spark.operators import text
from polars_fastx_spark.operators.rangejoin import point_in_interval_join


def test_binned_join_matches_naive_theta_join(spark):
    pts = spark.createDataFrame(
        [(i, v) for i, v in enumerate(range(0, 500, 7))], "pid int, p long"
    )
    ivs = spark.createDataFrame(
        [(1, 10, 50), (2, 49, 49), (3, 100, 101), (4, 95, 400), (5, 480, 1000)],
        "iid int, lo long, hi long",
    )
    got = {
        (r.pid, r.iid)
        for r in point_in_interval_join(pts, "p", ivs, "lo", "hi", 64).collect()
    }
    naive = {
        (r.pid, r.iid)
        for r in pts.join(
            ivs, (F.col("lo") <= F.col("p")) & (F.col("p") < F.col("hi"))
        ).collect()
    }
    assert got == naive and got  # non-empty, identical pair sets


def test_binned_join_boundary_semantics(spark):
    pts = spark.createDataFrame([(1, 64), (2, 128)], "pid int, p long")
    ivs = spark.createDataFrame(
        [(10, 64, 128)], "iid int, lo long, hi long"
    )  # lo and hi both on bin boundaries (width 64)
    got = {(r.pid, r.iid) for r in
           point_in_interval_join(pts, "p", ivs, "lo", "hi", 64).collect()}
    assert got == {(1, 10)}  # lo inclusive, hi exclusive


def test_binned_join_is_not_nested_loop(spark):
    pts = spark.createDataFrame([(1, 5)], "pid int, p long")
    ivs = spark.createDataFrame([(1, 0, 10)], "iid int, lo long, hi long")
    df = point_in_interval_join(pts, "p", ivs, "lo", "hi", 8)
    assert not plans.has_cartesian(df)


def test_chunk_reconstruction(spark):
    s = "".join(chr(97 + i % 26) for i in range(1000))
    df = spark.createDataFrame([(1, s), (2, ""), (3, "xy")], "id int, text string")
    out = text.chunk_text(df, "text", size=200, overlap=20)
    rows = sorted(
        ((r.id, r.chunk_idx, r.chunk) for r in out.collect())
    )
    by_doc = {}
    for i, idx, ch in rows:
        by_doc.setdefault(i, []).append((idx, ch))
    # overlap-stripped concatenation reproduces the document
    rebuilt = by_doc[1][0][1] + "".join(ch[20:] for _, ch in by_doc[1][1:])
    assert rebuilt == s
    assert [ch for _, ch in by_doc[2]] == [""]   # empty doc → one empty chunk
    assert [ch for _, ch in by_doc[3]] == ["xy"]
    # stride 180 over 1000 chars → offsets 1,181,...,901 → 6 chunks
    assert [idx for idx, _ in by_doc[1]] == list(range(6))


def test_chunk_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "abc")], "id int, text string")
    with pytest.raises(ValueError, match="overlap"):
        text.chunk_text(df, "text", size=10, overlap=10)


def test_chunk_tokens_windows_and_overlap(spark):
    words = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame(
        [(1, words), (2, "  "), (3, "a b")], "id int, text string"
    )
    out = text.chunk_tokens(df, "text", size=10, overlap=2)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r.id, []).append((r.chunk_idx, r.chunk))
    c1 = [ch.split(" ") for _, ch in sorted(by_doc[1])]
    assert all(len(c) == 10 for c in c1[:-1])
    assert c1[0][:2] == ["w0", "w1"] and c1[1][:2] == ["w8", "w9"]  # stride 8
    # reconstruction: strip the 2-token overlap from each later chunk
    rebuilt = c1[0] + [t for c in c1[1:] for t in c[2:]]
    assert rebuilt == words.split(" ")
    assert sorted(by_doc[2]) == [(0, "")]   # whitespace-only doc kept
    assert sorted(by_doc[3]) == [(0, "a b")]


def test_group_centroids_elementwise_mean(spark):
    from polars_fastx_spark.operators.vectors import group_centroids

    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (0, [3.0, 6.0]), (1, [10.0, 0.0])],
        "label int, embedding array<double>",
    )
    got = {r.label: r.centroid for r in
           group_centroids(df, ["label"], "embedding").collect()}
    assert got == {0: [2.0, 4.0], 1: [10.0, 0.0]}


def test_kmeans_recovers_separated_clusters(spark):
    from polars_fastx_spark.operators.vectors import kmeans

    rows = []
    for i in range(30):
        rows.append((i, [0.0 + (i % 5) * 0.01, 0.0]))          # cluster at ~0
        rows.append((100 + i, [10.0 + (i % 5) * 0.01, 10.0]))  # cluster at ~10
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assigned, cents = kmeans(df, "vec_id", "embedding", k=2, iterations=5)
    labels = {r.vec_id: r.cluster for r in assigned.collect()}
    lo = {labels[i] for i in range(30)}
    hi = {labels[100 + i] for i in range(30)}
    assert len(lo) == 1 and len(hi) == 1 and lo != hi  # perfectly separated
    means = sorted(round(c[0]) for c in cents)
    assert means == [0, 10]
    # determinism: content-addressed seeding → identical rerun
    assigned2, cents2 = kmeans(df, "vec_id", "embedding", k=2, iterations=5)
    assert cents == cents2


def test_kmeans_empty_cluster_keeps_seed(spark):
    from polars_fastx_spark.operators.vectors import kmeans

    # 3 centroids over 2 distinct points: one cluster must starve and
    # retain its seed instead of crashing or collapsing to NaN
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [0.0, 0.0]), (3, [9.0, 9.0])],
        "vec_id long, embedding array<double>",
    )
    assigned, cents = kmeans(df, "vec_id", "embedding", k=3, iterations=3)
    assert len(cents) == 3
    assert all(all(x == x for x in c) for c in cents)  # no NaNs
    assert assigned.count() == 3


def test_binned_range_join_exact_beyond_double_precision(spark):
    """Epoch-ns magnitudes (~1.7e18 > 2^53): double division rounds the
    bin, silently dropping genuinely-contained matches — bin math must
    be exact integer floor division."""
    from polars_fastx_spark.operators.rangejoin import point_in_interval_join

    base = 1_700_000_000_000_000_000
    pts = spark.createDataFrame(
        [(base + 1,), (base + 999,), (base + 1001,)], "p long"
    )
    iv = spark.createDataFrame(
        [(base, base + 1000, "w1")], "lo long, hi long, tag string"
    )
    got = sorted(
        r["p"]
        for r in point_in_interval_join(pts, "p", iv, "lo", "hi", 128).collect()
    )
    assert got == [base + 1, base + 999]
