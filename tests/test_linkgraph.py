"""operators/linkgraph.py — diff-driven incremental edge index +
pagerank warm start (operators/graph.py:init_ranks)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_fastx_spark.operators import linkgraph
from polars_fastx_spark.operators.diffing import snapshot_diff
from polars_fastx_spark.operators.graph import pagerank


def _edges(spark, rows):
    return spark.createDataFrame(
        rows, "page_key long, src string, dst string"
    )


def _live_set(spark, path):
    return {
        (r["__key"], r["src"], r["dst"])
        for r in linkgraph.live_edges(spark, path).collect()
    }


def test_build_and_live_roundtrip(spark, tmp_path):
    p = str(tmp_path / "lg")
    e = _edges(spark, [(1, "a", "b"), (1, "a", "c"), (2, "b", "c")])
    linkgraph.edge_index_build(e, p)
    assert _live_set(spark, p) == {
        (1, "a", "b"), (1, "a", "c"), (2, "b", "c"),
    }


def test_sync_equals_from_scratch(spark, tmp_path):
    """THE lane invariant: live edges after a diff-driven sync equal
    the edges extracted from the new release directly."""
    p = str(tmp_path / "lg")
    # page -> content; edges derive deterministically from content
    old_pages = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "page_key long, body string"
    )
    new_pages = spark.createDataFrame(
        [(2, "y"), (3, "z2"), (4, "w")], "page_key long, body string"
    )

    def edges_of(pages):
        return pages.select(
            "page_key",
            F.concat(F.lit("d"), F.col("page_key")).alias("src"),
            F.col("body").alias("dst"),
        )

    linkgraph.edge_index_build(edges_of(old_pages), p)
    d = snapshot_diff(old_pages, new_pages, ["page_key"])
    got = linkgraph.edge_index_sync(p, d, edges_of(new_pages))
    assert got == {"added": 1, "removed": 1, "changed": 1}
    want = {
        (r["page_key"], r["src"], r["dst"])
        for r in edges_of(new_pages).collect()
    }
    assert _live_set(spark, p) == want
    # idempotent re-sync: same release → no-op counts, same live set
    d2 = snapshot_diff(new_pages, new_pages, ["page_key"])
    got2 = linkgraph.edge_index_sync(p, d2, edges_of(new_pages))
    assert got2 == {"added": 0, "removed": 0, "changed": 0}
    assert _live_set(spark, p) == want


def test_tombstone_then_readd_revives(spark, tmp_path):
    p = str(tmp_path / "lg")
    linkgraph.edge_index_build(
        _edges(spark, [(1, "a", "b"), (2, "b", "c")]), p
    )
    linkgraph.edge_index_delete(
        spark, p, spark.createDataFrame([(1,)], "page_key long")
    )
    assert _live_set(spark, p) == {(2, "b", "c")}
    linkgraph.edge_index_add(_edges(spark, [(1, "a", "z")]), p)
    assert _live_set(spark, p) == {(2, "b", "c"), (1, "a", "z")}


def test_live_edges_empty_index_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="no committed"):
        linkgraph.live_edges(spark, str(tmp_path / "nothing"))


def test_pagerank_warm_start_same_fixed_point(spark):
    """Cold==warm parity: after a small edge delta, iterating from
    the previous release's ranks reaches the same fixed point as a
    cold uniform start (power iteration converges from any positive
    vector); the warm path needs FEWER rounds to get there."""
    e1 = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")],
        "src string, dst string",
    )
    e2 = e1.unionByName(
        spark.createDataFrame(
            [("e", "c"), ("c", "e")], "src string, dst string"
        )
    )
    prev = pagerank(e1, iterations=30)
    cold = {
        r["node"]: r["rank"] for r in pagerank(e2, iterations=40).collect()
    }
    warm = {
        r["node"]: r["rank"]
        for r in pagerank(e2, iterations=12, init_ranks=prev).collect()
    }
    assert set(cold) == set(warm)
    # same fixed point: 12 warm rounds land within power-iteration
    # tolerance (contraction ~0.85^12) of the 40-round answer
    for n in cold:
        assert abs(cold[n] - warm[n]) < 2e-5, n
    assert abs(sum(warm.values()) - 1.0) < 1e-9
    # and a SHORT cold run is NOT yet at the fixed point — the warm
    # start is what buys the early arrival
    cold12 = {
        r["node"]: r["rank"] for r in pagerank(e2, iterations=12).collect()
    }
    worst_cold = max(abs(cold[n] - cold12[n]) for n in cold)
    worst_warm = max(abs(cold[n] - warm[n]) for n in cold)
    assert worst_warm < worst_cold
