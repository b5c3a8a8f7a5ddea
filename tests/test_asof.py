"""As-of join strategies (J7) on a hand-built frame — every combination
of strategy × allow_exact_matches has a hand-computed expectation."""

from __future__ import annotations

import pytest

from polars_fastx_spark.operators.asof import join_asof

LEFT = [(1, 10, "a"), (1, 20, "b"), (2, 15, "c"), (3, 5, "d")]
RIGHT = [(1, 10, 100.0), (1, 18, 180.0), (2, 20, 200.0)]


@pytest.fixture()
def frames(spark):
    left = spark.createDataFrame(LEFT, ["k", "t", "tag"])
    right = spark.createDataFrame(RIGHT, ["k", "t", "v"])
    return left, right


def _run(left, right, **kw):
    rows = join_asof(left, right, on="t", by="k", **kw).collect()
    return {r["tag"]: r["v"] for r in rows}


def test_backward_exact(frames):
    left, right = frames
    assert _run(left, right) == {"a": 100.0, "b": 180.0, "c": None, "d": None}


def test_backward_strict(frames):
    left, right = frames
    # left (1,10) no longer matches right (1,10)
    assert _run(left, right, allow_exact_matches=False) == {
        "a": None, "b": 180.0, "c": None, "d": None,
    }


def test_forward_exact(frames):
    left, right = frames
    assert _run(left, right, strategy="forward") == {
        "a": 100.0,  # equal t matches
        "b": None,   # nothing at t >= 20 for k=1
        "c": 200.0,  # (2,20)
        "d": None,   # k=3 has no right rows
    }


def test_forward_strict(frames):
    left, right = frames
    assert _run(left, right, strategy="forward", allow_exact_matches=False) == {
        "a": 180.0,  # (1,10) excluded, next is (1,18)
        "b": None, "c": 200.0, "d": None,
    }


def test_nearest(frames):
    left, right = frames
    # b at t=20: backward (18, d=2) vs nothing forward -> 180
    # a at t=10: exact backward
    assert _run(left, right, strategy="nearest") == {
        "a": 100.0, "b": 180.0, "c": 200.0, "d": None,
    }


def test_nearest_tie_prefers_backward(spark):
    left = spark.createDataFrame([(1, 10, "x")], ["k", "t", "tag"])
    right = spark.createDataFrame([(1, 8, 8.0), (1, 12, 12.0)], ["k", "t", "v"])
    assert _run(left, right, strategy="nearest") == {"x": 8.0}


def test_column_collision_gets_suffix(frames):
    left, right = frames
    out = join_asof(left, right.withColumnRenamed("v", "tag"), on="t", by="k")
    assert "tag_right" in out.columns and "tag" in out.columns


def test_upsample_ffill_semantics(spark):
    """Gaps fill forward; buckets before the first observation of a
    value stay null; spine spans [min, max] per key."""
    from polars_fastx_spark.operators.resample import upsample_ffill

    df = spark.createDataFrame(
        [(1, 10, 1.0), (1, 13, 4.0), (2, 5, 9.0)],
        ["k", "day", "v"],
    )
    out = upsample_ffill(df, "day", "k", ["v"])
    rows = {(r["k"], r["day"]): r["v"] for r in out.collect()}
    assert rows == {
        (1, 10): 1.0, (1, 11): 1.0, (1, 12): 1.0, (1, 13): 4.0,
        (2, 5): 9.0,
    }


def test_asof_tolerance_nulls_distant_matches(spark):
    from polars_fastx_spark.operators.asof import join_asof

    left = spark.createDataFrame(
        [(1, 100), (1, 205), (1, 1000)], "k int, t long"
    )
    right = spark.createDataFrame(
        [(1, 90, "a"), (1, 200, "b")], "k int, t long, v string"
    )
    out = join_asof(left, right, on="t", by="k", tolerance=10)
    got = {r.t: r.v for r in out.collect()}
    # 100-90=10 within; 205-200=5 within; 1000-200=800 → nulled
    assert got == {100: "a", 205: "b", 1000: None}
    # without tolerance the distant match survives
    out2 = join_asof(left, right, on="t", by="k")
    assert {r.t: r.v for r in out2.collect()}[1000] == "b"


def test_upsample_interpolate_semantics(spark):
    from polars_fastx_spark.operators.resample import upsample_interpolate

    df = spark.createDataFrame(
        [(1, 0, 10.0), (1, 4, 18.0), (1, 6, None), (1, 8, 2.0),
         (2, 5, 7.0)],
        "k int, day int, v double",
    )
    out = upsample_interpolate(df, "day", "k", "v")
    got = {(r.k, r.day): r.v for r in out.collect()}
    assert got[(1, 1)] == 12.0 and got[(1, 2)] == 14.0 and got[(1, 3)] == 16.0
    assert got[(1, 5)] == 14.0  # between 18 (day 4) and 2 (day 8)
    assert got[(1, 6)] == 10.0  # explicit null row interpolates too
    assert got[(1, 4)] == 18.0 and got[(1, 8)] == 2.0  # observations kept
    assert got[(2, 5)] == 7.0  # single-point key: no gaps, value kept


def test_asof_duplicate_right_rows_deterministic(spark):
    """Two right rows at the same (key, on): the pick is pinned to the
    payload-struct max for backward (min for forward) — identical
    across repartitionings, not partition-sort luck."""
    from polars_fastx_spark.operators.asof import join_asof

    left = spark.createDataFrame([(1, 100)], "k long, t long")
    right_rows = [(1, 90, "a"), (1, 90, "b"), (1, 110, "y"), (1, 110, "z")]
    for nparts in (1, 3, 7):
        right = spark.createDataFrame(
            right_rows, "k long, t long, val string"
        ).repartition(nparts)
        b = join_asof(left, right, on="t", by="k").collect()[0]["val"]
        f = join_asof(left, right, on="t", by="k", strategy="forward").collect()[0]["val"]
        assert b == "b", (nparts, b)   # payload max at t=90
        assert f == "y", (nparts, f)   # payload min at t=110


def test_asof_payload_handles_exotic_column_names(spark):
    """Carried right columns with dots/spaces must survive the payload
    struct (no DDL string splicing)."""
    from polars_fastx_spark.operators.asof import join_asof

    left = spark.createDataFrame([(1, 100)], "k long, t long")
    right = spark.createDataFrame([(1, 90, 1.5)], "k long, t long, `price.usd` double")
    out = join_asof(left, right, on="t", by="k").collect()[0]
    assert out["price.usd"] == 1.5


def test_asof_random_differential_vs_pandas_merge_asof(spark):
    """Randomized differential against pandas.merge_asof — the
    industry-reference as-of implementation — across all three
    strategies, with and without tolerance, grouped by key, with
    duplicate timestamps on both sides and keys missing from either
    side. Tie/exact-match semantics must agree row-for-row."""
    import math
    import random

    import pandas as pd

    from polars_fastx_spark.operators.asof import join_asof

    rng = random.Random(20260815)
    left_rows = [
        (i, rng.choice(["a", "b", "c", "lonely"]), rng.randint(0, 100))
        for i in range(120)
    ]
    right_rows = [
        (rng.choice(["a", "b", "c", "roamer"]), rng.randint(0, 100), float(j))
        for j in range(80)
    ]
    ldf = spark.createDataFrame(left_rows, "lid long, k string, t long")
    rdf = spark.createDataFrame(right_rows, "k string, t long, payload double")

    lpd = pd.DataFrame(left_rows, columns=["lid", "k", "t"]).sort_values("t", kind="mergesort")
    rpd = (
        pd.DataFrame(right_rows, columns=["k", "t", "payload"])
        # pandas requires sorted 'on'; break timestamp ties by payload so
        # the picked row is deterministic on BOTH engines (the Spark
        # side's window orders the same way)
        .sort_values(["t", "payload"], kind="mergesort")
    )

    for strategy in ("backward", "forward", "nearest"):
        for tol in (None, 7):
            got = {
                r.lid: r.payload
                for r in join_asof(
                    ldf, rdf, on="t", by="k",
                    strategy=strategy, tolerance=tol,
                ).collect()
            }
            want_df = pd.merge_asof(
                lpd, rpd, on="t", by="k", direction=strategy,
                tolerance=tol,
            )
            want = dict(zip(want_df["lid"], want_df["payload"]))
            assert set(got) == set(want), strategy
            for lid in want:
                g, w = got[lid], want[lid]
                if w is None or (isinstance(w, float) and math.isnan(w)):
                    assert g is None, (strategy, tol, lid, g)
                else:
                    assert g == w, (strategy, tol, lid, g, w)
