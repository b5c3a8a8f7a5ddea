"""Snapshot diff (operators/diffing.py) + deterministic training-order
shuffle (operators/sampling.py:deterministic_shuffle)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_fastx_spark.operators import diffing, sampling


def _snaps(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, None, 40.0)],
        "id long, s string, v double",
    )
    new = spark.createDataFrame(
        [(2, "b", 20.0), (3, "c", 30.0), (4, None, 40.0), (5, "e", 50.0)],
        "id long, s string, v double",
    )
    return old, new


def test_diff_classifies_all_change_types(spark):
    old, new = _snaps(spark)
    got = {
        r["id"]: r["change_type"]
        for r in diffing.snapshot_diff(old, new, ["id"]).collect()
    }
    # 1 removed; 3 changed (NULL -> 30.0 IS a change, null-safe);
    # 2 and 4 unchanged (4's NULL==NULL does not count as a change);
    # 5 added
    assert got == {1: "removed", 3: "changed", 5: "added"}


def test_diff_old_new_payloads(spark):
    old, new = _snaps(spark)
    rows = {
        r["id"]: r
        for r in diffing.snapshot_diff(old, new, ["id"]).collect()
    }
    assert rows[5]["old_s"] is None and rows[5]["new_s"] == "e"
    assert rows[1]["old_v"] == 10.0 and rows[1]["new_v"] is None
    assert rows[3]["old_v"] is None and rows[3]["new_v"] == 30.0


def test_diff_include_unchanged_and_summary(spark):
    old, new = _snaps(spark)
    full = diffing.snapshot_diff(old, new, ["id"], include_unchanged=True)
    assert full.count() == 5
    summ = {
        r["change_type"]: r["n"]
        for r in diffing.snapshot_diff_summary(old, new, ["id"]).collect()
    }
    assert summ == {"added": 1, "removed": 1, "changed": 1, "unchanged": 2}


def test_diff_explicit_compare_cols_ignore_others(spark):
    old, new = _snaps(spark)
    got = {
        r["id"]: r["change_type"]
        for r in diffing.snapshot_diff(
            old, new, ["id"], compare_cols=["s"]
        ).collect()
    }
    # v differences invisible when only s is compared
    assert got == {1: "removed", 5: "added"}


def test_diff_missing_column_raises(spark):
    old, new = _snaps(spark)
    with pytest.raises(ValueError, match="absent"):
        diffing.snapshot_diff(
            old, new.drop("v"), ["id"], compare_cols=["s", "v"]
        )
    # default compare set narrows to the SHARED columns, no error
    assert (
        diffing.snapshot_diff(old, new.drop("v"), ["id"]).count() > 0
    )


def test_diff_plan_is_one_join_no_python(spark):
    old, new = _snaps(spark)
    plan = (
        diffing.snapshot_diff(old, new, ["id"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Join") >= 1


def test_deterministic_shuffle_reproducible_and_salted(spark):
    df = spark.range(500).withColumnRenamed("id", "doc_id")
    a = sampling.deterministic_shuffle(df, "doc_id", salt="e0", shards=16)
    b = sampling.deterministic_shuffle(df, "doc_id", salt="e0", shards=16)
    ra = [(r["shard"], r["shuffle_key"]) for r in a.orderBy("doc_id").collect()]
    rb = [(r["shard"], r["shuffle_key"]) for r in b.orderBy("doc_id").collect()]
    assert ra == rb  # same salt -> same permutation
    c = sampling.deterministic_shuffle(df, "doc_id", salt="e1", shards=16)
    rc = [(r["shard"], r["shuffle_key"]) for r in c.orderBy("doc_id").collect()]
    assert rc != ra  # different salt -> different permutation
    # shard is the key's own hex prefix, and every shard is hit
    one = a.filter(
        F.substring("shuffle_key", 1, 1) != F.col("shard")
    ).count()
    assert one == 0
    assert a.select("shard").distinct().count() == 16


def test_deterministic_shuffle_rejects_bad_shards(spark):
    df = spark.range(10).withColumnRenamed("id", "doc_id")
    for bad in (0, 10, 100, 65536 * 16):
        with pytest.raises(ValueError, match="power of 16"):
            sampling.deterministic_shuffle(df, "doc_id", shards=bad)


def _collected(df):
    return sorted(tuple(r) for r in df.collect())


def test_apply_diff_reconstructs_new(spark):
    old, new = _snaps(spark)
    d = diffing.snapshot_diff(old, new, ["id"])
    rec = diffing.apply_diff(old, d, ["id"])
    assert _collected(rec) == _collected(new.select("id", "s", "v"))


def test_invert_diff_rolls_back(spark):
    old, new = _snaps(spark)
    d = diffing.snapshot_diff(old, new, ["id"])
    back = diffing.apply_diff(new, diffing.invert_diff(d), ["id"])
    assert _collected(back) == _collected(old.select("id", "s", "v"))


def test_empty_diff_apply_is_identity(spark):
    old, _ = _snaps(spark)
    d = diffing.snapshot_diff(old, old, ["id"])
    assert d.count() == 0
    rec = diffing.apply_diff(old, d, ["id"])
    assert _collected(rec) == _collected(old.select("id", "s", "v"))


def test_apply_diff_null_key_roundtrip(spark):
    """Round-6 ADVICE regression: snapshot_diff is null-safe on keys,
    so apply_diff's anti-join must be too — a NULL-keyed removed/
    changed row must actually leave, or the old version survives
    alongside the new payload and the roundtrip invariant breaks."""
    old = spark.createDataFrame(
        [(None, "stale", 1.0), (1, "keep", 2.0), (2, "gone", 3.0)],
        "id long, s string, v double",
    )
    new = spark.createDataFrame(
        [(None, "fresh", 9.0), (1, "keep", 2.0)],
        "id long, s string, v double",
    )
    d = diffing.snapshot_diff(old, new, ["id"])
    got = {r["id"]: r["change_type"] for r in d.collect()}
    assert got == {None: "changed", 2: "removed"}

    def _rows(df):  # None-tolerant multiset compare
        return sorted((tuple(r) for r in df.collect()), key=repr)

    rec = diffing.apply_diff(old, d, ["id"])
    assert _rows(rec) == _rows(new.select("id", "s", "v"))
    # and the rollback leg holds with NULL keys too
    back = diffing.apply_diff(new, diffing.invert_diff(d), ["id"])
    assert _rows(back) == _rows(old.select("id", "s", "v"))


def test_apply_diff_does_not_force_broadcast(spark):
    """Round-6 ADVICE regression: the dead-key set can be corpus-sized
    on a major release; forcing a broadcast hint OOMs the driver at
    the 8GB hard limit. AQE may still choose to broadcast — the pin is
    on the HINT's absence in the analyzed plan."""
    old, new = _snaps(spark)
    d = diffing.snapshot_diff(old, new, ["id"])
    rec = diffing.apply_diff(old, d, ["id"])
    analyzed = rec._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed
