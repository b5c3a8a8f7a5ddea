"""Partition-overwrite MERGE (operators/upsert.py): only touched
partitions rewrite, latest version per key wins, replay is idempotent."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from polars_fastx_spark.operators import upsert


def _state(spark, path):
    return {
        (r.k, r.day): (r.v, r.ver)
        for r in spark.read.parquet(path).collect()
    }


def _files(path):
    return set(glob.glob(f"{path}/day=*/*.parquet"))


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k int, v string, ver int, day int")


def test_upsert_rewrites_only_touched_partitions(spark, tmp_path):
    path = str(tmp_path / "tgt")
    _mk(spark, [
        (1, "a", 1, 1), (2, "b", 1, 1),
        (3, "c", 1, 2),
        (4, "d", 1, 3),
    ]).write.partitionBy("day").parquet(path)
    before_untouched = {f for f in _files(path) if "day=1" not in f}

    touched = upsert.upsert_partitioned(
        spark, path,
        _mk(spark, [(1, "a2", 2, 1), (9, "new", 1, 1)]),
        key_cols=["k"], partition_col="day", order_col="ver",
    )
    assert touched == [1]
    after = _state(spark, path)
    assert after[(1, 1)] == ("a2", 2)       # updated
    assert after[(9, 1)] == ("new", 1)      # inserted
    assert after[(2, 1)] == ("b", 1)        # untouched key survives
    assert after[(3, 2)] == ("c", 1) and after[(4, 3)] == ("d", 1)
    # day=2 / day=3 files byte-identical (never read, never written)
    assert {f for f in _files(path) if "day=1" not in f} == before_untouched


def test_upsert_replay_is_idempotent_and_update_beats_tie(spark, tmp_path):
    path = str(tmp_path / "tgt")
    _mk(spark, [(1, "old", 5, 1)]).write.partitionBy("day").parquet(path)
    batch = _mk(spark, [(1, "tie", 5, 1)])  # same version as stored
    upsert.upsert_partitioned(spark, path, batch, ["k"], "day", "ver")
    assert _state(spark, path)[(1, 1)] == ("tie", 5)  # update wins ties
    upsert.upsert_partitioned(spark, path, batch, ["k"], "day", "ver")
    state = _state(spark, path)
    assert state == {(1, 1): ("tie", 5)}  # replay: same state, no dups


def test_upsert_multi_partition_batch(spark, tmp_path):
    path = str(tmp_path / "tgt")
    _mk(spark, [(1, "a", 1, 1), (2, "b", 1, 2)]).write.partitionBy(
        "day"
    ).parquet(path)
    touched = upsert.upsert_partitioned(
        spark, path,
        _mk(spark, [(1, "a2", 2, 1), (2, "b2", 2, 2), (3, "c", 1, 2)]),
        ["k"], "day", "ver",
    )
    assert sorted(touched) == [1, 2]
    assert _state(spark, path) == {
        (1, 1): ("a2", 2), (2, 2): ("b2", 2), (3, 2): ("c", 1),
    }


def test_latest_per_key_picks_max_order(spark):
    df = spark.createDataFrame(
        [(1, 1, "old"), (1, 3, "new"), (2, 5, "only"), (1, 2, "mid")],
        "k long, v long, payload string",
    )
    from polars_fastx_spark.operators.upsert import latest_per_key

    got = {(r.k, r.v, r.payload) for r in latest_per_key(df, ["k"], "v").collect()}
    assert got == {(1, 3, "new"), (2, 5, "only")}


# ------------------------------------------------------------- delete

def test_delete_keys_rewrites_only_touched_partitions(spark, tmp_path):
    from polars_fastx_spark.operators.upsert import delete_keys_partitioned

    path = str(tmp_path / "tbl")
    rows = [(i, f"p{i % 3}", i * 10) for i in range(30)]
    df = spark.createDataFrame(rows, "k long, part string, v long")
    df.write.partitionBy("part").parquet(path)

    import glob, os
    untouched_files = {
        f: os.path.getmtime(f) for f in glob.glob(f"{path}/part=p2/*.parquet")
    }

    keys = spark.createDataFrame([(3, "p0"), (7, "p1")], "k long, part string")
    touched = delete_keys_partitioned(spark, path, keys, ["k"], "part")
    assert sorted(touched) == ["p0", "p1"]

    back = spark.read.parquet(path)
    assert back.count() == 28
    assert back.filter(F.col("k").isin(3, 7)).count() == 0
    # untouched partition files are byte-identical (never rewritten)
    for f, mt in untouched_files.items():
        assert os.path.getmtime(f) == mt, f


def test_delete_keys_removes_fully_emptied_partition(spark, tmp_path):
    """Deleting EVERY key of a partition must remove it — dynamic
    overwrite alone would silently leave the old files on disk."""
    from polars_fastx_spark.operators.upsert import delete_keys_partitioned

    path = str(tmp_path / "tbl3")
    spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "b", 40)],
        "k long, part string, v long",
    ).write.partitionBy("part").parquet(path)

    keys = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "k long, part string"
    )
    touched = delete_keys_partitioned(spark, path, keys, ["k"], "part")
    assert sorted(touched) == ["a", "b"]

    back = spark.read.parquet(path)
    assert {(r.k, r.part) for r in back.collect()} == {(4, "b")}
    import os

    assert not os.path.exists(f"{path}/part=a")  # dir gone, not just empty


def test_delete_keys_emptying_every_partition(spark, tmp_path):
    from polars_fastx_spark.operators.upsert import delete_keys_partitioned

    path = str(tmp_path / "tbl4")
    spark.createDataFrame(
        [(1, "a", 1), (2, "b", 2)], "k long, part string, v long"
    ).write.partitionBy("part").parquet(path)
    keys = spark.createDataFrame([(1, "a"), (2, "b")], "k long, part string")
    delete_keys_partitioned(spark, path, keys, ["k"], "part")
    import glob as _g

    # every partition directory removed (a schema-less read of the now
    # data-free root would raise, so assert on the filesystem directly)
    assert _g.glob(f"{path}/part=*") == []


def test_delete_keys_idempotent_replay(spark, tmp_path):
    from polars_fastx_spark.operators.upsert import delete_keys_partitioned

    path = str(tmp_path / "tbl2")
    spark.createDataFrame(
        [(i, "a" if i < 5 else "b", i) for i in range(10)],
        "k long, part string, v long",
    ).write.partitionBy("part").parquet(path)
    keys = spark.createDataFrame([(1, "a"), (9, "b")], "k long, part string")
    delete_keys_partitioned(spark, path, keys, ["k"], "part")
    delete_keys_partitioned(spark, path, keys, ["k"], "part")  # replay
    got = sorted(r["k"] for r in spark.read.parquet(path).collect())
    assert got == [0, 2, 3, 4, 5, 6, 7, 8]
