"""Bucketing and salting (SURVEY.md §4.3) — correctness AND the plans
that justify them: a bucketed join must run with zero exchanges, a
salted join must spread a hot key without changing results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_fastx_spark import plans
from polars_fastx_spark.operators import partitioning as pt

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    pt.write_bucketed(orders, "b_orders", "o_orderkey", num_buckets=8,
                      sort_cols="o_orderkey")
    pt.write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", "o_orderkey", num_buckets=8, sort_cols="o_orderkey",
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_no_shuffle(spark, bucketed_tables):
    t1, t2 = bucketed_tables
    joined = (
        pt.read_bucketed(spark, t1)
        .join(pt.read_bucketed(spark, t2), "o_orderkey")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    # join needs no exchange (co-bucketed); only the groupBy shuffles
    assert plans.shuffle_count(joined) == 1
    # and results match the plain-parquet plan
    plain = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .join(
            spark.read.parquet(f"{SF}/lineitem.parquet").withColumnRenamed(
                "l_orderkey", "o_orderkey"
            ),
            "o_orderkey",
        )
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_matches_plain(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    # simulate pathological skew: 80% of rows on one key
    skewed = li.withColumn(
        "k", F.when(F.col("l_linenumber") <= 4, F.lit(0)).otherwise(F.col("l_partkey"))
    ).select("k", "l_quantity")
    dim = spark.range(0, 300).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    salted = pt.salted_join(skewed, dim, "k")
    plain = skewed.join(dim, "k")
    assert salted.count() == plain.count()
    a = salted.agg(F.round(F.sum(F.col("l_quantity") + F.col("v")), 2)).first()[0]
    b = plain.agg(F.round(F.sum(F.col("l_quantity") + F.col("v")), 2)).first()[0]
    assert a == b


def test_salted_agg_matches_plain(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    salted = {
        r["event_type"]: r["count"]
        for r in pt.salted_agg_count(ev, "event_type").collect()
    }
    plain = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert salted == plain


def test_concat_evolve_pads_missing_columns(spark):
    from polars_fastx_spark.operators.partitioning import concat_evolve

    a = spark.createDataFrame([(1, "x")], "id int, s string")
    b = spark.createDataFrame([(2, 3.5)], "id int, extra double")
    got = {r.id: (r.s, r.extra) for r in concat_evolve([a, b]).collect()}
    assert got == {1: ("x", None), 2: (None, 3.5)}
    import pytest
    with pytest.raises(ValueError):
        concat_evolve([])


def test_zorder_key_matches_python_reference(spark):
    from polars_fastx_spark.operators.partitioning import zorder_key

    rows = [(x, y) for x in (0, 1, 2, 3, 255, 65535) for y in (0, 1, 7, 65535)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {(r.x, r.y): r.z for r in
           df.select("x", "y", zorder_key("x", "y").alias("z")).collect()}

    def ref(x, y):
        z = 0
        for i in range(16):
            z += ((x >> i) & 1) << (2 * i)
            z += ((y >> i) & 1) << (2 * i + 1)
        return z

    for x, y in rows:
        assert got[(x, y)] == ref(x, y), (x, y)
    # locality: points in the same small quadrant sort together —
    # the whole reason to cluster files by this key
    assert got[(0, 0)] < got[(1, 1)] < got[(255, 7)] < got[(65535, 65535)]


def test_salted_join_rejects_right_replicating_types(spark):
    """Right/full outer would emit each unmatched right row once per
    salt — salted_join must refuse instead of silently duplicating."""
    import pytest

    df = spark.range(5).select(F.col("id").alias("k"))
    for how in ("right", "right_outer", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="unsound"):
            pt.salted_join(df, df, "k", how=how)
    # sound types still work
    assert pt.salted_join(df, df, "k", how="left_semi").count() == 5


def test_ensure_min_parallelism_spreads_underparallel_scan(spark):
    import polars_fastx_spark.operators.partitioning as pt

    one = spark.range(100).coalesce(1)
    spread = pt.ensure_min_parallelism(one)
    assert spread.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism
    assert spread.count() == 100


def test_ensure_min_parallelism_noop_when_already_parallel(spark):
    import polars_fastx_spark.operators.partitioning as pt

    target = spark.sparkContext.defaultParallelism
    wide = spark.range(1000).repartition(target + 4)
    out = pt.ensure_min_parallelism(wide)
    assert out is wide  # untouched frame, no extra shuffle node


def test_ensure_min_parallelism_passes_through_post_shuffle_frames(spark):
    """Multi-stage plans (any Exchange) must pass through untouched:
    df.rdd on them can materialize shuffle stages under AQE, and a
    post-shuffle frame already has shuffle-partitions parallelism."""
    import polars_fastx_spark.operators.partitioning as pt

    agg = spark.range(1000).groupBy((F.col("id") % 7).alias("k")).count()
    assert pt.ensure_min_parallelism(agg) is agg


def test_ensure_min_parallelism_repairs_broadcast_join_frames(spark, tmp_path):
    """A BroadcastExchange is NOT a shuffle: a 1-partition scan
    broadcast-joined to a dim still runs fused row-local stages on one
    task and must be repaired (the 'Exchange' substring false positive
    would skip it)."""
    import polars_fastx_spark.operators.partitioning as pt

    big = str(tmp_path / "big")
    spark.range(5000).selectExpr("id", "id % 7 AS k").coalesce(1).write.parquet(big)
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(7)], "k long, name string")
    joined = spark.read.parquet(big).join(F.broadcast(dim), "k")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan and joined.rdd.getNumPartitions() == 1
    out = pt.ensure_min_parallelism(joined)
    assert out.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism
    assert out.count() == 5000
