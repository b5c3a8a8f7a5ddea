"""EWMA + hierarchical rollup (operators/timeseries.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from polars_fastx_spark.operators import timeseries


@pytest.fixture(scope="module")
def events(spark, sf001):
    return spark.table("events")


def test_ewma_matches_reference_recursion(spark, events):
    out = timeseries.ewma(
        events, "value", ["ts", "event_id"], "user_id", alpha=0.2
    )
    got = {
        r.event_id: r.ewma
        for r in out.select("event_id", "ewma").collect()
    }
    rows = sorted(
        events.select("user_id", "ts", "event_id", "value").collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    acc, prev_user = None, object()
    for r in rows:
        if r.user_id != prev_user:
            acc, prev_user = r.value, r.user_id
        else:
            acc = 0.8 * acc + 0.2 * r.value
        assert math.isclose(got[r.event_id], acc, rel_tol=1e-12), r.event_id
    assert len(got) == len(rows)


def test_ewma_single_row_groups(spark):
    df = spark.createDataFrame(
        [(1, 1, 10.0), (2, 1, 20.0)], "k int, t int, v double"
    )
    out = timeseries.ewma(df, "v", ["t"], "k", alpha=0.5)
    vals = {r.k: r.ewma for r in out.collect()}
    assert vals == {1: 10.0, 2: 20.0}  # y_0 = x_0


def test_rollup_levels_agree_with_direct_aggregation(spark, events):
    e = events.withColumn("ts_us", F.expr("ts div 1000"))
    out = timeseries.hierarchical_rollup(
        e, "ts_us", ["event_type"], "value"
    ).cache()
    # each resolution partitions the events: total n conserved
    total = e.count()
    per_res = {
        r.resolution: r.n
        for r in out.groupBy("resolution").agg(F.sum("n").alias("n")).collect()
    }
    assert per_res == {"minute": total, "hour": total, "day": total}
    # staged day level == day aggregated straight from the raw fact
    day_direct = {
        (r.b, r.event_type): (r.n, round(r.s, 6))
        for r in e.groupBy(
            timeseries.time_bucket("ts_us", 86_400_000_000).alias("b"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    day_staged = {
        (r.bucket_us, r.event_type): (r.n, round(r.sum_value, 6))
        for r in out.filter(F.col("resolution") == "day").collect()
    }
    assert day_staged == day_direct


def test_rollup_rejects_non_nesting_widths(spark, events):
    e = events.withColumn("ts_us", F.expr("ts div 1000"))
    with pytest.raises(ValueError, match="nest"):
        timeseries.hierarchical_rollup(
            e, "ts_us", [], "value", {"a": 7, "b": 10}
        )


def test_backfill_rollup_day_touches_one_partition(spark, events, tmp_path):
    import glob

    from polars_fastx_spark.operators.timeseries import (
        backfill_rollup_day, time_bucket,
    )

    e = events.withColumn("ts_us", F.expr("ts div 1000"))
    out = str(tmp_path / "rollup")
    day_len = 86_400_000_000
    # seed: full two-resolution... (hourly) rollup partitioned by day
    base = (
        e.groupBy(
            time_bucket("ts_us", 3_600_000_000).alias("bucket_us"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .withColumn("day", (F.col("bucket_us") - F.col("bucket_us") % day_len))
    )
    base.write.partitionBy("day").parquet(out)
    days = sorted({r.day for r in base.select("day").distinct().collect()})
    target = days[1]
    other_files = {f for f in glob.glob(f"{out}/day=*/*.parquet")
                   if f"day={target}" not in f}

    backfill_rollup_day(
        spark, e, out, target, ["event_type"], "ts_us", "value"
    )
    # untouched partitions byte-identical; target partition still correct
    assert {f for f in glob.glob(f"{out}/day=*/*.parquet")
            if f"day={target}" not in f} == other_files
    got = (
        spark.read.parquet(out).filter(F.col("day") == target)
        .agg(F.sum("n").alias("n")).collect()[0].n
    )
    expect = e.filter(
        (F.col("ts_us") >= target) & (F.col("ts_us") < target + day_len)
    ).count()
    assert got == expect
    # replay: same state (idempotent)
    backfill_rollup_day(spark, e, out, target, ["event_type"], "ts_us", "value")
    got2 = (
        spark.read.parquet(out).filter(F.col("day") == target)
        .agg(F.sum("n").alias("n")).collect()[0].n
    )
    assert got2 == expect


def test_sessionize_gap_semantics(spark):
    df = spark.createDataFrame(
        [(1, 0, 1), (1, 10, 2), (1, 100, 3), (1, 105, 4), (2, 0, 5)],
        "k int, t long, eid int",
    )
    out = timeseries.sessionize(df, "t", "k", gap=30, tiebreak_cols=["eid"])
    got = {r.eid: r.session_id for r in out.collect()}
    # gap 0→10 within; 10→100 exceeds 30 → new session; 100→105 within
    assert got == {1: 0, 2: 0, 3: 1, 4: 1, 5: 0}
    # exactly-at-gap stays in the session (strict > starts a new one)
    df2 = spark.createDataFrame([(1, 0, 1), (1, 30, 2)], "k int, t long, eid int")
    got2 = {r.eid: r.session_id
            for r in timeseries.sessionize(df2, "t", "k", 30, tiebreak_cols=["eid"]).collect()}
    assert got2 == {1: 0, 2: 0}


def test_normalize_events_ts_is_timezone_independent(spark):
    """The ntz→ns conversion must not depend on the session timezone
    (ADVICE r2: a caller session with a non-UTC zone would shift ts)."""
    from polars_fastx_spark.session import normalize_events_ts

    df = spark.createDataFrame(
        [("2024-03-01 12:00:00",)], "raw string"
    ).select(F.col("raw").cast("timestamp_ntz").alias("ts"))
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        utc = normalize_events_ts(df).collect()[0]["ts"]
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        tokyo = normalize_events_ts(df).collect()[0]["ts"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert utc == tokyo == 1709294400 * 1_000_000_000


# --------------------------------------------------- interval islands

def test_merge_intervals_hand_case(spark):
    from polars_fastx_spark.operators.timeseries import merge_intervals

    rows = [
        ("u", 0, 10), ("u", 5, 12),    # overlap -> one island [0, 12]
        ("u", 12, 20),                  # touching -> merges (s == max_end)
        ("u", 30, 40),                  # gap -> new island
        ("v", 100, 110),                # other key untouched
    ]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = sorted(
        (r["k"], r["island_start"], r["island_end"], r["n_merged"])
        for r in merge_intervals(df, "k", "s", "e").collect()
    )
    assert got == [("u", 0, 20, 3), ("u", 30, 40, 1), ("v", 100, 110, 1)]


def test_merge_intervals_contained_interval(spark):
    from polars_fastx_spark.operators.timeseries import merge_intervals

    # an interval fully inside an earlier one must not split the island
    # even though its own end is smaller than the running max
    rows = [("u", 0, 100), ("u", 10, 20), ("u", 50, 120), ("u", 130, 140)]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = sorted(
        (r["island_start"], r["island_end"], r["n_merged"])
        for r in merge_intervals(df, "k", "s", "e").collect()
    )
    assert got == [(0, 120, 3), (130, 140, 1)]


def test_time_bucket_floor_semantics_pre_epoch(spark):
    """Negative (pre-1970) timestamps must floor to the bucket BELOW:
    Spark's % takes the dividend's sign, so c - c%w would bucket
    ts=-100 (w=60) at -60 instead of its floor bucket -120."""
    from polars_fastx_spark.operators.timeseries import time_bucket

    df = spark.createDataFrame(
        [(-100,), (-60,), (-1,), (0,), (59,), (60,)], "us long"
    )
    got = {
        r["us"]: r["b"]
        for r in df.select("us", time_bucket("us", 60).alias("b")).collect()
    }
    assert got == {-100: -120, -60: -60, -1: -60, 0: 0, 59: 0, 60: 60}


def test_mad_outlier_stats_keeps_null_group(spark):
    from polars_fastx_spark.operators.timeseries import mad_outlier_stats

    rows = [("a", 1.0), ("a", 2.0), ("a", 100.0),
            (None, 5.0), (None, 6.0), (None, 500.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r for r in mad_outlier_stats(df, "g", "v").collect()}
    assert set(out) == {"a", None}
    assert out[None]["n"] == 3 and out[None]["n_outliers"] == 1
