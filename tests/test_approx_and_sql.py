"""Approximation bounds (SURVEY.md §4.4.4) and the SQL entry surface."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct_error_bound(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    exact = li.select(F.countDistinct("l_partkey").alias("n")).first()["n"]
    approx = li.select(F.approx_count_distinct("l_partkey").alias("n")).first()["n"]
    assert abs(approx - exact) / exact < 0.05  # HLL++ rsd default 0.05


def test_percentile_approx_bounds(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    exact = li.select(F.median("l_extendedprice").alias("m")).first()["m"]
    approx = li.select(
        F.percentile_approx("l_extendedprice", 0.5, 10_000).alias("m")
    ).first()["m"]
    assert abs(approx - exact) / exact < 0.01


def test_sql_entry_surface(spark):
    """The whole engine is reachable via spark.sql over registered views
    (load_tables) — the second front door next to the DataFrame API."""
    from polars_fastx_spark.session import load_tables

    tables = load_tables(spark, SF)
    assert {"lineitem", "orders", "documents"} <= set(tables)
    row = spark.sql(
        """
        SELECT l_returnflag, count(*) AS n,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
        GROUP BY l_returnflag ORDER BY l_returnflag
        """
    ).first()
    assert row["n"] > 0 and row["revenue"] > 0
