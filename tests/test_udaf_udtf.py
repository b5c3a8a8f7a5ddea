"""X5/X6 — UDAF/UDTF mechanisms vs their pure-SQL twins.

The catalog oracle-checks the SQL twins against DuckDB; these tests
close the loop by proving the pandas/UDTF mechanisms compute the same
thing, so either path is safe to swap into a pipeline.
"""

from __future__ import annotations

import math
import pytest

from pyspark.sql import functions as F

from polars_fastx_spark.operators import udaf, udtf

SF = "/root/testdata/sf0.001"


def test_grouped_agg_entropy_matches_sql(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    via_udf = {
        r["source"]: r["h"]
        for r in d.groupBy("source")
        .agg(udaf.shannon_entropy("lang").alias("h"))
        .collect()
    }
    via_sql = {
        r["source"]: r["entropy"]
        for r in udaf.entropy_by_group(d, "source", "lang").collect()
    }
    assert via_udf.keys() == via_sql.keys()
    for k in via_udf:
        assert math.isclose(via_udf[k], via_sql[k], abs_tol=1e-9), k


def test_applyinpandas_zscore_matches_window_sql(spark):
    c = spark.read.parquet(f"{SF}/customer.parquet")
    a = {
        r["c_custkey"]: r["zscore"]
        for r in udaf.zscore_by_group(c, "c_nationkey", "c_acctbal").collect()
    }
    b = {
        r["c_custkey"]: r["zscore"]
        for r in udaf.zscore_by_group_sql(c, "c_nationkey", "c_acctbal").collect()
    }
    assert a.keys() == b.keys()
    for k in a:
        if a[k] is None or b[k] is None:
            assert a[k] == b[k], k
        else:
            assert math.isclose(a[k], b[k], abs_tol=1e-9), k


def test_udtf_matches_sql_twin(spark):
    udtf.register_udtfs(spark)
    rows_udtf = spark.sql(
        "SELECT * FROM ngrams('ACGTACG', 3) ORDER BY pos"
    ).collect()
    assert [(r["ngram"], r["pos"]) for r in rows_udtf] == [
        ("ACG", 0), ("CGT", 1), ("GTA", 2), ("TAC", 3), ("ACG", 4),
    ]
    df = spark.createDataFrame([("ACGTACG",), ("AB",), (None,)], ["text"])
    rows_sql = (
        udtf.ngrams_sql(df, "text", 3)
        .select("ngram", "pos")
        .orderBy("pos", "ngram")
        .collect()
    )
    assert [(r["ngram"], r["pos"]) for r in rows_sql] == [
        ("ACG", 0), ("CGT", 1), ("GTA", 2), ("TAC", 3), ("ACG", 4),
    ]  # 'AB' too short and NULL text produce no rows


def test_lateral_join_udtf(spark):
    """UDTF in a LATERAL join — the SQL-surface row-generator shape."""
    udtf.register_udtfs(spark)
    spark.createDataFrame([(1, "AAC"), (2, "GG")], ["id", "t"]).createOrReplaceTempView(
        "tv"
    )
    got = spark.sql(
        "SELECT id, ngram FROM tv, LATERAL ngrams(t, 2) ORDER BY id, pos"
    ).collect()
    assert [(r["id"], r["ngram"]) for r in got] == [(1, "AA"), (1, "AC"), (2, "GG")]


def test_entropy_twins_agree_on_nulls(spark):
    """NULL is a missing observation for BOTH entropy paths: the SQL
    twin must not count it as a distribution category."""
    from polars_fastx_spark.operators import udaf

    df = spark.createDataFrame(
        [("g", "a"), ("g", "a"), ("g", None)], "grp string, v string"
    )
    sql_h = udaf.entropy_by_group(df, "grp", "v").collect()[0]["entropy"]
    udf_h = (
        df.groupBy("grp")
        .agg(udaf.shannon_entropy("v").alias("h"))
        .collect()[0]["h"]
    )
    assert sql_h == pytest.approx(0.0) and udf_h == pytest.approx(0.0)


def test_zscore_by_group_exotic_column_names(spark):
    from polars_fastx_spark.operators import udaf

    df = spark.createDataFrame(
        [("g", 1.0), ("g", 3.0)], ["grp id", "acct-bal"]
    )
    rows = udaf.zscore_by_group(df, "grp id", "acct-bal").collect()
    assert sorted(round(r["zscore"], 6) for r in rows) == [
        -0.707107, 0.707107,
    ]
