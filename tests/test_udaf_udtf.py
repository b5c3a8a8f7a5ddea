"""X5/X6 — UDAF/UDTF mechanisms vs their pure-SQL twins.

The catalog oracle-checks the SQL twins against DuckDB; these tests
close the loop by proving the pandas/UDTF mechanisms compute the same
thing, so either path is safe to swap into a pipeline.
"""

from __future__ import annotations

import math

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
