"""Data-quality expectations (operators/quality.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_fastx_spark import plans
from polars_fastx_spark.operators import quality as Q


def _df(spark):
    return spark.createDataFrame(
        [
            (1, "ok", 5.0),
            (2, "ok", 50.0),   # out of range
            (2, "bad", None),  # dup id, bad status, null value
            (4, None, 2.0),    # null status
        ],
        "id int, status string, v double",
    )


def test_check_counts_violations_per_rule(spark):
    got = {
        r.rule: r.n_violations
        for r in Q.check(
            _df(spark),
            [
                Q.not_null("status"),
                Q.unique("id"),
                Q.accepted_values("status", ["ok"]),
                Q.in_range("v", 0, 10),
                Q.matches("status", "^[a-z]+$"),
            ],
        ).collect()
    }
    assert got == {
        "not_null:status": 1,
        "unique:id": 1,
        "accepted_values:status": 2,  # 'bad' + null
        "in_range:v": 2,              # 50.0 + null
        "matches:status": 1,          # null fails; 'bad' matches ^[a-z]+$
    }


def test_rules_compile_to_single_scan(spark):
    df = _df(spark)
    checked = Q.check(
        df, [Q.not_null("status"), Q.in_range("v", 0, 10), Q.unique("id")]
    )
    # all rules fold into ONE aggregate over ONE read of the input —
    # the optimized logical plan has exactly one leaf
    s = checked._jdf.queryExecution().optimizedPlan().toString()
    leaves = [
        ln for ln in s.splitlines()
        if "LogicalRDD" in ln or "Relation" in ln or "LocalRelation" in ln
    ]
    assert len(leaves) == 1, leaves


def test_enforce_raises_with_failing_rules_only(spark):
    df = _df(spark)
    Q.enforce(df, [Q.not_null("id")])  # passes
    with pytest.raises(AssertionError, match="unique:id"):
        Q.enforce(df, [Q.unique("id")])


def test_observed_metrics_collected_during_single_action(spark, tmp_path):
    df = _df(spark)
    obs_df, obs = Q.observed(
        df,
        "writer",
        {
            "n_rows": F.count(F.lit(1)),
            "null_status": F.sum(F.when(F.col("status").isNull(), 1).otherwise(0)),
            "v_sum": F.sum("v"),
        },
    )
    obs_df.write.mode("overwrite").parquet(str(tmp_path / "out"))  # ONE action
    got = obs.get
    assert got["n_rows"] == 4 and got["null_status"] == 1
    assert abs(got["v_sum"] - 57.0) < 1e-9


# -------------------------------------------------------------- profile

def test_profile_counts_nulls_distincts_minmax(spark):
    from polars_fastx_spark.operators.quality import profile

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "b")], "x int, s string"
    )
    got = {r["col_name"]: r for r in profile(df).collect()}
    assert got["x"]["n_nulls"] == 1
    assert got["x"]["n_distinct"] == 2
    assert (got["x"]["min"], got["x"]["max"]) == ("1", "2")
    assert got["s"]["n_nulls"] == 1
    assert got["s"]["n_distinct"] == 2
    assert (got["s"]["min"], got["s"]["max"]) == ("a", "b")


def test_profile_column_subset_single_scan(spark):
    from polars_fastx_spark.operators.quality import profile

    df = spark.createDataFrame([(1, "a", 2.0)], "x int, s string, d double")
    out = profile(df, ["x", "d"])
    assert {r["col_name"] for r in out.collect()} == {"x", "d"}
    # one aggregate job over one scan: the plan has exactly one leaf scan
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") + plan.count("Relation") == 1


def test_profile_and_rules_survive_exotic_column_names(spark):
    """Column names with spaces, dashes, and dots must profile and
    check cleanly — no name-interpolated SQL text anywhere."""
    df = spark.createDataFrame(
        [(1, "x", 2.0), (2, None, 4.0)],
        ["my col", "a-b", "a.b"],
    )
    prof = {r.col_name: r for r in Q.profile(df).collect()}
    assert set(prof) == {"my col", "a-b", "a.b"}
    assert prof["a-b"].n_nulls == 1
    assert prof["my col"].n_distinct == 2
    assert prof["a.b"].min == "2.0" and prof["a.b"].max == "4.0"

    got = {
        r.rule: r.n_violations
        for r in Q.check(
            df,
            [
                Q.not_null("a-b"),
                Q.unique("my col"),
                Q.in_range("a.b", 0.0, 3.0),
            ],
        ).collect()
    }
    assert got["not_null:a-b"] == 1
    assert got["unique:my col"] == 0
    assert got["in_range:a.b"] == 1


def test_hashed_linear_score_hand_computed(spark):
    """Score equals a hand-computed sigmoid over the hashed bag; a
    repeated token counts twice; a zero-token doc scores sigmoid(bias)
    with 0 features."""
    import hashlib
    import math

    from polars_fastx_spark.operators import text as T

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % 256

    wmap = {bucket("good"): 2.0, bucket("bad"): -3.0}
    weights = spark.createDataFrame(
        [(b, w) for b, w in wmap.items()], "bucket long, weight double"
    )
    docs = spark.createDataFrame(
        [(1, "good good bad"), (2, "unseen words only"), (3, "   ")],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_features"], r["score"])
        for r in T.hashed_linear_score(
            docs, weights, num_buckets=256, n=1, bias=0.5
        ).collect()
    }
    sig = lambda z: 1.0 / (1.0 + math.exp(-z))
    # doc 1: 2*good + bad (unless an unseen token hash-collides with a
    # weighted bucket, impossible here by construction of wmap keys)
    z1 = 0.5 + 2 * 2.0 + (-3.0)
    assert got[1][0] == 3 and got[1][1] == pytest.approx(sig(z1), abs=1e-12)
    assert got[2][0] == 3 and got[2][1] == pytest.approx(
        sig(0.5 + sum(wmap.get(bucket(t), 0.0) for t in "unseen words only".split())),
        abs=1e-12,
    )
    assert got[3] == (0, pytest.approx(sig(0.5), abs=1e-12))
