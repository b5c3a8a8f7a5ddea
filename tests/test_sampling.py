"""Deterministic sampling & splits (operators/sampling.py).

Properties under test (the reasons this exists instead of df.sample):
stability across runs AND repartitionings, nesting of sample fractions,
disjoint+exhaustive split assignment, exact per-stratum caps, and the
top-of-bucket-space edge cases (fraction 0/1, the 'ffff' bucket).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_fastx_spark.operators import sampling


@pytest.fixture(scope="module")
def docs(spark, sf001):
    return spark.table("documents").select("doc_id", "lang").cache()


def _ids(df):
    return {r.doc_id for r in df.select("doc_id").collect()}


def test_sample_stable_across_runs_and_partitionings(docs):
    a = _ids(sampling.deterministic_sample(docs, "doc_id", 0.2, salt="x"))
    b = _ids(sampling.deterministic_sample(docs, "doc_id", 0.2, salt="x"))
    c = _ids(
        sampling.deterministic_sample(
            docs.repartition(17, "lang"), "doc_id", 0.2, salt="x"
        )
    )
    assert a == b == c
    n = docs.count()
    assert 0.1 * n < len(a) < 0.3 * n  # ~20% of 60 docs, loose band


def test_samples_nest_and_salts_decorrelate(docs):
    small = _ids(sampling.deterministic_sample(docs, "doc_id", 0.1, salt="x"))
    big = _ids(sampling.deterministic_sample(docs, "doc_id", 0.5, salt="x"))
    assert small <= big  # same salt → nested
    other = _ids(sampling.deterministic_sample(docs, "doc_id", 0.5, salt="y"))
    assert other != big  # different salt → a different carve


def test_sample_edge_fractions(docs):
    assert sampling.deterministic_sample(docs, "doc_id", 0.0).count() == 0
    assert sampling.deterministic_sample(docs, "doc_id", 1.0).count() == docs.count()
    # near-1 fractions must not hit the 5-char "10000" lexicographic trap
    n = sampling.deterministic_sample(docs, "doc_id", 0.9999).count()
    assert n >= docs.count() - 1


def test_assign_splits_disjoint_exhaustive(docs):
    out = sampling.assign_splits(docs, "doc_id", salt="s").cache()
    assert out.filter(F.col("split").isNull()).count() == 0
    counts = {r.split: r.n for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) <= {"train", "valid", "test"}
    assert sum(counts.values()) == docs.count()
    assert counts["train"] > counts.get("valid", 0)
    # membership is a pure function of the id: re-derive and compare
    again = sampling.assign_splits(docs, "doc_id", salt="s")
    assert (
        out.select("doc_id", "split")
        .exceptAll(again.select("doc_id", "split"))
        .count()
        == 0
    )


def test_assign_splits_custom_weights_and_top_bucket(spark):
    # ids dense enough that some md5 bucket lands >= 'e666'; a single
    # 100% split must claim every row (the .otherwise() path)
    df = spark.range(200).withColumnRenamed("id", "k")
    one = sampling.assign_splits(df, "k", weights={"all": 1.0})
    assert one.filter(F.col("split") == "all").count() == 200
    two = sampling.assign_splits(df, "k", weights={"a": 3, "b": 1})
    counts = {r.split: r.n for r in
              two.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert counts["a"] + counts["b"] == 200 and counts["a"] > counts["b"]


def test_stratified_take_caps_and_determinism(docs):
    out = sampling.stratified_take(docs, "lang", "doc_id", 5).cache()
    per = out.groupBy("lang").agg(F.count("*").alias("n"))
    assert per.filter(F.col("n") > 5).count() == 0
    # strata smaller than the cap keep all their rows
    sizes = {r.lang: r.n for r in
             docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = {r.lang: r.n for r in per.collect()}
    for lang, n in sizes.items():
        assert kept[lang] == min(n, 5)
    assert _ids(out) == _ids(sampling.stratified_take(docs, "lang", "doc_id", 5))


def test_sample_plan_is_filter_only(docs, spark):
    """The sample must stay a scan+filter — no exchange, no RNG node."""
    df = sampling.deterministic_sample(
        spark.read.parquet(
            str(spark.conf.get("spark.pfx.testdata", "/root/testdata/sf0.001"))
            + "/documents.parquet"
        ),
        "doc_id",
        0.25,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Sample" not in plan  # not Spark's RNG sampler


def test_stratified_sample_per_stratum_fractions(docs):
    out = sampling.stratified_sample(
        docs, "lang", "doc_id", {"en": 0.0}, default=1.0, salt="s"
    )
    kept = {r.lang for r in out.select("lang").distinct().collect()}
    assert "en" not in kept and len(kept) >= 1  # en fully dropped, rest whole
    n_other = docs.filter(F.col("lang") != "en").count()
    assert out.count() == n_other
    # fraction nests with the plain sampler at the same salt
    en = docs.filter(F.col("lang") == "en")
    a = _ids(sampling.stratified_sample(en, "lang", "doc_id", {"en": 0.3}, salt="s"))
    b = _ids(sampling.deterministic_sample(en, "doc_id", 0.3, salt="s"))
    assert a == b


def test_group_aware_splits_no_pair_straddles(docs, spark):
    """Every member of a near-dup component lands in the SAME split
    (the leakage guarantee), and docs outside any component match
    assign_splits exactly."""
    pairs = spark.createDataFrame(
        # two components: {1,2,3} (chain) and {10, 11}; rest untouched
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    out = sampling.group_aware_splits(docs, "doc_id", pairs).cache()
    split_of = {r.doc_id: r.split for r in out.collect()}
    rep_of = {r.doc_id: r.rep for r in out.collect()}
    assert split_of[1] == split_of[2] == split_of[3]
    assert split_of[10] == split_of[11]
    assert rep_of[1] == rep_of[2] == rep_of[3] == 1
    assert rep_of[10] == rep_of[11] == 10
    # out-of-component docs: identical to the plain per-id carve
    plain = {r.doc_id: r.split for r in
             sampling.assign_splits(docs, "doc_id").collect()}
    in_comp = {1, 2, 3, 10, 11}
    for doc_id, split in split_of.items():
        if doc_id not in in_comp:
            assert split == plain[doc_id], doc_id
    # disjoint + exhaustive: one split per doc, all docs present
    assert set(split_of) == _ids(docs)


def test_group_aware_splits_stable_across_runs(docs, spark):
    pairs = spark.createDataFrame([(4, 5), (5, 6)], "id_a long, id_b long")
    a = {(r.doc_id, r.split) for r in
         sampling.group_aware_splits(docs, "doc_id", pairs).collect()}
    b = {(r.doc_id, r.split) for r in
         sampling.group_aware_splits(
             docs.repartition(7), "doc_id", pairs).collect()}
    assert a == b


def test_group_aware_splits_max_iterations_passthrough(docs, spark):
    """A long chain needs iterations ~ diameter; the knob must reach
    connected_components (ADVICE r2)."""
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError):
        sampling.group_aware_splits(
            docs, "doc_id", chain, max_iterations=2
        ).collect()
    out = sampling.group_aware_splits(
        docs, "doc_id", chain, max_iterations=40
    )
    reps = {r.rep for r in out.filter(F.col("doc_id") <= 30).collect()}
    assert reps == {0}


def test_weighted_take_deterministic_and_filtered(docs, spark):
    base = spark.createDataFrame(
        [(i, float(1 + i % 7)) for i in range(200)]
        + [(900, 0.0), (901, -2.0), (902, None)],
        "doc_id long, w double",
    )
    a = sampling.weighted_take(base, "doc_id", "w", 50, salt="s")
    b = sampling.weighted_take(base.repartition(9), "doc_id", "w", 50, salt="s")
    ra = [(r.doc_id, r.priority_key) for r in a.collect()]
    rb = [(r.doc_id, r.priority_key) for r in b.collect()]
    assert ra == rb and len(ra) == 50
    picked = {i for i, _ in ra}
    assert picked.isdisjoint({900, 901, 902})  # non-positive/null weights out


def test_weighted_take_weight_proportional(spark):
    """A 50x-heavier item must be sampled far more often across salts."""
    base = spark.createDataFrame(
        [(0, 50.0)] + [(i, 1.0) for i in range(1, 101)],
        "doc_id long, w double",
    )
    hits = sum(
        any(r.doc_id == 0 for r in
            sampling.weighted_take(base, "doc_id", "w", 10, salt=str(s)).collect())
        for s in range(20)
    )
    assert hits >= 15  # inclusion prob ~ n*w/W ≈ 10*50/150 → capped near 1


def test_weighted_take_plans_as_take_ordered(docs, spark):
    df = sampling.weighted_take(docs, "doc_id", F.lit(1.0), 10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_quota_take_respects_per_group_quotas(docs, spark):
    quotas = spark.createDataFrame(
        [("en", 3), ("de", 1)], "lang string, quota long"
    )
    out = sampling.quota_take(docs, "lang", "doc_id", quotas, salt="q").cache()
    per = {r.lang: r.n for r in
           out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    sizes = {r.lang: r.n for r in
             docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert per.get("en", 0) == min(sizes.get("en", 0), 3)
    assert per.get("de", 0) == min(sizes.get("de", 0), 1)
    assert set(per) <= {"en", "de"}  # unlisted groups take nothing
    # deterministic across partitionings
    again = sampling.quota_take(
        docs.repartition(5), "lang", "doc_id", quotas, salt="q"
    )
    assert {r.doc_id for r in out.collect()} == {r.doc_id for r in again.collect()}
