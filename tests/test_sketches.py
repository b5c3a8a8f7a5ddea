"""Mergeable-sketch tier (functions/sketches.py): merge-correctness
and published error bounds, since estimates can't hash-match a DuckDB
oracle built on different sketch implementations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_fastx_spark.functions import sketches


@pytest.fixture(scope="module")
def lineitem(spark, sf001):
    return spark.table("lineitem")


@pytest.fixture(scope="module")
def events(spark, sf001):
    return spark.table("events")


def test_topk_exact_mode_matches_group_counts(spark, lineitem):
    """maxItemsTracked ≥ NDV ⇒ the sketch degenerates to exact counts."""
    got = [r.cnt for r in sketches.top_k_counts(lineitem, "l_partkey", 10).collect()]
    exact = [
        r.cnt
        for r in lineitem.groupBy("l_partkey")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc())
        .limit(10)
        .collect()
    ]
    assert got == exact


def test_hll_union_of_shards_equals_direct_sketch(spark, events):
    """Register-wise max is order/partition-independent: estimating
    from merged daily partials must equal sketching the table whole."""
    day = F.expr("ts div 86400000000000")  # ns → day bucket
    partials = sketches.hll_partials(events, ["event_type"], "user_id", day)
    merged = {
        r.event_type: r.ndv_est
        for r in sketches.hll_merge(partials, ["event_type"]).collect()
    }
    direct = {
        r.event_type: r.ndv
        for r in events.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("ndv"))
        .collect()
    }
    assert merged == direct


def test_hll_estimate_within_error_bound(spark, events):
    """Default lgConfigK=12 HLL: relative error well under 5% at the
    cardinalities in play."""
    est = {
        r.event_type: r.ndv_est
        for r in sketches.hll_merge(
            sketches.hll_partials(
                events, ["event_type"], "user_id", F.lit(0)
            ),
            ["event_type"],
        ).collect()
    }
    exact = {
        r.event_type: r.ndv
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("ndv"))
        .collect()
    }
    for k, v in exact.items():
        assert abs(est[k] - v) / v < 0.05, (k, est[k], v)


def test_kll_quantile_within_rank_error(spark, lineitem):
    """KLL guarantees ~1.7% normalized RANK error: the returned q50 must
    sit between the exact 45th and 55th percentiles (generous 5%)."""
    got = sketches.kll_quantiles(lineitem, "l_extendedprice", [0.5]).collect()[0].q50
    lo, hi = (
        lineitem.agg(
            F.expr("percentile(l_extendedprice, 0.45)"),
            F.expr("percentile(l_extendedprice, 0.55)"),
        ).collect()[0]
    )
    assert lo <= got <= hi


def test_hll_exact_companion_keeps_null_group(spark, tmp_path):
    """x_sketch_hll_exact must emit the NULL event_type group its
    oracle's GROUP BY keeps — a plain equi-join would drop it."""
    import duckdb
    from pyspark.sql import functions as F

    from polars_fastx_spark.catalog import QUERIES

    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev = src.withColumn(
        "event_type",
        F.when(F.col("event_id") % 5 == 0, F.lit(None)).otherwise(
            F.col("event_type")
        ),
    )
    sf = str(tmp_path)
    ev.write.parquet(sf + "/events.parquet")

    spec = QUERIES["x_sketch_hll_exact"]
    got = spec.fn(spark, sf).collect()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS FROM read_parquet('{sf}/events.parquet/*.parquet')"
    )
    want = con.execute(spec.oracle).df()
    assert len(got) == len(want)
    assert any(r["event_type"] is None for r in got)
    by_key = {r["event_type"]: r["exact_ndv"] for r in got}
    for _, w in want.iterrows():
        key = None if w["event_type"] is None else w["event_type"]
        assert by_key[key] == w["exact_ndv"]


def test_kll_quantile_labels_not_truncated(spark):
    """int(0.57*100) == 56 under binary floats: labels must round, and
    nearby probs must not collide into duplicate column names."""
    df = spark.range(100).select(F.col("id").cast("double").alias("x"))
    out = sketches.kll_quantiles(df, "x", [0.29, 0.56, 0.57])
    assert out.columns == ["q29", "q56", "q57"]


def test_kmv_merge_of_shards_equals_direct_sketch(spark, lineitem):
    """Bottom-k of merged per-shard bottom-k sets == bottom-k of the
    whole table: any global bottom-k hash is in its shard's bottom-k,
    so sharding must not change a single retained hash."""
    k = 32
    direct = sketches.kmv_merge(
        sketches.kmv_partials(lineitem, "l_partkey", k, F.lit(0)), k
    )
    sharded = sketches.kmv_merge(
        sketches.kmv_partials(
            lineitem, "l_partkey", k, F.expr("l_orderkey % 7")
        ),
        k,
    )
    assert sorted(r.h for r in direct.collect()) == sorted(
        r.h for r in sharded.collect()
    )


def test_kmv_estimate_exact_below_k_and_bounded_above(spark, lineitem):
    """Unsaturated sketch (k > NDV) returns the exact distinct count;
    saturated sketch lands within 4x the KMV RSE of 1/sqrt(k-2)."""
    ndv = lineitem.agg(F.countDistinct("l_partkey")).collect()[0][0]
    big = sketches.kmv_estimate(
        sketches.kmv_merge(
            sketches.kmv_partials(lineitem, "l_partkey", 4096, F.lit(0)),
            4096,
        ),
        4096,
    ).collect()[0]
    assert big.ndv_est == ndv and big.theta == 1.0
    k = 64
    est = sketches.kmv_estimate(
        sketches.kmv_merge(
            sketches.kmv_partials(lineitem, "l_partkey", k, F.lit(0)), k
        ),
        k,
    ).collect()[0].ndv_est
    assert abs(est - ndv) / ndv < 4.0 / (k - 2) ** 0.5, (est, ndv)


def test_kmv_set_ops_track_exact_counts(spark, lineitem):
    """Union/intersection estimates over the tiny-order vs bulk-order
    part sets (overlapping but genuinely distinct) stay within loose
    multiplicative bounds of the exact answers (set-op error compounds;
    this pins sanity, the catalog query pins bit-exactness vs the
    oracle)."""
    k = 64
    in_a = F.col("l_quantity") <= 2
    in_b = F.col("l_quantity") >= 49
    shard = F.expr("l_orderkey % 5")
    ka = sketches.kmv_merge(
        sketches.kmv_partials(
            lineitem.filter(in_a), "l_partkey", k, shard
        ),
        k,
    )
    kb = sketches.kmv_merge(
        sketches.kmv_partials(
            lineitem.filter(in_b), "l_partkey", k, shard
        ),
        k,
    )
    union_est = sketches.kmv_estimate(
        sketches.kmv_union(ka, kb, k), k
    ).collect()[0].ndv_est
    inter_est = sketches.kmv_intersect_estimate(ka, kb, k).collect()[0]
    exact = (
        lineitem.filter(in_a | in_b)
        .groupBy("l_partkey")
        .agg(
            F.max(F.when(in_a, 1).otherwise(0)).alias("r"),
            F.max(F.when(in_b, 1).otherwise(0)).alias("a"),
        )
        .agg(
            F.count(F.lit(1)).alias("u"),
            F.sum(F.col("r") * F.col("a")).alias("i"),
        )
        .collect()[0]
    )
    assert 0.5 * exact.u <= union_est <= 2.0 * exact.u, (union_est, exact.u)
    assert 0.3 * exact.i <= inter_est.inter_est <= 3.0 * exact.i, (
        inter_est.inter_est, exact.i,
    )


def test_kmv_intersect_disjoint_is_zero(spark):
    """Disjoint domains share no hashes: the clipped common set is
    empty and the estimate must be exactly 0, never NULL."""
    a = spark.range(0, 500).select(F.concat(F.lit("a"), F.col("id")).alias("v"))
    b = spark.range(0, 500).select(F.concat(F.lit("b"), F.col("id")).alias("v"))
    k = 32
    ka = sketches.kmv_merge(sketches.kmv_partials(a, "v", k, F.lit(0)), k)
    kb = sketches.kmv_merge(sketches.kmv_partials(b, "v", k, F.lit(0)), k)
    row = sketches.kmv_intersect_estimate(ka, kb, k).collect()[0]
    assert row.n_common == 0 and row.inter_est == 0


def test_sketches_quote_exotic_column_names(spark):
    df = spark.range(50).select(
        (F.col("id") % 5).cast("double").alias("part key")
    )
    tk = sketches.top_k_counts(df, "part key", 3)
    assert tk.count() == 3
    kq = sketches.kll_quantiles(df, "part key", [0.5])
    assert kq.columns == ["q50"]


def test_kll_merged_partials_match_rank_bound(spark, lineitem):
    """Merged per-shard KLL partials must satisfy the same rank-error
    contract as the direct sketch: the merged q50 sits between the
    exact 45th and 55th percentiles."""
    partials = sketches.kll_partials(
        lineitem, [], "l_extendedprice", F.expr("l_orderkey % 8")
    )
    assert partials.count() == 8  # one sketch per shard
    got = sketches.kll_merge_quantiles(partials, [], [0.5]).collect()[0].q50
    lo, hi = (
        lineitem.agg(
            F.expr("percentile(l_extendedprice, 0.45)"),
            F.expr("percentile(l_extendedprice, 0.55)"),
        ).collect()[0]
    )
    assert lo <= got <= hi


def test_cms_merged_shards_equal_direct_table(spark, lineitem):
    """Counter sums are associative: merging per-shard CMS tables must
    reproduce the direct sketch cell-for-cell, bit-exactly."""
    direct = sketches.cms_table(lineitem, "l_suppkey", depth=4, width=64)
    merged = sketches.cms_merge(
        sketches.cms_partials(
            lineitem, "l_suppkey", F.expr("l_orderkey % 8"), depth=4, width=64
        )
    )
    d = {(r.d, r.bucket): r.cnt for r in direct.collect()}
    m = {(r.d, r.bucket): r.cnt for r in merged.collect()}
    assert d == m


def test_cms_never_undercounts_and_exact_when_wide(spark, lineitem):
    """CMS guarantee: est ≥ true for every probe; with width ≫ NDV the
    collision term vanishes and est == true exactly."""
    exact = {
        str(r.probe): r.n
        for r in lineitem.filter(F.col("l_suppkey").isNotNull())
        .groupBy(F.col("l_suppkey").cast("string").alias("probe"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # narrow sketch: overestimates allowed, undercounts never
    narrow = sketches.cms_table(lineitem, "l_suppkey", depth=4, width=16)
    est_n = {
        r.probe: r.est
        for r in sketches.cms_query(
            narrow, lineitem, "l_suppkey", depth=4, width=16
        ).collect()
    }
    assert set(est_n) == set(exact)
    assert all(est_n[p] >= exact[p] for p in exact)
    # wide sketch: 4 independent rows of 4096 buckets vs ~10 NDV — the
    # min over rows is collision-free, so estimates are exact
    wide = sketches.cms_table(lineitem, "l_suppkey", depth=4, width=4096)
    est_w = {
        r.probe: r.est
        for r in sketches.cms_query(
            wide, lineitem, "l_suppkey", depth=4, width=4096
        ).collect()
    }
    assert est_w == exact


def test_cms_unknown_probe_estimates_without_undercount(spark, lineitem):
    """Probing a value never inserted returns only collision mass
    (≥ 0); with a wide sketch it returns exactly 0."""
    probes = spark.range(1).select(F.lit("no-such-supplier").alias("v"))
    wide = sketches.cms_table(lineitem, "l_suppkey", depth=4, width=4096)
    [row] = sketches.cms_query(wide, probes, "v", depth=4, width=4096).collect()
    assert row.est == 0


def test_cms_inner_product_bounds_selfjoin_size(spark, lineitem):
    """F2 estimate from the sketch: never under the exact self-join
    size, and EXACT when width >> NDV (no collisions)."""
    exact = (
        lineitem.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.col("n") * F.col("n")))
        .collect()[0][0]
    )
    small = sketches.cms_table(lineitem, "l_partkey", depth=4, width=32)
    est = sketches.cms_inner_product(small, small).collect()[0].join_size_est
    assert est >= exact
    # widening the sketch shrinks the collision mass: ≤ 10% over at
    # width 4096 (never exact-equality — min-of-4-rows still carries
    # birthday collisions at 200 NDV), and monotonically ≤ the narrow est
    wide = sketches.cms_table(lineitem, "l_partkey", depth=4, width=4096)
    est_w = sketches.cms_inner_product(wide, wide).collect()[0].join_size_est
    assert exact <= est_w <= 1.10 * exact, (est_w, exact)
    assert est_w <= est


def test_cms_inner_product_cross_table_join_size(spark, lineitem):
    """Cross-table: lineitem ⋈ supplier on suppkey is exactly
    |lineitem| (FK); the sketch estimate must sit at-or-above it and
    within a small collision margin at a wide width."""
    sup = spark.table("supplier")
    a = sketches.cms_table(lineitem, "l_suppkey", depth=4, width=2048)
    b = sketches.cms_table(sup, "s_suppkey", depth=4, width=2048)
    est = sketches.cms_inner_product(a, b).collect()[0].join_size_est
    exact = lineitem.join(
        sup, lineitem["l_suppkey"] == sup["s_suppkey"]
    ).count()
    assert exact <= est <= 1.10 * exact, (est, exact)


def test_kmv_by_key_matches_per_key_sketches(spark, lineitem):
    """Grouped KMV == running the single-set sketch per key, including
    a NULL group key, exact below k and estimated above."""
    df = lineitem.select(
        F.when(F.col("l_orderkey") % 3 == 0, F.lit(None))
        .otherwise(F.col("l_returnflag"))
        .alias("g"),
        "l_partkey",
    )
    k = 32
    got = {
        r.g: (r.n_retained, r.ndv_est)
        for r in sketches.kmv_by_key(df, ["g"], "l_partkey", k).collect()
    }
    for g in got:
        cond = F.col("g").isNull() if g is None else (F.col("g") == g)
        single = sketches.kmv_estimate(
            sketches.kmv_merge(
                sketches.kmv_partials(
                    df.filter(cond), "l_partkey", k, F.lit(0)
                ),
                k,
            ),
            k,
        ).collect()[0]
        assert got[g] == (single.n_retained, single.ndv_est), g
    assert None in got and len(got) >= 3
