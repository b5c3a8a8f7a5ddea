"""Mergeable sketches — the petabyte-scale approximate-analytics tier.

At 100 TB you don't recompute distincts/quantiles/top-k over raw data
per report; you pre-aggregate a SKETCH per partition (day, shard),
persist those few-KB binaries, and MERGE them at query time. Spark 4
ships the Apache DataSketches family as built-in JVM aggregates —
`hll_sketch_agg`/`hll_union_agg` (distinct), `kll_sketch_agg_double` +
merge/quantile (ranks), `approx_top_k_accumulate`/`_combine`/
`_estimate` (heavy hitters) — so the whole tier stays inside
whole-stage codegen with zero Python.

Merge-correctness (sketch-of-union == union-of-sketches) and published
error bounds are pinned in tests/test_sketches.py; estimates are not
DuckDB-oracle-comparable (different sketch implementations), except
top-k run in exact mode (maxItemsTracked ≥ NDV), where the estimated
counts coincide with exact group counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ident(name: str) -> str:
    """Backtick-quote a column name for SQL-text interpolation, so
    names with spaces/dashes/dots work (same contract as
    operators.quality._qcol, but emitting text for ``F.expr``)."""
    return "`" + name.replace("`", "``") + "`"


def top_k_counts(
    df: DataFrame, col: str, k: int, max_tracked: int = 1_000_000
) -> DataFrame:
    """Heavy-hitter counts via ``approx_top_k``: rank + count only.

    Membership at the boundary is tie-ambiguous (rank-k ties), so the
    deterministic — and oracle-checkable, when ``max_tracked`` ≥ the
    column's NDV (exact mode) — output is the sorted count spectrum,
    not the items.

    SIZE ``max_tracked`` ≥ NDV: Spark's ``approx_top_k`` does NOT
    degrade gracefully past its tracking budget — once the column's
    distinct count exceeds ``maxItemsTracked`` the aggregate returns an
    EMPTY array, not approximate counts (observed on 4.1: 20k NDV with
    10k tracked → []). The default tracks 1M items (~16 MB of sketch
    per partial — fine for one aggregate); raise it for
    higher-cardinality columns or pre-aggregate first.
    """
    est = df.agg(
        F.expr(f"approx_top_k({_ident(col)}, {k}, {max_tracked})").alias("tk")
    )
    return (
        est.select(F.explode("tk").alias("e"))
        .select(F.col("e.count").alias("cnt"))
        .select(
            F.row_number()
            .over(Window.orderBy(F.col("cnt").desc()))
            .alias("rank"),
            "cnt",
        )
    )


def hll_partials(
    df: DataFrame, keys: list[str], id_col: str, shard_col: Column | str
) -> DataFrame:
    """Stage 1: one HLL sketch per (keys, shard) — the few-KB binary a
    100 TB pipeline persists per day/partition instead of raw ids."""
    shard = F.col(shard_col) if isinstance(shard_col, str) else shard_col
    return df.groupBy(*keys, shard.alias("_shard")).agg(
        F.hll_sketch_agg(id_col).alias("hll")
    )


def hll_merge(partials: DataFrame, keys: list[str]) -> DataFrame:
    """Stage 2: union the shard sketches per key and estimate NDV.
    Register-wise max is order-independent, so the merged estimate is
    bit-identical to sketching the whole table directly."""
    return partials.groupBy(*keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll")).alias("ndv_est")
    )


def kll_quantiles(
    df: DataFrame, value_col: str, probs: list[float], keys: list[str] | None = None
) -> DataFrame:
    """KLL rank sketch → quantile estimates at ``probs`` per key.

    Normalized rank error for the default sketch is ~1.7% — the
    quantile at p is exact for some p' with |p - p'| ≤ ε (an error in
    RANK space, not value space), pinned in tests.
    """
    keys = keys or []
    qcols = [
        F.expr(
            "kll_sketch_get_quantile_double("
            f"kll_sketch_agg_double({_ident(value_col)}), {p})"
        # round, not int(): int(0.29*100) == 28 and both 0.56 and 0.57
        # truncate to q56 (a duplicate column) under binary floats
        ).alias(f"q{round(p * 100)}")
        for p in probs
    ]
    return df.groupBy(*keys).agg(*qcols)


def _cms_bucket(d: Column, v: Column, width: int) -> Column:
    """Row (depth d, value v) → counter column in [0, width): the
    first 8 hex chars of md5(d:v) as a 32-bit int, mod width. md5 is
    the one hash both engines share bit-exactly (same rationale as the
    sampling/minhash families), so a DuckDB oracle replays the whole
    sketch: ``('0x' || substring(md5(d || ':' || v), 1, 8))::BIGINT %
    width``."""
    h = F.substring(F.md5(F.concat_ws(":", d.cast("string"), v)), 1, 8)
    return F.conv(h, 16, 10).cast("long") % width


def cms_table(
    df: DataFrame, col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-Min sketch as a RELATION ``(d, bucket, cnt)`` — not a
    binary blob (Spark's ``count_min_sketch`` aggregate emits an opaque
    binary with no SQL point-query function; the relational form keeps
    query/merge/inspection inside the engine).

    Each non-null value increments one counter per hash row. The
    explode multiplies rows depth× BEFORE the partial aggregate, but
    the (d, bucket) key space is depth·width, so every map-side
    partial collapses to ≤ depth·width rows — the shuffle moves a
    fixed-size sketch per task regardless of input size, which is the
    CMS property. Sketches over disjoint shards merge by SUMMING
    ``cnt`` per (d, bucket) (see :func:`cms_merge`); sums are
    associative so merged == direct, bit-exactly.
    """
    ds = F.array(*[F.lit(i) for i in range(depth)])
    rows = df.filter(F.col(col).isNotNull()).select(
        F.explode(ds).alias("d"), F.col(col).cast("string").alias("_v")
    )
    return rows.groupBy(
        "d", _cms_bucket(F.col("d"), F.col("_v"), width).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def cms_partials(
    df: DataFrame,
    col: str,
    shard_col: Column | str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Stage 1: one relational CMS per shard — the fixed-size table a
    100 TB pipeline persists per day/partition, mirroring
    :func:`hll_partials`/:func:`kll_partials` for frequencies."""
    shard = F.col(shard_col) if isinstance(shard_col, str) else shard_col
    ds = F.array(*[F.lit(i) for i in range(depth)])
    rows = df.filter(F.col(col).isNotNull()).select(
        shard.alias("_shard"),
        F.explode(ds).alias("d"),
        F.col(col).cast("string").alias("_v"),
    )
    return rows.groupBy(
        "_shard",
        "d",
        _cms_bucket(F.col("d"), F.col("_v"), width).alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("cnt"))


def cms_merge(partials: DataFrame) -> DataFrame:
    """Stage 2: union shard sketches by summing counters per cell —
    order-independent, so merged == sketching the whole table."""
    return partials.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_query(
    cms: DataFrame,
    probes: DataFrame,
    probe_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query estimated frequencies: for each probe value, min
    over the depth counters it hashes to. Guarantees est ≥ true count
    (never under), est ≤ true + collision noise bounded by e·n/width
    with probability 1−e^−depth (pinned in tests).

    The sketch is ≤ depth·width rows, so it BROADCASTS into the probe
    join — querying any number of probes is one map-side pass."""
    p = probes.filter(F.col(probe_col).isNotNull()).select(
        F.col(probe_col).cast("string").alias("probe")
    ).distinct()
    ds = F.array(*[F.lit(i) for i in range(depth)])
    keyed = p.select(
        "probe", F.explode(ds).alias("d")
    ).withColumn("bucket", _cms_bucket(F.col("d"), F.col("probe"), width))
    return (
        keyed.join(F.broadcast(cms), ["d", "bucket"], "left")
        .groupBy("probe")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


#: 2^32 as a double — the KMV hash-space size. Hashes are 32-bit ints
#: (first 8 hex chars of md5), so u = (h + 1) / 2^32 lies in (0, 1].
_KMV_SPACE = 4294967296.0


def kmv_hash(col: Column) -> Column:
    """Value → 32-bit hash for the KMV (k-minimum-values / bottom-k
    theta) sketch family. Same md5 fold the CMS/minhash/sampling tiers
    use — the one hash both engines share bit-exactly, so a DuckDB
    oracle replays every estimate to the last bit:
    ``('0x' || substring(md5(v), 1, 8))::BIGINT``."""
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, 8), 16, 10
    ).cast("long")


def kmv_partials(
    df: DataFrame, col: str, k: int, shard_col: Column | str
) -> DataFrame:
    """Stage 1: the k smallest distinct value-hashes per shard — the
    fixed-k-row table a 100 TB pipeline persists per day/partition for
    distinct-count SET ALGEBRA (union AND intersection — the one
    estimate HLL cannot give without inclusion-exclusion error blowup).

    Distinct-first, then rank: the (shard, h) pre-aggregate gets
    map-side combine, so the shuffle moves ≤ NDV rows, not raw rows;
    the row_number window then streams each shard's sorted run and
    keeps k — no unbounded collect_set state per shard."""
    shard = F.col(shard_col) if isinstance(shard_col, str) else shard_col
    hashes = (
        df.filter(F.col(col).isNotNull())
        .select(shard.alias("_shard"), kmv_hash(F.col(col)).alias("h"))
        .distinct()
    )
    w = Window.partitionBy("_shard").orderBy("h")
    return (
        hashes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("_shard", "h")
    )


def kmv_merge(partials: DataFrame, k: int) -> DataFrame:
    """Stage 2: union the shard sketches → global bottom-k. The input
    is ≤ shards·k rows, so the sort-limit plans as
    TakeOrderedAndProject — no full sort. Bottom-k of a union of
    bottom-k sets equals bottom-k of the union of the full hash sets
    (any global bottom-k hash is in its shard's bottom-k), so merged
    == sketching the whole table, bit-exactly."""
    return partials.select("h").distinct().orderBy("h").limit(k)


def _kmv_theta(n: Column, mx: Column, k: int) -> Column:
    """theta = the k-th smallest normalized hash (sketch full) else 1.
    u = (h + 1) / 2^32 so a retained set never yields theta = 0."""
    return F.when(n < k, F.lit(1.0)).otherwise(
        (mx + F.lit(1)) / F.lit(_KMV_SPACE)
    )


def kmv_estimate(kmv: DataFrame, k: int) -> DataFrame:
    """NDV estimate from a bottom-k sketch frame: exact count while the
    sketch is unsaturated, else the KMV estimator (k-1)/theta
    (RSE ≈ 1/sqrt(k-2), pinned in tests). 1-row output
    ``(n_retained, theta, ndv_est)``; the estimate is deterministic
    (md5), so it value-hashes against the oracle — no tolerance rows."""
    agg = kmv.agg(F.count(F.lit(1)).alias("n"), F.max("h").alias("mx"))
    theta = _kmv_theta(F.col("n"), F.col("mx"), k)
    est = F.when(F.col("n") < k, F.col("n").cast("double")).otherwise(
        F.lit(float(k - 1)) / theta
    )
    return agg.select(
        F.col("n").alias("n_retained"),
        theta.alias("theta"),
        F.round(est).cast("bigint").alias("ndv_est"),
    )


def kmv_by_key(
    df: DataFrame, keys: list[str], col: str, k: int
) -> DataFrame:
    """Grouped KMV: per-key bottom-k retained sets folded straight to
    per-key NDV estimates — the daily-uniques-per-segment production
    shape (one sketch per key, all in one pass). Same estimator and
    guarantees as :func:`kmv_estimate`; returns
    ``(*keys, n_retained, theta, ndv_est)``. The distinct-first
    pre-aggregate gets map-side combine; the rank window streams each
    key's sorted run keeping k — state bounded per key like the
    streaming twin (``streaming_kmv``)."""
    hashes = (
        df.filter(F.col(col).isNotNull())
        .select(*keys, kmv_hash(F.col(col)).alias("h"))
        .distinct()
    )
    w = Window.partitionBy(*keys).orderBy("h")
    bottomk = hashes.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    agg = bottomk.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"), F.max("h").alias("mx")
    )
    theta = _kmv_theta(F.col("n"), F.col("mx"), k)
    est = F.when(F.col("n") < k, F.col("n").cast("double")).otherwise(
        F.lit(float(k - 1)) / theta
    )
    return agg.select(
        *keys,
        F.col("n").alias("n_retained"),
        theta.alias("theta"),
        F.round(est).cast("bigint").alias("ndv_est"),
    )


def kmv_union(a: DataFrame, b: DataFrame, k: int) -> DataFrame:
    """Union sketch: bottom-k of the combined retained sets — the KMV
    union is closed, so |A ∪ B| estimates through :func:`kmv_estimate`
    with the same guarantees."""
    return kmv_merge(a.select("h").unionByName(b.select("h")), k)


def kmv_intersect_estimate(a: DataFrame, b: DataFrame, k: int) -> DataFrame:
    """|A ∩ B| estimate — the theta-sketch set operation HLL has no
    analog for: clip both retained sets at theta = min(theta_A,
    theta_B), count common hashes strictly below theta (the
    theta-defining element is excluded, mirroring the k-1 in the NDV
    estimator), and scale by 1/theta. Every frame in play is ≤ k rows,
    so the joins broadcast; 1-row output ``(n_common, inter_est)``."""
    sa = a.agg(F.count(F.lit(1)).alias("na"), F.max("h").alias("mxa"))
    sb = b.agg(F.count(F.lit(1)).alias("nb"), F.max("h").alias("mxb"))
    th = sa.crossJoin(sb).select(
        F.least(
            _kmv_theta(F.col("na"), F.col("mxa"), k),
            _kmv_theta(F.col("nb"), F.col("mxb"), k),
        ).alias("theta")
    )
    common = a.select("h").join(b.select("h"), "h")
    cnt = (
        common.crossJoin(F.broadcast(th))
        .filter((F.col("h") + F.lit(1)) / F.lit(_KMV_SPACE) < F.col("theta"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return cnt.crossJoin(F.broadcast(th)).select(
        "n_common",
        F.round(F.col("n_common") / F.col("theta")).cast("bigint").alias(
            "inter_est"
        ),
    )


def cms_inner_product(a: DataFrame, b: DataFrame) -> DataFrame:
    """Equijoin-size estimate from two relational CMS sketches built
    with the SAME (depth, width): |A ⋈ B on v| = Σ_v fA(v)·fB(v) is
    estimated by min over hash rows d of Σ_bucket cntA(d,b)·cntB(d,b)
    — the classic AMS/CMS application that lets a planner size a join
    from two fixed-size sketches without touching either table.
    Never underestimates (collisions only add mass, same argument as
    the point query); 1-row output ``(join_size_est,)``. Pass the same
    sketch twice for the self-join size / second frequency moment F₂.
    """
    bb = b.select(
        F.col("d").alias("d2"),
        F.col("bucket").alias("bucket2"),
        F.col("cnt").alias("cnt_b"),
    )
    per_row = (
        a.join(
            F.broadcast(bb),
            (F.col("d") == F.col("d2")) & (F.col("bucket") == F.col("bucket2")),
        )
        .groupBy("d")
        .agg(F.sum(F.col("cnt") * F.col("cnt_b")).alias("ip"))
    )
    return per_row.agg(F.min("ip").alias("join_size_est"))


def kll_partials(
    df: DataFrame, keys: list[str], value_col: str, shard_col: Column | str
) -> DataFrame:
    """Stage 1: one KLL rank sketch per (keys, shard) — the few-KB
    binary a 100 TB pipeline persists per day/partition instead of raw
    values, mirroring :func:`hll_partials` for quantiles."""
    shard = F.col(shard_col) if isinstance(shard_col, str) else shard_col
    return df.groupBy(*keys, shard.alias("_shard")).agg(
        F.expr(f"kll_sketch_agg_double({_ident(value_col)})").alias("kll")
    )


def kll_merge_quantiles(
    partials: DataFrame, keys: list[str], probs: list[float]
) -> DataFrame:
    """Stage 2: merge the shard sketches per key, then read quantile
    estimates at ``probs`` from the single merged sketch (one merge
    aggregate, not one per requested quantile)."""
    merged = partials.groupBy(*keys).agg(
        F.expr("kll_merge_agg_double(kll)").alias("_merged")
    )
    return merged.select(
        *keys,
        *[
            F.expr(f"kll_sketch_get_quantile_double(_merged, {p})").alias(
                f"q{round(p * 100)}"
            )
            for p in probs
        ],
    )
