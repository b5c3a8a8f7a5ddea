"""Deterministic sampling & dataset splits — training-pipeline ops.

A 100 TB training corpus can't use `df.sample()` for held-out splits:
RNG sampling is neither stable across reruns/repartitions nor joinable
(you can't later ask "which split was doc X in?"). The standard trick
is CONTENT-ADDRESSED bucketing — hash a stable id into a fixed bucket
space and carve the space into ranges. Every operator here is a pure
map over the rows (zero shuffles, zero state), so it costs one scan at
any scale and the assignment of a given id never changes.

Buckets come from the first 4 hex chars of `md5(id || ':' || salt)` —
a 16-bit space (65536 buckets). Fixed-width lowercase hex compares
lexicographically exactly like the number it encodes, and every engine
produces the identical md5 hex string, which is what makes these ops
oracle-checkable bit-for-bit against DuckDB (unlike `F.hash`, whose
Murmur3 seed/variant is engine-private).

Reference parity: the reference has no sampling surface (its frames
inherit Polars', which is RNG-based); this is north-star extension
surface per /root/repo/BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: hex digits of the bucket key; 4 → 65536 buckets. Enough resolution
#: for per-mille split weights while keeping thresholds human-readable.
_HEX_WIDTH = 4
_BUCKETS = 16 ** _HEX_WIDTH


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def bucket_key(id_col: Column | str, salt: str = "") -> Column:
    """Fixed-width hex bucket key in [0000, ffff] for a stable id.

    The salt namespaces independent carvings (e.g. a dedup sample vs a
    train/test split) so they don't correlate.
    """
    s = _col(id_col).cast("string")
    return F.substring(F.md5(F.concat(s, F.lit(":" + salt))), 1, _HEX_WIDTH)


def bucket_id(id_col: Column | str, salt: str = "") -> Column:
    """The bucket as an int in [0, 65536) — for modulo-style carving."""
    return F.conv(bucket_key(id_col, salt), 16, 10).cast("int")


def _hex_threshold(fraction: float) -> str:
    """Upper-bound bucket key (exclusive) covering ``fraction`` of the
    space, as a fixed-width hex literal comparable to bucket_key().

    Only meaningful for fraction < 1: the full space has no 4-char
    exclusive upper bound ("10000" is 5 chars and compares lexically
    BELOW most keys), so callers must special-case fraction >= 1.
    """
    n = min(max(int(round(fraction * _BUCKETS)), 0), _BUCKETS - 1)
    return format(n, f"0{_HEX_WIDTH}x")


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Stable ``fraction``-sample: keeps a row iff its bucket falls in
    the first ``fraction`` of the space. Same ids survive every run,
    any partitioning, any engine. Samples nest: every id kept at
    fraction f is also kept at any f' > f (same salt)."""
    if fraction >= 1.0:
        return df
    if fraction <= 0.0:
        return df.filter(F.lit(False))
    return df.filter(bucket_key(id_col, salt) < F.lit(_hex_threshold(fraction)))


def split_thresholds(weights: dict[str, float]) -> list[tuple[str, str | None]]:
    """(split_name, exclusive upper hex bound) pairs covering the whole
    bucket space in dict order. The last split's bound is ``None``
    ("rest of the space") — it absorbs rounding slack and the top
    bucket, which has no 4-char exclusive upper bound."""
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("split weights must sum to a positive number")
    bounds, cum = [], 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        bounds.append((name, _hex_threshold(cum)))
    bounds.append((names[-1], None))
    return bounds


def assign_splits(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Add a ``split`` column ('train'/'valid'/'test' by default) from
    the id's bucket. Disjoint, exhaustive, and permanent for an id."""
    weights = weights or {"train": 0.8, "valid": 0.1, "test": 0.1}
    key = bucket_key(id_col, salt)
    bounds = split_thresholds(weights)
    expr = None
    for name, hi in bounds[:-1]:
        cond = key < F.lit(hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(bounds[-1][0])
    return df.withColumn(split_col, last if expr is None else expr.otherwise(last))


def stratified_take(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    n_per_stratum: int,
    salt: str = "",
) -> DataFrame:
    """Exactly ≤n rows per stratum, chosen by bucket-key order — a
    deterministic stratified sample (rank over md5, not RNG). One
    shuffle on the stratum key; strata process independently, so skew
    is bounded by the largest stratum, not the table."""
    w = Window.partitionBy(strata_col).orderBy(
        bucket_key(id_col, salt).asc(), _col(id_col).asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    fractions: dict,
    default: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum fraction sampling (the deterministic ``sampleBy``):
    each stratum keeps its own slice of the bucket space, so rebalancing
    a skewed corpus (e.g. downsample English, keep all low-resource
    languages) is a pure filter — zero shuffles, stable across reruns,
    and nested per stratum like deterministic_sample."""
    key = bucket_key(id_col, salt)
    expr = F.lit(default >= 1.0)
    if 0.0 < default < 1.0:
        expr = key < F.lit(_hex_threshold(default))
    for stratum, frac in fractions.items():
        cond = F.col(strata_col).eqNullSafe(F.lit(stratum))
        if frac >= 1.0:
            keep = F.lit(True)
        elif frac <= 0.0:
            keep = F.lit(False)
        else:
            keep = key < F.lit(_hex_threshold(frac))
        expr = F.when(cond, keep).otherwise(expr)
    return df.filter(expr)


def quota_take(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    quota_df: DataFrame,
    salt: str = "",
    quota_col: str = "quota",
) -> DataFrame:
    """Per-group quota sampling — the composition-rebalancing primitive
    (hit a target domain/language mix by taking at most ``quota`` docs
    per group, deterministically). ``quota_df`` is a tiny
    (stratum, quota) table — typically computed from target mix weights
    in the same plan, never on the driver. Rows are ranked inside each
    stratum by content-addressed bucket key (same md5 scheme as
    :func:`stratified_take`, so results are permanent for an id) and
    kept while rank ≤ quota. One shuffle on the stratum key; the quota
    table rides a broadcast join.
    """
    w = Window.partitionBy(strata_col).orderBy(
        bucket_key(id_col, salt).asc(), _col(id_col).asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .join(F.broadcast(quota_df), strata_col)
        .filter(F.col("_rk") <= F.col(quota_col))
        .drop("_rk", quota_col)
    )


def weighted_take(
    df: DataFrame,
    id_col: str,
    weight_col: Column | str,
    n: int,
    salt: str = "",
    key_col: str = "priority_key",
) -> DataFrame:
    """Deterministic weight-proportional sample of ``n`` rows without
    replacement — priority sampling (Duffield–Lund–Thorup, JACM '07):
    each row gets priority ``w / u`` for a content-addressed uniform
    ``u``, and the n largest priorities win. Heavier rows win
    proportionally more often; re-running, repartitioning, or changing
    engines cannot change the sample (u comes from md5(id||':'||salt),
    not RNG). The quality-weighted data-selection primitive (DSIR-style
    upsampling of high-quality documents).

    Implemented as the n SMALLEST ``u / w`` keys — one
    ``orderBy().limit(n)`` = TakeOrderedAndProject (per-partition top-n
    + tiny merge, no global sort). The uniform is
    ``(h53 + 1) / (2^52 + 1)`` with h53 = first 13 md5 hex chars, so
    key arithmetic is add + divide ONLY — both IEEE-correctly-rounded,
    which makes the ranking bit-identical in any engine (a ``ln``/
    ``pow``-based Efraimidis–Spirakis key is not: libm rounding is
    engine-private). Rows with weight ≤ 0 or null never qualify.
    """
    w = _col(weight_col).cast("double")
    h = F.conv(
        F.substring(
            F.md5(F.concat(_col(id_col).cast("string"), F.lit(":" + salt))),
            1,
            13,
        ),
        16,
        10,
    ).cast("bigint")
    u = (h + F.lit(1)).cast("double") / F.lit(float((1 << 52) + 1))
    return (
        df.filter(w > 0)
        .withColumn(key_col, u / w)
        .orderBy(F.col(key_col).asc(), _col(id_col).asc())
        .limit(n)
    )


def group_aware_splits(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    weights: dict[str, float] | None = None,
    salt: str = "",
    split_col: str = "split",
    id_a: str = "id_a",
    id_b: str = "id_b",
    rep_col: str = "rep",
    max_iterations: int = 20,
) -> DataFrame:
    """Leakage-safe train/valid/test assignment: every document in a
    near-dup component buckets on its component's canonical (min-id)
    member, so no near-duplicate pair can straddle splits — the
    contamination a plain per-id carve silently allows. Documents
    outside any component bucket on their own id (identical to
    :func:`assign_splits` for them).

    ``pairs`` is any near-dup pair frame (MinHash LSH, SimHash,
    embedding cosine — operators/dedup.py). Cost on top of
    assign_splits: the connected-components label table (only docs
    that HAVE a near-dup — tiny vs the corpus) joined back once; AQE
    broadcasts it while small. Keeps ``rep_col`` so callers can count
    groups or audit leakage.

    ``max_iterations`` bounds the label-propagation rounds; with
    pointer doubling convergence is O(log diameter), so the default 20
    covers components with diameter up to ~2^19 — raise it only for
    truly pathological graphs rather than letting connected_components
    fail.
    """
    from .graph import connected_components

    cc = connected_components(pairs, id_a, id_b, max_iterations).select(
        F.col("node").alias("__gs_node"),
        F.col("component").alias("__gs_comp"),
    )
    with_rep = (
        df.join(cc, _col(id_col) == F.col("__gs_node"), "left")
        .withColumn(rep_col, F.coalesce(F.col("__gs_comp"), _col(id_col)))
        .drop("__gs_node", "__gs_comp")
    )
    return assign_splits(with_rep, rep_col, weights, salt, split_col)


def deterministic_shuffle(
    df: DataFrame,
    id_col: str,
    salt: str = "",
    shards: int = 256,
    shard_col: str = "shard",
    order_col: str = "shuffle_key",
) -> DataFrame:
    """Content-addressed global shuffle for training order.

    Training runs need the corpus in a RANDOM but REPRODUCIBLE order —
    same order on every rerun, any cluster size, either engine. The
    scale-correct construction is hierarchical, never a global sort:

    - ``shard`` = first hex digits of md5(id:salt) → which of
      ``shards`` output files a row lands in (shards are the unit a
      data loader streams sequentially);
    - ``shuffle_key`` = the full md5 hex → the row's position WITHIN
      its shard.

    Reading shards in name order, each sorted by ``shuffle_key``,
    visits the corpus in one fixed pseudorandom permutation — without
    any node ever materializing a total order: writing is
    ``.repartition(shards, shard)`` + ``sortWithinPartitions(
    order_col)`` + ``partitionBy(shard)``, one shuffle, per-partition
    sorts only. ``salt`` picks the permutation (epoch 2 of a training
    run shuffles with a different salt, the standard trick for
    cheap re-shuffling between epochs).

    ``shards`` must be a power of 16 ≤ 65536 (whole hex digits keep
    the key a plain substring, replayable as ANSI SQL by the oracle).
    """
    import math

    digits = round(math.log(shards, 16)) if shards > 0 else 0
    if shards <= 0 or 16**digits != shards or not 1 <= digits <= 4:
        raise ValueError(
            f"shards must be a power of 16 in [16, 65536], got {shards}"
        )
    key = F.md5(F.concat(_col(id_col).cast("string"), F.lit(":" + salt)))
    return df.withColumn(shard_col, F.substring(key, 1, digits)).withColumn(
        order_col, key
    )
