"""Partitioning strategies for 100 TB joins/aggs (SURVEY.md §4.3).

Three levers, in the order to reach for them:

1. **Broadcast** (`F.broadcast`) — small dimension side: no shuffle at
   all. Catalyst does this automatically under the size threshold; the
   explicit hint is for when statistics lie.
2. **Bucketing** — both fact tables pre-hashed into the same bucket
   layout on the join key: every subsequent join/aggregation on that
   key runs with ZERO exchanges, amortizing one write-time shuffle
   across every downstream query. This is the canonical layout for a
   corpus that is joined on the same key daily.
3. **Salting** — one key dominates (power-law user, empty-string text
   hash, null FK): split the hot key across ``n`` salted sub-keys,
   replicate the small side's matching rows per salt, join on
   (key, salt). AQE's skew-join handles moderate skew automatically;
   explicit salting is for the pathological single-key case AQE splits
   poorly.

Reference parity: single-node engine, no partitioning surface;
north-star extension per /root/repo/BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# --------------------------------------------------------------- bucketing

def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: str | list[str],
    num_buckets: int = 32,
    sort_cols: str | list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (+optionally sorted) managed table.

    Joins and aggregations between tables bucketed identically on the
    join key need no exchange — the one write-time shuffle is paid
    once, not per query. Spark's native catalog stores bucketing
    metadata; readers get it via ``spark.table(name)``.
    """
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else bucket_cols
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else sort_cols
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


# ----------------------------------------------------------------- salting

def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to heavy skew in ``left[on]``.

    The big/skewed side gets a deterministic salt in ``[0, num_salts)``
    derived from its other columns (``xxhash64`` of the whole row — no
    RNG, so task retries are safe); the small side is replicated once
    per salt via ``explode``. The shuffle then spreads the hot key over
    ``num_salts`` partitions instead of one.

    Output columns = left columns + right's non-key columns (like a
    plain ``join(..., on)``).

    Only join types where the RIGHT side never emits unmatched rows are
    sound: the right side is replicated ``num_salts`` times, so a
    right/full outer join would emit each unmatched right row once per
    salt.
    """
    sound = {"inner", "left", "left_outer", "left_semi", "left_anti",
             "semi", "anti", "leftouter", "leftsemi", "leftanti", "cross"}
    if how.lower().replace("_", "") not in {s.replace("_", "") for s in sound}:
        raise ValueError(
            f"salted_join is unsound for how={how!r}: the replicated right "
            "side would duplicate unmatched right rows (use inner/left/"
            "left_semi/left_anti)"
        )
    left_salted = left.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(num_salts))
        .cast("int"),
    )
    right_replicated = right.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1))),
    )
    out = left_salted.join(right_replicated, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def salted_agg_count(
    df: DataFrame, key: str, num_salts: int = 8
) -> DataFrame:
    """Two-phase count for a skewed groupBy key: partial counts per
    (key, salt), then final sum per key — the hot key's rows spread over
    ``num_salts`` reducers in phase one. (Spark's hash aggregate already
    does map-side partials; explicit salting is for skew so extreme that
    one reducer's final-phase input is itself the bottleneck.)"""
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]),
                         F.lit(num_salts)).cast("int")
    )
    partial = salted.groupBy(key, "__salt").agg(F.count("*").alias("__n"))
    return partial.groupBy(key).agg(F.sum("__n").alias("count"))


def concat_evolve(dfs: list[DataFrame]) -> DataFrame:
    """Concatenate frames whose schemas evolved over time: columns are
    matched BY NAME and columns missing from a frame are null-padded
    (``unionByName(allowMissingColumns=True)`` fold) — appending a new
    corpus snapshot that gained columns never requires rewriting old
    snapshots. Column order follows the first frame, then first
    appearance. Unions are plan-level concatenation: zero shuffles.
    """
    if not dfs:
        raise ValueError("concat_evolve needs at least one frame")
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out


def zorder_key(c1, c2, bits: int = 16):
    """Morton/Z-order interleave of two non-negative ints (``bits``
    each) — sort/range-partition by this before writing and both
    dimensions cluster into files TOGETHER, so parquet min/max file
    skipping works for predicates on either column (the poor-man's
    Z-ORDER BY of table formats). Pure integer expression: stays in
    codegen, oracle-reproducible bit-for-bit in any engine.
    """
    a = F.col(c1) if isinstance(c1, str) else c1
    b = F.col(c2) if isinstance(c2, str) else c2
    out = F.lit(0).cast("bigint")
    for i in range(bits):
        out = (
            out
            + (F.shiftleft(F.shiftright(a, i).bitwiseAND(1), 2 * i))
            + (F.shiftleft(F.shiftright(b, i).bitwiseAND(1), 2 * i + 1))
        )
    return out.cast("bigint")


def zorder_sql(c1: str, c2: str, bits: int = 16) -> str:
    """The identical Morton expression as engine-neutral SQL — the
    DuckDB oracle twin of :func:`zorder_key` (same shift/mask/add
    terms, so results match bit-for-bit)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({c1} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({c2} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def ensure_min_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ONLY when the upstream plan yields fewer
    partitions than the session's parallelism — otherwise the frame
    passes through untouched.

    Why this exists: Spark parallelizes a parquet scan by byte-range
    splits, but a split can't subdivide a ROW GROUP — a table written
    as one big row group scans on one task no matter the split size,
    and every row-local stage fused to that scan (explode fan-outs,
    partial aggregates) then runs single-threaded. At warehouse scale
    this never happens (100 TB = millions of row groups ≫ cores) and
    this function is a pure no-op; on small/badly-written inputs it
    buys full-core parallelism for one cheap shuffle of the input —
    the exact trade a warehouse engine's stats-driven planner makes.

    Scan-only restriction: the partition count comes from
    ``df.rdd.getNumPartitions()``, which is free for a single-stage
    (scan + row-local) plan but under AQE can MATERIALIZE upstream
    shuffle query stages for multi-stage plans — so if the physical
    plan contains a SHUFFLE exchange the frame passes through
    untouched. That's also semantically right: a post-shuffle frame
    already has ``spark.sql.shuffle.partitions``-grade parallelism, so
    the row-group-bound-scan hazard this helper exists for can't
    apply. A *broadcast* exchange does NOT disable the repair: a
    1-partition scan broadcast-joined to a dim table still runs every
    fused row-local stage on one task — the exact hazard — and the
    only stage ``df.rdd`` may materialize early for it is the tiny
    build side.
    """
    import re

    if df.isStreaming:
        # .rdd/executedPlan are illegal on an unstarted stream, and the
        # hazard doesn't apply: micro-batch parallelism comes from the
        # streaming source, not a row-group-bound file scan
        return df
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    plan = df._jdf.queryExecution().executedPlan().toString()
    # shuffle exchanges print as "Exchange <partitioning>"; broadcast
    # ones as "BroadcastExchange <mode>" (AQE reuses wrap both in
    # *QueryStage nodes that keep those names)
    if re.search(r"(?<!Broadcast)Exchange ", plan) or "ShuffleQueryStage" in plan:
        return df
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
