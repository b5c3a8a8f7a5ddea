"""Time-series resampling (Polars ``upsample``/gap-fill analog).

Polars exposes ``DataFrame.upsample`` + fill strategies on the frame
the reference's scan returns; the Spark composition is:

1. per-key spine: ``sequence(min(bucket), max(bucket), step)`` +
   ``explode`` — each key's spine generates from ONE aggregated row, so
   spine creation is a groupBy, not a cross join;
2. left join the observed buckets onto the spine (equi-join on
   (key, bucket) — broadcastable when the spine is small, shuffled
   hash otherwise);
3. forward-fill with ``last(value, ignoreNulls=True)`` over the
   per-key ordered window — one shuffle, shared with the join when AQE
   co-partitions.

Buckets are integers (e.g. epoch days/hours) — integer spines are
deterministic across engines, where timestamp interval arithmetic is
where oracle parity goes to die (SURVEY.md §4.4.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _spine(df: DataFrame, bucket_col: str, by_cols: list[str],
           step: int) -> DataFrame:
    """Dense per-key bucket spine, spread for the window passes.

    The explode fans ONE aggregated row per key into the full bucket
    range — a fan-out AQE cannot see (it sizes stages by pre-explode
    shuffle bytes, so it coalesces the tiny bounds table to ~1
    partition and every fused downstream stage — the join, the O(rows)
    window passes — then runs on one task; measured 6.5 s for the
    sf0.1 interpolation, ~1 s spread). An EXPLICIT-width repartition
    on the window keys is exempt from AQE coalescing and
    hash-partitions by exactly what the window passes need, so it is
    the only exchange they use. Width tracks cluster parallelism
    (defaultParallelism grows with the cluster; shuffle width is the
    floor), so the repartition stays right-sized at any scale.
    """
    spine = (
        df.groupBy(*by_cols)
        .agg(
            F.min(bucket_col).alias("__lo"),
            F.max(bucket_col).alias("__hi"),
        )
        .select(
            *by_cols,
            F.explode(
                F.sequence(F.col("__lo"), F.col("__hi"), F.lit(step))
            ).alias(bucket_col),
        )
    )
    sess = df.sparkSession
    # 2× the larger of (cluster parallelism, shuffle width). The
    # factor is not tuning: the bounds aggregate feeding this explode
    # is ALSO hash-partitioned on the key columns at exactly
    # `spark.sql.shuffle.partitions`, and a repartition whose
    # partitioning matches its child's is eliminated as redundant
    # (verified: the r9 plan had 0 REPARTITION nodes and AQE then
    # coalesced the tiny bounds exchange to ~1 task, serializing the
    # explode + join + both window passes — noop-timed 4.9 s at sf0.1
    # vs 1.8 s with the node intact, the regression the docstring
    # above describes). 2×max(...) is strictly greater than the
    # child's width, so the node always survives, and explicit-width
    # repartitions are exempt from AQE coalescing.
    width = 2 * max(
        sess.sparkContext.defaultParallelism,
        int(sess.conf.get("spark.sql.shuffle.partitions", "200")),
    )
    return spine.repartition(width, *by_cols)


def upsample_ffill(
    df: DataFrame,
    bucket_col: str,
    by: str | list[str],
    value_cols: list[str],
    step: int = 1,
) -> DataFrame:
    """Dense per-key bucket spine with forward-filled values.

    ``df`` must hold ONE row per (key, bucket) — pre-aggregate first.
    Returns one row per key per bucket in [min, max] with each value
    column forward-filled (nulls before the first observation remain
    null, like Polars' ``fill_null(strategy='forward')``).
    """
    by_cols = [by] if isinstance(by, str) else list(by)
    joined = _spine(df, bucket_col, by_cols, step).join(
        df, on=by_cols + [bucket_col], how="left"
    )
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = [
        F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols
    ]
    return joined.select(*by_cols, bucket_col, *filled)


def upsample_interpolate(
    df: DataFrame,
    bucket_col: str,
    by: str | list[str],
    value_col: str,
    step: int = 1,
) -> DataFrame:
    """Dense per-key spine with LINEAR interpolation (Polars
    ``interpolate`` analog): a gap bucket between two observations
    gets y0 + (y1-y0)·(t-t0)/(t1-t0); buckets before the first or
    after the last observation stay null. Same single-shuffle shape as
    forward-fill — the two window passes (last-known-behind,
    first-known-ahead) share the per-key ordering.
    """
    by_cols = [by] if isinstance(by, str) else list(by)
    joined = _spine(df, bucket_col, by_cols, step).join(
        df, on=by_cols + [bucket_col], how="left"
    )
    wb = (
        Window.partitionBy(*by_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the look-AHEAD pass runs over DESCENDING order with a GROWING
    # frame (last ignorenulls), never `first` over [current, unbounded
    # following]: Spark evaluates growing frames in O(rows) streaming,
    # but a shrinking frame re-aggregates from scratch per row —
    # O(rows²) per partition (measured: 82 s -> 3 s on a 916k-row
    # spine with ~700-row key partitions at sf0.1). Same hash
    # partitioning as wb, so still one exchange; AQE shares it.
    wf = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col(bucket_col).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    v, b = F.col(value_col), F.col(bucket_col)
    known = F.when(v.isNotNull(), F.struct(b.alias("t"), v.alias("y")))
    prev = F.last(known, ignorenulls=True).over(wb)
    nxt = F.last(known, ignorenulls=True).over(wf)
    interp = prev["y"] + (nxt["y"] - prev["y"]) * (
        (b - prev["t"]).cast("double") / (nxt["t"] - prev["t"]).cast("double")
    )
    out = (
        F.when(v.isNotNull(), v.cast("double"))
        .when(prev.isNotNull() & nxt.isNotNull(), interp)
    )
    return joined.select(*by_cols, b.alias(bucket_col), out.alias(value_col))
