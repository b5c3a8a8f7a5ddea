"""Time-series operators: per-entity EWMA and hypertable-style rollups.

The reference's frames inherit Polars' time-series surface
(`ewm_mean`, `group_by_dynamic`); re-expressed for Spark:

- **EWMA** is an order-dependent recursion (y_t = (1-α)·y_{t-1} + α·x_t),
  which no built-in Spark aggregate expresses — the canonical mapping is
  `applyInPandas` per entity: one shuffle on the entity key, then a
  vectorized pandas `ewm` inside each group. Scale bound: one ENTITY's
  history must fit in one task (the usual per-user/per-device contract),
  not the whole table. pandas' adjust=False recursion is bit-identical
  to the naive double loop (verified), so DuckDB's `list_reduce` fold
  serves as a bit-exact oracle.

- **Hierarchical rollup** is the TimescaleDB continuous-aggregate
  trick: aggregate the raw fact ONCE at the finest bucket, then derive
  each coarser resolution by re-aggregating the previous level. The
  union references the minute level three times in the logical plan,
  but AQE's exchange reuse materializes its shuffle once (pinned by
  ``tests/test_plans.py::test_rollup_reuses_fact_exchange``) — at
  100 TB the raw fact is scanned once, not once per resolution, and
  levels shrink geometrically so every re-agg after the first is
  near-free. Buckets are epoch-µs integers truncated by width — integer
  arithmetic survives engine-parity where interval math does not
  (SURVEY.md §4.4.1).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType


def ewma(
    df: DataFrame,
    value_col: str,
    order_cols: list[str],
    by: str | list[str],
    alpha: float,
    out_col: str = "ewma",
) -> DataFrame:
    """Per-key exponentially weighted moving average of ``value_col``.

    Rows are ordered inside each key by ``order_cols`` (include a
    unique tie-break, e.g. the event id). Emits every input row plus
    ``out_col``; y_0 = x_0, y_t = (1-α)·y_{t-1} + α·x_t (pandas
    ``adjust=False`` semantics).
    """
    by_cols = [by] if isinstance(by, str) else list(by)
    out_schema = StructType(
        df.schema.fields + [StructField(out_col, DoubleType())]
    )

    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        pdf[out_col] = (
            pdf[value_col].ewm(alpha=alpha, adjust=False).mean()
        )
        return pdf

    return df.groupBy(*by_cols).applyInPandas(_one, schema=out_schema)


def time_bucket(ts_us, width_us: int):
    """FLOOR an epoch-µs column to its bucket start (integer math).

    ``pmod``, not ``%``: Spark's ``%`` takes the dividend's sign, so
    ``c - (c % w)`` would assign pre-epoch (negative) timestamps to the
    bucket ABOVE them — ts=-100, w=60 must land in [-120, -60), not
    -60. Floor semantics match ``F.window``/DuckDB ``time_bucket``."""
    c = F.col(ts_us) if isinstance(ts_us, str) else ts_us
    return c - F.pmod(c, F.lit(width_us))


#: resolution name → bucket width in µs (finest first).
DEFAULT_RESOLUTIONS: dict[str, int] = {
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
}


def hierarchical_rollup(
    df: DataFrame,
    ts_us_col: str,
    keys: list[str],
    value_col: str,
    resolutions: dict[str, int] | None = None,
) -> DataFrame:
    """Multi-resolution (count, sum) rollup with one raw-fact pass.

    ``resolutions`` maps name → width-µs, finest first; every width must
    divide the next (minute|hour|day do). Level 1 aggregates ``df``;
    each later level re-aggregates the level before it — count and sum
    are the decomposable aggregates this staging is exact for (avg/quantile
    callers derive from them).

    Returns ``resolution, bucket_us, *keys, n, sum_value``.
    """
    resolutions = resolutions or DEFAULT_RESOLUTIONS
    names = list(resolutions)
    widths = [resolutions[n] for n in names]
    for fine, coarse in zip(widths, widths[1:]):
        if coarse % fine:
            raise ValueError(
                f"widths must nest: {coarse} not a multiple of {fine}"
            )

    level = (
        df.groupBy(
            time_bucket(ts_us_col, widths[0]).alias("bucket_us"), *keys
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(value_col).alias("sum_value"),
        )
    )
    out = level.select(F.lit(names[0]).alias("resolution"), "*")
    for name, width in zip(names[1:], widths[1:]):
        level = (
            level.groupBy(
                time_bucket("bucket_us", width).alias("bucket_us"), *keys
            )
            .agg(
                F.sum("n").alias("n"),
                F.sum("sum_value").alias("sum_value"),
            )
        )
        out = out.unionByName(
            level.select(F.lit(name).alias("resolution"), "*")
        )
    return out


def backfill_rollup_day(
    spark,
    events_df: DataFrame,
    out_path: str,
    day_us: int,
    keys: list[str],
    ts_us_col: str,
    value_col: str,
) -> None:
    """Recompute ONE day's rollup partition and swap it in place.

    The late-data answer for materialized rollups: when stragglers
    land for an old day, re-aggregate just that day from the fact
    (partition-pruned scan if the fact is day-partitioned; otherwise a
    pushed-down range filter) and dynamic-partition-overwrite the
    single `day=` directory — every other day's files are untouched,
    and replaying the same backfill is idempotent.
    """
    day_len = 86_400_000_000
    one_day = events_df.filter(
        (F.col(ts_us_col) >= day_us) & (F.col(ts_us_col) < day_us + day_len)
    )
    agg = (
        one_day.groupBy(
            time_bucket(ts_us_col, 3_600_000_000).alias("bucket_us"), *keys
        )
        .agg(F.count("*").alias("n"), F.sum(value_col).alias("sum_value"))
        .withColumn("day", F.lit(day_us))
    )
    (
        agg.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day")
        .parquet(out_path)
    )


def sessionize(
    df: DataFrame,
    ts_col: str,
    by: str | list[str],
    gap: int,
    session_col: str = "session_id",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Assign a per-key session id: a new session starts when the gap
    from the previous event exceeds ``gap`` (same units as ``ts_col``;
    use integer epochs). The classic lag→flag→cumulative-sum: both
    windows share one shuffle on the key, no self-join. Session ids
    are 0-based and ordered by time within each key."""
    by_cols = [by] if isinstance(by, str) else list(by)
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*by_cols).orderBy(*order)
    new_flag = (
        F.when(
            F.lag(ts_col).over(w).isNull()
            | ((F.col(ts_col) - F.lag(ts_col).over(w)) > gap),
            1,
        ).otherwise(0)
    )
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(
        session_col, (F.sum(new_flag).over(wc) - 1).cast("bigint")
    )


def mad_outlier_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    z: float = 3.0,
) -> DataFrame:
    """Robust per-group outlier statistics via median / MAD (median
    absolute deviation): a point is an outlier when
    ``|v - median| > z * 1.4826 * MAD`` — 1.4826 makes MAD a consistent
    sigma estimator under normality, and unlike mean/stddev the
    threshold itself is not dragged by the outliers it is meant to
    catch (the classic failure of z-score gating on heavy-tailed
    telemetry or quality-score columns).

    Two passes by construction (MAD needs the median first): each is a
    sort-based exact-percentile aggregate per group with map-side
    partials, and the tiny per-group stats frame broadcasts back onto
    the stream — the group cardinality (event types, sources, metrics)
    is what's small, not the data. For sketch-accuracy-is-enough cases
    at 100 TB, swap ``percentile`` for ``approx_percentile`` and both
    passes keep the same shape at O(1) memory per group.

    Returns one row per group: n, median, mad, n_outliers.
    """
    # Column-based percentile (no SQL splicing — a value_col needing
    # backticks would break F.expr); null-safe join keys so a NULL
    # group_col stratum keeps its stats row instead of silently
    # vanishing through the equi-joins.
    med = df.groupBy(group_col).agg(
        F.percentile(F.col(value_col), F.lit(0.5)).alias("_med")
    ).withColumnRenamed(group_col, "__mg")
    dev = (
        df.join(
            F.broadcast(med), F.col(group_col).eqNullSafe(F.col("__mg"))
        )
        .drop("__mg")
        .withColumn("_adev", F.abs(F.col(value_col) - F.col("_med")))
    )
    mad = dev.groupBy(group_col).agg(
        F.percentile(F.col("_adev"), F.lit(0.5)).alias("_mad")
    ).withColumnRenamed(group_col, "__dg")
    return (
        dev.join(
            F.broadcast(mad), F.col(group_col).eqNullSafe(F.col("__dg"))
        )
        .drop("__dg")
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.first("_med"), 6).alias("median"),
            F.round(F.first("_mad"), 6).alias("mad"),
            F.sum(
                F.when(
                    F.col("_adev") > z * 1.4826 * F.col("_mad"), 1
                ).otherwise(0)
            ).alias("n_outliers"),
        )
    )


def merge_intervals(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Merge overlapping/touching [start, end] intervals per key into
    maximal islands — the gaps-and-islands coalesce (validity windows,
    maintenance windows, per-user activity spans).

    Single-shuffle shape: one window over (key, start-order) computes
    the running max of ``end`` over preceding rows; a row starts a new
    island iff its start exceeds that max (strictly — touching
    intervals merge); the island id is a running sum of the flags over
    the same window ordering, and one groupBy((key, island)) emits
    (key, island_start, island_end, n_merged). Both window passes and
    the final aggregate share the hash partitioning on ``key``.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(start_col).asc(), F.col(end_col).asc()
    )
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = df.withColumn(
        "_new",
        F.when(
            prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1
        ).otherwise(0),
    ).withColumn(
        "_island",
        F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return flagged.groupBy(key_col, "_island").agg(
        F.min(start_col).alias("island_start"),
        F.max(end_col).alias("island_end"),
        F.count(F.lit(1)).alias("n_merged"),
    ).drop("_island")
