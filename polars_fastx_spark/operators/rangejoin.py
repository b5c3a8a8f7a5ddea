"""Binned range join — interval predicates as equi-joins.

A range join with NO equality key (point ∈ [lo, hi] across unrelated
tables) defaults to BroadcastNestedLoop/cartesian in Spark — O(N·M)
predicate evaluations, a scale cliff. The standard fix is BINNING:
quantize the range dimension into fixed-width buckets, explode each
interval to the buckets it covers, tag each point with its single
bucket, and equi-join on the bucket id before applying the exact
predicate. The shuffle is then hash(bucket) — fully parallel — and
each pair is examined once (a point lives in exactly ONE bucket, so
point-in-interval needs no post-join dedup).

Bin width trades explode factor (≈ interval_len / width + 1 rows per
interval) against bucket selectivity; pick it near the typical
interval length. Works on any integer dimension — callers convert
timestamps to epoch seconds/µs first (integer bins survive engine
parity where interval arithmetic does not, SURVEY.md §4.4.1).

Reference parity: no join surface in the reference (joins come from the
host frame, SURVEY.md §2.3); north-star extension per /root/repo/BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    p_col: str,
    intervals: DataFrame,
    lo_col: str,
    hi_col: str,
    bin_width: int,
) -> DataFrame:
    """Inner-join each point to every interval with lo ≤ p < hi
    (half-open). Both inputs keep all their columns; names must not
    collide. The plan is explode → equi-join on ``_bin`` → exact
    predicate; never a nested-loop join. Degenerate intervals
    (hi ≤ lo) match nothing but must not break the explode.
    """
    w = F.lit(bin_width)

    def _floordiv(c):
        # exact integer FLOOR division at any magnitude: `/` promotes
        # to double and rounds above 2^53 (epoch-ns values ~1.7e18
        # would land in the wrong bin and silently miss matches);
        # subtracting pmod first makes the dividend an exact multiple,
        # so integral `div` is both exact and floor-correct for
        # negative dimensions too
        return F.call_function("div", c - F.pmod(c, w), w)

    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                _floordiv(F.col(lo_col)),
                # hi is exclusive: a hi on a bin boundary doesn't reach
                # into the next bin; greatest() keeps the sequence
                # ascending for degenerate hi ≤ lo intervals
                _floordiv(F.greatest(F.col(hi_col) - 1, F.col(lo_col))),
            )
        ),
    )
    pt = points.withColumn("_bin", _floordiv(F.col(p_col)))
    cond = (
        (F.col(lo_col) <= F.col(p_col))
        & (F.col(p_col) < F.col(hi_col))
    )
    return pt.join(iv, on=["_bin"], how="inner").filter(cond).drop("_bin")
