"""As-of join (SURVEY.md §2.3 J7) — Polars ``join_asof`` analog.

Spark has no native as-of join. This composes one from built-ins with
the union+window trick:

1. tag left (probe) and right (reference) rows and union them on the
   (key, time) axis;
2. ``last(right_value, ignoreNulls=True)`` over
   ``partitionBy(key).orderBy(time, tag)`` carries the most recent
   reference row forward onto each probe row;
3. filter back to probe rows.

One shuffle total (the window partition-by), same as a sort-merge join
would cost — and unlike a naive range join it never materializes the
O(left × right) candidate pairs, so it survives 100 TB event tables.
Ties (equal timestamps) match the reference row (tag ordering puts
right rows first), i.e. "backward" inclusive semantics — identical to
DuckDB ``ASOF JOIN`` / Polars ``strategy='backward'``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def join_asof(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str] | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    allow_exact_matches: bool = True,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.on <= left.on`` (strict ``<`` when not
    ``allow_exact_matches``), matching on the ``by`` key(s).

    ``right_cols``: right columns to carry (default: all but key/time).
    Carried columns colliding with left names get ``suffix``.
    """
    by_cols = [by] if isinstance(by, str) else list(by or [])
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on and c not in by_cols]
    out_names = {
        c: c + suffix if c in left.columns else c for c in right_cols
    }

    lhs = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(out_names[c])
          for c in right_cols],
    )
    rhs = right.select(
        *[F.col(c) if c in by_cols + [on] else F.lit(None).cast(
            left.schema[c].dataType).alias(c) for c in left.columns],
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(out_names[c]) for c in right_cols],
    )
    # right rows sort before left rows at equal timestamps iff exact
    # matches are allowed.
    tag_order = F.col("__is_left").asc() if allow_exact_matches else F.col(
        "__is_left").desc()
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col(on).asc(), tag_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = lhs.unionByName(rhs).select(
        *[c for c in left.columns],
        F.col("__is_left"),
        *[
            F.last(out_names[c], ignorenulls=True).over(w).alias(out_names[c])
            for c in right_cols
        ],
    )
    return filled.filter(F.col("__is_left") == 1).drop("__is_left")
