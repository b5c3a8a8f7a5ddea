"""As-of join (SURVEY.md §2.3 J7) — Polars ``join_asof`` analog.

Spark has no native as-of join. This composes one from built-ins with
the union+window trick:

1. tag left (probe) and right (reference) rows and union them on the
   (key, time) axis;
2. carry the nearest reference row onto each probe row with
   ``last(..., ignoreNulls=True)`` (backward) / ``first(...)``
   (forward) over ``partitionBy(key).orderBy(time, tag)``;
3. filter back to probe rows.

One shuffle total (the window partition-by), same as a sort-merge join
would cost — and unlike a naive range join it never materializes the
O(left × right) candidate pairs, so it survives 100 TB event tables.

Strategies (Polars ``join_asof`` parity):

- ``backward`` (default): latest right row with ``right.on <= left.on``
  (strict ``<`` when ``allow_exact_matches=False``) — identical to
  DuckDB ``ASOF JOIN`` / Polars ``strategy='backward'``.
- ``forward``: earliest right row with ``right.on >= left.on``.
- ``nearest``: whichever of the two is closer in ``on``; ties prefer
  the backward match (documented deviation: Polars ties are
  implementation-defined).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F



def _ref(name: str):
    """Exact-name column reference: backtick-quoted so dots/spaces in
    user column names never parse as struct-field paths."""
    return F.col("`" + name.replace("`", "``") + "`")


def join_asof(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str] | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    allow_exact_matches: bool = True,
    strategy: str = "backward",
    tolerance: int | float | None = None,
) -> DataFrame:
    """Attach the as-of matching right row's columns to each left row.

    ``right_cols``: right columns to carry (default: all but key/time).
    Carried columns colliding with left names get ``suffix``.
    ``tolerance`` (polars ``merge_asof`` parity): a match farther than
    this from the left row's ``on`` value is nulled out — requires a
    NUMERIC ``on`` column (convert timestamps to epoch ints first).
    Applied as a post-pick null-out, so it adds zero shuffles.
    """
    if strategy not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown as-of strategy: {strategy!r}")
    by_cols = [by] if isinstance(by, str) else list(by or [])
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on and c not in by_cols]
    out_names = {
        c: c + suffix if c in left.columns else c for c in right_cols
    }

    # the carried payload: right's `on` value + requested columns, as one
    # struct so each window evaluates once regardless of column count.
    # Built as a StructType, not a DDL string — simpleString/raw names
    # spliced into DDL break on columns needing backticks (dots,
    # spaces, hyphens).
    from pyspark.sql.types import StructField, StructType

    payload_t = StructType(
        [StructField("__t", right.schema[on].dataType)]
        + [
            StructField(out_names[c], right.schema[c].dataType)
            for c in right_cols
        ]
    )
    # df[name] indexing throughout, never F.col(name): a column named
    # "price.usd" would otherwise parse as a struct-field path
    lhs = left.select(
        *[_ref(c) for c in left.columns],
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(payload_t).alias("__payload"),
    )
    rhs = right.select(
        *[_ref(c) if c in by_cols + [on] else F.lit(None).cast(
            left.schema[c].dataType).alias(c) for c in left.columns],
        F.lit(0).alias("__is_left"),
        F.struct(
            _ref(on).alias("__t"),
            *[_ref(c).alias(out_names[c]) for c in right_cols],
        ).cast(payload_t).alias("__payload"),
    )
    unioned = lhs.unionByName(rhs)

    # At equal `on`, whether a right row is visible to a left row is
    # decided purely by sort order within the frame:
    #   backward frame = (unbounded preceding .. current row)
    #     exact matches allowed  -> right sorts BEFORE left
    #   forward frame = (current row .. unbounded following)
    #     exact matches allowed  -> right sorts AFTER left
    # `nearest` needs both; with exact matches a tie belongs to backward,
    # without, the row must be invisible to both.
    # Tertiary sort on the payload struct pins WHICH right row wins
    # among duplicates at the same (key, on): without it the pick is
    # whatever the partition sort happened to place last — result
    # drift across reruns/repartitionings. Payload order only
    # rearranges rows within a (on, tag) block (left rows are all-NULL
    # there), so left/right visibility is untouched. Policy: backward
    # picks the payload-struct MAX, forward the MIN (lexicographic by
    # carried columns) — deterministic, engine-portable.
    bwd_tag = F.col("__is_left").asc() if allow_exact_matches else F.col("__is_left").desc()
    fwd_tag = F.col("__is_left").desc() if allow_exact_matches else F.col("__is_left").asc()
    w_bwd = (
        Window.partitionBy(*[_ref(c) for c in by_cols])
        .orderBy(
            _ref(on).asc(), bwd_tag, F.col("__payload").asc_nulls_first()
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the forward pick runs over the exactly-REVERSED total order with a
    # GROWING frame, never `first` over [current, unbounded following]:
    # Spark streams growing frames in O(rows) but re-aggregates a
    # shrinking frame from scratch per row — O(rows²) per key partition,
    # a 100 TB killer when keys have deep histories. last-non-null over
    # the reversed order is positionally identical to first-non-null
    # over the forward order (the secondary tag flips direction so the
    # total order reverses exactly).
    fwd_tag_rev = F.col("__is_left").asc() if allow_exact_matches else F.col("__is_left").desc()
    w_fwd = (
        Window.partitionBy(*[_ref(c) for c in by_cols])
        .orderBy(
            _ref(on).desc(), fwd_tag_rev,
            # exact reversal of the forward order's asc_nulls_first
            F.col("__payload").desc_nulls_last(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    cols_out = [*[_ref(c) for c in left.columns], F.col("__is_left")]
    if strategy == "backward":
        picked = F.last("__payload", ignorenulls=True).over(w_bwd)
        filled = unioned.select(*cols_out, picked.alias("__m"))
    elif strategy == "forward":
        picked = F.last("__payload", ignorenulls=True).over(w_fwd)
        filled = unioned.select(*cols_out, picked.alias("__m"))
    else:  # nearest
        b = F.last("__payload", ignorenulls=True).over(w_bwd)
        f_ = F.last("__payload", ignorenulls=True).over(w_fwd)
        t = _ref(on)
        picked = (
            F.when(b.isNull(), f_)
            .when(f_.isNull(), b)
            # tie (equidistant) prefers backward: <=
            .when((t - b["__t"]) <= (f_["__t"] - t), b)
            .otherwise(f_)
        )
        filled = unioned.select(*cols_out, picked.alias("__m"))

    m = F.col("__m")
    if tolerance is not None:
        m = F.when(
            F.abs(_ref(on) - F.col("__m")["__t"]) <= F.lit(tolerance),
            F.col("__m"),
        )
    return (
        filled.filter(F.col("__is_left") == 1)
        .select(
            *[_ref(c) for c in left.columns],
            *[m[out_names[c]].alias(out_names[c]) for c in right_cols],
        )
    )
