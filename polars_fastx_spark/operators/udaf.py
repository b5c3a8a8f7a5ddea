"""User-defined aggregation surface (SURVEY.md §2.10 X5/X6).

The reference's only extension mechanism is per-row ``map_elements``
(reference: src/polars_fastx/fastx_parsers.py:41,50,65-67). Spark's
richer surface gets first-class examples here, each Arrow-batched:

- **grouped-agg pandas UDF** (X5): one scalar per group, usable inside
  ``groupBy().agg()`` alongside built-ins. Example: Shannon entropy of
  a value distribution — partial aggregation does NOT apply to pandas
  grouped aggs (all group rows ship to one worker), so these are for
  moderate group sizes; unbounded-cardinality groups should use the
  SQL twin below instead.
- **applyInPandas** (X5): full DataFrame → DataFrame per group.
  Example: per-group z-score normalization — the shape that covers
  "fit something per group, emit transformed rows".
- **SQL twins**: every UDF here has a pure-SQL equivalent used by the
  catalog's oracle checks — the UDFs exist to pin the extension
  mechanism, the SQL path is what you'd run at 100 TB.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


@pandas_udf(DoubleType())
def shannon_entropy(v: pd.Series) -> float:
    """Grouped-agg pandas UDF: Shannon entropy (nats) of the empirical
    distribution of values in the group."""
    import numpy as np

    counts = v.value_counts(dropna=True).to_numpy(dtype="float64")
    if counts.sum() == 0:
        return 0.0
    p = counts / counts.sum()
    return float(-(p * np.log(p)).sum())


def entropy_sql(col: str) -> F.Column:
    """Pure-SQL Shannon entropy twin — composes from two grouped
    aggregations at any scale (use via :func:`entropy_by_group`)."""
    raise NotImplementedError(
        "entropy needs a two-level groupBy; use entropy_by_group()"
    )


def entropy_by_group(df: DataFrame, group: str, value: str) -> DataFrame:
    """Pure-SQL per-group Shannon entropy: two shuffle-partial-friendly
    groupBys, no Python — the 100 TB path.

    H(g) = -Σ_v (n_gv / n_g) · ln(n_gv / n_g)

    NULL values are dropped before counting — matching
    :func:`shannon_entropy`'s ``value_counts(dropna=True)`` — so the
    two twins agree on null-containing data (a NULL is a missing
    observation, not a distribution category).
    """
    counts = (
        df.filter(F.col(value).isNotNull())
        .groupBy(group, value)
        .agg(F.count("*").alias("n_gv"))
    )
    return (
        counts.groupBy(group)
        .agg(
            F.sum("n_gv").alias("n_g"),
            F.sum(F.col("n_gv") * F.log("n_gv")).alias("sum_n_ln_n"),
        )
        .select(
            F.col(group),
            (F.log("n_g") - F.col("sum_n_ln_n") / F.col("n_g")).alias("entropy"),
        )
    )


def zscore_by_group(
    df: DataFrame, group: str, value: str, out: str = "zscore"
) -> DataFrame:
    """applyInPandas per-group z-score: (x - mean) / stddev_samp.

    Groups with stddev 0 (or a single row) yield null. Each group is
    processed as one pandas DataFrame on one worker — fine when single
    groups fit in memory; the window-function twin below has no such
    limit.
    """
    # a StructType, not interpolated DDL text: a column named
    # 'account bal' or 'a.b' must not break the schema parse
    from pyspark.sql.types import StructField, StructType

    schema = StructType(
        df.schema.fields + [StructField(out, DoubleType())]
    )

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[value]
        sd = x.std(ddof=1)
        pdf[out] = (x - x.mean()) / sd if sd and sd > 0 else None
        return pdf

    return df.groupBy(group).applyInPandas(norm, schema)


def zscore_by_group_sql(
    df: DataFrame, group: str, value: str, out: str = "zscore"
) -> DataFrame:
    """Window-function z-score twin: identical semantics, pure SQL,
    scales to any group cardinality (one shuffle on the group key)."""
    from pyspark.sql import Window

    w = Window.partitionBy(group)
    sd = F.stddev_samp(value).over(w)
    return df.withColumn(
        out,
        F.when(sd > 0, (F.col(value) - F.avg(value).over(w)) / sd),
    )
