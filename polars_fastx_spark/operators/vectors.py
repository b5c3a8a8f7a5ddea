"""Vector aggregation — element-wise centroids without leaving SQL.

Element-wise mean over array columns is the building block of IVF
centroid training, class prototypes, and embedding pooling. The
distributed shape is posexplode → two-level aggregate keyed on
(group, position) → re-assemble ordered — every step a built-in JVM
operator, so centroids over 100 TB of embeddings are just two shuffles
(partial aggregation does the heavy lifting map-side) and no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_centroids(
    df: DataFrame,
    key_cols: list[str],
    vec_col: str,
    decimals: int | None = None,
) -> DataFrame:
    """Per-key element-wise mean of ``vec_col`` (equal-length arrays).

    Returns (keys..., centroid array<double>). ``decimals`` rounds each
    element (oracle canonicalization; summation order across engines
    differs in the last float ulps).
    """
    ex = df.select(
        *key_cols, F.posexplode(vec_col).alias("pos", "val")
    )
    per_pos = ex.groupBy(*key_cols, "pos").agg(
        F.avg(F.col("val").cast("double")).alias("v")
    )
    elem = (
        (lambda s: F.round(s["v"], decimals))
        if decimals is not None
        else (lambda s: s["v"])
    )
    return per_pos.groupBy(*key_cols).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "v"))), elem
        ).alias("centroid")
    )
