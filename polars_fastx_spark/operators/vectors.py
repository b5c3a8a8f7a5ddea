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


def assign_nearest(
    df: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
    out_col: str = "cluster",
) -> DataFrame:
    """Tag each row with the index of its nearest centroid (squared
    L2). Centroids arrive as plain Python lists (k × dim — KBs), become
    a broadcast one-row-per-centroid relation, and the k×N candidate
    set collapses back with ``min_by`` — no Python on the row path."""
    sp = df.sparkSession
    cen = F.broadcast(
        sp.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(centroids)],
            "_cid int, _cvec array<double>",
        )
    )
    dist = F.aggregate(
        F.zip_with(
            F.col(vec_col).cast("array<double>"),
            F.col("_cvec"),
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    keys = [c for c in df.columns]
    return (
        df.crossJoin(cen)
        .withColumn("_dist", dist)
        .groupBy(*keys)
        .agg(F.min_by("_cid", "_dist").alias(out_col))
    )


def kmeans(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    iterations: int = 10,
) -> tuple[DataFrame, list[list[float]]]:
    """Lloyd's k-means as a DataFrame loop (the IVF training step).

    Seeding is content-addressed (k rows with the smallest
    ``md5(id)``) — deterministic across runs and partitionings, no RNG.
    Per iteration: broadcast the k×dim centroid table (KBs), assign via
    ``min_by`` over the broadcast cross product (one shuffle for the
    per-row min), recompute centroids with ``group_centroids`` (two
    shuffles, map-side partials); only k centroid rows ever reach the
    driver. Returns (assignments, final centroids).
    """
    seeds = [
        [float(x) for x in r.v]
        for r in df.select(
            F.md5(F.col(id_col).cast("string")).alias("h"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .orderBy("h")
        .limit(k)
        .collect()
    ]
    cents = seeds
    assigned = None
    for _ in range(iterations):
        assigned = assign_nearest(df, vec_col, cents)
        new = {
            r.cluster: [float(x) for x in r.centroid]
            for r in group_centroids(
                assigned, ["cluster"], vec_col
            ).collect()
        }
        # a cluster that lost all members keeps its previous centroid
        cents = [new.get(i, cents[i]) for i in range(k)]
    return assigned, cents
