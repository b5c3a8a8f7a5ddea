"""Vector similarity search (SURVEY.md §2.11 L3) over array<float> columns.

Three tiers, all returning the same logical result shape:

1. ``cosine_topk_pairs_sql`` — pure-SQL brute force. The oracle twin:
   every step is ANSI-expressible, used for correctness checks. Norms
   are precomputed ONCE per side (the naive per-pair recompute is what
   made the vanilla baseline 37 s — BASELINE.md q_vec_knn).
2. ``cosine_topk_numpy`` — Arrow-batched block matrix multiply
   (mapInPandas + numpy): the small side is collected (bounded!),
   L2-normalized, and broadcast; each Arrow batch of the big side does
   one BLAS ``block @ matrixᵀ``. This is the single-node fast path and
   the distributed pattern for exact k-NN at scale: no shuffle at all,
   broadcast + map-side top-k, then one small global top-k.
3. ``ann_lsh_buckets`` — random-hyperplane LSH bucketing: the scale
   path when even one pass of exact dot products is too much. Vectors
   land in sign-pattern buckets; candidate pairs only form within a
   bucket (one groupBy), then exact cosine re-ranks. Deterministic
   hyperplanes from a seed (xxhash64-derived), so results are stable.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F


def dot(a: F.Column, b: F.Column) -> F.Column:
    """Σ aᵢbᵢ via zip_with+aggregate — JVM higher-order, no UDF."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(v: F.Column) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine(a: F.Column, b: F.Column, norm_a: F.Column, norm_b: F.Column) -> F.Column:
    return dot(a, b) / F.nullif(norm_a * norm_b, F.lit(0.0))


def with_l2_norm(df: DataFrame, vec_col: str, out: str = "norm") -> DataFrame:
    return df.withColumn(out, l2_norm(F.col(vec_col)))


def cosine_topk_pairs_sql(
    df: DataFrame, id_col: str, vec_col: str, k: int = 5
) -> DataFrame:
    """Brute-force top-k most-similar pairs (id_a < id_b), pure SQL.

    Norms precomputed once per row before the self-join; the join is a
    broadcast nested-loop on ``id_a < id_b``. O(n²) dot products — use
    only as an oracle / small-n path; physical plan is
    TakeOrderedAndProject so no full sort materializes.
    """
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    ).withColumn("__n", l2_norm(F.col("__v")))
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, F.col("a.__id") < F.col("b.__id"))
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            cosine(
                F.col("a.__v"), F.col("b.__v"), F.col("a.__n"), F.col("b.__n")
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), "id_a", "id_b")
        .limit(k)
    )


def cosine_topk_numpy(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    query_df: DataFrame | None = None,
) -> DataFrame:
    """Exact top-k pairs via Arrow-batched numpy block matmul.

    ``query_df`` defaults to ``df`` (all-pairs self-similarity, emitting
    id_a < id_b). The reference side (``df``) is collected to the driver
    and broadcast — it must be the SMALL side (an index of millions of
    64-dim float32 vectors is a few GB; beyond that use
    :func:`ann_lsh_buckets`). The big side streams through mapInPandas:
    zero shuffle, one BLAS gemm per Arrow batch, per-batch top-k, then a
    global top-k of batch winners (tiny).
    """
    import numpy as np

    spark = df.sparkSession
    ref_rows = df.select(id_col, vec_col).collect()
    ref_ids = np.array([r[0] for r in ref_rows], dtype=np.int64)
    ref = np.array([r[1] for r in ref_rows], dtype=np.float64)
    norms = np.linalg.norm(ref, axis=1)
    norms[norms == 0.0] = np.inf  # zero vectors similar to nothing
    ref_normed = ref / norms[:, None]
    b_ids = spark.sparkContext.broadcast(ref_ids)
    b_mat = spark.sparkContext.broadcast(ref_normed)
    self_pairs = query_df is None
    q = (query_df or df).select(id_col, vec_col)

    def block_topk(batches):
        import pandas as pd

        ids = b_ids.value
        mat = b_mat.value
        pos = {v: i for i, v in enumerate(ids)} if self_pairs else None
        for pdf in batches:
            qids = pdf.iloc[:, 0].to_numpy(dtype=np.int64)
            qm = np.array(list(pdf.iloc[:, 1]), dtype=np.float64)
            qn = np.linalg.norm(qm, axis=1)
            qn[qn == 0.0] = np.inf
            sims = (qm / qn[:, None]) @ mat.T
            if self_pairs:
                # keep only id_a < id_b half-matrix
                for row_i, qid in enumerate(qids):
                    sims[row_i, ids <= qid] = -np.inf
            kk = min(k, sims.shape[1])
            idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            out_a, out_b, out_s = [], [], []
            for row_i in range(sims.shape[0]):
                for j in idx[row_i]:
                    s = sims[row_i, j]
                    if s != -np.inf:
                        out_a.append(qids[row_i])
                        out_b.append(ids[j])
                        out_s.append(float(s))
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b, "cosine": out_s})

    cand = q.mapInPandas(block_topk, "id_a long, id_b long, cosine double")
    return cand.orderBy(F.col("cosine").desc(), "id_a", "id_b").limit(k)


def ann_lsh_buckets(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    num_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane LSH bucket assignment (sign pattern → bucket).

    Deterministic hyperplanes: plane p component i =
    sin(xxhash64-free pure function of (seed, p, i)) — computed as a
    Column expression so no RNG state ships to executors. Use the
    bucket for candidate generation; re-rank candidates with
    :func:`cosine`.
    """
    planes = []
    rngbase = float(seed)
    for p in range(num_planes):
        comps = [
            math.sin(rngbase + 1.0 + p * 1013.0 + i * 9.17) for i in range(dim)
        ]
        planes.append(comps)
    v = F.col(vec_col)
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    v,
                    F.array(*[F.lit(c) for c in comps]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0,
            F.lit(1),
        ).otherwise(F.lit(0))
        for comps in planes
    ]
    bucket = bits[0]
    for bcol in bits[1:]:
        bucket = bucket * 2 + bcol
    return df.withColumn("bucket", bucket)


def cosine_pairs_above_numpy(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
) -> DataFrame:
    """All pairs (id_a < id_b) with cosine ≥ threshold, via the same
    broadcast block-matmul as :func:`cosine_topk_numpy`.

    Replaces the O(n²) interpreted-expression nested-loop join for
    threshold search: one BLAS gemm per Arrow batch against the
    broadcast normalized index (measured ~30 s → ~1 s at 2000×64 dims).
    Same constraint: the index side must fit on the driver; beyond
    that, prune candidates with :func:`ann_lsh_buckets` / IVF cells
    first.
    """
    import numpy as np

    spark = df.sparkSession
    ref_rows = df.select(id_col, vec_col).collect()
    ref_ids = np.array([r[0] for r in ref_rows], dtype=np.int64)
    ref = np.array([r[1] for r in ref_rows], dtype=np.float64)
    norms = np.linalg.norm(ref, axis=1)
    norms[norms == 0.0] = np.inf
    ref_normed = ref / norms[:, None]
    b_ids = spark.sparkContext.broadcast(ref_ids)
    b_mat = spark.sparkContext.broadcast(ref_normed)

    def block_pairs(batches):
        import pandas as pd

        ids = b_ids.value
        mat = b_mat.value
        for pdf in batches:
            qids = pdf.iloc[:, 0].to_numpy(dtype=np.int64)
            qm = np.array(list(pdf.iloc[:, 1]), dtype=np.float64)
            qn = np.linalg.norm(qm, axis=1)
            qn[qn == 0.0] = np.inf
            sims = (qm / qn[:, None]) @ mat.T
            rows, cols = np.where(
                (sims >= threshold) & (qids[:, None] < ids[None, :])
            )
            yield pd.DataFrame(
                {"id_a": qids[rows], "id_b": ids[cols]}
            )

    return df.select(id_col, vec_col).mapInPandas(
        block_pairs, "id_a long, id_b long"
    )


def ivf_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    num_cells: int = 16,
    seed_stride: int = 7,
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantization: pick deterministic centroids, assign
    every vector to its nearest cell.

    Centroids are real data vectors sampled deterministically (every
    ``seed_stride``-th row by ascending id — no RNG, stable across
    runs/retries). Assignment is a broadcast join against the tiny
    centroid table + one ``max_by`` groupBy — no O(n²) stage, no
    iterative k-means (good-enough cells for candidate pruning; swap in
    trained centroids without changing the pipeline shape).

    Returns (assigned, centroids): ``assigned`` = df columns +
    ``cell``; ``centroids`` = (cell, centroid_vec, centroid_norm).
    """
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    ).withColumn("__n", l2_norm(F.col("__v")))
    w = Window.orderBy("__id")
    centroids = (
        base.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") - 1) % seed_stride == 0)
        .limit(num_cells)
        .select(
            (F.row_number().over(Window.orderBy("__id")) - 1).alias("cell"),
            F.col("__v").alias("centroid_vec"),
            F.col("__n").alias("centroid_norm"),
        )
    )
    scored = base.join(F.broadcast(centroids)).select(
        "__id", "__v", "__n", "cell",
        cosine(
            F.col("__v"), F.col("centroid_vec"),
            F.col("__n"), F.col("centroid_norm"),
        ).alias("__sim"),
    )
    assigned = (
        scored.groupBy("__id")
        .agg(
            F.max_by("cell", "__sim").alias("cell"),
            F.first("__v").alias("__v"),
            F.first("__n").alias("__n"),
        )
    )
    return assigned, centroids


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    num_cells: int = 16,
) -> DataFrame:
    """Approximate top-k most-similar pairs, candidates limited to
    same-IVF-cell vectors (one equi-join on ``cell``), exact cosine
    re-rank. The IVF analog of :func:`ann_topk_via_lsh` — candidate
    volume Σ|cell|² instead of n²."""
    assigned, _ = ivf_assign(df, id_col, vec_col, num_cells)
    a, b = assigned.alias("a"), assigned.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.cell") == F.col("b.cell"),
                F.col("a.__id") < F.col("b.__id"),
            ],
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            cosine(
                F.col("a.__v"), F.col("b.__v"), F.col("a.__n"), F.col("b.__n")
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), "id_a", "id_b")
        .limit(k)
    )


def ann_topk_via_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 5,
    num_planes: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k pairs: candidates within LSH buckets only."""
    b = ann_lsh_buckets(df, id_col, vec_col, dim, num_planes, seed).select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
        "bucket",
    ).withColumn("__n", l2_norm(F.col("__v")))
    a, c = b.alias("a"), b.alias("b")
    return (
        a.join(
            c,
            on=[
                F.col("a.bucket") == F.col("b.bucket"),
                F.col("a.__id") < F.col("b.__id"),
            ],
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            cosine(
                F.col("a.__v"), F.col("b.__v"), F.col("a.__n"), F.col("b.__n")
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), "id_a", "id_b")
        .limit(k)
    )
