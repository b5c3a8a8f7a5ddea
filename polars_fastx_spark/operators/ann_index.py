"""Persisted IVF-PQ ANN index — build once, serve many queries.

The LSH band table (operators/dedup.py:minhash_band_table +
neardup_gate) established this engine's persisted-index pattern:
materialize per-item evidence as a parquet table, gate/extend
incrementally, never recompute history. This module is the
similarity-search twin. A 100 TB deployment builds the index in one
pass, then every query opens three tiny tables (centroids, codebooks,
meta — KBs) plus the code table (m bytes per vector), and every
ingest batch encodes ONLY its own vectors against the frozen
quantizers — cost scales with the batch, like the band-index gate.

Layout under ``path/``::

    meta/           one row: id_col, num_cells, m, pq_k, dim, pinned
    centroids/      (cell, centroid_vec, centroid_norm)  ≤num_cells rows
    books/          (j, c, cvec)                          m·pq_k rows
    codes/epoch=N/  (__id, cell, codes)                   1 row/vector

Search math is :func:`polars_fastx_spark.operators.vectors.adc_search`
— the SAME code path as the in-query ``ivfpq_topk``, so a search over
the persisted index replays the pinned-codebook oracle bit-for-bit
(doubles round-trip parquet exactly).

Reference parity: the reference (apcamargo/polars-fastx) has no
vector surface; north-star extension per /root/repo/BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from polars_fastx_spark.operators import vectors

#: meta table schema (one row per index)
META_SCHEMA = (
    "id_col string, num_cells int, m int, pq_k int, dim int, pinned boolean"
)


def index_build(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    path: str,
    num_cells: int = 16,
    m: int = 8,
    pq_k: int = 8,
    pinned: bool = False,
    iterations: int = 3,
) -> None:
    """One-pass index build: IVF-assign the corpus, product-quantize
    the RESIDUALS (v − cell centroid — the classic IVFPQ encoding),
    and land centroids/books/meta (tiny, single-file) plus the code
    table (``codes/epoch=0``) as parquet.

    ``pinned=True`` uses the md5-seeded zero-training codebooks
    (fully SQL-replayable — the oracle-checkable configuration);
    ``pinned=False`` (production default) runs the multi-subspace
    k-means of ``vectors.pq_train`` for ``iterations`` rounds. Either
    way only num_cells + m·pq_k centroid rows ever reach the driver.
    """
    from polars_fastx_spark.operators.similarity import ivf_assign

    spark = df.sparkSession
    assigned, centroids = ivf_assign(df, id_col, vec_col, num_cells)
    with_cent = assigned.join(F.broadcast(centroids), "cell")
    # persisted across the eager codebook-construction jobs (dim probe,
    # seed collect, training collects) — same lifecycle as ivfpq_topk
    resid = with_cent.select(
        "__id", "cell",
        F.zip_with("__v", "centroid_vec", lambda a, b: a - b).alias("__r"),
    ).persist()
    try:
        if pinned:
            books = vectors.pq_seed_books(resid, "__id", "__r", m=m, k=pq_k)
            codes = vectors.pq_encode(resid, "__id", "__r", books)
        else:
            codes, books = vectors.pq_train(
                resid, "__id", "__r", m=m, k=pq_k, iterations=iterations
            )
        coded = codes.join(resid.select("__id", "cell"), "__id")
        dim = m * len(books[0][0])
        centroids.coalesce(1).write.mode("overwrite").parquet(
            f"{path}/centroids"
        )
        spark.createDataFrame(
            [(j, c, books[j][c]) for j in range(m) for c in range(pq_k)],
            "j int, c int, cvec array<double>",
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/books")
        spark.createDataFrame(
            [(id_col, num_cells, m, pq_k, dim, pinned)], META_SCHEMA
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")
        coded.write.mode("overwrite").parquet(f"{path}/codes/epoch=0")
    finally:
        resid.unpersist()


def index_add(
    df: DataFrame,
    vec_col: str,
    path: str,
    id_col: str | None = None,
    epoch: int | None = None,
) -> int:
    """Incremental add: encode a NEW batch of vectors against the
    index's FROZEN centroids and codebooks and append the codes as
    ``codes/epoch=<next>`` — history is never recomputed, cost scales
    with the batch (the band-index-gate contract). Routing goes
    through the exact assignment (``similarity.ivf_assign_to``) and
    encode (``vectors.pq_encode``) paths the build used, so
    add == rebuild code-for-code under the same quantizers (pinned in
    tests). Returns the epoch id written.

    Epoch directories are overwritten whole, so a retried add with the
    same epoch id replaces itself instead of duplicating (the same
    idempotence move as ``stream_neardup_gate``). Pass an explicit
    ``epoch`` when the CALLER owns delivery semantics (the streaming
    ingest pins epoch ids to the micro-batch id, so a
    committed-but-redelivered batch overwrites itself — duplicate
    codes would DOUBLE a vector's ADC distance, not just duplicate a
    row); the default self-assigns the next uncommitted id.
    """
    from polars_fastx_spark.operators.similarity import ivf_assign_to

    spark = df.sparkSession
    meta = spark.read.parquet(f"{path}/meta").first()
    id_col = id_col or meta["id_col"]
    centroids = spark.read.parquet(f"{path}/centroids")
    books = _load_books(spark, path, meta["m"], meta["pq_k"])
    assigned = ivf_assign_to(df, id_col, vec_col, centroids)
    resid = assigned.join(F.broadcast(centroids), "cell").select(
        "__id", "cell",
        F.zip_with("__v", "centroid_vec", lambda a, b: a - b).alias("__r"),
    )
    codes = vectors.pq_encode(resid, "__id", "__r", books)
    coded = codes.join(resid.select("__id", "cell"), "__id")
    if epoch is None:
        epoch = _next_epoch(spark, f"{path}/codes")
    coded.write.mode("overwrite").parquet(f"{path}/codes/epoch={epoch}")
    return epoch


def index_search(
    spark: SparkSession,
    path: str,
    query: list[float],
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """Top-k ADC search over the persisted index: open centroids +
    books (bounded collects — KBs), stream the code table across all
    epochs, and rank with :func:`vectors.adc_search` — the identical
    query path ``ivfpq_topk`` uses, so persisted == in-query search
    result-for-result. Returns (<id_col>, adc_dist)."""
    meta = spark.read.parquet(f"{path}/meta").first()
    cent_rows = spark.read.parquet(f"{path}/centroids").collect()
    books = _load_books(spark, path, meta["m"], meta["pq_k"])
    coded = (
        spark.read.option("basePath", f"{path}/codes")
        .parquet(f"{path}/codes/epoch=*")
        .drop("epoch")
    )
    return vectors.adc_search(
        coded, cent_rows, books, query, meta["id_col"], k=k, nprobe=nprobe
    )


def index_search_many(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    query_id_col: str = "query_id",
    vec_col: str = "qvec",
) -> DataFrame:
    """Top-k ADC search for a TABLE of queries in one pass — the batch
    retrieval shape (training-pair mining, nightly eval suites), fully
    RELATIONAL: unlike :func:`index_search`, no per-query driver work
    at all, so a million-query batch plans exactly like a ten-query
    batch.

    Dataflow: queries × broadcast centroid table → cosine → per-query
    top-``nprobe`` cells (one window over nq·num_cells rows) → query
    residuals per probed cell → × broadcast codebook table → the
    (query, cell, j, c) ADC distance table (nq·nprobe·m·pq_k rows,
    built by executors, broadcast if small) → equi-join the exploded
    code table on (cell, j, c) — the probed-cell filter IS the join —
    → groupBy(query, id) → per-query top-k window. Cell/rank
    tie-breaks mirror :func:`index_search` (cosine desc, cell asc;
    dist asc, id asc), so a 1-row queries table reproduces it.

    Returns (query_id, <id_col>, adc_dist, rank).
    """
    from polars_fastx_spark.operators.partitioning import ensure_min_parallelism
    from polars_fastx_spark.operators.similarity import cosine, l2_norm

    meta = spark.read.parquet(f"{path}/meta").first()
    m, pq_k = meta["m"], meta["pq_k"]
    sub = meta["dim"] // m
    centroids = spark.read.parquet(f"{path}/centroids")
    books = spark.read.parquet(f"{path}/books")
    q = ensure_min_parallelism(queries).select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__q"),
    ).withColumn("__qn", l2_norm(F.col("__q")))

    scored = q.join(F.broadcast(centroids)).select(
        "query_id", "__q", "cell", "centroid_vec",
        cosine(
            F.col("__q"), F.col("centroid_vec"),
            F.col("__qn"), F.col("centroid_norm"),
        ).alias("__sim"),
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("cell").asc()
    )
    probed = (
        scored.withColumn("__rn", F.row_number().over(wp))
        .filter(F.col("__rn") <= nprobe)
        .select(
            "query_id", "cell",
            F.zip_with(
                "__q", "centroid_vec", lambda a, b: a - b
            ).alias("__qr"),
        )
    )
    dist = F.aggregate(
        F.zip_with(
            F.slice(F.col("__qr"), F.col("j") * sub + 1, sub),
            F.col("cvec"),
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    dtab = probed.join(F.broadcast(books)).select(
        "query_id", "cell", "j", "c", dist.alias("_d")
    )
    coded = (
        spark.read.option("basePath", f"{path}/codes")
        .parquet(f"{path}/codes/epoch=*")
        .drop("epoch")
    )
    ex = coded.select("__id", "cell", F.posexplode("codes").alias("j", "c"))
    wk = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("__id").asc()
    )
    return (
        ex.join(dtab, ["cell", "j", "c"])
        .groupBy("query_id", "__id")
        .agg(F.sum("_d").alias("adc_dist"))
        .withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("__id").alias(meta["id_col"]),
            "adc_dist",
            "rank",
        )
    )


def index_compact(
    spark: SparkSession,
    path: str,
    min_epochs: int = 2,
    upto_epoch: int | None = None,
) -> None:
    """Maintenance: fold the committed code epochs below ``upto_epoch``
    (default: all of them) into one partition — the same crash-safe
    staged swap the streaming band index uses
    (``sinks.compact_epoch_partitions``), bounding file count after
    many incremental adds. Search results are unaffected: the code
    table's CONTENT is what ADC consumes, not its epoch layout. A
    caller that may RE-WRITE an epoch (the streaming ingest's
    redelivered batch) must pass that epoch as ``upto_epoch`` so its
    codes are never folded into history and then written again."""
    from polars_fastx_spark.sources.sinks import compact_epoch_partitions

    codes = f"{path}/codes"
    if upto_epoch is None:
        upto_epoch = _next_epoch(spark, codes)
    compact_epoch_partitions(spark, codes, upto_epoch, min_epochs=min_epochs)


def index_stats(spark: SparkSession, path: str) -> DataFrame:
    """Observability twin of ``lsh_bucket_profile``: per-cell vector
    counts and epoch span, so an operator can see skewed cells (one
    hot cell → one slow probe task) and ingest growth. Returns
    (cell, n_vectors, n_epochs) — ≤ num_cells rows."""
    coded = spark.read.option("basePath", f"{path}/codes").parquet(
        f"{path}/codes/epoch=*"
    )
    return coded.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.count_distinct("epoch").alias("n_epochs"),
    )


def _load_books(
    spark: SparkSession, path: str, m: int, pq_k: int
) -> list[list[list[float]]]:
    rows = spark.read.parquet(f"{path}/books").collect()  # m·pq_k rows
    books: list[list[list[float]]] = [[None] * pq_k for _ in range(m)]
    for r in rows:
        books[r["j"]][r["c"]] = [float(x) for x in r["cvec"]]
    missing = [(j, c) for j in range(m) for c in range(pq_k) if books[j][c] is None]
    if missing:
        raise ValueError(f"{path}/books: missing codebook entries {missing[:4]}")
    return books


def _next_epoch(spark: SparkSession, codes_path: str) -> int:
    """Next epoch id from a filesystem LISTING (Hadoop FS API, so it
    works on any supported filesystem) — never a scan of the code
    table, which is data-sized.

    Only COMMITTED epochs (dirs carrying the ``_SUCCESS`` marker)
    advance the counter: a crashed add leaves an uncommitted dir at
    max+1, and the retry — landing on the same id with
    mode("overwrite") — replaces it instead of stranding partial
    codes beside a duplicate epoch."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(codes_path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return 0
    mx = -1
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if not name.startswith("epoch="):
            continue
        try:
            eid = int(name.split("=", 1)[1])
        except ValueError:
            continue
        marker = jvm.org.apache.hadoop.fs.Path(
            f"{codes_path}/{name}/_SUCCESS"
        )
        if fs.exists(marker):
            mx = max(mx, eid)
    return mx + 1
