"""Keyed upsert (MERGE) into partitioned parquet via dynamic partition
overwrite.

Spark has no transactional MERGE without a table format, but the
scalable pattern underneath one is plain Spark: find the partitions the
update batch touches (tiny distinct over the batch), read ONLY those
partitions back (partition pruning), resolve each key to its latest
version, and rewrite JUST those partitions with
``partitionOverwriteMode=dynamic``. Untouched partitions — at 100 TB,
almost all of them — are never read or written. The write is
idempotent: replaying the same batch rewrites the same partitions to
the same state (last-writer-wins on ``order_col``), which is exactly
what a foreachBatch sink needs for effectively-once streaming upserts.

Caveats vs a real table format (stated, not hidden): no snapshot
isolation — readers racing the overwrite can see a partition mid-swap;
and a key may not MOVE between partitions (the old partition would
keep a stale copy). Both are the standard contracts of
partition-overwrite pipelines. When the mid-swap reader matters, use
:mod:`polars_fastx_spark.operators.manifest` — the same MERGE/delete
semantics behind a manifest-pointer commit (immutable version dirs,
one atomic ``_CURRENT`` rename): readers see old-or-new, never mixed.
This module remains the legacy/zero-metadata mode.

Reference parity: no write/merge surface in the reference (TSV sink
only, /root/reference/src/polars_fastx/fastx_parsers.py:222);
north-star extension per /root/repo/BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame, key_cols: list[str], order_col: str
) -> DataFrame:
    """Keep the winning row per key: max ``order_col``, ties broken
    arbitrarily-but-deterministically by preferring later plan order
    via a monotonic tiebreak column added by the caller if needed."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )


def upsert_partitioned(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_col: str,
    order_col: str,
) -> list:
    """MERGE ``updates`` into the parquet dataset at ``target_path``.

    Returns the list of partition values that were rewritten. The
    target must be partitioned by ``partition_col`` and ``updates``
    must carry the same schema.
    """
    touched = [
        r[0]
        for r in updates.select(partition_col).distinct().collect()
    ]
    current = spark.read.parquet(target_path).filter(
        F.col(partition_col).isin(touched)
    )
    # updates outrank existing rows at equal order_col (upsert wins,
    # and a replayed batch deterministically reproduces the same state)
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(order_col).desc(), F.col("_src").desc()
    )
    merged = (
        current.withColumn("_src", F.lit(0))
        .unionByName(updates.withColumn("_src", F.lit(1)))
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk", "_src")
    )
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(target_path)
    )
    return touched


def delete_keys_partitioned(
    spark: SparkSession,
    target_path: str,
    keys: DataFrame,
    key_cols: list[str],
    partition_col: str,
) -> list:
    """Delete every row matching ``keys`` from the parquet dataset at
    ``target_path`` — the takedown / right-to-be-forgotten primitive a
    training-data store needs, as the mirror image of
    :func:`upsert_partitioned`: find the partitions the key batch
    touches (tiny distinct), read ONLY those back (partition pruning),
    anti-join the keys out, dynamic-partition-overwrite JUST those
    partitions. Untouched partitions are never read or written, so the
    cost scales with the deletion batch, not the table.

    ``keys`` must carry ``key_cols`` + ``partition_col`` (the partition
    each key lives in — the same no-key-movement contract as upsert; a
    deletion request that doesn't know the partition can recover it
    with one broadcast semi-join against the table first). The
    anti-join is broadcastable while the batch is small — AQE decides.
    Idempotent: replaying the same batch rewrites the same partitions
    to the same state. Returns the rewritten partition values.
    """
    touched = [
        r[0] for r in keys.select(partition_col).distinct().collect()
    ]
    current = spark.read.parquet(target_path).filter(
        F.col(partition_col).isin(touched)
    )
    remaining = current.join(
        keys.select(*key_cols, partition_col).distinct(),
        on=[*key_cols, partition_col],
        how="left_anti",
    )
    # Dynamic overwrite only rewrites partitions PRESENT in the output,
    # so a partition whose every row is deleted would silently survive
    # on disk. Find those (tiny distinct over the touched subset, before
    # the files change) and remove their directories explicitly after
    # the overwrite — a takedown primitive must not no-op.
    surviving = {
        r[0] for r in remaining.select(partition_col).distinct().collect()
    }
    emptied = [v for v in touched if v not in surviving]
    (
        remaining.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(target_path)
    )
    if emptied:
        _delete_partition_dirs(spark, target_path, partition_col, emptied)
    return touched


def _unescape_path_name(name: str) -> str:
    """Reverse Hive-style %XX path escaping used in partition dir names."""
    out: list[str] = []
    i = 0
    while i < len(name):
        c = name[i]
        if c == "%" and i + 3 <= len(name):
            try:
                out.append(chr(int(name[i + 1 : i + 3], 16)))
                i += 3
                continue
            except ValueError:
                pass
        out.append(c)
        i += 1
    return "".join(out)


def _delete_partition_dirs(
    spark: SparkSession,
    target_path: str,
    partition_col: str,
    values: list,
) -> None:
    """Remove ``{partition_col}={value}`` directories under
    ``target_path`` via the Hadoop FileSystem API (works on any FS the
    session can reach, not just local disk). Directory names are
    unescaped before comparison so values with special characters still
    match; a null partition value maps to Hive's default sentinel."""
    wanted = {
        "__HIVE_DEFAULT_PARTITION__" if v is None else str(v)
        for v in values
    }
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(target_path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    prefix = f"{partition_col}="
    for status in fs.listStatus(root):
        if not status.isDirectory():
            continue
        name = status.getPath().getName()
        if not name.startswith(prefix):
            continue
        if _unescape_path_name(name[len(prefix) :]) in wanted:
            fs.delete(status.getPath(), True)
