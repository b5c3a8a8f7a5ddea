"""Partitioned sinks and partition pruning (S7 + §4.3): data written
``partitionBy`` must be read back with the partition filter applied at
planning time — the scan touches only matching directories."""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_fastx_spark import plans
from polars_fastx_spark.sources.sinks import write_parquet

SF = "/root/testdata/sf0.001"


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = str(tmp_path / "ev_by_type")
    write_parquet(ev, out, partition_by=["event_type"])

    back = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plan = plans.explain_str(back)
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1][:200]
    # pruning is semantic too: only the one directory's rows come back
    want = ev.filter(F.col("event_type") == "click").count()
    assert back.count() == want


def test_partitioned_write_roundtrip_all_rows(spark, tmp_path):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = str(tmp_path / "ev_all")
    write_parquet(ev, out, partition_by=["event_type"])
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    a = {r["event_id"] for r in back.select("event_id").collect()}
    b = {r["event_id"] for r in ev.select("event_id").collect()}
    assert a == b


def test_compact_parquet_merges_small_files(spark, tmp_path):
    from polars_fastx_spark.sources.sinks import compact_parquet

    src, dst = str(tmp_path / "frag"), str(tmp_path / "compact")
    spark.range(10_000).repartition(40).write.parquet(src)
    import glob
    assert len(glob.glob(f"{src}/*.parquet")) == 40
    total = sum(
        __import__("os").path.getsize(f) for f in glob.glob(f"{src}/*.parquet")
    )
    n = compact_parquet(spark, src, dst, target_file_bytes=total // 3)
    files = glob.glob(f"{dst}/*.parquet")
    assert len(files) == n <= 5
    a = {r.id for r in spark.read.parquet(dst).collect()}
    assert a == set(range(10_000))  # lossless

    import pytest
    with pytest.raises(ValueError, match="different path"):
        compact_parquet(spark, src, src)


def test_dynamic_partition_pruning_from_dim_filter(spark, tmp_path):
    """A fact table partitioned on the join key, joined to a dim that
    is FILTERED (not the fact): Spark's dynamic partition pruning must
    inject the dim's surviving keys as a runtime partition filter into
    the fact scan — the fact directories for other keys are never read.
    At 100 TB this is the difference between scanning one date's
    partitions and scanning the table."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = str(tmp_path / "fact_by_type")
    write_parquet(ev, out, partition_by=["event_type"])
    fact = spark.read.parquet(out)

    dim = spark.createDataFrame(
        [("click", 1.0), ("view", 2.0), ("error", 3.0),
         ("purchase", 4.0), ("signup", 5.0)],
        "event_type string, weight double",
    ).filter(F.col("weight") < 1.5)  # selective dim filter -> only 'click'

    joined = fact.join(dim, "event_type").select("event_id", "weight")
    plan = plans.explain_str(joined)
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    want = ev.filter(F.col("event_type") == "click").count()
    assert joined.count() == want


def test_compact_recovery_completes_stage_despite_smaller_upto(spark, tmp_path):
    """A prior compaction with a LARGE upto_epoch crashed inside its
    swap after deleting some source epoch dirs — the committed stage is
    the only surviving copy of those rows. A later call with a SMALLER
    upto_epoch must COMPLETE that swap, not delete the stage because
    its target is >= the new bound (ADVICE r5 #3: that deletion
    destroyed the rows forever)."""
    import os
    import shutil

    from polars_fastx_spark.sources.sinks import compact_epoch_partitions

    root = str(tmp_path / "ds")
    for e in range(6):
        spark.createDataFrame(
            [(e * 10 + i,) for i in range(3)], "id long"
        ).coalesce(1).write.mode("overwrite").parquet(f"{root}/epoch={e}")
    before = {
        r["id"]
        for r in spark.read.option("basePath", root)
        .parquet(f"{root}/epoch=*").collect()
    }
    # simulate: compact(upto=6) staged epochs 0..5 to _compact_tmp_e5
    # (committed), then crashed mid-step-2 having deleted epoch=2 and 3
    (
        spark.read.option("basePath", root).parquet(f"{root}/epoch=*")
        .filter(F.col("epoch") < 6).drop("epoch")
        .coalesce(1).write.mode("overwrite")
        .parquet(f"{root}/_compact_tmp_e5")
    )
    shutil.rmtree(f"{root}/epoch=2")
    shutil.rmtree(f"{root}/epoch=3")
    # retry with a SMALLER bound — old code deleted the committed stage
    compact_epoch_partitions(spark, root, upto_epoch=2)
    assert not [
        d for d in os.listdir(root) if d.startswith("_compact_tmp")
    ]
    after = {
        r["id"]
        for r in spark.read.option("basePath", root)
        .parquet(f"{root}/epoch=*").collect()
    }
    assert after == before  # epochs 2 and 3's rows survive via the stage
    assert {d for d in os.listdir(root) if d.startswith("epoch=")} == {
        "epoch=5"
    }
