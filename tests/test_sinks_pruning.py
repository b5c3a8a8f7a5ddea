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
