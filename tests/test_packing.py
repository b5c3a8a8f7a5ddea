"""FFD sequence packing (operators/packing.py) + PII redaction."""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_fastx_spark.operators import text
from polars_fastx_spark.operators.packing import pack_ffd


def _docs(spark):
    rows = [(i, ln) for i, ln in enumerate(
        [900, 800, 700, 650, 500, 400, 300, 250, 120, 90, 60, 30, 2500]
    )]
    return spark.createDataFrame(rows, "doc_id int, n int")


def test_pack_respects_budget_and_keeps_every_doc(spark):
    df = _docs(spark)
    out = pack_ffd(df, "doc_id", "n", budget=1000, partitions=2).cache()
    assert out.count() == df.count()  # nothing dropped or duplicated
    assert out.select("doc_id").distinct().count() == df.count()
    per_bin = out.groupBy("bin_id").agg(
        F.sum("n").alias("tot"), F.count("*").alias("k")
    )
    # bins over budget must be oversize singletons
    bad = per_bin.filter((F.col("tot") > 1000) & (F.col("k") > 1)).count()
    assert bad == 0
    over = out.filter(F.col("n") > 1000).collect()
    assert len(over) == 1 and over[0].bin_fill == 2500  # 2500-doc bins alone


def test_pack_bin_fill_consistent_and_deterministic(spark):
    df = _docs(spark)
    a = pack_ffd(df, "doc_id", "n", budget=1000, partitions=2)
    fills = {
        r.bin_id: r.tot
        for r in a.groupBy("bin_id").agg(F.sum("n").alias("tot")).collect()
    }
    for r in a.collect():
        assert r.bin_fill == fills[r.bin_id]
    b = pack_ffd(df, "doc_id", "n", budget=1000, partitions=2)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pack_beats_one_doc_per_bin(spark):
    """The whole point: far fewer bins than documents."""
    df = spark.range(200).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7 * 100 + 50).alias("n")
    )
    out = pack_ffd(df, "doc_id", "n", budget=2000, partitions=4)
    n_bins = out.select("bin_id").distinct().count()
    assert n_bins < 200 / 2.5  # ≥ 2.5× packing density on this mix


def test_redact_pii_all_kinds(spark):
    df = spark.createDataFrame(
        [(1, "write a@b.io or call +1 (555) 123-4567 from 192.168.0.1 ok")],
        "id int, t string",
    )
    got = df.select(text.redact_pii("t").alias("r")).collect()[0].r
    assert got == "write [EMAIL] or call [PHONE] from [IPV4] ok"
