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


def test_pack_ffd_matches_naive_first_fit_reference(spark):
    """Randomized differential: the segment-tree first-fit inside
    pack_ffd must assign exactly the bins a naive linear first-fit
    scan assigns (same doc order: length desc, id asc; lowest-index
    bin with room wins; oversize docs bin alone)."""
    import random

    from polars_fastx_spark.operators.packing import pack_ffd

    rng = random.Random(20260815)
    budget = 100
    for trial in range(3):
        docs = [
            (i, rng.choice([1, 2, 3, 7, 33, 49, 50, 51, 99, 100, 150]))
            for i in range(200)
        ]
        rng.shuffle(docs)
        df = (
            spark.createDataFrame(docs, "doc_id long, n long")
            .repartition(1)  # single partition -> comparable to global FFD
        )
        got = {
            r.doc_id: (r.bin_id, r.bin_fill)
            for r in pack_ffd(df, "doc_id", "n", budget, partitions=1).collect()
        }
        # naive reference
        bins = []  # remaining per bin
        assign = {}
        for i, n in sorted(docs, key=lambda d: (-d[1], d[0])):
            placed = None
            if n <= budget:
                for b, rem in enumerate(bins):
                    if rem >= n:
                        placed = b
                        break
            if placed is None:
                bins.append(max(budget, n))
                placed = len(bins) - 1
            bins[placed] -= n
            assign[i] = placed
        fills = {}
        for i, n in docs:
            fills[assign[i]] = fills.get(assign[i], 0) + n
        # bin ids are namespaced by partition id; compare by GROUPING,
        # fill, and count rather than raw label
        label_map = {}
        for i, n in docs:
            g, f = got[i]
            w = assign[i]
            assert f == fills[w], (trial, i)
            if w in label_map:
                assert label_map[w] == g, (trial, i)
            else:
                assert g not in label_map.values(), (trial, i, g)
                label_map[w] = g
