"""Randomized differential tests for round-1 extension operators.

One deterministic RNG builds hundreds of adversarial cases, they ship
to Spark as a SINGLE DataFrame per operator (one job, constant
overhead), and results compare against a plain-Python reference
implementation — the same oracle discipline as the DuckDB gate, but
over generated edge-case-dense inputs (boundary hits, degenerate
intervals, unicode, whitespace runs).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from polars_fastx_spark.operators import sampling, text
from polars_fastx_spark.operators.rangejoin import point_in_interval_join

SEED = 20260813


def test_binned_join_random_intervals_match_reference(spark):
    rng = random.Random(SEED)
    pts = [(i, rng.randint(-50, 1050)) for i in range(400)]
    ivs = []
    for j in range(120):
        lo = rng.randint(-60, 1000)
        # mix: empty, tiny, bin-aligned, huge
        hi = lo + rng.choice([0, 1, 2, 64, 128, rng.randint(0, 500)])
        ivs.append((j, lo, hi))
    pdf = spark.createDataFrame(pts, "pid int, p long")
    idf = spark.createDataFrame(ivs, "iid int, lo long, hi long")
    for width in (1, 7, 64, 1000):
        got = {
            (r.pid, r.iid)
            for r in point_in_interval_join(
                pdf, "p", idf, "lo", "hi", width
            ).collect()
        }
        ref = {
            (pid, iid)
            for pid, p in pts
            for iid, lo, hi in ivs
            if lo <= p < hi
        }
        assert got == ref, f"width={width}"


def test_chunk_text_random_strings_match_reference(spark):
    rng = random.Random(SEED)
    alphabet = "ab \tλ\n."
    docs = [
        (i, "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 80))))
        for i in range(300)
    ]
    df = spark.createDataFrame(docs, "id int, text string")
    out = text.chunk_text(df, "text", size=10, overlap=3)
    got = {}
    for r in out.collect():
        got.setdefault(r.id, {})[r.chunk_idx] = r.chunk
    for i, s in docs:
        expect = {}
        offs = range(0, max(len(s), 1), 7)
        for k, o in enumerate(offs):
            expect[k] = s[o : o + 10]
        assert got[i] == expect, (i, repr(s))


def test_split_assignment_proportions_and_stability(spark):
    df = spark.range(20_000).withColumnRenamed("id", "k")
    out = sampling.assign_splits(df, "k", salt="prop")
    counts = {
        r.split: r.n
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert sum(counts.values()) == 20_000
    # md5 is uniform: 80/10/10 within a generous ±2% absolute band
    assert abs(counts["train"] / 20_000 - 0.8) < 0.02
    assert abs(counts["valid"] / 20_000 - 0.1) < 0.02
    assert abs(counts["test"] / 20_000 - 0.1) < 0.02
    # sampling at f and 2f nests for arbitrary ids (negative too)
    neg = spark.range(-5_000, 5_000).withColumnRenamed("id", "k")
    small = {r.k for r in sampling.deterministic_sample(neg, "k", 0.07).collect()}
    big = {r.k for r in sampling.deterministic_sample(neg, "k", 0.14).collect()}
    assert small <= big
