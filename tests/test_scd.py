"""SCD2 log-collapse (operators/scd.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_fastx_spark import plans
from polars_fastx_spark.operators.scd import scd2_from_log


def _log(spark):
    return spark.createDataFrame(
        [
            (1, 10, "A", 100),
            (1, 20, "A", 101),  # no change — folded into the A version
            (1, 30, "B", 102),
            (1, 40, "A", 103),  # back to A → a NEW version, not merged
            (2, 15, "X", 104),
        ],
        "k int, t int, status string, eid int",
    )


def test_scd2_versions_and_intervals(spark):
    out = scd2_from_log(_log(spark), ["k"], "t", ["status"], ["eid"])
    rows = {
        (r.k, r.valid_from): (r.status, r.valid_to, r.is_current)
        for r in out.collect()
    }
    assert rows == {
        (1, 10): ("A", 30, False),
        (1, 30): ("B", 40, False),
        (1, 40): ("A", None, True),
        (2, 15): ("X", None, True),
    }
    # intervals tile: each valid_to equals the next valid_from per key


def test_scd2_null_attribute_transitions(spark):
    df = spark.createDataFrame(
        [(1, 1, None, 1), (1, 2, "A", 2), (1, 3, None, 3), (1, 4, None, 4)],
        "k int, t int, status string, eid int",
    )
    out = scd2_from_log(df, ["k"], "t", ["status"], ["eid"])
    got = sorted((r.valid_from, r.status) for r in out.collect())
    # null→A→null are three versions; the trailing null run folds
    assert got == [(1, None), (2, "A"), (3, None)]


def test_scd2_single_shuffle(spark):
    out = scd2_from_log(_log(spark), ["k"], "t", ["status"], ["eid"])
    assert plans.shuffle_count(out) == 1
