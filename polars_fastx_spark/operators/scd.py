"""SCD2 (slowly-changing-dimension) history built from an event log.

Given an append-only log of (key, ts, attributes), produce the type-2
dimension table: one row per CHANGE with ``valid_from``/``valid_to``
validity intervals and an ``is_current`` flag. Two windows over the
same (key, order) partitioning — change detection via ``lag``, interval
close-out via ``lead`` — so the whole build costs ONE shuffle on the
key and both window passes reuse it. No self-join, no driver state;
at 100 TB the cost is the one sort-shuffle any per-key history op pays.

Reference parity: no temporal-table surface in the reference;
north-star extension per /root/repo/BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_log(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Collapse a log into SCD2 rows.

    A row opens a new version when any attribute differs from the
    previous log row of the same key (first row always opens).
    ``valid_to`` is the next version's ``valid_from`` (null = current).
    ``tiebreak_cols`` must make (ts, tiebreak) unique per key.
    """
    tb = tiebreak_cols or []
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tb]
    w = Window.partitionBy(*key_cols).orderBy(*order)

    changed = F.lit(False)
    for a in attr_cols:
        prev = F.lag(a).over(w)
        # null-safe: first row (prev null) or value change opens a version
        changed = changed | ~F.col(a).eqNullSafe(prev) | F.lag(ts_col).over(w).isNull()

    versions = df.withColumn("_new_version", changed).filter(
        F.col("_new_version")
    )
    wv = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        versions.select(
            *key_cols,
            *attr_cols,
            F.col(ts_col).alias("valid_from"),
            F.lead(ts_col).over(wv).alias("valid_to"),
            *tb,
        )
        .withColumn("is_current", F.col("valid_to").isNull())
    )
