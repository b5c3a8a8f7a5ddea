"""Declarative data-quality expectations (dbt-test / Deequ style).

A rule set compiles to ONE aggregate pass over the table — each rule
becomes a conditional count, so checking 50 rules on 100 TB costs the
same single scan as checking one. No row explosion, no per-rule jobs.
Violations report as (rule, n_violations); a gate helper raises when
any rule fails, for use at pipeline boundaries.

Reference parity: the reference has no expectations surface; north-star
extension per /root/repo/BASELINE.json:6.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    violation: Column  # boolean Column: True = row violates the rule


def _qcol(name: str) -> Column:
    """Backtick-quoted column reference: a plain ``F.col('a.b')`` parses
    the dot as struct access and a name with spaces/dashes breaks any
    later SQL-text rendering — quote so ANY legal column name works."""
    return F.col("`" + name.replace("`", "``") + "`")


def not_null(col: str) -> Rule:
    return Rule(f"not_null:{col}", _qcol(col).isNull())


def unique(col: str) -> Rule:
    """Uniqueness can't be a row predicate; it's checked as
    count - count_distinct inside the same aggregate pass."""
    return Rule(f"unique:{col}", None)  # sentinel — handled in check()


def accepted_values(col: str, values: list) -> Rule:
    return Rule(
        f"accepted_values:{col}",
        ~_qcol(col).isin(values) | _qcol(col).isNull(),
    )


def in_range(col: str, lo, hi) -> Rule:
    return Rule(
        f"in_range:{col}",
        (_qcol(col) < lo) | (_qcol(col) > hi) | _qcol(col).isNull(),
    )


def matches(col: str, pattern: str) -> Rule:
    return Rule(
        f"matches:{col}",
        ~_qcol(col).rlike(pattern) | _qcol(col).isNull(),
    )


def check(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """One aggregate pass → (rule, n_violations) per rule, rule-sorted."""
    aggs = []
    for r in rules:
        if r.violation is None:  # unique sentinel
            col = r.name.split(":", 1)[1]
            aggs.append(
                (F.count(_qcol(col)) - F.count_distinct(_qcol(col)))
                .cast("bigint")
                .alias(r.name)
            )
        else:
            aggs.append(
                F.sum(F.when(r.violation, 1).otherwise(0))
                .cast("bigint")
                .alias(r.name)
            )
    wide = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(r.name).alias("rule"),
                _qcol(r.name).alias("n_violations"),
            )
            for r in rules
        ]
    )
    return (
        wide.select(F.explode(pairs).alias("e"))
        .select("e.rule", "e.n_violations")
        .orderBy(F.col("rule").asc_nulls_first())
    )


def enforce(df: DataFrame, rules: list[Rule]) -> None:
    """Gate: raise with the failing rules if any expectation breaks."""
    bad = [
        (r.rule, r.n_violations)
        for r in check(df, rules).collect()
        if r.n_violations
    ]
    if bad:
        raise AssertionError(f"data-quality expectations failed: {bad}")


def observed(df: DataFrame, name: str, metrics: dict[str, Column]):
    """Attach free pipeline metrics: ``df.observe`` evaluates the given
    aggregates DURING the next action on ``df`` — no second scan, no
    extra job. Returns (df, observation); read ``observation.get``
    after the action completes. The zero-cost alternative to re-running
    check() when a pipeline already writes its output anyway.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *[m.alias(k) for k, m in metrics.items()]), obs


def profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One-pass column profile — the `df.describe()`-class EDA summary
    every warehouse engine ships, as a single aggregate job: per column
    its null count, exact distinct count, and min/max (rendered to
    string so heterogeneous column types share one output schema).

    All per-column aggregates land in ONE ``agg(...)`` so the input is
    scanned once; Spark plans the multi-column count-distinct via
    Expand (one extra shuffle per distinct column set — acceptable for
    the tens-of-columns case this targets; for hundreds of columns or
    sketch-accuracy-is-enough scale, pass the same frame through
    ``approx_count_distinct`` by editing one line, same plan shape
    minus the Expand). The wide 1-row result is unpivoted driver-free
    with a stack() over literals — output is (col_name, n_nulls,
    n_distinct, min, max), one row per profiled column.
    """
    from polars_fastx_spark.operators.partitioning import ensure_min_parallelism

    df = ensure_min_parallelism(df)
    cols = columns or df.columns
    aggs = []
    # index-based aliases, never name-interpolated SQL text: a column
    # named 'my col' or 'a-b' must profile, not raise ParseException
    for i, c in enumerate(cols):
        col = _qcol(c)
        aggs += [
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"__nn_{i}"),
            F.count_distinct(col).alias(f"__nd_{i}"),
            F.min(col).cast("string").alias(f"__mn_{i}"),
            F.max(col).cast("string").alias(f"__mx_{i}"),
        ]
    one = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"__nn_{i}").alias("n_nulls"),
                F.col(f"__nd_{i}").alias("n_distinct"),
                F.col(f"__mn_{i}").alias("min"),
                F.col(f"__mx_{i}").alias("max"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return one.select(F.explode(pairs).alias("e")).select("e.*")
