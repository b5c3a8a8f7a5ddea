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


def not_null(col: str) -> Rule:
    return Rule(f"not_null:{col}", F.col(col).isNull())


def unique(col: str) -> Rule:
    """Uniqueness can't be a row predicate; it's checked as
    count - count_distinct inside the same aggregate pass."""
    return Rule(f"unique:{col}", None)  # sentinel — handled in check()


def accepted_values(col: str, values: list) -> Rule:
    return Rule(
        f"accepted_values:{col}",
        ~F.col(col).isin(values) | F.col(col).isNull(),
    )


def in_range(col: str, lo, hi) -> Rule:
    return Rule(
        f"in_range:{col}",
        (F.col(col) < lo) | (F.col(col) > hi) | F.col(col).isNull(),
    )


def matches(col: str, pattern: str) -> Rule:
    return Rule(
        f"matches:{col}",
        ~F.col(col).rlike(pattern) | F.col(col).isNull(),
    )


def check(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """One aggregate pass → (rule, n_violations) per rule, rule-sorted."""
    aggs = []
    for r in rules:
        if r.violation is None:  # unique sentinel
            col = r.name.split(":", 1)[1]
            aggs.append(
                (F.count(col) - F.count_distinct(F.col(col)))
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
            F.struct(F.lit(r.name).alias("rule"), F.col(r.name).alias("n_violations"))
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
