"""Plan assertions — make the 100 TB posture testable.

Correctness tests prove an operator computes the right rows; these
helpers prove it computes them with the right PLAN: filters reaching
the parquet scan, dimension joins broadcast, no accidental cartesian
products, aggregations staying in whole-stage codegen, and a bounded
shuffle count. tests/test_plans.py pins one expectation per headline
query so a regression that silently degrades the plan (e.g. a lost
broadcast, a new shuffle) fails CI even though results stay correct.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (Spark only prints it)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def has_cartesian(df: DataFrame) -> bool:
    plan = explain_str(df)
    return "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan


def has_whole_stage_codegen(df: DataFrame) -> bool:
    """True when ≥1 whole-stage-codegen subtree compiles for this plan.

    Uses the dedicated ``codegen`` explain mode — with AQE on, the
    ``simple``/``formatted`` modes print the pre-execution adaptive plan
    which carries no codegen markers. The adaptive plan reports its
    codegen subtrees only once finalized, so this runs the query first
    (test-scale data only).
    """
    df.collect()  # count() would execute a different QueryExecution
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees",
                  explain_str(df, "codegen"))
    return bool(m) and int(m.group(1)) > 0


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle-exchange operators in the physical plan —
    every non-broadcast Exchange (hash, range, single, round-robin
    from ``repartition(n)``, …), so a regression that slips in a
    repartition moves this number."""
    plan = explain_str(df, "simple")
    # standalone "Exchange " nodes only: BroadcastExchange and
    # ReusedExchange are single tokens, so \b keeps them out
    return len(re.findall(r"\bExchange ", plan))


def has_pushed_filters(df: DataFrame, fragment: str | None = None) -> bool:
    """True when the scan carries pushed filters (optionally matching
    ``fragment``)."""
    plan = explain_str(df)
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    if not m or not m.group(1).strip():
        return False
    return fragment is None or fragment in m.group(1)


def pruned_columns(df: DataFrame) -> list[str]:
    """Column names the parquet scan actually reads (ReadSchema).

    Depth-aware parse: the struct body may contain ``decimal(15,2)``
    (commas inside parens) and nested ``array<...>``/``struct<...>``
    (angle brackets), so neither a [^>]* regex nor a bare comma split
    is safe — both silently returned the wrong column set."""
    plan = explain_str(df)
    m = re.search(r"ReadSchema: struct<", plan)
    if not m:
        return []
    # walk to the matching '>' of the opening struct<
    body_start = m.end()
    depth, i = 1, body_start
    while i < len(plan) and depth:
        if plan[i] == "<":
            depth += 1
        elif plan[i] == ">":
            depth -= 1
        i += 1
    body = plan[body_start : i - 1]
    cols, buf, d = [], [], 0
    for ch in body:
        if ch in "<(":
            d += 1
        elif ch in ">)":
            d -= 1
        if ch == "," and d == 0:
            cols.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    if buf:
        cols.append("".join(buf))
    return [c.split(":", 1)[0].strip() for c in cols if c.strip()]
