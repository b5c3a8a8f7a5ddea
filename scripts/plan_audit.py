#!/usr/bin/env python
"""Generate PLAN_AUDIT.md — the whole-catalog physical-plan posture.

One row per catalog query: exchange (shuffle) count, broadcast-join
count, whether the plan crosses into Python (Arrow-batched only —
BatchEvalPython is banned catalog-wide by tests/test_plans.py), and
whether a cartesian/nested-loop join appears (only legal for the
queries whose SEMANTICS are a cross join — the same allowlist the test
suite enforces). This is the systematic artifact behind the headline
claims in PLANS.md: the 100 TB posture is a property of EVERY declared
query, not just the showcased ones.

Usage: python scripts/plan_audit.py [sf_dir]   (default sf0.001)
       python scripts/plan_audit.py --diff [sf_dir]

--diff is the REGRESSION GATE (VERDICT r5 task 7): it re-audits every
query and compares against the committed PLAN_AUDIT.md, exiting 1 if
any query's exchange count grew >1.5x (and by >1), or it gained a
cartesian or Python stage it didn't have. New queries (absent from the
committed table) are reported informationally, never failed. Run it in
the round close-out; regenerate the table (no flag) only after a diff
is understood and intended.

Caveat: counts come from the STATIC physical plan (no execution), so
AQE runtime improvements (coalesced shuffles, runtime broadcast
conversions) make the real numbers ≤ these.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ARROW_MARKERS = (
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "ArrowEvalPython",
    "AggregateInPandas",
    "PythonUDTF",
    "MapInArrow",
)


def _collect_rows(sf: str) -> list[tuple]:
    import polars_fastx_spark as pfs
    from polars_fastx_spark.catalog import QUERIES

    spark = pfs.get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for name in sorted(QUERIES):
        try:
            df = QUERIES[name].fn(spark, sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
            rows.append(
                (
                    name,
                    # SHUFFLE exchanges only: "BroadcastExchange ..."
                    # contains the substring "Exchange " and was
                    # inflating this count — a broadcast of a tiny
                    # dim/rule table is not a shuffle (caught when the
                    # PSL tier's 5 broadcast probes tripped the diff
                    # gate on queries whose shuffle count was flat)
                    plan.count("Exchange ")
                    - plan.count("BroadcastExchange "),
                    plan.count("BroadcastHashJoin"),
                    "arrow" if any(m in plan for m in ARROW_MARKERS) else "",
                    "CART"
                    if ("CartesianProduct" in plan
                        or "BroadcastNestedLoopJoin" in plan)
                    else "",
                )
            )
        except Exception as ex:  # pragma: no cover — audit must not die
            rows.append((name, "-", "-", "", f"ERR {type(ex).__name__}"))
    spark.stop()
    return rows


def _parse_committed(md_path: Path) -> dict[str, tuple]:
    """name -> (exchanges, bcast, python, cartesian) from the committed
    PLAN_AUDIT.md table."""
    base: dict[str, tuple] = {}
    for line in md_path.read_text().splitlines():
        if not line.startswith("| `"):
            continue
        cells = [c.strip() for c in line.strip("|").split("|")]
        if len(cells) != 5:
            continue
        name = cells[0].strip("` ")
        base[name] = (cells[1], cells[2], cells[3], cells[4])
    return base


def diff(sf: str) -> int:
    """Regression gate: current plans vs the committed PLAN_AUDIT.md."""
    repo = Path(__file__).resolve().parent.parent
    md = repo / "PLAN_AUDIT.md"
    if not md.exists():
        print("no committed PLAN_AUDIT.md — run without --diff first")
        return 1
    base = _parse_committed(md)
    rows = _collect_rows(sf)
    bad, new = [], []
    for name, ex, bc, py, cart in rows:
        old = base.get(name)
        if old is None:
            new.append(name)
            continue
        o_ex, _, o_py, o_cart = old
        if str(cart).startswith("ERR"):
            bad.append(f"{name}: now ERRORS ({cart})")
            continue
        try:
            o_ex_i, ex_i = int(o_ex), int(ex)
        except ValueError:
            o_ex_i = ex_i = None
        if (
            o_ex_i is not None
            and ex_i > o_ex_i * 1.5
            and ex_i - o_ex_i > 1
        ):
            bad.append(f"{name}: exchanges {o_ex_i} -> {ex_i} (>1.5x)")
        if py == "arrow" and o_py != "arrow":
            bad.append(f"{name}: gained a Python stage")
        if cart == "CART" and o_cart != "CART":
            bad.append(f"{name}: gained a cartesian/nested-loop join")
    for b in bad:
        print("REGRESSED", b)
    if new:
        print(f"new (not in committed table): {', '.join(sorted(new))}")
    print(f"{len(bad)} plan regressions / {len(rows)} queries")
    return 1 if bad else 0


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--diff":
        sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
        raise SystemExit(diff(sf))
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    if sf.startswith("-") or not Path(sf).is_dir():
        # An unknown flag (e.g. --help) must never silently overwrite the
        # committed regression-gate artifact with a mislabelled table.
        print(__doc__)
        raise SystemExit(2)
    rows = _collect_rows(sf)

    out = [
        "# PLAN_AUDIT — static physical-plan posture of every catalog query",
        "",
        f"Generated by `python scripts/plan_audit.py {sf}`. Exchange =",
        "shuffle boundaries in the static plan (AQE may coalesce at run",
        "time); bcast = broadcast hash joins; python = Arrow-batched",
        "Python stage (row-at-a-time BatchEvalPython is banned",
        "catalog-wide); CART = cartesian/nested-loop join — present only",
        "where the query's semantics ARE a cross join (allowlist",
        "enforced by tests/test_plans.py).",
        "",
        "| query | exchanges | bcast joins | python | cartesian |",
        "|---|---|---|---|---|",
    ]
    for name, ex, bc, py, cart in rows:
        out.append(f"| `{name}` | {ex} | {bc} | {py} | {cart} |")
    n_cart = sum(1 for r in rows if r[4] == "CART")
    n_py = sum(1 for r in rows if r[3] == "arrow")
    out += [
        "",
        f"{len(rows)} queries: {n_cart} with a (semantically required) "
        f"nested-loop stage, {n_py} crossing into Python via Arrow, "
        "0 row-at-a-time Python anywhere.",
    ]
    Path(__file__).resolve().parent.parent.joinpath("PLAN_AUDIT.md").write_text(
        "\n".join(out) + "\n"
    )
    print(f"PLAN_AUDIT.md written ({len(rows)} queries at {sf})")


if __name__ == "__main__":
    main()
