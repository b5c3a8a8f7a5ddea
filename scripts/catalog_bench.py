#!/usr/bin/env python
"""Time EVERY catalog query (Spark side only) and write a structured
artifact, so long-tail regressions are diffable round-over-round
instead of only the 8-query headline in bench.py.

Each query runs once after one warm-up of the session (JIT + codegen
caches are shared across queries anyway; a per-query min-of-N at 175+
queries would cost more wall-clock than it buys precision — the
purpose is regression DIFFING, not absolute benchmarking).

Usage: python scripts/catalog_bench.py [sf_dir] [out.json]
Defaults: /root/testdata/sf0.1  BENCH_catalog_rN.json (N from env
SPARK_GRAFT_ROUND or 'x').

Output: {"sf_dir": ..., "total_seconds": N, "queries": {name: sec}}
Compare two artifacts:
    python scripts/catalog_bench.py --diff old.json new.json
prints queries slower by >1.5x and >0.3s.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))


def diff(old_path: str, new_path: str) -> int:
    old = json.loads(Path(old_path).read_text())["queries"]
    new = json.loads(Path(new_path).read_text())["queries"]
    bad = []
    for name, t_new in sorted(new.items()):
        t_old = old.get(name)
        if t_old is None:
            continue
        if t_new > t_old * 1.5 and t_new - t_old > 0.3:
            bad.append((name, t_old, t_new))
    for name, a, b in bad:
        print(f"REGRESSED {name}: {a:.2f}s -> {b:.2f}s ({b / a:.1f}x)")
    gone = sorted(set(old) - set(new))
    if gone:
        print("removed:", ", ".join(gone))
    print(f"{len(bad)} regressions / {len(new)} queries")
    return 1 if bad else 0


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--diff":
        raise SystemExit(diff(sys.argv[2], sys.argv[3]))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rnd = os.environ.get("SPARK_GRAFT_ROUND", "x")
    out_path = (
        sys.argv[2] if len(sys.argv) > 2 else str(_REPO / f"BENCH_catalog_r{rnd}.json")
    )

    import polars_fastx_spark as pfs
    from polars_fastx_spark.catalog import QUERIES

    spark = pfs.get_spark("catalog-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # one warm-up action so session/codegen startup isn't billed to the
    # first query
    QUERIES["o_topk"].fn(spark, sf_dir).collect()

    # ... and one Arrow + BLAS warm-up so the first query to reach the
    # pandas-UDF / numpy-gemm path isn't billed their import/JIT cost
    # either (round-6 --diff flagged 3 untouched queries purely
    # because sweep order moved which query hit these paths first)
    import pandas as _pd

    def _warm(it):
        import numpy as _np

        for batch in it:
            v = _np.ones((8, 8))
            yield _pd.DataFrame(
                {"id": batch["id"], "x": float((v @ v).sum())}
            )

    spark.range(64).repartition(32).mapInPandas(
        _warm, "id long, x double"
    ).count()

    times: dict[str, float] = {}
    prep_times: dict[str, float] = {}
    t_all = time.time()
    for name in sorted(QUERIES):
        spec = QUERIES[name]
        try:
            # Lifecycle queries declare their one-time BUILD via
            # prepare= (VERDICT r5 'missing #4'): time it separately so
            # the per-query number measures QUERY cost and the
            # regression diff compares like with like. Shared builds
            # amortize — later queries' prepare records ~0.
            if spec.prepare is not None:
                t0 = time.time()
                spec.prepare(spark, sf_dir)
                prep_times[name] = round(time.time() - t0, 3)
            t0 = time.time()
            spec.fn(spark, sf_dir).collect()
            times[name] = round(time.time() - t0, 3)
        except Exception as exc:  # record, don't abort the sweep
            times[name] = -1.0
            print(f"ERR  {name}: {exc}", file=sys.stderr)
        ptxt = (
            f"  (+{prep_times[name]:.2f}s build)"
            if prep_times.get(name) else ""
        )
        print(f"{times[name]:8.2f}s  {name}{ptxt}")
    total = round(time.time() - t_all, 1)

    Path(out_path).write_text(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "total_seconds": total,
                "queries": times,
                "prepare_seconds": prep_times,
            },
            indent=1,
            sort_keys=True,
        )
        + "\n"
    )
    slow = sorted(times.items(), key=lambda kv: -kv[1])[:10]
    print(f"\n{len(times)} queries in {total}s -> {out_path}")
    print("slowest:", ", ".join(f"{n}={t:.1f}s" for n, t in slow))


if __name__ == "__main__":
    main()
