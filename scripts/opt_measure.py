#!/usr/bin/env python
"""Round-9 optimization harness — per-query timing + plan capture.

Usage:
    python scripts/opt_measure.py [--sf DIR] [--runs N] [--tag before]
                                  [--plans-dir plans/r09] [--noop]
                                  [--no-plans] q1 q2 ...
    python scripts/opt_measure.py --suite          # the 8 headline queries

Protocol mirrors bench.py (guide §1): warm the JVM at sf0.001 first,
register relations, then N timed runs per query; report min/median/max.
``--noop`` times `df.write.format("noop")` (guide §1.4) alongside the
bench's collect() action so compute cost and fetch cost separate.
Plans are `explain("formatted")` captured AFTER one execution so AQE's
final decisions are visible, written to <plans-dir>/<query>_<tag>.txt.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

HEADLINE = [
    "q_agg_tpch1", "j_inner_3way", "w_rank_topk", "o_topk",
    "g_count_distinct", "f_json_extract", "l_exact_dedup", "l_cosine_topk",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--suite", action="store_true")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--plans-dir", default=str(_REPO / "plans" / "r09"))
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()

    names = list(args.queries)
    if args.suite:
        names = HEADLINE + [n for n in names if n not in HEADLINE]
    if not names:
        ap.error("no queries given")

    from polars_fastx_spark.catalog import QUERIES
    from polars_fastx_spark.session import builder

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        builder("opt-measure", master=f"local[{cpus}]",
                extra_conf={"spark.ui.enabled": "false",
                            "spark.driver.memory": "8g"})
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    warm_dir = "/root/testdata/sf0.001"
    for _ in range(2):
        for q in names:
            try:
                QUERIES[q].fn(spark, warm_dir).collect()
            except Exception:
                pass

    from polars_fastx_spark import catalog as _catalog
    for tbl in ("region", "nation", "customer", "supplier", "part",
                "orders", "lineitem", "events", "documents", "embeddings"):
        try:
            _catalog._t(spark, args.sf, tbl)
        except Exception:
            pass

    plans_dir = Path(args.plans_dir)
    plans_dir.mkdir(parents=True, exist_ok=True)

    out: dict[str, dict] = {}
    for q in names:
        spec = QUERIES[q]
        if spec.prepare is not None:
            t0 = time.time()
            spec.prepare(spark, args.sf)
            prep = time.time() - t0
        else:
            prep = 0.0
        spark.sparkContext.setJobDescription(f"opt:{q}")
        runs = []
        for _ in range(args.runs):
            t0 = time.time()
            rows = spec.fn(spark, args.sf).collect()
            runs.append(time.time() - t0)
            assert rows is not None
        runs.sort()
        rec = {"min": round(runs[0], 3),
               "median": round(runs[len(runs) // 2], 3),
               "max": round(runs[-1], 3)}
        if prep:
            rec["prepare"] = round(prep, 3)
        if args.noop:
            nruns = []
            for _ in range(args.runs):
                t0 = time.time()
                (spec.fn(spark, args.sf)
                 .write.format("noop").mode("overwrite").save())
                nruns.append(time.time() - t0)
            nruns.sort()
            rec["noop_min"] = round(nruns[0], 3)
            rec["noop_median"] = round(nruns[len(nruns) // 2], 3)
        spark.sparkContext.setJobDescription(None)
        if not args.no_plans:
            df = spec.fn(spark, args.sf)
            df.collect()  # let AQE finalize
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            (plans_dir / f"{q}_{args.tag}.txt").write_text(buf.getvalue())
        out[q] = rec
        print(f"{q:28s} min={rec['min']:7.3f} med={rec['median']:7.3f} "
              f"max={rec['max']:7.3f}"
              + (f" noop_min={rec['noop_min']:7.3f}" if args.noop else "")
              + (f" prep={prep:6.2f}" if prep else ""))

    print(json.dumps({"sf": args.sf, "runs": args.runs, "tag": args.tag,
                      "timings": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
