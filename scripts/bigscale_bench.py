#!/usr/bin/env python
"""Spot-bench the optimization-touched tail at ~sf1 (10x the bench SF).

The driver's testdata stops at sf0.1, where sub-second queries are
job-floor-dominated and 32-vs-8-core ratios prove nothing (r9 verdict
item 8). This script derives a BIGGER input from sf0.1 at measurement
time — pyarrow-replicating each table with id offsets, preserving
physical types (events keeps its ns timestamps) — then times a short
list of catalog queries against it. Nothing under /root/testdata is
touched, and the derived dir holds INPUT data only (no results, no
intermediates): every timed run computes from parquet.

Replication: lineitem / events / embeddings 10x (linear-cost paths);
documents 4x (the span/containment tier is quadratic in repeated
content — full 10x text duplication would measure a different regime;
4x keeps the candidate volume ~16x, big enough to expose shuffle-shape
wins without a pathological blowup). Text is replicated VERBATIM, so
cross-replica near-duplicates are real and heavy — the CommonCrawl-ish
high-duplication regime, which is exactly where the span-removal
semi-join and the containment shuffle removal should show margin.

Usage:
    python scripts/bigscale_bench.py [--cpus N] [--runs N] [--out f.json]
                                     [--workdir /tmp/pfs_bigscale] [q ...]
Default queries: q_agg_tpch1's catalog row + the r9/r10-touched tail
(t_interpolate, l_span_remove, l_containment, l_cosine_topk,
l_simhash_neardup). Run once per core count; commit the JSONs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

SRC = "/root/testdata/sf0.1"
DEFAULT_QUERIES = [
    "q_agg_tpch1",
    "t_interpolate",
    "l_span_remove",
    "l_containment",
    "l_cosine_topk",
    "l_simhash_neardup",
]
#: replica count per table; absent tables copy verbatim
REPLICAS = {"lineitem": 10, "events": 10, "embeddings": 10, "documents": 4}
#: id columns shifted per replica so keys stay unique
ID_COLS = {
    "lineitem": ["l_orderkey"],
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
    "documents": ["doc_id"],
}
OFFSET = 10_000_000
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def build(workdir: str) -> None:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(workdir, exist_ok=True)
    for t in TABLES:
        dst = Path(workdir) / f"{t}.parquet"
        if dst.exists():
            continue
        tbl = pq.read_table(f"{SRC}/{t}.parquet")
        n = REPLICAS.get(t, 1)
        if n == 1:
            pq.write_table(tbl, dst)
            continue
        parts = []
        for k in range(n):
            part = tbl
            for col in ID_COLS.get(t, []):
                i = part.schema.get_field_index(col)
                shifted = pc.add(part.column(col), k * OFFSET)
                part = part.set_column(i, part.schema.field(col), shifted)
            parts.append(part)
        pq.write_table(pa.concat_tables(parts), dst)
        print(f"built {t}: {tbl.num_rows} x {n} rows", file=sys.stderr)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", default=None)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--workdir", default="/tmp/pfs_bigscale")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    names = args.queries or DEFAULT_QUERIES

    build(args.workdir)

    from polars_fastx_spark.catalog import QUERIES
    from polars_fastx_spark.session import builder

    spark = (
        builder("bigscale-bench", master=f"local[{args.cpus}]",
                extra_conf={"spark.ui.enabled": "false",
                            "spark.driver.memory": "12g"})
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warm codegen/JIT at the tiny SF, as bench.py does
    for q in names:
        try:
            QUERIES[q].fn(spark, "/root/testdata/sf0.001").collect()
        except Exception:
            pass

    # noop sink (guide §1.4), NOT collect: t_interpolate returns the
    # full 9.2M-row spine at this scale and a collect would time the
    # driver fetch, not the operator (measured 69 s collect vs 4.6 s
    # noop at 32 cores). This script measures COMPUTE scaling; bench.py
    # keeps the driver's collect protocol unchanged.
    timings: dict[str, dict] = {}
    for q in names:
        runs = []
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"bigscale:{q}")
            t0 = time.time()
            QUERIES[q].fn(spark, args.workdir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.time() - t0, 3))
        runs.sort()
        timings[q] = {"min": runs[0], "median": runs[len(runs) // 2],
                      "max": runs[-1]}
        print(f"{q:28s} min={runs[0]:7.2f} med={runs[len(runs)//2]:7.2f} "
              f"max={runs[-1]:7.2f}", file=sys.stderr)
    out = {
        "workdir": args.workdir, "src": SRC, "cpus": int(args.cpus),
        "replicas": REPLICAS, "runs_per_query": args.runs,
        "timings": timings,
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        Path(args.out).write_text(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
