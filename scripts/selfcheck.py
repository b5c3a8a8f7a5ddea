#!/usr/bin/env python
"""Replicate the driver's CORRECTNESS protocol over the FULL catalog.

The per-round driver samples ~50 of the catalog's queries; this script
runs ALL of them with the same three gates — row count, schema (column
name set), and a strict VALUE HASH (columns sorted by name, rows sorted
by all columns, every cell rendered to a string and md5'd) — against
the DuckDB oracle at sf0.01. The strict render-equality hash is what
caught f_math's BIGINT-vs-DOUBLE dtype drift in round 1, which the
1e-9-tolerant compare in tests/oracle_utils.py let through, so this is
deliberately harsher than `scripts/oracle_check.py`.

Usage:
    python scripts/selfcheck.py [sf_dir] [out.json] [--only q1,q2,...]

With --only, runs just the named queries and merges their rows into the
existing out.json instead of rewriting it wholesale.

Writes one CORRECTNESS-shaped JSON (default SELFCHECK.json at the repo
root) and prints a per-query line; exit 1 if any gate fails.
"""

from __future__ import annotations

import hashlib
import json
import math
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))


def _render(v) -> str:
    """One canonical string per cell — mirrors a hash over the printed
    frame: dtype drift (75359 vs 75359.0) must change the render."""
    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT:
        return "∅"
    if isinstance(v, float) and math.isnan(v):
        return "∅"
    if isinstance(v, np.ndarray):
        return "[" + ",".join(_render(x) for x in v.tolist()) + "]"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_render(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_render(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, (np.floating, float)):
        return repr(float(v))
    if isinstance(v, np.integer):
        return repr(int(v))
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    return str(v)


def value_hash(pdf) -> str:
    cols = sorted(pdf.columns)
    rendered = pdf[cols].map(_render)
    if len(rendered):
        rendered = rendered.sort_values(by=cols).reset_index(drop=True)
    h = hashlib.md5()
    for c in cols:
        h.update(c.encode())
        for cell in rendered[c]:
            h.update(cell.encode())
            h.update(b"\x1f")
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> int:
    args = sys.argv[1:]
    only: set[str] | None = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    out_path = Path(args[1]) if len(args) > 1 else _REPO / "SELFCHECK.json"

    from polars_fastx_spark.catalog import QUERIES
    from polars_fastx_spark.session import builder
    from tests.oracle_utils import duck_connect

    spark = (
        builder(
            "selfcheck",
            master="local[8]",
            extra_conf={
                "spark.sql.shuffle.partitions": "8",
                "spark.ui.enabled": "false",
            },
        ).getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connect(sf_dir)

    results: dict[str, dict] = {}
    if only is not None:
        unknown = only - set(QUERIES)
        if unknown:
            raise SystemExit(f"unknown queries: {sorted(unknown)}")
        if out_path.exists():
            results = json.loads(out_path.read_text())
    failures = 0
    t_all = time.time()
    for name in sorted(only if only is not None else QUERIES):
        spec = QUERIES[name]
        row = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
            row["spark_rows"] = len(sdf)
            if spec.oracle is None:
                row["err"] = "no_oracle"
            else:
                odf = con.execute(spec.oracle).df()
                row["oracle_rows"] = len(odf)
                row["rows_match"] = len(sdf) == len(odf)
                row["schema_match"] = sorted(sdf.columns) == sorted(odf.columns)
                row["hash_match"] = (
                    row["rows_match"]
                    and row["schema_match"]
                    and value_hash(sdf) == value_hash(odf)
                )
        except Exception as e:  # noqa: BLE001
            row["err"] = f"{type(e).__name__}: {str(e)[:200]}"
        results[name] = row
        bad = (
            row["err"] not in (None, "no_oracle")
            or row["rows_match"] is False
            or row["schema_match"] is False
            or row["hash_match"] is False
        )
        failures += bad
        status = "FAIL" if bad else ("rows" if spec.oracle is None else "OK  ")
        print(f"{status} {name:28s} {time.time() - t0:6.2f}s", flush=True)

    out_path.write_text(json.dumps(results, indent=2))
    n_oracle = sum(1 for r in results.values() if r["err"] != "no_oracle")
    print(
        f"\n{len(results)} queries ({n_oracle} oracle-backed), "
        f"{failures} failures, {time.time() - t_all:.0f}s -> {out_path}"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
