#!/usr/bin/env python
"""Run the full catalog against the DuckDB oracle. Usage:

    python scripts/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    names = [a for a in args if "/" not in a]

    from polars_fastx_spark.catalog import QUERIES
    from polars_fastx_spark.session import builder
    from tests.oracle_utils import check_query, duck_connect

    spark = (
        builder("oracle-check", master="local[8]",
                extra_conf={"spark.sql.shuffle.partitions": "8",
                            "spark.ui.enabled": "false"})
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connect(sf_dir)

    todo = names or sorted(QUERIES)
    failures = 0
    for name in todo:
        t0 = time.time()
        try:
            problems = check_query(spark, con, name, sf_dir)
        except Exception as e:  # noqa: BLE001
            problems = [f"EXCEPTION: {type(e).__name__}: {str(e)[:300]}"]
        dt = time.time() - t0
        status = "OK " if not problems else "FAIL"
        oracle = "oracle" if QUERIES[name].oracle else "rows-only"
        print(f"{status} {name:28s} {dt:6.2f}s [{oracle}]")
        for p in problems:
            print(f"     - {p}")
            failures += 1
    print(f"\n{len(todo)} queries, {failures} problems")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
