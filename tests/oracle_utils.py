"""Local DuckDB-oracle parity harness (mirrors the driver's t2 check).

For each catalog entry with an oracle: run the Spark builder and the
DuckDB SQL on the same sf dir, then compare column names, row counts,
and values (order-insensitive: rows sorted by all columns; floats to
1e-9, exact otherwise).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        if out[c].dtype == object:
            out[c] = out[c].map(lambda v: None if v is None else str(v))
    if len(out):
        out = out.sort_values(by=list(out.columns), na_position="first").reset_index(
            drop=True
        )
    return out


def compare(spark_df, duck_df) -> list[str]:
    """Return list of mismatch descriptions (empty = parity)."""
    problems: list[str] = []
    s = canon(spark_df.toPandas())
    d = canon(duck_df)
    if sorted(s.columns) != sorted(d.columns):
        return [f"columns differ: spark={sorted(s.columns)} duck={sorted(d.columns)}"]
    if len(s) != len(d):
        return [f"row counts differ: spark={len(s)} duck={len(d)}"]
    for c in s.columns:
        sv, dv = s[c], d[c]
        for i, (a, b) in enumerate(zip(sv, dv)):
            a_null = a is None or (isinstance(a, float) and math.isnan(a)) or a is pd.NaT
            b_null = b is None or (isinstance(b, float) and math.isnan(b)) or b is pd.NaT
            if a_null and b_null:
                continue
            if a_null != b_null:
                problems.append(f"{c}[{i}]: null mismatch {a!r} vs {b!r}")
            elif isinstance(a, float) or isinstance(b, float):
                if not math.isclose(float(a), float(b), rel_tol=0, abs_tol=1e-9):
                    problems.append(f"{c}[{i}]: {a!r} != {b!r}")
            elif a != b:
                problems.append(f"{c}[{i}]: {a!r} != {b!r}")
            if len(problems) >= 5:
                return problems
    return problems


def check_query(spark, con, name: str, sf_dir: str) -> list[str]:
    from polars_fastx_spark.catalog import QUERIES

    spec = QUERIES[name]
    sdf = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        n = sdf.count()
        return [] if n >= 0 else ["spark query failed"]
    ddf = con.execute(spec.oracle).df()
    return compare(sdf, ddf)
