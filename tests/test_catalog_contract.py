"""Catalog/oracle CONTRACT gate: for every oracle-backed query, the
Spark result's column names must equal the oracle SQL's projected names
exactly (the driver's compare sorts columns BY NAME before hashing, so
a name mismatch is a guaranteed red row even with identical values —
the most common silent failure mode). The oracle side binds through
DuckDB ``DESCRIBE`` — no execution, just name resolution."""

from __future__ import annotations

import duckdb
import pytest

from polars_fastx_spark.catalog import QUERIES

SF = "/root/testdata/sf0.001"
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="module")
def oracle_cols():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS FROM '{SF}/{t}.parquet'")
    out = {}
    for name, spec in QUERIES.items():
        if spec.oracle is not None:
            out[name] = [r[0] for r in con.execute(f"DESCRIBE {spec.oracle}").fetchall()]
    return out


def test_every_oracle_query_matches_column_names(spark, oracle_cols):
    mismatches = []
    for name, want in sorted(oracle_cols.items()):
        got = QUERIES[name].fn(spark, SF).columns
        if got != want:
            mismatches.append(f"{name}: spark={got} oracle={want}")
    assert not mismatches, "\n".join(mismatches)


def test_column_name_contract_smoke_sample(spark, oracle_cols):
    """Fast-tier smoke of the full sweep above (which is `slow`: it
    ANALYZES all ~240 Spark plans, ~2 min): a deterministic every-8th
    slice of the sorted query list keeps the contract covered in the
    default run without the full analysis bill."""
    names = sorted(oracle_cols)[::8]
    mismatches = []
    for name in names:
        want = oracle_cols[name]
        got = QUERIES[name].fn(spark, SF).columns
        if got != want:
            mismatches.append(f"{name}: spark={got} oracle={want}")
    assert not mismatches, "\n".join(mismatches)


# NOTE: row ORDER is deliberately not asserted — the driver protocol
# sorts rows by all columns before hashing, so output order never
# affects the compare; only the column NAMES are load-bearing.
