"""Driver-contract hardening: the driver invokes ``__spark_entry__``
with ITS OWN SparkSession — not one built by ``session.builder`` — so
every query must work after only ``_ensure_conf``'s runtime conf sets.
This pins that path with a deliberately vanilla session config
(separate JVM app, engine defaults absent)."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_entry_and_queries_on_vanilla_session():
    code = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[4]")
    .appName("vanilla-driver-sim")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as E
rows = E.entry(spark).collect()
assert len(rows) > 0 and len(rows[0].asDict()) > 0
qs = E.queries()
# one query per risk class: events-ts normalization, documents text
# fan-out, higher-order fuzzy keys
for name in ("t_mad_outliers", "l_span_dedup", "j_fuzzy"):
    out = qs[name](spark, "/root/testdata/sf0.001").collect()
    assert out is not None
print("VANILLA-OK")
""".format(repo=str(REPO))
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=600,
    )
    assert "VANILLA-OK" in r.stdout, r.stdout[-2000:] + r.stderr[-2000:]
