from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

FIXTURES = Path(__file__).parent / "fixtures"
TESTDATA = Path(os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"))


@pytest.fixture(scope="session")
def spark():
    from polars_fastx_spark.session import builder

    s = (
        builder("polars_fastx_spark-tests", master="local[8]",
                extra_conf={"spark.sql.shuffle.partitions": "8",
                            "spark.ui.enabled": "false",
                            # one session serves ~240 tests incl. plan
                            # sweeps over the full 159-query catalog;
                            # broadcast/checkpoint blocks accumulate
                            # between GCs and the 1g default heap OOMs
                            # mid-suite. Periodic GC keeps the context
                            # cleaner's reference queue draining.
                            "spark.driver.memory": "6g",
                            "spark.cleaner.periodicGC.interval": "1min"})
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf001(spark):
    """sf0.001 testdata views registered on the session."""
    from polars_fastx_spark.session import load_tables

    return load_tables(spark, str(TESTDATA / "sf0.001"))
