"""Scan sources and sinks (SURVEY.md §2.1)."""

from polars_fastx_spark.sources.fastx import (
    FastxDataSource,
    read_fastx,
    scan_fastx,
)
from polars_fastx_spark.sources.sinks import write_tsv

__all__ = ["FastxDataSource", "scan_fastx", "read_fastx", "write_tsv"]
