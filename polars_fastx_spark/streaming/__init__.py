"""Structured Streaming surface (SURVEY.md §2.9 T1-T7)."""

from polars_fastx_spark.streaming.pipelines import (
    sliding_counts,
    stream_dedup,
    stream_events,
    session_value_sums,
    tumbling_counts,
    write_tsv_stream,
)

__all__ = [
    "stream_events",
    "stream_dedup",
    "tumbling_counts",
    "sliding_counts",
    "session_value_sums",
    "write_tsv_stream",
]
