"""Physical-plan inspection utilities (SURVEY.md §4.3/§5.6)."""

from polars_fastx_spark.plans.asserts import (
    explain_str,
    has_broadcast_join,
    has_cartesian,
    has_pushed_filters,
    has_whole_stage_codegen,
    pruned_columns,
    shuffle_count,
)

__all__ = [
    "explain_str",
    "has_broadcast_join",
    "has_cartesian",
    "has_pushed_filters",
    "has_whole_stage_codegen",
    "pruned_columns",
    "shuffle_count",
]
