"""Physical-plan inspection and audit helpers."""

from solarboat_data_pipeline_spark.plans.audit import (
    audit,
    codegen_stage_count,
    explain_string,
    has_broadcast_hash_join,
    has_cartesian_join,
    pushed_filters,
    shuffle_count,
)

__all__ = [
    "audit",
    "codegen_stage_count",
    "explain_string",
    "has_broadcast_hash_join",
    "has_cartesian_join",
    "pushed_filters",
    "shuffle_count",
]
