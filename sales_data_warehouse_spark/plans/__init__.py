"""Physical-plan inspection utilities (scale hygiene tooling)."""

from sales_data_warehouse_spark.plans.audit import (
    codegen_stage_count,
    executed_plan,
    has_nested_loop_join,
    pushed_filters,
    scan_columns,
)

__all__ = [
    "codegen_stage_count",
    "executed_plan",
    "has_nested_loop_join",
    "pushed_filters",
    "scan_columns",
]
