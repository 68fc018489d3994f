"""Shared column-expression helpers (no UDFs — every helper builds a
native Catalyst expression, SURVEY §2.10's zero-Python-in-the-hot-path
rule)."""

from sales_data_warehouse_spark.functions.expressions import (
    money,
    padded_id,
    tokens,
)

__all__ = ["money", "padded_id", "tokens"]
