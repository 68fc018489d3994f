"""Executed-plan inspection: the checks behind ``tests/test_plan_quality``
exposed as a library, so pipelines can assert their own plan hygiene
(filters pushed to the scan, no accidental nested-loop joins, codegen
active) before a 100 TB run rather than after it.

The engine writes no custom Catalyst rules (SURVEY §4: every capability
lands on a stock primitive); this module only *reads* what Catalyst
produced.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame, finalize: bool = True) -> str:
    """The physical plan string. With ``finalize`` the DataFrame is
    executed first so AQE's final plan (runtime join strategies, codegen
    stages) is what gets inspected — the pre-execution plan of an AQE
    query still shows the static guesses."""
    if finalize:
        # collect() executes THIS DataFrame's QueryExecution (a write
        # would plan a separate one and leave this plan pre-AQE)
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """Predicates that reached the parquet/ORC scan (empty = full scan)."""
    plan = executed_plan(df, finalize=False)
    out: list[str] = []
    # long filter lists render truncated ("[IsNotNull(x), GreaterThan(y...")
    # with no closing bracket — stop at either terminator
    for m in re.finditer(r"PushedFilters: \[(.*?)(?:\]|\.\.\.)", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def scan_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each file scan (pruning check)."""
    plan = executed_plan(df, finalize=False)
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)", plan):
        cols = [f.split(":")[0].strip() for f in m.group(1).split(",") if f]
        schemas.append(cols)
    return schemas


def has_nested_loop_join(df: DataFrame, finalized: bool = True) -> bool:
    """True if the plan contains a cartesian or broadcast-nested-loop
    join — legitimate only for intentional cross joins / non-equi joins."""
    plan = executed_plan(df, finalize=finalized)
    return "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan


def codegen_stage_count(df: DataFrame, finalized: bool = True) -> int:
    """Number of whole-stage-codegen spans (rendered ``*(n)`` in the
    plan). Zero on a non-trivial query means interpreted execution —
    investigate expression width (codegen.maxFields) or UDF use."""
    plan = executed_plan(df, finalize=finalized)
    return len(set(re.findall(r"\*\((\d+)\)", plan)))
