"""Range (point-in-interval) join without an equi key.

Catalyst's only native plan for ``p.ts BETWEEN i.start AND i.end`` with
no equality conjunct is a broadcast-nested-loop join — O(|points| x
|intervals|) comparisons, the classic scale killer. The standard fix
(used by every interval-join implementation, including Databricks'
range-join optimization and Flink's interval join) is grid bucketing:

  * choose a grid width (in days here);
  * each point maps to ONE grid cell;
  * each interval explodes to EVERY cell it overlaps
    (``sequence(floor(start/g), floor(end/g))``);
  * equi-join on the cell, then apply the exact BETWEEN filter.

Cost: |points| + |intervals| x (avg interval span / grid) shuffled rows
and a hash join — linear-ish, tunable by grid width (wider grid = fewer
replicas, more post-filtering). The result is exactly the BETWEEN
semantics; bucketing is pure execution strategy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EPOCH = "1970-01-01"


def _cell(date_col, grid_days: int):
    return F.floor(F.datediff(date_col, F.lit(_EPOCH)) / grid_days)


def range_join_dates(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    grid_days: int = 7,
    how: str = "inner",
) -> DataFrame:
    """Join rows of ``points`` to every interval containing their date:
    ``start <= point <= end`` (all three DATE columns), hash-joined on
    grid cells instead of nested-loop scanned.

    Intervals whose span is much larger than ``grid_days`` replicate
    across proportionally many cells — pick the grid near the typical
    interval length. ``how='inner'`` only (outer variants would need
    the unmatched sides re-attached after the cell join).
    """
    if how != "inner":
        raise ValueError("range_join_dates supports inner joins only")
    p = points.withColumn("_cell", _cell(F.col(point_col), grid_days))
    i = intervals.withColumn(
        "_cell",
        F.explode(
            F.sequence(
                _cell(F.col(start_col), grid_days),
                _cell(F.col(end_col), grid_days),
            )
        ),
    )
    return (
        p.join(i, "_cell")
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("_cell")
    )
