"""Range-join invariants: exact BETWEEN semantics at any grid width,
overlapping/nested/empty intervals, and the plan staying a hash join."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sales_data_warehouse_spark.operators.range_join import range_join_dates
from sales_data_warehouse_spark.plans import has_nested_loop_join


def _points(spark):
    rows = [
        (i, dt.date(2024, 1, 1) + dt.timedelta(days=i * 3)) for i in range(40)
    ]
    return spark.createDataFrame(rows, ["pid", "d"])


def _intervals(spark):
    rows = [
        # overlapping, nested, and disjoint spans; one empty-range decoy
        (100, dt.date(2024, 1, 1), dt.date(2024, 1, 31)),
        (101, dt.date(2024, 1, 15), dt.date(2024, 2, 14)),
        (102, dt.date(2024, 1, 20), dt.date(2024, 1, 22)),
        (103, dt.date(2024, 3, 1), dt.date(2024, 3, 2)),
        (104, dt.date(2025, 1, 1), dt.date(2025, 1, 2)),
    ]
    return spark.createDataFrame(rows, ["iid", "s", "e"])


def _naive(points, intervals):
    return points.crossJoin(intervals).filter(
        (F.col("d") >= F.col("s")) & (F.col("d") <= F.col("e"))
    )


def test_matches_naive_between_at_any_grid(spark):
    p, iv = _points(spark), _intervals(spark)
    want = sorted(
        (r.pid, r.iid) for r in _naive(p, iv).select("pid", "iid").collect()
    )
    assert want  # sanity: the fixture produces matches
    for grid in (1, 7, 30, 365):
        got = sorted(
            (r.pid, r.iid)
            for r in range_join_dates(p, iv, "d", "s", "e", grid_days=grid)
            .select("pid", "iid")
            .collect()
        )
        assert got == want, f"grid={grid}"


def test_plan_is_hash_join_not_nested_loop(spark):
    p, iv = _points(spark), _intervals(spark)
    out = range_join_dates(p, iv, "d", "s", "e", grid_days=7)
    assert not has_nested_loop_join(out, finalized=False)
    assert has_nested_loop_join(_naive(p, iv), finalized=False)
