"""Physical-plan audits: the properties that decide whether a query
survives a 100x scale-up. Correctness is covered by the oracle parity
suite; these tests pin the *plan shapes* — pushdown reaching the scan,
column pruning, broadcast on dimension joins, and no accidental
cartesian products."""

from __future__ import annotations

import pytest

from sales_data_warehouse_spark.queries.corpus import QUERIES

SF_DIR = "/root/testdata/sf0.01"

#: Queries whose plans legitimately contain a cartesian/nested-loop join:
#: explicit dense-cube cross joins, the as-of non-equi join, and the
#: exact all-pairs similarity baselines.
CARTESIAN_OK = {
    "dense_cube_crossjoin",
    "asof_join_pricelist",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "date_spine",
    "time_hierarchy",
}


def _executed_plan(df) -> str:
    # collect() finalizes THIS DataFrame's QueryExecution (a write would
    # plan a separate one, leaving this plan pre-AQE with codegen and
    # final join strategies not yet decided).
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_reaches_parquet_scan(spark):
    plan = _executed_plan(QUERIES["filter_projection"](spark, SF_DIR))
    assert "PushedFilters: [" in plan
    # at least one real pushed predicate, not just the empty list
    assert "PushedFilters: []" not in plan.split("PushedFilters:")[1][:4]


def test_projection_prunes_scan_columns(spark):
    plan = _executed_plan(QUERIES["filter_projection"](spark, SF_DIR))
    scan = plan.split("ReadSchema:")[1].splitlines()[0]
    # lineitem has 11 columns; the query needs a handful
    assert scan.count(":") <= 8, scan


def test_dimension_joins_broadcast(spark):
    plan = _executed_plan(QUERIES["join_multiway"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_aggregates_are_partial(spark):
    # map-side partial aggregation: two HashAggregate levels around the
    # exchange, so the shuffle carries one row per group per task.
    plan = _executed_plan(QUERIES["pricing_summary"](spark, SF_DIR))
    assert plan.count("HashAggregate") >= 2


def test_whole_stage_codegen_active(spark):
    plan = _executed_plan(QUERIES["pricing_summary"](spark, SF_DIR))
    # codegen stages render as "*(n) Operator" in the plan string
    assert "*(1)" in plan and "*(2)" in plan


@pytest.mark.parametrize(
    "name", sorted(n for n in QUERIES if n not in CARTESIAN_OK)
)
def test_no_accidental_cartesian(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian join"
    assert "BroadcastNestedLoopJoin" not in plan, (
        f"{name} plans a nested-loop join"
    )
