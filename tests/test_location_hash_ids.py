"""The hash id_strategy for the location dimension: the 100 TB path.
Must agree with the sequential build on everything except id format,
and its ids must be stable under repartitioning (the property the
window-based ids lack)."""

from __future__ import annotations

from sales_data_warehouse_spark.operators.cleansing import cleanse
from sales_data_warehouse_spark.operators.location_dimension import (
    build_location_dimension,
)
from sales_data_warehouse_spark.sources.csv_ingest import ingest_csv
from tests.conftest import REFERENCE_CSV


def test_hash_ids_match_sequential_grain(spark):
    cleansed, _ = cleanse(ingest_csv(spark, REFERENCE_CSV))
    cleansed = cleansed.cache()
    seq = build_location_dimension(cleansed)
    hsh = build_location_dimension(cleansed, id_strategy="hash")
    assert hsh.count() == seq.count() == 9160
    assert set(hsh.columns) == set(seq.columns)
    # level-id consistency: same natural key -> same id, across levels
    assert hsh.select("state_id").distinct().count() == 10
    assert hsh.select("city_id").distinct().count() == 10
    assert hsh.select("location_id").distinct().count() == 9160

    # stability under partitioning: recompute over a reshuffled input
    re = build_location_dimension(
        cleansed.repartition(17), id_strategy="hash"
    )
    a = sorted(r["location_id"] for r in hsh.collect())
    b = sorted(r["location_id"] for r in re.collect())
    assert a == b
    cleansed.unpersist()


def test_hash_plan_has_no_single_partition_window(spark):
    # isolate the build's own plan (cleanse upstream has its Q10 scalar-
    # max join, which is not what's under test here)
    addr = spark.createDataFrame(
        [("1 Main St", "Boston", "MA", "02215")],
        ["street", "city", "state", "postal"],
    )
    hsh = build_location_dimension(addr, id_strategy="hash")
    plan = hsh._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    # no hierarchy joins either — level ids are pure projections
    assert "Join" not in plan
