"""Incremental location merge: old ids must survive verbatim (the
append-stability a consumer that stored location_id depends on), new
addresses get fresh ids past each level's max, and the merged natural
keys equal a full rebuild's."""

from __future__ import annotations

from pyspark.sql import functions as F

from sales_data_warehouse_spark.operators.cleansing import cleanse
from sales_data_warehouse_spark.operators.location_dimension import (
    build_location_dimension,
    merge_location_dimension,
)
from sales_data_warehouse_spark.sources.csv_ingest import ingest_csv
from tests.conftest import REFERENCE_CSV

KEY = ["street_name", "city_name", "state_name", "postal"]


def test_merge_is_append_stable(spark):
    cleansed, _ = cleanse(ingest_csv(spark, REFERENCE_CSV))
    cleansed = cleansed.cache()
    cut = "2019-01-15"
    first = cleansed.filter(F.col("order_date") <= cut)
    second = cleansed.filter(F.col("order_date") > cut)

    base = build_location_dimension(first).cache()
    merged = merge_location_dimension(base, second).cache()
    full = build_location_dimension(cleansed)

    # same natural-key contents as a full rebuild
    assert merged.count() == full.count() == 9160
    assert (
        merged.select(*KEY).exceptAll(full.select(*KEY)).count() == 0
    )

    # old rows kept their ids verbatim
    changed = (
        merged.alias("m")
        .join(base.alias("b"), on=KEY, how="inner")
        .filter(
            (F.col("m.location_id") != F.col("b.location_id"))
            | (F.col("m.street_id") != F.col("b.street_id"))
            | (F.col("m.city_id") != F.col("b.city_id"))
            | (F.col("m.state_id") != F.col("b.state_id"))
        )
    )
    assert changed.count() == 0

    # ids still unique; level mapping still functional
    assert merged.select("location_id").distinct().count() == 9160
    assert (
        merged.select("state_name", "postal", "state_id").distinct().count()
        == merged.select("state_name", "postal").distinct().count()
    )
    # new ids continue past the old max instead of renumbering
    old_max = base.agg(
        F.max(F.substring("location_id", 2, 10).cast("int"))
    ).first()[0]
    new_rows = merged.join(base, on=KEY, how="left_anti")
    new_min = new_rows.agg(
        F.min(F.substring("location_id", 2, 10).cast("int"))
    ).first()[0]
    assert new_min == old_max + 1
    cleansed.unpersist()
    base.unpersist()
    merged.unpersist()
