"""Incremental SCD2 merge must equal a full rebuild over the combined
history — on the reference CSV split by date, and on a synthetic
price-change scenario where the new version only appears in the
increment."""

from __future__ import annotations

from pyspark.sql import functions as F

from sales_data_warehouse_spark.operators.cleansing import cleanse
from sales_data_warehouse_spark.operators.product_dimension import (
    build_product_dimension,
    merge_product_dimension,
)
from sales_data_warehouse_spark.sources.csv_ingest import ingest_csv
from tests.conftest import REFERENCE_CSV


def _rows(dim):
    return sorted(tuple(map(str, r)) for r in dim.collect())


def test_merge_equals_full_rebuild_on_reference(spark):
    cleansed, _ = cleanse(ingest_csv(spark, REFERENCE_CSV))
    cleansed = cleansed.cache()
    cut = "2019-01-15"
    first = cleansed.filter(F.col("order_date") <= cut)
    second = cleansed.filter(F.col("order_date") > cut)

    full = build_product_dimension(cleansed)
    merged = merge_product_dimension(build_product_dimension(first), second)
    assert _rows(merged) == _rows(full)
    cleansed.unpersist()


def test_merge_flips_predecessor_on_price_change(spark):
    def batch(rows):
        return spark.createDataFrame(
            rows,
            "order_id int, product string, quantity_ordered int, "
            "price_each decimal(10,2), order_date date, street string, "
            "city string, state string, postal string",
        )

    import datetime as dt
    from decimal import Decimal

    d = dt.date
    old = batch(
        [(1, "Widget", 1, Decimal("5.00"), d(2019, 1, 5), "s", "c", "st", "z")]
    )
    new = batch(
        [(2, "Widget", 1, Decimal("6.00"), d(2019, 2, 1), "s", "c", "st", "z")]
    )
    dim0 = build_product_dimension(old)
    r0 = dim0.collect()
    assert len(r0) == 1
    assert (r0[0]["active_status"], r0[0]["action_flag"]) == ("Y", "I")

    dim1 = merge_product_dimension(dim0, new)
    by_price = {str(r["price_each"]): r for r in dim1.collect()}
    assert len(by_price) == 2
    # predecessor flipped inactive, successor active and flagged Update
    assert by_price["5.00"]["active_status"] == "N"
    assert by_price["6.00"]["active_status"] == "Y"
    assert by_price["6.00"]["action_flag"] == "U"
    # shared surrogate id across versions
    assert by_price["5.00"]["product_id"] == by_price["6.00"]["product_id"]
