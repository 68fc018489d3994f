"""End-to-end golden invariants on the reference CSV (SURVEY §5).

Counts derived from simulating the reference procedures on
``Sales_January_2019.csv`` (see SURVEY.md §5 / FIXTURES.md A1):
landing 9,723 · invalid 42 · cleansed 9,671 · products 19 · days 32 ·
locations 9,160 · (state,postal) 10 · dense fact 5,569,280 ·
Σ quantity 10,858 · Σ revenue 1,814,491.55.
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from sales_data_warehouse_spark.etl import run_etl
from sales_data_warehouse_spark.operators.fact import dense_fact
from tests.conftest import REFERENCE_CSV


@pytest.fixture(scope="module")
def etl(spark):
    res = run_etl(spark, REFERENCE_CSV)
    yield res
    res.cleansed.unpersist()


def test_landing_count(etl):
    assert etl.landing.count() == 9723


def test_invalid_routing(etl):
    # 26 all-blank rows (null check, P2) + 16 repeated header rows (cast
    # failure, P3) = 42 rejects (Cleansing.sql:37-54, 64-106).
    by_reason = dict(
        etl.invalid.groupBy("reject_reason").count().collect()
    )
    assert by_reason == {
        "null_required_field": 26,
        "cast_failure": 16,
    }


def test_cleansed_count_and_schema(etl):
    assert etl.cleansed.count() == 9671
    assert [f.name for f in etl.cleansed.schema.fields] == [
        "order_id", "product", "quantity_ordered", "price_each",
        "order_date", "street", "city", "state", "postal",
    ]


def test_conservation(etl):
    # Property: every landing row is accounted for — invalid + pre-distinct
    # cleansed = landing.
    pre_distinct = 9681  # SURVEY §5: cleansed before full-row DISTINCT
    assert etl.invalid.count() + pre_distinct == 9723


def test_product_dimension_scd2(etl):
    pd_ = etl.product_dimension
    assert pd_.count() == 19
    # No product has two prices in this CSV: all versions active + initial.
    assert pd_.filter("active_status = 'Y'").count() == 19
    assert pd_.filter("action_flag = 'I'").count() == 19
    # product_id is shared nothing: 19 distinct ids for 19 products
    assert pd_.select("product_id").distinct().count() == 19


def test_time_dimension(etl):
    td = etl.time_dimension
    assert td.count() == 32
    lo, hi = td.agg(F.min("time_desc"), F.max("time_desc")).first()
    assert lo == dt.date(2019, 1, 1)
    assert hi == dt.date(2019, 2, 1)
    # hierarchy denormalization is total: no nulls anywhere
    assert td.filter(
        F.col("week_id").isNull()
        | F.col("month_id").isNull()
        | F.col("quarter_id").isNull()
        | F.col("half_year_id").isNull()
        | F.col("year_id").isNull()
    ).count() == 0


def test_location_dimension(etl):
    loc = etl.location_dimension
    assert loc.count() == 9160
    # Q8: state grain is (state, postal) — 10 on this CSV.
    assert loc.select("state_id").distinct().count() == 10
    assert loc.select("city_id").distinct().count() == 10
    assert loc.select("location_id").distinct().count() == 9160


def test_sparse_fact(etl):
    fact = etl.fact
    # Every cleansed row resolves exactly one row in each dimension.
    assert fact.count() == 9671
    agg = fact.agg(
        F.sum("quantity_ordered").alias("qty"),
        F.sum(F.col("quantity_ordered") * F.col("price_each")).alias("rev"),
    ).first()
    assert agg["qty"] == 10858
    assert agg["rev"] == Decimal("1814491.55")


def test_dense_fact_cardinality(etl):
    dense = dense_fact(
        etl.fact, etl.product_dimension, etl.location_dimension,
        etl.time_dimension,
    )
    assert dense.count() == 32 * 19 * 9160  # 5,569,280
    # zero-fill preserved the sales total
    assert dense.agg(F.sum("quantity_ordered")).first()[0] == 10858


def test_adhoc_sql_over_registered_views(etl, spark):
    from sales_data_warehouse_spark.etl import register_views

    register_views(spark, etl)
    row = spark.sql(
        """
        SELECT t.month_id, SUM(f.quantity_ordered * f.price_each) AS revenue
        FROM fact_table f JOIN time_dimension t ON f.time_id = t.time_id
        WHERE t.month_id = (SELECT MIN(month_id) FROM time_dimension)
        GROUP BY t.month_id
        """
    ).collect()
    assert len(row) == 1
    total = spark.sql(
        "SELECT SUM(quantity_ordered * price_each) AS r FROM fact_table"
    ).first()["r"]
    assert float(total) == pytest.approx(1814491.55, abs=0.01)


def test_flagship_query_revenue_by_city(etl):
    # SURVEY §7 step 2: the first business question the warehouse answers.
    rev = (
        etl.cleansed.groupBy("city")
        .agg(
            F.sum(F.col("quantity_ordered") * F.col("price_each")).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"))
    )
    rows = rev.collect()
    assert len(rows) == 9  # 9 cities (10 (state,postal) pairs incl. 2 Portlands)
    assert sum(r["revenue"] for r in rows) == Decimal("1814491.55")
    assert rows[0]["city"] == "San Francisco"
