"""The cogroup/merge_asof as-of variant must agree with the broadcast
join+max_by variant on the same inputs (both directions)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sales_data_warehouse_spark.operators.asof import (
    asof_join,
    asof_join_grouped,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def sides(spark):
    l = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_partkey").alias("p_partkey"),
            F.col("l_shipdate").cast("date").alias("ship_date"),
        )
        .limit(5000)
    )
    p = spark.read.parquet(f"{SF_DIR}/part.parquet")
    v1 = p.select(
        "p_partkey",
        F.col("p_retailprice").alias("eff_price"),
        F.lit("1995-01-01").cast("date").alias("eff_date"),
    )
    v2 = p.select(
        "p_partkey",
        (F.col("p_retailprice") * 1.2).alias("eff_price"),
        F.lit("1998-01-01").cast("date").alias("eff_date"),
    )
    return l, v1.unionByName(v2)


def _key_rows(df):
    return sorted(
        (
            r["l_orderkey"],
            r["l_linenumber"],
            r["p_partkey"],
            str(r["ship_date"]),
            str(r["eff_date"]),
            round(float(r["eff_price"]), 2),
        )
        for r in df.collect()
    )


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_grouped_matches_broadcast(spark, sides, direction):
    l, ph = sides
    want = asof_join(
        l, ph, on=["p_partkey"], left_ts="ship_date", right_ts="eff_date",
        direction=direction,
    )
    got = asof_join_grouped(
        l, ph, on=["p_partkey"], left_ts="ship_date", right_ts="eff_date",
        direction=direction,
    )
    assert sorted(got.columns) == sorted(want.columns)
    assert _key_rows(got) == _key_rows(want)
