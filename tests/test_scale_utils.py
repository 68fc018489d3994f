"""Plan-level tests for the scale utilities: salting must preserve join
results; bucketing must actually remove the shuffle from the plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sales_data_warehouse_spark.operators.skew import salted_join
from sales_data_warehouse_spark.sources.bucketed import (
    read_bucketed,
    write_bucketed,
)

SF_DIR = "/root/testdata/sf0.01"


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_matches_plain_join(spark, how):
    l = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    want = l.join(o, on=["l_orderkey"], how=how)
    got = salted_join(l, o, on=["l_orderkey"], how=how, salt=8)
    assert sorted(got.columns) == sorted(want.columns)
    assert _sorted_rows(got.select(*sorted(got.columns))) == _sorted_rows(
        want.select(*sorted(want.columns))
    )


def test_salted_join_rejects_right_join(spark):
    df = spark.range(4)
    with pytest.raises(ValueError):
        salted_join(df, df, on=["id"], how="right")


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    l = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    write_bucketed(
        l, "t_lineitem_b", ["l_orderkey"], 8, sort_cols=["l_orderkey"],
        path=str(tmp_path / "li"),
    )
    write_bucketed(
        o, "t_orders_b", ["o_orderkey"], 8, sort_cols=["o_orderkey"],
        path=str(tmp_path / "or"),
    )
    lb = read_bucketed(spark, "t_lineitem_b")
    ob = read_bucketed(spark, "t_orders_b")
    # Force a non-broadcast join so the exchange (or its absence) shows.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey)
        joined.write.format("noop").mode("overwrite").save()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        # sanity: result matches the plain (shuffled) join
        n_plain = l.join(o, l.l_orderkey == o.o_orderkey).count()
        assert joined.count() == n_plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
        spark.sql("DROP TABLE IF EXISTS t_orders_b")


def test_bucketed_composite_key_groupby_join_has_no_exchange(
    spark, tmp_path
):
    """Pin the bench's 100 TB composite-key answer (r6 VERDICT #7): a
    table bucketed on (l_orderkey, l_partkey) must serve BOTH the
    group-by aggregate and the join back to itself with ZERO exchanges
    — a Spark upgrade or config drift that silently reintroduces the
    shuffle would forfeit what the one-time bucket write paid for."""
    l = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_linenumber", "l_quantity"
    )
    write_bucketed(
        l, "t_lineitem_ck", ["l_orderkey", "l_partkey"], 8,
        path=str(tmp_path / "ck"),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        lb = read_bucketed(spark, "t_lineitem_ck")
        agg = lb.groupBy("l_orderkey", "l_partkey").agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_qty"),
        )
        joined = (
            lb.join(agg, on=["l_orderkey", "l_partkey"])
            .filter(F.col("n_lines") > 1)
            .select(
                "l_orderkey", "l_partkey", "l_linenumber",
                "n_lines", "total_qty",
            )
        )
        joined.write.format("noop").mode("overwrite").save()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "Exchange" not in final, final[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_lineitem_ck")


def test_asof_union_plan_is_pure_jvm_single_shuffle(spark):
    """Pin the round-7 both-sides-huge as-of engine: the union-tag +
    running-last plan must contain NO Python/Arrow operator and exactly
    one hash exchange + one sort per direction pass (two sorts for
    'nearest', which shares the single exchange)."""
    from sales_data_warehouse_spark.operators.asof import asof_join_grouped

    l = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        F.col("l_partkey").alias("p_partkey"),
        F.col("l_shipdate").cast("date").alias("ship_date"),
    )
    p = spark.read.parquet(f"{SF_DIR}/part.parquet").select(
        "p_partkey",
        F.col("p_retailprice").alias("eff_price"),
        F.lit("1995-01-01").cast("date").alias("eff_date"),
    )
    for direction, n_sorts in (("backward", 1), ("nearest", 2)):
        df = asof_join_grouped(
            l, p, on=["p_partkey"], left_ts="ship_date",
            right_ts="eff_date", direction=direction,
        )
        df.write.format("noop").mode("overwrite").save()
        plan = df._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        for bad in ("Python", "ArrowEval", "FlatMapCoGroups"):
            assert bad not in final, (direction, final[:2000])
        assert final.count("Exchange hashpartitioning") == 1, (
            direction, final[:2000],
        )
        assert final.count("Sort ") == n_sorts, (direction, final[:2000])


def test_approx_frequent_items_exact_under_tracked_limit(spark):
    from sales_data_warehouse_spark.operators.profile import (
        approx_frequent_items,
    )
    from pyspark.sql import functions as F

    o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    got = {
        r.item: r["count"]
        for r in approx_frequent_items(o, "o_orderpriority", k=3).collect()
    }
    true = {
        str(r["o_orderpriority"]): r["n"]
        for r in o.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"))
        .limit(3)
        .collect()
    }
    # distinct priorities << max_items_tracked -> sketch is exact
    assert got == true
