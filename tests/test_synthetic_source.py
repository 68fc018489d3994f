"""Python DataSource: determinism, partition-parallelism, and operator
integration at row counts the shipped testdata doesn't reach."""

from __future__ import annotations

from pyspark.sql import functions as F

from sales_data_warehouse_spark.sources.synthetic import register


def _docs(spark, rows, parts=8):
    register(spark)
    return (
        spark.read.format("sdw_synth")
        .option("table", "documents")
        .option("rows", rows)
        .option("partitions", parts)
        .load()
    )


def test_deterministic_across_partitionings(spark):
    a = _docs(spark, 500, parts=2).orderBy("doc_id").collect()
    b = _docs(spark, 500, parts=16).orderBy("doc_id").collect()
    assert a == b
    assert len(a) == 500 and a[0].doc_id == 0 and a[-1].doc_id == 499


def test_partitions_become_tasks(spark):
    df = _docs(spark, 1000, parts=7)
    assert df.rdd.getNumPartitions() == 7


def test_events_table_shape(spark):
    register(spark)
    e = (
        spark.read.format("sdw_synth")
        .option("table", "events")
        .option("rows", 2000)
        .load()
    )
    assert e.count() == 2000
    types = {r.event_type for r in e.select("event_type").distinct().collect()}
    assert types <= {"view", "click", "purchase", "refund"}


def test_operator_runs_at_scale_beyond_testdata(spark):
    # exact dedup over 200k synthetic docs — bigger than any shipped
    # sf's documents table; fingerprint groupBy must stay distributed
    from sales_data_warehouse_spark.operators.dedup import exact_duplicates

    docs = _docs(spark, 200_000, parts=32)
    fp = exact_duplicates(docs)
    total = fp.agg(F.sum("n_copies")).first()[0]
    assert total == 200_000
