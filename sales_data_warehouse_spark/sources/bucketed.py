"""Bucketed-table storage for shuffle-free co-located joins (SURVEY §4).

A fact table re-joined on the same key every run (orders ⋈ lineitem on
orderkey, fact ⋈ dimension on surrogate key) should pay its shuffle
ONCE, at write time: ``bucketBy`` hash-partitions rows into a fixed
bucket count inside each file write, and Spark's scan reports that
layout so later equi-joins on the bucket key skip the exchange
entirely. At 100 TB that converts every repeated join from a full
network shuffle into a local zip of matching buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) managed table.

    Sorting within buckets additionally removes the sort step of a
    sort-merge join between two tables bucketed+sorted the same way.
    Bucket counts must match (or divide) across join sides to align.
    """
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table WITH its bucket spec (must go through the
    catalog — ``spark.read.parquet(path)`` on the same files would lose
    the layout and reintroduce the shuffle)."""
    return spark.table(table)
