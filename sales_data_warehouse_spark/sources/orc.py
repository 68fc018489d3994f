"""ORC source/sink — the columnar format interchange path for stacks
standardized on Hive/Trino (SURVEY S1's bulk-load family, third format
after CSV and JSONL).

Spark's ORC reader is a first-class vectorized columnar source: the
same predicate-pushdown / column-pruning / split-by-stripe behavior the
parquet scans in this repo pin in ``tests/test_plan_quality`` applies
(``PushedFilters`` / ``ReadSchema`` render identically in the plan), so
an ORC-resident corpus runs every corpus query with the same physical
characteristics. Schema is taken from the files' own metadata — ORC is
self-describing, so unlike CSV/JSONL there is no inference scan to
avoid and no corrupt-record routing to do (a torn file fails the read
loudly rather than yielding quiet NULL rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read an ORC dataset (file, directory, or glob)."""
    return spark.read.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str] | None = None,
    compression: str = "zstd",
) -> None:
    """Write ORC shards, optionally hive-partitioned.

    zstd default: best size/speed trade for cold corpus storage; pass
    ``snappy`` for scan-hot intermediates.
    """
    w = df.write.mode("overwrite").option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
