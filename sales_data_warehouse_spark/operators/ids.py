"""Surrogate-key strategies for different scales (SURVEY §4).

The reference generates ids with ``COUNT(*)+1`` per row
(``LocationDimension.sql:95,112,129``) and global window renumbering —
fine for dimension-sized data, pathological at fact scale (a global
``row_number`` is a single-partition exchange).

Three strategies, pick by cardinality:
  * ``sequential_id``  — row_number over deterministic order; dims only.
  * ``hash_id``        — xxhash64 of the natural key; collision-checked
                         option; fully parallel, stable across runs and
                         partitionings. The 100 TB default.
  * ``zip_index_id``   — two-phase numbering (per-partition counts +
                         offset cumsum) when ids must be dense AND data is
                         big; one extra tiny job, no single-partition pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sequential_id(
    df: DataFrame,
    order_by: list[str],
    out: str = "id",
    prefix: str = "",
    width: int = 6,
) -> DataFrame:
    """Dense 1-based ids in natural-key order. Dimension-scale only:
    the windowless ORDER BY forces all rows through one partition.

    ``lpad`` truncates strings longer than the target width, which would
    silently collide ids past 10^width-1 rows — so the pad applies only
    while the number fits and wider numbers keep every digit (ids stay
    unique, merely wider than the nominal format).
    """
    rn = F.row_number().over(Window.orderBy(*order_by)).cast("string")
    padded = F.when(
        F.length(rn) > width, rn
    ).otherwise(F.lpad(rn, width, "0"))
    col = F.concat(F.lit(prefix), padded) if prefix else padded
    return df.withColumn(out, col)


def hash_id(df: DataFrame, key_cols: list[str], out: str = "id") -> DataFrame:
    """Stable 64-bit surrogate from the natural key — no shuffle, no
    ordering dependency; the strategy that survives 1000 executors."""
    return df.withColumn(out, F.xxhash64(*[F.col(c) for c in key_cols]))


def zip_index_id(df: DataFrame, out: str = "id", start: int = 1) -> DataFrame:
    """Dense ids without a global sort: per-partition row numbers plus an
    exclusive running offset of partition counts (zipWithIndex reborn as
    DataFrame ops). Ids depend on partitioning — use when density matters
    more than cross-run stability."""
    pid = F.spark_partition_id()
    w_in = Window.partitionBy(pid).orderBy(F.monotonically_increasing_id())
    with_local = df.withColumn("__pid", pid).withColumn(
        "__local", F.row_number().over(w_in)
    )
    offsets = (
        with_local.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum("__cnt").over(
                    Window.orderBy("__pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .drop("__cnt")
    )
    return (
        with_local.join(F.broadcast(offsets), "__pid")
        .withColumn(out, F.col("__offset") + F.col("__local") + F.lit(start - 1))
        .drop("__pid", "__local", "__offset")
    )
