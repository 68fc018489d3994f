"""Cascading time-bucket rollups (hypertable-style continuous
aggregates).

The time-series warehouse pattern: raw events are bucketed to the
finest grain once, and every coarser grain aggregates THE PREVIOUS
LEVEL, never the raw data — each level's input shrinks by the bucket
ratio, so the day rollup over 100 TB of events reads the hour rollup's
few GB. That only works for mergeable aggregates; here each level
carries (n_events, sum_value, min_value, max_value), all of which
re-aggregate losslessly (sum of counts, sum of sums, min of mins, max
of maxes). avg is derived at read time as sum/n — storing avg would
break mergeability.

``time_bucket`` is epoch-second floor arithmetic (codegen, no UDF),
the same semantics as date_trunc for whole-unit widths but usable for
any width (5 min, 6 h, ...).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def time_bucket(ts: Column, width_seconds: int) -> Column:
    """Floor a timestamp to its ``width_seconds`` bucket start."""
    secs = F.unix_timestamp(ts)
    return F.timestamp_seconds(
        (F.floor(secs / width_seconds) * width_seconds).cast("long")
    )


def rollup_level(
    df: DataFrame,
    ts_col: str,
    width_seconds: int,
    value_col: str | None = None,
) -> DataFrame:
    """First rollup level over raw rows: bucket + mergeable aggregates.

    Output: (bucket, n_events, sum_value, min_value, max_value).
    """
    v = F.col(value_col) if value_col else F.lit(0.0)
    return (
        df.groupBy(
            time_bucket(F.col(ts_col), width_seconds).alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(v).alias("sum_value"),
            F.min(v).alias("min_value"),
            F.max(v).alias("max_value"),
        )
    )


def merge_rollup(finer: DataFrame, width_seconds: int) -> DataFrame:
    """Aggregate an existing rollup level into a coarser one — the
    cascade step. Reads only the finer rollup's partials."""
    return (
        finer.groupBy(
            time_bucket(F.col("bucket"), width_seconds).alias("bucket")
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )


def merge_partials(partials: DataFrame) -> DataFrame:
    """Collapse appended partial rows (same schema as a rollup level)
    into one row per bucket — the read-side merge for incrementally
    refreshed rollups."""
    return (
        partials.groupBy("bucket")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )


def start_rollup_refresh(
    events_stream: DataFrame,
    output_dir: str,
    ts_col: str = "ts",
    value_col: str = "value",
    width_seconds: int = 3600,
    checkpoint_dir: str | None = None,
    available_now: bool = False,
):
    """Continuous-aggregate refresh: every micro-batch rolls ITSELF up
    to the bucket grain and APPENDS its partial rows to the rollup
    table; because the aggregates are mergeable, readers collapse
    partials with ``merge_partials`` (and cascade coarser levels with
    ``merge_rollup``). Append-only partials avoid rewriting closed
    buckets entirely — the Timescale continuous-aggregate contract, in
    plain parquet. Compact by occasionally rewriting
    ``merge_partials`` output; correctness never depends on it.

    Returns the StreamingQuery (caller owns stop/awaitTermination).

    ONE OUTPUT DIR = ONE CHECKPOINT LINEAGE
    (``compaction.enforce_output_lineage``, r14): partials are
    append-only and mergeable by SUM, so a restart under a fresh
    checkpoint — which forgets the source offsets and re-appends
    every event's partial — would silently DOUBLE-COUNT on the next
    ``merge_partials`` read. Refused at start instead.
    """
    from sales_data_warehouse_spark.sources.compaction import (
        enforce_output_lineage,
    )

    checkpoint = checkpoint_dir or f"{output_dir}/_checkpoint"
    enforce_output_lineage(
        events_stream.sparkSession, output_dir, checkpoint,
        "start_rollup_refresh",
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        rollup_level(batch_df, ts_col, width_seconds, value_col).write.mode(
            "append"
        ).parquet(f"{output_dir}/partials")

    writer = events_stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
