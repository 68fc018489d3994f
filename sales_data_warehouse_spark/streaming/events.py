"""Watermarked window aggregations over the events stream.

The reference has no streaming surface; these are the standard
Structured Streaming shapes (tumbling / sliding / session windows) over
the driver's ``events`` table schema. All aggregations are built-in —
partial aggregation happens map-side per micro-batch and the state store
holds only one row per open window per key, so state stays O(windows x
keys) no matter how many events flow through.

Scale notes:
* the watermark bounds state: windows older than (max event time -
  watermark) are finalized and evicted — without it, state grows
  unboundedly at 100 TB/day.
* ``session_window`` is Spark's native gap-based sessionization; it
  merges overlapping sessions inside the state store (no per-event
  Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Driver events table layout (/root/testdata/sf*/events.parquet).
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of events parquet dropped into ``path``.

    File sources need an explicit schema (no blocking inference on an
    unbounded input); ``maxFilesPerTrigger`` keeps micro-batches bounded
    so one giant backfill directory doesn't become one giant batch.
    """
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(path)
    )


def tumbling_event_agg(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-(window, event_type) count + value sum, tumbling windows.

    Works identically on batch and streaming inputs (batch ignores the
    watermark) — the corpus uses the batch run as the oracle.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window).alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_event_rate(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Overlapping-window event rate — each event lands in
    window/slide windows; Spark expands that map-side, state still one
    row per open (window, type)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def enrich_stream(
    events: DataFrame, dim: DataFrame, on: str = "user_id"
) -> DataFrame:
    """Stream-static join: attach dimension attributes to each event.

    The static side is re-read per micro-batch (picking up dimension
    updates between batches) and joined stateless — no watermark, no
    state store. Broadcast keeps it a map-side lookup; for a dimension
    too big to broadcast, pre-bucket both sides on the key instead
    (sources.bucketed).
    """
    return events.join(F.broadcast(dim), on, "left")


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based sessions per user via native ``session_window``.

    A session extends while successive events arrive within ``gap``;
    the state store merges adjacent windows as late events bridge them
    (that merge is why this MUST be session_window, not a tumbling
    bucket: sessions have data-dependent extents).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.session_window("ts", gap).alias("s"),
            F.col("user_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            F.col("user_id"),
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_watermark: str = "1 hour",
    right_watermark: str = "2 hours",
    max_lag: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream inner join: pair each left event with
    the same key's right events that happened in the window
    ``[left.ts, left.ts + max_lag]`` (the click -> purchase attribution
    shape).

    The time-bound conjunct is what makes this scale: with watermarks
    on BOTH inputs and a range condition on both event times, Spark
    derives state-eviction bounds — a buffered left row can be dropped
    once the right watermark passes ``left.ts + max_lag``, so the state
    store holds a sliding band of each stream instead of all history.
    An unbounded equi-only stream-stream join would buffer forever.
    """
    l = left.select(
        F.col(key).alias("l_key"),
        F.col("ts").alias("l_ts"),
        F.col("event_id").alias("l_event_id"),
        F.col("event_type").alias("l_type"),
    ).withWatermark("l_ts", left_watermark)
    r = right.select(
        F.col(key).alias("r_key"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
        F.col("event_type").alias("r_type"),
        F.col("value").alias("r_value"),
    ).withWatermark("r_ts", right_watermark)
    return l.join(
        r,
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {max_lag}")),
        "inner",
    ).select(
        F.col("l_key").alias("user_id"),
        "l_event_id", "l_type", "l_ts",
        "r_event_id", "r_type", "r_ts", "r_value",
    )
