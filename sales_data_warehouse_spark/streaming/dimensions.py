"""Streaming dimension maintenance: fold each micro-batch of sales rows
into the SCD2 product / location / time dimensions.

The reference rebuilds every dimension per batch run
(``MotherProcedure.sql:7-22``); ``etl.run_etl_increment`` already folds
batches in without rescanning history. This module is the *streaming*
shape of the same contract: a CSV drop-directory stream whose
``foreachBatch`` sink applies the stateless cleanse and then the
append-stable dimension merges per micro-batch — dimensions stay
current continuously instead of per nightly run.

Why foreachBatch and not stateful streaming operators: the merges are
small-table (catalog-sized) batch jobs with exactly-once parquet
outputs; per-key state stores would re-implement what the dimension
tables already are. The checkpoint gives exactly-once at the source-
offset level, and each merge is idempotent for replayed batches
(existing keys keep ids verbatim; re-merging the same rows is a
no-op), so a crash between sink writes cannot corrupt the dimensions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from sales_data_warehouse_spark.operators.location_dimension import (
    build_location_dimension,
    merge_location_dimension,
)
from sales_data_warehouse_spark.operators.product_dimension import (
    build_product_dimension,
    merge_product_dimension,
)
from sales_data_warehouse_spark.operators.time_dimension import (
    build_time_dimension,
    merge_time_dimension,
)
from sales_data_warehouse_spark.sources.parquet_io import write_table
from sales_data_warehouse_spark.streaming.ingest import (
    cleanse_stream,
    read_sales_csv_stream,
)

_DIMS = (
    ("product_dimension", build_product_dimension, merge_product_dimension),
    ("location_dimension", build_location_dimension, merge_location_dimension),
    ("time_dimension", build_time_dimension, merge_time_dimension),
)


def merge_dimensions_batch(
    spark: SparkSession, cleansed_batch: DataFrame, warehouse_dir: str
) -> None:
    """Fold one cleansed batch into the warehouse's three dimensions.

    First batch (no prior parquet) builds each dimension; later batches
    run the append-stable merges. ``localCheckpoint`` materializes each
    merged dimension BEFORE its overwrite — the merge plan reads the
    very path the write replaces, which Spark otherwise (rightly)
    refuses. Work per batch is O(batch + dimension), never O(history).
    """
    for name, build, merge in _DIMS:
        path = f"{warehouse_dir}/{name}"
        if os.path.exists(path):
            prior = spark.read.parquet(path)
            dim = merge(prior, cleansed_batch).localCheckpoint()
        else:
            dim = build(cleansed_batch).localCheckpoint()
        write_table(dim, path)


def start_streaming_dimensions(
    spark: SparkSession,
    drop_dir: str,
    warehouse_dir: str,
    checkpoint_dir: str | None = None,
    available_now: bool = False,
):
    """Continuous CSV drop-dir -> cleansed/invalid appends + dimension
    merges, one ``foreachBatch`` sink per micro-batch.

    Returns the StreamingQuery (caller owns stop/awaitTermination).
    Restarting with the same checkpoint resumes at the next unprocessed
    file; a replayed batch re-merges idempotently.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        cleansed, invalid = cleanse_stream(batch_df)
        # one computation of the batch cleanse feeds the parquet append
        # AND the three merges
        cleansed = cleansed.drop("order_ts").localCheckpoint()
        cleansed.write.mode("append").parquet(f"{warehouse_dir}/cleansed")
        invalid.write.mode("append").parquet(f"{warehouse_dir}/invalid")
        merge_dimensions_batch(spark, cleansed, warehouse_dir)

    landing = read_sales_csv_stream(spark, drop_dir)
    writer = landing.writeStream.foreachBatch(sink).option(
        "checkpointLocation",
        checkpoint_dir or f"{warehouse_dir}/_dim_checkpoint",
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
