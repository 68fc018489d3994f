"""End-to-end ETL orchestrator — the reference's ``etl(filepath)``.

Reference: ``MotherProcedure.sql:2-25`` calls import -> cleansing ->
location -> time -> product -> fact in order. Here each stage is a pure
DataFrame function; materialization points (parquet writes) mirror the
reference's table boundaries so any stage can be re-run independently.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from sales_data_warehouse_spark.operators.cleansing import cleanse
from sales_data_warehouse_spark.operators.fact import build_fact, dense_fact
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
from sales_data_warehouse_spark.sources.csv_ingest import ingest_csv
from sales_data_warehouse_spark.sources.parquet_io import write_table

log = logging.getLogger(__name__)


@dataclass
class EtlResult:
    landing: DataFrame
    invalid: DataFrame
    cleansed: DataFrame
    time_dimension: DataFrame
    location_dimension: DataFrame
    product_dimension: DataFrame
    fact: DataFrame


def run_etl(
    spark: SparkSession,
    csv_path: str,
    output_dir: str | None = None,
    dense: bool = False,
) -> EtlResult:
    """Run the full pipeline on a sales CSV.

    ``dense=False`` keeps the sparse fact as primary (SURVEY §4); pass
    ``dense=True`` to materialize the reference's cube semantics.
    When ``output_dir`` is set, each stage is written as parquet (the
    fact partitioned by month for partition pruning on time slices).
    """
    from pyspark import StorageLevel

    landing = ingest_csv(spark, csv_path)
    # Persist the parsed CSV when we materialize outputs here: the
    # cleansed and invalid branches (plus the max-id subplan) each
    # consume landing, and without a persist every branch re-parses the
    # file — the invalid write alone re-ran the full ingest+cleanse
    # (measured 0.58 s of a 3.56 s run on the reference CSV).
    # MEMORY_AND_DISK spills rather than OOMs at 100 TB; released once
    # both outputs are written. Without output_dir the consumers are
    # the CALLER's lazy actions and nothing here could unpersist
    # afterwards — persisting would pin the parsed CSV for the
    # application lifetime, so that mode keeps the rescan behavior.
    if output_dir:
        landing = landing.persist(StorageLevel.MEMORY_AND_DISK)
    cleansed, invalid = cleanse(landing)
    if output_dir:
        # Independent jobs are submitted from a small thread pool so the
        # scheduler overlaps them: each job's tail (the straggling last
        # tasks of a write) is back-filled by the next job's tasks
        # instead of leaving the executors idle. Sequentially the writes
        # cost sum(job_i); overlapped they cost ~max(job_i) when the
        # cluster has headroom — which it has here by construction,
        # since each is a small dimension-sized output next to the
        # fact. Dependency structure (r15 widened the r14 two-phase
        # barrier to the real DAG):
        #   * cleansed write — everything downstream needs its parquet;
        #   * invalid write — a LEAF: nothing reads it, so it overlaps
        #     the dimension builds AND the fact build instead of
        #     barriering phase B behind it (its only shared input is
        #     the cached landing; concurrent materialization of the
        #     same cached partitions is safe — the block manager
        #     computes each missing block once, the other job waits on
        #     the block lock);
        #   * each dimension's BUILD + write runs in its own worker:
        #     build_time_dimension's eager min/max-date job used to run
        #     serially on the main thread before any dim write started.
        from concurrent.futures import ThreadPoolExecutor

        def _write(df: DataFrame, name: str, part: list | None) -> None:
            # job descriptions are thread-local — label each concurrent
            # job so the UI attributes tasks to the right write
            spark.sparkContext.setJobDescription(f"etl: write {name}")
            write_table(df, f"{output_dir}/{name}", partition_by=part)

        pool = ThreadPoolExecutor(max_workers=4)
        try:
            f_cleansed = pool.submit(_write, cleansed, "cleansed", None)
            f_invalid = pool.submit(_write, invalid, "invalid", None)
            f_cleansed.result()
            cleansed = spark.read.parquet(f"{output_dir}/cleansed")
            # Write each dimension BEFORE the fact build and re-read it
            # from parquet: the fact (and dense cube) otherwise
            # re-executes every dimension's window pipeline once per
            # downstream action.
            dim_futures = [
                pool.submit(
                    lambda b, n: _write(b(cleansed), n, None), builder, name
                )
                for builder, name in [
                    (build_time_dimension, "time_dimension"),
                    (build_location_dimension, "location_dimension"),
                    (build_product_dimension, "product_dimension"),
                ]
            ]
            for f in dim_futures:
                f.result()
            time_dim = spark.read.parquet(f"{output_dir}/time_dimension")
            loc_dim = spark.read.parquet(f"{output_dir}/location_dimension")
            prod_dim = spark.read.parquet(
                f"{output_dir}/product_dimension"
            )
            fact = build_fact(cleansed, prod_dim, loc_dim, time_dim)
            if dense:
                fact = dense_fact(fact, prod_dim, loc_dim, time_dim)
            _write(fact, "fact", ["month_id"])
            fact = spark.read.parquet(f"{output_dir}/fact")
            # the one remaining landing consumer — surfacing its error
            # (if any) before this function reports success
            f_invalid.result()
        finally:
            # also reached on a failed write: without the unpersist the
            # cached parsed CSV stayed pinned (MEMORY_AND_DISK) for the
            # application lifetime (r14 ADVICE). shutdown(wait=True)
            # first so no in-flight job still computes landing blocks.
            # Blocking=False: eviction is async, the returned landing
            # plan stays valid (recomputes if re-used).
            pool.shutdown(wait=True)
            landing.unpersist()
            spark.sparkContext.setJobDescription(None)
    else:
        cleansed = cleansed.cache()
        time_dim = build_time_dimension(cleansed)
        loc_dim = build_location_dimension(cleansed)
        prod_dim = build_product_dimension(cleansed)
        fact = build_fact(cleansed, prod_dim, loc_dim, time_dim)
        if dense:
            fact = dense_fact(fact, prod_dim, loc_dim, time_dim)

    return EtlResult(
        landing=landing,
        invalid=invalid,
        cleansed=cleansed,
        time_dimension=time_dim,
        location_dimension=loc_dim,
        product_dimension=prod_dim,
        fact=fact,
    )


def register_views(spark: SparkSession, result: EtlResult) -> None:
    """Expose the warehouse as SQL views — the reference's third entry
    point (SURVEY E3: ad-hoc analytical SQL over the star schema).
    After this, ``spark.sql("SELECT ... FROM fact_table ...")`` works
    with the reference's table names.
    """
    result.cleansed.createOrReplaceTempView("cleansed")
    result.invalid.createOrReplaceTempView("invalid")
    result.time_dimension.createOrReplaceTempView("time_dimension")
    result.location_dimension.createOrReplaceTempView("location_dimension")
    result.product_dimension.createOrReplaceTempView("product_dimension")
    result.fact.createOrReplaceTempView("fact_table")


def run_etl_increment(
    spark: SparkSession,
    csv_path: str,
    output_dir: str,
) -> EtlResult:
    """Fold a new sales CSV into a warehouse previously written by
    ``run_etl(..., output_dir=output_dir)`` — without rescanning
    historical facts.

    Incremental strategy per table (work scales with the increment +
    the dimensions, never with history):
      * cleansed/invalid — cleanse the new batch only; append.
        (Full-row DISTINCT applies within the batch, matching the
        reference's per-run semantics; cross-batch exact duplicates are
        a stream concern — see ``streaming.dedupe_within``.)
      * location/product — append-stable merges (existing ids verbatim,
        new keys numbered past the max).
      * time — rebuilt over the union range (ids are pure date
        functions, so existing rows reproduce bit-for-bit).
      * fact — built for the new order lines against the MERGED
        dimensions; appended (month-partitioned, so a month's partition
        only grows while it is active).
    """
    landing = ingest_csv(spark, csv_path)
    cleansed_new, invalid_new = cleanse(landing)
    cleansed_new = cleansed_new.cache()

    prior_loc = spark.read.parquet(f"{output_dir}/location_dimension")
    prior_prod = spark.read.parquet(f"{output_dir}/product_dimension")
    prior_time = spark.read.parquet(f"{output_dir}/time_dimension")

    # localCheckpoint materializes the merged dims and truncates lineage:
    # their plans read the very parquet paths the writes below overwrite,
    # which Spark (rightly) refuses while a live plan still references
    # them.
    loc_dim = merge_location_dimension(prior_loc, cleansed_new).localCheckpoint()
    prod_dim = merge_product_dimension(prior_prod, cleansed_new).localCheckpoint()
    time_dim = merge_time_dimension(prior_time, cleansed_new).localCheckpoint()

    fact_new = build_fact(cleansed_new, prod_dim, loc_dim, time_dim)

    write_table(cleansed_new, f"{output_dir}/cleansed", mode="append")
    write_table(invalid_new, f"{output_dir}/invalid", mode="append")
    write_table(time_dim, f"{output_dir}/time_dimension")
    write_table(loc_dim, f"{output_dir}/location_dimension")
    write_table(prod_dim, f"{output_dir}/product_dimension")
    write_table(
        fact_new,
        f"{output_dir}/fact",
        partition_by=["month_id"],
        mode="append",
    )

    return EtlResult(
        landing=landing,
        invalid=invalid_new,
        cleansed=spark.read.parquet(f"{output_dir}/cleansed"),
        time_dimension=time_dim,
        location_dimension=loc_dim,
        product_dimension=prod_dim,
        fact=spark.read.parquet(f"{output_dir}/fact"),
    )
