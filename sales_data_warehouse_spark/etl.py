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
)
from sales_data_warehouse_spark.operators.product_dimension import (
    build_product_dimension,
)
from sales_data_warehouse_spark.operators.time_dimension import (
    build_time_dimension,
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
    landing = ingest_csv(spark, csv_path)
    cleansed, invalid = cleanse(landing)
    if output_dir:
        # Materialize cleansed once: three dims + fact all consume it.
        write_table(cleansed, f"{output_dir}/cleansed")
        cleansed = spark.read.parquet(f"{output_dir}/cleansed")
    else:
        cleansed = cleansed.cache()

    time_dim = build_time_dimension(cleansed)
    loc_dim = build_location_dimension(cleansed)
    prod_dim = build_product_dimension(cleansed)
    fact = build_fact(cleansed, prod_dim, loc_dim, time_dim)
    if dense:
        fact = dense_fact(fact, prod_dim, loc_dim, time_dim)

    if output_dir:
        write_table(invalid, f"{output_dir}/invalid")
        write_table(time_dim, f"{output_dir}/time_dimension")
        write_table(loc_dim, f"{output_dir}/location_dimension")
        write_table(prod_dim, f"{output_dir}/product_dimension")
        write_table(fact, f"{output_dir}/fact", partition_by=["month_id"])
        fact = spark.read.parquet(f"{output_dir}/fact")

    return EtlResult(
        landing=landing,
        invalid=invalid,
        cleansed=cleansed,
        time_dimension=time_dim,
        location_dimension=loc_dim,
        product_dimension=prod_dim,
        fact=fact,
    )
