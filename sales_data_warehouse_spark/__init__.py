"""PySpark-native analytics engine with the capabilities of
nicolefaustino/sales-data-warehouse (a PostgreSQL PL/pgSQL dimensional
warehouse), rebuilt Spark-first.

The reference (see SURVEY.md) is a Kimball-style star-schema ETL:
CSV -> landing -> cleansed (+reject routing) -> time/location/product(SCD2)
dimensions -> fact (sparse + optional dense cube). This package re-expresses
each stage as pure ``DataFrame -> DataFrame`` functions that Catalyst can
optimize end-to-end, plus a query layer and large-scale data-pipeline
operators (dedup, similarity search, text analysis) the reference implies
but does not ship.

No RDDs, no row-at-a-time Python UDFs in the hot path: every reference
semantic lands on built-in Spark SQL expressions (whole-stage codegen),
with Arrow-batched pandas UDFs only where semantics genuinely require
Python (multimodal decode stubs).
"""

from sales_data_warehouse_spark.session import get_spark
from sales_data_warehouse_spark.etl import (
    register_views,
    run_etl,
    run_etl_increment,
)

__all__ = ["get_spark", "register_views", "run_etl", "run_etl_increment"]
__version__ = "0.1.0"
