from sales_data_warehouse_spark.queries.corpus import ORACLE, QUERIES, load_table

__all__ = ["QUERIES", "ORACLE", "load_table"]
