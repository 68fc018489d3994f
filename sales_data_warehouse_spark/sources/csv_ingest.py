"""CSV landing ingest (SURVEY S1/S2; reference ``Import.sql:83-91``).

The reference ``COPY``s the CSV into an all-TEXT ``landing`` table with
Postgres CSV semantics: header skipped, quoted fields may embed commas,
empty unquoted fields become NULL. Spark's CSV reader matches those
semantics with the defaults below; reading everything as string defers
typing to the cleansing stage, exactly like the reference.

Scale note: ``spark.read.csv`` over a directory/glob parallelizes per
128-256 MB file split — ingest is already cluster-wide with no custom code.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession

from sales_data_warehouse_spark.schemas import (
    LANDING_COLUMNS,
    LANDING_SCHEMA,
    RAW_CSV_COLUMNS,
)

log = logging.getLogger(__name__)


def ingest_csv(spark: SparkSession, path: str) -> DataFrame:
    """Read a sales CSV (or directory/glob of them) into the landing shape.

    Returns an all-string DataFrame with canonical snake_case columns.
    Mirrors ``Import.sql:83-88``: HEADER on, ``,`` delimiter, ``"`` quote,
    empty field -> NULL. The reference wraps COPY in an exception handler
    that warns instead of aborting (``Import.sql:89-91``); we keep Spark's
    PERMISSIVE mode so malformed *rows* survive to reject-routing, and let
    genuinely unreadable *files* raise (caller decides, like psql's NOTICE).
    """
    df = (
        spark.read.csv(
            path,
            header=True,
            quote='"',
            escape='"',
            sep=",",
            # keep strings raw: typing happens in cleansing (schema-on-read)
            schema=", ".join(f"`{c}` STRING" for c in RAW_CSV_COLUMNS),
            mode="PERMISSIVE",
        )
    )
    for raw, canon in zip(RAW_CSV_COLUMNS, LANDING_COLUMNS):
        df = df.withColumnRenamed(raw, canon)
    return df


def landing_from_rows(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    """Test helper: build a landing-shaped DataFrame from python tuples."""
    return spark.createDataFrame(rows, schema=LANDING_SCHEMA)
