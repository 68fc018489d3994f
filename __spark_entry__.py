"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-summary query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the operator corpus from
``sales_data_warehouse_spark.queries.corpus`` — one entry per SURVEY.md §2
operator plus the LLM-data-pipeline extensions, each (where SQL can
express it) with a DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from sales_data_warehouse_spark.queries.corpus import (  # noqa: E402
    ORACLE,
    QUERIES,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return QUERIES["pricing_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            # semantic configs the engine depends on (cast-to-null reject
            # routing, UTC wall-clock) — asserted per call in case the
            # driver hands us a differently-configured session.
            spark.conf.set("spark.sql.ansi.enabled", "false")
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        run.__name__ = fn.__name__
        run.__doc__ = fn.__doc__
        return run

    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query — every corpus entry has one.
    Hash-dependent operators (minhash/simhash/LSH/IVF/sketches/
    winnowing) are expressed as property oracles: the Spark side emits
    SQL-checkable invariants (recall/precision vs an exact truth set,
    error bounds, coverage guarantees) and the oracle claims them."""
    return dict(ORACLE)
