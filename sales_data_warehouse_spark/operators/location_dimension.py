"""Location dimension: street -> city -> state hierarchy.

Reference: ``LocationDimension.sql:2-184`` — a cursor over ``cleansed``
probes three staging tables per row, inserting first-seen keys with
``COUNT(*)+1`` surrogate ids (:84-132, an O(n*m) anti-pattern), renames the
link columns (:137-147), then a 3-way join + ROW_NUMBER produces
``location_dimension`` (:150-180).

Spark-first: each level is one ``dropDuplicates`` on its natural key plus
one ``row_number`` window for ids (SURVEY J11/A3/W2). Quirk Q8 is
load-bearing and replicated: the state level is keyed on (state, postal),
so multi-zip states produce one row per zip. Quirk Q7 (scan-order ids) is
rationalized to a deterministic natural-key ordering.

Scale note: unlike time (bounded by the calendar) and product (bounded
by the catalog), this dimension grows with the *data* — distinct
addresses are ~1:1 with order volume, so the default reference-parity
``row_number`` ids (single-partition window) stop scaling exactly when
the input does. ``id_strategy="hash"`` switches every level id to
``xxhash64`` of the natural key: fully parallel, stable across runs and
partitionings, and — because a hash id is a pure function of the row —
the 3-way hierarchy join disappears entirely (each level id is computed
in place on the street-grain row). That is the 100 TB path; sequential
stays the default for reference-format parity (``L000001``-style ids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hash_location_dimension(addr: DataFrame) -> DataFrame:
    """Hash-id variant: one dropDuplicates, zero joins, zero windows."""
    uniq = addr.dropDuplicates()
    return uniq.select(
        F.xxhash64("street", "city", "state", "postal").alias("location_id"),
        F.xxhash64("street", "city", "state", "postal").alias("street_id"),
        F.col("street").alias("street_name"),
        F.xxhash64("city", "state", "postal").alias("city_id"),
        F.col("city").alias("city_name"),
        F.xxhash64("state", "postal").alias("state_id"),
        F.col("state").alias("state_name"),
        "postal",
        F.concat_ws(
            ", ",
            F.col("street"),
            F.col("city"),
            F.concat_ws(" ", "state", "postal"),
        ).alias("full_address"),
    )


def build_location_dimension(
    cleansed: DataFrame, id_strategy: str = "sequential"
) -> DataFrame:
    addr = cleansed.select("street", "city", "state", "postal")
    if id_strategy == "hash":
        return _hash_location_dimension(addr)
    if id_strategy != "sequential":
        raise ValueError(f"id_strategy must be sequential|hash: {id_strategy}")

    # Level ids: deterministic first-seen order = natural-key order (Q7).
    state = (
        addr.select("state", "postal")
        .dropDuplicates()
        .withColumn(
            "state_id",
            F.concat(
                F.lit("SA"),
                F.lpad(
                    F.row_number()
                    .over(Window.orderBy("state", "postal"))
                    .cast("string"),
                    3,
                    "0",
                ),
            ),
        )
    )
    city = (
        addr.select("city", "state", "postal")
        .dropDuplicates()
        .withColumn(
            "city_id",
            F.concat(
                F.lit("C"),
                F.lpad(
                    F.row_number()
                    .over(Window.orderBy("city", "state", "postal"))
                    .cast("string"),
                    3,
                    "0",
                ),
            ),
        )
    )
    street = (
        addr.dropDuplicates()
        .withColumn(
            "street_id",
            F.concat(
                F.lit("S"),
                F.lpad(
                    F.row_number()
                    .over(Window.orderBy("street", "city", "state", "postal"))
                    .cast("string"),
                    6,
                    "0",
                ),
            ),
        )
    )

    # 3-way hierarchy assembly (J2); city/state levels are tiny -> broadcast.
    joined = (
        street.join(F.broadcast(city), on=["city", "state", "postal"], how="inner")
        .join(F.broadcast(state), on=["state", "postal"], how="inner")
    )

    return joined.select(
        F.concat(
            F.lit("L"),
            F.lpad(
                F.row_number()
                .over(Window.orderBy("street_id", "city_id", "state_id"))
                .cast("string"),
                6,
                "0",
            ),
        ).alias("location_id"),
        "street_id",
        F.col("street").alias("street_name"),
        "city_id",
        F.col("city").alias("city_name"),
        "state_id",
        F.col("state").alias("state_name"),
        "postal",
        F.concat_ws(
            ", ", F.col("street"), F.col("city"), F.concat_ws(" ", "state", "postal")
        ).alias("full_address"),
    )
