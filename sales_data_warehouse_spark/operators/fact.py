"""Fact construction: as-of price, dimension joins, sparse + dense cube.

Reference: ``FactTable.sql:2-114`` — three staging materializations
(product join + correlated as-of price :15-34, location join :37-53,
time join :56-75) then a dense CROSS JOIN cube time x product x location
LEFT JOINed to actual sales with COALESCE(qty,0) (:78-110). On the
reference CSV the cube is 32 x 19 x 9,160 = 5,569,280 rows from 9,671
order lines — a 576x blowup.

Spark-first decisions (SURVEY §4):
  * the as-of price lookup joins only the matched SCD2 version (fixes
    quirk Q6, where the reference joins *all* versions then re-derives
    the same price for each duplicate).
  * SPARSE fact is the primary output; the dense cube is exposed lazily
    behind ``dense_fact()`` — at 100 TB a stored dense cube is the
    reference's one unscalable idea, so it stays a derived view.
  * time and product dims broadcast (KBs); the location join shuffles on
    the 4-part natural key, which AQE will also broadcast while the
    location dim is small.
  * the dense cube aggregates sales to the (time, product, location)
    grain before the LEFT JOIN so the cube's cardinality is exactly
    |time| x |product-versions| x |locations|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sales_data_warehouse_spark.operators.asof import asof_join


def build_fact(
    cleansed: DataFrame,
    product_dim: DataFrame,
    location_dim: DataFrame,
    time_dim: DataFrame,
) -> DataFrame:
    """Sparse fact: one row per cleansed order line, all dims resolved."""
    # staging1 (FactTable.sql:15-34): as-of product version — the price
    # effective at order time, via the J8 join+window idiom.
    versions = product_dim.select(
        F.col("product_name").alias("product"),
        "product_id",
        F.col("price_each").alias("effective_price"),
        "last_update_date",
    )
    s1 = asof_join(
        cleansed.withColumnRenamed("price_each", "sold_price"),
        versions,
        on=["product"],
        left_ts="order_date",
        right_ts="last_update_date",
    ).drop("last_update_date")

    # staging2 (FactTable.sql:37-53): 4-column composite location join (J4).
    s2 = s1.join(
        F.broadcast(
            location_dim.select(
                F.col("street_name").alias("street"),
                F.col("city_name").alias("city"),
                F.col("state_name").alias("state"),
                "postal",
                "location_id",
                "street_id",
                "city_id",
                "state_id",
            )
        ),
        on=["street", "city", "state", "postal"],
        how="inner",
    )

    # staging3 (FactTable.sql:56-75): date join to the calendar (J5).
    s3 = s2.join(
        F.broadcast(
            time_dim.select(
                F.col("time_desc").alias("order_date"),
                "time_id",
                "week_id",
                "month_id",
                "quarter_id",
                "half_year_id",
                "year_id",
            )
        ),
        on="order_date",
        how="inner",
    )

    return s3.select(
        "time_id",
        "product_id",
        "product",
        F.col("effective_price").alias("price_each"),
        "quantity_ordered",
        "order_date",
        "week_id",
        "month_id",
        "quarter_id",
        "half_year_id",
        "year_id",
        "location_id",
        F.col("street").alias("street_name"),
        "street_id",
        F.col("city").alias("city_name"),
        "city_id",
        F.col("state").alias("state_name"),
        "state_id",
        "postal",
    )


def dense_fact(
    sparse: DataFrame,
    product_dim: DataFrame,
    location_dim: DataFrame,
    time_dim: DataFrame,
) -> DataFrame:
    """Dense cube: every (day x product-version x location), zero-filled.

    Reference ``FactTable.sql:78-110`` (J6/J7). Cardinality =
    |time| * |product versions| * |locations|; derive on demand, never
    store at scale.
    """
    # Grain includes price_each: SCD2 versions share product_id, and a sale
    # must land only on its as-of version's cube row (rationalized Q6 —
    # the reference double-joins all versions, FactTable.sql:29-34).
    sales = sparse.groupBy(
        "time_id", "product_id", "price_each", "location_id"
    ).agg(F.sum("quantity_ordered").cast("int").alias("quantity_ordered"))
    # LOCATION-major generation (r15, guide §2/§6). Of the two cube
    # factors, LOCATION is the one that grows with the data (addresses
    # are ~1:1 with order volume) while the (time x product-version)
    # spine is bounded by calendar x catalog — so fan the cube out by
    # repartitioning the location side across every core and BROADCAST
    # the spine, not the other way round (the r14 shape repartitioned
    # the 608-row spine and broadcast the growing side, exactly the
    # orientation that stops scaling first). The flip also fixes the
    # write layout for free: each task emits, per location, one
    # contiguous run of |spine| rows, so the eight location-derived
    # string/id columns — the only ones with large dictionaries —
    # arrive at the parquet writer in runs that RLE_DICTIONARY
    # collapses (the writer's dynamic-partition radix sort on month_id
    # is stable, so the runs survive it). Measured on the reference
    # cube (5.57M rows): output 48.2 MB -> 2.3 MB, write wall time
    # -12%, cube compute unchanged; an explicit sortWithinPartitions
    # added nothing on top of the layout.
    spark = sparse.sparkSession
    spine = (
        time_dim.select("time_id", "time_desc", "week_id", "month_id",
                        "quarter_id", "half_year_id", "year_id")
        .crossJoin(
            product_dim.select("product_id", "product_name", "price_each")
        )
    )
    cube = (
        location_dim.select(
            "location_id", "street_id", "street_name", "city_id",
            "city_name", "state_id", "state_name", "postal",
        )
        .repartition(spark.sparkContext.defaultParallelism)
        .crossJoin(F.broadcast(spine))
    )
    # Broadcast the aggregated sales: |sales| <= |sparse fact lines| and
    # the dense cube is vastly bigger by construction — shuffling the
    # cube into a sort-merge join (what the optimizer picks from cold
    # stats) costs more than shipping the sparse aggregate ever can.
    # The zero-filled cube is a derive-on-demand view at scale (see
    # above); if sales ever outgrew broadcast, the cube would be
    # unmaterializable long before the hint broke.
    return cube.join(
        F.broadcast(sales),
        on=["time_id", "product_id", "price_each", "location_id"],
        how="left",
    ).withColumn(
        "quantity_ordered", F.coalesce(F.col("quantity_ordered"), F.lit(0))
    ).select(
        # column order of the r14 spine-major cube, pinned: the flip
        # must not change the written schema (USING-join columns lead,
        # then the old cube's spine-then-location remainder)
        "time_id", "product_id", "price_each", "location_id",
        "time_desc", "week_id", "month_id", "quarter_id",
        "half_year_id", "year_id", "product_name",
        "street_id", "street_name", "city_id", "city_name",
        "state_id", "state_name", "postal", "quantity_ordered",
    )
