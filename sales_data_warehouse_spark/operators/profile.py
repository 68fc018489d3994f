"""Table profiling: per-column completeness / cardinality / range in
ONE pass over the table.

The data-quality primitive every warehouse load wants before trusting a
batch. Plan shape: a single aggregate computes count / nulls / distinct
/ min / max for every requested column simultaneously (map-side partial
aggregation, one tiny shuffle), and the 1-row wide result is melted to
one row per column with ``stack`` — the unpivot happens on the
aggregate, never on the data. At 100 TB this is exactly one scan.

Values are reported as strings (min/max cast) so heterogeneous columns
share one output schema — the standard profile-table shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    approx_distinct: bool = False,
) -> DataFrame:
    """Profile ``columns`` (default: all) of ``df``.

    Output: (column, n_rows, n_null, n_distinct, min_value, max_value)
    — one row per column; n_distinct counts non-null distincts;
    min/max are string-rendered.

    Scale note: multiple EXACT count-distincts in one aggregate plan
    through Expand — the scan's rows are duplicated once per distinct
    aggregate, so profiling k columns exactly costs a k-times row
    blowup before the partial agg. ``approx_distinct=True`` swaps in
    HLL sketches (`approx_count_distinct`), which aggregate flat with
    no Expand — the right default when profiling many columns of a
    100 TB table; exact is kept as the default because the oracle
    checks exact values.
    """
    cols = columns or df.columns
    distinct = F.approx_count_distinct if approx_distinct else F.count_distinct
    aggs = []
    for c in cols:
        col = F.col(c)
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(col.isNull().cast("bigint")).alias(f"{c}__null"),
            distinct(col).alias(f"{c}__dist"),
            F.min(col).cast("string").alias(f"{c}__min"),
            F.max(col).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `{c}__n`, `{c}__null`, `{c}__dist`, `{c}__min`, `{c}__max`"
        for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, n_rows, n_null, n_distinct, min_value, max_value)"
        )
    )


def approx_frequent_items(
    df: DataFrame,
    col: str,
    k: int = 10,
    max_items_tracked: int = 10_000,
) -> DataFrame:
    """Approximate top-k heavy hitters of one column in a single pass
    (Spark's ``approx_top_k`` sketch — mergeable across partitions, so
    the shuffle carries one bounded sketch per task, never the
    value-cardinality).

    Exactness regime: while a column's distinct count stays within
    ``max_items_tracked``, the sketch degenerates to exact counting —
    the property the test suite pins. Beyond it, counts are
    approximate with the usual space-saving guarantees; raise
    ``max_items_tracked`` to buy accuracy with memory.

    Output: (item STRING, count BIGINT, rank INT) — item rendered as
    string so heterogeneous columns share one schema.
    """
    sk = df.select(
        F.expr(f"approx_top_k({col}, {k}, {max_items_tracked})").alias("tk")
    )
    return (
        sk.select(F.posexplode("tk").alias("i", "e"))
        .select(
            F.col("e.item").cast("string").alias("item"),
            F.col("e.count").cast("bigint").alias("count"),
            (F.col("i") + 1).cast("int").alias("rank"),
        )
    )


def drift_report(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    buckets: int = 10,
    scale: int = 100,
    lo: int | None = None,
    hi: int | None = None,
) -> DataFrame:
    """Distribution drift between two snapshots of the same column —
    the monitor a warehouse runs between loads (schema unchanged, but
    did the VALUES move?).

    Both sides histogram into ``buckets`` equal-width bins over a
    shared integer domain: values scale exactly via
    ``decimal(18,2) * scale`` (money columns are 2-decimal; no float
    rounding anywhere), bounds default to snapshot A's min/max (one
    tiny aggregate), out-of-range B values clamp into the edge bins.
    Per bin the report carries both counts, per-mille rates, and an
    integer chi-square-style statistic
    ``(cnt_a - cnt_b)^2 * 1e6 DIV (cnt_a + cnt_b)`` — all integer
    arithmetic, so the report is bit-identical across engines and
    partitionings.

    Cost: one scan + histogram aggregate per side (map-side partial;
    the shuffle carries <= ``buckets`` rows per task); everything
    after operates on the bucket table. Row count is always exactly
    ``buckets`` — gaps are zero-filled from a bucket spine.
    """
    spark = a.sparkSession

    def scaled(df: DataFrame) -> DataFrame:
        return df.select(
            (F.col(value_col).cast("decimal(18,2)") * scale)
            .cast("bigint")
            .alias("v")
        ).filter(F.col("v").isNotNull())

    sa, sb = scaled(a), scaled(b)
    if lo is None or hi is None:
        r = sa.agg(
            F.min("v").alias("lo"), F.max("v").alias("hi")
        ).collect()[0]
        if r["lo"] is None:
            # snapshot A empty / all-null (first load, empty
            # partition): fall back to B's domain so the report stays
            # defined — everything in A is zero, B histograms normally
            r = sb.agg(
                F.min("v").alias("lo"), F.max("v").alias("hi")
            ).collect()[0]
        lo = int(r["lo"] or 0) if lo is None else lo
        hi = int(r["hi"] or 0) if hi is None else hi
    span = max(hi - lo + 1, 1)

    # clamp in BIGINT, cast after: a far-out-of-domain value over a
    # narrow domain can push the quotient past INT32, where a pre-clamp
    # INT cast wraps under ANSI-off and mis-bins the outlier
    bucket = (
        f"CAST(least({buckets - 1}, greatest(0, "
        f"((v - {lo}) * {buckets}) DIV {span})) AS BIGINT)"
    )

    def hist(s: DataFrame, name: str) -> DataFrame:
        return s.groupBy(F.expr(bucket).alias("bucket")).agg(
            F.count(F.lit(1)).alias(name)
        )

    spine = spark.range(buckets).select(
        # bigint: matches both histogram keys (cast below) and the
        # BIGINT bucket spine a SQL oracle's generate_series produces
        F.col("id").cast("bigint").alias("bucket")
    )
    j = (
        spine.join(hist(sa, "cnt_a"), "bucket", "left")
        .join(hist(sb, "cnt_b"), "bucket", "left")
        .fillna(0, subset=["cnt_a", "cnt_b"])
    )
    w = Window.partitionBy(F.lit(1))
    j = (
        j.withColumn("n_a", F.sum("cnt_a").over(w))
        .withColumn("n_b", F.sum("cnt_b").over(w))
    )
    return j.select(
        "bucket",
        F.lit(lo).cast("bigint").alias("domain_lo"),
        F.lit(hi).cast("bigint").alias("domain_hi"),
        F.col("cnt_a").cast("bigint").alias("cnt_a"),
        F.col("cnt_b").cast("bigint").alias("cnt_b"),
        F.expr("cnt_a * 1000 DIV greatest(n_a, 1)")
        .cast("bigint")
        .alias("rate_a_permille"),
        F.expr("cnt_b * 1000 DIV greatest(n_b, 1)")
        .cast("bigint")
        .alias("rate_b_permille"),
        # two-division integer form (same rewrite as bm25's ppm math):
        # d^2 * 1e6 DIV s = (d^2 DIV s)*1e6 + ((d^2 % s)*1e6) DIV s.
        # The single-multiply form overflows int64 at |d| > ~3.03e6;
        # here only d^2 must fit, good through |d| <= ~3.03e9 rows per
        # bucket (a ~30-billion-row snapshot at 10 bins). Bit-identical
        # in DuckDB (// and % on non-negative d^2).
        F.expr(
            "CASE WHEN cnt_a + cnt_b > 0 THEN "
            "((cnt_a - cnt_b) * (cnt_a - cnt_b) DIV (cnt_a + cnt_b)) "
            "* 1000000 + "
            "(((cnt_a - cnt_b) * (cnt_a - cnt_b) % (cnt_a + cnt_b)) "
            "* 1000000) DIV (cnt_a + cnt_b) ELSE 0 END"
        )
        .cast("bigint")
        .alias("chi2_ppm"),
    ).orderBy("bucket")
