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

from pyspark.sql import DataFrame
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
