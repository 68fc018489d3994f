"""Event-series analytics: funnels, retention cohorts, gap-filling.

The reference warehouse is batch sales data only; these are the standard
event-analytics shapes its `events`-style telemetry would need (the same
query family TimescaleDB/Druid/ClickHouse users run), expressed as pure
DataFrame plans — every aggregation and join here keys on ``user_id`` or
on (user, day), so at 100 TB the work is one hash-partitioning of the
events table reused across stages; nothing collects to the driver.

All outputs carry DuckDB-oracle twins in ``queries/corpus.py``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_conversion(
    events: DataFrame,
    steps: Sequence[str] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_hours: int | None = None,
) -> DataFrame:
    """Ordered first-touch funnel: users reaching each step in sequence.

    A user reaches step k when an event of type ``steps[k]`` exists
    strictly after their first qualifying step-(k-1) event (first-touch
    semantics: step times are the *earliest* valid occurrence, the common
    product-analytics definition), optionally within ``within_hours``.

    Built on :func:`funnel_steps` (per-user depth) plus one global
    aggregate and a ``stack`` unpivot — a single lazy plan, no driver
    actions. Returns one row per step: (step_idx, step, n_users),
    n_users monotonically non-increasing.
    """
    per_user = funnel_steps(
        events, steps, user_col, ts_col, type_col, within_hours
    )
    agg = per_user.agg(
        *[
            # coalesce: a global sum over an EMPTY per-user table is
            # NULL, but "zero users entered the funnel" must count 0.
            F.coalesce(
                F.sum(F.when(F.col("depth") > i, 1).otherwise(0)),
                F.lit(0),
            )
            .cast("bigint")
            .alias(f"_n{i}")
            for i in range(len(steps))
        ]
    )
    # step names are interpolated into SQL — escape embedded quotes so a
    # step like "don't" can't malform the stack() fragment
    stack_args = ", ".join(
        "{}, '{}', _n{}".format(i, step.replace("'", "''"), i)
        for i, step in enumerate(steps)
    )
    return agg.selectExpr(
        f"stack({len(steps)}, {stack_args})"
        " AS (step_idx, step, n_users)"
    )


def funnel_steps(
    events: DataFrame,
    steps: Sequence[str] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_hours: int | None = None,
) -> DataFrame:
    """Per-user funnel depth + per-step first-touch timestamps.

    Same semantics as :func:`funnel_conversion` but fully lazy (no
    driver-side counts): returns one row per user who entered the funnel
    with (user, depth, t_step0..t_stepK) — the distributed form suitable
    for joining funnel state onto other tables. ``funnel_conversion`` is
    the aggregate view of this. ``within_hours`` bounds each conversion
    window (step k must land within that many hours of step k-1) — the
    usual product-analytics deadline, and what keeps a months-long event
    log from counting unrelated later activity as conversion.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    t = F.col(ts_col)

    # ONE scan of events: collect each user's sorted step-k timestamps
    # into per-step arrays in a single groupBy, then resolve the funnel
    # iteratively with array HOFs (first qualifying element = first
    # element of a sorted array passing the window predicate) — all
    # JVM-side, one shuffle keyed on user. The previous shape re-scanned
    # and re-joined the events table K-1 times. State per user is its
    # own funnel-step event times only (the same rows the K-1-join plan
    # shuffled in aggregate), so a hot user costs memory proportional to
    # its events — the usual skew caveat for per-entity analytics.
    g = (
        events.filter(F.col(type_col).isin(list(steps)))
        .groupBy(user_col)
        .agg(
            *[
                F.sort_array(
                    F.collect_list(F.when(F.col(type_col) == step, t))
                ).alias(f"_s{i}")
                for i, step in enumerate(steps)
            ]
        )
        # funnel entry requires a step-0 event
        .filter(F.size("_s0") > 0)
    )

    out = g.withColumn("t_step0", F.get("_s0", 0))
    for i in range(1, len(steps)):
        prev = F.col(f"t_step{i - 1}")
        if within_hours is not None:
            deadline = prev + F.expr(f"INTERVAL {within_hours} HOURS")
            qual = F.filter(
                F.col(f"_s{i}"), lambda x: (x > prev) & (x <= deadline)
            )
        else:
            qual = F.filter(F.col(f"_s{i}"), lambda x: x > prev)
        # F.get returns NULL out of bounds (empty qual / prev NULL) in
        # both ANSI modes, unlike element_at
        out = out.withColumn(f"t_step{i}", F.get(qual, 0))

    depth = sum(
        F.when(F.col(f"t_step{i}").isNotNull(), 1).otherwise(0)
        for i in range(len(steps))
    )
    return out.drop(*[f"_s{i}" for i in range(len(steps))]).withColumn(
        "depth", depth.cast("int")
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention triangle: users grouped by first-seen ISO week,
    counted in each subsequent week they were active.

    Two aggregations — first-seen week per user (shuffle on user), then
    distinct (user, week) activity joined to the cohort and counted per
    (cohort_week, week_offset). The distinct prunes the join input to at
    most |users| x |weeks| rows regardless of event volume, so the heavy
    table is touched exactly once.
    """
    week = F.date_trunc("week", F.col(ts_col)).cast("date")
    cohort = (
        events.groupBy(user_col).agg(F.min(week).alias("cohort_week"))
    )
    active = events.select(F.col(user_col), week.alias("active_week")).distinct()
    return (
        active.join(cohort, user_col)
        .groupBy(
            "cohort_week",
            (
                F.datediff(F.col("active_week"), F.col("cohort_week")) / 7
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def rolling_active_users(
    events: DataFrame,
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """DAU / rolling-WAU / stickiness per day — the engagement ratio
    (daily actives over trailing-7-day actives) every product dashboard
    leads with.

    A distinct-count over a sliding window can't partial-aggregate
    directly, and a day-range join of the activity table is a range
    join. Instead each (day, user) activity row is EXPLODED to the
    ``window_days`` future days it keeps the user "active" for, then
    deduped and counted per target day — two plain groupBys, both
    map-side-combining, no range join, no window distinct. Shuffle
    volume is |distinct (day, user)| x window_days of narrow rows —
    bounded by users x days, independent of raw event volume.

    Output: (day, dau, wau, stickiness) for days observed in the data
    (trailing synthetic days beyond max(day) excluded).
    """
    day = F.col(ts_col).cast("date")
    active = events.select(
        day.alias("day"), F.col(user_col).alias("u")
    ).distinct()
    dau = active.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    contrib = (
        active.select(
            F.explode(
                F.sequence(F.lit(0), F.lit(window_days - 1))
            ).alias("off"),
            "day",
            "u",
        )
        .select(F.date_add("day", F.col("off")).alias("day"), "u")
        .distinct()
    )
    wau = contrib.groupBy("day").agg(F.count(F.lit(1)).alias("wau"))
    return (
        dau.join(wau, "day")  # inner: only observed days carry a dau row
        .select(
            "day",
            F.col("dau").cast("bigint").alias("dau"),
            F.col("wau").cast("bigint").alias("wau"),
            F.round(
                F.col("dau").cast("double") / F.col("wau"), 6
            ).alias("stickiness"),
        )
    )


def gap_fill_locf(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Daily per-user gap-filled series with last-observation-carried-
    forward — the time-series interpolation shape (TimescaleDB's
    ``locf(time_bucket_gapfill(...))``).

    Per user: take the day's closing value (row with max (ts, tiebreak)
    via ``max_by`` — a grouped agg, not a window sort), build the dense
    day spine between that user's first and last active day with
    ``sequence`` (no driver-side calendar), left-join observations onto
    the spine, and carry the last non-null value forward with an
    ``ignorenulls`` window.

    Every stage keys on user (then user+day), so one partitioning serves
    the whole plan; spine width is bounded by the observed per-user date
    range. ``filled`` is NULL only for days before a user's first
    observation (none here, since the spine starts at first activity).
    """
    u = F.col(user_col)
    day = F.col(ts_col).cast("date")

    daily = events.groupBy(u.alias("user_id"), day.alias("day")).agg(
        F.max_by(
            F.col(value_col), F.struct(F.col(ts_col), F.col(tiebreak_col))
        ).alias("day_close")
    )
    spine = (
        events.groupBy(u.alias("user_id"))
        .agg(F.min(day).alias("d0"), F.max(day).alias("d1"))
        .select(
            "user_id",
            F.explode(F.sequence("d0", "d1")).alias("day"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .withColumn("filled", F.last("day_close", ignorenulls=True).over(w))
        .withColumn("observed", F.col("day_close").isNotNull())
    )


def value_histogram(
    events: DataFrame,
    value_col: str = "value",
    bin_width: float = 10.0,
    group_col: str | None = None,
) -> DataFrame:
    """Fixed-width histogram of a numeric column (optionally per group):
    one codegen groupBy over floor(value / width) — the profiling /
    drift-monitoring primitive. Bin edges are [lo, lo + width).
    """
    b = F.floor(F.col(value_col) / F.lit(bin_width)).cast("bigint")
    keys = [b.alias("bin")] if group_col is None else [
        F.col(group_col),
        b.alias("bin"),
    ]
    return (
        events.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min(value_col), 6).alias("bin_min"),
            F.round(F.max(value_col), 6).alias("bin_max"),
        )
        .withColumn("bin_lo", F.round(F.col("bin") * bin_width, 6))
    )


def rolling_range_avg(
    events: DataFrame,
    days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-event trailing-``days`` aggregate over a RANGE frame (time
    interval, not row count) — the moving-average shape where event
    density varies per key, so ROWS frames would be wrong.

    The frame is expressed on ``unix_micros(ts)`` with literal microsecond
    bounds: Spark's rangeBetween needs a numeric ordering key, and integer
    microseconds make the window arithmetic exact. The sum aggregates in
    DECIMAL(18,2) (the testdata's monetary scale) so the rolling mean is
    partition-order independent; one window sort per user partition.
    """
    # unix_micros requires TIMESTAMP; the corpus normalizes event times
    # to TIMESTAMP_NTZ, and under a UTC session the cast is lossless.
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.unix_micros(F.col(ts_col).cast("timestamp")))
        .rangeBetween(-days * 86_400_000_000, 0)
    )
    dec = F.col(value_col).cast("decimal(18,2)")
    n = F.count(F.lit(1)).over(w)
    s = F.sum(dec).over(w)
    return events.select(
        "event_id",
        user_col,
        ts_col,
        F.col(value_col),
        n.cast("bigint").alias(f"n_{days}d"),
        F.round(s.cast("double") / n, 6).alias(f"avg_{days}d"),
    )


def zscore_outliers(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    threshold: float = 3.0,
) -> DataFrame:
    """Per-group z-score outlier flags, cross-engine exact.

    Group moments are computed in exact arithmetic — sum in
    DECIMAL(18,2), sum of squares in DECIMAL(28,4) (closed for
    2-decimal inputs) — then converted to double once, so mean/variance
    don't drift with partition/aggregation order the way naive double
    sums do. (Envelope: the double conversion is exact while the sums
    stay below 2^53 of their scaled integers — ~9e13 value-units, far
    past any per-group total here.) Population variance; z rounded to 6.

    Plan: one groupBy for moments + one broadcast join back — the
    two-pass shape; at 100 TB the moments table is |groups| rows.
    """
    v = F.col(value_col)
    stats = events.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(v.cast("decimal(18,2)")).alias("_s"),
        F.sum((v * v).cast("decimal(28,4)")).alias("_ss"),
    )
    mean = F.col("_s").cast("double") / F.col("_n")
    var = F.col("_ss").cast("double") / F.col("_n") - mean * mean
    # nullif: a constant group (variance 0) gets NULL z, explicitly —
    # Spark's double division by zero yields NULL but DuckDB's yields
    # inf, so the guard keeps the two engines (and the oracle) aligned.
    z = F.round((v - F.col("_mean")) / F.nullif(F.col("_std"), F.lit(0.0)), 6)
    return (
        events.join(
            F.broadcast(
                stats.select(
                    group_col,
                    mean.alias("_mean"),
                    F.sqrt(var).alias("_std"),
                )
            ),
            group_col,
        )
        .select(
            "event_id",
            group_col,
            v,
            z.alias("z"),
            (F.abs(z) > threshold).alias("is_outlier"),
        )
    )
