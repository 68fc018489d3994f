"""Reusable as-of (point-in-time) join.

Reference: ``FactTable.sql:18-27`` does this with a correlated scalar
subquery per fact row (``ORDER BY last_update_date DESC LIMIT 1``) —
O(fact x versions) probes. Spark has no native ASOF JOIN; the idiomatic
plan is a non-equi join on ``version_ts <= event_ts`` plus a top-1
reduction per left row — here a ``max_by`` grouped aggregate, which
partial-aggregates map-side (SURVEY J8/W3).

Scale: when the versioned side is dimension-sized (price lists, configs),
Catalyst picks a broadcast join and the window partitions by the *left*
row key, so state never exceeds versions-per-key per row. For
billion-row versioned sides, pre-bucket both sides on ``on`` keys to make
the join shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: (applicationId, plan semanticHash) -> right-side row count. The
#: broadcast guard's count is pure plan metadata within one Spark
#: application (same files-immutable assumption as the corpus table
#: cache), so repeated asof calls over the same versioned side — the
#: common shape: one price list, many fact queries — pay the probe job
#: once, not per call. Bounded by the number of distinct right-side
#: plans in a session.
_GUARD_COUNT_CACHE: dict[tuple[str, int], int] = {}


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    *,
    direction: str = "backward",
    broadcast_right: bool = True,
    unique_left: bool = False,
    broadcast_row_limit: int | None = None,
    envelope_prefilter: bool = False,
) -> DataFrame:
    """For each left row, attach the single right row with the greatest
    ``right_ts`` <= ``left_ts`` (direction='backward'; 'forward' = least
    ``right_ts`` >= ``left_ts``; 'nearest' = smallest absolute
    ``|right_ts - left_ts|``, equidistant ties preferring the backward
    row — pandas ``merge_asof``'s tie rule, so both physical plans
    agree), matching on equality of ``on`` keys.

    'nearest' requires a date/timestamp or numeric ts column (it
    subtracts them) and cannot use ``envelope_prefilter`` (no version
    is provably unreachable: a far-away version is still some row's
    nearest when it is the only one).

    Left rows with no qualifying right row are dropped (inner semantics,
    matching the reference's correlated-subquery inner join).

    ``unique_left=True`` asserts that ``on + [left_ts]`` is unique on the
    left (e.g. the left is a ``.distinct()`` of those columns): the top-1
    reduction then groups by the real keys instead of a synthetic row id,
    so Catalyst/AQE can reuse the left's existing partitioning instead of
    re-shuffling on a meaningless unique id. With duplicate left keys it
    would collapse rows — leave it False there.

    ``broadcast_row_limit`` (opt-in) guards against silently
    broadcasting a huge versioned side: when set and ``right`` exceeds
    that many rows, the call raises with a pointer to
    :func:`asof_join_grouped`, the both-sides-huge path. The probe is
    one ``count()`` job — a narrow FULL pass of the right side whose
    partial aggregation ships one row per partition (the previous
    ``limit(N+1).count()`` formulation planned LocalLimit ->
    single-partition exchange -> GlobalLimit, shipping up to N+1 rows
    from every partition through the shuffle, without actually
    stopping early either). Be explicit about the trade: when the
    guard PASSES, the count costs no more than the broadcast build
    would have scanned anyway, and the memo (per application + plan)
    makes repeat calls free; when the guard FIRES on a genuinely huge
    side, you pay one full narrow scan for the loud failure. If even
    that scan is unacceptable — or the right side is an expensive
    derived pipeline (e.g. an SCD2 build) — skip the guard (None) and
    route huge sides to :func:`asof_join_grouped` yourself;
    broadcasting a too-big side without the guard fails at Spark's own
    broadcast limits rather than silently succeeding.

    Choosing between this plan and :func:`asof_join_grouped`: this
    broadcast + ``max_by`` plan wins whenever the versioned side fits
    in a broadcast. Measured on the same pricing oracle
    (BENCH_full_r06): this plan 1.75 s at 600 k facts -> 1.98 s at
    6 M; the cogroup plan 26.6 s -> 26.8 s — FLAT, because its cost is
    per-group Python/Arrow invocation over the constant ~20 k keys,
    not data volume. Prefer the grouped plan only when the versioned
    side is too big to broadcast — rule of thumb: past ~10-50 M
    version rows or wherever ``broadcast_row_limit`` / Spark's
    broadcast threshold fires — where this plan stops being available
    at all; the cogroup plan's cost is two co-keyed shuffles and stays
    bounded by the largest single key.

    ``envelope_prefilter=True`` prunes right-side versions that cannot
    match ANY left row before the join: for backward joins, versions
    effective after the left's global max ``left_ts`` (for forward,
    before the global min). Costs one tiny left-side min/max aggregate
    broadcast into the filter. Worth it when the versioned side's
    history extends past the fact window (e.g. pricing a January batch
    against a multi-year price list); a no-op when versions already sit
    inside the envelope.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest: {direction}"
        )
    if direction == "nearest" and envelope_prefilter:
        raise ValueError(
            "asof_join: envelope_prefilter cannot prune for "
            "direction='nearest' — every version is reachable"
        )

    if broadcast_right and broadcast_row_limit is not None:
        sc_app = left.sparkSession.sparkContext.applicationId
        key = (sc_app, right.semanticHash())
        n_right = _GUARD_COUNT_CACHE.get(key)
        if n_right is None:
            n_right = right.count()
            _GUARD_COUNT_CACHE[key] = n_right
        if n_right > broadcast_row_limit:
            raise ValueError(
                f"asof_join: right side exceeds the broadcast guard of "
                f"{broadcast_row_limit} rows; use asof_join_grouped "
                "(cogrouped merge_asof) or pass broadcast_right=False "
                "for a shuffle join"
            )

    if envelope_prefilter:
        # 1-row aggregate broadcast into a theta-join filter: prunes
        # versions outside the left's reachable time envelope before
        # the broadcast build. Backward can only bound from above (an
        # arbitrarily old version may still be some row's as-of match);
        # forward only from below.
        if direction == "backward":
            bound = left.agg(F.max(left_ts).alias("__env"))
            keep = F.col(right_ts) <= F.col("__env")
        else:
            bound = left.agg(F.min(left_ts).alias("__env"))
            keep = F.col(right_ts) >= F.col("__env")
        right = (
            right.join(F.broadcast(bound), keep, "inner").drop("__env")
        )

    lid = "__asof_left_id"
    if unique_left:
        lft = left
        group_keys = [F.col(f"l.{k}") for k in on] + [F.col(f"l.{left_ts}")]
    else:
        lft = left.withColumn(lid, F.monotonically_increasing_id())
        group_keys = [F.col(f"l.{lid}")]
    rgt = F.broadcast(right) if broadcast_right else right

    if direction == "backward":
        cond = F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}")
    elif direction == "forward":
        cond = F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}")
    else:
        # nearest: no ts inequality can prune a candidate version —
        # join every version per key and let the min_by pick; the
        # candidate set per left row is versions-per-key, same bound
        # as the directional joins' worst case. The NULL guards keep
        # the inner contract the directional joins get for free from
        # their ts inequality: a NULL-ts left row must DROP, not emit
        # NULL right columns (and the grouped plan's merge_asof
        # outright errors on null merge keys).
        cond = (
            F.col(f"l.{left_ts}").isNotNull()
            & F.col(f"r.{right_ts}").isNotNull()
        )
    for k in on:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))

    joined = lft.alias("l").join(rgt.alias("r"), cond, "inner")

    # Top-1-per-left-row via max_by/min_by instead of a window: the
    # grouped aggregate gets map-side partial aggregation (each task
    # reduces its local candidates to one row per left id before the
    # shuffle) and needs no sort, where a row_number window must shuffle
    # ALL join candidates and sort them within each partition. Ties on
    # right_ts pick an arbitrary version — same contract as the
    # reference's ORDER BY ... LIMIT 1 (FactTable.sql:25-26).
    right_cols = [c for c in right.columns if c not in on]
    if direction == "nearest":
        # order key = (|Δts|, forward?) — equidistant ties prefer the
        # backward version, pandas merge_asof's documented tie rule,
        # keeping this plan and asof_join_grouped bit-identical
        from pyspark.sql import types as T

        def _num(col: F.Column, dtype: T.DataType) -> F.Column:
            # Timezone-independent integer microseconds. A cast
            # through plain ``timestamp`` would pin dates to midnight
            # in the SESSION timezone, so under a DST zone two date
            # distances can skew by ±1h and flip a near-tie against
            # the grouped plan's exact day arithmetic.
            if isinstance(dtype, T.DateType):
                return F.unix_date(col).cast("bigint") * F.lit(
                    86_400_000_000
                ).cast("bigint")
            if isinstance(dtype, T.TimestampType):
                return F.unix_micros(col)  # instant micros
            if isinstance(dtype, T.TimestampNTZType):
                # interpret the naive value at fixed UTC: same wall
                # clock Arrow hands the grouped plan's pandas path
                return F.unix_micros(F.to_utc_timestamp(col, "UTC"))
            return col.cast("double")

        l_num = _num(F.col(f"l.{left_ts}"), left.schema[left_ts].dataType)
        r_num = _num(F.col(f"r.{right_ts}"), right.schema[right_ts].dataType)
        pick, order_key = F.min_by, F.struct(
            F.abs(l_num - r_num).alias("__dist"),
            (r_num > l_num).cast("int").alias("__fwd"),
        )
    else:
        pick = F.max_by if direction == "backward" else F.min_by
        order_key = F.col(f"r.{right_ts}")
    best = joined.groupBy(*group_keys).agg(
        F.first(
            F.struct(*[F.col(f"l.{c}").alias(c) for c in left.columns])
        ).alias("__l"),
        pick(
            F.struct(*[F.col(f"r.{c}").alias(c) for c in right_cols]),
            order_key,
        ).alias("__r"),
    )
    return best.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__r.{c}").alias(c) for c in right_cols],
    )


def asof_join_grouped(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    *,
    direction: str = "backward",
) -> DataFrame:
    """As-of join for when NEITHER side broadcasts (billion-row versioned
    side): cogroup both sides by the ``on`` keys — one shuffle each, the
    same cost as any co-partitioned join — and run a sorted merge
    (``pandas.merge_asof``) per key group in Arrow batches. Per-group
    work is O(n log n) in that key's rows only, so the plan scales with
    the largest key, not the table. Semantics match ``asof_join``
    (inner: left rows with no qualifying version are dropped), for all
    three directions — 'nearest' is native to ``merge_asof``, whose
    equidistant-tie rule (prefer backward) the broadcast plan mirrors.

    Requires the ``on`` + ts columns to have distinct names across
    sides, and ``right_ts`` values unique per key-group tie (pandas
    merge_asof picks the last sorted row on exact ties — same arbitrary-
    on-ties contract as the reference's LIMIT 1).

    Crossover vs :func:`asof_join`: measured on the same pricing
    oracle (BENCH_full_r06), this plan costs 26.6 s at 600 k facts and
    26.8 s at 6 M — FLAT, dominated by per-group Python/Arrow call
    overhead over the constant ~20 k part keys — where broadcast +
    ``max_by`` costs 1.75 s / 1.98 s. The Arrow cogroup overhead is
    pure loss while the versioned side still broadcasts. Reach for
    this plan only PAST the broadcast limit (~10-50 M version rows, or
    when ``broadcast_row_limit`` fires): it is the shape that survives
    a both-sides-huge 100 TB join, not a faster small-scale
    alternative.

    Timezone parity note: Arrow hands this plan session-LOCAL naive
    timestamps for ``TimestampType`` columns. The repo pins
    ``spark.sql.session.timeZone=UTC``, under which both plans are
    bit-identical in all three directions (tested); under a non-UTC
    DST zone, instant-based distances (the broadcast plan) and naive
    wall-clock distances (this plan) can disagree on near-ties within
    DST transitions. ``DateType`` columns are immune — both plans use
    exact day arithmetic.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest: {direction}"
        )

    import pandas as pd

    from pyspark.sql import types as T

    right_cols = [c for c in right.columns if c not in on]
    out_fields = list(left.schema.fields) + [
        right.schema[c] for c in right_cols
    ]
    out_schema = T.StructType(out_fields)
    left_names = list(left.columns)
    l_ts, r_ts, dirn = left_ts, right_ts, direction

    l_is_date = isinstance(left.schema[left_ts].dataType, T.DateType)
    r_is_date = isinstance(right.schema[right_ts].dataType, T.DateType)

    def merge(l_pdf: "pd.DataFrame", r_pdf: "pd.DataFrame") -> "pd.DataFrame":
        if not len(l_pdf) or not len(r_pdf):
            return pd.DataFrame(columns=left_names + right_cols)
        ls = l_pdf.copy()
        rs = r_pdf[[r_ts] + [c for c in right_cols if c != r_ts]].copy()
        # DateType arrives as object-dtype datetime.date; merge_asof
        # needs an ordered numeric/datetime64 key
        if l_is_date:
            ls[l_ts] = pd.to_datetime(ls[l_ts])
        if r_is_date:
            rs[r_ts] = pd.to_datetime(rs[r_ts])
        ls = ls.sort_values(l_ts, kind="mergesort")
        rs = rs.sort_values(r_ts, kind="mergesort")
        merged = pd.merge_asof(
            ls,
            rs,
            left_on=l_ts,
            right_on=r_ts,
            direction=dirn,
            suffixes=("", "__r"),
        )
        # inner semantics: drop left rows with no qualifying version
        r_ts_out = r_ts if r_ts != l_ts else f"{r_ts}__r"
        merged = merged[merged[r_ts_out].notna()]
        if l_is_date:
            merged[l_ts] = merged[l_ts].dt.date
        if r_is_date:
            merged[r_ts_out] = merged[r_ts_out].dt.date
        return merged[left_names + right_cols]

    return (
        left.groupBy(*on)
        .cogroup(right.groupBy(*on))
        .applyInPandas(merge, schema=out_schema)
    )
