"""Property-based as-of join checks: for random event/version sets, the
joined version must be the latest one at-or-before the event (backward)
— verified against a brute-force python oracle — and both
implementations (broadcast max_by, cogroup merge_asof) must agree."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sales_data_warehouse_spark.operators.asof import (
    asof_join,
    asof_join_grouped,
)

BASE = dt.date(2020, 1, 1)

events = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 60)),  # (key, day offset)
    min_size=1,
    max_size=25,
)
versions = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 60), st.integers(1, 999)),
    min_size=1,
    max_size=12,
    unique_by=lambda t: (t[0], t[1]),  # one version per (key, day)
)


def _oracle(evts, vers):
    out = []
    for i, (k, d) in enumerate(evts):
        cands = [(vd, price) for vk, vd, price in vers if vk == k and vd <= d]
        if cands:
            vd, price = max(cands)
            out.append((i, k, d, vd, price))
    return sorted(out)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(evts=events, vers=versions)
def test_asof_matches_bruteforce_oracle(spark, evts, vers):
    left = spark.createDataFrame(
        [
            (i, k, BASE + dt.timedelta(days=d))
            for i, (k, d) in enumerate(evts)
        ],
        "event_id int, key int, ts date",
    )
    right = spark.createDataFrame(
        [
            (k, BASE + dt.timedelta(days=d), p)
            for k, d, p in vers
        ],
        "key int, vts date, price int",
    )
    want = _oracle(evts, vers)

    for impl in (asof_join, asof_join_grouped):
        got = impl(left, right, on=["key"], left_ts="ts", right_ts="vts")
        rows = sorted(
            (
                r["event_id"],
                r["key"],
                (r["ts"] - BASE).days,
                (r["vts"] - BASE).days,
                r["price"],
            )
            for r in got.collect()
        )
        assert rows == want, impl.__name__


def _oracle_tol(evts, vers, tol_days, exact):
    """Brute force with bounded staleness and optional strict bound."""
    out = []
    for i, (k, d) in enumerate(evts):
        cands = [
            (vd, price)
            for vk, vd, price in vers
            if vk == k
            and (vd <= d if exact else vd < d)
            and d - vd <= tol_days
        ]
        if cands:
            vd, price = max(cands)
            out.append((i, k, d, vd, price))
    return sorted(out)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    evts=events,
    vers=versions,
    tol_days=st.integers(0, 30),
    exact=st.booleans(),
)
def test_asof_tolerance_matches_bruteforce_oracle(
    spark, evts, vers, tol_days, exact
):
    """Random tolerance + strictness: all three physical plans must
    equal the brute-force python oracle."""
    left = spark.createDataFrame(
        [
            (i, k, BASE + dt.timedelta(days=d))
            for i, (k, d) in enumerate(evts)
        ],
        "event_id int, key int, ts date",
    )
    right = spark.createDataFrame(
        [(k, BASE + dt.timedelta(days=d), p) for k, d, p in vers],
        "key int, vts date, price int",
    )
    want = _oracle_tol(evts, vers, tol_days, exact)
    kw = dict(
        on=["key"], left_ts="ts", right_ts="vts",
        tolerance=dt.timedelta(days=tol_days), allow_exact_matches=exact,
    )
    impls = [
        ("broadcast", lambda: asof_join(left, right, **kw)),
        (
            "union",
            lambda: asof_join_grouped(left, right, engine="union", **kw),
        ),
        (
            "cogroup",
            lambda: asof_join_grouped(left, right, engine="cogroup", **kw),
        ),
    ]
    for name, make in impls:
        rows = sorted(
            (
                r["event_id"],
                r["key"],
                (r["ts"] - BASE).days,
                (r["vts"] - BASE).days,
                r["price"],
            )
            for r in make().collect()
        )
        assert rows == want, name


def test_asof_broadcast_guard_rejects_huge_right(spark):
    # broadcast_right=True must not silently broadcast a giant
    # versioned side: over the row guard it raises and points at the
    # cogrouped path instead of OOMing the driver.
    import pytest

    left = spark.createDataFrame([(1, 1)], "key int, ts int")
    right = spark.range(0, 500).selectExpr(
        "CAST(id % 5 AS INT) AS key", "CAST(id AS INT) AS vts"
    )
    with pytest.raises(ValueError, match="broadcast guard"):
        asof_join(
            left, right, on=["key"], left_ts="ts", right_ts="vts",
            broadcast_row_limit=100,
        )
    # under the guard it works as before
    out = asof_join(
        left, right, on=["key"], left_ts="ts", right_ts="vts",
        broadcast_row_limit=1000,
    )
    assert out.count() == 1


def test_asof_unique_left_groups_by_real_keys(spark):
    # unique_left=True: same semantics when (on, left_ts) is unique.
    left = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 15)], "key int, ts int"
    )
    right = spark.createDataFrame(
        [(1, 5, 100), (1, 15, 110), (2, 10, 200)],
        "key int, vts int, price int",
    )
    for flag in (False, True):
        got = sorted(
            (r["key"], r["ts"], r["vts"], r["price"])
            for r in asof_join(
                left, right, on=["key"], left_ts="ts", right_ts="vts",
                unique_left=flag,
            ).collect()
        )
        assert got == [(1, 10, 5, 100), (1, 20, 15, 110), (2, 15, 10, 200)]
