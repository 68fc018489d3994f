"""Property-based checks of the event-series operators against
independent in-Python reference implementations (SURVEY §5 layer d):
Hypothesis generates arbitrary event sets; the Spark plans must agree
with a brute-force Python computation of the same semantics.
"""

from __future__ import annotations

import datetime as dt
from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sales_data_warehouse_spark.operators import timeseries as ts

T0 = dt.datetime(2024, 1, 1)
STEPS = ("view", "click", "purchase")

event = st.builds(
    lambda u, minutes, kind, val: (
        u,
        T0 + dt.timedelta(minutes=minutes),
        kind,
        val / 100.0,
    ),
    u=st.integers(1, 4),
    minutes=st.integers(0, 60 * 24 * 14),
    kind=st.sampled_from(STEPS),
    val=st.integers(0, 9999),
)

# Distinct (user, ts) pairs: event_id assignment below makes ordering
# deterministic, but duplicate timestamps within a user would make the
# funnel's strict > comparisons depend on which duplicate got which id —
# well-defined in both implementations, so duplicates are allowed.
batch = st.lists(event, min_size=0, max_size=60)


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, r[1], r[0], r[2], r[3]) for i, r in enumerate(rows)],
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE",
    )


def _ref_funnel(rows, within_hours=None):
    """Brute-force first-touch funnel reference."""
    by_user = defaultdict(list)
    for u, t, kind, _ in rows:
        by_user[u].append((t, kind))
    counts = [0] * len(STEPS)
    for evs in by_user.values():
        evs.sort()
        prev = None
        for i, step in enumerate(STEPS):
            cand = [
                t
                for t, kind in evs
                if kind == step
                and (prev is None or t > prev)
                and (
                    within_hours is None
                    or prev is None
                    or t <= prev + dt.timedelta(hours=within_hours)
                )
            ]
            if not cand:
                break
            prev = min(cand)
            counts[i] += 1
    return counts


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=batch)
def test_funnel_matches_reference(spark, rows):
    got = {
        r["step_idx"]: r["n_users"]
        for r in ts.funnel_conversion(_df(spark, rows), STEPS).collect()
    }
    assert [got[i] for i in range(3)] == _ref_funnel(rows)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=batch)
def test_funnel_deadline_matches_reference(spark, rows):
    got = {
        r["step_idx"]: r["n_users"]
        for r in ts.funnel_conversion(
            _df(spark, rows), STEPS, within_hours=24
        ).collect()
    }
    assert [got[i] for i in range(3)] == _ref_funnel(rows, within_hours=24)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(event, min_size=1, max_size=60))
def test_gap_fill_matches_reference(spark, rows):
    out = ts.gap_fill_locf(_df(spark, rows)).collect()

    # Reference: per user, dense day spine + carry-forward of the
    # latest-by-(ts, event_id) value of each observed day.
    daily = {}
    bounds = {}
    for eid, (u, t, _, v) in enumerate(rows):
        d = t.date()
        key = (u, d)
        if key not in daily or (t, eid) > daily[key][0]:
            daily[key] = ((t, eid), v)
        lo, hi = bounds.get(u, (d, d))
        bounds[u] = (min(lo, d), max(hi, d))

    expect = {}
    for u, (lo, hi) in bounds.items():
        last = None
        d = lo
        while d <= hi:
            if (u, d) in daily:
                last = daily[(u, d)][1]
                expect[(u, d)] = (last, True)
            else:
                expect[(u, d)] = (last, False)
            d += dt.timedelta(days=1)

    got = {
        (r["user_id"], r["day"]): (r["filled"], r["observed"]) for r in out
    }
    assert got == expect
