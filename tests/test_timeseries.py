"""Behavior tests for the event-series operators (funnel / retention /
gap-fill / histogram) and the corpus-curation additions — the paths the
driver's oracle parity doesn't exercise (unbounded funnels, per-user
depths, histogram without grouping, decontamination thresholds).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sales_data_warehouse_spark.operators import timeseries as ts
from sales_data_warehouse_spark.operators.dedup import ngram_decontaminate
from sales_data_warehouse_spark.operators.sampling import token_budget_select


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE"
    )


T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _t(hours):
    return T0 + dt.timedelta(hours=hours)


@pytest.fixture(scope="module")
def funnel_events(spark):
    # u1 completes in order; u2 clicks before viewing (no conversion);
    # u3 views only; u4 converts but too slowly for a 1 h deadline.
    rows = [
        (1, _t(0), 1, "view", 1.0),
        (2, _t(1), 1, "click", 1.0),
        (3, _t(2), 1, "purchase", 1.0),
        (4, _t(0), 2, "click", 1.0),
        (5, _t(1), 2, "view", 1.0),
        (6, _t(0), 3, "view", 1.0),
        (7, _t(0), 4, "view", 1.0),
        (8, _t(5), 4, "click", 1.0),
        (9, _t(20), 4, "purchase", 1.0),
    ]
    return _events(spark, rows)


def test_funnel_unbounded(spark, funnel_events):
    got = {
        r["step"]: r["n_users"]
        for r in ts.funnel_conversion(funnel_events).collect()
    }
    # All four users view (u2's view comes after its click, so it enters
    # the funnel but its click doesn't count — clicks must follow the
    # first view).
    assert got == {"view": 4, "click": 2, "purchase": 2}


def test_funnel_deadline(spark, funnel_events):
    got = {
        r["step"]: r["n_users"]
        for r in ts.funnel_conversion(
            funnel_events, within_hours=1
        ).collect()
    }
    # u4's click comes 5 h after its view: outside the 1 h deadline.
    assert got == {"view": 4, "click": 1, "purchase": 1}


def test_funnel_steps_depth(spark, funnel_events):
    depths = {
        r["user_id"]: r["depth"]
        for r in ts.funnel_steps(funnel_events).collect()
    }
    # Only users who performed step0 enter the table at all; u2's click
    # precedes its first view, so it stalls at depth 1.
    assert depths == {1: 3, 2: 1, 3: 1, 4: 3}


def test_funnel_counts_monotone(spark, funnel_events):
    counts = [
        r["n_users"]
        for r in ts.funnel_conversion(funnel_events)
        .orderBy("step_idx")
        .collect()
    ]
    assert counts == sorted(counts, reverse=True)


def test_retention_week0_is_every_user(spark, funnel_events):
    rows = ts.retention_cohorts(funnel_events).collect()
    week0 = sum(r["n_users"] for r in rows if r["week_offset"] == 0)
    n_users = funnel_events.select("user_id").distinct().count()
    assert week0 == n_users  # everyone is active in their cohort week


def test_gap_fill_locf_fills_interior_gaps(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1, 12), 1, "view", 10.0),
        (2, dt.datetime(2024, 1, 1, 18), 1, "view", 11.0),  # day close
        (3, dt.datetime(2024, 1, 4, 9), 1, "view", 20.0),
    ]
    out = {
        r["day"]: (r["filled"], r["observed"])
        for r in ts.gap_fill_locf(_events(spark, rows)).collect()
    }
    assert out[dt.date(2024, 1, 1)] == (11.0, True)  # latest-of-day wins
    assert out[dt.date(2024, 1, 2)] == (11.0, False)  # carried forward
    assert out[dt.date(2024, 1, 3)] == (11.0, False)
    assert out[dt.date(2024, 1, 4)] == (20.0, True)
    assert len(out) == 4  # dense spine, no days missing


def test_gap_fill_spine_is_per_user(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1), 1, "view", 1.0),
        (2, dt.datetime(2024, 1, 10), 1, "view", 2.0),
        (3, dt.datetime(2024, 2, 1), 2, "view", 3.0),
    ]
    out = ts.gap_fill_locf(_events(spark, rows))
    per_user = {
        r["user_id"]: r["n"]
        for r in out.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    # u1 spans 10 days, u2 a single day — no cross-user spine bleed.
    assert per_user == {1: 10, 2: 1}


def test_value_histogram_ungrouped(spark, funnel_events):
    out = ts.value_histogram(funnel_events, bin_width=0.5)
    rows = out.collect()
    assert [r["bin"] for r in rows] == [2]  # all values are 1.0
    assert rows[0]["n"] == 9
    assert rows[0]["bin_lo"] == 1.0


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING, source STRING")


def test_decontaminate_threshold(spark):
    docs = _docs(
        spark,
        [
            (1, "a b c d e f", "train"),  # shares 4-gram 'a b c d'
            (2, "x y z w v u", "train"),  # clean
            (3, "a b c d q r", "bench"),
        ],
    )
    out = ngram_decontaminate(
        docs.filter(F.col("source") == "train"),
        docs.filter(F.col("source") == "bench"),
        n=4,
    )
    rows = {r["doc"]: r for r in out.collect()}
    assert set(rows) == {1}  # only overlapping docs are returned
    assert rows[1]["n_overlap"] == 1 and rows[1]["contaminated"]

    strict = ngram_decontaminate(
        docs.filter(F.col("source") == "train"),
        docs.filter(F.col("source") == "bench"),
        n=4,
        min_hits=2,
    )
    assert not strict.collect()[0]["contaminated"]


def test_token_budget_prefix_semantics(spark):
    docs = _docs(
        spark,
        [
            (1, "w w w", "s"),  # 3 tokens, cum 3
            (2, "w w w w", "s"),  # 4 tokens, cum 7 > 5: dropped
            (3, "w", "s"),  # cum would fit alone but comes after: dropped
            (4, "w w", "t"),  # other source unaffected
        ],
    )
    out = token_budget_select(docs, budget=5)
    kept = sorted(r["doc_id"] for r in out.collect())
    assert kept == [1, 4]


def test_funnel_empty_input_counts_zero(spark):
    empty = _events(spark, []).filter("1=0")
    rows = ts.funnel_conversion(empty).orderBy("step_idx").collect()
    assert [r["n_users"] for r in rows] == [0, 0, 0]  # not NULL


def test_zscore_constant_group_yields_null(spark):
    rows = [
        (1, _t(0), 1, "view", 5.0),
        (2, _t(1), 2, "view", 5.0),  # constant group: variance 0
        (3, _t(0), 1, "click", 1.0),
        (4, _t(1), 2, "click", 3.0),
    ]
    out = {
        (r["event_id"]): r["z"]
        for r in ts.zscore_outliers(_events(spark, rows)).collect()
    }
    assert out[1] is None and out[2] is None
    assert out[3] is not None and out[4] is not None


def test_rolling_active_users_small(spark):
    import datetime as dt

    from sales_data_warehouse_spark.operators.timeseries import (
        rolling_active_users,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0),                          # day 0: u1
        (2, t0),                          # day 0: u2
        (1, t0 + dt.timedelta(days=3)),   # day 3: u1
        (3, t0 + dt.timedelta(days=8)),   # day 8: u3 (u1/u2 aged out of
                                          # 7-day window from day 0? day
                                          # 0 contributes to days 0-6)
    ]
    df = spark.createDataFrame(
        [(u, ts) for u, ts in rows], "user_id int, ts timestamp"
    )
    got = {
        str(r.day): (r.dau, r.wau, r.stickiness)
        for r in rolling_active_users(df).collect()
    }
    assert got["2024-01-01"] == (2, 2, 1.0)
    # day 3: dau=1 (u1); wau = users active in days [-3..3] window
    # contributions: day0 actives cover days 0-6 -> u1,u2 -> wau 2
    assert got["2024-01-04"] == (1, 2, 0.5)
    # day 8: only u3 in trailing 7 days (day 3 covers 3-9: u1 too!)
    assert got["2024-01-09"] == (1, 2, 0.5)
