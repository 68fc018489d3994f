"""drift_report: integer-exact histogram drift between two snapshots —
identical snapshots show zero drift, shifted ones light up, B values
outside A's domain clamp into the edge bins, and the report always has
exactly `buckets` rows."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sales_data_warehouse_spark.operators.profile import drift_report


def _df(spark, vals):
    return spark.createDataFrame(
        [(float(v),) for v in vals], "price double"
    )


def test_identical_snapshots_zero_drift(spark):
    a = _df(spark, [1.00, 2.50, 3.75, 9.99] * 5)
    out = drift_report(a, a, "price", buckets=10).collect()
    assert len(out) == 10
    assert all(r["chi2_ppm"] == 0 for r in out)
    assert all(r["cnt_a"] == r["cnt_b"] for r in out)


def test_shift_shows_up_in_edge_buckets(spark):
    a = _df(spark, [float(i) for i in range(1, 101)])
    b = _df(spark, [float(i) + 50.0 for i in range(1, 101)])
    out = {r["bucket"]: r for r in
           drift_report(a, b, "price", buckets=10).collect()}
    # B shifted up: the low buckets drain, the top bucket (clamped
    # overflow) swells
    assert out[0]["cnt_a"] > out[0]["cnt_b"]
    assert out[9]["cnt_b"] > out[9]["cnt_a"]
    assert sum(r["chi2_ppm"] for r in out.values()) > 0


def test_out_of_domain_b_values_clamp(spark):
    a = _df(spark, [10.0, 20.0])
    b = _df(spark, [-100.0, 500.0])
    out = {r["bucket"]: r for r in
           drift_report(a, b, "price", buckets=4).collect()}
    assert sum(r["cnt_b"] for r in out.values()) == 2
    assert out[0]["cnt_b"] == 1  # below-domain -> first bin
    assert out[3]["cnt_b"] == 1  # above-domain -> last bin


def test_counts_conserved_and_rates_sum(spark):
    a = _df(spark, [float(i % 7) for i in range(70)])
    b = _df(spark, [float(i % 5) for i in range(30)])
    rows = drift_report(a, b, "price", buckets=5).collect()
    assert sum(r["cnt_a"] for r in rows) == 70
    assert sum(r["cnt_b"] for r in rows) == 30
    # integer permille rates sum to <= 1000 (floor division)
    assert sum(r["rate_a_permille"] for r in rows) <= 1000


def test_explicit_bounds_override(spark):
    a = _df(spark, [5.0, 6.0])
    out = drift_report(
        a, a, "price", buckets=2, lo=0, hi=1999
    ).collect()
    assert {r["domain_lo"] for r in out} == {0}
    assert {r["domain_hi"] for r in out} == {1999}


def test_empty_snapshot_a_falls_back_to_b_domain(spark):
    # regression: defaulted bounds used to int(None)-crash on empty A;
    # the report must stay defined with all cnt_a = 0
    empty = spark.createDataFrame([], "price double")
    b = _df(spark, [5.0, 6.0, 7.0])
    rows = drift_report(empty, b, "price", buckets=4).collect()
    assert len(rows) == 4
    assert sum(r["cnt_a"] for r in rows) == 0
    assert sum(r["cnt_b"] for r in rows) == 3
    # both empty: zero domain, zero counts, no crash
    rows2 = drift_report(empty, empty, "price", buckets=4).collect()
    assert len(rows2) == 4
    assert all(r["chi2_ppm"] == 0 for r in rows2)


def test_far_outlier_lands_in_top_bucket_not_wrapped(spark):
    # regression: pre-clamp INT cast wrapped huge quotients under
    # ANSI-off and mis-binned far outliers into bucket 0
    a = _df(spark, [1.00, 1.01])  # span of 2 scaled units
    b = _df(spark, [2.1e7])
    out = {r["bucket"]: r for r in
           drift_report(a, b, "price", buckets=4).collect()}
    assert out[3]["cnt_b"] == 1
    assert out[0]["cnt_b"] == 0
