"""Round-6 fixes: nearest as-of timezone independence + NULL-ts inner
contract (broadcast plan), and apply_changes with a snapshot-owned
version column."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sales_data_warehouse_spark.operators.asof import (
    asof_join,
    asof_join_grouped,
)
from sales_data_warehouse_spark.operators.text import bigram_surprisal
from sales_data_warehouse_spark.operators.upsert import apply_changes


# ---------------------------------------------------------------------------
# asof nearest: DateType distances must be timezone-independent
# ---------------------------------------------------------------------------

def _date_sides(spark):
    # left rows sit exactly between two versions in DAY terms, but a
    # timestamp cast under a DST zone would skew one side by an hour
    # and flip the tie away from the documented prefer-backward rule
    left = spark.createDataFrame(
        [
            (1, dt.date(2024, 3, 10)),   # DST spring-forward (US) date
            (1, dt.date(2024, 11, 3)),   # DST fall-back date
        ],
        "k long, ts date",
    )
    right = spark.createDataFrame(
        [
            (1, dt.date(2024, 3, 8), "a"),
            (1, dt.date(2024, 3, 12), "b"),   # equidistant with "a"
            (1, dt.date(2024, 11, 1), "c"),
            (1, dt.date(2024, 11, 5), "d"),   # equidistant with "c"
        ],
        "k long, vts date, tag string",
    )
    return left, right


def test_nearest_date_ties_immune_to_session_tz(spark):
    left, right = _date_sides(spark)
    tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        results = {}
        for zone in ("UTC", "America/New_York"):
            spark.conf.set("spark.sql.session.timeZone", zone)
            out = asof_join(
                left, right, ["k"], "ts", "vts", direction="nearest"
            )
            results[zone] = sorted(
                (str(r.ts), r.tag) for r in out.collect()
            )
        assert results["UTC"] == results["America/New_York"]
        # equidistant ties prefer the BACKWARD version in both zones
        assert results["UTC"] == [("2024-03-10", "a"), ("2024-11-03", "c")]
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz)


def test_nearest_null_ts_rows_drop(spark):
    # inner contract: a NULL-ts left row must DROP (directional joins
    # get this from the ts inequality; nearest needs explicit guards),
    # and a NULL-ts version must never be anyone's nearest match
    left = spark.createDataFrame(
        [(1, dt.date(2024, 1, 10)), (1, None), (2, dt.date(2024, 1, 5))],
        "k long, ts date",
    )
    right = spark.createDataFrame(
        [(1, dt.date(2024, 1, 1), "v1"), (2, None, "bad")],
        "k long, vts date, tag string",
    )
    out = asof_join(left, right, ["k"], "ts", "vts", direction="nearest")
    rows = [(r.k, str(r.ts), r.tag) for r in out.collect()]
    assert rows == [(1, "2024-01-10", "v1")]


def test_nearest_timestamp_parity_between_plans(spark):
    # integer-microsecond distances (broadcast) vs merge_asof (grouped)
    # on sub-second gaps: both must pick the same version
    base = dt.datetime(2024, 5, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [(1, base + dt.timedelta(microseconds=500_001))],
        "k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, base, "back"),
            (1, base + dt.timedelta(seconds=1), "fwd"),  # 499_999 us away
        ],
        "k long, vts timestamp, tag string",
    )
    b = asof_join(left, right, ["k"], "ts", "vts", direction="nearest")
    g = asof_join_grouped(
        left, right, ["k"], "ts", "vts", direction="nearest"
    )
    assert [r.tag for r in b.collect()] == ["fwd"]
    assert [r.tag for r in g.collect()] == ["fwd"]


# ---------------------------------------------------------------------------
# bigram_surprisal min_count floor
# ---------------------------------------------------------------------------

def test_bigram_min_count_floor(spark):
    # "a b" x3 (1 bit each) + "b a" x2 (1 bit each) -> 5 bits exact;
    # at min_count=4 both fall below the floor and default to 0 (the
    # documented approximation); at the default min_count=2 results
    # are exact (singletons are already 0 bits)
    docs = spark.createDataFrame(
        [(1, "a b a b a b")], "doc_id long, text string"
    )
    exact = bigram_surprisal(docs).collect()[0]
    assert exact.n_bigrams == 5 and exact.sum_log2_freq == 5
    floored = bigram_surprisal(docs, min_count=4).collect()[0]
    assert floored.n_bigrams == 5 and floored.sum_log2_freq == 0


# ---------------------------------------------------------------------------
# apply_changes: snapshot-owned version column
# ---------------------------------------------------------------------------

def test_upsert_keeps_snapshot_version_column(spark):
    # the snapshot itself carries `ver` (SCD-ish): the upsert leg must
    # keep it so the unionByName lines up, and the result carries the
    # batch's version for touched keys
    snapshot = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 4)], "k long, name string, ver long"
    )
    changes = spark.createDataFrame(
        [(2, "b2", 5, "U"), (2, "stale", 3, "U"), (3, "c", 1, "I")],
        "k long, name string, ver long, op string",
    )
    out = apply_changes(
        snapshot, changes, keys=["k"], version_col="ver"
    )
    assert sorted(out.columns) == ["k", "name", "ver"]
    rows = {r.k: (r.name, r.ver) for r in out.collect()}
    assert rows == {1: ("a", 1), 2: ("b2", 5), 3: ("c", 1)}


def test_upsert_metadata_version_column_still_dropped(spark):
    # version_col NOT in the snapshot schema -> stays batch metadata
    snapshot = spark.createDataFrame(
        [(1, "a")], "k long, name string"
    )
    changes = spark.createDataFrame(
        [(1, "a2", 9, "U")], "k long, name string, ver long, op string"
    )
    out = apply_changes(snapshot, changes, keys=["k"], version_col="ver")
    assert sorted(out.columns) == ["k", "name"]
    assert [(r.k, r.name) for r in out.collect()] == [(1, "a2")]
