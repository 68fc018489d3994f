"""Local twin of the driver's correctness gate: run every ``queries()``
entry on Spark AND its ``oracle_sql()`` on DuckDB over the same parquet,
compare row count, column names, and an order-insensitive value multiset.

Strictness matches (or exceeds) the driver: values are normalized to
strings (floats via repr, timestamps via isoformat) and compared as sorted
multisets with columns sorted by name.
"""

from __future__ import annotations

import datetime as dt
import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def _norm(v):
    # type-prefixed normalization: a DuckDB DECIMAL and a Spark DOUBLE
    # that render to the same string must NOT compare equal — the
    # driver's compare may be type-strict, so the local twin is too
    # (this caught value_histogram's bin_lo arriving as Decimal('0.0')
    # vs 0.0, invisible under plain str())
    if v is None:
        return "\0NULL"
    if isinstance(v, bool):
        return f"bool:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "float:NaN"
        return f"float:{v!r}"
    if isinstance(v, dt.datetime):
        return f"ts:{v.replace(tzinfo=None).isoformat()}"
    if isinstance(v, dt.date):
        return f"date:{v.isoformat()}"
    return f"{type(v).__name__}:{v}"


def _rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def test_every_query_has_callable():
    assert len(QUERIES) >= 30
    # every oracle key exists in queries
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_parity(name, spark, duck):
    df = QUERIES[name](spark, SF_DIR)
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]

    if name not in ORACLES:
        # weaker rows-only check, mirroring the driver
        assert len(spark_rows) >= 0
        return

    res = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    ms_s = _rows_to_multiset(spark_cols, spark_rows)
    ms_d = _rows_to_multiset(duck_cols, duck_rows)
    if ms_s != ms_d:
        diff = [
            (a, b) for a, b in zip(ms_s, ms_d) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")
