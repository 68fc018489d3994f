"""Simulate the correctness driver's side-by-side compare, strictly.

Runs every ``queries()`` entry on Spark AND its ``oracle_sql()`` on
DuckDB over the same parquet directory, comparing row count, column
names, and a type-strict repr multiset (stricter than the local parity
twin's normalization — a DECIMAL that renders like a DOUBLE still
fails here). Use before a round ends to guarantee the driver window is
green:

    python tools/driver_sim.py [sf_dir] [start] [end]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from sales_data_warehouse_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(rows, cols):
    cs = sorted(cols)
    return sorted(
        tuple(repr(dict(zip(cols, r))[c]) for c in cs) for r in rows
    )


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else None

    spark = get_spark(app_name="driver-sim")
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )

    names = list(qs)[lo:hi]
    failures = 0
    t_all = time.time()
    for name in names:
        t0 = time.time()
        try:
            df = qs[name](spark, sf)
            srows = [tuple(r) for r in df.collect()]
            scols = df.columns
            cur = con.execute(oracles[name])
            orows = cur.fetchall()
            ocols = [d[0] for d in cur.description]
            ok = (
                len(srows) == len(orows)
                and sorted(scols) == sorted(ocols)
                and canon(srows, scols) == canon(orows, ocols)
            )
            tag = "OK  " if ok else "FAIL"
            failures += not ok
            print(f"{tag} {name} {time.time() - t0:.1f}s "
                  f"rows={len(srows)}/{len(orows)}")
        except Exception as e:  # noqa: BLE001 — report and continue
            failures += 1
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:140]}")
    print(f"== {len(names) - failures}/{len(names)} strict-identical "
          f"in {time.time() - t_all:.0f}s at {sf}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
