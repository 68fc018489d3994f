"""Command-line interface: run the warehouse without writing Python.

    python -m sales_data_warehouse_spark run-etl <csv> <outdir> [--dense]
    python -m sales_data_warehouse_spark query <name> [--sf-dir DIR] [-n 20]
    python -m sales_data_warehouse_spark tables [--sf-dir DIR]

The reference engine is driven by psql invocations of its procedures
(``MotherProcedure.sql``); this is that surface for the Spark engine —
every corpus query and the full ETL reachable from a shell.
"""

from __future__ import annotations

import argparse
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="sales_data_warehouse_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    etl = sub.add_parser("run-etl", help="CSV -> parquet warehouse")
    etl.add_argument("csv")
    etl.add_argument("outdir")
    etl.add_argument(
        "--dense", action="store_true",
        help="materialize the dense cube fact (reference parity mode)",
    )

    q = sub.add_parser("query", help="run one corpus query")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("-n", "--rows", type=int, default=20)

    t = sub.add_parser("tables", help="list corpus queries")
    t.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    return p


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)

    from sales_data_warehouse_spark.session import get_spark

    if args.cmd == "run-etl":
        from sales_data_warehouse_spark.etl import run_etl

        spark = get_spark(app_name="sdw-cli")
        res = run_etl(spark, args.csv, output_dir=args.outdir,
                      dense=args.dense)
        for name in ("landing", "invalid", "cleansed", "time_dimension",
                     "location_dimension", "product_dimension", "fact"):
            print(f"{name}: {getattr(res, name).count()}")
        return 0

    from sales_data_warehouse_spark.queries.corpus import QUERIES

    if args.cmd == "tables":
        for name in QUERIES:
            print(name)
        return 0

    if args.name not in QUERIES:
        print(f"unknown query {args.name!r}; see the `tables` subcommand",
              file=sys.stderr)
        return 2
    spark = get_spark(app_name="sdw-cli")
    QUERIES[args.name](spark, args.sf_dir).show(args.rows, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
