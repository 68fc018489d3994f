"""Command-line interface: run the warehouse without writing Python.

    python -m sales_data_warehouse_spark run-etl <csv> <outdir> [--dense]
    python -m sales_data_warehouse_spark query <name> [--sf-dir DIR] [-n 20]
    python -m sales_data_warehouse_spark tables [--sf-dir DIR]
    python -m sales_data_warehouse_spark compact <path> [--sort-cols a,b]
    python -m sales_data_warehouse_spark explain <name> [--run]

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

    c = sub.add_parser(
        "compact", help="rewrite a parquet table into size-targeted files"
    )
    c.add_argument("path")
    c.add_argument("--sort-cols", default=None,
                   help="comma-separated sort columns (range-sorted files)")
    c.add_argument("--target-file-mb", type=int, default=128)

    e = sub.add_parser(
        "explain",
        help="physical plan + scale-audit flags for one corpus query",
    )
    e.add_argument("name")
    e.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    e.add_argument(
        "--run", action="store_true",
        help="execute first so AQE's FINAL plan is shown (runtime join "
        "strategies); default shows the static plan without running",
    )
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

    if args.cmd == "compact":
        from sales_data_warehouse_spark.sources.compaction import (
            compact_table,
            parquet_file_count,
        )

        spark = get_spark(app_name="sdw-cli")
        before = parquet_file_count(spark, args.path)
        n = compact_table(
            spark,
            args.path,
            sort_cols=(
                args.sort_cols.split(",") if args.sort_cols else None
            ),
            target_file_mb=args.target_file_mb,
        )
        print(f"{args.path}: {before} -> {n} files")
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
    df = QUERIES[args.name](spark, args.sf_dir)

    if args.cmd == "explain":
        from sales_data_warehouse_spark.plans import (
            codegen_stage_count,
            executed_plan,
            has_nested_loop_join,
            pushed_filters,
            scan_columns,
        )

        plan = executed_plan(df, finalize=args.run)
        print(plan)
        print("--- scale audit " + "-" * 44)
        filters = pushed_filters(df)
        print(f"pushed filters     : {filters or '(none — full scan)'}")
        for i, cols in enumerate(scan_columns(df)):
            print(f"scan {i} reads       : {len(cols)} cols {cols}")
        print(
            "cartesian/BNLJ     : "
            + ("PRESENT — check it is intentional"
               if has_nested_loop_join(df, finalized=args.run)
               else "none")
        )
        print(
            f"codegen stages     : {codegen_stage_count(df, args.run)}"
            + (
                ""
                if args.run
                else "  (static AQE plan — pass --run for final counts)"
            )
        )
        print(
            "broadcast joins    : "
            f"{plan.count('BroadcastHashJoin')}  "
            f"shuffle joins: {plan.count('SortMergeJoin') + plan.count('ShuffledHashJoin')}  "
            f"exchanges: {plan.count('Exchange')}"
        )
        return 0

    df.show(args.rows, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
