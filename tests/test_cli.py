"""CLI surface: subcommand parsing and in-process execution."""

from __future__ import annotations

from sales_data_warehouse_spark.cli import main


def test_tables_lists_queries(capsys):
    assert main(["tables"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert "pricing_summary" in out and len(out) >= 100


def test_unknown_query_is_an_error(capsys):
    assert main(["query", "no_such_query"]) == 2


def test_query_runs(spark, capsys):
    assert main(
        ["query", "scalar_aggregates", "--sf-dir", "/root/testdata/sf0.001"]
    ) == 0
    assert "max_orderkey" in capsys.readouterr().out


def test_run_etl_prints_counts(spark, tmp_path, capsys):
    rc = main(
        ["run-etl", "/root/reference/Sales_January_2019.csv",
         str(tmp_path / "wh")]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "cleansed: 9671" in out and "invalid: 42" in out


def test_cli_compact(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    from sales_data_warehouse_spark.cli import main

    path = str(tmp_path / "t")
    (
        spark.range(0, 5000)
        .withColumn("v", F.md5(F.col("id").cast("string")))
        .repartition(20)
        .write.parquet(path)
    )
    assert main(["compact", path, "--sort-cols", "id"]) == 0
    out = capsys.readouterr().out
    assert "20 -> 1 files" in out
    assert spark.read.parquet(path).count() == 5000


def test_explain_prints_plan_and_audit(capsys):
    from sales_data_warehouse_spark.cli import main

    assert main(["explain", "pricing_summary"]) == 0
    out = capsys.readouterr().out
    assert "FileScan parquet" in out
    assert "scale audit" in out
    assert "pushed filters" in out
    assert "l_shipdate" in out  # the Q1 bound reached the scan
    assert "cartesian/BNLJ     : none" in out


def test_explain_unknown_query_errors(capsys):
    from sales_data_warehouse_spark.cli import main

    assert main(["explain", "no_such_query"]) == 2
