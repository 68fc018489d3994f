"""ORC source: round-trip fidelity, partitioned layout, and the same
pushdown/pruning plan behavior the parquet scans get."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sales_data_warehouse_spark.plans import pushed_filters, scan_columns
from sales_data_warehouse_spark.sources.orc import read_orc, write_orc


def test_roundtrip_documents(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "docs_orc")
    write_orc(docs, out)
    assert any(f.endswith(".orc") for f in os.listdir(out))
    back = read_orc(spark, out)
    assert back.schema == docs.schema
    a = sorted(r.doc_id for r in docs.select("doc_id").collect())
    b = sorted(r.doc_id for r in back.select("doc_id").collect())
    assert a == b


def test_partitioned_write_prunes(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "docs_orc_part")
    write_orc(docs, out, partition_by=["source"])
    assert os.path.isdir(os.path.join(out, "source=src0"))
    one = read_orc(spark, out).filter(F.col("source") == "src0")
    # hive partition pruning: only the one directory is scanned
    n_src0 = one.count()
    assert n_src0 == docs.filter(F.col("source") == "src0").count()


def test_orc_scan_pushdown_and_pruning(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "docs_orc_plan")
    write_orc(docs, out)
    q = (
        read_orc(spark, out)
        .filter(F.col("n_chars") > 100)
        .select("doc_id", "n_chars")
    )
    assert any("n_chars" in f for f in pushed_filters(q))
    scans = scan_columns(q)
    assert scans and all(set(c) <= {"doc_id", "n_chars"} for c in scans)
