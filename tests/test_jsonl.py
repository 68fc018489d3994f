"""JSONL source: corrupt-record routing, round-trip fidelity, and the
good/bad split reading the source once."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sales_data_warehouse_spark.sources.jsonl import read_jsonl, write_jsonl


def test_corrupt_records_route_to_bad(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello"}\n'
        "this is not json\n"
        '{"doc_id": 2, "text": "world"}\n'
        '{"doc_id": "not-an-int", "text": "bad type"}\n'
        # a JSON literal null parses SUCCESSFULLY to a NULL struct (the
        # corrupt column stays NULL) — it must route bad, not emit an
        # all-NULL good row
        "null\n"
    )
    good, bad, src = read_jsonl(spark, str(p), "doc_id BIGINT, text STRING")
    assert sorted(map(tuple, good.collect())) == [
        (1, "hello"),
        (2, "world"),
    ]
    bad_rows = [r.raw for r in bad.collect()]
    assert len(bad_rows) == 3
    assert "this is not json" in bad_rows
    assert "null" in bad_rows
    src.unpersist()


def test_roundtrip_documents(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs.select("doc_id", "text"), out)
    assert any(f.endswith(".json") for f in os.listdir(out))
    good, bad, src = read_jsonl(spark, out, "doc_id BIGINT, text STRING")
    assert bad.count() == 0
    orig = docs.select("doc_id", "text")
    assert good.count() == orig.count()
    assert (
        good.exceptAll(orig).count() == 0
        and orig.exceptAll(good).count() == 0
    )
    src.unpersist()


def test_empty_and_null_fields(spark, tmp_path):
    p = tmp_path / "nulls.jsonl"
    p.write_text(
        '{"doc_id": 1}\n'
        '{"doc_id": 2, "text": null}\n'
        '{"doc_id": 3, "text": ""}\n'
    )
    reader = read_jsonl(spark, str(p), "doc_id BIGINT, text STRING")
    good, bad = reader.good, reader.bad
    assert bad.count() == 0
    vals = {r.doc_id: r.text for r in good.collect()}
    assert vals == {1: None, 2: None, 3: ""}
    reader.unpersist()
