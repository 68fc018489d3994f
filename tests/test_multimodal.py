"""Unit tests for the multimodal binary-column pipeline (stubbed codecs,
real Spark plumbing). The decode/frame/feature stages are also parity-
checked against DuckDB oracles in test_oracle_parity; resize emits
binary, so its invariants are asserted here instead."""

from __future__ import annotations

from sales_data_warehouse_spark.operators.multimodal import (
    attach_binary_payload,
    resize_batch,
)

SF_DIR = "/root/testdata/sf0.001"


def test_resize_batch_clamps_to_target_box(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    media = attach_binary_payload(docs)
    out = resize_batch(media, target_w=224, target_h=224)
    assert out.columns == ["doc_id", "payload", "out_w", "out_h"]
    rows = out.collect()
    assert len(rows) == docs.count()
    for r in rows:
        assert r["out_w"] <= 224 and r["out_h"] <= 224
        assert isinstance(r["payload"], (bytes, bytearray))


def test_attach_binary_payload_schema(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    media = attach_binary_payload(docs)
    fields = dict(media.dtypes)
    assert fields["payload"] == "binary"
    assert fields["meta"].startswith("struct<content_type:string")
