"""binaryFile ingest: whole-file rows, glob pruning at the listing, and
compatibility with the multimodal decode plumbing."""

from __future__ import annotations

import os

from sales_data_warehouse_spark.operators.multimodal import decode_batch
from sales_data_warehouse_spark.sources.binary_files import (
    ingest_binary_payloads,
    read_binary_files,
)


def _write_files(root):
    files = {
        "a.png": b"\x89PNG fake image bytes",
        "b.jpg": b"\xff\xd8 fake jpeg",
        "notes.txt": b"not media",
        "sub/c.png": b"\x89PNG nested",
    }
    for rel, payload in files.items():
        p = os.path.join(root, rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as fh:
            fh.write(payload)
    return files


def test_read_binary_files_glob_prunes_listing(spark, tmp_path):
    files = _write_files(str(tmp_path))
    got = read_binary_files(spark, str(tmp_path), glob="*.png")
    rows = {os.path.basename(r.path): r for r in got.collect()}
    assert set(rows) == {"a.png"}  # top level only without recursive
    assert rows["a.png"].length == len(files["a.png"])
    assert bytes(rows["a.png"].content) == files["a.png"]

    rec = read_binary_files(
        spark, str(tmp_path), glob="*.png", recursive=True
    )
    assert {os.path.basename(r.path) for r in rec.collect()} == {
        "a.png", "c.png",
    }


def test_ingest_payloads_feed_the_multimodal_decoder(spark, tmp_path):
    files = _write_files(str(tmp_path))
    media = ingest_binary_payloads(spark, str(tmp_path), recursive=True)
    rows = {r.meta.source_path.split("/")[-1]: r for r in media.collect()}
    assert set(rows) == set(os.path.basename(f) for f in files)
    assert rows["a.png"].meta.content_type == "image/png"
    assert rows["b.jpg"].meta.content_type == "image/jpeg"
    assert rows["notes.txt"].meta.content_type == "application/octet-stream"
    assert rows["a.png"].meta.n_bytes == len(files["a.png"])
    # deterministic, re-ingest-stable ids
    again = {
        r.meta.source_path.split("/")[-1]: r.doc_id
        for r in ingest_binary_payloads(
            spark, str(tmp_path), recursive=True
        ).collect()
    }
    assert {k: r.doc_id for k, r in rows.items()} == again

    # the payload table drops straight into the decode stage
    decoded = decode_batch(media.select("doc_id", "payload", "meta"))
    out = {r.doc_id: r for r in decoded.collect()}
    assert set(out) == {r.doc_id for r in rows.values()}
    assert all(r.n_bytes > 0 for r in out.values())
