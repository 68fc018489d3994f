"""Chunking / packing / PII-scrub invariants beyond the oracle parity:
reconstruction (chunks cover every token), packing conservation (offsets
tile each shard's tape exactly), and real redactions on synthetic PII.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sales_data_warehouse_spark.operators import chunking

SF_DIR = "/root/testdata/sf0.001"


def test_chunks_cover_every_token(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ch = chunking.chunk_documents(docs, chunk_tokens=64, overlap=16)
    # stride 48: consecutive starts differ by 48; with 64-token chunks
    # every token index < n falls inside at least one [start, start+64)
    per_doc = ch.groupBy("doc_id").agg(
        F.min("start_tok").alias("first"),
        F.max(F.col("start_tok") + F.col("n_tokens")).alias("covered_to"),
        F.max("start_tok").alias("last_start"),
        F.count(F.lit(1)).alias("n_chunks"),
    )
    n_tok = docs.select(
        "doc_id",
        F.size(F.split(F.lower("text"), r"\s+")).alias("n"),
    )
    j = per_doc.join(n_tok, "doc_id")
    bad = j.filter(
        (F.col("first") != 0)
        | (F.col("covered_to") < F.col("n"))
        | (F.col("last_start") >= F.col("n"))
    )
    assert bad.count() == 0
    assert ch.filter(F.col("n_tokens") > 64).count() == 0


def test_chunk_text_roundtrip(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x")], ["doc_id", "text"]
    )
    rows = sorted(
        map(
            tuple,
            chunking.chunk_documents(docs, chunk_tokens=4, overlap=2)
            .select("doc_id", "chunk_idx", "start_tok", "chunk_text")
            .collect(),
        )
    )
    assert rows == [
        (1, 0, 0, "a b c d"),
        (1, 1, 2, "c d e f"),
        (1, 2, 4, "e f g"),
        (1, 3, 6, "g"),
        (2, 0, 0, "x"),
    ]


def test_packing_tiles_each_shard(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    p = chunking.pack_sequences(docs, budget=512, shards=16)
    # each doc's start_offset equals the sum of earlier docs' tokens in
    # its shard: offsets + lengths tile the tape with no gaps/overlaps
    w_check = p.groupBy("shard").agg(
        F.sum("n_tokens").alias("total"),
        F.max(F.col("start_offset") + F.col("n_tokens")).alias("end"),
    )
    assert w_check.filter(F.col("total") != F.col("end")).count() == 0
    # seq ids consistent with offsets
    bad = p.filter(
        (F.col("first_seq") != F.floor(F.col("start_offset") / 512))
        | (
            F.col("last_seq")
            != F.floor((F.col("start_offset") + F.col("n_tokens") - 1) / 512)
        )
    )
    assert bad.count() == 0


def test_scrub_redacts_synthetic_pii(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail me at alice.smith+x@example.co.uk or call 555-123-4567"),
            (2, "ssn 123-45-6789 and another 987-65-4321"),
            (3, "nothing sensitive here"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in chunking.scrub_pii(docs).collect()}
    assert out[1].n_emails == 1 and out[1].n_phones == 1
    assert "[EMAIL]" in out[1].clean_text
    assert "[PHONE]" in out[1].clean_text
    assert "alice" not in out[1].clean_text
    assert out[2].n_ssns == 2 and "[SSN]" in out[2].clean_text
    assert "123-45-6789" not in out[2].clean_text
    assert out[3].clean_text == "nothing sensitive here"
    assert out[3].n_redactions == 0
