"""Context-window preparation for LLM training data: chunking, sequence
packing, and PII scrubbing over the ``documents`` table.

All three are single-pass, shuffle-light column transformations:
  * ``chunk_documents`` — overlapping fixed-size token windows per doc;
    one ``posexplode`` over a per-row ``sequence`` of window starts. No
    shuffle at all: chunk rows are produced inside the scan stage.
  * ``pack_sequences`` — GPT-style concat-and-chop packing: documents are
    laid head-to-tail into an infinite token tape (per shard) and the
    tape is cut every ``budget`` tokens; each document reports which
    sequences it lands in. The global cumulative sum runs per shard
    (``doc_id % shards``) so the window is partitioned — the 100 TB
    form; one shard = the textbook single-stream layout.
  * ``scrub_pii`` — regex redaction (emails, phone numbers, SSN-shaped
    ids) as built-in ``regexp_replace`` columns; count of redactions per
    doc rides along for corpus-quality audits.

Everything is engine-reproducible (no hashing, no randomness), so each
operator carries an exact DuckDB oracle in the query corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sales_data_warehouse_spark.operators.text import tokens


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into overlapping token windows.

    Output: (doc_id, chunk_idx, start_tok, n_tokens, chunk_text) — one
    row per window, windows starting every ``chunk_tokens - overlap``
    tokens, last window ragged. Documents shorter than one stride still
    emit their single (possibly short) window.

    Plan: tokens are materialized once per row, window starts come from
    ``sequence(0, n-1, stride)``, and ``posexplode`` + ``slice`` build
    the chunks inside the scan's codegen stage — no shuffle, no UDF;
    at 100 TB this is a flat map over the corpus.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.lower(F.col(text_col))).alias("toks"),
    )
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size("toks") - 1, F.lit(0)),
        F.lit(stride),
    )
    ch = toks.select(
        "doc_id",
        "toks",
        F.posexplode(starts).alias("chunk_idx", "start_tok"),
    )
    piece = F.slice(F.col("toks"), F.col("start_tok") + 1, chunk_tokens)
    return ch.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.col("start_tok").cast("bigint").alias("start_tok"),
        F.size(piece).cast("bigint").alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 512,
    shards: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Concat-and-chop sequence packing: per shard, documents are
    concatenated in ``doc_id`` order onto a token tape cut every
    ``budget`` tokens.

    Output per document: (shard, doc_id, n_tokens, start_offset,
    first_seq, last_seq) — ``start_offset`` is the document's position
    on its shard's tape, ``first_seq``/``last_seq`` the chopped
    training sequences it spans (a document can straddle a cut; that is
    the standard GPT-style packing semantics — no padding, no
    fragmentation loss).

    Scale shape: ONE window function, partitioned by ``shard`` — each
    shard's cumulative sum is an independent, distributable task. One
    shard reproduces the textbook single-stream layout; at 100 TB you
    run thousands of shards and each becomes one training-data stream.
    """
    from pyspark.sql import Window

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens(F.lower(F.col(text_col)))).cast("bigint").alias(
            "n_tokens"
        ),
    ).withColumn("shard", (F.col("doc_id") % shards).cast("bigint"))
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return base.select(
        "shard",
        "doc_id",
        "n_tokens",
        off.alias("start_offset"),
        F.floor(off / budget).cast("bigint").alias("first_seq"),
        F.floor((off + F.col("n_tokens") - 1) / budget)
        .cast("bigint")
        .alias("last_seq"),
    )


#: Redaction patterns — deliberately RE2-safe (no backrefs/lookaround) so
#: the same pattern strings run identically under Java regex (Spark) and
#: RE2 (DuckDB).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?\d{3}[-. ]\d{3}[-. ]\d{4}",
    "ssn": r"\d{3}-\d{2}-\d{4}",
}


def scrub_pii(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Redact PII-shaped substrings, one ``regexp_replace`` per pattern
    (applied in the fixed order of ``PII_PATTERNS``), each replaced with
    ``[<KIND>]``.

    Output: (doc_id, clean_text, n_emails, n_phones, n_ssns,
    n_redactions). Counts come from ``regexp_extract_all`` on the text
    as seen by that pattern (after earlier replacements), mirroring the
    replacement order. Pure codegen string expressions — a flat map at
    any scale."""
    cleaned: Column = F.col(text_col)
    counts = []
    for kind, pat in PII_PATTERNS.items():
        counts.append(
            F.size(F.regexp_extract_all(cleaned, F.lit(pat), F.lit(0)))
            .cast("bigint")
            .alias(f"n_{kind}s")
        )
        cleaned = F.regexp_replace(cleaned, pat, f"[{kind.upper()}]")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        cleaned.alias("clean_text"),
        *counts,
    ).withColumn(
        "n_redactions",
        sum(F.col(f"n_{k}s") for k in PII_PATTERNS).cast("bigint"),
    )
