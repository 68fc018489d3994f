"""Nasty-string edge cases across the text-processing operators: empty
text, whitespace runs, tabs/newlines, unicode, and single-token docs
must not crash or violate the operators' structural invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from sales_data_warehouse_spark.operators import chunking, dedup, text

NASTY = [
    (1, ""),
    (2, " "),
    (3, "   \t  \n  "),
    (4, "one"),
    (5, "two words"),
    (6, "tabs\tbetween\ttokens and\nnewlines too"),
    (7, "unicode: café naïve 你好 \U0001f600 end"),
    (8, "a " * 500 + "a"),  # long repetitive doc
    (9, "x y z " * 3),      # repeated shingles within one doc
]


def _docs(spark):
    return spark.createDataFrame(NASTY, ["doc_id", "text"])


def test_chunking_handles_nasty(spark):
    ch = chunking.chunk_documents(_docs(spark), chunk_tokens=8, overlap=2)
    rows = ch.collect()
    assert {r.doc_id for r in rows} == {d for d, _ in NASTY}
    assert all(0 < r.n_tokens <= 8 for r in rows)
    assert all(r.start_tok % 6 == 0 for r in rows)


def test_packing_handles_nasty(spark):
    p = chunking.pack_sequences(_docs(spark), budget=16, shards=2)
    rows = p.collect()
    assert len(rows) == len(NASTY)
    assert all(r.n_tokens >= 1 for r in rows)  # split("") -> [""]
    assert all(r.first_seq <= r.last_seq for r in rows)


def test_winnowing_handles_nasty(spark):
    fp = text.winnowing_fingerprints(_docs(spark))
    produced = {r.doc for r in fp.collect()}
    assert produced <= {d for d, _ in NASTY}
    # docs with >= 5 whitespace tokens must produce 5-gram fingerprints
    assert 6 in produced and 7 in produced and 8 in produced
    # a 1-token doc cannot
    assert 4 not in produced


def test_shingles_and_dedup_handle_nasty(spark):
    pairs = dedup.ngram_jaccard_pairs(_docs(spark), threshold=0.01)
    rows = pairs.collect()
    assert all(r.doc_a < r.doc_b for r in rows)
    # exact dedup runs over everything incl. empty strings
    fp = dedup.exact_duplicates(_docs(spark))
    assert fp.count() == len(NASTY)  # all texts distinct here


def test_quality_and_langid_handle_nasty(spark):
    q = text.text_quality(_docs(spark))
    assert q.count() == len(NASTY)
    lid = text.language_id(_docs(spark))
    assert lid.filter(F.col("lang_guess").isNull()).count() == 0


def test_scrub_handles_nasty(spark):
    out = chunking.scrub_pii(_docs(spark))
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].clean_text == ""
    assert rows[7].n_redactions == 0
    assert "你好" in rows[7].clean_text

def test_repetition_stats_handles_short_docs(spark):
    # Docs with fewer than n tokens used to abort the whole query:
    # F.sequence(0, size-n) steps backwards when the stop is negative and
    # element_at(w, 0) raises INVALID_INDEX_OF_ZERO. Guarded now.
    out = {
        r.doc_id: r for r in text.repetition_stats(_docs(spark)).collect()
    }
    assert set(out) == {d for d, _ in NASTY}
    one, two = out[4], out[5]
    assert one.n_tokens == 1 and one.dup_2gram_frac == 0.0
    assert one.dup_3gram_frac == 0.0 and one.distinct_ratio == 1.0
    assert two.n_tokens == 2 and two.dup_3gram_frac == 0.0
    assert two.dup_2gram_frac == 0.0  # 1 distinct 2-gram of 1
