"""Incremental MinHash-LSH: batch-over-batch processing must reproduce
the full-corpus run exactly (the operator's core contract), state must
stay bands-rows-per-doc, and cross-batch duplicates must surface in the
batch where the LATER copy arrives.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sales_data_warehouse_spark.operators import dedup


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        "the quick brown fox jumps over the lazy dog tonight",
        "pack my box with five dozen liquor jugs right now",
        "sphinx of black quartz judge my vow before sundown",
        "how vexingly quick daft zebras jump over fences",
    ]
    rows = []
    for i in range(40):
        text = base[i % 4]
        if i >= 20:  # near-dup of an earlier doc: one word changed
            text = text.replace("the", "a").replace("my", "our")
        rows.append((i, f"{text} tail{i % 2}"))
    return spark.createDataFrame(rows, ["doc_id", "text"]).persist()


def _pairs_set(df):
    return {
        (r["doc_a"], r["doc_b"], r["est_jaccard"]) for r in df.collect()
    }


def test_incremental_equals_full(spark, docs):
    full = _pairs_set(dedup.minhash_lsh_pairs(docs))
    state = None
    got = set()
    for b in range(3):
        pairs, state = dedup.incremental_minhash_lsh(
            docs.filter(F.col("doc_id") % 3 == b), state
        )
        batch = _pairs_set(pairs)
        assert not (batch & got), "a pair must be emitted exactly once"
        got |= batch
    assert got == full
    assert state.count() == docs.count() * 8  # bands rows per doc


def test_cross_batch_pair_lands_in_second_batch(spark):
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    b1 = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    b2 = spark.createDataFrame([(2, text)], ["doc_id", "text"])
    p1, state = dedup.incremental_minhash_lsh(b1, None)
    assert p1.count() == 0
    p2, state = dedup.incremental_minhash_lsh(b2, state)
    rows = p2.collect()
    assert [(r["doc_a"], r["doc_b"]) for r in rows] == [(1, 2)]
    assert rows[0]["est_jaccard"] == 1.0
    assert state.count() == 2 * 8


def test_single_batch_matches_plain_lsh(spark, docs):
    pairs, _ = dedup.incremental_minhash_lsh(docs, None)
    assert _pairs_set(pairs) == _pairs_set(dedup.minhash_lsh_pairs(docs))
