"""Document-frequency cap on the n-gram Jaccard inverted index: a hot
shingle shared by k docs must not contribute k^2 candidate pairs, and the
capped score must be the true Jaccard of the capped shingle sets.
"""

from __future__ import annotations

import pytest

from sales_data_warehouse_spark.operators import dedup


@pytest.fixture(scope="module")
def hot_docs(spark):
    # Every doc contains the same hot 3-gram ("common shared phrase")
    # exactly once; everything else is unique filler, so the ONLY
    # co-occurring shingle across docs is the hot one.
    rows = [
        (i, f"common shared phrase u{i}a u{i}b u{i}c u{i}d u{i}e")
        for i in range(40)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_uncapped_hot_shingle_goes_quadratic(spark, hot_docs):
    """Baseline behavior the cap exists to stop: with no cap, the hot
    shingle alone manufactures a pair for every doc combination."""
    pairs = dedup.ngram_jaccard_pairs(hot_docs, threshold=0.0001)
    assert pairs.count() == 40 * 39 // 2


def test_cap_kills_hot_shingle_pairs(spark, hot_docs):
    """With max_df below the hot shingle's document frequency, no pair
    shares any surviving shingle -> empty output, not k^2 rows."""
    pairs = dedup.ngram_jaccard_pairs(hot_docs, threshold=0.0001, max_df=10)
    assert pairs.count() == 0


def test_capped_jaccard_is_exact_over_capped_sets(spark):
    """Two docs: 'a b c d' and 'a b c e' share shingles {'a b c'} of the
    full sets {'a b c','b c d'} / {'a b c','b c e'} -> J = 1/3. Add 30
    decoys all containing 'a b c' so its df exceeds the cap: post-cap the
    two docs share nothing; pre-cap decoy pairs flood in."""
    rows = [(1, "a b c d"), (2, "a b c e")] + [
        (100 + i, f"a b c z{i}") for i in range(30)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    uncapped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.0001).collect()
    }
    assert uncapped[(1, 2)] == pytest.approx(1 / 3, abs=1e-6)
    assert len(uncapped) == 32 * 31 // 2  # every pair shares 'a b c'

    capped = dedup.ngram_jaccard_pairs(
        docs, threshold=0.0001, max_df=5
    ).collect()
    assert capped == []


def test_cap_noop_when_df_below_threshold(spark):
    """A cap above every shingle's df must not change anything."""
    rows = [(1, "x y z w"), (2, "x y z q"), (3, "p q r s")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    base = sorted(
        map(tuple, dedup.ngram_jaccard_pairs(docs, threshold=0.01).collect())
    )
    capped = sorted(
        map(
            tuple,
            dedup.ngram_jaccard_pairs(
                docs, threshold=0.01, max_df=100
            ).collect(),
        )
    )
    assert base == capped and base


def test_source_overlap_matrix_containment(spark):
    from sales_data_warehouse_spark.operators.dedup import (
        source_overlap_matrix,
    )

    docs = spark.createDataFrame(
        [
            (1, "a", "x y z w"),      # shingles: {x y z, y z w}
            (2, "b", "x y z"),        # {x y z}
            (3, "c", "p q r"),        # {p q r} — no overlap
        ],
        "doc_id int, source string, text string",
    )
    got = {
        (r.src_a, r.src_b): (r.n_shingles_a, r.n_common, r.containment)
        for r in source_overlap_matrix(docs).collect()
    }
    # only pairs with >= 1 common shingle appear
    assert set(got) == {("a", "b"), ("b", "a")}
    assert got[("a", "b")] == (2, 1, 0.5)
    assert got[("b", "a")] == (1, 1, 1.0)


def test_incremental_exact_dedup_across_batches(spark):
    from sales_data_warehouse_spark.operators.dedup import (
        incremental_exact_dedup,
    )

    b1 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")],  # 3 dups 1 in-batch
        "doc_id int, text string",
    )
    fresh1, state1 = incremental_exact_dedup(b1, None)
    assert sorted(r.doc_id for r in fresh1.collect()) == [1, 2]
    assert state1.count() == 2

    b2 = spark.createDataFrame(
        [(4, "beta"), (5, "gamma"), (6, "gamma"), (7, "alpha")],
        "doc_id int, text string",
    )
    fresh2, state2 = incremental_exact_dedup(b2, state1)
    # beta/alpha seen in batch 1; gamma admitted once (canonical min id)
    assert sorted(r.doc_id for r in fresh2.collect()) == [5]
    assert state2.count() == 3
    # a third batch of all-seen texts admits nothing
    b3 = spark.createDataFrame(
        [(8, "alpha"), (9, "gamma")], "doc_id int, text string"
    )
    fresh3, state3 = incremental_exact_dedup(b3, state2)
    assert fresh3.count() == 0 and state3.count() == 3
