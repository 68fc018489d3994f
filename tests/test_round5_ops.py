"""Round-5 operator semantics: MERGE-style upsert (incl. the
version_col reduction), containment pairs (exact rational threshold
boundary + subset-vs-Jaccard contrast), bigram surprisal edge cases,
and the per-group duplicate-ratio report."""

from __future__ import annotations

from pyspark.sql import functions as F

from sales_data_warehouse_spark.operators.dedup import (
    containment_pairs,
    duplicate_ratio_by_group,
    ngram_jaccard_pairs,
)
from sales_data_warehouse_spark.operators.text import bigram_surprisal
from sales_data_warehouse_spark.operators.upsert import apply_changes


# ---------------------------------------------------------------------------
# apply_changes (MERGE semantics)
# ---------------------------------------------------------------------------

def _snapshot(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "k long, name string, v long",
    )


def test_upsert_insert_update_delete(spark):
    changes = spark.createDataFrame(
        [
            (2, "b2", 22, "U"),   # update
            (3, "c", 30, "D"),    # delete
            (4, "d", 40, "I"),    # insert
        ],
        "k long, name string, v long, op string",
    )
    out = apply_changes(_snapshot(spark), changes, keys=["k"])
    rows = {r.k: (r.name, r.v) for r in out.collect()}
    assert rows == {1: ("a", 10), 2: ("b2", 22), 4: ("d", 40)}
    assert "op" not in out.columns


def test_upsert_empty_batch_is_identity(spark):
    changes = spark.createDataFrame(
        [], "k long, name string, v long, op string"
    )
    out = apply_changes(_snapshot(spark), changes, keys=["k"])
    assert sorted(r.k for r in out.collect()) == [1, 2, 3]


def test_upsert_version_col_keeps_latest_per_key(spark):
    # key 2: v5 update beats v3 update; key 3: equal-version
    # delete-vs-update prefers the delete (documented tie-break)
    changes = spark.createDataFrame(
        [
            (2, "old", 0, "U", 3),
            (2, "new", 99, "U", 5),
            (3, "zzz", 1, "U", 7),
            (3, "c", 30, "D", 7),
        ],
        "k long, name string, v long, op string, ver long",
    )
    out = apply_changes(
        _snapshot(spark), changes, keys=["k"], version_col="ver"
    )
    rows = {r.k: (r.name, r.v) for r in out.collect()}
    assert rows == {1: ("a", 10), 2: ("new", 99)}


def test_upsert_delete_then_higher_version_reinsert(spark):
    changes = spark.createDataFrame(
        [(1, "a", 10, "D", 1), (1, "a9", 9, "U", 2)],
        "k long, name string, v long, op string, ver long",
    )
    out = apply_changes(
        _snapshot(spark), changes, keys=["k"], version_col="ver"
    )
    rows = {r.k: (r.name, r.v) for r in out.collect()}
    assert rows[1] == ("a9", 9)


# ---------------------------------------------------------------------------
# containment_pairs
# ---------------------------------------------------------------------------

def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_containment_catches_subset_jaccard_misses(spark):
    # doc 2 = the first 6 tokens of doc 1's 40: containment of the
    # short doc is 1.0 while Jaccard is far below any useful threshold
    long_text = " ".join(f"w{i}" for i in range(40))
    short_text = " ".join(f"w{i}" for i in range(6))
    docs = _docs(spark, [(1, long_text), (2, short_text)])
    cont = containment_pairs(docs, threshold_num=9, threshold_den=10)
    rows = cont.collect()
    assert len(rows) == 1 and rows[0].containment == 1.0
    jac = ngram_jaccard_pairs(docs, threshold=0.3)
    assert jac.count() == 0


def test_containment_exact_rational_boundary(spark):
    # |A| = 4 shingles (6 tokens), overlap = exactly 2 -> containment
    # exactly 1/2: the integer compare keeps it at num/den = 1/2 and
    # drops it at the next-tighter rational 51/100
    a = "w0 w1 w2 w3 w4 w5"
    b = "w0 w1 w2 w3 x0 x1 x2 x3 x4 x5"  # shares shingles w0w1w2, w1w2w3
    docs = _docs(spark, [(1, a), (2, b)])
    keep = containment_pairs(docs, threshold_num=1, threshold_den=2)
    assert keep.count() == 1
    drop = containment_pairs(docs, threshold_num=51, threshold_den=100)
    assert drop.count() == 0


def test_containment_max_df_caps_hot_shingles(spark):
    # a stop-phrase shingle present in every doc is dropped by the cap;
    # the remaining universes share nothing -> no pairs
    docs = _docs(
        spark,
        [
            (1, "the same stop phrase a1 a2 a3"),
            (2, "the same stop phrase b1 b2 b3"),
            (3, "the same stop phrase c1 c2 c3"),
        ],
    )
    # each doc has 5 shingles, 2 of them ("the same stop", "same stop
    # phrase") shared by all three docs: containment 2/5 per pair
    uncapped = containment_pairs(docs, threshold_num=1, threshold_den=3)
    assert uncapped.count() == 3  # stop shingles dominate every pair
    capped = containment_pairs(
        docs, threshold_num=1, threshold_den=3, max_df=2
    )
    assert capped.count() == 0


# ---------------------------------------------------------------------------
# bigram_surprisal
# ---------------------------------------------------------------------------

def test_bigram_surprisal_counts_and_scores(spark):
    # "a b" occurs 3x corpus-wide (2x in doc 1, 1x in doc 2);
    # floor(log2(3)) = 1; "b a" occurs 1x -> 0 bits
    docs = _docs(spark, [(1, "a b a b"), (2, "a b")])
    out = {r.doc_id: r for r in bigram_surprisal(docs).collect()}
    assert out[1].n_bigrams == 3  # a-b, b-a, a-b
    assert out[1].sum_log2_freq == 2  # 1 + 0 + 1
    assert out[2].n_bigrams == 1 and out[2].sum_log2_freq == 1
    assert out[2].avg_log2_freq == 1.0


def test_bigram_surprisal_short_docs_drop_out(spark):
    docs = _docs(spark, [(1, "solo"), (2, ""), (3, "two tokens")])
    out = bigram_surprisal(docs)
    assert [r.doc_id for r in out.collect()] == [3]


# ---------------------------------------------------------------------------
# duplicate_ratio_by_group
# ---------------------------------------------------------------------------

def test_duplicate_ratio_counts_global_copies_per_group(spark):
    docs = spark.createDataFrame(
        [
            (1, "dup text", "s1"),
            (2, "dup text", "s2"),   # copy lives in ANOTHER source
            (3, "unique a", "s1"),
            (4, "unique b", "s2"),
            (5, "unique b", "s2"),   # within-source copy
        ],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in duplicate_ratio_by_group(docs).collect()}
    # s1's "dup text" counts as dup even though its twin is in s2
    assert out["s1"].n_docs == 2 and out["s1"].n_dup_docs == 1
    assert out["s1"].n_distinct_texts == 2
    assert out["s1"].dup_permille == 500
    assert out["s2"].n_docs == 3 and out["s2"].n_dup_docs == 3
    assert out["s2"].n_distinct_texts == 2
    assert out["s2"].dup_permille == 1000
