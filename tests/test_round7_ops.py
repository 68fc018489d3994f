"""Round-7 changes: uniform release-safe caching for the pair-join
family (no CacheManager pin after an action), the uncapped-pair-join
loud default, and the shingle df profile helper."""

from __future__ import annotations

import warnings

import pytest
from pyspark.sql import functions as F

from sales_data_warehouse_spark.operators import dedup

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_pair_family_releases_cache_with_result(spark):
    """r6 VERDICT defect #1: the five pair-join materialization sites
    must not pin entries in the SQL CacheManager for the application
    lifetime. The policy: the shingle/band/bucket cache stays columnar
    (persist — measured 2.2-2.4x faster to re-read than a local
    checkpoint, and lineage-backed) WHILE the returned DataFrame is
    alive, and is unpersisted when the caller's last reference to the
    result is garbage-collected (weakref release hook). So: non-empty
    is allowed during use; empty is REQUIRED after the result dies."""
    import gc

    spark.catalog.clearCache()
    cm = spark._jsparkSession.sharedState().cacheManager()
    assert cm.isEmpty()
    docs = _docs(spark)
    makers = [
        lambda: dedup.ngram_jaccard_pairs(
            docs, threshold=0.3, warn_uncapped=False
        ),
        lambda: dedup.minhash_lsh_pairs(docs),
        lambda: dedup.simhash_near_pairs(docs, max_hamming=5, blocks=8),
        lambda: dedup.prefix_filtered_jaccard_pairs(
            docs, threshold_num=3, threshold_den=10
        ),
        lambda: dedup.containment_pairs(docs, warn_uncapped=False),
    ]
    for make in makers:
        df = make()
        df.write.format("noop").mode("overwrite").save()
        del df
        gc.collect()  # finalizers run synchronously in CPython
        assert cm.isEmpty(), (
            "pair-join cache survived its result's garbage collection"
        )


def test_semantic_dedup_and_ivf_release_cache_with_result(spark):
    """Same policy on the other two persist users: semantic_dedup's
    guard materialization and the IVF index's assignment cache must be
    released when their results die — and stay lineage-backed while
    alive (no localCheckpoint)."""
    import gc

    from sales_data_warehouse_spark.operators import similarity

    spark.catalog.clearCache()
    cm = spark._jsparkSession.sharedState().cacheManager()
    assert cm.isEmpty()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    out = similarity.semantic_dedup(emb, threshold=0.4, num_centroids=4)
    assert not cm.isEmpty()  # cache alive while the result is
    out.write.format("noop").mode("overwrite").save()
    del out
    gc.collect()
    assert cm.isEmpty(), "semantic_dedup guard cache leaked"

    idx = similarity.build_ivf_index(emb, num_centroids=4)
    idx.assigned.write.format("noop").mode("overwrite").save()
    assert not cm.isEmpty()  # the cache IS the index
    del idx
    gc.collect()
    assert cm.isEmpty(), "IVF assignment cache leaked"


@pytest.mark.parametrize("fn", ["ngram_jaccard_pairs", "containment_pairs"])
def test_uncapped_pair_join_warns_by_default(spark, fn):
    docs = _docs(spark).limit(5)
    with pytest.warns(ResourceWarning, match="max_df is None"):
        getattr(dedup, fn)(docs)


@pytest.mark.parametrize("fn", ["ngram_jaccard_pairs", "containment_pairs"])
def test_capped_or_acknowledged_pair_join_is_silent(spark, fn):
    docs = _docs(spark).limit(5)
    with warnings.catch_warnings():
        warnings.simplefilter("error", ResourceWarning)
        getattr(dedup, fn)(docs, max_df=5)          # capped: silent
        getattr(dedup, fn)(docs, warn_uncapped=False)  # acknowledged


def test_knn_label_vote_majority_and_tiebreak(spark):
    """Constructed geometry: majority label wins; a 2-2 vote tie picks
    the smallest label; the vote composes with a caller-supplied ANN
    frame (the IVF scale path) unchanged."""
    from sales_data_warehouse_spark.operators import similarity

    # 1-D embeddings on a line: neighbors are obvious by distance
    corpus = spark.createDataFrame(
        [
            (10, [1.0, 0.0], 1),
            (11, [0.99, 0.14], 1),
            (12, [0.95, 0.31], 2),
            (13, [0.0, 1.0], 2),
            (14, [0.1, 0.99], 2),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    queries = spark.createDataFrame(
        [(100, [1.0, 0.05]), (200, [0.05, 1.0])],
        "vec_id long, embedding array<float>",
    )
    got = {
        r.query_id: (r.pred_label, r.votes, r.n_neighbors)
        for r in similarity.knn_label_vote(corpus, queries, k=3).collect()
    }
    # q100 nearest 3: ids 10,11 (label 1) + 12 (label 2) -> label 1
    # q200 nearest 3: ids 13,14 (label 2) + 12 (label 2) -> label 2
    assert got == {100: (1, 2, 3), 200: (2, 3, 3)}

    # 2-2 tie -> smallest label; k=4 over a 4-vector corpus
    tie = {
        r.query_id: (r.pred_label, r.votes, r.n_neighbors)
        for r in similarity.knn_label_vote(
            corpus.filter(F.col("vec_id") != 12), queries, k=4
        ).collect()
    }
    assert tie[100] == (1, 2, 4) and tie[200] == (1, 2, 4)

    # caller-supplied neighbor frame (ANN path) is honored verbatim
    nn = spark.createDataFrame(
        [(100, 13), (100, 14), (100, 10)], "query_id long, neighbor_id long"
    )
    via_nn = similarity.knn_label_vote(corpus, queries, nn=nn).collect()
    assert {(r.query_id, r.pred_label) for r in via_nn} == {(100, 2)}


def test_shingle_df_profile_matches_manual_count(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "the quick brown fox sleeps"),
            (3, "the quick brown fox jumps"),
        ],
        "doc_id long, text string",
    )
    prof = dedup.shingle_df_profile(docs, top=2)
    # "the quick brown" and "quick brown fox" appear in all 3 docs;
    # tie-broken by shingle ascending
    assert [(r.shingle, r.df) for r in prof] == [
        ("quick brown fox", 3),
        ("the quick brown", 3),
    ]
