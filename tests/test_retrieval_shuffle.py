"""Unit tests for bm25_topk, epoch_shuffle, quality_logit."""

from __future__ import annotations

from pyspark.sql import functions as F

from sales_data_warehouse_spark.operators.sampling import epoch_shuffle
from sales_data_warehouse_spark.operators.text import bm25_topk, quality_logit


def _docs(spark):
    rows = [
        (1, "spark spark spark window"),          # heavy on 'spark'
        (2, "window hash join the of"),           # one of each
        (3, "the and of to in is for"),           # stopwords only
        (4, "hash"),                              # short, rare term
        (5, "spark window hash spark window"),    # all three terms
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_bm25_exact_ranks_all_terms_doc_first(spark):
    got = bm25_topk(_docs(spark), ["spark", "window", "hash"], k=5).collect()
    assert [r["rank"] for r in got] == list(range(1, len(got) + 1))
    by_id = {r["doc_id"]: r for r in got}
    assert 3 not in by_id  # no query term -> no row
    assert by_id[5]["n_terms_hit"] == 3
    # scores strictly ordered by rank (ties broken by doc_id)
    scores = [r["score_ppm"] for r in got]
    assert scores == sorted(scores, reverse=True)


def test_bm25_double_mode_same_docs(spark):
    exact = bm25_topk(_docs(spark), ["spark", "window", "hash"], k=5)
    dbl = bm25_topk(
        _docs(spark), ["spark", "window", "hash"], k=5, exact_ppm=False
    )
    assert {r["doc_id"] for r in exact.collect()} == {
        r["doc_id"] for r in dbl.collect()
    }
    # double mode carries a real ln-idf score
    top = dbl.orderBy("rank").first()
    assert top["score"] > 0


def test_epoch_shuffle_is_a_permutation(spark):
    docs = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    out = epoch_shuffle(docs, epoch=1, n_shards=8)
    rows = out.collect()
    assert sorted(r["doc_id"] for r in rows) == list(range(1000))
    # contiguous 1..n positions within every shard
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos_in_shard"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard


def test_epoch_shuffle_epochs_differ(spark):
    docs = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    e1 = {
        (r["shard"], r["pos_in_shard"]): r["doc_id"]
        for r in epoch_shuffle(docs, epoch=1).collect()
    }
    e2 = {
        (r["shard"], r["pos_in_shard"]): r["doc_id"]
        for r in epoch_shuffle(docs, epoch=2).collect()
    }
    # different epochs produce a different assignment for most slots
    common = set(e1) & set(e2)
    moved = sum(1 for k in common if e1[k] != e2[k])
    assert moved > len(common) * 0.5


def test_epoch_shuffle_deterministic_across_partitionings(spark):
    docs = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    a = sorted(map(tuple, epoch_shuffle(docs, 3).collect()))
    b = sorted(
        map(tuple, epoch_shuffle(docs.repartition(13), 3).collect())
    )
    assert a == b


def test_quality_logit_monotone_in_stopwords(spark):
    rows = [
        (1, "the and of to in is for the and of"),  # stopword-rich
        (2, "xxxx yyyy zzzz !!!! ???? ....;;;;"),   # punct-heavy junk
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in quality_logit(df).collect()}
    assert got[1]["logit_milli"] > got[2]["logit_milli"]
    assert got[1]["stop_ppm"] > got[2]["stop_ppm"]
    assert got[2]["punct_ppm"] > got[1]["punct_ppm"]
