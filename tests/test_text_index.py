"""Persisted BM25 index: the build/search split must rank identically
to the one-shot ``bm25_topk`` (shared scoring tail), survive a
save/load roundtrip, and prune the postings scan to the query terms'
hash buckets."""

from __future__ import annotations

import pytest

from sales_data_warehouse_spark.operators.text import (
    bm25_search,
    bm25_topk,
    build_text_index,
    load_text_index,
    save_text_index,
)

TERMS = ["fast", "vector", "merge"]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).persist()


@pytest.fixture(scope="module")
def index(docs):
    return build_text_index(docs)


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_index_search_matches_one_shot(spark, docs, index):
    want = _rows(bm25_topk(docs, TERMS, k=10))
    got = _rows(bm25_search(index, TERMS, k=10))
    assert got == want and len(got) == 10


def test_double_mode_matches_too(spark, docs, index):
    want = _rows(bm25_topk(docs, TERMS, k=5, exact_ppm=False))
    got = _rows(bm25_search(index, TERMS, k=5, exact_ppm=False))
    assert got == want


def test_save_load_roundtrip_and_pruning(spark, docs, index, tmp_path):
    path = str(tmp_path / "bm25_index")
    save_text_index(index, path)
    reopened = load_text_index(spark, path)
    assert reopened.n_docs == index.n_docs
    assert reopened.t_tokens == index.t_tokens
    want = _rows(bm25_topk(docs, TERMS, k=10))
    assert _rows(bm25_search(reopened, TERMS, k=10)) == want
    # the postings scan must carry a pbucket partition filter so a
    # saved index reads <= |terms| of the 64 bucket directories
    plan = (
        bm25_search(reopened, TERMS, k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "pbucket" in plan


def test_stats_match_corpus(docs, index):
    assert index.n_docs == docs.count()


def test_rrf_fuse_prefers_docs_in_both_lists(spark):
    from sales_data_warehouse_spark.operators.text import rrf_fuse

    r1 = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, rank long"
    )
    r2 = spark.createDataFrame(
        [(3, 1), (4, 2), (5, 3)], "doc_id long, rank long"
    )
    out = {r["doc_id"]: r for r in rrf_fuse([r1, r2], k=60).collect()}
    # doc 3 appears in both lists: 1e6//63 + 1e6//61 beats any single
    assert out[3]["fused_rank"] == 1
    assert out[3]["n_lists"] == 2
    assert out[3]["rrf_ppm"] == 1_000_000 // 63 + 1_000_000 // 61
    # rank-1 singles beat rank-2 singles
    assert out[1]["rrf_ppm"] == 1_000_000 // 61
    assert out[4]["rrf_ppm"] == 1_000_000 // 62
    assert out[1]["fused_rank"] < out[4]["fused_rank"]
    top2 = rrf_fuse([r1, r2], k=60, top=2)
    assert top2.count() == 2


def test_rrf_fuse_duplicate_ids_within_a_list_count_once(spark):
    from sales_data_warehouse_spark.operators.text import rrf_fuse

    dup = spark.createDataFrame(
        [(1, 1), (1, 5), (2, 2)], "doc_id long, rank long"
    )
    out = {r["doc_id"]: r for r in rrf_fuse([dup], k=60).collect()}
    # doc 1 contributes once, at its best rank
    assert out[1]["n_lists"] == 1
    assert out[1]["rrf_ppm"] == 1_000_000 // 61


def test_rrf_fuse_empty_input_raises(spark):
    import pytest as _pytest

    from sales_data_warehouse_spark.operators.text import rrf_fuse

    with _pytest.raises(ValueError, match="at least one ranking"):
        rrf_fuse([])


def test_resave_reopened_index_to_same_path(spark, docs, index, tmp_path):
    """A reopened index's postings are a lazy scan of the destination;
    the staged write must not delete the files its own plan reads
    (the save_importance_model hazard — fixed for text/phrase indexes
    in r12)."""
    path = str(tmp_path / "same")
    save_text_index(index, path)
    reopened = load_text_index(spark, path)
    save_text_index(reopened, path)
    again = load_text_index(spark, path)
    want = _rows(bm25_topk(docs, TERMS, k=10))
    assert _rows(bm25_search(again, TERMS, k=10)) == want
