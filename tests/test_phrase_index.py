"""Positional phrase index: indexed search must return EXACTLY the
scan-side ``phrase_match`` rows (the oracle is the operator twin),
survive a save/load roundtrip, and prune the persisted postings scan
to the phrase terms' hash buckets."""

from __future__ import annotations

import pytest

from sales_data_warehouse_spark.operators.text import (
    build_phrase_index,
    load_phrase_index,
    phrase_match,
    phrase_search_indexed,
    save_phrase_index,
)

PHRASES = ["table hash", "a a", "big order scan", "group slow spark"]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).persist()


@pytest.fixture(scope="module")
def index(docs):
    return build_phrase_index(docs)


@pytest.mark.parametrize("phrase", PHRASES)
def test_indexed_equals_scan(docs, index, phrase):
    want = {
        (r.doc_id, r.n_matches, r.first_pos)
        for r in phrase_match(docs, phrase).collect()
    }
    got = {
        (r.doc_id, r.n_matches, r.first_pos)
        for r in phrase_search_indexed(index, phrase).collect()
    }
    assert got == want and want, phrase


def test_save_load_roundtrip_and_pruning(spark, docs, index, tmp_path):
    path = str(tmp_path / "pidx")
    save_phrase_index(index, path)
    reopened = load_phrase_index(spark, path)
    want = {
        (r.doc_id, r.n_matches, r.first_pos)
        for r in phrase_match(docs, "table hash").collect()
    }
    got_df = phrase_search_indexed(reopened, "table hash")
    got = {
        (r.doc_id, r.n_matches, r.first_pos) for r in got_df.collect()
    }
    assert got == want
    # the persisted scan must carry pbucket PARTITION filters so a
    # k-term phrase reads <= k of the 64 bucket directories — the
    # column merely APPEARING in the scan output is vacuous (a
    # pruning-free plan still lists it), so pin the PartitionFilters
    # clause itself
    import re

    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^\]]*pbucket", plan), plan[:2000]


def test_empty_phrase_guard(index):
    with pytest.raises(ValueError, match="phrase"):
        phrase_search_indexed(index, [])


def test_save_load_preserves_custom_id_col(spark, tmp_path):
    docs = spark.createDataFrame(
        [(7, "x table hash y")], "my_id bigint, text string"
    )
    idx = build_phrase_index(docs, id_col="my_id")
    path = str(tmp_path / "cid")
    save_phrase_index(idx, path)
    reopened = load_phrase_index(spark, path)
    assert reopened.id_col == "my_id"
    rows = phrase_search_indexed(reopened, "table hash").collect()
    assert [(r.my_id, r.n_matches, r.first_pos) for r in rows] == [(7, 1, 2)]
