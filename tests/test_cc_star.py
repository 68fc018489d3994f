"""Large-star/small-star connected components: must agree exactly with
min-label propagation on real near-dup graphs and on adversarial shapes
(long chains — the case propagation is slowest on — stars, and forests).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sales_data_warehouse_spark.operators import dedup, similarity

SF_DIR = "/root/testdata/sf0.01"


def _clusters(df):
    return sorted(map(tuple, df.collect()))


def _pairs_df(spark, pairs):
    return spark.createDataFrame(pairs, ["doc_a", "doc_b"])


def _nodes_df(spark, n):
    return spark.range(0, n).select(F.col("id").alias("doc_id"))


def test_star_matches_propagation_on_embedding_graph(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    pairs = similarity.embedding_near_dup_pairs(emb, threshold=0.35)
    a = dedup.connected_components(
        pairs, emb, "vec_id", pair_a="vec_a", pair_b="vec_b"
    )
    b = dedup.connected_components_star(
        pairs, emb, "vec_id", pair_a="vec_a", pair_b="vec_b"
    )
    assert _clusters(a) == _clusters(b)


def test_star_on_long_chain(spark):
    # 0-1-2-...-99: one component, min 0; diameter 99 but star CC
    # converges in O(log^2 n) rounds.
    pairs = _pairs_df(spark, [(i, i + 1) for i in range(99)])
    out = dedup.connected_components_star(
        pairs, _nodes_df(spark, 100), "doc_id"
    )
    rows = _clusters(out)
    assert rows == [(i, 0) for i in range(100)]


def test_star_on_forest_and_isolated(spark):
    # two components {0..4} and {10..13}, plus isolated nodes 20, 21
    pairs = _pairs_df(
        spark,
        [(0, 1), (1, 2), (3, 4), (2, 3), (10, 11), (12, 13), (11, 12)],
    )
    nodes = spark.createDataFrame(
        [(i,) for i in [0, 1, 2, 3, 4, 10, 11, 12, 13, 20, 21]],
        ["doc_id"],
    )
    out = {r.doc_id: r.cluster_id for r in
           dedup.connected_components_star(pairs, nodes, "doc_id").collect()}
    assert all(out[i] == 0 for i in range(5))
    assert all(out[i] == 10 for i in [10, 11, 12, 13])
    assert out[20] == 20 and out[21] == 21


def test_star_on_star_graph_hub_not_min(spark):
    # hub 50 connected to 0..9 (hub larger than leaves): all collapse to 0
    pairs = _pairs_df(spark, [(50, i) for i in range(10)])
    nodes = spark.createDataFrame(
        [(i,) for i in list(range(10)) + [50]], ["doc_id"]
    )
    out = {r.doc_id: r.cluster_id for r in
           dedup.connected_components_star(pairs, nodes, "doc_id").collect()}
    assert set(out.values()) == {0}


def test_star_raises_on_iteration_exhaustion(spark):
    import pytest as _pytest

    pairs = _pairs_df(spark, [(i, i + 1) for i in range(50)])
    with _pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components_star(
            pairs, _nodes_df(spark, 51), "doc_id", max_iter=1
        )
