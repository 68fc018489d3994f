"""Round-8 changes (r7 VERDICT/ADVICE): string-safe knn_label_vote
tie-break, semantic_dedup error-path cache release, exact bigint as-of
keys above 2^53, the asof_join_auto routing boundary, and the IVF
cell-size drift monitor."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sales_data_warehouse_spark.operators import asof, similarity

SF_DIR = "/root/testdata/sf0.001"


def test_knn_label_vote_string_labels_tiebreak(spark):
    """r7 ADVICE: the smallest-label tie preference must hold for ANY
    orderable label type — the advertised uses (quality tiers,
    domains) are naturally strings, and the old ``-label`` negation
    cast-failed on them under ANSI mode."""
    corpus = spark.createDataFrame(
        [
            (10, [1.0, 0.0], "web"),
            (11, [0.99, 0.14], "web"),
            (12, [0.95, 0.31], "books"),
            (13, [0.0, 1.0], "books"),
        ],
        "vec_id long, embedding array<float>, label string",
    )
    queries = spark.createDataFrame(
        [(100, [1.0, 0.05])], "vec_id long, embedding array<float>"
    )
    # k=4 over 4 vectors: 2 'web' vs 2 'books' — tie picks the
    # lexicographically smallest label
    got = similarity.knn_label_vote(corpus, queries, k=4).collect()
    assert [(r.pred_label, r.votes, r.n_neighbors) for r in got] == [
        ("books", 2, 4)
    ]
    # clear majority still wins regardless of lexicographic order
    maj = similarity.knn_label_vote(corpus, queries, k=3).collect()
    assert [(r.pred_label, r.votes) for r in maj] == [("web", 2)]


def test_semantic_dedup_oversize_error_releases_cache(spark):
    """r7 ADVICE (medium): the oversize='error' guard path raises
    BEFORE the weakref release hook is attached to a result, so it
    must unpersist the assignment cache itself — otherwise every
    failed call pins the full table in the CacheManager for the
    application lifetime (the exact r6 leak class)."""
    spark.catalog.clearCache()
    cm = spark._jsparkSession.sharedState().cacheManager()
    assert cm.isEmpty()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    with pytest.raises(ValueError, match="exceed max_cell_rows"):
        similarity.semantic_dedup(
            emb, threshold=0.4, num_centroids=4,
            max_cell_rows=1, oversize="error",
        )
    assert cm.isEmpty(), "failed semantic_dedup call pinned its cache"


@pytest.mark.parametrize("engine", ["broadcast", "union"])
def test_asof_bigint_keys_exact_above_2_53(spark, engine):
    """r7 ADVICE: integral as-of keys must stay bigint. 2^53 and
    2^53+1 collapse to the same double, which (a) breaks strict
    (allow_exact_matches=False) comparisons — the same-instant version
    looks non-equal-but-non-less, so NO version matches — and (b) can
    merge distinct timestamps in the union engine's sort."""
    base = 9_007_199_254_740_992  # 2^53
    left = spark.createDataFrame(
        [("k", base + 1)], "grp string, ts long"
    )
    right = spark.createDataFrame(
        [("k", base, "older"), ("k", base + 1, "same_instant")],
        "grp string, ts long, tag string",
    )
    kw = dict(direction="backward", allow_exact_matches=False)
    if engine == "broadcast":
        got = asof.asof_join(
            left, right.withColumnRenamed("ts", "rts"),
            ["grp"], "ts", "rts", **kw,
        ).collect()
    else:
        got = asof.asof_join_grouped(
            left, right.withColumnRenamed("ts", "rts"),
            ["grp"], "ts", "rts", engine="union", **kw,
        ).collect()
    # strict backward from 2^53+1 must find the version at 2^53 —
    # under a double cast both timestamps collapse and nothing matches
    assert [(r.tag, r.rts) for r in got] == [("older", base)]


def test_asof_auto_routes_union_past_broadcast_limit(spark):
    """r7 VERDICT #9: pin the router's decision at the boundary. At or
    under broadcast_row_limit the broadcast + max_by plan runs (a join
    node, no Window); past it, asof_join_grouped's union engine (no
    join node, running-last Window over the union)."""
    left = spark.createDataFrame(
        [("k", i) for i in range(10)], "grp string, ts long"
    )
    right = spark.createDataFrame(
        [("k", i * 2, float(i)) for i in range(5)],
        "grp string, rts long, price double",
    )

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    under = asof.asof_join_auto(
        left, right, ["grp"], "ts", "rts", broadcast_row_limit=5
    )
    over = asof.asof_join_auto(
        left, right, ["grp"], "ts", "rts", broadcast_row_limit=4
    )
    p_under, p_over = plan(under), plan(over)
    assert "Join" in p_under and "Window" not in p_under
    assert "Window" in p_over and "Join" not in p_over
    # both routes agree on the answer (and with the broadcast truth)
    truth = sorted(
        (r.grp, r.ts, r.rts, r.price)
        for r in asof.asof_join(
            left, right, ["grp"], "ts", "rts"
        ).collect()
    )
    for df in (under, over):
        assert sorted(
            (r.grp, r.ts, r.rts, r.price) for r in df.collect()
        ) == truth


def test_ivf_cell_stats_reports_append_skew(spark, tmp_path):
    """r7 VERDICT #8: the drift monitor ivf_append's docstring
    prescribes. Balanced seed index -> low skew; a lopsided append
    (every new vector lands in one cell) -> max/median ratio grows and
    total_rows tracks the append."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(64)
    path = str(tmp_path / "ivf")
    index = similarity.build_ivf_index(emb, num_centroids=4, cache=False)
    similarity.save_ivf_index(index, path)

    before = similarity.ivf_cell_stats(spark, path)
    assert before.n_cells >= 1
    assert before.total_rows == 64
    assert before.max_rows >= before.median_rows > 0
    assert before.skew_ratio >= 1.0
    assert [c for c, in before.per_cell.select("cell").collect()]

    # append 200 copies of one existing vector: all land in one cell
    one = emb.limit(1).select(
        F.col("vec_id"), F.col("embedding")
    ).collect()[0]
    batch = spark.createDataFrame(
        [(10_000 + i, one.embedding) for i in range(200)],
        "vec_id long, embedding array<float>",
    )
    similarity.ivf_append(spark, path, batch)
    after = similarity.ivf_cell_stats(spark, path)
    assert after.total_rows == 264
    assert after.max_rows >= 200
    assert after.skew_ratio > before.skew_ratio
