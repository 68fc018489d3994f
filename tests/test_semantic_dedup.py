"""SemDeDup (cluster-bucketed semantic dedup) semantics on constructed
vector corpora where the exact answer is known by hand.

The corpus entry's property oracle checks soundness/recall against the
all-pairs GEMM at sf0.01; these pin the mechanics: keep-lowest-id rule,
exact-backed drops, soft-assignment recall, zero-vector safety.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sales_data_warehouse_spark.operators.similarity import semantic_dedup


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.fixture(scope="module")
def planted(spark):
    # two tight duplicate groups on opposite axes + isolated vectors;
    # 4 centroids force real clustering, groups are internally exact
    rows = []
    for i, base in [(0, [10.0, 0.0, 0.0]), (1, [10.1, 0.0, 0.0]),
                    (2, [0.0, 10.0, 0.0]), (3, [0.0, 10.2, 0.0]),
                    (4, [0.0, 0.0, 10.0]), (5, [7.0, 7.0, 0.0])]:
        rows.append((i, base))
    # filler spread so k-means has mass to split
    for i in range(6, 30):
        rows.append((i, [float(i % 5) - 2.0, float(i % 7) - 3.0,
                         float(i % 3) + 1.0]))
    return _corpus(spark, rows)


def test_keep_lowest_id_per_duplicate_group(spark, planted):
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(
            planted, threshold=0.999, num_centroids=4
        ).collect()
    }
    # vectors 0/1 are near-parallel (cos ~ 1), as are 2/3: lower id kept
    assert out[0]["kept"] is True
    assert out[1]["kept"] is False
    assert out[2]["kept"] is True
    assert out[3]["kept"] is False
    # the isolated direction survives
    assert out[4]["kept"] is True
    assert out[1]["n_dup_neighbors"] >= 1


def test_every_vector_gets_exactly_one_verdict(spark, planted):
    out = semantic_dedup(planted, threshold=0.999, num_centroids=4)
    assert out.count() == planted.count()
    assert out.select("vec_id").distinct().count() == planted.count()


def test_threshold_one_disables_dropping(spark, planted):
    # cosine > 1 is impossible: nothing may be dropped
    out = semantic_dedup(planted, threshold=1.0001, num_centroids=4)
    assert out.filter(~F.col("kept")).count() == 0


def test_zero_vector_is_safe_and_kept(spark):
    rows = [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [1.0, 0.01]),
            (3, [0.0, 1.0])]
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(
            _corpus(spark, rows), threshold=0.99, num_centroids=2
        ).collect()
    }
    assert out[0]["kept"] is True  # cos vs zero vector treated as 0
    assert out[2]["kept"] is False  # near-dup of 1


def test_soft_assignment_catches_more_than_single(spark):
    # many duplicate pairs straddling random cell boundaries: top-2
    # assignment must drop at least as many as single assignment
    rows = []
    for i in range(60):
        base = [float((i * 37) % 11) - 5, float((i * 53) % 13) - 6,
                float((i * 29) % 7) - 3]
        rows.append((2 * i, base))
        rows.append((2 * i + 1, [x * 1.0001 for x in base]))
    c = _corpus(spark, rows)
    single = semantic_dedup(c, threshold=0.999, num_centroids=8, assign=1)
    soft = semantic_dedup(c, threshold=0.999, num_centroids=8, assign=2)
    n_single = single.filter(~F.col("kept")).count()
    n_soft = soft.filter(~F.col("kept")).count()
    assert n_soft >= n_single
    assert n_soft >= 50  # nearly every pair has an exact twin


def test_cell_size_guard_warns_on_skewed_corpus(spark):
    # every vector identical -> k-means piles (nearly) all of them
    # into one cell; a tiny bound must trip the guard
    skew = _corpus(spark, [(i, [1.0, 0.0, 0.0]) for i in range(40)])
    with pytest.warns(ResourceWarning, match="max_cell_rows"):
        out = semantic_dedup(
            skew, num_centroids=2, max_cell_rows=10
        ).collect()
    # guard warns but the run still completes with correct semantics:
    # all vectors are exact duplicates, only vec 0 survives
    kept = sorted(r["vec_id"] for r in out if r["kept"])
    assert kept == [0]


def test_cell_size_guard_error_mode_refuses(spark):
    skew = _corpus(spark, [(i, [1.0, 0.0, 0.0]) for i in range(40)])
    with pytest.raises(ValueError, match="num_centroids"):
        semantic_dedup(
            skew, num_centroids=2, max_cell_rows=10, oversize="error"
        )


def test_cell_size_guard_disabled_and_quiet_when_bounded(spark):
    import warnings

    skew = _corpus(spark, [(i, [1.0, 0.0, 0.0]) for i in range(40)])
    # None disables the guard entirely
    with warnings.catch_warnings():
        warnings.simplefilter("error", ResourceWarning)
        semantic_dedup(skew, num_centroids=2, max_cell_rows=None).collect()
        # and a generous bound stays quiet
        semantic_dedup(
            skew, num_centroids=2, max_cell_rows=1_000_000
        ).collect()
