"""Similarity-search invariants: the tiled block-GEMM paths must be
block-size-invariant (tiling is an execution detail, not a semantic),
the IVF index must be reusable without retraining, and the exact path
must stay distributed (no driver materialization).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sales_data_warehouse_spark.operators import similarity

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").persist()
    df.count()
    yield df
    df.unpersist()


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_brute_force_block_invariance(spark, emb):
    """Tiny tiles vs one giant tile must give identical top-k: partial
    per-tile top-k + global window loses nothing."""
    q = emb.filter(F.col("vec_id") < 7)
    tiled = similarity.brute_force_topk(
        emb, q, k=5, corpus_block_rows=37, query_block_rows=3
    )
    single = similarity.brute_force_topk(
        emb, q, k=5, corpus_block_rows=10**9, query_block_rows=10**9
    )
    cols = ["query_id", "neighbor_id", "rank", "sim"]
    assert _rows(tiled, cols) == _rows(single, cols)
    assert tiled.count() == 7 * 5


def test_exact_pairs_block_invariance(spark, emb):
    """All-pairs GEMM: block split must not change the pair set, and the
    diagonal tile must not double-count or self-pair."""
    sub = emb.filter(F.col("vec_id") < 120)
    tiled = similarity.embedding_near_dup_pairs(sub, threshold=0.3)
    # force many blocks including uneven diagonal tiles
    small = similarity._exact_cosine_pairs_gemm(
        sub, 0.3, "vec_id", "embedding", block_rows=17
    )
    cols = ["vec_a", "vec_b", "sim"]
    t_rows = _rows(tiled.select(*cols), cols)
    s_rows = _rows(small.select(*cols), cols)
    assert t_rows == s_rows
    assert all(a < b for a, b, _ in t_rows)
    assert len(set((a, b) for a, b, _ in t_rows)) == len(t_rows)


def test_exact_pairs_stay_distributed(spark, emb):
    """The exact path's plan must keep lineage from the parquet scan
    through an Arrow grouped-map — a driver-side toPandas/createDataFrame
    round-trip would surface as a LocalTableScan with no file scan."""
    pairs = similarity.embedding_near_dup_pairs(emb, threshold=0.4)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan
    assert "LocalTableScan" not in plan
    assert "Scan parquet" in plan or "FileScan" in plan


def test_lsh_pairs_subset_of_exact(spark, emb):
    """LSH trades recall, never precision: every LSH pair must appear in
    the exact pair set with the identical similarity value."""
    sub = emb.filter(F.col("vec_id") < 200)
    exact = set(
        map(tuple, similarity.embedding_near_dup_pairs(sub, 0.3).collect())
    )
    lsh = similarity.embedding_near_dup_pairs(sub, 0.3, method="lsh")
    lsh_rows = [tuple(r) for r in lsh.collect()]
    assert lsh_rows, "LSH should find at least some within-bucket pairs"
    assert set(lsh_rows) <= exact


def test_ivf_build_search_split(spark, emb):
    """One built index must serve repeated searches identically — no
    per-query retraining — and probing more cells converges to exact."""
    q = emb.filter(F.col("vec_id") < 5)
    index = similarity.build_ivf_index(emb, num_centroids=8)
    cols = ["query_id", "neighbor_id", "rank", "sim"]
    first = _rows(similarity.ivf_search(index, q, k=3, nprobe=2), cols)
    second = _rows(similarity.ivf_search(index, q, k=3, nprobe=2), cols)
    assert first == second
    # nprobe = num_centroids probes every cell -> exact brute-force result
    all_cells = _rows(similarity.ivf_search(index, q, k=3, nprobe=8), cols)
    exact = _rows(similarity.brute_force_topk(emb, q, k=3), cols)
    assert all_cells == exact
    index.assigned.unpersist()


def test_ivf_recall_floor(spark, emb):
    """Coarse-quantized search with a few probes should still recover
    most true neighbors at this scale."""
    q = emb.filter(F.col("vec_id") < 20)
    index = similarity.build_ivf_index(emb, num_centroids=8)
    got = set(
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ivf_search(index, q, k=5, nprobe=4).collect()
    )
    truth = set(
        (r["query_id"], r["neighbor_id"])
        for r in similarity.brute_force_topk(emb, q, k=5).collect()
    )
    recall = len(got & truth) / len(truth)
    assert recall >= 0.6, f"IVF recall {recall:.2f} below floor"
    index.assigned.unpersist()


def test_ivf_index_save_load_roundtrip(spark, emb, tmp_path):
    """A saved+reloaded index must answer searches identically to the
    in-memory one, and its on-disk layout must be cell-partitioned so
    probed searches can prune directories."""
    import os

    from pyspark.sql import functions as F2

    q = emb.filter(F.col("vec_id") < 5)
    index = similarity.build_ivf_index(emb, num_centroids=8, cache=False)
    path = str(tmp_path / "ivf")
    similarity.save_ivf_index(index, path)
    reloaded = similarity.load_ivf_index(spark, path)
    assert reloaded.centers == index.centers
    cols = ["query_id", "neighbor_id", "rank", "sim"]
    mem = _rows(similarity.ivf_search(index, q, k=3, nprobe=2), cols)
    disk = _rows(similarity.ivf_search(reloaded, q, k=3, nprobe=2), cols)
    assert mem == disk
    # physical layout: one directory per cell
    cells = [d for d in os.listdir(f"{path}/assigned") if d.startswith("cell=")]
    assert len(cells) == 8


def test_ivf_search_prunes_unprobed_cells(spark, emb, tmp_path):
    """With the probed side broadcast, the scan over the cell-partitioned
    index must read only the probed cells' partitions (runtime partition
    pruning via the broadcast join), not the whole index."""
    q = emb.filter(F.col("vec_id") < 3)
    index = similarity.build_ivf_index(emb, num_centroids=8, cache=False)
    path = str(tmp_path / "ivf")
    similarity.save_ivf_index(index, path)
    reloaded = similarity.load_ivf_index(spark, path)
    res = similarity.ivf_search(reloaded, q, k=3, nprobe=1)
    res.collect()
    plan = res._jdf.queryExecution().executedPlan().toString()
    # the assigned-table scan must carry a dynamic-pruning partition
    # filter on cell (verified: PartitionFilters: [..., dynamicpruning...])
    assigned_scans = [
        ln
        for ln in plan.splitlines()
        if "Scan parquet" in ln and "neighbor_id" in ln and "cell" in ln
    ]
    assert assigned_scans, plan
    assert any("dynamicpruning" in ln for ln in assigned_scans), (
        assigned_scans[0]
    )


def test_brute_force_preserves_ids_beyond_float53(spark, emb):
    """xxhash64-style ids exceed 2^53; any float64 round-trip of the id
    columns (e.g. nullable-int64 Arrow coercion) would corrupt them."""
    offset = (1 << 60) + 1
    big = emb.select(
        (F.col("vec_id") + offset).alias("vec_id"), "embedding"
    )
    q = big.filter(F.col("vec_id") < offset + 7)
    got = sorted(
        (r.query_id - offset, r.neighbor_id - offset, r.rank)
        for r in similarity.brute_force_topk(big, q, k=3).collect()
    )
    base = sorted(
        (r.query_id, r.neighbor_id, r.rank)
        for r in similarity.brute_force_topk(
            emb, emb.filter(F.col("vec_id") < 7), k=3
        ).collect()
    )
    assert got == base


def test_quantize_zero_vector_yields_null(spark):
    from sales_data_warehouse_spark.operators.similarity import (
        quantize_embeddings,
        truncate_embeddings,
    )

    df = spark.createDataFrame(
        [(1, [0.0] * 32), (2, [1.0] + [0.0] * 31)],
        "vec_id BIGINT, embedding ARRAY<FLOAT>",
    )
    q = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    assert q[1]["qvec"] is None and q[1]["scale"] == 0.0
    assert q[2]["qvec"][0] == 127  # max component maps to full scale

    t = {r["vec_id"]: r for r in truncate_embeddings(df, dims=16).collect()}
    assert t[1]["unit_prefix"] is None
    assert t[2]["unit_prefix"][0] == 1.0  # renormalized prefix


def test_group_centroids_mean_and_shape(spark):
    from sales_data_warehouse_spark.operators.similarity import (
        group_centroids,
    )

    rows = [
        (1, "a", [1.0, 0.0, 3.0]),
        (2, "a", [3.0, 2.0, 1.0]),
        (3, "b", [5.0, 5.0, 5.0]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id int, label string, embedding array<float>"
    )
    got = {
        r.label: (r.n_vecs, r.centroid)
        for r in group_centroids(df).collect()
    }
    assert got["a"] == (2, [2.0, 1.0, 2.0])
    assert got["b"] == (1, [5.0, 5.0, 5.0])


def test_rowwise_cosine_null_and_ragged_rows(spark):
    """A NULL or ragged vector must yield NULL for that row only — the
    HOF-dot contract — not fail the whole Arrow batch (the vectorized
    kernel's np.stack raises on mixed batches; the fallback re-batches
    valid rows by dimension)."""
    from pyspark.sql import functions as F

    from sales_data_warehouse_spark.operators.similarity import (
        _rowwise_cosine,
    )

    rows = [
        (1, [1.0, 0.0], [1.0, 0.0]),     # cos = 1
        (2, None, [1.0, 0.0]),           # null left
        (3, [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]),  # ragged dim, cos = 0
        (4, [1.0, 1.0], None),           # null right
    ]
    df = spark.createDataFrame(
        rows, "id int, a array<double>, b array<double>"
    )
    got = {
        r["id"]: r["cos"]
        for r in df.select(
            "id", _rowwise_cosine(F.col("a"), F.col("b")).alias("cos")
        ).collect()
    }
    assert got[1] == 1.0
    assert got[2] is None
    assert got[3] == 0.0
    assert got[4] is None


def test_bucket_expr_null_vector_buckets_null(spark):
    from pyspark.sql import functions as F

    from sales_data_warehouse_spark.operators.similarity import (
        _bucket_expr,
        _planes,
    )

    planes = _planes(4, 3)
    rows = [(1, [1.0, 2.0, 3.0]), (2, None), (3, [1.0, 2.0])]
    df = spark.createDataFrame(rows, "id int, v array<float>")
    got = {
        r["id"]: r["sig"]
        for r in df.select(
            "id", _bucket_expr(F.col("v"), planes).alias("sig")
        ).collect()
    }
    assert isinstance(got[1], int)
    assert got[2] is None  # NULL vector
    assert got[3] is None  # wrong dimensionality


def test_rowwise_cosine_cross_side_dim_mismatch_is_null(spark):
    """Both sides stack cleanly but to DIFFERENT widths (truncated vs
    full embeddings): the kernel must emit NULL per row, not score the
    common prefix."""
    from pyspark.sql import functions as F

    from sales_data_warehouse_spark.operators.similarity import (
        _rowwise_cosine,
    )

    rows = [(i, [1.0, 2.0], [1.0, 2.0, 3.0]) for i in range(4)]
    df = spark.createDataFrame(
        rows, "id int, a array<double>, b array<double>"
    ).repartition(1)
    got = df.select(
        _rowwise_cosine(F.col("a"), F.col("b")).alias("cos")
    ).collect()
    assert all(r["cos"] is None for r in got)


def test_ivf_append_equals_rebuild_with_same_centers(spark, emb, tmp_path):
    """Incremental growth: train on a seed corpus, append a new batch —
    the persisted index must equal a rebuild WITH THE SAME centers over
    the union corpus, and searches must see old+new vectors alike."""
    seed = emb.filter(F.col("vec_id") % 2 == 0)
    batch = emb.filter(F.col("vec_id") % 2 == 1)
    q = emb.filter(F.col("vec_id") < 5)

    index = similarity.build_ivf_index(seed, num_centroids=8, cache=False)
    path = str(tmp_path / "ivf_inc")
    similarity.save_ivf_index(index, path)
    similarity.ivf_append(spark, path, batch)
    grown = similarity.load_ivf_index(spark, path)

    # identical to assigning the union corpus against the same codebook
    want_assigned = sorted(
        (r.neighbor_id, r.cell)
        for r in similarity.assign_cells(emb, index.centers).collect()
    )
    got_assigned = sorted(
        (r.neighbor_id, r.cell) for r in grown.assigned.collect()
    )
    assert got_assigned == want_assigned

    cols = ["query_id", "neighbor_id", "rank", "sim"]
    got = _rows(similarity.ivf_search(grown, q, k=3, nprobe=8), cols)
    rebuilt = similarity.IvfIndex(
        similarity.assign_cells(emb, index.centers), index.centers
    )
    want = _rows(similarity.ivf_search(rebuilt, q, k=3, nprobe=8), cols)
    assert got == want
    # and appended (odd-id) vectors are actually findable
    assert any(nid % 2 == 1 for _, nid, _, _ in got)
