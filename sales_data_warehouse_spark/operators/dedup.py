"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Designed scale-first: every variant avoids the O(n^2) all-pairs comparison.
  * exact:        one hash-groupBy — a single shuffle on the fingerprint.
  * ngram Jaccard: inverted-index self-join on shingles (pairs only where
                   they share >= 1 shingle), then exact Jaccard.
  * MinHash-LSH:  shingle -> k minhashes -> band buckets -> bucket join;
                   candidate pairs per band bucket, verified by signature
                   similarity. Sub-quadratic at 100 TB.
  * SimHash:      64-bit weighted-majority hash; near-dups = small Hamming
                   distance within identical high-bit prefixes.

Everything is built-in Spark SQL expressions (xxhash64, explode, groupBy) —
no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sales_data_warehouse_spark.operators.text import word_shingles


def exact_duplicates(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Group identical texts: fingerprint -> (canonical id, copy count).

    One shuffle on md5(text); at 100 TB the fingerprint groupBy is the
    minimal possible exact-dedup plan (map-side partial agg applies).
    """
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("fp"))
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.1,
) -> DataFrame:
    """Near-duplicate pairs by exact Jaccard over word n-gram shingles.

    Inverted-index plan: explode distinct shingles, self-join on shingle
    (only co-occurring docs ever meet), count intersections, then
    |A ∩ B| / (|A| + |B| - |A ∩ B|). Common-shingle skew is the scale
    hazard — AQE skew-join handles moderate cases; drop ultra-frequent
    shingles (document frequency cap) before joining at real scale.
    """
    sh = docs.select(
        F.col(id_col).alias("doc"),
        word_shingles(F.col(text_col), n).alias("shingles"),
    ).withColumn("n_shingles", F.size("shingles"))
    exploded = sh.select(
        "doc", "n_shingles", F.explode("shingles").alias("shingle")
    )
    a = exploded.select(
        F.col("doc").alias("doc_a"),
        F.col("n_shingles").alias("size_a"),
        "shingle",
    )
    b = exploded.select(
        F.col("doc").alias("doc_b"),
        F.col("n_shingles").alias("size_b"),
        "shingle",
    )
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "size_a", "size_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    jac = F.col("n_inter") / (
        F.col("size_a") + F.col("size_b") - F.col("n_inter")
    )
    return (
        inter.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
) -> DataFrame:
    """MinHash signature per doc: sig[i] = min over shingles of
    xxhash64(shingle, seed=i). Arrays stay JVM-side via transform/explode.
    """
    sh = docs.select(
        F.col(id_col).alias("doc"),
        word_shingles(F.col(text_col), n).alias("shingles"),
    ).filter(F.size("shingles") > 0)
    # one column per hash seed, computed lazily as an array expression
    sig = F.array(
        *[
            F.array_min(
                F.transform(
                    F.col("shingles"), lambda s, i=i: F.xxhash64(s, F.lit(i))
                )
            )
            for i in range(num_hashes)
        ]
    )
    return sh.select("doc", sig.alias("signature"))


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.3,
) -> DataFrame:
    """Candidate near-dup pairs via LSH banding over MinHash signatures.

    Signature split into ``bands`` bands of ``num_hashes/bands`` rows; docs
    colliding in any band bucket become candidates; candidates are scored
    by estimated Jaccard = fraction of matching signature positions.
    The bucket join replaces all-pairs: complexity ~ sum of bucket sizes
    squared, tunable via bands/rows to target a similarity threshold.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(docs, text_col, id_col, n, num_hashes)
    banded = sigs.select(
        "doc",
        "signature",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at(
                                        "signature", b * rows_per_band + r + 1
                                    ).cast("string")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", "signature", "bb.band", "bb.bucket")

    a = banded.select(
        F.col("doc").alias("doc_a"),
        F.col("signature").alias("sig_a"),
        "band",
        "bucket",
    )
    b = banded.select(
        F.col("doc").alias("doc_b"),
        F.col("signature").alias("sig_b"),
        "band",
        "bucket",
    )
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                lambda m: m,
            )
        )
        / F.lit(num_hashes)
    )
    return (
        cand.withColumn("est_jaccard", F.round(est, 4))
        .filter(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
    )


def simhash(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
) -> DataFrame:
    """64-bit SimHash per document over word tokens.

    bit_i(doc) = majority over tokens of bit_i(xxhash64(token)). Computed
    as: explode tokens -> for each bit, sum(+1/-1) -> sign -> reassemble.
    All integer arithmetic, one groupBy per doc — linear and shuffle-light.
    """
    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.split(F.lower(F.col(text_col)), r"\s+")
        ).alias("token"),
    ).withColumn("h", F.xxhash64("token"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    per_doc = toks.groupBy("doc").agg(*votes)
    fp = None
    for i in range(bits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1)).otherwise(F.lit(0))
        term = F.shiftleft(bit.cast("long"), i)
        fp = term if fp is None else fp.bitwiseXOR(term)
    return per_doc.select("doc", fp.alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 8,
    prefix_bits: int = 16,
) -> DataFrame:
    """Near-dup candidates: equal ``prefix_bits`` simhash prefix (bucket
    join), verified by full Hamming distance <= ``max_hamming``."""
    sh = simhash(docs, text_col, id_col)
    bucketed = sh.withColumn(
        "bucket", F.shiftright(F.col("simhash"), 64 - prefix_bits)
    )
    a = bucketed.select(
        F.col("doc").alias("doc_a"), F.col("simhash").alias("h_a"), "bucket"
    )
    b = bucketed.select(
        F.col("doc").alias("doc_b"), F.col("simhash").alias("h_b"), "bucket"
    )
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        a.join(b, "bucket")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
