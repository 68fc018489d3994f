"""Prefix-filtered exact Jaccard (AllPairs/PPJoin) must produce the
SAME pair set as the plain inverted-index implementation — the filter
is a pruning strategy, never an approximation:

* equality with ``ngram_jaccard_pairs`` on the sf0.001 documents table,
* the exact-multiple boundary (|d| such that t*|d| is an integer) where
  a float-ceil prefix length would come up one short and silently drop
  a true pair — the reason the operator does integer ceil,
* prefixes genuinely shrink the join input (the point of the filter).
"""

from __future__ import annotations

import pytest

from sales_data_warehouse_spark.operators.dedup import (
    ngram_jaccard_pairs,
    prefix_filtered_jaccard_pairs,
)
from sales_data_warehouse_spark.queries.corpus import load_table


def _pairs(df):
    return {
        (r.doc_a, r.doc_b, r.jaccard) for r in df.collect()
    }


def test_matches_inverted_index_on_testdata(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    base = _pairs(ngram_jaccard_pairs(docs, threshold=0.3))
    pref = _pairs(
        prefix_filtered_jaccard_pairs(docs, threshold_num=3, threshold_den=10)
    )
    assert pref == base
    assert len(pref) > 0  # non-vacuous: sf0.001 has near-dup pairs


def test_exact_multiple_size_boundary(spark):
    # 12 tokens -> 10 shingles; t=3/10 -> ceil(t*10)=3 exactly, prefix
    # length 10-3+1=8.  Two docs sharing shingles ONLY near the prefix
    # boundary: float ceil drift (prefix 7) would lose the pair.
    words = "w%d"
    base = [words % i for i in range(12)]
    other = base[:9] + ["x9", "x10", "x11"]  # shares first 7 shingles
    docs = spark.createDataFrame(
        [(1, " ".join(base)), (2, " ".join(other))],
        "doc_id int, text string",
    )
    # truth: inter=7 (shingles 0..6), sizes 10/10, J = 7/13 = 0.538462
    base_pairs = _pairs(ngram_jaccard_pairs(docs, threshold=0.3))
    pref_pairs = _pairs(
        prefix_filtered_jaccard_pairs(docs, threshold_num=3, threshold_den=10)
    )
    assert base_pairs == pref_pairs == {(1, 2, 0.538462)}


def test_prefix_strictly_smaller_than_full_index(spark):
    # the pruning must be real: candidate-side shingle rows < full rows
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    from pyspark.sql import Window, functions as F

    from sales_data_warehouse_spark.operators.dedup import exploded_shingles

    sh = exploded_shingles(docs, "text", "doc_id", 3).dropDuplicates(
        ["doc", "shingle"]
    )
    df_tbl = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    w_rank = Window.partitionBy("doc").orderBy("df", "shingle")
    w_doc = Window.partitionBy("doc")
    ranked = sh.join(df_tbl, "shingle").select(
        "doc",
        F.row_number().over(w_rank).alias("pos"),
        F.count(F.lit(1)).over(w_doc).alias("size"),
    )
    full = ranked.count()
    pref = ranked.filter(
        F.col("pos")
        <= F.col("size")
        - F.floor((F.col("size") * 3 + 9).cast("bigint") / F.lit(10)).cast(
            "int"
        )
        + 1
    ).count()
    assert pref < full
    assert pref > 0
