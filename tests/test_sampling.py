"""Deterministic-sampling invariants: subset-of-population, rate
adherence, repeatability, and the interleave cadence actually honoring
the weights.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sales_data_warehouse_spark.operators import sampling

SF_DIR = "/root/testdata/sf0.01"


def test_sample_rates_and_determinism(spark):
    docs = spark.range(0, 20000).select(F.col("id").alias("doc_id"))
    stratum = F.when(F.col("doc_id") % 2 == 0, "even").otherwise("odd")
    s1 = sampling.stratified_sample(
        docs, stratum, {"even": 250, "odd": 750}
    )
    rows = s1.groupBy("stratum").count().collect()
    by = {r.stratum: r["count"] for r in rows}
    # permille hash is uniform-ish; 10k rows per stratum -> tight bands
    assert 0.2 < by["even"] / 10000 < 0.3
    assert 0.7 < by["odd"] / 10000 < 0.8
    s2 = sampling.stratified_sample(
        docs, stratum, {"even": 250, "odd": 750}
    )
    assert sorted(map(tuple, s1.collect())) == sorted(
        map(tuple, s2.collect())
    )


def test_sample_unknown_stratum_dropped(spark):
    docs = spark.range(0, 100).select(F.col("id").alias("doc_id"))
    out = sampling.stratified_sample(
        docs, F.lit("mystery"), {"known": 1000}
    )
    assert out.count() == 0


def test_interleave_cadence(spark):
    docs = spark.range(0, 3000).select(F.col("id").alias("doc_id"))
    source = F.when(F.col("doc_id") % 2 == 0, "a").otherwise("b")
    mix = sampling.mixture_interleave(
        docs, source, {"a": 0.75, "b": 0.25}
    )
    # In any slot prefix, source shares approach their weights: check
    # the first 400 scheduled docs contain ~300 of a / ~100 of b.
    head = mix.orderBy("slot", "source", "doc_id").limit(400).collect()
    n_a = sum(1 for r in head if r.source == "a")
    assert 280 <= n_a <= 320, n_a
    # every source's own slots are strictly increasing by construction
    by_src = {}
    for r in sorted(head, key=lambda r: (r.source, r.doc_id)):
        assert by_src.get(r.source, -1) < r.slot
        by_src[r.source] = r.slot


def test_interleave_unlisted_source_excluded(spark):
    docs = spark.range(0, 100).select(F.col("id").alias("doc_id"))
    source = F.when(F.col("doc_id") < 50, "keep").otherwise("drop")
    mix = sampling.mixture_interleave(docs, source, {"keep": 1.0})
    assert mix.count() == 50
    assert mix.filter(F.col("source") != "keep").count() == 0


def test_negative_ids_hash_nonnegative(spark):
    """xxhash64-style ids span the full signed-64 range; a sign-keeping
    % would hash them negative and defeat every rate filter."""
    docs = spark.range(0, 2000).select(
        (F.col("id") - 1000).alias("doc_id")  # half the ids negative
    )
    out = sampling.stratified_sample(docs, F.lit("s"), {"s": 250})
    n = out.count()
    assert 0.18 < n / 2000 < 0.33, n  # ~25%, NOT >50% (negative leak)
    # unknown stratum must drop negative ids too
    assert (
        sampling.stratified_sample(docs, F.lit("x"), {"s": 1000}).count()
        == 0
    )


def test_interleave_two_phase_matches_naive_window(spark):
    """The distributed two-phase rank must equal the textbook
    row_number-over-source form exactly (rank is partitioning-
    invariant by construction)."""
    from pyspark.sql import Window

    docs = spark.range(0, 5000).select(F.col("id").alias("doc_id"))
    source = F.when(F.col("doc_id") % 3 == 0, "a").otherwise(
        F.when(F.col("doc_id") % 3 == 1, "b").otherwise("c")
    )
    weights = {"a": 0.5, "b": 0.3, "c": 0.2}
    got = sampling.mixture_interleave(docs, source, weights)

    w_expr = (
        F.when(source == "a", 0.5)
        .when(source == "b", 0.3)
        .otherwise(0.2)
    )
    naive = docs.select(
        source.alias("source"), "doc_id", w_expr.alias("_w")
    ).withColumn(
        "slot",
        F.round(
            F.row_number().over(
                Window.partitionBy("source").orderBy("doc_id")
            )
            / F.col("_w"),
            6,
        ),
    ).select("source", "doc_id", "slot")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, naive.collect())
    )


def test_temperature_rates_schedule():
    from sales_data_warehouse_spark.operators.sampling import (
        temperature_rates_permille,
    )

    w = {"web": 0.6, "books": 0.3, "code": 0.1}
    # T=1 reproduces raw relative weights; largest keeps all
    assert temperature_rates_permille(w, 1.0) == {
        "web": 1000, "books": 500, "code": 167,
    }
    # T=2 compresses toward uniform (literals embedded in the corpus
    # oracle — a change here must update temperature_mixture's SQL)
    assert temperature_rates_permille(w, 2.0) == {
        "web": 1000, "books": 707, "code": 408,
    }
    # T -> inf flattens to uniform
    assert temperature_rates_permille(w, 1e9) == {
        "web": 1000, "books": 1000, "code": 1000,
    }


def test_temperature_sample_rates_realized(spark):
    from pyspark.sql import functions as F

    from sales_data_warehouse_spark.operators.sampling import (
        temperature_sample,
    )

    docs = spark.range(0, 9000).withColumnRenamed("id", "doc_id")
    src = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("web"))
        .when(F.col("doc_id") % 3 == 1, F.lit("books"))
        .otherwise(F.lit("code"))
    )
    out = temperature_sample(
        docs.withColumn("grp", src), "grp",
        {"web": 0.6, "books": 0.3, "code": 0.1}, temperature=2.0,
    )
    got = {
        r["stratum"]: r["n"]
        for r in out.groupBy("stratum").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert got["web"] == 3000  # rate 1000 permille keeps all
    # hash is pseudo-uniform: realized rates near 707/408 permille
    assert abs(got["books"] - 3000 * 0.707) < 150
    assert abs(got["code"] - 3000 * 0.408) < 150


def test_leakage_safe_split_groups_stay_together(spark):
    from sales_data_warehouse_spark.operators.sampling import (
        leakage_safe_split,
    )

    rows = [
        (1, "alpha text"), (2, "alpha text"), (3, "alpha text"),
        (4, "beta text"), (5, "beta text"),
        (6, "unique gamma"),
    ] + [(100 + i, f"filler {i}") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = leakage_safe_split(df, train_permille=500).collect()
    assert len(got) == len(rows)
    by_canon = {}
    for r in got:
        by_canon.setdefault(r["canonical_id"], set()).add(r["split"])
    # every duplicate group lands entirely on one side
    assert all(len(s) == 1 for s in by_canon.values())
    dup = {r["doc_id"]: r for r in got}
    assert dup[1]["canonical_id"] == dup[2]["canonical_id"] == 1
    assert dup[1]["n_copies"] == 3
    # with 53 groups at 500 permille, both sides are populated
    sides = {r["split"] for r in got}
    assert sides == {"train", "test"}
