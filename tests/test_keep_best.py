"""keep_best_representative: the quality-keep policy must pick the
highest-scoring member per group (not the lowest id), with ties broken
by lowest id — on groups where members genuinely differ."""

from __future__ import annotations

from sales_data_warehouse_spark.operators.dedup import (
    keep_best_representative,
)


def _run(spark, assign_rows, score_rows):
    a = spark.createDataFrame(assign_rows, "doc_id long, fp string")
    s = spark.createDataFrame(score_rows, "doc_id long, logit_milli long")
    return {
        r["fp"]: r for r in keep_best_representative(a, s).collect()
    }


def test_highest_score_wins_over_lowest_id(spark):
    out = _run(
        spark,
        [(1, "g1"), (2, "g1"), (3, "g1"), (4, "g2")],
        [(1, 100), (2, 900), (3, 500), (4, 7)],
    )
    assert out["g1"]["best_id"] == 2
    assert out["g1"]["min_id"] == 1
    assert out["g1"]["best_logit_milli"] == 900
    assert out["g1"]["n_members"] == 3
    assert out["g2"]["best_id"] == 4


def test_score_tie_breaks_to_lowest_id(spark):
    out = _run(
        spark,
        [(5, "g"), (9, "g"), (7, "g")],
        [(5, 42), (9, 42), (7, 42)],
    )
    assert out["g"]["best_id"] == 5


def test_negative_scores_and_ids_order_correctly(spark):
    out = _run(
        spark,
        [(10, "g"), (11, "g")],
        [(10, -500), (11, -100)],
    )
    assert out["g"]["best_id"] == 11
    assert out["g"]["best_logit_milli"] == -100


def test_string_ids_work(spark):
    # regression: the earlier negate-the-id formulation cast string ids
    # to numeric NULL under ANSI-off, nulling every representative
    a = spark.createDataFrame(
        [("u-1", "g"), ("u-2", "g"), ("u-3", "g")], "doc_id string, fp string"
    )
    s = spark.createDataFrame(
        [("u-1", 10), ("u-2", 99), ("u-3", 50)],
        "doc_id string, logit_milli long",
    )
    out = keep_best_representative(a, s).collect()
    assert len(out) == 1
    assert out[0]["best_id"] == "u-2"
    assert out[0]["min_id"] == "u-1"
