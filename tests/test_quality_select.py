"""quality_select_top: histogram-threshold semantics — at-least-target
with deterministic tie overshoot, no global row sort."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sales_data_warehouse_spark.operators.sampling import (
    quality_select_top,
)
from sales_data_warehouse_spark.operators.text import quality_logit


def _mk(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), ["doc_id", "text"]
    )


def test_keeps_at_least_target_and_only_better(spark):
    # 10 docs with strictly increasing token counts -> distinct scores
    docs = _mk(spark, [" ".join(["the"] * (5 + 10 * i)) for i in range(10)])
    out = quality_select_top(docs, keep_permille=300).collect()
    assert len(out) == 3  # ceil(10 * 0.3), distinct scores: exact
    scores = {r["doc_id"]: r["logit_milli"] for r in
              quality_logit(docs).collect()}
    cutoff = min(r["logit_milli"] for r in out)
    kept_ids = {r["doc_id"] for r in out}
    for d, s in scores.items():
        assert (s >= cutoff) == (d in kept_ids)


def test_tie_mass_overshoots_deterministically(spark):
    # 8 identical docs + 2 better ones; target=3 lands inside the tie
    # class -> ALL 8 ties kept (documented overshoot), total 10
    same = " ".join(["the"] * 20)
    better = " ".join(["the"] * 200)
    docs = _mk(spark, [same] * 8 + [better] * 2)
    out = quality_select_top(docs, keep_permille=300).collect()
    assert len(out) == 10
    assert len({r["threshold_milli"] for r in out}) == 1


def test_keep_all_and_keep_none_bounds(spark):
    docs = _mk(spark, [" ".join(["word"] * (i + 2)) for i in range(5)])
    assert quality_select_top(docs, keep_permille=1000).count() == 5
    # permille=1 -> target=1 -> only the single best score class
    top = quality_select_top(docs, keep_permille=1).collect()
    assert len(top) == 1


def test_no_global_row_sort_in_plan(spark):
    docs = _mk(spark, [" ".join(["the"] * (5 + i)) for i in range(20)])
    plan = (
        quality_select_top(docs, keep_permille=500)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the only Sort allowed is inside the histogram cumulative window
    # (distinct-score-sized); the kept-rows side must be sort-free —
    # a global percent_rank formulation would show Sort over the docs
    assert "percent_rank" not in plan.lower()
