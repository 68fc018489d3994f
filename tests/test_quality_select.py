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


def test_caller_g_column_survives_and_reserved_name_raises(spark):
    """r12 ADVICE: the internal constant-group carry was literally
    named ``_g``, silently overwriting a caller column of that name.
    The carry is now collision-resistant (``__qst_const_group``) and
    the reserved name raises instead of being clobbered."""
    docs = _mk(spark, [" ".join(["the"] * (5 + 10 * i)) for i in range(10)])
    tagged = docs.withColumn("_g", F.col("doc_id") * 7)
    out = quality_select_top(tagged, keep_permille=300)
    # note: output projection is fixed, so `_g` is not expected in the
    # output — the pin is that the run no longer hinges on clobbering
    # it, and the reserved internal name is refused loudly
    assert out.count() == 3
    with pytest.raises(ValueError, match="__qst_const_group"):
        quality_select_top(
            docs.withColumn("__qst_const_group", F.lit(9)),
            keep_permille=300,
        )


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


def test_global_equals_retired_driver_side_arithmetic(spark):
    """r12 routed the global selector through the grouped engine
    (constant group). The grouped integer cutoff ``1000·cum ≥ n·keep``
    is ``cum ≥ ceil(n·keep/1000)`` exactly, so the threshold — and
    therefore the kept row set — must equal what the retired r4–r11
    driver-side histogram walk produced. Mirror that walk here
    verbatim and compare on real documents at several keep rates."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )
    scored = quality_logit(docs)
    hist = sorted(
        (
            (int(r["logit_milli"]), int(r["cnt"]))
            for r in scored.groupBy("logit_milli")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        ),
        key=lambda sc: -sc[0],
    )
    n = sum(c for _, c in hist)
    assert n > 0
    for keep_permille in (1, 300, 777, 1000):
        target = -(-n * keep_permille // 1000)  # ceil
        cum, threshold = 0, hist[-1][0]
        for s, c in hist:
            cum += c
            if cum >= target:
                threshold = s
                break
        out = quality_select_top(docs, keep_permille=keep_permille)
        rows = out.collect()
        assert {int(r["threshold_milli"]) for r in rows} == {threshold}
        want = {
            r["doc_id"]
            for r in scored.filter(
                F.col("logit_milli") >= threshold
            ).collect()
        }
        assert {r["doc_id"] for r in rows} == want


def test_global_output_schema_unchanged_by_routing(spark):
    """The r12 constant-group routing must not perturb the public
    output contract (the corpus oracle hashes columns by name)."""
    docs = _mk(spark, ["a b c", "d e f g h"])
    out = quality_select_top(docs, keep_permille=1000)
    assert out.columns == [
        "doc_id", "n_tokens", "punct_ppm", "stop_ppm",
        "logit_milli", "keep", "threshold_milli",
    ]
    assert dict(out.dtypes)["threshold_milli"] == "bigint"


def test_select_by_fitted_weights(spark):
    """r13: the threshold engine accepts a fitted model's weights (the
    GPT-3/CCNet select-by-trained-classifier step). Selection by custom
    weights must equal the histogram contract applied to THOSE scores:
    every kept doc's custom logit >= the reported threshold, the keep
    count meets the ceil target, and the default path is unchanged."""
    from sales_data_warehouse_spark.operators.sampling import (
        quality_select_top_grouped,
    )
    from sales_data_warehouse_spark.operators.text import (
        score_with_classifier,
    )

    docs = _mk(spark, [" ".join(["the"] * (5 + 7 * i)) for i in range(12)])
    docs = docs.withColumn("lang", F.expr("'l' || cast(doc_id % 2 as string)"))
    fitted = {
        "bias_milli": 10,
        "per_token_milli": -3,  # opposite sign of the published weights
        "punct_ppm_milli_per_k": 0,
        "stop_ppm_milli_per_k": 1,
    }
    out = quality_select_top_grouped(
        docs, keep_permille=500, group_cols="lang", weights=fitted
    ).collect()
    scores = {
        (r["doc_id"]): r["logit_milli"]
        for r in score_with_classifier(docs, fitted).collect()
    }
    # per group: >= ceil(6 * 0.5) = 3 kept, all at/above the threshold,
    # and the kept set is the TOP of the custom ordering (the inverted
    # per-token weight makes this differ from the default selection)
    for g in ("l0", "l1"):
        kept = [r for r in out if r["lang"] == g]
        assert len(kept) >= 3
        thr = kept[0]["threshold_milli"]
        assert all(r["logit_milli"] >= thr for r in kept)
        assert all(scores[r["doc_id"]] == r["logit_milli"] for r in kept)
        group_ids = [i for i in scores if (i % 2 == (0 if g == "l0" else 1))]
        top_by_custom = sorted(
            group_ids, key=lambda i: scores[i], reverse=True
        )[:3]
        assert set(top_by_custom) <= {r["doc_id"] for r in kept}
    # shortest docs win under the inverted weight — the opposite of the
    # published-weights selection
    assert {r["doc_id"] for r in out if r["lang"] == "l0"} == {0, 2, 4}
