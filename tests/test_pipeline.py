"""Composable corpus pipeline: stage chaining equals manual
composition, the report counts attrition correctly, and the
doc_id/text contract is enforced."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sales_data_warehouse_spark import pipeline as P

BOILER = "subscribe to our newsletter for daily updates today"
GOOD_BODY = (
    "the quick brown fox jumps over the lazy dog and that is fine "
    "to be seen with many other words of quite ordinary length here "
    "which keep the mean word size inside the allowed band easily "
    "while having enough stopwords present to satisfy that rule too "
    "and a few more filler words bring the total count past fifty"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # three gopher-passing docs sharing a boilerplate line
        (1, f"{BOILER}\n{GOOD_BODY} variant one"),
        (2, f"{BOILER}\n{GOOD_BODY} variant two"),
        (3, f"{BOILER}\n{GOOD_BODY} variant three"),
        # exact duplicate pair (also gopher-passing)
        (4, GOOD_BODY + " duplicate pair body"),
        (5, GOOD_BODY + " duplicate pair body"),
        # too short: gopher drops it
        (6, "way too short"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"]).persist()


def test_stages_compose_and_report(spark, docs):
    # exact dedup FIRST (the standard order): otherwise the duplicate
    # pair's shared line counts as cross-document boilerplate and line
    # dedup empties both copies
    out, report = P.run_pipeline(
        docs,
        [P.gopher_filter(), P.exact_dedup_stage(), P.line_dedup_stage()],
        report=True,
    )
    rows = {r["doc_id"]: r["text"] for r in out.collect()}
    # 6 dropped by gopher; 5 dropped as exact dup of 4; boilerplate
    # line stripped from 1/2/3
    assert sorted(rows) == [1, 2, 3, 4]
    assert all(BOILER not in t for t in rows.values())
    assert [r["stage"] for r in report] == [
        "gopher_filter", "exact_dedup", "line_dedup",
    ]
    assert report[0]["docs_in"] == 6 and report[0]["docs_out"] == 5
    assert report[1]["docs_out"] == 4
    assert report[2]["dropped"] == 0  # strip rewrites, drops nothing


def test_no_report_matches_reported_result(spark, docs):
    stages = [P.gopher_filter(), P.exact_dedup_stage()]
    lazy, empty_report = P.run_pipeline(docs, stages, report=False)
    audited, _ = P.run_pipeline(docs, stages, report=True)
    assert empty_report == []
    assert sorted(r["doc_id"] for r in lazy.collect()) == sorted(
        r["doc_id"] for r in audited.collect()
    )


def test_quality_top_stage_keeps_fraction(spark):
    rows = [(i, " ".join(["the"] * (10 + 10 * i))) for i in range(10)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out, _ = P.run_pipeline(
        docs, [P.quality_top_stage(keep_permille=300)]
    )
    assert out.count() == 3


def test_contract_violation_fails_loudly(spark, docs):
    bad = ("drops_text", lambda df: df.drop("text"))
    with pytest.raises(ValueError, match="drops_text"):
        P.run_pipeline(docs, [bad])


def test_span_mask_stage_rewrites_text(spark):
    passage = "one two three four five six seven eight nine ten"
    # tails share NO tokens: any shared tail word would extend the
    # repeated 10-gram coverage into the tail itself
    rows = [
        (1, f"{passage} alpha apple anchor"),
        (2, f"{passage} beta berry basket"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out, _ = P.run_pipeline(docs, [P.span_mask_stage(k=10)])
    texts = {r["doc_id"]: r["text"] for r in out.collect()}
    assert texts[1] == "alpha apple anchor"
    assert texts[2] == "beta berry basket"
