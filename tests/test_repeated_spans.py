"""Repeated-span masking (k-gram substring dedup) semantics.

Unlike line dedup (document frequency), spans count raw OCCURRENCES:
a passage repeated twice inside one document is masked too.
"""

from __future__ import annotations

import pytest

from sales_data_warehouse_spark.operators.dedup import repeated_span_mask

PASSAGE = "one two three four five six seven eight nine ten"  # 10 tokens


@pytest.fixture(scope="module")
def result(spark):
    rows = [
        # passage shared by docs 1 and 2, wrapped in unique prose
        (1, f"intro1 words here {PASSAGE} outro1 tail"),
        (2, f"different opening {PASSAGE} and a different close"),
        # passage repeated twice WITHIN doc 3 only
        (3, f"{PASSAGE} bridge {PASSAGE}"),
        # fewer than k tokens: untouched whatever it says
        (4, "one two three four five"),
        # unique long doc: nothing masked
        (5, " ".join(f"u{i}" for i in range(30))),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = repeated_span_mask(df, k=10, min_count=2)
    return {r["doc_id"]: r for r in out.collect()}


def test_cross_doc_span_masked_in_both(result):
    for d in (1, 2):
        assert "three four five" not in result[d]["text_masked"]
        assert result[d]["n_masked"] == 10


def test_unique_context_survives(result):
    assert result[1]["text_masked"] == "intro1 words here outro1 tail"
    assert result[2]["text_masked"] == (
        "different opening and a different close"
    )


def test_within_doc_repetition_is_masked(result):
    # occurrence count, not doc frequency: both copies + the bridge
    # word are covered (the grams spanning the bridge repeat nowhere,
    # but each PASSAGE copy itself occurs twice)
    assert result[3]["n_masked"] >= 20
    assert "bridge" in result[3]["text_masked"] or (
        result[3]["n_masked"] == 21
    )


def test_short_doc_untouched(result):
    assert result[4]["n_masked"] == 0
    assert result[4]["text_masked"] == "one two three four five"


def test_unique_doc_untouched(result):
    assert result[5]["n_masked"] == 0
    assert result[5]["n_tokens"] == 30


def test_all_docs_present(result):
    assert sorted(result) == [1, 2, 3, 4, 5]
