"""Line-level dedup (boilerplate removal) semantics on genuinely
multi-line documents — the driver's synthetic corpus has no newlines,
so the oracle entry only covers the degenerate one-line-per-doc case;
these pin the real contract:

* a long line shared by >max_doc_freq docs is removed from ALL of them,
* short lines are never removal candidates no matter how frequent,
* within-doc repetition alone never removes (doc-frequency, not count),
* line order is preserved on reassembly,
* a doc made entirely of boilerplate survives as an empty-text row.
"""

from __future__ import annotations

import pytest

from sales_data_warehouse_spark.operators.dedup import line_dedup

BOILER = "subscribe to our newsletter for daily updates"
FOOTER = "copyright 2019 example corporation all rights reserved"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # doc 1: boilerplate + unique content + short line
        (1, f"{BOILER}\nunique first document body line\nok\n{FOOTER}"),
        # doc 2: same boilerplate/footer, own content
        (2, f"{BOILER}\nsecond document distinctive content\n{FOOTER}"),
        # doc 3: nothing but boilerplate
        (3, f"{BOILER}\n{FOOTER}"),
        # doc 4: repeats ITS OWN long line 3x — unique to this doc
        (4, "self repeated interior line here\n" * 3
            + "closing line of document four"),
        # doc 5: the short line everywhere, plus unique text
        (5, "ok\nfifth document has its own words\nok"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture(scope="module")
def result(docs):
    out = line_dedup(docs, max_doc_freq=1, min_line_chars=10)
    return {r["doc_id"]: r for r in out.collect()}


def test_every_doc_survives(result):
    assert sorted(result) == [1, 2, 3, 4, 5]


def test_shared_long_lines_removed_everywhere(result):
    for d in (1, 2, 3):
        assert BOILER not in result[d]["text_clean"]
        assert FOOTER not in result[d]["text_clean"]
    assert result[1]["n_lines_removed"] == 2
    assert result[2]["n_lines_removed"] == 2


def test_unique_content_and_order_preserved(result):
    assert result[1]["text_clean"] == (
        "unique first document body line\nok"
    )
    assert result[2]["text_clean"] == "second document distinctive content"


def test_all_boilerplate_doc_becomes_empty(result):
    assert result[3]["text_clean"] == ""
    assert result[3]["n_lines_kept"] == 0
    assert result[3]["n_lines_removed"] == 2


def test_within_doc_repetition_is_not_boilerplate(result):
    # the repeated line lives in ONE doc only -> doc frequency 1 -> kept
    assert result[4]["n_lines_removed"] == 0
    assert result[4]["text_clean"].count("self repeated interior line") == 3


def test_short_lines_always_kept(result):
    # "ok" appears in docs 1 and 5 but is under min_line_chars
    assert result[5]["n_lines_removed"] == 0
    assert result[5]["text_clean"].split("\n") == [
        "ok", "fifth document has its own words", "ok",
    ]


def test_df_threshold_respected(docs):
    # max_doc_freq=2: lines in <=2 docs survive; BOILER/FOOTER are in 3
    out = {
        r["doc_id"]: r
        for r in line_dedup(docs, max_doc_freq=2).collect()
    }
    assert BOILER not in out[1]["text_clean"]
    assert out[3]["n_lines_kept"] == 0
    out3 = {
        r["doc_id"]: r
        for r in line_dedup(docs, max_doc_freq=3).collect()
    }
    # threshold above the max observed df: nothing removed anywhere
    assert all(r["n_lines_removed"] == 0 for r in out3.values())
