"""Gopher-rules quality filter + unigram surprisal semantics.

The corpus oracle cross-checks these against DuckDB at sf0.01; these
tests pin the rule semantics on constructed documents that trip each
rule individually (the synthetic corpus trips none of the line rules —
it has no newlines or bullets), and check the unigram score against a
pure-Python twin.
"""

from __future__ import annotations

import math
from collections import Counter

import pytest

from sales_data_warehouse_spark.operators.text import (
    gopher_quality,
    unigram_surprisal,
)

# 60 words, normal english-ish shape: passes every rule
GOOD = (
    "the quick brown fox jumps over the lazy dog and that is fine "
    "to be seen with many other words of quite ordinary length here "
    "which keep the mean word size inside the allowed band easily "
    "while having enough stopwords present to satisfy that rule too "
    "and a few more filler words bring the total count past fifty"
)


def _flags(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {r["doc_id"]: r for r in gopher_quality(df).collect()}


@pytest.fixture(scope="module")
def result(spark):
    rows = [
        (1, GOOD),
        (2, "too short to pass the word count rule"),
        # 60 words but every third word is a '#' symbol burst
        (3, " ".join(
            "####" if i % 3 == 0 else f"word{i}" for i in range(60)
        ) + " the of and"),
        # bullet lines dominate
        (4, "\n".join(f"- bullet item {i} the of and" for i in range(10))),
        # number-only words: fails the alpha-word rule
        (5, " ".join(str(i) for i in range(60)) + " the of"),
        # no presence-set stopwords at all
        (6, " ".join(f"zz{i}word" for i in range(60))),
        # 1-2 char words: mean word length under 3
        (7, " ".join("ab" for _ in range(60)) + " the of and"),
    ]
    return _flags(spark, rows)


def test_good_doc_passes(result):
    assert result[1]["passes"] is True
    assert result[1]["n_stop_present"] >= 2


def test_short_doc_fails(result):
    assert result[2]["passes"] is False


def test_symbol_ratio_fails(result):
    assert result[3]["symbol_word_ratio"] > 0.1
    assert result[3]["passes"] is False


def test_bullet_lines_fail(result):
    assert result[4]["frac_bullet_lines"] == 1.0
    assert result[4]["passes"] is False


def test_non_alpha_words_fail(result):
    assert result[5]["frac_alpha_words"] < 0.8
    assert result[5]["passes"] is False


def test_missing_stopwords_fail(result):
    assert result[6]["n_stop_present"] == 0
    assert result[6]["passes"] is False


def test_short_words_fail_mean_length(result):
    assert result[7]["mean_word_chars"] < 3
    assert result[7]["passes"] is False


def test_unigram_surprisal_matches_python_twin(spark):
    rows = [
        (1, "alpha beta gamma alpha alpha"),
        (2, "beta beta delta epsilon ALPHA"),
        (3, "gamma gamma gamma zeta"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in unigram_surprisal(df).collect()}

    toks = {i: t.lower().split() for i, t in rows}
    freq = Counter(t for ts in toks.values() for t in ts)
    for i, ts in toks.items():
        bits = [int(math.floor(math.log2(freq[t]))) for t in ts]
        assert got[i]["n_tokens"] == len(ts)
        assert got[i]["sum_log2_freq"] == sum(bits)
        assert got[i]["avg_log2_freq"] == pytest.approx(
            round(sum(bits) / len(ts), 4)
        )


def test_unigram_rare_scores_below_common(spark):
    # doc of corpus-frequent tokens outscores a doc of singletons
    rows = [(1, "x x x x x x x x"), (2, "q w e r t y u i")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in unigram_surprisal(df).collect()}
    assert got[1]["avg_log2_freq"] > got[2]["avg_log2_freq"]
    assert got[2]["sum_log2_freq"] == 0  # all singletons: log2(1)=0
