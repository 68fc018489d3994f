"""Property-based checks of the round-4 dedup/text operators against
in-Python brute-force references: line-level dedup, repeated-span
masking, and unigram surprisal. Random corpora from a tiny alphabet so
collisions (the interesting case) are dense.
"""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sales_data_warehouse_spark.operators.dedup import (
    line_dedup,
    repeated_span_mask,
)
from sales_data_warehouse_spark.operators.text import unigram_surprisal

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# lines long enough to be dedup candidates plus short always-keep lines
line = st.sampled_from(
    [
        "alpha beta gamma line",
        "delta epsilon zeta line",
        "eta theta iota kappa",
        "ok",
        "-",
    ]
)
doc_lines = st.lists(line, min_size=1, max_size=6)
corpus = st.lists(doc_lines, min_size=1, max_size=10)


def _line_dedup_brute(docs, max_doc_freq=1, min_line_chars=10):
    df = Counter()
    for lines in docs:
        for ln in set(
            l for l in lines if len(l.strip()) >= min_line_chars
        ):
            df[ln] += 1
    hot = {l for l, c in df.items() if c > max_doc_freq}
    out = {}
    for i, lines in enumerate(docs):
        kept = [
            l
            for l in lines
            if len(l.strip()) < min_line_chars or l not in hot
        ]
        out[i] = (len(kept), len(lines) - len(kept), "\n".join(kept))
    return out


@given(docs=corpus)
@SETTINGS
def test_line_dedup_matches_bruteforce(spark, docs):
    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (
            r["n_lines_kept"], r["n_lines_removed"], r["text_clean"]
        )
        for r in line_dedup(df).collect()
    }
    assert got == _line_dedup_brute(docs)


token = st.sampled_from(["x", "y", "z", "w"])
doc_tokens = st.lists(token, min_size=1, max_size=12)
tok_corpus = st.lists(doc_tokens, min_size=1, max_size=8)


def _span_mask_brute(docs, k, min_count=2):
    grams = Counter()
    for toks in docs:
        for p in range(len(toks) - k + 1):
            grams[tuple(toks[p:p + k])] += 1
    out = {}
    for i, toks in enumerate(docs):
        covered = set()
        for p in range(len(toks) - k + 1):
            if grams[tuple(toks[p:p + k])] >= min_count:
                covered.update(range(p, p + k))
        kept = [t for j, t in enumerate(toks) if j not in covered]
        out[i] = (len(toks), len(covered), " ".join(kept))
    return out


@given(docs=tok_corpus, k=st.integers(2, 4))
@SETTINGS
def test_span_mask_matches_bruteforce(spark, docs, k):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_masked"], r["text_masked"])
        for r in repeated_span_mask(df, k=k).collect()
    }
    assert got == _span_mask_brute(docs, k)


@given(docs=tok_corpus)
@SETTINGS
def test_unigram_surprisal_matches_bruteforce(spark, docs):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_tokens"], r["sum_log2_freq"])
        for r in unigram_surprisal(df).collect()
    }
    freq = Counter(t for toks in docs for t in toks)
    for i, toks in enumerate(docs):
        bits = sum(int(math.floor(math.log2(freq[t]))) for t in toks)
        assert got[i] == (len(toks), bits)
