"""bpe_train vs a pure-Python BPE trainer on the same corpus."""

from __future__ import annotations

from collections import Counter

import pytest

from sales_data_warehouse_spark.operators.text import bpe_train


def python_bpe(texts: list[str], num_merges: int):
    """Reference BPE: word-type counts, greedy left-to-right merges,
    ties broken (count desc, pair lexicographic)."""
    words = Counter()
    for t in texts:
        for w in t.lower().split():
            if w:
                words[w] += 1
    state = {w: list(w) for w in words}
    merges = []
    for rnd in range(1, num_merges + 1):
        pairs = Counter()
        for w, syms in state.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += words[w]
        if not pairs:
            break
        (a, b), n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if n < 2:
            break
        merges.append((rnd, a, b, a + b, n))
        for w, syms in state.items():
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            state[w] = out
    vocab = Counter()
    totals = Counter()
    for w, syms in state.items():
        for s in syms:
            vocab[s] += 1
            totals[s] += words[w]
    return merges, {s: (vocab[s], totals[s]) for s in vocab}


CORPUS = [
    "low low low low low",
    "lower lower newest newest newest",
    "newest newest newest widest widest",
    "the the the lowest newest",
]


@pytest.mark.parametrize("num_merges", [1, 4, 8])
def test_bpe_train_matches_python_twin(spark, num_merges):
    df = spark.createDataFrame(
        list(enumerate(CORPUS)), "doc_id bigint, text string"
    )
    merges, vocab_df = bpe_train(df, num_merges=num_merges)
    want_merges, want_vocab = python_bpe(CORPUS, num_merges)
    assert merges == want_merges
    got_vocab = {
        r["symbol"]: (r["n_words"], r["total_count"])
        for r in vocab_df.collect()
    }
    assert got_vocab == want_vocab


def test_bpe_train_stops_when_no_pair_repeats(spark):
    df = spark.createDataFrame(
        [(1, "ab cd ef")], "doc_id bigint, text string"
    )
    merges, _ = bpe_train(df, num_merges=10)
    # every adjacent pair occurs once -> n < 2 -> stop immediately
    assert merges == []


def test_bpe_train_single_char_words_survive(spark):
    df = spark.createDataFrame(
        [(1, "a a a bb bb")], "doc_id bigint, text string"
    )
    merges, vocab_df = bpe_train(df, num_merges=3)
    # only 'bb' has an internal pair: (b, b) x2 -> one merge
    assert [(m[1], m[2], m[4]) for m in merges] == [("b", "b", 2)]
    got = {r["symbol"] for r in vocab_df.collect()}
    assert got == {"a", "bb"}


def test_bpe_encode_matches_python_twin(spark):
    df = spark.createDataFrame(
        list(enumerate(CORPUS)), "doc_id bigint, text string"
    )
    merges, _ = bpe_train(df, num_merges=6)
    from sales_data_warehouse_spark.operators.text import bpe_encode

    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_encode(df, merges).collect()
    }
    merge_seq = [(m[1], m[2]) for m in merges]
    for i, text in enumerate(CORPUS):
        words = [w for w in text.lower().split() if w]
        total = 0
        for w in words:
            syms = list(w)
            for a, b in merge_seq:
                out = []
                for x in syms:
                    if out and out[-1] == a and x == b:
                        out[-1] = a + b
                    else:
                        out.append(x)
                syms = out
            total += len(syms)
        assert got[i] == (len(words), total), i


def test_bpe_encode_no_merges_is_char_count(spark):
    df = spark.createDataFrame(
        [(1, "ab cde")], "doc_id bigint, text string"
    )
    from sales_data_warehouse_spark.operators.text import bpe_encode

    r = bpe_encode(df, []).collect()[0]
    assert (r["n_words"], r["n_bpe_tokens"]) == (2, 5)
