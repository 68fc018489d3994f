"""Hashed-n-gram quality classifier (r14, r13 VERDICT #4): the
CCNet/fastText-shaped upgrade of the r13 scalar-feature classifier —
content features (hashed unigram+bigram counts), not shape statistics.
The fit side is iterative LBFGS — SQL-inexpressible, so the driver
oracle covers only the exact-mode apply side (#172, integer oracle with
the committed weights inlined). These tests are the fit-side oracle: a
NumPy IRLS mirror over the SAME design matrix must reproduce the
coefficients, a refit on the committed provenance must reproduce
``TRAINED_NGRAM_QUALITY_WEIGHTS``, hashed-mode apply must equal
exact-mode apply under a collision-free bucketing (xxhash64 bucketing
is engine-specific, the DSIR precedent), and persistence must survive
the mid-swap crash window."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from sales_data_warehouse_spark.operators import text


def _mk_docs(spark, n=60):
    """Deterministic synthetic corpus: a small shared vocabulary so a
    vocab-capped bag-of-ngrams model CANNOT memorize single documents
    (labels correlate with the counts but every 13th is flipped — a
    finite MLE exists, so Spark LBFGS and the NumPy mirror converge to
    the same point)."""
    rows = []
    for i in range(n):
        a = 5 + (i * 7) % 17
        b = (i * 5) % 7
        c = (i * 3) % 5
        txt = " ".join(["word"] * a + ["the"] * b + ["dot"] * c)
        sig = 2 * ((i * 7) % 17) - 3 * ((i * 3) % 5) + 4 * ((i * 5) % 7)
        label = 1 if sig > 20 else 0
        if i % 13 == 0:
            label = 1 - label
        rows.append((i, txt, label))
    return spark.createDataFrame(
        rows, "doc_id long, text string, label long"
    )


def _py_feats(txt, bigrams=True):
    # mirror F.split(lower, \s+): same regex, so '' yields ['']
    import re

    toks = re.split(r"\s+", txt.lower())
    out = list(toks)
    if bigrams and len(toks) >= 2:
        out += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return out


def _irls(X, y, iters=80):
    """Plain-NumPy logistic MLE via Newton/IRLS — the independent
    mirror (no Spark, no sklearn)."""
    Xb = np.hstack([np.ones((len(y), 1)), X])
    w = np.zeros(Xb.shape[1])
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(Xb @ w)))
        wt = p * (1.0 - p)
        h = Xb.T @ (Xb * wt[:, None]) + 1e-10 * np.eye(Xb.shape[1])
        w = w + np.linalg.solve(h, Xb.T @ (y - p))
    return w


def test_fit_matches_numpy_irls_mirror(spark):
    """Unigram mode for the mirror: the synthetic corpus's bigram
    counts are COLLINEAR with its unigram counts by construction
    ('word word' = count('word') - 1 in every run of words), which
    makes the MLE non-unique and any two optimizers free to disagree
    along the null space — so the fit-vs-mirror pin uses the three
    independent unigram counts (a, b, c are CRT-independent). Bigram
    plumbing is pinned by the apply-side tests instead."""
    docs = _mk_docs(spark)
    clf = text.fit_quality_classifier_ngrams(
        docs,
        docs.select("doc_id", "label"),
        num_buckets=None,
        vocab_size=3,
        bigrams=False,
    )
    assert clf.num_buckets is None and len(clf.weights) == 3
    # mirror the fit on the SAME design matrix: per-doc counts of the
    # model's own vocabulary, tokenized the same way
    pdf = docs.toPandas().sort_values("doc_id")
    vocab = sorted(clf.weights)
    X = np.array(
        [
            [_py_feats(t, bigrams=False).count(f) for f in vocab]
            for t in pdf["text"]
        ],
        dtype=float,
    )
    w = _irls(X, pdf["label"].to_numpy().astype(float))
    assert abs(clf.bias_milli - round(w[0] * 1000)) <= 1, (
        clf.bias_milli, w[0],
    )
    for j, f in enumerate(vocab):
        assert abs(clf.weights[f] - round(w[1 + j] * 1000)) <= 1, (
            f, clf.weights[f], w[1 + j],
        )
    assert clf.n_pos + clf.n_neg == 60
    assert clf.n_pos > 0 and clf.n_neg > 0


def test_committed_trained_ngram_weights_reproduce(spark):
    """The committed TRAINED_NGRAM_QUALITY_WEIGHTS must be exactly
    what a refit on their documented provenance (sf0.01 documents,
    the lang == 'en' seed labeling, exact mode, vocab_size=24)
    produces — ±1 milli per weight for float-sum-order drift."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    clf = text.fit_quality_classifier_ngrams(
        docs,
        docs.select("doc_id", (F.col("lang") == "en").alias("label")),
        num_buckets=None,
        vocab_size=24,
    )
    committed = dict(text.TRAINED_NGRAM_QUALITY_WEIGHTS)
    assert set(clf.weights) == set(committed)
    for k, v in committed.items():
        assert abs(clf.weights[k] - v) <= 1, (k, clf.weights[k], v)
    assert (
        abs(clf.bias_milli - text.TRAINED_NGRAM_QUALITY_BIAS_MILLI) <= 1
    )
    assert (clf.n_pos, clf.n_neg) == (218, 282)


def test_hashed_apply_equals_exact_apply_when_collision_free(spark):
    """The hashed production mode IS the exact mode under a
    collision-free bucketing: rekey the committed exact model by
    pmod(xxhash64(feat), B) (Spark's own hash — engine-specific, the
    reason the driver oracle pins only exact mode) and the scores
    must be bit-identical. The test first PROVES collision-freeness
    on this corpus: no two distinct features of the test corpus share
    a bucket where at least one carries a model weight."""
    docs = _mk_docs(spark, 40).drop("label")
    vocab = ["word", "the", "dot", "word word", "the the"]
    exact = text.NgramQualityClassifier(
        bias_milli=-50,
        weights={f: (i + 1) * 7 - 20 for i, f in enumerate(vocab)},
        num_buckets=None,
        bigrams=True,
        n_pos=1,
        n_neg=1,
    )
    B = 1 << 18
    corpus_feats = (
        text.ngram_occurrences(docs).select("feat").distinct()
    )
    fb = {
        r["feat"]: r["b"]
        for r in corpus_feats.withColumn(
            "b", F.pmod(F.xxhash64("feat"), F.lit(B))
        ).collect()
    }
    model_buckets = {fb[f] for f in vocab}
    clashes = [
        f for f, b in fb.items() if b in model_buckets and f not in vocab
    ]
    assert not clashes and len(model_buckets) == len(vocab)
    hashed = text.NgramQualityClassifier(
        bias_milli=exact.bias_milli,
        weights={fb[f]: w for f, w in exact.weights.items()},
        num_buckets=B,
        bigrams=True,
        n_pos=1,
        n_neg=1,
    )
    got_e = sorted(
        map(
            tuple,
            text.score_with_ngram_classifier(
                docs, exact, keep_threshold_milli=-10
            ).collect(),
        )
    )
    got_h = sorted(
        map(
            tuple,
            text.score_with_ngram_classifier(
                docs, hashed, keep_threshold_milli=-10
            ).collect(),
        )
    )
    assert got_e == got_h


def test_apply_integer_arithmetic_and_zero_match(spark):
    """Hand-check the integer formula and the OOV path: a document
    matching nothing in the model vocabulary scores n_features=0,
    logit_milli=bias, and keep follows the threshold."""
    docs = spark.createDataFrame(
        [(1, "word word the"), (2, "nothing shared here")],
        "doc_id long, text string",
    )
    clf = text.NgramQualityClassifier(
        bias_milli=100,
        weights={"word": 5, "the": -3, "word word": 11, "word the": 2},
        num_buckets=None,
        bigrams=True,
        n_pos=1,
        n_neg=1,
    )
    got = {
        r["doc_id"]: (r["n_features"], r["logit_milli"], r["keep"])
        for r in text.score_with_ngram_classifier(
            docs, clf, keep_threshold_milli=101
        ).collect()
    }
    # doc 1: word x2 (+10), the (-3), word word (+11), word the (+2)
    assert got[1] == (5, 100 + 10 - 3 + 11 + 2, True)
    assert got[2] == (0, 100, False)


def test_fit_hashed_mode_records_seen_buckets_only(spark):
    docs = _mk_docs(spark)
    clf = text.fit_quality_classifier_ngrams(
        docs, docs.select("doc_id", "label"), num_buckets=4096
    )
    assert clf.num_buckets == 4096
    # seed vocabulary is tiny; the model must not carry 4096 buckets
    assert 0 < len(clf.weights) < 64
    assert all(isinstance(k, int) for k in clf.weights)
    scored = text.score_with_ngram_classifier(docs.drop("label"), clf)
    assert scored.count() == 60
    assert scored.filter(F.col("n_features") == 0).count() == 0


def test_fit_large_bucket_space_equals_exact_fit(spark):
    """The compact-remap property (r14): hashed-mode fit trains at
    dim n_seen, not dim B, so a B = 2^20 hash space must fit — and,
    under a collision-free bucketing, fit the IDENTICAL model to
    exact mode (same design matrix up to column permutation; unseen
    buckets are all-zero columns whose MLE coefficient is zero).
    Unigram mode for the same reason as the IRLS mirror test: the
    fixture's bigram counts are collinear, so the MLE would be
    non-unique and column order could steer the optimizer."""
    docs = _mk_docs(spark)
    B = 1 << 20
    # prove collision-freeness of the seed vocabulary at this B
    feats = {
        r["feat"]
        for r in text.ngram_occurrences(docs, bigrams=False)
        .select("feat")
        .distinct()
        .collect()
    }
    fb = {
        r["feat"]: int(r["b"])
        for r in spark.createDataFrame(
            [(f,) for f in feats], "feat string"
        )
        .withColumn("b", F.pmod(F.xxhash64("feat"), F.lit(B)))
        .collect()
    }
    assert len(set(fb.values())) == len(fb)
    exact = text.fit_quality_classifier_ngrams(
        docs,
        docs.select("doc_id", "label"),
        num_buckets=None,
        bigrams=False,
    )
    hashed = text.fit_quality_classifier_ngrams(
        docs,
        docs.select("doc_id", "label"),
        num_buckets=B,
        bigrams=False,
    )
    assert set(hashed.weights) == {fb[f] for f in exact.weights}
    assert abs(hashed.bias_milli - exact.bias_milli) <= 1
    for f, w in exact.weights.items():
        assert abs(hashed.weights[fb[f]] - w) <= 1, (f, fb[f], w)


def test_guards(spark):
    docs = _mk_docs(spark)
    one_class = docs.select("doc_id", F.lit(1).alias("label"))
    with pytest.raises(ValueError, match="both classes"):
        text.fit_quality_classifier_ngrams(docs, one_class)
    with pytest.raises(ValueError, match="one or the other"):
        text.fit_quality_classifier_ngrams(
            docs,
            docs.select("doc_id", "label"),
            num_buckets=4096,
            vocab_size=8,
        )
    with pytest.raises(ValueError, match="num_buckets"):
        text.ngram_occurrences(docs, num_buckets=0)
    clf = text.trained_ngram_classifier()
    with pytest.raises(TypeError, match="NgramQualityClassifier"):
        text.score_with_ngram_classifier(docs, dict(clf.weights))
    bad = text.NgramQualityClassifier(
        bias_milli=0,
        weights={"the": 1.5},
        num_buckets=None,
        bigrams=True,
        n_pos=1,
        n_neg=1,
    )
    with pytest.raises(ValueError, match="integer milli-units"):
        text.score_with_ngram_classifier(docs, bad)


def test_save_load_roundtrip_and_crash_recovery(spark, tmp_path):
    import shutil

    docs = _mk_docs(spark)
    labels = docs.select("doc_id", "label")
    for mode_kwargs, sub in (
        (dict(num_buckets=None, vocab_size=5), "exact"),
        (dict(num_buckets=512), "hashed"),
    ):
        clf = text.fit_quality_classifier_ngrams(
            docs, labels, **mode_kwargs
        )
        path = str(tmp_path / f"ngram_clf_{sub}")
        text.save_ngram_classifier(spark, clf, path)
        assert text.load_ngram_classifier(spark, path) == clf
        # re-save to the same path (reopen-then-resave shape)
        text.save_ngram_classifier(spark, clf, path)
        assert text.load_ngram_classifier(spark, path) == clf
        # mid-swap crash: path missing, .stage_old holding the model
        shutil.move(path, path + ".stage_old")
        assert text.load_ngram_classifier(spark, path) == clf


def test_empty_seed_vocabulary_raises_both_modes(spark):
    """All-NULL text yields zero features; both fit modes must fail
    loudly (r14 — hashed mode previously built a 0-wide vector and
    died deep inside createDataFrame instead of at the contract)."""
    docs = spark.createDataFrame(
        [(0, None), (1, None), (2, None), (3, None)],
        "doc_id long, text string",
    )
    labels = spark.createDataFrame(
        [(i, i % 2) for i in range(4)], "doc_id long, label long"
    )
    for kw in (dict(num_buckets=512), dict(num_buckets=None)):
        with pytest.raises(ValueError, match="empty seed vocabulary"):
            text.fit_quality_classifier_ngrams(docs, labels, **kw)


def test_ngram_weight_table_guard_and_reuse(spark):
    """r14: the reusable weight table refuses float/bool milli weights
    (same contract as quality_logit's r13 guard), coerces numpy
    integers, and a prebuilt table passed via weights_df reproduces
    the default path exactly (the streaming scorer's reuse shape —
    build once, score many)."""
    docs = _mk_docs(spark)
    clf = text.fit_quality_classifier_ngrams(
        docs, docs.select("doc_id", "label"), num_buckets=512
    )
    # numpy integral weights are fine and coerce to Python int
    np_clf = text.NgramQualityClassifier(
        bias_milli=np.int64(clf.bias_milli),
        weights={k: np.int32(v) for k, v in clf.weights.items()},
        num_buckets=clf.num_buckets,
        bigrams=clf.bigrams,
        n_pos=clf.n_pos,
        n_neg=clf.n_neg,
    )
    wt = text.ngram_weight_table(spark, np_clf)
    assert dict(wt.collect()) == {
        int(k): int(v) for k, v in clf.weights.items()
    }
    # float and bool weights are refused loudly
    for bad_w in ({7: 1.5}, {7: True}):
        bad = text.NgramQualityClassifier(
            bias_milli=0, weights=bad_w, num_buckets=512,
            bigrams=True, n_pos=1, n_neg=1,
        )
        with pytest.raises(ValueError, match="integer milli-units"):
            text.ngram_weight_table(spark, bad)
    # a float bias is refused by the scorer itself (the weight checks
    # moved into the table builder; bias never reaches it)
    bad_bias = text.NgramQualityClassifier(
        bias_milli=0.5, weights=dict(clf.weights), num_buckets=512,
        bigrams=True, n_pos=1, n_neg=1,
    )
    with pytest.raises(ValueError, match="bias_milli"):
        text.score_with_ngram_classifier(docs, bad_bias)
    # weights_df reuse == default path, rows identical
    got = sorted(
        map(
            tuple,
            text.score_with_ngram_classifier(
                docs, clf, weights_df=text.ngram_weight_table(spark, clf)
            ).collect(),
        )
    )
    want = sorted(
        map(tuple, text.score_with_ngram_classifier(docs, clf).collect())
    )
    assert got == want
