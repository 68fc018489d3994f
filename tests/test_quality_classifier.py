"""Trainable quality classifier (r13, r12 VERDICT #5): the fit side is
iterative LBFGS — SQL-inexpressible, so the driver oracle covers only
the apply side (#171, exact integer oracle). These tests are the
fit-side oracle: a NumPy IRLS mirror must reproduce the coefficients,
a refit on the committed seed labeling must reproduce the committed
``TRAINED_QUALITY_WEIGHTS``, export must plug into ``quality_logit``'s
integer arithmetic bit-exactly, and persistence must survive the
mid-swap crash window."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from sales_data_warehouse_spark.operators import text


def _mk_docs(spark, n=60):
    """Deterministic synthetic corpus with all three features varying
    and labels that correlate with them but are NOT separable (every
    13th label flipped) — a finite MLE exists, so Spark LBFGS and the
    NumPy mirror converge to the same point."""
    rows = []
    for i in range(n):
        a = 5 + (i * 7) % 17          # filler words
        b = (i * 5) % 7               # 'the' stopwords
        c = (i * 3) % 5               # trailing punctuation chars
        txt = " ".join(["word"] * a + ["the"] * b) + "." * c
        sig = 2 * ((i * 7) % 17) - 3 * ((i * 3) % 5) + 4 * ((i * 5) % 7)
        label = 1 if sig > 20 else 0
        if i % 13 == 0:
            label = 1 - label
        rows.append((i, txt, label))
    return spark.createDataFrame(
        rows, "doc_id long, text string, label long"
    )


def _irls(X, y, iters=60):
    """Plain-NumPy logistic MLE via Newton/IRLS — the independent
    mirror (no Spark, no sklearn). Returns [intercept, w1, w2, w3]."""
    Xb = np.hstack([np.ones((len(y), 1)), X])
    w = np.zeros(Xb.shape[1])
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(Xb @ w)))
        wt = p * (1.0 - p)
        h = Xb.T @ (Xb * wt[:, None]) + 1e-10 * np.eye(Xb.shape[1])
        w = w + np.linalg.solve(h, Xb.T @ (y - p))
    return w


def test_fit_matches_numpy_irls_mirror(spark):
    docs = _mk_docs(spark)
    clf = text.fit_quality_classifier(
        docs, docs.select("doc_id", "label")
    )
    # mirror the fit on the SAME features the Spark path trains on
    pdf = (
        text.quality_logit(docs)
        .select(
            "doc_id",
            F.col("n_tokens").cast("double").alias("f_tokens"),
            F.expr("punct_ppm DIV 1000").cast("double").alias("f_punct"),
            F.expr("stop_ppm DIV 1000").cast("double").alias("f_stop"),
        )
        .join(docs.select("doc_id", "label"), "doc_id")
        .toPandas()
        .sort_values("doc_id")
    )
    w = _irls(
        pdf[["f_tokens", "f_punct", "f_stop"]].to_numpy(),
        pdf["label"].to_numpy().astype(float),
    )
    mirror_milli = {
        "bias_milli": round(w[0] * 1000),
        "per_token_milli": round(w[1] * 1000),
        "punct_ppm_milli_per_k": round(w[2] * 1000),
        "stop_ppm_milli_per_k": round(w[3] * 1000),
    }
    for k in mirror_milli:
        assert abs(clf.weights[k] - mirror_milli[k]) <= 1, (
            k, clf.weights, mirror_milli,
        )
    # metadata: class counts of the seed set
    assert clf.n_pos + clf.n_neg == 60
    assert clf.n_pos > 0 and clf.n_neg > 0


def test_committed_trained_weights_reproduce(spark):
    """The committed TRAINED_QUALITY_WEIGHTS must be exactly what a
    refit on their documented provenance (sf0.01 documents, the
    lang == 'en' seed labeling) produces — ±1 milli per weight for
    float-sum-order drift across partitionings."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    clf = text.fit_quality_classifier(
        docs, docs.select("doc_id", (F.col("lang") == "en").alias("label"))
    )
    for k, v in text.TRAINED_QUALITY_WEIGHTS.items():
        assert abs(clf.weights[k] - v) <= 1, (k, clf.weights)
    assert (clf.n_pos, clf.n_neg) == (218, 282)


def test_apply_is_quality_logit_arithmetic_exactly(spark):
    """score_with_classifier IS quality_logit with swapped constants:
    same rows, same schema, bit-identical values; the default-weights
    path is unchanged by the parametrization."""
    docs = _mk_docs(spark).drop("label")
    clf = text.QualityClassifier(
        weights={
            "bias_milli": -137,
            "per_token_milli": -1,
            "punct_ppm_milli_per_k": 0,
            "stop_ppm_milli_per_k": -2,
        },
        n_pos=1,
        n_neg=1,
    )
    got = {
        r["doc_id"]: (r["logit_milli"], r["keep"])
        for r in text.score_with_classifier(
            docs, clf, keep_threshold_milli=-250
        ).collect()
    }
    want = {
        r["doc_id"]: (r["logit_milli"], r["keep"])
        for r in text.quality_logit(
            docs, keep_threshold_milli=-250, weights=clf.weights
        ).collect()
    }
    assert got == want
    # hand-check one row against the integer formula
    feats = {
        r["doc_id"]: r
        for r in text.quality_logit(docs).collect()
    }
    r0 = feats[1]
    assert got[1][0] == (
        -137
        - r0["n_tokens"]
        + 0 * (r0["punct_ppm"] // 1000)
        - 2 * (r0["stop_ppm"] // 1000)
    )
    # default path: parametrization is invisible to existing callers
    base = text.quality_logit(docs).collect()
    param = text.quality_logit(
        docs, weights=dict(text.QUALITY_LOGIT_WEIGHTS)
    ).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, param))


def test_guards(spark):
    docs = _mk_docs(spark)
    with pytest.raises(ValueError, match="keys"):
        text.quality_logit(docs, weights={"bias_milli": 1})
    one_class = docs.select("doc_id", F.lit(1).alias("label"))
    with pytest.raises(ValueError, match="both classes"):
        text.fit_quality_classifier(docs, one_class)
    # values are contract too (r13 advice): un-quantized float milli
    # weights would build a float logit silently truncated by the
    # bigint cast — refuse loudly
    with pytest.raises(ValueError, match="integer milli-units"):
        text.quality_logit(
            docs,
            weights=dict(
                text.TRAINED_QUALITY_WEIGHTS, bias_milli=-137.2
            ),
        )
    with pytest.raises(ValueError, match="integer milli-units"):
        text.quality_logit(
            docs,
            weights=dict(text.TRAINED_QUALITY_WEIGHTS, bias_milli=True),
        )
    # integral non-Python-int types (numpy) are normalized, not refused
    npw = {
        k: np.int64(v) for k, v in text.TRAINED_QUALITY_WEIGHTS.items()
    }
    assert text.quality_logit(docs.limit(5), weights=npw).count() == 5


def test_save_load_roundtrip_and_crash_recovery(spark, tmp_path):
    import shutil

    docs = _mk_docs(spark)
    clf = text.fit_quality_classifier(
        docs, docs.select("doc_id", "label")
    )
    path = str(tmp_path / "clf")
    text.save_quality_classifier(spark, clf, path)
    assert text.load_quality_classifier(spark, path) == clf
    # re-save to the same path (the reopen-then-resave shape)
    text.save_quality_classifier(spark, clf, path)
    assert text.load_quality_classifier(spark, path) == clf
    # mid-swap crash: path missing, .stage_old holding the model
    shutil.move(path, path + ".stage_old")
    assert text.load_quality_classifier(spark, path) == clf
