"""DSIR importance weighting and resampling (sampling.importance_*).

Pins: (1) exact integer micro-nat arithmetic against an independent
Python mirror, (2) hashed-bucket mode ≡ exact mode when bucketing is
collision-free (the production path's semantics), (3) the bigram
feature space, (4) resampling = Gumbel-top-k replay of the scores, and
(5) plan shape (TakeOrderedAndProject, broadcast score table).
"""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from sales_data_warehouse_spark.operators import sampling

HASH_P = sampling.HASH_P
HASH_A = sampling.HASH_A


def _mirror_scores(raw_docs, tgt_texts, bigrams=False):
    """Independent Python replay of importance_scores: (id -> (n_features,
    micronats)). raw_docs: list[(id, text)]; tgt_texts: list[text]."""

    def feats(text):
        # regex split, not str.split(): the engines keep empty edge
        # tokens on leading/trailing whitespace runs
        import re

        toks = re.split(r"\s+", text.lower())
        out = list(toks)
        if bigrams and len(toks) >= 2:
            out += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        return out

    cr = Counter()
    per_doc = {}
    for i, t in raw_docs:
        fs = feats(t)
        per_doc[i] = fs
        cr.update(fs)
    ct = Counter()
    for t in tgt_texts:
        ct.update(feats(t))
    v = len(set(cr) | set(ct))
    n_raw = sum(cr.values())
    n_tgt = sum(ct.values())
    s_norm = math.floor(1e6 * math.log((n_raw + v) / (n_tgt + v)))
    s = {f: math.floor(1e6 * math.log((ct.get(f, 0) + 1.0) / (c + 1.0)))
         for f, c in cr.items()}
    return {
        i: (len(fs), sum(s[f] for f in fs) + len(fs) * s_norm)
        for i, fs in per_doc.items()
    }


RAW = [
    (1, "alpha beta gamma alpha"),
    (2, "delta epsilon zeta"),
    (3, "alpha alpha alpha beta"),
    (4, "omega psi chi phi upsilon"),
    (5, "alpha beta"),
]
TGT = ["alpha beta alpha", "alpha gamma", "beta alpha alpha"]


@pytest.fixture(scope="module")
def frames(spark):
    raw = spark.createDataFrame(RAW, "doc_id bigint, text string")
    tgt = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(TGT)],
        "doc_id bigint, text string",
    )
    return raw, tgt


def test_scores_match_python_mirror(frames):
    raw, tgt = frames
    got = {
        r.doc_id: (r.n_features, r.importance_micronats)
        for r in sampling.importance_scores(raw, tgt).collect()
    }
    assert got == _mirror_scores(RAW, TGT)


def test_scores_rank_target_like_docs_higher(frames):
    raw, tgt = frames
    got = {
        r.doc_id: r.importance_micronats / r.n_features
        for r in sampling.importance_scores(raw, tgt).collect()
    }
    # doc 3 is pure target vocabulary, doc 4 shares nothing with it
    assert got[3] > got[4]
    assert got[1] > got[4]


def test_hashed_equals_exact_when_collision_free(frames):
    raw, tgt = frames
    exact = {
        r.doc_id: (r.n_features, r.importance_micronats)
        for r in sampling.importance_scores(raw, tgt).collect()
    }
    hashed = {
        r.doc_id: (r.n_features, r.importance_micronats)
        for r in sampling.importance_scores(
            raw, tgt, num_buckets=1 << 30
        ).collect()
    }
    # collision-free by construction for this vocab (asserted below),
    # so hashing merges nothing and the scores are identical
    import pyspark.sql.functions as SF

    vocab = (
        raw.select(SF.explode(SF.split(SF.lower("text"), r"\s+")).alias("t"))
        .union(
            tgt.select(
                SF.explode(SF.split(SF.lower("text"), r"\s+")).alias("t")
            )
        )
        .select("t", SF.pmod(SF.xxhash64("t"), SF.lit(1 << 30)).alias("b"))
        .distinct()
    )
    n_tok = vocab.select("t").distinct().count()
    n_bkt = vocab.select("b").distinct().count()
    assert n_tok == n_bkt, "fixture vocab collided; pick another"
    assert hashed == exact


def test_bigram_features_widen_the_bag(frames):
    raw, tgt = frames
    uni = {
        r.doc_id: r.n_features
        for r in sampling.importance_scores(raw, tgt).collect()
    }
    bi = sampling.importance_scores(raw, tgt, bigrams=True)
    got = {r.doc_id: (r.n_features, r.importance_micronats) for r in bi.collect()}
    for i, t in RAW:
        n = len(t.split())
        assert got[i][0] == uni[i] + (n - 1)
    assert got == _mirror_scores(RAW, TGT, bigrams=True)


def test_resample_is_gumbel_topk_replay(frames):
    raw, tgt = frames
    k = 3
    scores = _mirror_scores(RAW, TGT)

    def key(i):
        u = (((i % HASH_P + HASH_P) % HASH_P) * HASH_A % 4294967296
             + 0.5) / 4294967296.0
        return scores[i][1] / 1e6 - math.log(-math.log(u))

    want = sorted(
        scores, key=lambda i: (-key(i), i)
    )[:k]
    got = sampling.importance_resample(raw, tgt, k)
    ids = sorted(r.doc_id for r in got.collect())
    assert ids == sorted(want)
    # carries every raw column plus the two score columns, key stays out
    assert set(got.columns) == {
        "doc_id", "text", "n_features", "importance_micronats"
    }
    # deterministic: a second run selects the same rows
    again = sorted(
        r.doc_id
        for r in sampling.importance_resample(raw, tgt, k).collect()
    )
    assert again == ids


def test_resample_plan_and_guards(frames):
    raw, tgt = frames
    with pytest.raises(ValueError, match="k \\(0\\)"):
        sampling.importance_resample(raw, tgt, 0)
    plan = (
        sampling.importance_resample(raw, tgt, 2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    hashed_plan = (
        sampling.importance_scores(raw, tgt, num_buckets=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in hashed_plan


def test_null_text_docs_are_excluded(spark, frames):
    raw, tgt = frames
    with_null = raw.union(
        spark.createDataFrame([(9, None)], "doc_id bigint, text string")
    )
    got = {r.doc_id for r in sampling.importance_scores(with_null, tgt).collect()}
    assert got == {1, 2, 3, 4, 5}


def test_persisted_model_reproduces_inline_scores(frames, tmp_path):
    raw, tgt = frames
    inline = {
        r.doc_id: (r.n_features, r.importance_micronats)
        for r in sampling.importance_scores(raw, tgt).collect()
    }
    model = sampling.fit_importance_model(raw, tgt)
    sampling.save_importance_model(model, str(tmp_path / "m"))
    reopened = sampling.load_importance_model(
        raw.sparkSession, str(tmp_path / "m")
    )
    scored = {
        r.doc_id: (r.n_features, r.importance_micronats)
        for r in sampling.score_with_model(reopened, raw).collect()
    }
    assert scored == inline


def test_persisted_model_hashed_config_roundtrip(frames, tmp_path):
    raw, tgt = frames
    model = sampling.fit_importance_model(
        raw, tgt, num_buckets=1 << 20, bigrams=True
    )
    sampling.save_importance_model(model, str(tmp_path / "h"))
    reopened = sampling.load_importance_model(
        raw.sparkSession, str(tmp_path / "h")
    )
    assert (reopened.num_buckets, reopened.bigrams) == (1 << 20, True)
    inline = {
        r.doc_id: (r.n_features, r.importance_micronats)
        for r in sampling.importance_scores(
            raw, tgt, num_buckets=1 << 20, bigrams=True
        ).collect()
    }
    scored = {
        r.doc_id: (r.n_features, r.importance_micronats)
        for r in sampling.score_with_model(reopened, raw).collect()
    }
    assert scored == inline


def test_model_scores_unseen_features_as_zero(spark, frames):
    raw, tgt = frames
    model = sampling.fit_importance_model(raw, tgt)
    # "alpha" is in the fit vocab; the qq tokens are not — each unseen
    # occurrence contributes 0 micro-nats plus the normalizer term
    new = spark.createDataFrame(
        [(9001, "alpha qqunseen qqunseen")], "doc_id bigint, text string"
    )
    row = sampling.score_with_model(model, new).collect()[0]
    mirror = _mirror_scores(RAW, TGT)
    # recover s(alpha) from the mirror of a pure-alpha relation:
    # importance(doc) = sum(s(f)) + n * s_norm
    import math
    from collections import Counter

    cr = Counter()
    for _, t in RAW:
        cr.update(t.lower().split())
    ct = Counter()
    for t in TGT:
        ct.update(t.lower().split())
    v = len(set(cr) | set(ct))
    n_raw, n_tgt = sum(cr.values()), sum(ct.values())
    s_norm = math.floor(1e6 * math.log((n_raw + v) / (n_tgt + v)))
    s_alpha = math.floor(
        1e6 * math.log((ct["alpha"] + 1.0) / (cr["alpha"] + 1.0))
    )
    assert row.n_features == 3
    assert row.importance_micronats == s_alpha + 3 * s_norm
    assert mirror  # the shared fixture still mirrors (sanity anchor)


def test_model_scores_target_only_features(spark, frames):
    # "gamma" appears once in TGT and once in RAW; use a token present
    # ONLY in the target: fit must keep it in the score table so a new
    # shard containing it gets the full positive ln(ct+1) signal
    raw, _ = frames
    tgt2 = spark.createDataFrame(
        [(200, "alpha tonly tonly tonly")], "doc_id bigint, text string"
    )
    model = sampling.fit_importance_model(raw, tgt2)
    new = spark.createDataFrame(
        [(9002, "tonly tonly")], "doc_id bigint, text string"
    )
    row = sampling.score_with_model(model, new).collect()[0]
    cr = Counter()
    for _, t in RAW:
        cr.update(t.lower().split())
    ct = Counter("alpha tonly tonly tonly".split())
    v = len(set(cr) | set(ct))
    n_raw, n_tgt = sum(cr.values()), sum(ct.values())
    s_norm = math.floor(1e6 * math.log((n_raw + v) / (n_tgt + v)))
    s_tonly = math.floor(1e6 * math.log((ct["tonly"] + 1.0) / 1.0))
    assert row.importance_micronats == 2 * s_tonly + 2 * s_norm


def test_resave_reopened_model_to_same_path(frames, tmp_path):
    raw, tgt = frames
    path = str(tmp_path / "same")
    model = sampling.fit_importance_model(raw, tgt)
    sampling.save_importance_model(model, path)
    reopened = sampling.load_importance_model(raw.sparkSession, path)
    # the staged write must not delete the files its own plan reads
    sampling.save_importance_model(reopened, path)
    again = sampling.load_importance_model(raw.sparkSession, path)
    scored = {
        r.doc_id: (r.n_features, r.importance_micronats)
        for r in sampling.score_with_model(again, raw).collect()
    }
    inline = {
        r.doc_id: (r.n_features, r.importance_micronats)
        for r in sampling.importance_scores(raw, tgt).collect()
    }
    assert scored == inline


def test_num_buckets_guard(frames):
    raw, tgt = frames
    for bad in (0, -4):
        with pytest.raises(ValueError, match="num_buckets"):
            sampling.importance_scores(raw, tgt, num_buckets=bad)
        with pytest.raises(ValueError, match="num_buckets"):
            sampling.fit_importance_model(raw, tgt, num_buckets=bad)


def test_streaming_importance_scores_drain(spark, tmp_path):
    """availableNow drain over a multi-shard drop dir: the landed
    per-batch scores equal score_with_model over the whole corpus, and
    a replayed batch rewrites its partition idempotently."""
    from sales_data_warehouse_spark.streaming import (
        score_documents_batch,
        start_streaming_importance_scores,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text", "lang", "source", "n_chars")
    model_path = str(tmp_path / "model")
    model = sampling.fit_importance_model(
        docs, docs.filter(F.col("lang") == "en")
    )
    sampling.save_importance_model(model, model_path)

    drop = str(tmp_path / "drop")
    docs.repartition(3).write.parquet(drop)
    out = str(tmp_path / "out")
    batches = []
    q = start_streaming_importance_scores(
        spark,
        drop,
        model_path,
        out,
        available_now=True,
        on_batch=lambda bid, n: batches.append((bid, n)),
    )
    q.awaitTermination(180)
    landed = {
        r.doc_id: (r.n_features, r.importance_micronats)
        for r in spark.read.parquet(f"{out}/scored").collect()
    }
    want = {
        r.doc_id: (r.n_features, r.importance_micronats)
        for r in sampling.score_with_model(model, docs).collect()
    }
    assert landed == want
    assert len(batches) >= 2  # one-file-per-trigger exercised replay shape
    # stateless replay: re-scoring an already-landed batch id rewrites
    # the same partition with the same rows
    reopened = sampling.load_importance_model(spark, model_path)
    n = score_documents_batch(
        spark, reopened, docs.limit(7), batches[0][0], out
    )
    assert n == 7
    relanded = spark.read.parquet(
        f"{out}/scored/batch_id={batches[0][0]}"
    ).count()
    assert relanded == 7


def test_resample_grouped_is_per_group_gumbel_replay(spark):
    # global fit, grouped draw: a row wins its group exactly when it
    # ranks top-k among its group's keys under the GLOBAL scoring
    raw_rows = [
        (1, "alpha beta", "a"),
        (2, "alpha alpha", "a"),
        (3, "delta epsilon", "a"),
        (4, "alpha gamma", "b"),
        (5, "omega psi", "b"),
        (6, "beta beta alpha", "b"),
    ]
    raw = spark.createDataFrame(
        raw_rows, "doc_id bigint, text string, grp string"
    )
    tgt = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(TGT)],
        "doc_id bigint, text string",
    )
    k = 2
    scores = _mirror_scores([(i, t) for i, t, _ in raw_rows], TGT)

    def key(i):
        u = (((i % HASH_P + HASH_P) % HASH_P) * HASH_A % 4294967296
             + 0.5) / 4294967296.0
        return scores[i][1] / 1e6 - math.log(-math.log(u))

    want = set()
    for grp in ("a", "b"):
        members = [i for i, _, g in raw_rows if g == grp]
        want |= set(
            sorted(members, key=lambda i: (-key(i), i))[:k]
        )
    got = sampling.importance_resample_grouped(raw, tgt, k, "grp")
    assert {r.doc_id for r in got.collect()} == want
    # raw columns survive, key stays out
    assert set(got.columns) == {
        "doc_id", "text", "grp", "n_features", "importance_micronats"
    }
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    with pytest.raises(ValueError, match="k \\(0\\)"):
        sampling.importance_resample_grouped(raw, tgt, 0, "grp")
    with pytest.raises(ValueError, match="group_cols"):
        sampling.importance_resample_grouped(raw, tgt, 1, [])


def test_streaming_scores_keep_null_text_and_guard_lineage(
    spark, tmp_path
):
    from sales_data_warehouse_spark.streaming import (
        score_documents_batch,
        start_streaming_importance_scores,
    )

    docs = spark.createDataFrame(
        RAW, "doc_id bigint, text string"
    )
    tgt = docs.filter(F.col("doc_id") <= 2)
    model_path = str(tmp_path / "m")
    sampling.save_importance_model(
        sampling.fit_importance_model(docs, tgt), model_path
    )
    model = sampling.load_importance_model(spark, model_path)
    # NULL-text docs land with NULL scores instead of vanishing, and
    # the returned count is the true batch size
    batch = docs.union(
        spark.createDataFrame([(99, None)], "doc_id bigint, text string")
    )
    out = str(tmp_path / "out")
    n = score_documents_batch(spark, model, batch, 0, out)
    assert n == 6
    landed = spark.read.parquet(f"{out}/scored/batch_id=0")
    row99 = landed.filter(F.col("doc_id") == 99).collect()[0]
    assert row99.n_features is None and row99.importance_micronats is None
    # lineage guard: same output_dir under a different checkpoint raises
    drop = str(tmp_path / "drop")
    docs.coalesce(1).write.parquet(drop)
    sout = str(tmp_path / "sout")
    q = start_streaming_importance_scores(
        spark, drop, model_path, sout,
        checkpoint_dir=str(tmp_path / "ckpt_a"), available_now=True,
    )
    q.awaitTermination(120)
    with pytest.raises(ValueError, match="lineage"):
        start_streaming_importance_scores(
            spark, drop, model_path, sout,
            checkpoint_dir=str(tmp_path / "ckpt_b"), available_now=True,
        )
    # same checkpoint restarts cleanly (no new files -> no batches)
    q2 = start_streaming_importance_scores(
        spark, drop, model_path, sout,
        checkpoint_dir=str(tmp_path / "ckpt_a"), available_now=True,
    )
    q2.awaitTermination(120)


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_WORDS = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "omega", "zeta", "psi"]
)
_TEXTS = st.lists(_WORDS, min_size=1, max_size=8).map(" ".join)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    raw_rows=st.lists(_TEXTS, min_size=1, max_size=8),
    tgt_rows=st.lists(_TEXTS, min_size=1, max_size=5),
    bigrams=st.booleans(),
)
def test_importance_scores_match_mirror_on_random_corpora(
    spark, raw_rows, tgt_rows, bigrams
):
    """Property: the integer micro-nat arithmetic is EXACTLY the Python
    mirror on arbitrary small corpora — any partitioning, any vocab
    overlap pattern, unigram or bigram bag. Floors of 1e6·ln(rational)
    agree because both engines compute the same IEEE ln of identical
    operands (the boundary-collision probability argument in the
    corpus entry's docstring)."""
    raw = spark.createDataFrame(
        list(enumerate(raw_rows)), "doc_id bigint, text string"
    )
    tgt = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(tgt_rows)],
        "doc_id bigint, text string",
    )
    got = {
        r.doc_id: (r.n_features, r.importance_micronats)
        for r in sampling.importance_scores(
            raw, tgt, bigrams=bigrams
        ).collect()
    }
    assert got == _mirror_scores(
        list(enumerate(raw_rows)), tgt_rows, bigrams=bigrams
    )


def _mirror_report(raw_docs, tgt_texts, top_k, sources=None):
    """Independent Python replay of importance_model_report: the full
    row set (section, key, rank, n, value_micronats). Python's // IS
    floor division, so the KL/avg rows independently pin the pmod
    floor-div identity the engines use."""
    import re

    def toks(t):
        return re.split(r"\s+", t.lower())

    cr, ct = Counter(), Counter()
    per_doc = {}
    for i, t in raw_docs:
        fs = toks(t)
        per_doc[i] = fs
        cr.update(fs)
    for t in tgt_texts:
        ct.update(toks(t))
    vocab = sorted(set(cr) | set(ct))
    v, n_raw, n_tgt = len(vocab), sum(cr.values()), sum(ct.values())
    s_norm = math.floor(1e6 * math.log((n_raw + v) / (n_tgt + v)))
    full = {
        f: math.floor(
            1e6 * math.log((ct.get(f, 0) + 1.0) / (cr.get(f, 0) + 1.0))
        )
        + s_norm
        for f in vocab
    }
    den = n_tgt + v
    contrib = {f: (ct.get(f, 0) + 1) * full[f] // den for f in vocab}
    rows = []
    for rank, f in enumerate(
        sorted(vocab, key=lambda f: (-full[f], f))[:top_k], 1
    ):
        rows.append(("top_target_feature", f, rank, ct.get(f, 0), full[f]))
    for rank, f in enumerate(
        sorted(vocab, key=lambda f: (full[f], f))[:top_k], 1
    ):
        rows.append(("top_raw_feature", f, rank, cr.get(f, 0), full[f]))
    for rank, f in enumerate(
        sorted(vocab, key=lambda f: (-contrib[f], f))[:top_k], 1
    ):
        rows.append(("kl_contribution", f, rank, ct.get(f, 0), contrib[f]))
    rows.append(("summary", "vocabulary_size", 1, v, s_norm))
    rows.append(
        (
            "summary",
            "kl_target_vs_raw_micronats",
            2,
            n_tgt,
            sum(contrib.values()),
        )
    )
    if sources:
        s_tbl = {
            f: math.floor(
                1e6 * math.log((ct.get(f, 0) + 1.0) / (c + 1.0))
            )
            for f, c in cr.items()
        }
        imp = {
            i: sum(s_tbl[f] for f in fs) + len(fs) * s_norm
            for i, fs in per_doc.items()
        }
        by_src = {}
        for i, im in imp.items():
            src = sources.get(i)
            if src is not None:
                by_src.setdefault(src, []).append(im)
        for rank, src in enumerate(sorted(by_src), 1):
            vals = by_src[src]
            n = len(vals)
            rows.append(
                ("source_avg_score", src, rank, n, sum(vals) // n)
            )
            rows.append(("source_min_score", src, rank, n, min(vals)))
            rows.append(("source_max_score", src, rank, n, max(vals)))
    return set(rows)


def test_model_report_matches_python_mirror(spark):
    sources = {1: "web", 2: "web", 3: "wiki", 4: None, 5: "wiki"}
    raw = spark.createDataFrame(
        [(i, t, sources[i]) for i, t in RAW],
        "doc_id bigint, text string, source string",
    )
    tgt = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(TGT)],
        "doc_id bigint, text string",
    )
    got = {
        (r.section, r.key, r.rank, r.n, r.value_micronats)
        for r in sampling.importance_model_report(
            raw, tgt, top_k=4, source_col="source"
        ).collect()
    }
    assert got == _mirror_report(RAW, TGT, 4, sources)
    # penalized features exist, so the floor-division branch for
    # negative numerators is genuinely exercised
    assert any(
        v < 0 for (s, _, _, _, v) in got if s == "kl_contribution"
    )


def test_model_report_without_sources_and_guard(frames):
    raw, tgt = frames
    rows = sampling.importance_model_report(raw, tgt, top_k=3).collect()
    sections = {r.section for r in rows}
    assert sections == {
        "top_target_feature", "top_raw_feature",
        "kl_contribution", "summary",
    }
    with pytest.raises(ValueError, match="top_k"):
        sampling.importance_model_report(raw, tgt, top_k=0)


def test_model_report_empty_fit_raises(spark):
    """r12 ADVICE: an empty counts frame (both corpora empty or
    all-NULL text) used to emit summary rows with NULL value_micronats
    (SUM over zero rows); the fit now fails fast instead."""
    empty = spark.createDataFrame([], "doc_id long, text string")
    nulls = spark.createDataFrame(
        [(1, None), (2, None)], "doc_id long, text string"
    )
    for raw, tgt in [(empty, empty), (nulls, nulls)]:
        with pytest.raises(ValueError, match="empty fit"):
            sampling.importance_model_report(raw, tgt, top_k=3)
        # the fit itself guards identically (r13): a NULL s_norm would
        # otherwise surface as a cryptic arithmetic error at score time
        with pytest.raises(ValueError, match="empty fit"):
            sampling.fit_importance_model(raw, tgt)


def test_model_report_hashed_mode_runs_bucket_keys(frames):
    raw, tgt = frames
    rows = sampling.importance_model_report(
        raw, tgt, top_k=3, num_buckets=8
    ).collect()
    keys = {
        r.key for r in rows if r.section == "top_target_feature"
    }
    # hashed mode's feature keys are stringified bucket ids
    assert keys and all(k.isdigit() for k in keys)
    vocab_n = [
        r.n for r in rows
        if (r.section, r.key) == ("summary", "vocabulary_size")
    ]
    assert vocab_n and vocab_n[0] <= 8


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    raw_rows=st.lists(_TEXTS, min_size=1, max_size=8),
    tgt_rows=st.lists(_TEXTS, min_size=1, max_size=5),
    top_k=st.integers(min_value=1, max_value=6),
)
def test_model_report_matches_mirror_on_random_corpora(
    spark, raw_rows, tgt_rows, top_k
):
    """Property: the report's COMPLETE row set — section top-ks with
    their tie-broken ranks, floored KL contributions (negative
    numerators included), the summary rows, and the per-source
    avg/min/max — is exactly the Python mirror on arbitrary small
    corpora at arbitrary top_k. Any vocab overlap pattern exercises
    the UNION-vocabulary full-outer counts (target-only and raw-only
    features both rank)."""
    sources = {i: f"s{i % 2}" for i in range(len(raw_rows))}
    raw = spark.createDataFrame(
        [(i, t, sources[i]) for i, t in enumerate(raw_rows)],
        "doc_id bigint, text string, source string",
    )
    tgt = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(tgt_rows)],
        "doc_id bigint, text string",
    )
    got = {
        (r.section, r.key, r.rank, r.n, r.value_micronats)
        for r in sampling.importance_model_report(
            raw, tgt, top_k=top_k, source_col="source"
        ).collect()
    }
    assert got == _mirror_report(
        list(enumerate(raw_rows)), tgt_rows, top_k, sources
    )
