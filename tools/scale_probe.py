"""Operator scale probe over the synthetic DataSource.

Generates documents/events at an arbitrary row count (no disk) and
times representative operators, printing one JSON line. Use to check an
operator's behavior beyond the shipped testdata scales:

    python tools/scale_probe.py 1000000

Probes share one session, so accumulated JVM state (old-gen growth,
un-GC'd shuffle/broadcast state from earlier probes) can inflate LATE
probes and masquerade as super-linear scaling. Measured at 1M rows:
``bm25_topk`` read 72.6 s as the 8th probe of a shared run vs 18.2 s
isolated on the same code and rows — a 4x distortion entirely from
probe ORDER. The loop now clears the cache and forces a JVM GC between
probes (Spark's ContextCleaner piggybacks on GC, so this also reclaims
dead shuffle/broadcast state); when a single probe still looks
super-linear, re-measure it ISOLATED before believing the number.

``--steady`` (protocol v2, introduced end of r14): measure each probe
on a SECOND pass from the same cleaned state — the first pass becomes
a warm-up, reported separately as ``first_pass``. The steady number is
the operator's marginal cost (what a long-running cluster job pays per
repetition); the cold number keeps the fixed-cost story. Introduced
because three consecutive round sweeps each produced one late-position
outlier (bm25 4x r12, minhash_lsh_pairs 3.4x r13, blocking_stats 2x
r14) that a hand-run warm re-measure adjudicated away every time.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from sales_data_warehouse_spark.operators import (  # noqa: E402
    dedup,
    sampling,
    text,
    timeseries,
)
from sales_data_warehouse_spark.session import get_spark  # noqa: E402
from sales_data_warehouse_spark.sources.synthetic import register  # noqa: E402


def main() -> None:
    argv = [a for a in sys.argv[1:] if a != "--steady"]
    rows = int(argv[0]) if len(argv) > 0 else 1_000_000
    parts = int(argv[1]) if len(argv) > 1 else 64
    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    register(spark)

    docs = (
        spark.read.format("sdw_synth")
        .option("table", "documents").option("rows", rows)
        .option("partitions", parts).load()
    )
    events = (
        spark.read.format("sdw_synth")
        .option("table", "events").option("rows", rows)
        .option("partitions", parts).load()
    )

    # one-time setup for the incremental-fold probe: the fingerprint
    # state of the whole synthetic corpus, persisted the way the
    # streaming fold reads it (parquet, re-read per call so the probe
    # pays the real scan — setup cost stays outside the timing)
    import tempfile

    fp_state_dir = tempfile.mkdtemp(prefix="probe_fp_state_") + "/fp"
    dedup.exact_duplicates(docs).write.mode("overwrite").parquet(
        fp_state_dir
    )

    probes = {
        "dedup_exact": lambda: dedup.exact_duplicates(docs),
        # the streaming dedup fold's per-batch cost at corpus-sized
        # state: 1k-doc batch anti-joined against the |docs| fp state,
        # delta mode (late r14 — the O(batch) state-write payload);
        # scaling with `rows` isolates the probe join's state term
        "dedup_incremental_delta": lambda: dedup.incremental_exact_dedup(
            docs.limit(1000), spark.read.parquet(fp_state_dir),
            delta=True,
        )[1],
        "minhash_lsh_pairs": lambda: dedup.minhash_lsh_pairs(docs),
        "simhash_pairs": lambda: dedup.simhash_near_pairs(
            docs, max_hamming=3, blocks=6
        ),
        "text_quality": lambda: text.text_quality(docs),
        "repetition_stats": lambda: text.repetition_stats(docs),
        "funnel": lambda: timeseries.funnel_conversion(
            events, ("view", "click", "purchase"), within_hours=24
        ),
        "sessionize_agg": lambda: events.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"), F.sum("value").alias("v")
        ),
        "bm25_topk": lambda: text.bm25_topk(
            docs, ["spark", "window", "hash"], k=10
        ),
        "epoch_shuffle": lambda: sampling.epoch_shuffle(
            docs, epoch=1, n_shards=64
        ),
        "quality_logit": lambda: text.quality_logit(docs),
        # r9: the PassJoin fuzzy family in production shape (blocked)
        "edit_distance_pairs": lambda: dedup.edit_distance_near_pairs(
            docs, max_dist=2, prefix_chars=32, block_col="source"
        ),
        # r9: the blocking-selectivity diagnostic — its "safe on the
        # full corpus" claim probed beyond the shipped testdata
        "blocking_stats_shingles": lambda: dedup.blocking_stats_df(
            dedup.exploded_shingles(docs, "text", "doc_id", 3),
            ["shingle"],
        ),
        # r9: the blocking-RECALL audit in its production shape — a
        # 2-permille deterministic doc sample bounds the quadratic
        # truth set (the docstring's 100 TB recipe, demonstrated):
        # cost should track the SAMPLE, staying near-flat as the
        # corpus grows at fixed permille
        "blocking_recall_sampled": lambda: (
            lambda smp: dedup.blocking_recall_stats_df(
                dedup.ngram_jaccard_pairs(
                    smp, threshold=0.1, warn_uncapped=False
                ).select("doc_a", "doc_b"),
                dedup.exploded_shingles(smp, "text", "doc_id", 3),
                ["shingle"],
            )
        )(
            docs.filter(
                sampling.permille_hash(F.col("doc_id")) < 2
            )
        ),
        # r10: the A-ES weighted sampler — its global top-k must stay
        # a TakeOrderedAndProject (map-side partial top-k, never a
        # full sort), so the probe should scale with the scan
        "weighted_sample_topk": lambda: sampling.weighted_sample_topk(
            docs.withColumn("w", F.length("text").cast("double")),
            "w",
            1000,
        ),
        # r10: the cross-corpus MinHash R-S join on an even/odd id
        # split — cost should track the two sides' signature builds
        # (one explode + one map-side-combined groupBy each) plus the
        # banded bucket join, same class as the self-join probe above
        "minhash_lsh_join": lambda: dedup.minhash_lsh_join(
            docs.filter(F.col("doc_id") % 2 == 0),
            docs.filter(F.col("doc_id") % 2 == 1),
        ),
        # r11: the exact-verify dial — adds the candidate x shingle-set
        # rescoring join on top of the probe above; the delta IS the
        # price of continuous precision at this corpus size
        "minhash_lsh_join_exact": lambda: dedup.minhash_lsh_join(
            docs.filter(F.col("doc_id") % 2 == 0),
            docs.filter(F.col("doc_id") % 2 == 1),
            verify="exact",
        ),
        # r11: the per-group sampler — one group-keyed shuffle +
        # WindowGroupLimit rank truncation; should scale with the scan
        # plus the bounded shuffle, far under any sort of the corpus
        "weighted_sample_grouped": lambda: (
            sampling.weighted_sample_topk_grouped(
                docs.withColumn(
                    "w", F.length("text").cast("double")
                ),
                "w",
                1000,
                "lang",
            )
        ),
        # r11: DSIR resampling, exact-vocabulary mode (the corpus
        # entry's shape) — two token explodes + hash aggregates + the
        # vocab-keyed score join + TakeOrderedAndProject
        "importance_resample_exact": lambda: sampling.importance_resample(
            docs, docs.filter(F.col("lang") == "en"), 1000
        ),
        # r11: the 100 TB mode — hashed unigram+bigram features into
        # 10k buckets (the paper's own regime); the score table
        # broadcasts, so the vocab shuffle disappears and the delta
        # vs the exact probe is what the broadcast buys back (bigrams
        # DOUBLE the token volume here, so at-or-under exact-unigram
        # time means the mode is paying for itself)
        "importance_resample_hashed": lambda: sampling.importance_resample(
            docs,
            docs.filter(F.col("lang") == "en"),
            1000,
            num_buckets=10_000,
            bigrams=True,
        ),
        # r11: the per-group draw — same global scoring, the draw via
        # one group-keyed shuffle + WindowGroupLimit rank truncation;
        # delta vs the global probe is the grouped window's cost
        "importance_resample_grouped": lambda: (
            sampling.importance_resample_grouped(
                docs, docs.filter(F.col("lang") == "en"), 1000, "lang"
            )
        ),
        # r12: the fit diagnostic (corpus-entry shape — exact vocab,
        # per-source section): the two-corpus fit once
        # (localCheckpoint), then vocabulary-sized section aggregates
        # + one doc-keyed aggregate for the source rows; the delta vs
        # the exact resample probe is what the report adds on top of
        # a fit at the same token volume
        "importance_model_report": lambda: (
            sampling.importance_model_report(
                docs,
                docs.filter(F.col("lang") == "en"),
                top_k=10,
                source_col="source",
            )
        ),
        # r12: the 100 TB mode of the same report — hashed
        # unigram+bigram features into 10k buckets; everything after
        # the two scans is bucket-table-sized
        "importance_model_report_hashed": lambda: (
            sampling.importance_model_report(
                docs,
                docs.filter(F.col("lang") == "en"),
                top_k=10,
                source_col="source",
                num_buckets=10_000,
                bigrams=True,
            )
        ),
        # r13: the trainable quality classifier, fit+apply — LBFGS
        # over 3-feature vectors (treeAggregate reductions per
        # iteration, nothing corpus-sized on the driver) on a
        # 2-permille deterministic seed sample (the labeled-seed-set
        # production shape: seeds are small, corpora are not), then
        # the exported integer weights applied corpus-wide through
        # quality_logit's single-scan projection
        "quality_classifier_fit_apply": lambda: (
            lambda seed: text.score_with_classifier(
                docs,
                text.fit_quality_classifier(
                    seed,
                    seed.select(
                        "doc_id",
                        (F.col("lang") == "en").alias("label"),
                    ),
                ),
            )
        )(
            docs.filter(
                sampling.permille_hash(F.col("doc_id")) < 2
            )
        ),
        "quality_ngram_fit_apply": lambda: (
            lambda seed: text.score_with_ngram_classifier(
                docs,
                text.fit_quality_classifier_ngrams(
                    seed,
                    seed.select(
                        "doc_id",
                        (F.col("lang") == "en").alias("label"),
                    ),
                    num_buckets=4096,
                ),
            )
        )(
            docs.filter(
                sampling.permille_hash(F.col("doc_id")) < 2
            )
        ),
    }
    steady = "--steady" in sys.argv[1:]
    if len(argv) > 2:  # optional probe-name filter: a,b,c
        only = set(argv[2].split(","))
        unknown = only - set(probes)
        assert not unknown, f"unknown probes: {sorted(unknown)}"
        probes = {k: v for k, v in probes.items() if k in only}
    out = {}
    first_pass = {}
    for name, make in probes.items():
        # isolate probes from each other: drop any cache the previous
        # operator left and force a GC so the ContextCleaner reclaims
        # its shuffle/broadcast state — without this, late probes pay
        # for earlier ones (see module docstring: 4x on bm25)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        make().write.format("noop").mode("overwrite").save()
        out[name] = round(time.perf_counter() - t0, 2)
        if steady:
            # protocol v2 (--steady): the pass above becomes a
            # warm-up and the probe is measured AGAIN from the same
            # cleaned state, so the reported number is the operator's
            # steady-state cost — not first-action codegen, not the
            # previous probe's GC debris. The r12–r14 sweeps each
            # produced one late-position outlier (bm25 4x, minhash
            # 3.4x, blocking_stats 2x) that an isolated warm re-run
            # adjudicated away by hand; --steady builds that
            # adjudication into the measurement. The cold first pass
            # is kept in the output for the fixed-cost story.
            first_pass[name] = out[name]
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            make().write.format("noop").mode("overwrite").save()
            out[name] = round(time.perf_counter() - t0, 2)
    res = {"rows": rows, "partitions": parts, "probes": out}
    if steady:
        res["protocol"] = "steady-v2"
        res["first_pass"] = first_pass
    print(json.dumps(res))


if __name__ == "__main__":
    main()
