"""Streaming document dedup: a drop-directory stream of document
parquet files, each micro-batch deduplicated against the persisted
fingerprint state of everything admitted so far.

This is the streaming shape of ``dedup.incremental_exact_dedup`` — the
ingestion front door of a growing pre-training corpus: per batch the
work is O(batch) fingerprinting plus one join against the fingerprint
table; admitted history is never re-read or re-hashed.

Replay safety follows the module conventions (see
``streaming/dimensions.py``): admitted docs land in a ``batch_id=N``
directory with per-batch overwrite; the fingerprint state swaps in as
one ``staged_overwrite_dir`` generation (``fingerprints/fp`` plus a
``_last_batch`` high-water mark, landed atomically by the finalize
hook) AFTER the admitted write. A replayed batch either recomputes
identically (crash before the state swap — the mark still reads the
previous batch) or is skipped by an O(1) mark comparison (crash after
the swap but before the checkpoint commit) — the one case where
recomputing would wrongly admit nothing and overwrite the batch's
output with an empty directory. Pre-r14 states (flat parquet, no
mark) are detected by a one-time state-sized containment fallback and
migrated to the marked layout on their next fold.

One shared caveat (inherited from ``staged_overwrite``, see its
docstring): a crash INSIDE the two-rename swap window can leave the
state path absent with the previous state preserved at
``<path>.stage_old``. Treating that as "no state yet" would rebuild
from nothing — since round 11 every fold calls
``compaction.recover_staged`` before reading its state, restoring the
pre-swap table automatically (previously documented as a manual
rename; the automation closes the same silent-reset mode the r11
review flagged in the weighted-reservoir fold).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sales_data_warehouse_spark.operators.dedup import (
    incremental_exact_dedup,
)
from sales_data_warehouse_spark.sources.compaction import (
    enforce_output_lineage,
    fs_exists,
    fs_read_text,
    fs_write_text,
    recover_staged,
    staged_overwrite,
    staged_overwrite_dir,
)

#: documents-table schema (streaming sources need it declared).
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_documents_stream(
    spark: SparkSession, drop_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over a documents drop directory (parquet).
    One file per trigger by default so multi-file backfills exercise
    the batch-over-batch state path instead of collapsing into one
    giant batch."""
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(drop_dir)
    )


def dedup_documents_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    output_dir: str,
) -> None:
    """Fold one micro-batch through the fingerprint state. Exposed as a
    plain function (the ``foreachBatch`` sink calls it) so replay
    semantics are directly testable without driving a stream.

    Replay detection is O(1) since r14: the state directory carries a
    ``_last_batch`` high-water mark written into the staging directory
    by ``staged_overwrite_dir``'s finalize hook, so the mark lands
    ATOMICALLY with the fingerprint table it describes — mark present
    and >= batch_id iff this batch's fingerprints are already merged.
    The pre-r14 detection anti-joined the batch against the FULL
    fingerprint table, which is state-sized work at 100 TB state for a
    check that runs on every crash replay; it survives below only as
    the fallback for a legacy flat-layout state (no mark yet — the
    first fold migrates the layout and retires the fallback for good).
    Crash windows: before the state swap the mark is the old one, the
    replay recomputes identically (admitted overwrite is idempotent);
    after the swap the mark skips the batch outright, protecting the
    admitted output from the empty-recompute clobber the detection
    exists for."""
    admitted_path = f"{output_dir}/admitted/batch_id={batch_id}"
    state_path = f"{output_dir}/fingerprints"

    # restore a mid-swap-crashed state swap before reading (module
    # docstring) — a missing state dir must never read as "first batch"
    recover_staged(spark, state_path)
    if fs_exists(spark, f"{state_path}/fp"):
        prior, legacy = spark.read.parquet(f"{state_path}/fp"), False
    elif fs_exists(spark, state_path):
        # pre-r14 flat layout (fingerprint parquet directly under the
        # state path, no high-water mark)
        prior, legacy = spark.read.parquet(state_path), True
    else:
        prior, legacy = None, False
    if prior is not None and fs_exists(spark, admitted_path):
        mark = fs_read_text(spark, f"{state_path}/_last_batch")
        try:
            if mark is not None and int(mark) >= batch_id:
                return  # state already contains this batch: O(1) skip
        except ValueError:
            pass  # unreadable mark: fall through to recompute/fallback
        if legacy:
            # legacy state carries no mark; one state-sized
            # containment check, after which the fold below migrates
            # the layout and the mark takes over
            batch_fps = batch_df.select(
                F.md5(F.col("text")).alias("fp")
            ).distinct()
            if batch_fps.join(prior, "fp", "left_anti").count() == 0:
                return
    fresh, state = incremental_exact_dedup(batch_df, prior)
    fresh.write.mode("overwrite").parquet(admitted_path)
    # one atomic whole-directory swap: the new fingerprint table and
    # the high-water mark that vouches for it land together or not at
    # all (the staged_overwrite_dir contract — its part writes may
    # lazily read the live {state_path}/fp, which survives untouched
    # until the new generation is complete, so no materialization
    # barrier is needed)
    staged_overwrite_dir(
        spark,
        {"fp": (state, None)},
        state_path,
        finalize=lambda tmp: fs_write_text(
            spark, f"{tmp}/_last_batch", str(batch_id)
        ),
    )


def start_streaming_doc_dedup(
    spark: SparkSession,
    drop_dir: str,
    output_dir: str,
    checkpoint_dir: str | None = None,
    available_now: bool = False,
    max_files_per_trigger: int = 1,
):
    """Continuous drop-dir -> deduplicated corpus: admitted (first-seen)
    documents land per batch under ``admitted/batch_id=N``; the
    fingerprint table under ``fingerprints`` always reflects everything
    admitted. Readers scan ``admitted/`` (batch_id appears as a
    partition column). Returns the StreamingQuery.

    ONE OUTPUT DIR = ONE CHECKPOINT LINEAGE
    (``compaction.enforce_output_lineage``): this sink is the guard's
    motivating case — besides the batch_id-partition mixing every
    ``foreachBatch`` sink risks, its ``_last_batch`` high-water mark
    would make a NEW lineage's early batches (ids restarting at 0,
    below the old mark) read as already-merged replays and be skipped
    outright: permanent, unreported document loss."""
    checkpoint = checkpoint_dir or f"{output_dir}/_dedup_checkpoint"
    enforce_output_lineage(
        spark, output_dir, checkpoint, "start_streaming_doc_dedup"
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        dedup_documents_batch(spark, batch_df, batch_id, output_dir)

    stream = read_documents_stream(spark, drop_dir, max_files_per_trigger)
    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def near_dedup_documents_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    output_dir: str,
) -> None:
    """Fold one micro-batch through the MinHash band state: emit the
    near-dup pairs this batch introduces (within-batch + new-vs-seen)
    under ``pairs/batch_id=N`` and update the persisted band table.

    Replay safety differs from the exact-dedup sink: recomputing a
    batch whose state already merged is harmless FOR THE
    CHECKPOINT-DRIVEN REPLAY CASES — the probe side unions new and
    seen rows, and pair canonicalization dedups, so the replay emits
    the identical pair set; only the state union would double its
    rows, which the pre-write ``dropDuplicates`` on (doc, band) makes
    idempotent (bucket and signature are pure functions of the doc).
    No skip-detection needed for those. The module docstring's
    ``staged_overwrite`` swap-window caveat is handled the same way as
    the exact fold: ``recover_staged`` restores a mid-swap-crashed
    state before it is read.
    """
    from sales_data_warehouse_spark.operators.dedup import (
        incremental_minhash_lsh,
    )

    state_path = f"{output_dir}/band_state"
    recover_staged(spark, state_path)
    prior = (
        spark.read.parquet(state_path)
        if fs_exists(spark, state_path)
        else None
    )
    pairs, state = incremental_minhash_lsh(batch_df, prior)
    pairs.write.mode("overwrite").parquet(
        f"{output_dir}/pairs/batch_id={batch_id}"
    )
    staged_overwrite(
        spark,
        state.dropDuplicates(["doc", "band"]).localCheckpoint(),
        state_path,
    )


def start_streaming_near_dedup(
    spark: SparkSession,
    drop_dir: str,
    output_dir: str,
    checkpoint_dir: str | None = None,
    available_now: bool = False,
    max_files_per_trigger: int = 1,
):
    """Continuous near-duplicate detection over a document drop
    directory: each micro-batch is MinHash-banded once and probed
    against the persisted band state; the unioned ``pairs/`` output
    equals a full-corpus ``minhash_lsh_pairs`` run over everything
    drained so far (the incremental operator's property). Returns the
    StreamingQuery.

    ONE OUTPUT DIR = ONE CHECKPOINT LINEAGE
    (``compaction.enforce_output_lineage``): a second lineage over the
    same ``pairs/`` would overwrite ``batch_id=0`` with new-lineage
    pairs while stale partitions 1..N persist — and its re-probed
    batches would emit pairs the old lineage already emitted, so the
    unioned read-back double-counts."""
    checkpoint = checkpoint_dir or f"{output_dir}/_near_dedup_checkpoint"
    enforce_output_lineage(
        spark, output_dir, checkpoint, "start_streaming_near_dedup"
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        near_dedup_documents_batch(spark, batch_df, batch_id, output_dir)

    stream = read_documents_stream(spark, drop_dir, max_files_per_trigger)
    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_streaming_quality_scores(
    spark: SparkSession,
    drop_dir: str,
    classifier_path: str,
    output_dir: str,
    keep_threshold_milli: int = 0,
    checkpoint_dir: str | None = None,
    available_now: bool = False,
    max_files_per_trigger: int = 1,
):
    """Continuous drop-dir → quality-scored documents with a FITTED
    classifier (the streaming twin of
    ``text.score_with_classifier``; fit once offline with
    ``fit_quality_classifier``, persist, score every arriving shard).

    Unlike the DSIR scorer (``streaming.sampling
    .start_streaming_importance_scores``), this needs NO
    ``foreachBatch``: the apply side is a stateless single-scan
    integer projection — no join, no aggregate, no cross-batch state —
    so it composes as a PURE streaming plan
    (``readStream → projection → writeStream`` append sink), which
    buys exactly-once parquet output from the file-sink commit log
    instead of hand-rolled per-batch idempotence. The model's milli
    weights are read ONCE at start (a 1-row parquet) and baked into
    the plan as literals: long-running streams never re-read the
    model, and there is nothing vocabulary-sized to broadcast.

    Output schema is ``quality_logit``'s (id, n_tokens, punct_ppm,
    stop_ppm, logit_milli, keep) at ``{output_dir}/scored``; read it
    back any time with ``spark.read.parquet``. Returns the
    StreamingQuery.

    ONE OUTPUT DIR = ONE CHECKPOINT LINEAGE
    (``compaction.enforce_output_lineage``): a pure-plan file sink is
    not exempt — its ``_spark_metadata`` commit log lives INSIDE the
    output path and outlives the checkpoint, so a restart under a
    fresh checkpoint sees the old log's committed batch ids and
    silently SKIPS the new lineage's early batches (FileStreamSink
    treats "batch N committed" as "already written"). Refused at
    start instead."""
    from sales_data_warehouse_spark.operators.text import (
        load_quality_classifier,
        score_with_classifier,
    )

    checkpoint = checkpoint_dir or f"{output_dir}/_quality_checkpoint"
    enforce_output_lineage(
        spark, output_dir, checkpoint, "start_streaming_quality_scores"
    )

    clf = load_quality_classifier(spark, classifier_path)
    stream = read_documents_stream(spark, drop_dir, max_files_per_trigger)
    scored = score_with_classifier(
        stream, clf, keep_threshold_milli=keep_threshold_milli
    )
    writer = (
        scored.writeStream.format("parquet")
        .option("path", f"{output_dir}/scored")
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_streaming_ngram_quality_scores(
    spark: SparkSession,
    drop_dir: str,
    classifier_path: str,
    output_dir: str,
    keep_threshold_milli: int = 0,
    checkpoint_dir: str | None = None,
    available_now: bool = False,
    max_files_per_trigger: int = 1,
):
    """Continuous drop-dir → content-quality-scored documents with a
    FITTED n-gram classifier (r14; the streaming twin of
    ``text.score_with_ngram_classifier`` — fit once offline with
    ``fit_quality_classifier_ngrams``, persist, score every arriving
    shard against the frozen model).

    Why ``foreachBatch`` and not the scalar scorer's pure streaming
    plan (``start_streaming_quality_scores``): the n-gram score is a
    grouped aggregate over the exploded features — one integer sum per
    document — and a streaming groupBy would hold every document's
    partial state forever (Spark cannot know a document never spans
    micro-batches). Inside ``foreachBatch`` the batch is a plain
    DataFrame: the aggregate completes per trigger, the weight side is
    model-sized and broadcast, and the per-batch work is O(batch).
    The classifier is loaded ONCE at start (weights live in the
    driver-side model object, re-materialized as a tiny local frame
    per batch — nothing vocabulary-scanning per trigger). Scored rows
    land under ``scores/batch_id=N`` with per-batch overwrite; replay
    is idempotent because scoring is stateless.

    ONE OUTPUT DIR = ONE CHECKPOINT LINEAGE
    (``compaction.enforce_output_lineage``, shared by every streaming
    starter in the package with lineage-keyed output — same hazard
    everywhere: ``batch_id`` is unique only within a checkpoint
    lineage, and mixing lineages under one ``scores/`` corrupts
    read-back silently). Returns the StreamingQuery; read the scored
    corpus back any time with
    ``spark.read.parquet(f"{output_dir}/scores")``."""
    from pyspark import StorageLevel

    from sales_data_warehouse_spark.operators.text import (
        load_ngram_classifier,
        ngram_weight_table,
        score_with_ngram_classifier,
    )

    checkpoint = checkpoint_dir or f"{output_dir}/_ngram_checkpoint"
    enforce_output_lineage(
        spark, output_dir, checkpoint,
        "start_streaming_ngram_quality_scores",
    )

    clf = load_ngram_classifier(spark, classifier_path)
    # materialize the model's weight table ONCE (the importance
    # scorer's pattern): without this every trigger pays the
    # driver-side sort + Python-to-JVM ship of the full weight dict —
    # per FILE at the default one-file trigger, and vocabulary-sized
    # at fastText bucket counts
    wt = ngram_weight_table(spark, clf).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    wt.count()

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        score_with_ngram_classifier(
            batch_df, clf,
            keep_threshold_milli=keep_threshold_milli,
            weights_df=wt,
        ).write.mode("overwrite").parquet(
            f"{output_dir}/scores/batch_id={batch_id}"
        )

    stream = read_documents_stream(spark, drop_dir, max_files_per_trigger)
    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
