"""Streaming document dedup: the drained stream must admit exactly the
first-seen copy of every distinct text (matching the batch
``exact_duplicates`` answer), keep fingerprint state consistent, and a
replayed micro-batch must not lose or duplicate admitted output.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sales_data_warehouse_spark.streaming.documents import (
    dedup_documents_batch,
    start_streaming_doc_dedup,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "unit", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


@pytest.fixture()
def batches(spark):
    b1 = _docs(spark, [(1, "alpha text"), (2, "beta text"),
                       (3, "alpha text")])
    b2 = _docs(spark, [(4, "beta text"), (5, "gamma text"),
                       (6, "gamma text")])
    return b1, b2


def test_batches_admit_first_seen_only(spark, batches, tmp_path):
    out = str(tmp_path / "dedup")
    b1, b2 = batches
    dedup_documents_batch(spark, b1, 0, out)
    dedup_documents_batch(spark, b2, 1, out)
    admitted = spark.read.parquet(f"{out}/admitted")
    got = {
        r["doc_id"]: r["text"] for r in admitted.collect()
    }
    # first-seen copies only: 3 (dup of 1), 4 (dup of 2), 6 (dup of 5)
    assert got == {1: "alpha text", 2: "beta text", 5: "gamma text"}
    state = spark.read.parquet(f"{out}/fingerprints/fp")
    assert state.count() == 3
    assert set(
        r["canonical_id"] for r in state.collect()
    ) == {1, 2, 5}


def test_replay_after_full_commit_is_a_noop(spark, batches, tmp_path):
    out = str(tmp_path / "dedup")
    b1, b2 = batches
    dedup_documents_batch(spark, b1, 0, out)
    dedup_documents_batch(spark, b2, 1, out)
    before = sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{out}/admitted").collect()
    )
    # crash between state rename and checkpoint commit: batch 1 replays
    dedup_documents_batch(spark, b2, 1, out)
    after = sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{out}/admitted").collect()
    )
    assert after == before  # no loss, no duplicates
    assert spark.read.parquet(f"{out}/fingerprints/fp").count() == 3


def test_replay_before_state_commit_recomputes_identically(
    spark, batches, tmp_path
):
    out = str(tmp_path / "dedup")
    b1, b2 = batches
    dedup_documents_batch(spark, b1, 0, out)
    # simulate a crash AFTER the admitted write but BEFORE the state
    # rename: write batch 2's admitted dir by hand, leave state at b1
    fresh = _docs(spark, [(5, "gamma text")])
    fresh.write.mode("overwrite").parquet(f"{out}/admitted/batch_id=1")
    dedup_documents_batch(spark, b2, 1, out)  # the replay
    admitted = spark.read.parquet(f"{out}/admitted")
    assert sorted(r["doc_id"] for r in admitted.collect()) == [1, 2, 5]
    assert spark.read.parquet(f"{out}/fingerprints/fp").count() == 3


def test_replay_skips_via_high_water_mark(spark, batches, tmp_path):
    """r14: replay detection is an O(1) mark comparison, not a
    state-sized anti-join — the ``_last_batch`` mark lands atomically
    with the fingerprint generation (finalize hook inside the staged
    swap) and a replayed batch is skipped without touching the batch
    data at all. Proven by replaying a POISONED batch frame: the
    pre-r14 containment check would have joined it (and found fresh
    fingerprints, wrongly recomputing); the mark path must return
    before any read of the batch."""
    from sales_data_warehouse_spark.sources.compaction import (
        fs_read_text,
    )

    out = str(tmp_path / "dedup")
    b1, b2 = batches
    dedup_documents_batch(spark, b1, 0, out)
    dedup_documents_batch(spark, b2, 1, out)
    assert fs_read_text(spark, f"{out}/fingerprints/_last_batch") == "1"
    before = sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{out}/admitted").collect()
    )
    poisoned = _docs(spark, [(99, "never seen text")])
    dedup_documents_batch(spark, poisoned, 1, out)  # replay of batch 1
    after = sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{out}/admitted").collect()
    )
    assert after == before  # skipped outright — nothing recomputed
    assert spark.read.parquet(f"{out}/fingerprints/fp").count() == 3


def test_legacy_flat_state_migrates_and_gains_mark(spark, batches, tmp_path):
    """A pre-r14 state (flat fingerprint parquet, no mark) is read via
    the containment fallback exactly once: the next fold migrates it
    to the marked ``fp`` layout, after which replays skip by mark."""
    import shutil

    from sales_data_warehouse_spark.sources.compaction import (
        fs_read_text,
    )

    out = str(tmp_path / "dedup")
    b1, b2 = batches
    dedup_documents_batch(spark, b1, 0, out)
    # rebuild the pre-r14 layout by hand: flat parquet, no mark
    legacy = str(tmp_path / "legacy_fp")
    spark.read.parquet(f"{out}/fingerprints/fp").write.parquet(legacy)
    shutil.rmtree(f"{out}/fingerprints")
    shutil.move(legacy, f"{out}/fingerprints")
    # replay batch 0 against the legacy state: containment fallback
    # detects the fully-merged batch and skips (no clobber)
    dedup_documents_batch(spark, b1, 0, out)
    assert sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{out}/admitted").collect()
    ) == [1, 2]
    # next real fold migrates the layout and stamps the mark
    dedup_documents_batch(spark, b2, 1, out)
    assert fs_read_text(spark, f"{out}/fingerprints/_last_batch") == "1"
    assert spark.read.parquet(f"{out}/fingerprints/fp").count() == 3
    assert sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{out}/admitted").collect()
    ) == [1, 2, 5]


def test_streamed_drain_matches_batch_dedup(spark, tmp_path):
    drop = tmp_path / "drop"
    drop.mkdir()
    out = str(tmp_path / "dedup")
    # two files -> two micro-batches (maxFilesPerTrigger=1)
    _docs(spark, [(1, "t one"), (2, "t two"), (3, "t one")]).coalesce(
        1
    ).write.parquet(str(drop / "f1.parquet"))
    _docs(spark, [(4, "t two"), (5, "t three")]).coalesce(1).write.parquet(
        str(drop / "f2.parquet")
    )
    q = start_streaming_doc_dedup(
        spark, str(drop) + "/*", out, available_now=True
    )
    q.awaitTermination(120)
    admitted = spark.read.parquet(f"{out}/admitted")
    texts = sorted(r["text"] for r in admitted.collect())
    assert texts == ["t one", "t three", "t two"]
    # fingerprints cover every distinct text exactly once
    fps = spark.read.parquet(f"{out}/fingerprints/fp")
    assert fps.count() == 3
    assert fps.select("fp").distinct().count() == 3
    # lineage guard (r14): a restart under a different checkpoint
    # would restart batch ids at 0 BELOW the _last_batch high-water
    # mark — every early batch of the new lineage silently skipped as
    # a "replay". Must refuse before starting.
    import pytest

    with pytest.raises(ValueError, match="lineage"):
        start_streaming_doc_dedup(
            spark,
            str(drop) + "/*",
            out,
            checkpoint_dir=str(tmp_path / "fresh_ckpt"),
        )


def test_near_dedup_stream_matches_batch_lsh(spark, tmp_path):
    from sales_data_warehouse_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from sales_data_warehouse_spark.streaming.documents import (
        near_dedup_documents_batch,
        start_streaming_near_dedup,
    )

    base = [
        "the quick brown fox jumps over the lazy dog tonight",
        "pack my box with five dozen liquor jugs right now",
        "sphinx of black quartz judge my vow before sundown",
    ]
    rows = []
    for i in range(18):
        t = base[i % 3]
        if i >= 9:
            t = t.replace("the", "a").replace("my", "our")
        rows.append((i, t + f" tail{i % 2}"))
    all_docs = _docs(spark, [(i, t) for i, t in rows])

    drop = tmp_path / "drop"
    drop.mkdir()
    out = str(tmp_path / "near")
    for k in range(3):
        _docs(
            spark, [(i, t) for i, t in rows if i % 3 == k]
        ).coalesce(1).write.parquet(str(drop / f"f{k}.parquet"))
    q = start_streaming_near_dedup(
        spark, str(drop) + "/*", out, available_now=True
    )
    q.awaitTermination(180)

    got = {
        (r["doc_a"], r["doc_b"], r["est_jaccard"])
        for r in spark.read.parquet(f"{out}/pairs").drop(
            "batch_id"
        ).collect()
    }
    want = {
        (r["doc_a"], r["doc_b"], r["est_jaccard"])
        for r in minhash_lsh_pairs(all_docs).collect()
    }
    assert got == want and len(want) > 0
    state = spark.read.parquet(f"{out}/band_state")
    assert state.count() == 18 * 8

    # replay the last batch (crash after state commit): pairs dir for
    # that batch is rewritten identically, state rows do not double
    last = _docs(spark, [(i, t) for i, t in rows if i % 3 == 2])
    near_dedup_documents_batch(spark, last, 2, out)
    got2 = {
        (r["doc_a"], r["doc_b"], r["est_jaccard"])
        for r in spark.read.parquet(f"{out}/pairs").drop(
            "batch_id"
        ).collect()
    }
    assert got2 == want
    assert spark.read.parquet(f"{out}/band_state").count() == 18 * 8

    # lineage guard (r14): same pairs/ dir under a fresh checkpoint
    # lineage must refuse (batch_id partitions would mix and the
    # unioned read-back double-counts re-probed pairs)
    import pytest

    with pytest.raises(ValueError, match="lineage"):
        start_streaming_near_dedup(
            spark,
            str(drop) + "/*",
            out,
            checkpoint_dir=str(tmp_path / "fresh_ckpt"),
        )
