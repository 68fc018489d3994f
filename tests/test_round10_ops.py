"""Round-10 changes (r9 VERDICT/ADVICE): save_ivf_index clears the
previous generation's streaming replay markers, and the
edit_distance_lookup best-match variant of the R-S fuzzy join.
The diagnostic-operator ADVICE fixes (null_keys mode, empty-table
zeros, segment-key guards, probe tlen clamp) are pinned in
test_candidate_spread.py alongside the operators they touch.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sales_data_warehouse_spark.operators import dedup, similarity

SF_DIR = "/root/testdata/sf0.001"


def test_save_ivf_index_clears_replay_markers(spark, tmp_path):
    """Rebuilding an index must invalidate the streaming replay
    markers: they belong to the previous index generation, and a
    stream that reuses its checkpoint path with cleared contents
    restarts batch ids at 0 — stale markers would silently skip its
    appends into the REBUILT index (r9 ADVICE #4)."""
    from sales_data_warehouse_spark.sources.compaction import fs_exists
    from sales_data_warehouse_spark.streaming import ivf_append_batch

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(32)
    path = str(tmp_path / "ivf")
    index = similarity.build_ivf_index(emb, num_centroids=4, cache=False)
    similarity.save_ivf_index(index, path)

    batch = emb.limit(4).select(
        (F.col("vec_id") + 700_000).alias("vec_id"), "embedding", "label"
    )
    first = ivf_append_batch(spark, path, batch, batch_id=0)
    assert first.total_rows == 32 + 4
    assert fs_exists(spark, f"{path}/_ingest_batches")

    # rebuild over the same path: markers gone, so the "same" batch_id
    # from a fresh checkpoint lineage appends instead of being skipped
    similarity.save_ivf_index(index, path)
    assert not fs_exists(spark, f"{path}/_ingest_batches")
    again = ivf_append_batch(spark, path, batch, batch_id=0)
    assert again.total_rows == 32 + 4, (
        "post-rebuild batch 0 must append into the rebuilt index"
    )


def test_edit_distance_lookup_fixture(spark):
    """Best-match semantics on a hand-built fixture: each left row
    resolves to exactly one right row — minimum distance first, then
    the smallest right_id (right ids 10 and 11 are equidistant from
    left 0); unmatched left rows are absent."""
    L = spark.createDataFrame(
        [(0, "breaking news today"), (1, "the cat sat"), (2, "qqqqqq")],
        "doc_id long, text string",
    )
    R = spark.createDataFrame(
        [
            (11, "breaking news to-day"),   # dist 1 from left 0
            (10, "breaking news todays"),   # dist 1 from left 0 (tie)
            (12, "breaking news"),          # dist 6 — out of range
            (13, "the cat sat"),            # dist 0 from left 1
        ],
        "doc_id long, text string",
    )
    got = {
        (r.left_id, r.right_id, r.dist)
        for r in dedup.edit_distance_lookup(
            L, R, max_dist=2, warn_unblocked=False
        ).collect()
    }
    assert got == {(0, 10, 1), (1, 13, 0)}
    # keep_unmatched: every left row exactly once, misses as NULLs
    full = {
        (r.left_id, r.right_id, r.dist)
        for r in dedup.edit_distance_lookup(
            L, R, max_dist=2, warn_unblocked=False, keep_unmatched=True
        ).collect()
    }
    assert full == {(0, 10, 1), (1, 13, 0), (2, None, None)}


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402
from test_round8_ops import _lev  # noqa: E402
from test_round8_ops import _norm_key as _norm  # noqa: E402

_texts = st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=12),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lt=_texts, rt=_texts)
def test_edit_distance_lookup_is_groupmin_of_join(spark, lt, rt):
    """Property (the r9 brief's done-gate): lookup ≡ join → per-left
    group-min with the (dist, right_id) tie-break, computed here from
    the all-pairs DP truth so the check does not depend on
    edit_distance_join being right (that has its own property)."""
    L = spark.createDataFrame(list(enumerate(lt)), "doc_id long, text string")
    R = spark.createDataFrame(list(enumerate(rt)), "doc_id long, text string")
    got = sorted(
        (r.left_id, r.right_id, r.dist)
        for r in dedup.edit_distance_lookup(
            L, R, max_dist=2, warn_unblocked=False
        ).collect()
    )
    best: dict[int, tuple[int, int]] = {}
    for a, x in enumerate(lt):
        for b, y in enumerate(rt):
            d = _lev(_norm(x), _norm(y))
            if d <= 2 and (a not in best or (d, b) < best[a]):
                best[a] = (d, b)
    want = sorted((a, b, d) for a, (d, b) in best.items())
    assert got == want


def test_jsonl_text_scan_plan_no_cache(spark, tmp_path):
    """The r10 read_jsonl rewrite: the bad side must be a plain lazy
    plan over a text scan — queryable without the json source's
    corrupt-column-only restriction and WITHOUT the old
    whole-corpus-cache workaround (nothing lands in the CacheManager);
    blank lines are skipped like spark.read.json; type-mismatched
    objects route bad with the raw line preserved."""
    from sales_data_warehouse_spark.sources.jsonl import read_jsonl

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello"}\n'
        "not json at all\n"
        "\n"
        '{"doc_id": "abc", "text": "bad id type"}\n'
        '{"doc_id": 2, "text": "missing fields ok"}\n'
    )
    spark.catalog.clearCache()
    good, bad, _src = read_jsonl(
        spark, str(p), "doc_id BIGINT, text STRING"
    )
    # the pre-r10 implementation could not run this query uncached
    assert sorted(x.raw for x in bad.collect()) == [
        "not json at all",
        '{"doc_id": "abc", "text": "bad id type"}',
    ]
    assert sorted((x.doc_id, x.text) for x in good.collect()) == [
        (1, "hello"), (2, "missing fields ok"),
    ]
    cached = spark._jsparkSession.sharedState().cacheManager()
    assert cached.isEmpty(), "read_jsonl must not register a cache"


def test_jsonl_stream_reject_routing(spark, tmp_path):
    """The streaming JSONL reader routes the same way the batch one
    does (shared split helper): shards dropped into the directory
    stream through as micro-batches, good rows land in one sink and
    corrupt lines in the quarantine sink with the raw line intact."""
    from sales_data_warehouse_spark.sources.jsonl import (
        read_jsonl_stream,
    )

    drop = tmp_path / "drop"
    drop.mkdir()
    (drop / "shard0.jsonl").write_text(
        '{"doc_id": 1, "text": "a"}\nnot json\n'
    )
    (drop / "shard1.jsonl").write_text(
        '{"doc_id": "bad", "text": "t"}\n{"doc_id": 2, "text": "b"}\n'
        "null\n"
    )
    r = read_jsonl_stream(
        spark, str(drop), "doc_id BIGINT, text STRING"
    )
    assert r.good.isStreaming and r.bad.isStreaming
    qg = (
        r.good.writeStream.format("memory")
        .queryName("jsonl_good")
        .option("checkpointLocation", str(tmp_path / "cp_g"))
        .trigger(availableNow=True)
        .start()
    )
    qb = (
        r.bad.writeStream.format("memory")
        .queryName("jsonl_bad")
        .option("checkpointLocation", str(tmp_path / "cp_b"))
        .trigger(availableNow=True)
        .start()
    )
    qg.awaitTermination(120)
    qb.awaitTermination(120)
    good = sorted(
        (x.doc_id, x.text)
        for x in spark.sql("SELECT * FROM jsonl_good").collect()
    )
    bad = sorted(
        x.raw for x in spark.sql("SELECT * FROM jsonl_bad").collect()
    )
    assert good == [(1, "a"), (2, "b")]
    assert bad == [
        "not json",
        "null",
        '{"doc_id": "bad", "text": "t"}',
    ]


def test_jsonl_roundtrip_lossless_full_schema(spark, tmp_path):
    """write_jsonl -> read_jsonl is an identity on the full documents
    schema (text content through JSON escaping included), zero bad
    rows."""
    from sales_data_warehouse_spark.sources.jsonl import (
        read_jsonl,
        write_jsonl,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = str(tmp_path / "rt")
    write_jsonl(
        docs.select("doc_id", "text", "lang", "source", "n_chars"), out
    )
    good, bad, _src = read_jsonl(
        spark,
        out,
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT",
    )
    assert bad.count() == 0
    got = {
        (x.doc_id, x.text, x.lang, x.source, x.n_chars)
        for x in good.collect()
    }
    want = {
        (x.doc_id, x.text, x.lang, x.source, x.n_chars)
        for x in docs.collect()
    }
    assert got == want


def test_rebuild_ivf_index_in_place(spark, tmp_path):
    """The one-call rebuild the monitors prescribe: after lopsided
    appends, rebuild_ivf_index re-trains on the CURRENT vectors in
    place — skew drops back toward balanced, every vector survives,
    search still answers, replay markers are cleared, and no staging
    directories are left behind."""
    from sales_data_warehouse_spark.sources.compaction import fs_exists
    from sales_data_warehouse_spark.streaming import ivf_append_batch

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(64)
    path = str(tmp_path / "ivf")
    similarity.save_ivf_index(
        similarity.build_ivf_index(emb, num_centroids=4, cache=False),
        path,
    )
    # lopsided append: 200 copies of one vector crowd one cell
    one = emb.limit(1).collect()[0]
    batch = spark.createDataFrame(
        [(200_000 + i, one.embedding, 0) for i in range(200)],
        "vec_id long, embedding array<float>, label int",
    )
    ivf_append_batch(spark, path, batch, batch_id=0, compute_stats=False)
    before = similarity.ivf_cell_stats(spark, path)
    assert before.skew_ratio > 4.0

    rebuilt = similarity.rebuild_ivf_index(spark, path, num_centroids=4)
    after = similarity.ivf_cell_stats(spark, path)
    assert after.total_rows == 264  # nothing lost
    assert after.skew_ratio < before.skew_ratio  # centroids moved
    assert len(rebuilt.centers) == 4
    assert not fs_exists(spark, f"{path}/_ingest_batches")
    for leftover in (
        "assigned.rebuild_tmp", "assigned.rebuild_old",
        "centers.rebuild_tmp", "centers.rebuild_old",
    ):
        assert not fs_exists(spark, f"{path}/{leftover}")
    # the rebuilt index still answers searches
    hits = similarity.ivf_search(
        rebuilt, emb.limit(2), k=3, nprobe=4
    ).count()
    assert hits == 6


# --- minhash_lsh_join (cross-corpus fuzzy join) ------------------------


def test_minhash_lsh_join_fixture(spark):
    """Identical texts across the two relations pair at est_jaccard
    1.0; an unrelated text pairs with nothing. Signatures are
    comparable across relations because both sides hash with the same
    seeds."""
    L = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely unrelated text about spark partitions"),
        ],
        "doc_id long, text string",
    )
    R = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog today"),
            (11, "zzz qqq xxx yyy www vvv uuu ttt sss rrr"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.left_id, r.right_id, r.est_jaccard)
        for r in dedup.minhash_lsh_join(L, R, threshold=0.3).collect()
    }
    assert got == {(1, 10, 1.0)}


def test_minhash_lsh_join_equals_self_join_cross_slice(spark):
    """On real documents, the R-S join across the even/odd-source
    split must produce EXACTLY the self-join's candidate set
    restricted to cross-parity pairs — same signatures, same banding,
    same threshold, so the two plans may not disagree on a single
    pair."""
    import pyspark.sql.functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    par = F.expr("cast(substring(source, 4) as int) % 2")
    tagged = docs.withColumn("par", par)
    left = tagged.filter("par = 0")
    right = tagged.filter("par = 1")

    rs = {
        (r.left_id, r.right_id, r.est_jaccard)
        for r in dedup.minhash_lsh_join(
            left, right, threshold=0.3
        ).collect()
    }
    parity = {
        r.doc_id: r.par for r in tagged.select("doc_id", "par").collect()
    }
    self_pairs = dedup.minhash_lsh_pairs(docs, threshold=0.3).collect()
    want = set()
    for r in self_pairs:
        pa, pb = parity[r.doc_a], parity[r.doc_b]
        if pa == 0 and pb == 1:
            want.add((r.doc_a, r.doc_b, r.est_jaccard))
        elif pa == 1 and pb == 0:
            want.add((r.doc_b, r.doc_a, r.est_jaccard))
    assert rs == want and rs, f"{len(rs)} vs {len(want)}"


# --- weighted_sample_topk (deterministic A-ES) ------------------------


def _aes_key(doc_id: int, w: float) -> float:
    """Python twin of the operator's key arithmetic — the module's
    Knuth hash at full 2^32 grain, +0.5, then ln(u)/w."""
    import math

    from sales_data_warehouse_spark.operators.sampling import (
        HASH_A,
        HASH_P,
    )

    h = ((doc_id % HASH_P + HASH_P) % HASH_P) * HASH_A % 4294967296
    return math.log((h + 0.5) / 4294967296.0) / w


def test_weighted_sample_guards_and_determinism(spark):
    """NULL/zero/negative weights are dropped; k >= 1 is enforced; two
    runs select the identical row set (no RNG state anywhere)."""
    import pytest

    from sales_data_warehouse_spark.operators import sampling

    docs = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 0.0), (4, -5.0), (5, 3.0)],
        "doc_id long, w double",
    )
    got = sampling.weighted_sample_topk(docs, "w", 10)
    ids = {r.doc_id for r in got.collect()}
    assert ids == {1, 5}  # the only positive-weight rows
    assert ids == {
        r.doc_id for r in sampling.weighted_sample_topk(
            docs, "w", 10
        ).collect()
    }
    with pytest.raises(ValueError, match="k"):
        sampling.weighted_sample_topk(docs, "w", 0)


def test_weighted_sample_heavy_rows_win_more(spark):
    """Weight actually steers inclusion: with ids 0..999 and one
    100x-weight block, the heavy block must dominate the sample (A-ES
    inclusion probability is ~proportional to weight)."""
    from sales_data_warehouse_spark.operators import sampling

    rows = [(i, 100.0 if i < 100 else 1.0) for i in range(1000)]
    docs = spark.createDataFrame(rows, "doc_id long, w double")
    got = sampling.weighted_sample_topk(docs, "w", 50).collect()
    heavy = sum(1 for r in got if r.doc_id < 100)
    # 100 rows at weight 100 vs 900 at weight 1: heavy block holds
    # ~91% of the total weight — expect the sample to be mostly heavy
    assert heavy >= 35, f"only {heavy}/50 heavy rows sampled"


from hypothesis import example  # noqa: E402

# ids span negative values too (xxhash64-style keys cover the full
# signed-64 range; the pmod in the hash must keep u non-negative) and
# exceed HASH_P so congruent-id exact key ties occur
_weights = st.lists(
    st.tuples(
        st.integers(-2_000_005, 2_000_005),
        st.floats(
            min_value=0.01, max_value=1000.0,
            allow_nan=False, allow_infinity=False,
        ),
    ),
    min_size=1,
    max_size=24,
    unique_by=lambda t: t[0],
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@example(rows=[(7, 1.0), (7 + 1_000_003, 1.0), (3, 2.0)])  # exact tie
@example(rows=[(-5, 1.0), (-5 + 1_000_003, 1.0), (4, 0.5)])  # neg ids
@given(rows=_weights)
def test_weighted_sample_matches_python_aes(spark, rows):
    """Property: the selection equals the Python A-ES oracle — top-k
    by ln(u)/w desc with the id-asc tie-break — including ids
    congruent mod HASH_P (identical u, exactly equal keys)."""
    from sales_data_warehouse_spark.operators import sampling

    docs = spark.createDataFrame(rows, "doc_id long, w double")
    k = max(1, len(rows) // 2)
    got = sorted(
        r.doc_id
        for r in sampling.weighted_sample_topk(docs, "w", k).collect()
    )
    want = sorted(
        i
        for i, _ in sorted(
            rows, key=lambda t: (-_aes_key(t[0], t[1]), t[0])
        )[:k]
    )
    assert got == want
