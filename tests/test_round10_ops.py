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
