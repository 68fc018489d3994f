"""Property-based checks of the round-3 operators against in-Python
brute-force references: group centroids, the cross-source overlap
matrix, and incremental exact dedup."""

from __future__ import annotations

from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sales_data_warehouse_spark.operators.dedup import (
    incremental_exact_dedup,
    source_overlap_matrix,
)
from sales_data_warehouse_spark.operators.similarity import group_centroids

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

vec = st.lists(
    st.integers(-1000, 1000).map(lambda x: x / 100.0), min_size=3, max_size=3
)
labeled_vecs = st.lists(
    st.tuples(st.integers(0, 2), vec), min_size=1, max_size=24
)


@given(data=labeled_vecs)
@SETTINGS
def test_group_centroids_matches_bruteforce(spark, data):
    rows = [(i, lbl, v) for i, (lbl, v) in enumerate(data)]
    df = spark.createDataFrame(
        rows, "vec_id int, label int, embedding array<float>"
    )
    got = {
        r.label: (r.n_vecs, r.centroid)
        for r in group_centroids(df, group_col="label").collect()
    }
    by_label = defaultdict(list)
    for _, lbl, v in rows:
        by_label[lbl].append(v)
    for lbl, vecs in by_label.items():
        n, cent = got[lbl]
        assert n == len(vecs)
        for d in range(3):
            want = sum(v[d] for v in vecs) / len(vecs)
            assert abs(cent[d] - want) < 1e-6, (lbl, d, cent[d], want)


doc = st.tuples(
    st.sampled_from(["a", "b", "c"]),
    st.lists(
        st.sampled_from(["x", "y", "z", "w", "q"]), min_size=0, max_size=8
    ).map(" ".join),
)


@given(docs=st.lists(doc, min_size=1, max_size=16))
@SETTINGS
def test_source_overlap_matches_bruteforce(spark, docs):
    rows = [(i, src, txt) for i, (src, txt) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id int, source string, text string")
    got = {
        (r.src_a, r.src_b): (r.n_shingles_a, r.n_common)
        for r in source_overlap_matrix(df, n=2).collect()
    }

    def shingles(txt):
        toks = txt.lower().split()
        return {
            " ".join(toks[i : i + 2]) for i in range(len(toks) - 1)
        }

    by_src = defaultdict(set)
    for _, src, txt in rows:
        by_src[src] |= shingles(txt)
    want = {}
    for a, sa in by_src.items():
        for b, sb in by_src.items():
            if a != b and sa & sb:
                want[(a, b)] = (len(sa), len(sa & sb))
    assert got == want


@given(
    batches=st.lists(
        st.lists(st.sampled_from(["t1", "t2", "t3", "t4"]), max_size=6),
        min_size=1,
        max_size=4,
    )
)
@SETTINGS
def test_incremental_dedup_matches_global_dedup(spark, batches):
    state = None
    admitted = []
    next_id = 0
    seen_py = set()
    for batch in batches:
        rows = []
        for txt in batch:
            rows.append((next_id, txt))
            next_id += 1
        if not rows:
            continue
        df = spark.createDataFrame(rows, "doc_id int, text string")
        fresh, state = incremental_exact_dedup(df, state)
        got_txts = sorted(r.text for r in fresh.collect())
        want = sorted({t for t in batch} - seen_py)
        assert got_txts == want, (got_txts, want)
        seen_py |= set(batch)
        admitted.extend(got_txts)
    # global invariant: admitted texts are exactly the distinct texts
    assert sorted(admitted) == sorted(seen_py)


import datetime as _dt

_T0 = _dt.datetime(2024, 1, 1)

_events = st.lists(
    st.tuples(st.integers(1, 5), st.integers(0, 20)),  # (user, day)
    min_size=1,
    max_size=40,
)


@given(evts=_events)
@SETTINGS
def test_rolling_active_users_matches_bruteforce(spark, evts):
    from sales_data_warehouse_spark.operators.timeseries import (
        rolling_active_users,
    )

    rows = [
        (u, _T0 + _dt.timedelta(days=d, hours=(u + d) % 24))
        for u, d in evts
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    got = {
        str(r.day): (r.dau, r.wau) for r in rolling_active_users(df).collect()
    }

    days = sorted({d for _, d in evts})
    active = defaultdict(set)
    for u, d in evts:
        active[d].add(u)
    want = {}
    for d in days:
        dau = len(active[d])
        wau = len(set().union(*(active[d - o] for o in range(7))))
        want[str((_T0 + _dt.timedelta(days=d)).date())] = (dau, wau)
    assert got == want
