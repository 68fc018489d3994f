"""Winnowing fingerprint properties (no cross-engine oracle — the
rolling hash is engine-specific, so the algorithm's guarantees are
pinned directly):

  * coverage: consecutive selected positions within a document are at
    most `window` apart — every window of k-grams contributed one
    fingerprint
  * determinism: identical results under a different input partitioning
  * shared-substring detection: two documents sharing a long run of
    tokens share at least one fingerprint hash
"""

from __future__ import annotations

from collections import defaultdict

from sales_data_warehouse_spark.operators.text import winnowing_fingerprints

SF_DIR = "/root/testdata/sf0.001"
K, W = 5, 4


def test_coverage_and_determinism(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    fps = winnowing_fingerprints(docs, k=K, window=W)
    rows = fps.collect()
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r["doc"]].append(r["pos"])
    assert len(by_doc) == docs.count()
    for positions in by_doc.values():
        ps = sorted(positions)
        assert all(b - a <= W for a, b in zip(ps, ps[1:]))

    again = winnowing_fingerprints(docs.repartition(13), k=K, window=W)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))


def test_shared_substring_shares_fingerprint(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, f"unique prefix one {shared} tail a"),
            (2, f"completely different opening {shared} other ending"),
            (3, "no overlap at all in this third document body here"),
        ],
        ["doc_id", "text"],
    )
    fps = winnowing_fingerprints(docs, k=K, window=W)
    sets = defaultdict(set)
    for r in fps.collect():
        sets[r["doc"]].add(r["fp"])
    # 10 shared tokens >= k + window - 1 = 8 -> guaranteed common print
    assert sets[1] & sets[2]
    assert not (sets[1] & sets[3])
