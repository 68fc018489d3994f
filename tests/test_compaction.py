"""compact_table: row preservation, file-count reduction, sorted
min/max pruning bounds, and crash-safe swap semantics."""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from sales_data_warehouse_spark.sources.compaction import (
    compact_table,
    parquet_file_count,
    table_bytes,
)


def _fragmented(spark, path, rows=20000, files=40):
    (
        spark.range(0, rows)
        .withColumn("k", F.col("id") % 97)
        .withColumn("payload", F.md5(F.col("id").cast("string")))
        .repartition(files)
        .write.mode("overwrite")
        .parquet(path)
    )


def test_compact_preserves_rows_and_reduces_files(spark, tmp_path):
    path = str(tmp_path / "frag")
    _fragmented(spark, path)
    before_files = parquet_file_count(spark, path)
    before = sorted(
        map(tuple, spark.read.parquet(path).collect())
    )
    assert before_files == 40

    n = compact_table(spark, path, target_file_mb=128)
    assert n == 1  # tiny table -> one file target
    assert parquet_file_count(spark, path) == 1
    after = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert after == before
    # tmp/old staging dirs cleaned up
    assert not (tmp_path / "frag.compact_tmp").exists()
    assert not (tmp_path / "frag.compact_old").exists()


def test_compact_sorted_files_have_disjoint_bounds(spark, tmp_path):
    path = str(tmp_path / "frag_sorted")
    _fragmented(spark, path, rows=200000, files=30)
    assert table_bytes(spark, path) > 3 * 1024 * 1024
    # 1 MB target over a >3 MB table -> several sorted output files
    n = compact_table(spark, path, sort_cols=["id"], target_file_mb=1)
    assert n >= 3
    # each file's id range must not overlap any other's (footer pruning)
    bounds = []
    for f in (tmp_path / "frag_sorted").iterdir():
        if f.name.startswith(("_", ".")) or not f.name.endswith(".parquet"):
            continue
        md = pq.read_metadata(str(f))
        los, his = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)  # id
            los.append(col.statistics.min)
            his.append(col.statistics.max)
        bounds.append((min(los), max(his)))
    bounds.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(bounds, bounds[1:]):
        assert hi1 < lo2, bounds
    # and the union covers all rows
    assert spark.read.parquet(path).count() == 200000
