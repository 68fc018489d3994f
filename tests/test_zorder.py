"""Z-order layout: every participating column must get bounded per-file
min-max ranges (the property parquet pruning feeds on), unlike a
single-column sort which leaves other columns spanning the full domain."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from sales_data_warehouse_spark.sources.zorder import write_zordered

SF_DIR = "/root/testdata/sf0.01"
COLS = ["l_partkey", "l_suppkey"]


def _mean_normalized_range(path: str, col: str) -> float:
    """Average (file max-min width) / (global width) over output files."""
    files = glob.glob(f"{path}/*.parquet")
    assert files
    spans, glo, ghi = [], None, None
    for f in files:
        md = pq.ParquetFile(f).metadata
        lo = hi = None
        for rg in range(md.num_row_groups):
            for i in range(md.num_columns):
                c = md.row_group(rg).column(i)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        assert lo is not None, f"no stats for {col} in {f}"
        spans.append((lo, hi))
        glo = lo if glo is None else min(glo, lo)
        ghi = hi if ghi is None else max(ghi, hi)
    width = ghi - glo
    return sum((hi - lo) / width for lo, hi in spans) / len(spans)


def test_zorder_bounds_every_dimension(spark, tmp_path):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(*COLS)

    zpath = str(tmp_path / "zordered")
    write_zordered(li, zpath, COLS, num_files=16)

    spath = str(tmp_path / "single_sorted")
    (
        li.repartitionByRange(16, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(spath)
    )

    # single-column sort: first column tight, second spans ~everything
    assert _mean_normalized_range(spath, "l_partkey") < 0.2
    assert _mean_normalized_range(spath, "l_suppkey") > 0.8
    # z-order: BOTH columns bounded well below the full domain
    for c in COLS:
        assert _mean_normalized_range(zpath, c) < 0.5, c


def test_zorder_preserves_rows(spark, tmp_path):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(*COLS)
    zpath = str(tmp_path / "z2")
    write_zordered(li, zpath, COLS, num_files=8)
    back = spark.read.parquet(zpath)
    assert back.count() == li.count()
    a = li.groupBy(*COLS).count()
    b = back.groupBy(*COLS).count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert "_z" not in back.columns

def test_four_dimension_key_never_negative(spark):
    """16 bits x 4 dims would put the 4th dimension's high bit on the
    long's SIGN bit — half that dimension would sort before everything.
    The per-dimension width must shrink so the key stays non-negative."""
    from sales_data_warehouse_spark.sources.zorder import zorder_key

    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
    )
    z = li.select(
        zorder_key(
            li, ["l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"]
        ).alias("z")
    )
    assert z.filter(F.col("z") < 0).count() == 0
