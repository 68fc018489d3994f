"""Z-order (Morton-curve) data layout for multi-dimensional pruning.

Parquet scans prune files/row-groups by min-max statistics. Sorting by
ONE column gives that column tight per-file ranges but leaves every
other column spanning its full domain — a filter on the second column
prunes nothing. Interleaving the bits of both columns' bucket numbers
(the Morton/Z curve) and range-partition-sorting by that key gives
EVERY participating column a bounded range in every file, so filters on
any of them prune. This is what Delta's OPTIMIZE ZORDER BY does; here
it's plain parquet + a derived sort key, so it works with any reader.

Bucketing is linear min->max (``width_bucket``); production layouts for
heavily skewed columns would use quantile boundaries instead — the
interleave and write path are identical.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: max bits per dimension (16 -> up to 65536 buckets per dimension)
BITS = 16


def _dim_bits(ndims: int) -> int:
    """Bits per dimension, capped so the interleaved key stays inside a
    long's 63 value bits — bit 63 is the SIGN bit, and letting any
    dimension's high bit land there would make half that dimension's
    domain sort negative (before everything else), destroying the
    curve's locality for every file at that boundary."""
    return min(BITS, 63 // ndims)


def _bucket(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Linear bucket of ``col`` into [0, 2^bits) as a long."""
    n = F.lit(1 << bits)
    b = F.width_bucket(col.cast("double"), lo, hi, n) - 1
    return F.greatest(F.lit(0), F.least(b, n - 1)).cast("long")


def _interleave(buckets: list[Column], bits: int) -> Column:
    """Morton key: bit i of dimension d lands at position i*ndims + d."""
    ndims = len(buckets)
    terms = [
        F.shiftleft(
            F.shiftright(b, i).bitwiseAND(F.lit(1)),
            i * ndims + d,
        )
        for d, b in enumerate(buckets)
        for i in range(bits)
    ]
    return reduce(lambda a, c: a.bitwiseOR(c), terms)


def zorder_key(df: DataFrame, cols: list[str]) -> Column:
    """The Morton key column for ``cols`` (numeric/date/timestamp).

    Domain bounds come from one tiny min/max aggregate (a driver-side
    scalar per column — O(1) rows moved)."""
    bits = _dim_bits(len(cols))
    bounds = df.agg(
        *[
            f
            for c in cols
            for f in (
                F.min(F.col(c).cast("double")).alias(f"{c}__lo"),
                F.max(F.col(c).cast("double")).alias(f"{c}__hi"),
            )
        ]
    ).collect()[0]
    buckets = [
        _bucket(
            F.col(c),
            F.lit(float(bounds[f"{c}__lo"])),
            # widen hi epsilon so max values stay inside the last bucket
            F.lit(float(bounds[f"{c}__hi"]) + 1e-9),
            bits,
        )
        for c in cols
    ]
    return _interleave(buckets, bits)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int = 16,
) -> None:
    """Write ``df`` as parquet laid out along the Z curve of ``cols``:
    range-partition by the Morton key (contiguous curve segment per
    file) and sort within partitions, so every file carries tight
    min-max stats on EVERY zorder column."""
    z = zorder_key(df, cols)
    (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
