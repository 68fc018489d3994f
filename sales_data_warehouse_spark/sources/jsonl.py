"""JSONL (newline-delimited JSON) source/sink with corrupt-record
routing — the JSON twin of the CSV load-error trap (SURVEY S2).

Document corpora commonly arrive as JSONL shards. The scale contract
matches the CSV path: ``spark.read.json`` splits by file/byte-range, so
ingest parallelizes across the cluster with no custom code, and the
explicit schema keeps the reader off schema inference (which would scan
the data twice and melt at 100 TB).

Reject routing uses PERMISSIVE mode's ``columnNameOfCorruptRecord``:
rows that fail to parse (or fail the schema) land with the raw line
preserved in ``_corrupt_record`` and NULLs elsewhere; ``read_jsonl``
splits them into (good, bad) like the cleansing stage's reject table,
so a bad shard degrades to a quarantine file instead of aborting the
load.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


class JsonlRead(NamedTuple):
    """The (good, bad) split plus the cached source it derives from.

    Spark refuses to filter on the corrupt-record column of an uncached
    JSON scan, so the parsed source must be cached; the caller OWNS
    that cache — call ``unpersist()`` (or ``source.unpersist()``) once
    the split has been consumed, or a per-shard ingest loop accumulates
    one cached parse per shard until storage-memory pressure sets in.
    """

    good: DataFrame
    bad: DataFrame
    source: DataFrame

    def unpersist(self) -> None:
        self.source.unpersist()


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
) -> JsonlRead:
    """Read JSONL with an explicit DDL ``schema`` ("a INT, b STRING").

    Returns ``JsonlRead(good, bad, source)`` — unpacks as ``good, bad,
    src = ...``; good rows carry the schema's columns, bad rows one
    ``raw`` string column with the offending line. See ``JsonlRead``
    for the cache-lifecycle contract.
    """
    full = f"{schema}, {CORRUPT_COL} STRING"
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    # Spark requires materializing the parsed struct before the corrupt
    # column can be filtered (the reader is lazy about it); a cache
    # boundary makes the split read the source once.
    df = df.cache()
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw")
    )
    return JsonlRead(good, bad, df)


def write_jsonl(df: DataFrame, path: str, compression: str | None = None):
    """Write a DataFrame as JSONL shards (one file per partition — the
    layout every data-loading stack expects)."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
