"""JSONL (newline-delimited JSON) source/sink with corrupt-record
routing — the JSON twin of the CSV load-error trap (SURVEY S2).

Document corpora commonly arrive as JSONL shards. The scale contract
matches the CSV path: the read splits by file/byte-range, so ingest
parallelizes across the cluster with no custom code, and the explicit
schema keeps the reader off schema inference (which would scan the
data twice and melt at 100 TB).

Plan shape (round 10 — replaces the original ``spark.read.json`` +
``.cache()`` implementation): a TEXT scan + ``from_json``. The json
source refuses any query whose scan references only the internal
corrupt-record column (``UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_
RECORD_COLUMN``) — which is exactly what the ``bad`` side prunes to —
and its documented workaround is caching the WHOLE parsed corpus,
which made the caller own a cache lifecycle and is a non-starter at
100 TB. ``from_json`` with the same schema + PERMISSIVE +
``columnNameOfCorruptRecord`` reproduces the json source's corrupt
semantics (unparseable line OR type-mismatched field → corrupt column
set, raw line preserved) over an unrestricted text scan, so both sides
of the split stay lazy single-scan plans and nothing needs caching or
unpersisting. Whitespace-only lines are dropped to match
``spark.read.json``, which skips them silently. A JSON literal
``null`` (or scalar-root) line is the one case ``from_json`` treats
differently from a parse failure — it parses successfully to a NULL
struct with the corrupt column unset — so the split additionally
routes NULL-struct rows to the bad side (round 11): an all-NULL
document row is never valid data.

A syntactically-valid object that merely MISSES fields is data for the
cleansing stage (NULL-completeness routing), not a parse reject — the
same division of labor as the CSV path.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


class JsonlRead(NamedTuple):
    """The (good, bad) split plus the shared parsed frame.

    ``source`` is the lazy parsed text frame both sides derive from
    (nothing is cached — ``unpersist()`` is kept as a no-op so callers
    written against the pre-r10 cache-owning API keep working).
    """

    good: DataFrame
    bad: DataFrame
    source: DataFrame

    def unpersist(self) -> None:
        self.source.unpersist()


def _split_jsonl_lines(lines: DataFrame, schema: str) -> JsonlRead:
    """The (good, bad) split over any ``value: string`` frame — shared
    by the batch and streaming readers so their corrupt semantics
    cannot drift apart. ``from_json`` works identically on streaming
    plans, which is what makes the streaming reader a two-line
    wrapper."""
    fields = T.StructType.fromDDL(schema)
    full = T.StructType(
        [*fields.fields, T.StructField(CORRUPT_COL, T.StringType())]
    )
    parsed = lines.filter(F.trim(F.col("value")) != "").select(
        F.col("value"),
        F.from_json(
            F.col("value"),
            full,
            {
                "mode": "PERMISSIVE",
                "columnNameOfCorruptRecord": CORRUPT_COL,
            },
        ).alias("j"),
    )
    # A JSON literal ``null`` (or scalar-root) line parses SUCCESSFULLY
    # to a NULL struct — the corrupt column stays NULL — so testing the
    # corrupt column alone would leak an all-NULL row into the good
    # side. A NULL struct can never be a valid document, so route it to
    # the bad side with its raw line.
    is_bad = F.col("j").isNull() | F.col(f"j.{CORRUPT_COL}").isNotNull()
    good = parsed.filter(~is_bad).select(
        *[F.col(f"j.{f.name}").alias(f.name) for f in fields.fields]
    )
    bad = parsed.filter(is_bad).select(F.col("value").alias("raw"))
    return JsonlRead(good, bad, parsed)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
) -> JsonlRead:
    """Read JSONL with an explicit DDL ``schema`` ("a INT, b STRING").

    Returns ``JsonlRead(good, bad, source)`` — unpacks as ``good, bad,
    src = ...``; good rows carry the schema's columns, bad rows one
    ``raw`` string column with the offending line (unparseable JSON or
    a type-mismatched field). Both sides are lazy plans over one text
    scan each; no caching, no caller-owned lifecycle.
    """
    return _split_jsonl_lines(spark.read.text(path), schema)


def read_jsonl_stream(
    spark: SparkSession,
    drop_dir: str,
    schema: str,
    max_files_per_trigger: int = 1,
) -> JsonlRead:
    """Streaming twin of :func:`read_jsonl` over a drop directory —
    the shape LLM corpora actually arrive in (shard files landing
    continuously). Same declared-schema / reject-routing contract via
    the shared split: ``good`` and ``bad`` are STREAMING DataFrames,
    each startable as its own query (route ``bad`` to a quarantine
    sink, ``good`` into the curation pipeline). One file per trigger
    by default, matching the other drop-dir readers, so backfills
    exercise the same micro-batch path as live tails."""
    lines = (
        spark.readStream.option(
            "maxFilesPerTrigger", max_files_per_trigger
        ).text(drop_dir)
    )
    return _split_jsonl_lines(lines, schema)


def write_jsonl(df: DataFrame, path: str, compression: str | None = None):
    """Write a DataFrame as JSONL shards (one file per partition — the
    layout every data-loading stack expects)."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
