"""Raw media ingest via Spark's built-in ``binaryFile`` source.

This is how a multimodal training-data pipeline gets image/audio/video
payloads INTO the engine in the first place: Spark's ``binaryFile``
format reads whole files as rows — (path, modificationTime, length,
content binary) — distributed across executors with no Python in the
read path. ``read_binary_files`` exposes that source (glob filter +
recursive lookup push down to file listing, so an extension filter
never opens non-matching files); ``ingest_binary_payloads`` normalizes
it into the payload-table shape the multimodal operators consume
(``operators/multimodal.py``: doc_id + payload + typed meta struct),
from which ``decode_batch`` / feature extraction run unchanged.

At 100 TB: the listing parallelizes, each file is one row in one task
(so many-small-files corpora want ``sources.compaction`` AFTER ingest —
written as parquet, payloads re-split by row groups), and the
``spark.sql.files.maxPartitionBytes`` sizing applies to the parquet
payload table, not the raw files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: extension -> MIME type for the typed metadata struct. Unknown
#: extensions fall through to application/octet-stream.
_CONTENT_TYPES = {
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "png": "image/png",
    "gif": "image/gif",
    "webp": "image/webp",
    "wav": "audio/wav",
    "mp3": "audio/mpeg",
    "flac": "audio/flac",
    "mp4": "video/mp4",
    "webm": "video/webm",
    "mkv": "video/x-matroska",
}


def read_binary_files(
    spark: SparkSession,
    path: str,
    *,
    glob: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """Read whole files as rows: (path, modificationTime, length,
    content). ``glob`` (e.g. ``*.png``) and ``recursive`` push down to
    the FILE LISTING — non-matching files are never opened, the
    binary-source equivalent of partition pruning."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return reader.load(path)


def ingest_binary_payloads(
    spark: SparkSession,
    path: str,
    *,
    glob: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """binaryFile rows normalized to the multimodal payload-table shape
    consumed by ``operators/multimodal.py``: ``doc_id`` (xxhash64 of the
    file path — deterministic, re-ingest-stable), ``payload`` binary,
    ``meta`` struct (content_type from the extension, n_bytes,
    source_path). ``decode_batch`` / frame sampling / feature extraction
    run on this directly."""
    raw = read_binary_files(spark, path, glob=glob, recursive=recursive)
    ext = F.lower(F.substring_index(F.col("path"), ".", -1))
    ct = F.lit("application/octet-stream")
    for e, mime in sorted(_CONTENT_TYPES.items()):
        ct = F.when(ext == e, F.lit(mime)).otherwise(ct)
    return raw.select(
        F.xxhash64("path").alias("doc_id"),
        F.col("content").alias("payload"),
        F.struct(
            ct.alias("content_type"),
            F.col("length").cast("bigint").alias("n_bytes"),
            F.col("path").alias("source_path"),
        ).alias("meta"),
    )
