"""Deterministic synthetic-corpus Python DataSource (Spark 4 API).

Scale testing without disk: generate ``documents``- or ``events``-shaped
rows at ANY row count, partition-parallel, with values that are a pure
function of (table, row index) — so a 10M-row run is reproducible across
executors, retries, and sessions, and costs zero storage.

    from sales_data_warehouse_spark.sources.synthetic import register
    register(spark)
    docs = (spark.read.format("sdw_synth")
            .option("table", "documents")
            .option("rows", 10_000_000)
            .option("partitions", 64)
            .load())

Each partition generates only its own row range inside the Arrow-batched
reader task, so generation parallelizes exactly like a parquet scan and
the driver never materializes anything. This is the harness used to
probe operator scaling beyond what the driver's testdata ships (the
bench's sf1 block replicates real files instead, to keep real value
distributions; this source trades realism for unbounded row counts).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)
from pyspark.sql.types import StructType

_VOCAB = (
    "key agg row scan slow fast table value part hash merge batch spark "
    "line sort window query data column join small customer order the a"
).split()

_EVENT_TYPES = ["view", "click", "purchase", "refund"]

_SCHEMAS = {
    "documents": (
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT"
    ),
    "events": (
        "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, "
        "event_type STRING, value DOUBLE"
    ),
}


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _SynthReader(DataSourceReader):
    def __init__(self, table: str, rows: int, parts: int):
        self.table = table
        self.rows = rows
        self.parts = parts

    def partitions(self):
        step = -(-self.rows // self.parts)
        return [
            _RangePartition(i, min(i + step, self.rows))
            for i in range(0, self.rows, step)
        ]

    def read(self, partition):
        import datetime as dt

        import numpy as np

        lo, hi = partition.start, partition.end
        n = hi - lo
        if n <= 0:
            return iter(())
        idx = np.arange(lo, hi, dtype=np.int64)
        # splitmix64-style deterministic per-row randomness
        h = (idx * np.int64(-7046029254386353131)) ^ (idx >> 31)

        if self.table == "documents":
            rows = []
            for i, hv in zip(idx.tolist(), h.tolist()):
                rng = np.random.default_rng(hv & 0x7FFFFFFFFFFFFFFF)
                n_tok = int(rng.integers(10, 60))
                toks = rng.choice(_VOCAB, size=n_tok)
                text = " ".join(toks.tolist())
                rows.append(
                    (
                        i,
                        text,
                        "en" if hv % 10 else "de",
                        f"src{hv % 20}",
                        len(text),
                    )
                )
            return iter(rows)

        base = dt.datetime(2024, 1, 1)
        rows = []
        for i, hv in zip(idx.tolist(), h.tolist()):
            u = hv & 0x7FFFFFFFFFFFFFFF
            rows.append(
                (
                    i,
                    base + dt.timedelta(seconds=int(u % 7_776_000)),
                    int(u % 100_000),
                    _EVENT_TYPES[u % 4],
                    round((u % 100_000) / 1000.0, 3),
                )
            )
        return iter(rows)


class SyntheticDataSource(DataSource):
    """``format("sdw_synth")`` — options: table, rows, partitions."""

    @classmethod
    def name(cls) -> str:
        return "sdw_synth"

    def schema(self) -> str:
        table = self.options.get("table", "documents")
        if table not in _SCHEMAS:
            raise ValueError(
                f"unknown synthetic table {table!r}; "
                f"one of {sorted(_SCHEMAS)}"
            )
        return _SCHEMAS[table]

    def reader(self, schema: StructType) -> DataSourceReader:
        return _SynthReader(
            self.options.get("table", "documents"),
            int(self.options.get("rows", 1000)),
            int(self.options.get("partitions", 8)),
        )


def register(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(SyntheticDataSource)
