"""MERGE-style snapshot upsert: apply a change batch (inserts, updates,
deletes) to a keyed snapshot in one set-based pass.

The reference warehouse refreshes dimensions by drop-and-rebuild
(``ProductDimension.sql`` truncates and reloads); the incremental twin
every warehouse eventually needs is ``MERGE INTO`` — Spark has no MERGE
on plain parquet tables, but the semantics decompose exactly into one
anti-join plus one union:

    result = snapshot ⟕anti changes.keys  ∪  changes[op != delete]

Scale: both legs are one shuffle on the key columns (or zero with both
sides bucketed by key — see ``sources/bucketed.py``); the change batch
is typically dwarfed by the snapshot, so Catalyst broadcasts the key
set for the anti-join and only the union's write touches snapshot-sized
data. Nothing is row-at-a-time and no window is needed unless the batch
itself carries competing versions per key (``version_col``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: list[str],
    op_col: str = "op",
    delete_op: str = "D",
    version_col: str | None = None,
) -> DataFrame:
    """Apply a change batch to a snapshot — MERGE INTO semantics.

    ``changes`` carries the snapshot's columns plus ``op_col``:
    rows with ``op_col == delete_op`` remove that key; every other row
    REPLACES (or inserts) its key's row. Keys present in the batch
    always take the batch's version; untouched snapshot rows pass
    through.

    With ``version_col`` set, a batch holding several rows per key is
    first reduced to the highest-version row per key (ties broken by
    preferring the delete — a delete-then-reinsert at the same version
    is ambiguous input and raises nothing, so order versions
    properly). Without it the batch MUST be unique per key: duplicate
    keys would emit duplicate result rows.

    Plan: one ``left_anti`` join of snapshot against the batch's key
    set (broadcast when the batch is small — the common case), union
    with the batch's surviving upsert rows. The reduction under
    ``version_col`` is a ``max_by`` grouped aggregate, map-side
    combinable, not a window.
    """
    if version_col is not None:
        payload = F.struct(
            F.col(version_col).alias("__v"),
            # delete sorts AFTER upsert at equal version: struct
            # comparison is lexicographic, so max_by prefers it
            (F.col(op_col) == delete_op).cast("int").alias("__del"),
            F.struct(*[F.col(c) for c in changes.columns]).alias("__row"),
        )
        changes = (
            changes.groupBy(*[F.col(k) for k in keys])
            .agg(F.max_by(payload, payload).alias("__best"))
            .select("__best.__row.*")
        )
    untouched = snapshot.join(
        changes.select(*keys).distinct(), keys, "left_anti"
    )
    # op_col is batch metadata, never part of the snapshot;
    # version_col is only metadata when the snapshot doesn't carry it
    # — an SCD-ish snapshot with its own version column keeps it on
    # the upsert leg (dropping it there would break the unionByName).
    drop_cols = [op_col]
    if version_col is not None and version_col not in snapshot.columns:
        drop_cols.append(version_col)
    upserts = changes.filter(F.col(op_col) != F.lit(delete_op)).drop(
        *drop_cols
    )
    return untouched.unionByName(upserts)
