"""Engine-wide reusable column expressions.

These encode the cross-engine determinism rules the corpus and ETL both
rely on (see ``queries/corpus.py`` module docstring): exact decimal money
math, zero-padded surrogate-key rendering (reference LPAD ids,
``ProductDimension.sql:150``, ``LocationDimension.sql:162``), and the
whitespace tokenizer every text operator shares.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money(c: Column | str) -> Column:
    """Exact DECIMAL(18,2) view of a 2-decimal double column: makes SUMs
    independent of partition/aggregation order (double sums drift in the
    low bits per partitioning — fatal for oracle comparison)."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("decimal(18,2)")


def padded_id(prefix: str, n: Column, width: int = 6) -> Column:
    """Reference-style surrogate key rendering: ``'P' || LPAD(n, 6, '0')``.

    Spark's ``lpad`` *truncates* strings longer than the target width, so a
    naive LPAD silently collides ids once a level outgrows 10^width-1 rows.
    Numbers wider than ``width`` therefore keep all their digits — ids stay
    unique forever, merely wider than the nominal format past the rollover.
    """
    s = n.cast("string")
    return F.concat(
        F.lit(prefix),
        F.when(F.length(s) > width, s).otherwise(F.lpad(s, width, "0")),
    )


def tokens(c: Column | str) -> Column:
    """Lowercase whitespace tokens — the shared tokenizer for quality
    scores, shingles, SimHash, and token counting."""
    col = F.col(c) if isinstance(c, str) else c
    return F.split(F.lower(col), r"\s+")
