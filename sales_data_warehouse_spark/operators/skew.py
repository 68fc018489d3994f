"""Skew mitigation for hot-key joins (SURVEY §4 scale notes).

AQE's skew-join handling (on in ``session.DEFAULT_CONF``) splits
oversized *post-shuffle* partitions, which covers moderate skew. For
pathological hot keys (one customer id = 30% of a 100 TB fact), salting
bounds the worst task deterministically: the skewed side scatters each
key across ``salt`` sub-keys, the other side replicates each row
``salt`` times, and the join runs on (key, salt) — turning one
straggler task into ``salt`` even ones at the cost of replicating the
smaller side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Equi-join resilient to hot keys on the ``skewed`` side.

    ``other`` is replicated ``salt``-fold, so keep it the smaller input.
    Row-level results are identical to ``skewed.join(other, on, how)``
    for 'inner' and 'left' joins (each skewed row meets each matching
    other row exactly once — in the single salt bucket the row landed
    in).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports inner/left, got {how!r}: right/outer "
            "would need the salt on the preserved side"
        )
    s = skewed.withColumn(
        SALT_COL, F.floor(F.rand(seed) * salt).cast("int")
    )
    o = other.withColumn(
        SALT_COL,
        F.explode(F.array(*[F.lit(i) for i in range(salt)])),
    )
    return s.join(o, on=[*on, SALT_COL], how=how).drop(SALT_COL)
