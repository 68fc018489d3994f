"""Custom per-key streaming state via ``applyInPandasWithState``.

Windowed aggregation can't express "running total per user across all
time, emitted on every update, expired after inactivity" — that needs an
explicit state store. This is the one place in the engine where Python
runs in the streaming hot path, so it uses the Arrow-batched grouped-map
API (one Python call per key-group per micro-batch, not per row).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

#: (user_id) -> running (n_events, total_value) emitted every micro-batch
#: the user appears in.
RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), True),
        T.StructField("n_events", T.LongType(), True),
        T.StructField("total_value", T.DoubleType(), True),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType(), True),
        T.StructField("total", T.DoubleType(), True),
    ]
)


def _make_update_totals(idle_timeout_ms: int | None):
    def _update_totals(
        key: tuple,
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        if state.hasTimedOut:
            # Inactivity expiry: emit nothing, drop the state row.
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        if idle_timeout_ms is not None:
            # Refresh the inactivity clock on every batch with this key.
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 2)],
            }
        )

    return _update_totals


def running_user_totals(
    events: DataFrame, idle_timeout_ms: int | None = 24 * 3600 * 1000
) -> DataFrame:
    """Running per-user event count + value sum with idle-state expiry.

    Output mode must be ``update``. State is two longs per live user —
    at 100 TB/day the store scales with |active users|, not event
    volume, and the timeout garbage-collects churned users. Pass
    ``idle_timeout_ms=None`` to disable expiry (state then lives
    forever; only sensible for bounded key domains or tests — NB with a
    timeout configured Spark keeps scheduling micro-batches to fire it,
    so drain-and-stop harnesses never see the query go idle).
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update_totals(idle_timeout_ms),
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if idle_timeout_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )
