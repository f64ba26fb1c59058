"""Custom stateful streaming operator — applyInPandasWithState.

The reference has no streaming at all (batch Trino connector); this is
the north-star extension's escape hatch for state machines that
window/session/dropDuplicates can't express: arbitrary per-key state
updated per micro-batch with Arrow-batched pandas, timeout-driven
eviction, and bounded memory (state is per key, partitioned across
executors like any keyed state).

Demonstrated operator: per-user running activity profile (event count,
value sum, last-seen timestamp) emitted incrementally — the canonical
"profile store fed by a stream" shape for feature pipelines.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: Output of the profile operator (stable schema; one row per key per
#: micro-batch in which the key saw events).
PROFILE_SCHEMA = (
    "user_id BIGINT, n_events BIGINT, sum_value DOUBLE, last_seen TIMESTAMP"
)
_STATE_SCHEMA = "n BIGINT, s DOUBLE, last LONG"


def _update_profile(
    key: tuple,
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's events for one user into running state.

    State is (count, sum, last-seen-µs). Emits the refreshed profile
    once per batch; on processing-time timeout the key's state is
    dropped (the stream-side analogue of watermark eviction)."""
    if state.hasTimedOut:
        state.remove()
        return
    n, s, last = state.get if state.exists else (0, 0.0, 0)
    for pdf in batches:
        n += len(pdf)
        s += float(pdf["value"].sum())
        batch_last = pdf["ts"].max()
        if pd.notna(batch_last):
            last = max(last, int(batch_last.value // 1000))
    state.update((n, s, last))
    state.setTimeoutDuration(60 * 60 * 1000)
    yield pd.DataFrame({
        "user_id": [key[0]],
        "n_events": [n],
        "sum_value": [s],
        "last_seen": [pd.Timestamp(last * 1000)],
    })


def stream_user_profiles(events: DataFrame) -> DataFrame:
    """S-custom: per-user running profiles via applyInPandasWithState.

    groupBy(user_id) partitions state by key across executors; each
    micro-batch routes a key's new rows to its state partition (one
    shuffle per batch, keyed — the same layout Spark's built-in
    streaming aggs use). Update output mode emits changed keys only.
    """
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_profile,
            outputStructType=PROFILE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
