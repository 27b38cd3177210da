"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's closest notion of state is resume offsets (start/end chunk);
a real streaming engine needs keyed state that survives across micro-batches.
Two canonical operators:

- ``running_totals``: per-key cumulative count/sum, emitted every update —
  the streaming analog of a running aggregate, with state the size of one
  row per key.
- ``streaming_dedup``: per-key first-seen filter — exactly-once semantics for
  replayed/duplicated events, state = seen ids per key window (bounded by a
  processing-time timeout so state can't grow forever).

Both run identically under ``trigger(availableNow)`` for backfills and
continuous triggers for live streams; watermark/timeout bounds state size at
100 TB event volumes.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key cumulative (n_events, sum_value) across micro-batches."""

    out_schema = f"{key_col} long, n_events long, sum_value double"
    state_schema = "n long, s double"

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf[value_col].sum())
        state.update((n, s))
        yield pd.DataFrame(
            [(key[0], n, s)], columns=[key_col, "n_events", "sum_value"]
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_dedup(
    events: DataFrame,
    key_col: str = "user_id",
    id_col: str = "event_id",
    state_timeout_ms: int | None = None,
) -> DataFrame:
    """Emit only first-seen (key, id) events across micro-batches; replays and
    duplicates are dropped.  State per key = the set of seen ids (bound it
    with ``state_timeout_ms`` in production so abandoned keys expire)."""

    out_schema = f"{key_col} long, {id_col} long"
    state_schema = "seen array<long>"
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_timeout_ms
        else GroupStateTimeout.NoTimeout
    )

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state_timeout_ms and state.hasTimedOut:
            state.remove()
            return
        (seen,) = state.get if state.exists else ([],)
        seen_set = set(seen)
        fresh: list[int] = []
        for pdf in pdfs:
            for eid in pdf[id_col]:
                eid = int(eid)
                if eid not in seen_set:
                    seen_set.add(eid)
                    fresh.append(eid)
        state.update((sorted(seen_set),))
        if state_timeout_ms:
            state.setTimeoutDuration(state_timeout_ms)
        if fresh:
            yield pd.DataFrame(
                [(key[0], eid) for eid in fresh], columns=[key_col, id_col]
            )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=timeout,
    )
