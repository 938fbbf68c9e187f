"""Custom stateful streaming operator via applyInPandasWithState
(north-star extension): a per-user running profile that Spark's
built-in windowed aggregations can't express — cumulative counts +
max-value watermark + a flag the FIRST time a user's cumulative value
crosses a threshold (emission depends on state history, not the batch).

State is one small tuple per user, persisted by Spark's state store
across micro-batches and evictable by timeout — the scalable shape for
custom per-key streaming logic (state size ∝ active keys).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, max_value double, "
    "crossed_threshold boolean"
)
STATE_SCHEMA = "n bigint, total double, mx double, flagged boolean"


def _update_user_profile_factory(threshold: float):
    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, total, mx, flagged = state.get
        else:
            n, total, mx, flagged = 0, 0.0, float("-inf"), False
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                mx = max(mx, float(pdf["value"].max()))
        crossed = (not flagged) and total >= threshold
        state.update((n, total, mx, flagged or crossed))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "max_value": [mx if mx != float("-inf") else 0.0],
                "crossed_threshold": [crossed],
            }
        )

    return update


def user_profile_stream(events: DataFrame, threshold: float = 1000.0) -> DataFrame:
    """Stateful per-user profile over a stream with the events schema.
    Emits one row per (user, micro-batch) carrying cumulative state;
    ``crossed_threshold`` fires exactly once per user."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_profile_factory(threshold),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
