"""Custom stateful streaming operator (north-star extension): a
per-user running profile that Spark's built-in windowed aggregations
can't express — cumulative counts + max-value watermark + a flag the
FIRST time a user's cumulative value crosses a threshold (emission
depends on state history, not the batch).

State is one small tuple per user, persisted by Spark's state store
across micro-batches and evictable by timeout/TTL — the scalable shape
for custom per-key streaming logic (state size ∝ active keys).

Two API arms, same semantics (tests/test_stateful_streaming.py runs the
streaming≡batch equivalence against BOTH):

- ``transformWithStateInPandas`` (Spark 4.x, the ``transformWithState``
  family): the DEFAULT where the runtime supports it —
  ``applyInPandasWithState`` is soft-deprecated in 4.x, and the
  processor-object API adds composite state, timers, TTL, and
  initial-state handoff. Requires (a) the RocksDB state store provider
  (enforced by Spark; the helper sets it for the query's session if
  unset) and (b) the ``protobuf`` Python package — Spark 4 runs the
  processor through a protobuf-framed state-server protocol between
  the Python worker and the JVM. This container has no protobuf (and
  no pip), so HERE the arm is exercised only as far as plan
  construction; tests skip its execution with an explicit reason, the
  same environmental gate as the JDBC sink's live-database arm.
- ``applyInPandasWithState`` (runs everywhere): function + GroupState
  tuple, kept for the 3.5 environment arm (REQUIREMENTS.md posture:
  degrade across the version boundary, don't break).

``api="auto"`` probes the actual runtime (API present AND protobuf
importable), so callers get a stream that can EXECUTE, never an arm
that crashes at start-up.
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

_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def _step(
    state_tuple: tuple[int, float, float, bool] | None,
    pdfs: Iterator[pd.DataFrame],
    threshold: float,
    key: tuple[Any, ...],
) -> tuple[tuple[int, float, float, bool], pd.DataFrame]:
    """Shared per-key transition: fold the batch into (n, total, mx,
    flagged) and build the emission row. ONE implementation so the two
    API arms cannot drift semantically."""
    if state_tuple is not None:
        n, total, mx, flagged = state_tuple
    else:
        n, total, mx, flagged = 0, 0.0, float("-inf"), False
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    crossed = (not flagged) and total >= threshold
    out = pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "max_value": [mx if mx != float("-inf") else 0.0],
            "crossed_threshold": [crossed],
        }
    )
    return (n, total, mx, flagged or crossed), out


def _update_user_profile_factory(threshold: float):
    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        new_state, out = _step(
            tuple(state.get) if state.exists else None, pdfs, threshold, key
        )
        state.update(new_state)
        yield out

    return update


def _make_processor(threshold: float):
    """Build the transformWithState processor class lazily so importing
    this module never fails on Spark 3.x (no stateful_processor)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserProfileProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("profile", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            prev = tuple(self._state.get()) if self._state.exists() else None
            new_state, out = _step(prev, rows, threshold, key)
            self._state.update(new_state)
            yield out

        def close(self) -> None:
            pass

    return UserProfileProcessor()


def tws_runtime_available(df_or_grouped=None) -> bool:
    """True when transformWithStateInPandas can actually EXECUTE here:
    the API exists (Spark 4.x) and the protobuf package its state
    protocol needs is importable."""
    import importlib.util

    has_api = (
        hasattr(df_or_grouped, "transformWithStateInPandas")
        if df_or_grouped is not None
        else int(__import__("pyspark").__version__.split(".")[0]) >= 4
    )
    try:
        # find_spec raises (rather than returning None) when the parent
        # 'google' namespace package is absent entirely
        has_protobuf = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        has_protobuf = False
    return bool(has_api) and has_protobuf


def user_profile_stream(
    events: DataFrame, threshold: float = 1000.0, api: str = "auto"
) -> DataFrame:
    """Stateful per-user profile over a stream with the events schema.
    Emits one row per (user, micro-batch) carrying cumulative state;
    ``crossed_threshold`` fires exactly once per user.

    ``api``: "auto" (transformWithState where the runtime can execute
    it, else applyInPandasWithState), or force an arm with
    "transformWithState" / "applyInPandasWithState"."""
    grouped = events.select("user_id", "value").groupBy("user_id")
    use_tws = api == "transformWithState" or (
        api == "auto" and tws_runtime_available(grouped)
    )
    if use_tws:
        spark = events.sparkSession
        conf_key = "spark.sql.streaming.stateStore.providerClass"
        # transformWithState only runs on the RocksDB provider; set it
        # unless the session already pinned one explicitly.
        if _ROCKSDB_PROVIDER not in (spark.conf.get(conf_key, "") or ""):
            spark.conf.set(conf_key, _ROCKSDB_PROVIDER)
        return grouped.transformWithStateInPandas(
            _make_processor(threshold),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="update",
            timeMode="none",
        )
    return grouped.applyInPandasWithState(
        _update_user_profile_factory(threshold),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
