"""Custom stateful streaming operator (SURVEY §2.9 T4 [ext]).

The reference has no cross-request state (each HTTP request is an isolated
batch, extract_and_embed.py:174-189); this extension adds the piece a
continuous service needs: per-key running aggregates that survive across
micro-batches via `applyInPandasWithState` — arbitrary user state,
checkpointed, exactly-once under the file-source + checkpoint contract.

Shape: one stateful exchange keyed on user_id; state per key is two scalars
(count, sum), so state-store size is O(distinct keys), not O(events). At
100 TB-of-stream scale this is the canonical pattern — bounded per-key
state, update-mode emission, watermark-driven eviction when keys are
time-scoped (pair with streaming/windows.py for event-time variants).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user lifetime (count, sum(value)) maintained across micro-batches.
    Works on a streaming DataFrame (update mode); the same call on a batch
    DataFrame degenerates to one "micro-batch" and equals groupBy().agg()."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas tier (Spark 4.x arbitrary-state v2): typed state
# variables + emit-on-change semantics. high_water_marks emits a row ONLY
# when a user's max(value) strictly increases — the CDC-flavored shape that
# applyInPandasWithState can't express as cheaply (it must re-emit per
# batch). State per key is one double, so the state store stays O(keys).
#
# ENV-GATED: the TWS state-server protocol needs `protobuf`, absent from
# this container (same gating policy as the PyMuPDF/openai paths —
# operators/embedder.py). `tws_available()` probes; the test skips when
# False; the applyInPandasWithState twin above covers the semantics here.
# ---------------------------------------------------------------------------


def tws_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False

HIGH_WATER_SCHEMA = "user_id bigint, high_water double"


class _HighWaterProcessor:
    """StatefulProcessor tracking per-user max(value); emits on increase.

    Defined lazily as a plain class implementing the StatefulProcessor
    protocol (init/handleInputRows/close) so importing this module never
    requires the streaming-state runtime."""

    def init(self, handle) -> None:
        self._hw = handle.getValueState("high_water", "m double")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        prev = self._hw.get()[0] if self._hw.exists() else None
        best = prev
        for pdf in rows:
            m = float(pdf["value"].max())
            if best is None or m > best:
                best = m
        if best is not None and (prev is None or best > prev):
            self._hw.update((best,))
            yield pd.DataFrame({"user_id": [key[0]], "high_water": [best]})

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return iter(())

    def handleInitialState(self, key, initialState, timerValues) -> None:
        pass

    def close(self) -> None:
        pass


def high_water_marks(events: DataFrame) -> DataFrame:
    """Per-user running max(value) with emit-on-increase semantics across
    micro-batches (transformWithStateInPandas, update mode, no time
    semantics — pair with TTL/timers for time-scoped state)."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    proc = type(
        "HighWaterProcessor", (_HighWaterProcessor, StatefulProcessor), {}
    )()
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=HIGH_WATER_SCHEMA,
        outputMode="update",
        timeMode="none",
    )
