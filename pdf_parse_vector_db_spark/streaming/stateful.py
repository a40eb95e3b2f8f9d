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
