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
    """Per-user lifetime (count, sum(value)) maintained across micro-batches
    (update mode). applyInPandasWithState is streaming-only in Spark 4, so
    the batch-equivalence contract is phrased as: a ONE-micro-batch stream
    over the full history equals groupBy().agg() (tests/test_streaming.py
    drives it that way)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming heavy hitters: Misra-Gries as MERGEABLE per-key state.
#
# The batch tier (operators/frequent.py) exploits MG's mergeability across
# partitions; this is the same summary carried across TIME — per event_type,
# a k-counter summary of the values seen so far, updated each micro-batch
# and emitted as the current top candidates. The guarantee transfers: any
# value with lifetime frequency > n/k per key survives in that key's
# summary no matter how the stream was batched (Agarwal et al. 2012,
# mergeable summaries). State per key is ≤ k counters — O(keys·k), never
# O(events) — the property that keeps the state store bounded on an
# unbounded stream; an exact streaming groupBy(value) would grow without
# bound.
# ---------------------------------------------------------------------------

MG_OUTPUT_SCHEMA = "event_type string, candidate string, weight bigint, n_seen bigint"
MG_STATE_SCHEMA = "candidates array<string>, weights array<bigint>, n bigint"
_MG_STREAM_K = 8


def _mg_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        cands, weights, n = state.get
        counters = dict(zip(cands, weights))
    else:
        counters, n = {}, 0
    for pdf in pdfs:
        for term in pdf["term"]:
            n += 1
            if term in counters:
                counters[term] += 1
            elif len(counters) < _MG_STREAM_K:
                counters[term] = 1
            else:
                dead = []
                for t in counters:
                    counters[t] -= 1
                    if counters[t] == 0:
                        dead.append(t)
                for t in dead:
                    del counters[t]
    state.update((list(counters.keys()), list(counters.values()), n))
    items = sorted(counters.items(), key=lambda kv: (-kv[1], kv[0]))
    yield pd.DataFrame(
        {
            "event_type": [key[0]] * len(items),
            "candidate": [t for t, _ in items],
            "weight": [w for _, w in items],
            "n_seen": [n] * len(items),
        }
    )


def streaming_heavy_hitters(events: DataFrame) -> DataFrame:
    """Per-event_type running MG summary over a `term` column; emits the
    current candidate set (update mode) each micro-batch. A one-micro-batch
    stream over the full history = the batch MG summary (the operator is
    streaming-only in Spark 4; mergeability makes any batching agree)."""
    return events.groupBy("event_type").applyInPandasWithState(
        _mg_update,
        outputStructType=MG_OUTPUT_SCHEMA,
        stateStructType=MG_STATE_SCHEMA,
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


# ---------------------------------------------------------------------------
# Timeout-driven sessionization: the canonical EventTimeTimeout pattern.
#
# session_window (streaming/windows.py) covers declarative sessions; this
# tier is the ARBITRARY-state variant a pipeline needs when the session
# payload isn't an aggregate Spark knows (custom accumulators, path traces):
# state = one open session per user, closed and EMITTED either when a new
# event arrives past the gap (same-key path) or when the watermark passes
# last_ts + gap with no successor (the timeout path — the case a pure
# groupBy can't express). Append semantics: a session row is emitted
# exactly once, when it closes; state per key is ONE session tuple,
# evicted on timeout — bounded regardless of stream length.
# ---------------------------------------------------------------------------

SESSION_OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_last timestamp, "
    "n_events bigint, sum_value double"
)
SESSION_STATE_SCHEMA = "start double, last double, n bigint, total double"


def _session_update(gap_seconds: float):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import datetime as _dt

        def emit(start, last, n, total):
            return pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [_dt.datetime.utcfromtimestamp(start)],
                    "session_last": [_dt.datetime.utcfromtimestamp(last)],
                    "n_events": [n],
                    "sum_value": [round(total, 2)],
                }
            )

        if state.hasTimedOut:
            start, last, n, total = state.get
            state.remove()
            yield emit(start, last, n, total)
            return

        rows = pd.concat(list(pdfs))
        ts = rows["ts"].map(lambda t: t.timestamp()).to_numpy()
        order = ts.argsort(kind="stable")
        ts = ts[order]
        vals = rows["value"].to_numpy()[order]
        if state.exists:
            start, last, n, total = state.get
        else:
            start, last, n, total = ts[0], ts[0], 0, 0.0
        for t, v in zip(ts, vals):
            if t - last > gap_seconds:
                yield emit(start, last, n, total)
                start, last, n, total = t, t, 1, float(v)
            else:
                last = max(last, t)
                n += 1
                total += float(v)
        state.update((float(start), float(last), int(n), float(total)))
        state.setTimeoutTimestamp(int((last + gap_seconds) * 1000))

    return update


def sessionize_with_timeout(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Arbitrary-state sessionizer with event-time timeout eviction.
    Requires a watermarked streaming DataFrame; emits each closed session
    exactly once (append mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _session_update(gap_minutes * 60.0),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming debounce: the stateful twin of the batch gaps-and-islands
# operator (plans/streaming_queries.event_debounce). State per
# (user_id, event_type) key is ONE scalar — the last event's timestamp in
# microseconds — so the state store is O(active keys) on an unbounded
# stream. An event is emitted iff its gap from the key's previous event
# exceeds the threshold (a burst head); everything else is swallowed.
# Contract: per-key in-order delivery (the standard debounce assumption;
# pair with a watermark + sort-within-batch upstream when the transport
# reorders).
# ---------------------------------------------------------------------------

DEBOUNCE_OUTPUT_SCHEMA = "event_id bigint, user_id bigint, event_type string"
DEBOUNCE_STATE_SCHEMA = "last_us bigint"


def _debounce_update(gap_seconds: float):
    gap_us = int(gap_seconds * 1_000_000)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs))
        if rows.empty:
            return
        rows = rows.sort_values(["ts", "event_id"])
        us = (rows["ts"].astype("int64")).to_numpy()  # pandas ns → keep relative
        ids = rows["event_id"].to_numpy()
        last = state.get[0] if state.exists else None
        kept = []
        for i in range(len(rows)):
            t = int(us[i]) // 1000  # ns → µs
            if last is None or t - last > gap_us:
                kept.append(int(ids[i]))
            last = t
        state.update((int(last),))
        if kept:
            yield pd.DataFrame(
                {
                    "event_id": kept,
                    "user_id": [int(key[0])] * len(kept),
                    "event_type": [str(key[1])] * len(kept),
                }
            )

    return update


def debounce_stream(events: DataFrame, gap_seconds: int = 5) -> DataFrame:
    """Emit only burst-head events per (user, type); bounded per-key state.
    Same islands the batch event_debounce counts — tests assert equality."""
    return events.groupBy("user_id", "event_type").applyInPandasWithState(
        _debounce_update(float(gap_seconds)),
        outputStructType=DEBOUNCE_OUTPUT_SCHEMA,
        stateStructType=DEBOUNCE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming distinct count: portable HLL registers as MERGEABLE per-key
# state — the sketch twin of streaming_heavy_hitters. Per event_type, m=64
# registers carry the Flajolet HyperLogLog summary across micro-batches;
# register-wise max IS the merge, so the estimate after any batching of
# the stream equals the estimate over the concatenated history (the same
# mergeability the batch tier exploits across partitions,
# plans/relational.hll_portable). State per key is m small ints — O(keys)
# forever, where an exact streaming countDistinct's state is O(distinct
# values) and grows without bound.
# ---------------------------------------------------------------------------

HLL_STREAM_SCHEMA = "event_type string, n_seen bigint, ndv_est double"
HLL_STREAM_STATE = "regs array<int>, n bigint"
_HLL_STREAM_M = 64  # 2^6 registers -> ~13% standard error


def _hll_stream_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import hashlib
    import math

    if state.exists:
        regs, n = list(state.get[0]), int(state.get[1])
    else:
        regs, n = [0] * _HLL_STREAM_M, 0
    for pdf in pdfs:
        n += len(pdf)
        for uid in pdf["user_id"]:
            h = int.from_bytes(hashlib.md5(str(int(uid)).encode()).digest()[:8], "big")
            bucket = h >> 58  # top 6 bits
            rest = h & ((1 << 58) - 1)
            rho = 58 - rest.bit_length() + 1  # leading zeros + 1 in 58 bits
            if rho > regs[bucket]:
                regs[bucket] = rho
    state.update((regs, n))
    alpha = 0.709  # published constant for m = 64
    z = sum(2.0 ** -r for r in regs)
    est = alpha * _HLL_STREAM_M * _HLL_STREAM_M / z  # ansi: Python; z >= m * 2^-58 > 0
    zeros = regs.count(0)
    if est <= 2.5 * _HLL_STREAM_M and zeros > 0:  # small-range correction
        est = _HLL_STREAM_M * math.log(_HLL_STREAM_M / zeros)  # ansi: Python; zeros > 0 guard
    yield pd.DataFrame(
        {"event_type": [key[0]], "n_seen": [n], "ndv_est": [round(est, 2)]}
    )


def streaming_distinct_users(events: DataFrame) -> DataFrame:
    """Per-event_type running distinct-user ESTIMATE (update mode). A
    one-micro-batch stream over the full history produces the identical
    registers any batching produces — the merge-insensitivity contract
    tests/test_streaming.py pins (applyInPandasWithState itself is
    streaming-only in Spark 4, so the single-batch stream IS the batch
    formulation)."""
    return events.groupBy("event_type").applyInPandasWithState(
        _hll_stream_update,
        outputStructType=HLL_STREAM_SCHEMA,
        stateStructType=HLL_STREAM_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
