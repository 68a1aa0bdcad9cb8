"""Custom stateful streaming operator: gap-based sessionization.

The batch shell expresses 30-minute-gap sessions with lag + cumulative
windows (`__spark_entry__._q_events_sessionized`); on an unbounded
stream the same semantics need per-key state that survives across
micro-batches — exactly what `applyInPandasWithState` provides
(Arrow-batched grouped state, no per-row Python).

Per user: events extend the open session while gaps stay ≤ gap_seconds;
a larger gap closes the session (emitted downstream) and opens a new
one. The open session is carried in the state store between triggers
and keeps absorbing events on later micro-batches/restarts — the
streaming twin of the batch query.

Unbounded-stream guarantees (vs the batch twin):
  * state can be BOUNDED: pass `timeout_factor=N` to arm a
    processing-time timeout of `N × gap_seconds` that fires for idle
    users, emitting their open session as closed and evicting the state
    row — without it, one state entry per ever-seen user lives forever.
    The timeout is OPT-IN because ProcessingTimeTimeout is incompatible
    with Trigger.AvailableNow (Spark keeps scheduling no-data batches
    until pending timeouts fire, so the query never terminates): arm it
    on continuous `processingTime` deployments, leave it off for
    availableNow catch-up runs;
  * cross-micro-batch ordering: events are sorted within a micro-batch,
    but an event arriving in a LATER micro-batch with ts < the stored
    last_us would silently extend or mis-split the open session.  Such
    late events are DROPPED (the operator's documented watermark
    analog).  Run the batch query for exact retroactive sessionization.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUT_DDL = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events int, session_value double"
)
# open-session carry: epoch micros keep the state schema primitive
SESSION_STATE_DDL = "start_us bigint, last_us bigint, n int, val double"

_US = 1_000_000


def _to_us(ts: Any) -> int:
    return int(pd.Timestamp(ts).value // 1_000)


def make_sessionizer(gap_seconds: int = 1800, timeout_factor: int | None = None):
    gap_us = gap_seconds * _US
    timeout_ms = gap_seconds * (timeout_factor or 0) * 1000

    def sessionize(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = int(key[0])

        def session_row(start_us: int, last_us: int, n: int, val: float) -> dict:
            return {
                "user_id": user_id,
                "session_start": pd.Timestamp(start_us * 1_000),
                "session_end": pd.Timestamp(last_us * 1_000),
                "n_events": n,
                "session_value": round(val, 2),
            }

        if state.hasTimedOut:
            # idle user: close + emit the open session, evict the state
            # row — the state store stays bounded by ACTIVE users
            if state.exists:
                start_us, last_us, n, val = state.get
                state.remove()
                if n:
                    yield pd.DataFrame([session_row(start_us, last_us, n, val)])
            return

        batch = pd.concat(list(pdfs))
        batch = batch.sort_values(["ts", "event_id"], kind="mergesort")

        if state.exists:
            start_us, last_us, n, val = state.get
        else:
            start_us = last_us = -1
            n = 0
            val = 0.0

        closed: list[dict] = []
        for ts, value in zip(batch["ts"], batch["value"]):
            e_us = _to_us(ts)
            if n and e_us < last_us:
                # late arrival from an earlier micro-batch: extending the
                # session backwards would diverge from the batch twin —
                # drop (documented watermark analog)
                continue
            if n and e_us - last_us > gap_us:
                closed.append(session_row(start_us, last_us, n, val))
                start_us, n, val = e_us, 0, 0.0
            if not n:
                start_us = e_us
            last_us = e_us
            n += 1
            val += float(value)

        state.update((start_us, last_us, n, val))
        if timeout_factor:
            state.setTimeoutDuration(timeout_ms)
        if closed:
            yield pd.DataFrame(closed)

    return sessionize


def sessionize_stream(
    events: DataFrame, gap_seconds: int = 1800, timeout_factor: int | None = None
) -> DataFrame:
    """events stream (event_id, ts, user_id, value, ...) -> closed
    sessions.  Grouped Arrow state; append output mode.

    `timeout_factor=N` (continuous deployments only — see module
    docstring) closes out and evicts idle users after N × gap_seconds
    of processing time, bounding the state store by ACTIVE users."""
    return (
        events.select("event_id", "ts", "user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            make_sessionizer(gap_seconds, timeout_factor),
            outputStructType=SESSION_OUT_DDL,
            stateStructType=SESSION_STATE_DDL,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if timeout_factor
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
