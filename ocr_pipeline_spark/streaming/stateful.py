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
streaming twin of the batch query, with the one semantic difference
inherent to unbounded input: the final (still-open) session per user
is emitted only once a later event closes it.
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


def make_sessionizer(gap_seconds: int = 1800):
    gap_us = gap_seconds * _US

    def sessionize(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = int(key[0])
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
            if n and e_us - last_us > gap_us:
                closed.append(
                    {
                        "user_id": user_id,
                        "session_start": pd.Timestamp(start_us * 1_000),
                        "session_end": pd.Timestamp(last_us * 1_000),
                        "n_events": n,
                        "session_value": round(val, 2),
                    }
                )
                start_us, n, val = e_us, 0, 0.0
            if not n:
                start_us = e_us
            last_us = e_us
            n += 1
            val += float(value)

        state.update((start_us, last_us, n, val))
        if closed:
            yield pd.DataFrame(closed)

    return sessionize


def sessionize_stream(
    events: DataFrame, gap_seconds: int = 1800
) -> DataFrame:
    """events stream (event_id, ts, user_id, value, ...) -> closed
    sessions.  Grouped Arrow state; append output mode."""
    return (
        events.select("event_id", "ts", "user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            make_sessionizer(gap_seconds),
            outputStructType=SESSION_OUT_DDL,
            stateStructType=SESSION_STATE_DDL,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
