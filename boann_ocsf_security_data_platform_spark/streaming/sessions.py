"""Stateful streaming sessionization via applyInPandasWithState.

Spark's native ``session_window`` aggregation covers windowed aggregates,
but a training-data/event pipeline usually wants the SESSION ROWS
themselves (start, end, size per user) emitted exactly once as sessions
close — the reference has no streaming surface at all (its monitor is a
batch sweep), so this is the SURVEY §2.7 extension alongside
streaming/neardup.py and streaming/decontam.py.

Semantics match the batch ``events_sessionize`` query (__spark_entry__):
events sorted by (ts, event_id) per user; a gap STRICTLY greater than
``gap`` starts a new session (a gap of exactly ``gap`` stays inside —
the inclusive bound pinned by the batch oracle). State per user is ONE
open session (start, end, n) — bounded regardless of history length.
Sessions are emitted when

- a later event for the same user arrives past the gap (gap close), or
- the event-time watermark passes ``session_end + gap`` (timeout close),

so every session is emitted exactly once (append mode) and state cannot
grow without bound. At scale the state store is keyed by user_id and
shards with the stream's groupBy shuffle across executors.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

_STATE_SCHEMA = (
    "session_start timestamp, session_end timestamp, n_events bigint"
)


def sessionize_stream(stream_df, gap_minutes: int = 30, watermark: str = "0 seconds"):
    """Emit closed (user_id, session_start, session_end, n_events) rows.

    ``stream_df`` must carry ``user_id``, ``ts`` (event-time timestamp)
    and ``event_id`` (deterministic intra-timestamp tie-break, matching
    the batch query's ordering). The watermark bounds how late an event
    may arrive and drives the timeout that flushes idle open sessions.
    """
    gap = pd.Timedelta(minutes=gap_minutes)

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        uid = key[0]
        closed: list[tuple] = []
        if state.hasTimedOut:
            # watermark passed end+gap: the open session can never extend
            start, end, n = state.get
            closed.append((uid, start, end, n))
            state.remove()
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id",
                    "session_start",
                    "session_end",
                    "n_events",
                ],
            )
            return
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ts", "event_id"]
        )
        if state.exists:
            start, end, n = state.get
            start, end = pd.Timestamp(start), pd.Timestamp(end)
        else:
            start = end = None
            n = 0
        for ts in rows["ts"]:
            ts = pd.Timestamp(ts)
            if start is None:
                start, end, n = ts, ts, 1
            elif ts - end > gap:
                closed.append((uid, start, end, n))
                start, end, n = ts, ts, 1
            else:
                end = max(end, ts)
                n += 1
        state.update((start.to_pydatetime(), end.to_pydatetime(), int(n)))
        # flush the open session once the watermark passes end + gap
        # (clamped above the current watermark — Spark rejects timeouts
        # at or below it)
        state.setTimeoutTimestamp(
            max(
                int((end + gap).value // 1_000_000) + 1,
                state.getCurrentWatermarkMs() + 1,
            )
        )
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id",
                    "session_start",
                    "session_end",
                    "n_events",
                ],
            )

    return (
        stream_df.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
