"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no event-time state (its monitor is a batch sweep);
this is the SURVEY §2.7 streaming-surface extension: arbitrary per-key
state maintained across micro-batches, Arrow-batched, with timeout-based
eviction — the building block for running aggregates, entity profiles,
and alert suppression windows over OCSF findings or events at scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_STATS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = "n_events BIGINT, total_value DOUBLE"


def running_user_stats(stream_df):
    """Per-user running (count, sum) maintained across micro-batches.

    Input stream schema must contain ``user_id`` and ``value``. Emits one
    updated row per user per batch. State lives in the state store
    (checkpointed, fault-tolerant); keys are distributed by the stream's
    groupBy shuffle, so state scales horizontally with executors.
    """

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return (
        stream_df.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


PROFILE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("recent_avg", DoubleType()),
    ]
)


def user_profile_stats(stream_df, recent_n: int = 3):
    """Per-user running profile on Spark 4's transformWithStateInPandas —
    the successor API to applyInPandasWithState: typed composite state
    (one ValueState for the running (count, sum), one ListState for the
    last ``recent_n`` values), per-state TTL support, and timers.

    Emits (user_id, n_events, total_value, recent_avg) per key per batch,
    where recent_avg averages only the trailing ``recent_n`` values — the
    running-total + sliding-profile combination a fraud/entity-profile
    pipeline keeps per key. State is checkpointed in the state store and
    partitioned by the groupBy shuffle, so it scales with executors exactly
    like the applyInPandasWithState variant.

    Runtime requirement: transformWithStateInPandas talks to its state
    server over protobuf, so ``google.protobuf`` must be installed on the
    workers (it is not in this container — the test suite skips the live
    run when the import is missing; ``running_user_stats`` above is the
    dependency-free stateful path that runs everywhere).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _ProfileProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "n BIGINT, total DOUBLE"
            )
            self._recent = handle.getListState("recent", "v DOUBLE")

        def handleInputRows(self, key, rows, timerValues):
            n, total = (
                self._totals.get() if self._totals.exists() else (0, 0.0)
            )
            new_vals: list[float] = []
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                new_vals.extend(float(v) for v in pdf["value"])
            if new_vals:
                self._recent.appendList([(v,) for v in new_vals])
            self._totals.update((n, total))
            tail = [v for (v,) in self._recent.get()][-recent_n:]
            # keep the ListState bounded: rewrite it to the tail we keep
            self._recent.put([(v,) for v in tail])
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "recent_avg": [sum(tail) / len(tail) if tail else None],
                }
            )

        def close(self) -> None:
            pass

    return stream_df.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_ProfileProcessor(),
        outputStructType=PROFILE_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
