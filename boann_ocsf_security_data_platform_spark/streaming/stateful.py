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
    StringType,
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


ALERTS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("value", DoubleType()),
        StructField("zscore", DoubleType()),
    ]
)
_WELFORD_STATE = "n BIGINT, mean DOUBLE, m2 DOUBLE"


def streaming_zscore_alerts(
    stream_df, threshold: float = 3.0, min_obs: int = 10
):
    """Per-key streaming anomaly alerts: each event is scored against the
    key's RUNNING mean/variance (Welford's numerically-stable online
    update — never materializes a sum of squares) and emitted only when
    |z| > ``threshold`` after at least ``min_obs`` prior observations —
    the alerting shape of a security pipeline, where the batch z-score
    detector (events_zscore_anomalies, full-distribution stats) becomes
    an online score-then-update over bounded O(1)-per-key state.

    Events are processed in (ts, event_id) order within each micro-batch
    so replays are deterministic; scoring happens BEFORE the event
    updates the state (an outlier must not mask itself). State is three
    doubles per key in the checkpointed state store, shuffled by the
    groupBy — horizontal scale is the number of executors, state size is
    O(distinct keys), independent of stream length.

    Batch/stream parity contract (pinned by
    test_streaming_zscore_alerts_matches_replay): running the same rows
    through a single-key Python replay of score-then-Welford-update
    yields the same alert set.
    """

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import math

        n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
        out_ids, out_vals, out_z = [], [], []
        # concat BEFORE sorting: a key whose micro-batch exceeds the Arrow
        # chunk size arrives as several frames in arbitrary order —
        # per-chunk sorting would score early-ts rows against state
        # already advanced by later rows
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            whole = pd.concat(chunks).sort_values(["ts", "event_id"])
            for _, row in whole.iterrows():
                v = float(row["value"])
                if n >= min_obs:
                    var = m2 / (n - 1)
                    if var > 0:
                        z = (v - mean) / math.sqrt(var)
                        if abs(z) > threshold:
                            out_ids.append(int(row["event_id"]))
                            out_vals.append(v)
                            out_z.append(round(z, 4))
                n += 1
                delta = v - mean
                mean += delta / n
                m2 += delta * (v - mean)
        state.update((n, mean, m2))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(out_ids),
                "event_id": out_ids,
                "value": out_vals,
                "zscore": out_z,
            }
        )

    return stream_df.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=ALERTS_SCHEMA,
        stateStructType=_WELFORD_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HEAVY_HITTER_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("item", LongType()),
        StructField("est_count", LongType()),
        StructField("n_seen", LongType()),
    ]
)

_HH_STATE_SCHEMA = "items ARRAY<BIGINT>, counts ARRAY<BIGINT>, n_seen BIGINT"


def streaming_heavy_hitters(stream_df, k: int = 8):
    """Per-key Misra-Gries heavy-hitter sketch maintained across
    micro-batches (Misra & Gries 1982): at most ``k`` counters per group
    key; every item with true frequency > n/(k+1) is GUARANTEED present,
    and every estimate undercounts by at most n/(k+1) — the streaming
    top-talkers primitive (noisy users, hot partitions, abusive IPs)
    whose state is O(k) per key FOREVER, unlike a true count which grows
    with the item universe.

    Input stream needs ``event_type`` (the group key) and ``user_id``
    (the item). Emits the sketch's current candidates each batch; state
    rides the checkpointed state store like the other stateful
    operators. The sketch is deterministic for a given arrival order, so
    an availableNow drain over sorted files replays identically — pinned
    with the error-bound parity test against exact batch counts."""

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, counts, n_seen = state.get
            sketch = dict(zip(items, counts))
        else:
            sketch, n_seen = {}, 0
        for pdf in pdfs:
            for item in pdf["user_id"]:
                item = int(item)
                n_seen += 1
                if item in sketch:
                    sketch[item] += 1
                elif len(sketch) < k:
                    sketch[item] = 1
                else:
                    # decrement-all step: the O(k) amortized compaction
                    sketch = {
                        i: c - 1 for i, c in sketch.items() if c > 1
                    }
        items = sorted(sketch)
        state.update(
            (items, [sketch[i] for i in items], n_seen)
        )
        yield pd.DataFrame(
            {
                "event_type": [key[0]] * len(items),
                "item": items,
                "est_count": [sketch[i] for i in items],
                "n_seen": [n_seen] * len(items),
            }
        )

    return stream_df.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=HEAVY_HITTER_SCHEMA,
        stateStructType=_HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


BOTTOMK_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("item", LongType()),
        StructField("h", LongType()),
        StructField("n_seen", LongType()),
    ]
)

_BK_STATE_SCHEMA = "items ARRAY<BIGINT>, hashes ARRAY<BIGINT>, n_seen BIGINT"


def streaming_bottom_k_sample(stream_df, k: int = 8):
    """Cross-batch bottom-k sample per key: keep the ``k`` DISTINCT items
    with the smallest portable 60-bit hash — a deterministic uniform
    sample of the distinct-item set that is ALSO a distinct-count sketch
    (the classic bottom-k/KMV estimator: n̂ ≈ (k−1)·2^60/h_(k)) and is
    ORDER-INDEPENDENT: unlike reservoir sampling there is no RNG and no
    arrival-order dependence, so the streamed result over any batch split
    EXACTLY equals the batch computation — pinned by the equality test.
    State is the k (item, hash) pairs per key, O(k) forever.

    Input stream needs ``event_type`` and ``user_id``. Hash is the same
    md5-based hash64 the dedup/LSH family uses, so the sample is
    reproducible across engines and reshardings."""
    import hashlib

    def h64(item: int) -> int:
        return int(
            hashlib.md5(f"bk:{item}".encode()).hexdigest()[:15], 16
        )

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, hashes, n_seen = state.get
            best = dict(zip(items, hashes))
        else:
            best, n_seen = {}, 0
        for pdf in pdfs:
            for item in pdf["user_id"]:
                item = int(item)
                n_seen += 1
                if item not in best:
                    best[item] = h64(item)
                    if len(best) > k:
                        worst = max(best, key=lambda i: best[i])
                        del best[worst]
        items = sorted(best)
        state.update((items, [best[i] for i in items], n_seen))
        yield pd.DataFrame(
            {
                "event_type": [key[0]] * len(items),
                "item": items,
                "h": [best[i] for i in items],
                "n_seen": [n_seen] * len(items),
            }
        )

    return stream_df.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=BOTTOMK_SCHEMA,
        stateStructType=_BK_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
