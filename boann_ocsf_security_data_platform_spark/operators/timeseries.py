"""Time-series / event-log operators: the TSDB-style rollups a security
or product event pipeline runs next to its relational queries.

All timestamp arithmetic uses ``timestampdiff``/``date_trunc``/interval
compares — NTZ-safe (the driver's parquet is tz-less, which Spark 4 reads
as TIMESTAMP_NTZ) and independent of session timezone, the same contract
as events_sessionize. Every operator is a window or aggregate over the
entity key, so at 100 TB the only shuffle is the per-key repartition the
computation inherently needs — no global windows anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_weighted_avg(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    tiebreak_col: str = "event_id",
    decimals: int = 6,
) -> DataFrame:
    """Time-weighted average of ``val_col`` per key: each observation is
    weighted by the seconds until the NEXT observation (the value "held"
    for that long) — the correct mean for irregularly-sampled gauges,
    where the arithmetic mean over-weights bursts. The trailing
    observation has no successor and carries no weight (standard
    left-closed convention).

    One lead() window per key + one aggregate; keys with a single
    observation yield NULL (no held interval exists — reported honestly,
    not as the raw value). Returns ``(key, twa, n_intervals,
    total_seconds)``. Durations are microsecond-exact
    (``timestampdiff(MICROSECOND)`` — whole-second diff functions count
    BOUNDARY CROSSINGS in some engines and elapsed time in others, a
    30-second drift on real sub-second data).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    dur = F.expr(f"timestampdiff(MICROSECOND, {ts_col}, _lead_ts)")
    stepped = df.withColumn("_lead_ts", F.lead(ts_col).over(w)).withColumn(
        "_dur_s", dur.cast("double") / F.lit(1_000_000.0)
    )
    return stepped.groupBy(key_col).agg(
        F.round(
            F.sum(F.col(val_col) * F.col("_dur_s")) / F.sum("_dur_s"), decimals
        ).alias("twa"),
        F.count("_dur_s").cast("long").alias("n_intervals"),
        F.floor(F.coalesce(F.sum("_dur_s"), F.lit(0.0))).cast("long").alias(
            "total_seconds"
        ),
    )


def ohlc_bars(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
    tiebreak_col: str = "event_id",
    bucket: str = "hour",
    decimals: int = 6,
) -> DataFrame:
    """Downsample an event stream into open/high/low/close/volume bars per
    key per ``bucket`` (hour by default) — the classic TSDB/market rollup,
    equally the shape of a security-metrics downsample. ONE partial+final
    aggregate with a single shuffle: open/close are min/max over a
    ``(ts, tiebreak, value)`` struct, so first/last are deterministic even
    with equal timestamps; no window. (Struct-keyed min/max plans as
    SortAggregate — Spark's hash aggregate needs primitive buffers — but
    both phases still combine map-side, so the exchange carries one row
    per (key, bar) per task; trading the per-partition sort for full
    determinism is the right call for an oracle-verified rollup.)
    """
    s = F.struct(F.col(ts_col), F.col(tiebreak_col), F.col(val_col).alias("v"))
    return (
        df.groupBy(
            F.col(key_col), F.date_trunc(bucket, F.col(ts_col)).alias("bar_start")
        )
        .agg(
            F.round(F.min(s)["v"], decimals).alias("open"),
            F.round(F.max(val_col), decimals).alias("high"),
            F.round(F.min(val_col), decimals).alias("low"),
            F.round(F.max(s)["v"], decimals).alias("close"),
            F.round(F.sum(val_col), decimals).alias("volume"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def locf_fill(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    tiebreak_col: str = "event_id",
    out_col: str = "filled",
) -> DataFrame:
    """Last-observation-carried-forward fill: replace NULLs in
    ``val_col`` with the most recent non-NULL value for the key — the
    standard sensor/gauge gap-repair. ``last(..., ignorenulls=True)``
    over a running frame; rows before the first observation stay NULL
    (nothing to carry)."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col, F.last(val_col, ignorenulls=True).over(w))


def scd2_intervals(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    attr_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Build a slowly-changing-dimension type-2 history from a change log:
    collapse consecutive identical ``attr_col`` observations per key into
    ``(key, attr, valid_from, valid_to, is_current)`` intervals — the
    warehouse dimension-build every CDC pipeline runs.

    Two windows over the same per-key ordering (one partitioning shuffle,
    reused): lag() marks change points, lead() over the surviving change
    rows closes each interval. The open (current) interval has NULL
    valid_to.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    changed = (
        df.withColumn("_prev", F.lag(attr_col).over(w))
        .filter(
            F.col("_prev").isNull() | (F.col("_prev") != F.col(attr_col))
        )
        .select(
            key_col, F.col(attr_col), F.col(ts_col).alias("valid_from"),
            F.col(tiebreak_col).alias("_tb"),
        )
    )
    w2 = Window.partitionBy(key_col).orderBy("valid_from", "_tb")
    return (
        changed.withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("_tb")
    )


def top_k_paths(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    step_col: str = "event_type",
    tiebreak_col: str = "event_id",
    path_len: int = 3,
    k: int = 10,
) -> DataFrame:
    """Most frequent length-``path_len`` event sequences across all keys —
    user-journey / attack-chain mining. Per key: one ordered
    re-aggregation (``array_sort(collect_list(struct))`` — bounded by the
    per-key event count, the same contract as sessionized analytics; for
    unbounded keys, sessionize first); path construction is a row-local
    slice over the ordered steps; the global count is map-side combinable
    and the final cut is a TakeOrderedAndProject. Ties break by path
    string ascending.
    """
    per_key = df.groupBy(key_col).agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col(ts_col), F.col(tiebreak_col), F.col(step_col).alias("s"))
                )
            ),
            lambda x: x["s"],
        ).alias("_steps")
    )
    n = F.size("_steps")
    paths = per_key.select(
        F.explode(
            F.when(
                n >= path_len,
                F.transform(
                    F.sequence(F.lit(1), n - (path_len - 1)),
                    lambda i: F.array_join(
                        F.slice("_steps", i, path_len), ">"
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("path"))
        .limit(k)
    )


def cusum_changepoints(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    drift_k: float = 0.5,
    threshold_h: float = 4.0,
) -> DataFrame:
    """Two-sided CUSUM drift detection over the daily aggregate series
    (Page 1954): standardize each day's total against the series'
    mean/std, then accumulate positive and negative deviations beyond
    the drift allowance ``drift_k``; a day is a change point when either
    accumulator exceeds ``threshold_h``.

    The textbook recursion ``S_t = max(0, S_{t-1} + z_t - k)`` is not a
    window aggregate — but it has the closed form
    ``S_t = P_t - min(P_0..P_t)`` with ``P_t = Σ(z_i - k)`` (P_0 = 0),
    so the whole detector is two running windows (sum + min) over the
    day-ordered series: one shuffle to the day grain, then O(n) window
    work, no self-joins, no iteration. Days are a bounded series
    regardless of corpus size (100 TB of events still rolls up to one
    row per day before the windows run), so the ordered single-partition
    window is safe by construction.

    Returns one row per day: day, daily total, z-score, both CUSUM
    statistics, and the change-point flag.
    """
    daily = df.groupBy(
        F.date_trunc("day", F.col(ts_col)).alias("d")
    ).agg(F.sum(value_col).alias("v"))
    # mu/sigma as empty-frame windows over the SAME day series — a
    # separate aggregate + join would scan (and day-aggregate) the raw
    # events twice; the whole-partition window reuses the one rollup,
    # so 100 TB of events is read exactly once (plan-pinned)
    wall = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    z = (F.col("v") - F.avg("v").over(wall)) / F.stddev_samp("v").over(wall)
    wd = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    p_pos = F.sum(z - F.lit(drift_k)).over(wd)
    p_neg = F.sum(-z - F.lit(drift_k)).over(wd)
    # P_0 = 0 participates in the running min: least(min(P_1..t), 0)
    s_pos = p_pos - F.least(F.min(p_pos).over(wd), F.lit(0.0))
    s_neg = p_neg - F.least(F.min(p_neg).over(wd), F.lit(0.0))
    return (
        daily.select(
            "d",
            F.round("v", 6).alias("daily_value"),
            # 4 decimals: mu/sigma come from a distributed aggregate whose
            # partial-sum order differs between engines; 4 keeps the hash
            # stable across those last-ulp differences (same policy as the
            # z-score anomaly entry)
            F.round(z, 4).alias("zscore"),
            F.round(s_pos, 4).alias("cusum_pos"),
            F.round(s_neg, 4).alias("cusum_neg"),
            (
                (s_pos > F.lit(threshold_h)) | (s_neg > F.lit(threshold_h))
            ).alias("is_changepoint"),
        )
    )
