"""Timestamp-flavor robustness: the driver regenerates testdata between
rounds and the parquet timestamp flavor drifts with it — plain
TIMESTAMP(MICROS) reads as TIMESTAMP_NTZ, tz-adjusted files and the
TIMESTAMP(NANOS) fallback read as TIMESTAMP(LTZ). Round 3 lost
events_sessionize to exactly this flip. These tests pin the contract:
``load_table`` normalizes every flavor to NTZ, and every
timestamp-arithmetic query in the registry produces IDENTICAL results on
an NTZ-flavored and an LTZ-flavored copy of the same data."""

import os
import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType

import __spark_entry__ as entrymod
from boann_ocsf_security_data_platform_spark.sources import load_table
from boann_ocsf_security_data_platform_spark.sources.catalog import TABLES

# every registry query that does timestamp arithmetic, windowing, or
# ordering over events.ts / orders.o_orderdate / lineitem.l_shipdate
TS_QUERIES = [
    "events_sessionize",
    "events_tumbling_window",
    "events_sliding_window",
    "events_gap_fill",
    "events_retention_cohorts",
    "events_cumulative_users",
    "events_zscore_anomalies",
    "events_funnel",
    "events_transition_counts",
    "asof_join_events_orders",
    "range_join_purchases_after_signup",
    "window_range_frame",
    "scalar_datetime",
    "q12_shipping_delay_classes",
    # round-4 third wave: TSDB rollups do timestamp arithmetic too
    "events_time_weighted_avg",
    "events_ohlc_bars",
    "events_locf_fill",
    "events_scd2",
    "events_top_paths",
    # round-4 waves 6-14: every new timestamp-arithmetic query
    "events_window_funnel",
    "events_attribution_last_touch",
    "events_seasonal_baseline",
    "events_session_window_native",
    "events_rolling_distinct_users",
    "events_longest_streak",
    "events_mad_anomalies",
    "range_join_overlapping_orders",
    "agg_incremental_rollup_merge",
    "orders_cohort_revenue",
    "feature_psi_drift",
    "graph_triangle_count",
]

TS_TABLES = {"events", "orders", "lineitem"}


@pytest.fixture(scope="module")
def flavor_dirs(spark, sf_smoke, tmp_path_factory):
    """Two copies of sf0.001: one with naive (NTZ-read) timestamps, one
    with tz-adjusted (LTZ-read) timestamps — same values either way."""
    root = tmp_path_factory.mktemp("tsflavor")
    ntz_dir, ltz_dir = str(root / "ntz"), str(root / "ltz")
    os.makedirs(ntz_dir), os.makedirs(ltz_dir)
    for t in TABLES:
        src = f"{sf_smoke}/{t}.parquet"
        if t not in TS_TABLES:
            shutil.copy(src, f"{ntz_dir}/{t}.parquet")
            shutil.copy(src, f"{ltz_dir}/{t}.parquet")
            continue
        df = load_table(spark, sf_smoke, t)  # NTZ-normalized
        ts_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, TimestampNTZType)
        ]
        assert ts_cols, t
        for flavor_dir, cast_to in ((ntz_dir, "timestamp_ntz"), (ltz_dir, "timestamp")):
            out = df
            for c in ts_cols:
                out = out.withColumn(c, F.col(c).cast(cast_to))
            # single file, same layout as the driver's testdata
            tmp_out = f"{flavor_dir}/_{t}"
            out.coalesce(1).write.mode("overwrite").parquet(tmp_out)
            part = next(
                p for p in os.listdir(tmp_out) if p.endswith(".parquet")
            )
            shutil.move(f"{tmp_out}/{part}", f"{flavor_dir}/{t}.parquet")
            shutil.rmtree(tmp_out)
    return ntz_dir, ltz_dir


@pytest.fixture(scope="module")
def nanos_dir(flavor_dirs, tmp_path_factory):
    """A third flavor: events.ts stored as parquet TIMESTAMP(NANOS) — the
    layout earlier driver testdata used, which load_table reads through the
    legacy nanosAsLong fallback."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ntz_dir, _ = flavor_dirs
    out = str(tmp_path_factory.mktemp("tsflavor_nanos"))
    for t in TABLES:
        shutil.copy(f"{ntz_dir}/{t}.parquet", f"{out}/{t}.parquet")
    tbl = pq.read_table(f"{ntz_dir}/events.parquet")
    idx = tbl.schema.get_field_index("ts")
    tbl = tbl.set_column(
        idx, "ts", tbl.column("ts").cast(pa.timestamp("ns"))
    )
    pq.write_table(
        tbl, f"{out}/events.parquet", version="2.6", store_schema=False
    )
    assert str(pq.read_schema(f"{out}/events.parquet").field("ts").type) == "timestamp[ns]"
    return out


def test_load_table_normalizes_both_flavors_to_ntz(spark, flavor_dirs):
    ntz_dir, ltz_dir = flavor_dirs
    for d in (ntz_dir, ltz_dir):
        for t in sorted(TS_TABLES):
            df = load_table(spark, d, t)
            for f in df.schema.fields:
                assert not isinstance(f.dataType, TimestampType), (
                    d, t, f.name, "LTZ leaked through load_table",
                )


def _canon(df):
    rows = [
        tuple(str(v) for v in row)
        for row in df.toPandas().itertuples(index=False, name=None)
    ]
    return sorted(rows)


@pytest.mark.parametrize("name", TS_QUERIES)
def test_ts_queries_identical_across_flavors(spark, flavor_dirs, name):
    qs = entrymod.queries()
    ntz_dir, ltz_dir = flavor_dirs
    a = qs[name](spark, ntz_dir)
    b = qs[name](spark, ltz_dir)
    assert [f.simpleString() for f in a.schema.fields] == [
        f.simpleString() for f in b.schema.fields
    ]
    assert _canon(a) == _canon(b)


@pytest.mark.parametrize(
    "name", [q for q in TS_QUERIES if q.startswith(("events_", "asof_"))]
)
def test_events_queries_identical_on_nanos_flavor(
    spark, flavor_dirs, nanos_dir, name
):
    qs = entrymod.queries()
    ntz_dir, _ = flavor_dirs
    a = qs[name](spark, ntz_dir)
    b = qs[name](spark, nanos_dir)
    assert _canon(a) == _canon(b)
