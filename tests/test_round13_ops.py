"""Round-13 optimization pins.

1. join_theta_inequality's measured-size gate (r12 VERDICT #2): the
   literal broadcast theta-join below PIN_DIM_MIN_ROWS customers, the
   order-statistics domain form above — forced-gate identity + plan pins
   for both arms.
2. Writer file sizing (r12 VERDICT #7, guide §6): the landing/staging
   writers split oversized write tasks at max_records_per_file(); the
   split never merges, so small batches keep one file per task.
3. The pareto/gini rollup persists (r12 VERDICT #6): the shared customer
   rollup materializes once instead of once per consumer branch.
"""

import glob
import sys

import pyspark.sql.functions as F

import __spark_entry__ as em

QS = em.queries()
SF = "/root/testdata/sf0.01"


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_theta_gate_arms_identical(spark, monkeypatch):
    """Forced-gate identity: the literal equi+inequality broadcast join
    (below-gate arm, the oracle's own SQL shape) and the order-statistics
    domain decomposition (above-gate arm) must produce row-identical
    per-nation pair counts. ADVICE r12 #3 discipline: BOTH arms are
    forced explicitly — the baseline never silently rides the real
    gate."""
    em._COUNT_CACHE.clear()
    monkeypatch.setattr(em._gates, "PIN_DIM_MIN_ROWS", sys.maxsize)
    literal = sorted(
        tuple(r) for r in QS["join_theta_inequality"](spark, SF).collect()
    )
    monkeypatch.setattr(em._gates, "PIN_DIM_MIN_ROWS", 0)
    domain = sorted(
        tuple(r) for r in QS["join_theta_inequality"](spark, SF).collect()
    )
    assert literal == domain and len(literal) > 0


def test_theta_plan_shapes_per_arm(spark, monkeypatch):
    """Plan pins for the dispatch: below the gate the entry is ONE
    broadcast hash join with the inequality as its condition (no Window,
    no full-outer merge — the 0.4 s bench shape); above it the domain
    form runs its running-count Window and never materializes pairs (no
    inequality join condition anywhere)."""
    em._COUNT_CACHE.clear()
    monkeypatch.setattr(em._gates, "PIN_DIM_MIN_ROWS", sys.maxsize)
    below = _executed_plan(QS["join_theta_inequality"](spark, SF))
    assert "BroadcastHashJoin" in below and "Window" not in below, below[
        :2000
    ]
    monkeypatch.setattr(em._gates, "PIN_DIM_MIN_ROWS", 0)
    above = _executed_plan(QS["join_theta_inequality"](spark, SF))
    assert "Window" in above, above[:2000]
    assert "c_acctbal > s_acctbal" not in above, above[:2000]


def _landing_frame(spark, n_rows: int):
    return (
        spark.range(n_rows)
        .select(
            F.col("id").cast("string").alias("finding_uid"),
            F.lit('{"severity": "Low"}').alias("raw_ocsf_json"),
        )
        .coalesce(1)  # one write task: the file count IS the split count
    )


def test_landing_write_splits_at_max_records_per_file(
    spark, tmp_path, monkeypatch
):
    """guide §6 file sizing at two scales: a write task over the
    configured row cap splits into ceil(n/cap) files; under it, one file
    per task exactly as before (the option never merges), so parity
    fixtures and small batches are untouched."""
    from boann_ocsf_security_data_platform_spark.plans.landing import land

    monkeypatch.setenv("SPARK_GRAFT_MAX_RECORDS_PER_FILE", "100")
    land(_landing_frame(spark, 250), str(tmp_path / "t_split"))
    split_files = glob.glob(f"{tmp_path}/t_split/**/*.parquet", recursive=True)
    assert len(split_files) == 3  # 100 + 100 + 50

    monkeypatch.delenv("SPARK_GRAFT_MAX_RECORDS_PER_FILE")
    land(_landing_frame(spark, 250), str(tmp_path / "t_one"))
    one_files = glob.glob(f"{tmp_path}/t_one/**/*.parquet", recursive=True)
    assert len(one_files) == 1  # 250 < 250_000 default: unchanged layout


def test_staging_write_splits_at_max_records_per_file(
    spark, tmp_path, monkeypatch
):
    from boann_ocsf_security_data_platform_spark.plans.staging import (
        write_staging,
    )

    df = (
        spark.range(120)
        .select(
            F.col("id").cast("string").alias("finding_uid"),
            F.lit("2031-03-01 00:00:00")
            .cast("timestamp")
            .alias("staging_loaded_at"),
        )
        .coalesce(1)
    )
    monkeypatch.setenv("SPARK_GRAFT_MAX_RECORDS_PER_FILE", "50")
    write_staging(df, str(tmp_path / "stg"), mode="overwrite")
    files = glob.glob(f"{tmp_path}/stg/**/*.parquet", recursive=True)
    assert len(files) == 3  # 50 + 50 + 20


def test_pareto_and_gini_persist_shared_rollup(spark):
    """The customer-revenue rollup feeds every downstream branch through
    ONE materialization (r12 VERDICT #6: unpersisted, the sketch action,
    the scalar total, the prefix table and the final aggregate each
    re-ran the orders scan + rollup)."""
    for name in ("agg_pareto_abc", "agg_gini_coefficient"):
        plan = _executed_plan(QS[name](spark, SF))
        assert "InMemoryTableScan" in plan, (name, plan[:2000])
