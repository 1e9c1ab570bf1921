"""Data-quality predicates — the reference's dbt tests as engine assertions.

Each check returns a DataFrame of VIOLATING rows (the dbt convention: a test
passes when its query returns zero rows). `run_quality_checks` evaluates all
of them in one pass and `assert_quality` raises on any violation.

Reference tests (SURVEY.md §2.6):
- severity domain: dbt_project/tests/generic/severity_levels.sql:1-6
- status domain:   dbt_project/tests/generic/status.sql:1-6
- not-null contract columns: dbt_project/models/schema.yaml:83-178
- finding_uid regex CHECK (optional, pattern-driven):
  dbt_project/macros/add_finding_uid_constraint.sql:59-95
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import VALID_SEVERITIES, VALID_STATUSES

STAGING_NOT_NULL_COLUMNS = (
    "finding_uid",
    "finding_severity",
    "finding_status",
    "staging_loaded_at",
)
LANDING_NOT_NULL_COLUMNS = ("finding_uid", "raw_ocsf_json")


class QualityError(AssertionError):
    """Raised when a quality check finds violating rows."""


def severity_violations(df: DataFrame, column: str = "finding_severity") -> DataFrame:
    return df.filter(~F.col(column).isin(*VALID_SEVERITIES) | F.col(column).isNull())


def status_violations(df: DataFrame, column: str = "finding_status") -> DataFrame:
    return df.filter(~F.col(column).isin(*VALID_STATUSES) | F.col(column).isNull())


def not_null_violations(df: DataFrame, columns: tuple[str, ...]) -> DataFrame:
    present = [c for c in columns if c in df.columns]
    cond = None
    for c in present:
        clause = F.col(c).isNull()
        cond = clause if cond is None else (cond | clause)
    return df.filter(cond) if cond is not None else df.limit(0)


def uid_format_violations(
    df: DataFrame, pattern: str | None, column: str = "finding_uid"
) -> DataFrame:
    """Regex CHECK emulation; pattern=None disables it (the reference's
    default — finding_uid_format_pattern var defaults to null,
    dbt_project/dbt_project.yml:27-31)."""
    if not pattern:
        return df.limit(0)
    return df.filter(~F.col(column).rlike(pattern) | F.col(column).isNull())


def run_quality_checks(
    stg_df: DataFrame, uid_pattern: str | None = None
) -> dict[str, int]:
    """Count violations per check in ONE job: a single aggregate of
    conditional sums instead of N separate scans."""
    sev_bad = (~F.col("finding_severity").isin(*VALID_SEVERITIES)) | F.col(
        "finding_severity"
    ).isNull()
    st_bad = (~F.col("finding_status").isin(*VALID_STATUSES)) | F.col(
        "finding_status"
    ).isNull()
    aggs = [
        F.sum(sev_bad.cast("long")).alias("severity_domain"),
        F.sum(st_bad.cast("long")).alias("status_domain"),
    ]
    for c in STAGING_NOT_NULL_COLUMNS:
        if c in stg_df.columns:
            aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"not_null_{c}"))
    if uid_pattern:
        uid_bad = (~F.col("finding_uid").rlike(uid_pattern)) | F.col(
            "finding_uid"
        ).isNull()
        aggs.append(F.sum(uid_bad.cast("long")).alias("uid_format"))
    row = stg_df.agg(*aggs).collect()[0]
    return {k: int(row[k] or 0) for k in row.asDict()}


def assert_quality(stg_df: DataFrame, uid_pattern: str | None = None) -> dict[str, int]:
    counts = run_quality_checks(stg_df, uid_pattern)
    failing = {k: v for k, v in counts.items() if v > 0}
    if failing:
        raise QualityError(f"quality checks failed: {failing}")
    return counts


def reconciliation_violations(
    landing: DataFrame, staging: DataFrame
) -> DataFrame:
    """Landing rows the staging table SHOULD contain but doesn't — the
    cross-table completeness audit for the incremental pipeline.

    The staging contract (plans/staging.py): every landing row with
    ``loaded_at`` ≤ the staging high-water mark has exactly one staged row
    keyed by (finding_uid, staging_loaded_at = loaded_at). A non-empty
    result means the incremental filter skipped rows — e.g. a landing
    backfill wrote rows with loaded_at BELOW the current HWM, which the
    ``loaded_at > hwm`` filter will never pick up (the classic silent gap
    of HWM pipelines; the reference's dbt incremental model has the same
    hazard).

    Scale: one anti-join on (finding_uid, loaded_at) — staging side
    projected to its key columns only, so the shuffle carries keys, not
    the wide rows; the HWM is a one-row broadcast aggregate. Returns
    violating landing keys (dbt convention: empty = pass).
    """
    hwm = staging.agg(F.max("staging_loaded_at").alias("_hwm"))
    staged_keys = staging.select(
        "finding_uid", F.col("staging_loaded_at").alias("loaded_at")
    )
    # NULL HWM (staging staged NOTHING yet) must not vacuously pass: with
    # a non-empty landing every row is missing, so treat them all as due —
    # a dead staging load surfaces as violations instead of silence
    due = (
        landing.select("finding_uid", "loaded_at")
        .join(F.broadcast(hwm))
        .filter(F.col("_hwm").isNull() | (F.col("loaded_at") <= F.col("_hwm")))
        .drop("_hwm")
    )
    return due.join(staged_keys, ["finding_uid", "loaded_at"], "left_anti")
