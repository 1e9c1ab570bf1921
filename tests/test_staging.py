"""Staging-model semantics against hand-built landing rows + the golden
end-to-end flow from sample.sarif (the reference has no staging-level
golden test — we add one, per SURVEY §5.2)."""

import datetime
import json

import pytest
from pyspark.sql import functions as F

from boann_ocsf_security_data_platform_spark.plans import (
    FindingUIDGenerator,
    apply_enrichments,
    convert_sarif_to_ocsf,
    land,
    ocsf_to_json,
    read_landing,
    stage,
)
from boann_ocsf_security_data_platform_spark.plans.quality import run_quality_checks
from boann_ocsf_security_data_platform_spark.plans.staging import (
    high_water_mark,
    write_staging,
)
from boann_ocsf_security_data_platform_spark.schemas import LANDING_SCHEMA
from boann_ocsf_security_data_platform_spark.sources import read_sarif

T0 = datetime.datetime(2024, 1, 1, 12, 0, 0)


def _landing(spark, doc: dict):
    return spark.createDataFrame(
        [("uid-1", json.dumps(doc), T0)], schema=LANDING_SCHEMA
    )


def _stage_one(spark, doc: dict):
    return stage(_landing(spark, doc)).collect()[0]


def test_scalar_extraction(spark):
    row = _stage_one(
        spark,
        {
            "metadata": {"product": {"name": "ToolX", "version": "9"}},
            "finding_info": {
                "title": "t",
                "desc": "d",
                "src_url": "http://x",
                "created_time": 1710498600000,
            },
            "severity": "High",
            "status": "New",
            "activity_name": "Update",
            "remediation": {"desc": "fix it"},
        },
    )
    assert row.tool_name == "ToolX" and row.tool_version == "9"
    assert row.finding_title == "t" and row.finding_description == "d"
    assert row.finding_src_url == "http://x"
    assert row.finding_severity == "High" and row.finding_status == "New"
    assert row.finding_activity_name == "Update"
    assert row.finding_remediation == "fix it"
    assert row.detected_at == datetime.datetime(2024, 3, 15, 10, 30)
    assert row.staging_loaded_at == T0


def test_created_time_zero_is_null(spark):
    """TO_TIMESTAMP(NULLIF(ms/1000.0, 0)) — zero epoch → NULL (stg:49-51)."""
    row = _stage_one(spark, {"finding_info": {"created_time": 0}})
    assert row.detected_at is None
    row2 = _stage_one(spark, {"finding_info": {}})
    assert row2.detected_at is None


def test_first_matching_enrichment_limit_1(spark):
    doc = {
        "enrichments": [
            {"name": "other", "value": "x"},
            {"name": "scan_metadata", "data": {"scan_run_id": "first"}},
            {"name": "scan_metadata", "data": {"scan_run_id": "second"}},
            {"name": "rh_sdlc_source", "value": "sast-pipeline"},
        ]
    }
    row = _stage_one(spark, doc)
    assert row.scan_run_id == "first"  # array order preserved, LIMIT 1
    assert row.finding_source == "sast-pipeline"


def test_cwe_aggregation_distinct_sorted_with_related(spark):
    doc = {
        "vulnerabilities": [
            {"cwe": {"uid": "CWE-9"}},
            {"cwe": {"uid": "CWE-1"}, "cve": {"uid": "CVE-2024-1",
                "related_cwes": [{"uid": "CWE-5"}, {"uid": "CWE-1"}]}},
            {"cve": {"uid": "CVE-2024-2"}},
        ]
    }
    row = _stage_one(spark, doc)
    assert row.finding_cwes == ["CWE-1", "CWE-5", "CWE-9"]
    assert row.finding_cves == ["CVE-2024-1", "CVE-2024-2"]


def test_agg_null_when_empty_not_empty_array(spark):
    """jsonb_agg over zero rows yields NULL, not [] (stg:69-136)."""
    row = _stage_one(spark, {"vulnerabilities": []})
    assert row.finding_cwes is None
    assert row.finding_cves is None
    assert row.finding_references is None
    assert row.affected_packages_jsonb is None
    assert row.vulnerabilities_subset_jsonb is None
    # but resources defaults to [] via COALESCE (stg:67)
    assert row.resources_jsonb == []


def test_affected_packages_flattened(spark):
    doc = {
        "vulnerabilities": [
            {"affected_packages": [{"name": "p1"}, {"name": "p2"}]},
            {"cwe": {"uid": "CWE-0"}},
            {"affected_packages": [{"name": "p3"}]},
        ]
    }
    row = _stage_one(spark, doc)
    assert [p.name for p in row.affected_packages_jsonb] == ["p1", "p2", "p3"]
    # subset keeps only entries with code or packages, pairing preserved
    assert len(row.vulnerabilities_subset_jsonb) == 2


def test_references_distinct_sorted(spark):
    doc = {
        "vulnerabilities": [
            {"references": ["http://b", "http://a"]},
            {"references": ["http://a"]},
        ]
    }
    row = _stage_one(spark, doc)
    assert row.finding_references == ["http://a", "http://b"]


def test_golden_end_to_end(spark, tmp_path, fixtures_dir):
    """sample.sarif → convert → land → stage → assertions on staged rows."""
    landing_path = str(tmp_path / "landing")
    staging_path = str(tmp_path / "staging")

    ocsf = apply_enrichments(
        convert_sarif_to_ocsf(
            read_sarif(spark, f"{fixtures_dir}/sample.sarif"), now_ms=1710500000000
        ),
        [FindingUIDGenerator()],
    )
    land(ocsf_to_json(ocsf), landing_path)
    stg = stage(read_landing(spark, landing_path),
                hwm=high_water_mark(spark, staging_path))
    write_staging(stg, staging_path)
    out = spark.read.parquet(staging_path)

    assert out.count() == 6
    assert run_quality_checks(
        out, uid_pattern=r"^boann:[a-z0-9-]+:[a-z0-9-]+:(fingerprint|hash):[0-9a-f]{64}$"
    ) == {k: 0 for k in run_quality_checks(out)} | {"uid_format": 0}

    demo = out.filter(F.col("tool_name") == "DemoScanner")
    assert demo.count() == 5
    assert demo.select("scan_run_id").distinct().collect()[0][0] == "nightly/build-4711"

    xss = out.filter(F.col("finding_title").contains("DS-XSS-02")).collect()[0]
    assert xss.finding_cwes == ["CWE-79, CWE-80"]
    assert xss.finding_description == "el.innerHTML = userInput"  # snippet fallback

    # incremental: re-staging with fresh HWM sees nothing new
    assert stage(
        read_landing(spark, landing_path), hwm=high_water_mark(spark, staging_path)
    ).count() == 0

    # second landing batch flows through incrementally
    land(ocsf_to_json(ocsf), landing_path)
    delta = stage(
        read_landing(spark, landing_path), hwm=high_water_mark(spark, staging_path)
    )
    assert delta.count() == 6


def test_schema_evolution_append_new_columns(spark, tmp_path):
    """on_schema_change='append_new_columns' → mergeSchema read."""
    path = str(tmp_path / "landing_evo")
    land(_landing(spark, {"severity": "Low"}).select(
        "finding_uid", "raw_ocsf_json"), path)
    df2 = _landing(spark, {"severity": "Low"}).select(
        "finding_uid", "raw_ocsf_json"
    ).withColumn("new_col", F.lit("x"))
    land(df2, path)
    merged = read_landing(spark, path)
    assert "new_col" in merged.columns
    assert merged.count() == 2


def test_reconciliation_catches_backfill_below_hwm(spark):
    from boann_ocsf_security_data_platform_spark.plans.quality import (
        reconciliation_violations,
    )

    doc = {"finding_info": {"title": "t"}}
    landing = spark.createDataFrame(
        [
            ("uid-1", json.dumps(doc), T0),
            ("uid-2", json.dumps(doc), T0 + datetime.timedelta(hours=1)),
        ],
        schema=LANDING_SCHEMA,
    )
    staging = stage(landing)
    # fully staged: zero violations
    assert reconciliation_violations(landing, staging).count() == 0

    # a backfill lands BELOW the high-water mark: incremental stage() will
    # never pick it up — reconciliation must report exactly that key
    backfill = spark.createDataFrame(
        [("uid-0", json.dumps(doc), T0 - datetime.timedelta(hours=2))],
        schema=LANDING_SCHEMA,
    )
    landing2 = landing.unionByName(backfill)
    incr = stage(landing2, hwm=T0 + datetime.timedelta(hours=1))
    assert incr.count() == 0  # the HWM filter silently skips the backfill
    bad = reconciliation_violations(landing2, staging).collect()
    assert [(r.finding_uid, r.loaded_at) for r in bad] == [
        ("uid-0", T0 - datetime.timedelta(hours=2))
    ]


def test_reconciliation_null_hwm_is_not_a_silent_pass(spark):
    """Empty staging → NULL high-water mark. With non-empty landing, every
    landing row is missing — the audit must report them all, not vacuously
    pass because loaded_at <= NULL filters everything out."""
    from boann_ocsf_security_data_platform_spark.plans.quality import (
        reconciliation_violations,
    )

    doc = {"finding_info": {"title": "t"}}
    landing = spark.createDataFrame(
        [
            ("uid-1", json.dumps(doc), T0),
            ("uid-2", json.dumps(doc), T0 + datetime.timedelta(hours=1)),
        ],
        schema=LANDING_SCHEMA,
    )
    empty_staging = stage(landing.limit(0))
    bad = reconciliation_violations(landing, empty_staging)
    assert bad.count() == 2
