"""UID generator bit-exactness — golden values recomputed inline with
hashlib, mirroring the reference's own test style
(/root/reference/scripts/tests/test_finding_uid_generator.py)."""

import hashlib
import json

import pytest
from pyspark.sql import functions as F

from boann_ocsf_security_data_platform_spark.plans.convert import convert_sarif_to_ocsf
from boann_ocsf_security_data_platform_spark.plans.enrich import (
    FindingUIDGenerator,
    ScanMetadataEnrichment,
    apply_enrichments,
)
from boann_ocsf_security_data_platform_spark.sources import read_sarif


def sha(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def _finding_df(spark, tmp_path, result, tool="TestTool"):
    p = tmp_path / "in.sarif"
    p.write_text(
        json.dumps(
            {
                "version": "2.1.0",
                "runs": [{"tool": {"driver": {"name": tool}}, "results": [result]}],
            }
        )
    )
    return convert_sarif_to_ocsf(read_sarif(spark, str(p)), now_ms=1)


def _uid(spark, tmp_path, result, tool="TestTool", **gen_kwargs):
    df = apply_enrichments(
        _finding_df(spark, tmp_path, result, tool), [FindingUIDGenerator(**gen_kwargs)]
    )
    return df.collect()[0]


def test_fingerprint_path_latest_key(spark, tmp_path):
    """sorted(keys)[-1] — csdiff/v2 wins over v0/v1 (reference :101-120)."""
    row = _uid(
        spark,
        tmp_path,
        {
            "ruleId": "R",
            "message": {"text": "m"},
            "fingerprints": {"csdiff/v1": "b", "csdiff/v0": "a", "csdiff/v2": "c"},
        },
    )
    assert row.finding_info.uid == f"boann:sast:testtool:fingerprint:{sha('c')}"


def test_hash_path_components(spark, tmp_path):
    """sha256("\\n".join([title, file, desc])) (reference :68-98)."""
    loc = {
        "physicalLocation": {
            "artifactLocation": {"uri": "src/main.py"},
            "region": {"startLine": 1},
        }
    }
    row = _uid(
        spark,
        tmp_path,
        {"ruleId": "SQL-01", "message": {"text": "Injection risk"}, "locations": [loc]},
    )
    expected = sha("\n".join(["SQL-01", "src/main.py", "Injection risk"]))
    assert row.finding_info.uid == f"boann:sast:testtool:hash:{expected}"


def test_hash_path_missing_file_is_empty_string(spark, tmp_path):
    row = _uid(spark, tmp_path, {"ruleId": "R", "message": {"text": "d"}})
    assert row.finding_info.uid == f"boann:sast:testtool:hash:{sha('R' + chr(10) + '' + chr(10) + 'd')}"


@pytest.mark.parametrize(
    "raw,norm",
    [
        ("Snyk Code", "snyk-code"),
        ("GitHub  CodeQL!", "github-codeql"),
        ("--Weird__Name--", "weird-name"),
        ("UPPER", "upper"),
        ("a.b/c", "a-b-c"),
    ],
)
def test_tool_name_normalization(spark, tmp_path, raw, norm):
    row = _uid(
        spark, tmp_path, {"ruleId": "R", "message": {"text": "m"}}, tool=raw
    )
    assert row.finding_info.uid.startswith(f"boann:sast:{norm}:hash:")


def test_custom_sdlc_and_suffix(spark, tmp_path):
    """Custom uid_generator path: boann:<sdlc>:<suffix> (reference :59-97)."""
    row = _uid(
        spark,
        tmp_path,
        {"ruleId": "R", "message": {"text": "m"}},
        sdlc_type="PenTest",
        uid_suffix=lambda df: F.lit("jira:key:RHEL-12345"),
    )
    assert row.finding_info.uid == "boann:pentest:jira:key:RHEL-12345"
    # custom path appends no uid_generation metadata
    assert not [e for e in (row.enrichments or []) if e.name == "uid_generation"]


def test_uid_generation_metadata(spark, tmp_path):
    row = _uid(
        spark,
        tmp_path,
        {"ruleId": "R", "message": {"text": "m"}, "fingerprints": {"k": "v"}},
    )
    md = [e for e in row.enrichments if e.name == "uid_generation"][0]
    assert md.data["method"] == "fingerprint"
    assert md.data["version"] == "v1"
    assert md.data["algorithm"] == "sha256"
    assert md.value == "UID generated using fingerprint method"

    row2 = _uid(spark, tmp_path, {"ruleId": "R", "message": {"text": "m"}})
    md2 = [e for e in row2.enrichments if e.name == "uid_generation"][0]
    assert md2.data["method"] == "hash"


def test_empty_fingerprint_data_falls_back_to_hash(spark, tmp_path):
    """An empty fingerprints map is skipped (reference :203-211 continue)."""
    row = _uid(
        spark, tmp_path, {"ruleId": "R", "message": {"text": "m"}, "fingerprints": {}}
    )
    assert ":hash:" in row.finding_info.uid


def test_scan_metadata_enrichment_appends(spark, tmp_path):
    df = apply_enrichments(
        _finding_df(spark, tmp_path, {"ruleId": "R", "message": {"text": "m"}}),
        [ScanMetadataEnrichment("scan-42"), FindingUIDGenerator()],
    )
    row = df.collect()[0]
    names = [e.name for e in row.enrichments]
    assert names == ["scan_metadata", "uid_generation"]
    assert [e for e in row.enrichments if e.name == "scan_metadata"][0].data[
        "scan_run_id"
    ] == "scan-42"


def test_broken_plugin_is_isolated(spark, tmp_path):
    class Broken:
        def get_name(self):
            return "Broken"

        def validate(self, df):
            return True

        def apply(self, df):
            raise RuntimeError("boom")

    df = apply_enrichments(
        _finding_df(spark, tmp_path, {"ruleId": "R", "message": {"text": "m"}}),
        [Broken(), FindingUIDGenerator()],
    )
    # broken plugin skipped, UID generator still ran
    assert df.collect()[0].finding_info.uid.startswith("boann:sast:")
