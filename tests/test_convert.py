"""Converter semantics — ports the reference's unit-test matrix
(/root/reference/scripts/tests/test_sarif_converter.py) to the DataFrame
program: severity map, tool metadata, created_time, scan_run_id precedence,
title/desc fallbacks, vulnerability extraction, fingerprint selection."""

import json

import pytest
from pyspark.sql import functions as F

from boann_ocsf_security_data_platform_spark.plans.convert import convert_sarif_to_ocsf
from boann_ocsf_security_data_platform_spark.sources import read_sarif

NOW_MS = 1710000000000


def _sarif_df(spark, tmp_path, runs):
    p = tmp_path / "in.sarif"
    p.write_text(json.dumps({"version": "2.1.0", "runs": runs}))
    return read_sarif(spark, str(p))


def _one(spark, tmp_path, result, driver=None, run_extra=None):
    run = {
        "tool": {"driver": {"name": "T"} if driver is None else driver},
        "results": [result],
    }
    run.update(run_extra or {})
    df = convert_sarif_to_ocsf(_sarif_df(spark, tmp_path, [run]), now_ms=NOW_MS)
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


@pytest.mark.parametrize(
    "level,sev_id,sev",
    [
        ("error", 5, "High"),
        ("warning", 4, "Medium"),
        ("note", 2, "Informational"),
        ("none", 1, "Unknown"),
        (None, 1, "Unknown"),  # missing level
    ],
)
def test_severity_mapping(spark, tmp_path, level, sev_id, sev):
    result = {"ruleId": "R1", "message": {"text": "m"}}
    if level:
        result["level"] = level
    row = _one(spark, tmp_path, result)
    assert row.severity_id == sev_id and row.severity == sev


def test_constants_envelope(spark, tmp_path):
    row = _one(spark, tmp_path, {"ruleId": "R1", "message": {"text": "m"}})
    assert row.class_uid == 2007
    assert row.category_uid == 2
    assert row.activity_id == 2
    assert row.type_uid == 200702
    assert row.status == "New" and row.status_id == 1
    assert row.time == NOW_MS
    assert row.metadata.version == "1.5.0"


def test_tool_metadata_semantic_version_priority(spark, tmp_path):
    row = _one(
        spark,
        tmp_path,
        {"ruleId": "R"},
        driver={"name": "X", "version": "1.0", "semanticVersion": "1.0.2"},
    )
    assert row.metadata.product.name == "X"
    assert row.metadata.product.version == "1.0.2"


def test_tool_metadata_defaults(spark, tmp_path):
    row = _one(spark, tmp_path, {"ruleId": "R"}, driver={})
    assert row.metadata.product.name == "UNKNOWN"
    assert row.metadata.product.version is None


def test_created_time_first_parseable_invocation(spark, tmp_path):
    row = _one(
        spark,
        tmp_path,
        {"ruleId": "R"},
        run_extra={
            "invocations": [
                {"startTimeUtc": "garbage"},
                {"startTimeUtc": "2024-03-15T10:30:00Z"},
                {"startTimeUtc": "2020-01-01T00:00:00Z"},
            ]
        },
    )
    assert row.finding_info.created_time == 1710498600000


def test_created_time_fallback_now(spark, tmp_path):
    row = _one(spark, tmp_path, {"ruleId": "R"})
    assert row.finding_info.created_time == NOW_MS


@pytest.mark.parametrize(
    "extra,expected",
    [
        ({"automationDetails": {"id": "ID1", "guid": "G1"}}, "ID1"),
        ({"automationDetails": {"guid": "G1"}}, "G1"),
        (
            {"invocations": [{"startTimeUtc": "2024-01-01T00:00:00Z"}]},
            "T_run_2024-01-01T00:00:00Z",
        ),
        ({}, None),
    ],
)
def test_scan_run_id_precedence(spark, tmp_path, extra, expected):
    run = {"tool": {"driver": {"name": "T"}}, "results": [{"ruleId": "R"}]}
    run.update(extra)
    df = convert_sarif_to_ocsf(_sarif_df(spark, tmp_path, [run]), now_ms=NOW_MS)
    row = df.collect()[0]
    scan_meta = [e for e in (row.enrichments or []) if e.name == "scan_metadata"]
    if expected is None:
        assert scan_meta == []
    else:
        assert scan_meta[0].data["scan_run_id"] == expected


def test_title_with_rule_short_description(spark, tmp_path):
    run = {
        "tool": {
            "driver": {
                "name": "T",
                "rules": [{"id": "R1", "shortDescription": {"text": "Bad thing"}}],
            }
        },
        "results": [{"ruleId": "R1", "message": {"text": "m"}}],
    }
    df = convert_sarif_to_ocsf(_sarif_df(spark, tmp_path, [run]), now_ms=NOW_MS)
    assert df.collect()[0].finding_info.title == "R1: Bad thing"


def test_title_without_rule(spark, tmp_path):
    row = _one(spark, tmp_path, {"ruleId": "R9", "message": {"text": "m"}})
    assert row.finding_info.title == "R9"
    row = _one(spark, tmp_path, {"message": {"text": "m"}})
    assert row.finding_info.title == "UNKNOWN"


def test_desc_snippet_fallback(spark, tmp_path):
    loc = {
        "physicalLocation": {
            "artifactLocation": {"uri": "f.py"},
            "region": {"startLine": 1, "snippet": {"text": "code here"}},
        }
    }
    row = _one(spark, tmp_path, {"ruleId": "R", "message": {"text": ""}, "locations": [loc]})
    assert row.finding_info.desc == "code here"
    row = _one(spark, tmp_path, {"ruleId": "R"})
    assert row.finding_info.desc == ""


def test_vulnerability_cwe_from_result_properties(spark, tmp_path):
    loc = {
        "physicalLocation": {
            "artifactLocation": {"uri": "a/b.py"},
            "region": {"startLine": 3, "endLine": 5},
        }
    }
    row = _one(
        spark,
        tmp_path,
        {"ruleId": "R", "properties": {"cwe": "CWE-1"}, "locations": [loc]},
    )
    v = row.vulnerabilities[0]
    assert v.cwe.uid == "CWE-1"
    assert v.affected_code[0].file.name == "b.py"
    assert v.affected_code[0].file.path == "a/b.py"
    assert v.affected_code[0].file.type_id == 1
    assert v.affected_code[0].start_line == 3
    assert v.affected_code[0].end_line == 5


def test_vulnerability_cwe_list_joined(spark, tmp_path):
    run = {
        "tool": {
            "driver": {
                "name": "T",
                "rules": [{"id": "R1", "properties": {"cwe": ["CWE-79", "CWE-80"]}}],
            }
        },
        "results": [{"ruleId": "R1"}],
    }
    df = convert_sarif_to_ocsf(_sarif_df(spark, tmp_path, [run]), now_ms=NOW_MS)
    assert df.collect()[0].vulnerabilities[0].cwe.uid == "CWE-79, CWE-80"


def test_vulnerability_unknown_cwe_when_location_only(spark, tmp_path):
    loc = {"physicalLocation": {"artifactLocation": {"uri": "x.c"}, "region": {}}}
    row = _one(spark, tmp_path, {"ruleId": "R", "locations": [loc]})
    assert row.vulnerabilities[0].cwe.uid == "UNKNOWN"


def test_vulnerability_none_when_no_cwe_no_location(spark, tmp_path):
    row = _one(spark, tmp_path, {"ruleId": "R", "message": {"text": "m"}})
    assert row.vulnerabilities is None


def test_zero_start_line_is_falsy(spark, tmp_path):
    # Python truthiness: startLine=0 does not count as a location component
    loc = {"physicalLocation": {"region": {"startLine": 0}}}
    row = _one(spark, tmp_path, {"ruleId": "R", "locations": [loc]})
    assert row.vulnerabilities is None


def test_fingerprints_preferred_over_partial(spark, tmp_path):
    row = _one(
        spark,
        tmp_path,
        {
            "ruleId": "R",
            "fingerprints": {"a": "1"},
            "partialFingerprints": {"b": "2"},
        },
    )
    fp = [e for e in row.enrichments if e.name == "fingerprints"][0]
    assert fp.data == {"a": "1"}
    assert fp.value == "SARIF fingerprints"
    assert fp.type == "fingerprints"


def test_empty_fingerprints_fall_through_to_partial(spark, tmp_path):
    row = _one(
        spark,
        tmp_path,
        {"ruleId": "R", "fingerprints": {}, "partialFingerprints": {"b": "2"}},
    )
    fp = [e for e in row.enrichments if e.name == "fingerprints"][0]
    assert fp.data == {"b": "2"}


def test_multi_run_isolation(spark, fixtures_dir):
    """Runs keep their own tool metadata / scan ids (sample.sarif has 2)."""
    df = convert_sarif_to_ocsf(
        read_sarif(spark, f"{fixtures_dir}/sample.sarif"), now_ms=NOW_MS
    )
    by_run = {
        r["_run_index"]: r
        for r in df.select("_run_index", "metadata").distinct().collect()
    }
    assert by_run[0].metadata.product.name == "DemoScanner"
    assert by_run[0].metadata.product.version == "3.2.1"  # semanticVersion wins
    assert by_run[1].metadata.product.name == "Terse Tool"
    assert by_run[1].metadata.product.version == "0.9"


def test_malformed_file_yields_no_findings(spark, tmp_path):
    p = tmp_path / "bad.sarif"
    p.write_text("{not json")
    assert convert_sarif_to_ocsf(read_sarif(spark, str(p)), now_ms=NOW_MS).count() == 0


def test_vulnerability_empty_cwe_list_falls_back(spark, tmp_path):
    """A result-level cwe of [] is Python-falsy in the reference
    (`if cwe:` skips it) — it must fall back to the RULE's cwe, and to
    UNKNOWN when the rule has none but a location exists."""
    loc = {"physicalLocation": {"artifactLocation": {"uri": "x.c"}, "region": {}}}
    run = {
        "tool": {
            "driver": {
                "name": "T",
                "rules": [{"id": "R1", "properties": {"cwe": "CWE-22"}}],
            }
        },
        "results": [
            {"ruleId": "R1", "properties": {"cwe": []}},
            {"ruleId": "R-none", "properties": {"cwe": []}, "locations": [loc]},
        ],
    }
    rows = convert_sarif_to_ocsf(_sarif_df(spark, tmp_path, [run]), now_ms=NOW_MS).collect()
    uids = [r.vulnerabilities[0].cwe.uid if r.vulnerabilities else None for r in rows]
    assert "CWE-22" in uids      # [] ignored, rule cwe used
    assert "UNKNOWN" in uids     # [] ignored, no rule cwe, location present
