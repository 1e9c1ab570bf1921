"""Schema contracts: SARIF input, OCSF finding, landing & staging tables.

Two-layer philosophy preserved from the reference
(dbt_project/models/schema.yaml:21-50 — enforced contract outside,
full-fidelity JSONB inside):

- the **raw JSON string** column is the fidelity guarantee (``from_json``
  with a fixed struct silently drops unknown fields, so the raw string is
  the source of truth, the parsed struct a typed view);
- the **exterior contract** (landing/staging columns) is an explicit
  ``StructType`` enforced on write plus validation predicates
  (see plans/quality.py).

OCSF finding shape mirrors the reference converter's output
(scripts/converters/sarif_to_ocsf.py:185-211 and
docs/SARIF_to_OCSF.md) — class 2007 "Application Security Posture
Finding". Enrichment ``data`` payloads are heterogeneous small dicts in
the reference; they are modeled as ``MapType(string, string)`` which covers
every payload the reference produces (fingerprints, uid_generation,
scan_metadata).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

S = StringType()
I = IntegerType()
L = LongType()


def _struct(*fields: StructField) -> StructType:
    return StructType(list(fields))


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


# ---------------------------------------------------------------------------
# SARIF 2.1.0 input (the subset the reference converter consumes,
# scripts/converters/sarif_to_ocsf.py:84-470)
# ---------------------------------------------------------------------------

# rule.properties.cwe may be a scalar or a list in the wild
# (sarif_to_ocsf.py:399-402 handles both). Declaring StringType makes
# Spark's JSON parser keep non-string values as their JSON text
# (e.g. '["CWE-79","CWE-89"]'), which convert.py then splits and joins —
# same observable behavior, one schema.
_RULE = _struct(
    _f("id", S),
    _f("name", S),
    _f("shortDescription", _struct(_f("text", S))),
    _f("fullDescription", _struct(_f("text", S))),
    _f("properties", _struct(_f("cwe", S))),
)

_REGION = _struct(
    _f("startLine", I),
    _f("endLine", I),
    _f("startColumn", I),
    _f("endColumn", I),
    _f("snippet", _struct(_f("text", S))),
)

_PHYSICAL_LOCATION = _struct(
    _f("artifactLocation", _struct(_f("uri", S), _f("uriBaseId", S))),
    _f("region", _REGION),
)

_RESULT = _struct(
    _f("ruleId", S),
    _f("level", S),
    _f("message", _struct(_f("text", S))),
    _f("locations", ArrayType(_struct(_f("physicalLocation", _PHYSICAL_LOCATION)))),
    _f("properties", _struct(_f("cwe", S))),
    _f("fingerprints", MapType(S, S)),
    _f("partialFingerprints", MapType(S, S)),
)

_RUN = _struct(
    _f(
        "tool",
        _struct(
            _f(
                "driver",
                _struct(
                    _f("name", S),
                    _f("version", S),
                    _f("semanticVersion", S),
                    _f("informationUri", S),
                    _f("rules", ArrayType(_RULE)),
                ),
            )
        ),
    ),
    _f("invocations", ArrayType(_struct(_f("startTimeUtc", S), _f("endTimeUtc", S)))),
    _f("automationDetails", _struct(_f("id", S), _f("guid", S))),
    _f("results", ArrayType(_RESULT)),
)

SARIF_SCHEMA = _struct(
    _f("version", S),
    _f("$schema", S),
    _f("runs", ArrayType(_RUN)),
)


# ---------------------------------------------------------------------------
# OCSF finding (converter output / landing interior)
# ---------------------------------------------------------------------------

ENRICHMENT_TYPE = _struct(
    _f("name", S),
    _f("value", S),
    _f("type", S),
    _f("data", MapType(S, S)),
)

FILE_TYPE = _struct(_f("name", S), _f("path", S), _f("type_id", I))

AFFECTED_CODE_TYPE = _struct(
    _f("file", FILE_TYPE),
    _f("start_line", I),
    _f("end_line", I),
)

AFFECTED_PACKAGE_TYPE = _struct(
    _f("name", S),
    _f("version", S),
    _f("purl", S),
)

VULNERABILITY_TYPE = _struct(
    _f("cwe", _struct(_f("uid", S), _f("caption", S))),
    _f(
        "cve",
        _struct(
            _f("uid", S),
            _f("related_cwes", ArrayType(_struct(_f("uid", S), _f("caption", S)))),
        ),
    ),
    _f("affected_code", ArrayType(AFFECTED_CODE_TYPE)),
    _f("affected_packages", ArrayType(AFFECTED_PACKAGE_TYPE)),
    _f("references", ArrayType(S)),
)

RESOURCE_TYPE = _struct(_f("uid", S), _f("name", S), _f("type", S))

OCSF_FINDING_SCHEMA = _struct(
    _f("class_name", S),
    _f("class_uid", I),
    _f("category_uid", I),
    _f("category_name", S),
    _f("activity_id", I),
    _f("activity_name", S),
    _f("type_uid", I),
    _f("time", L),
    _f("severity_id", I),
    _f("severity", S),
    _f("status_id", I),
    _f("status", S),
    _f(
        "metadata",
        _struct(
            _f("product", _struct(_f("name", S), _f("version", S))),
            _f("version", S),
        ),
    ),
    _f(
        "finding_info",
        _struct(
            _f("uid", S),
            _f("title", S),
            _f("desc", S),
            _f("src_url", S),
            _f("created_time", L),
        ),
    ),
    _f("vulnerabilities", ArrayType(VULNERABILITY_TYPE)),
    _f("enrichments", ArrayType(ENRICHMENT_TYPE)),
    _f("remediation", _struct(_f("desc", S))),
    _f("resources", ArrayType(RESOURCE_TYPE)),
)


# ---------------------------------------------------------------------------
# Landing / staging exterior contracts
# (reference: dbt_project/models/landing/raw_ocsf_findings.sql:36-40,
#  dbt_project/models/staging/stg_ocsf_findings.sql:31-163,
#  schema.yaml:24-183)
# ---------------------------------------------------------------------------

LANDING_SCHEMA = _struct(
    _f("finding_uid", S, nullable=False),
    _f("raw_ocsf_json", S, nullable=False),  # full-fidelity JSON text (JSONB analog)
    _f("loaded_at", TimestampType(), nullable=False),
)

STAGING_SCHEMA = _struct(
    _f("finding_uid", S, nullable=False),
    _f("tool_name", S),
    _f("tool_version", S),
    _f("scan_run_id", S),
    _f("detected_at", TimestampType()),
    _f("staging_loaded_at", TimestampType(), nullable=False),
    _f("finding_title", S),
    _f("finding_description", S),
    _f("finding_src_url", S),
    _f("finding_severity", S),
    _f("finding_status", S),
    _f("finding_activity_name", S),
    _f("finding_remediation", S),
    _f("resources_jsonb", ArrayType(RESOURCE_TYPE)),
    _f("affected_packages_jsonb", ArrayType(AFFECTED_PACKAGE_TYPE)),
    _f(
        "vulnerabilities_subset_jsonb",
        ArrayType(
            _struct(
                _f("affected_code", ArrayType(AFFECTED_CODE_TYPE)),
                _f("affected_packages", ArrayType(AFFECTED_PACKAGE_TYPE)),
            )
        ),
    ),
    _f("finding_cwes", ArrayType(S)),
    _f("finding_cves", ArrayType(S)),
    _f("finding_references", ArrayType(S)),
    _f("finding_source", S),
    _f("enrichments_affected_components_jsonb", ENRICHMENT_TYPE),
    _f("enrichments_jira_status_jsonb", ENRICHMENT_TYPE),
)

# Domain vocabularies asserted by the reference's generic dbt tests
# (dbt_project/tests/generic/severity_levels.sql, status.sql)
VALID_SEVERITIES = (
    "Critical",
    "High",
    "Medium",
    "Low",
    "Informational",
    "Unknown",
    "Other",
)
VALID_STATUSES = (
    "Unknown",
    "New",
    "InProgress",
    "Suppressed",
    "Resolved",
    "Archived",
    "Other",
)
