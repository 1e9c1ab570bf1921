"""OCSF batch-file source (S2/S3/S5 — reference:
scripts/ingest_raw_ocsf_findings.py:131-179 and scripts/ocsf_monitor.py:144-159,408-510).

A `*.ocsf.json` file is a JSON **array** of findings; the reference gates on
the extension, loads with json.load, and fails the whole file on malformed
JSON. Here each file is read as ONE whole-text row and the array is split
into per-finding raw JSON strings JVM-side, so `raw_ocsf_json` keeps every
field of the original document — including attributes outside the fixed OCSF
schema (custom enrichment payloads, unmapped fields) — matching the
reference's verbatim `raw_ocsf_json=event` JSONB insert
(ingest_raw_ocsf_findings.py:115-123). No schema round-trip ever touches the
stored text. URI backends (file://, gs://, s3a://...) are delegated to the
Hadoop FileSystem layer, so the reference's dual-backend resolution (S4/S5)
needs no custom code — a `gs://` path just works when the connector is on
the classpath.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def split_findings(whole_text: F.Column) -> F.Column:
    """Split one JSON-array document into per-finding raw JSON strings.

    ``from_json`` to ``array<string>`` copies each element's tokens verbatim
    (field order and unknown attributes preserved; inter-token whitespace
    normalized — the same fidelity level as the reference's Postgres JSONB,
    which also normalizes whitespace). Malformed JSON and non-array roots
    yield NULL, the per-file fail signal.
    """
    return F.from_json(whole_text, "array<string>")


def read_ocsf_batch(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """Read OCSF findings from `*.ocsf.json` array files.

    Returns the landing-shaped projection: `finding_uid` (from
    finding_info.uid, the reference's insert key,
    ingest_raw_ocsf_findings.py:115-118), the verbatim per-finding
    `raw_ocsf_json` text, plus `_source_file` lineage. Unparseable files
    yield one row with a NULL `raw_ocsf_json` so callers can gate per file
    (the reference fails the whole file on malformed JSON).
    """
    whole = (
        spark.read.option("wholetext", True)
        .text(path)
        .withColumn("_source_file", F.input_file_name())
        .withColumn("_findings", split_findings(F.col("value")))
    )
    return split_findings_rows(whole)


def split_findings_rows(whole: DataFrame) -> DataFrame:
    """Explode a (_source_file, _findings) frame into per-finding rows.

    ``_parse_ok`` is projected BEFORE the explode: a column computed beside
    a Generate lands in its requiredChildOutput, so deriving it after would
    make every exploded row carry the file's ENTIRE findings array
    (quadratic memory on large files — same Catalyst trap as the converter's
    run-struct explode, see plans/convert.py). Pre-projected, the Generate
    carries only (_source_file, _parse_ok).

    explode_outer keeps a NULL-raw row for unparseable files (parse failed)
    while empty arrays ([] — valid, zero findings) also keep one NULL row;
    distinguish via _parse_ok.
    """
    return (
        whole.select(
            "_source_file",
            F.col("_findings").isNotNull().alias("_parse_ok"),
            "_findings",
        )
        .select(
            "_source_file",
            "_parse_ok",
            F.explode_outer("_findings").alias("raw_ocsf_json"),
        )
        .select(
            F.get_json_object("raw_ocsf_json", "$.finding_info.uid").alias(
                "finding_uid"
            ),
            "raw_ocsf_json",
            "_source_file",
            "_parse_ok",
        )
    )
