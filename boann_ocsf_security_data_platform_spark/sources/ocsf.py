"""OCSF batch-file source (S2/S3/S5 — reference:
scripts/ingest_raw_ocsf_findings.py:131-179 and scripts/ocsf_monitor.py:144-159,408-510).

A `*.ocsf.json` file is a JSON **array** of findings; the reference gates on
the extension, loads with json.load, and fails the whole file on malformed
JSON. Here the array is read multiLine as one row per finding; extension
gating happens via the glob; URI backends (file://, gs://, s3a://...) are
delegated to the Hadoop FileSystem layer, so the reference's dual-backend
resolution (S4/S5) needs no custom code — a `gs://` path just works when the
connector is on the classpath.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import OCSF_FINDING_SCHEMA


def read_ocsf_batch(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """Read OCSF findings from `*.ocsf.json` array files.

    Returns the landing-shaped projection: `finding_uid` (from
    finding_info.uid, the reference's insert key,
    ingest_raw_ocsf_findings.py:115-118), the full-fidelity
    `raw_ocsf_json` text, plus `_source_file` lineage.
    """
    parsed = (
        spark.read.schema(OCSF_FINDING_SCHEMA)
        .option("multiLine", True)
        .json(path)
        .withColumn("_source_file", F.input_file_name())
    )
    # Re-render the parsed struct to JSON text. For full fidelity of unknown
    # fields the monitor path (streaming.monitor) reads files as whole text;
    # this batch reader covers the known-OCSF contract.
    known = [c for c in parsed.columns if not c.startswith("_")]
    return parsed.select(
        F.col("finding_info.uid").alias("finding_uid"),
        F.to_json(F.struct(*known)).alias("raw_ocsf_json"),
        "_source_file",
    )
