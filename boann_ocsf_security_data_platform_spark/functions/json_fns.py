"""JSON document helpers: the JSONB-analog surface.

The reference stores findings as PostgreSQL JSONB (full fidelity, schemaless
interior — dbt_project/models/schema.yaml:36-43). This engine keeps the raw
JSON string as the fidelity source of truth plus two typed views:

- ``from_json`` with the known ``OCSF_FINDING_SCHEMA`` (plans/staging.py) —
  columnar, prunable, fastest when the fields are known;
- Spark 4 **VariantType** (``parse_json``) — the closest JSONB analog:
  binary-encoded semi-structured values with path access that preserves
  unknown fields, for ad-hoc exploration where the schema is open.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_variant(df: DataFrame, json_col: str = "raw_ocsf_json", out: str = "doc") -> DataFrame:
    """Attach a VariantType view of the raw JSON column. Permissive:
    malformed documents become NULL variants (``try_parse_json``) rather
    than failing the job — the raw string column remains the record of
    what was actually received."""
    return df.withColumn(out, F.try_parse_json(F.col(json_col)))


def variant_get(doc: Column | str, path: str, dtype: str = "string") -> Column:
    """Null-safe JSON-path extraction from a variant (``->>`` analog)."""
    c = F.col(doc) if isinstance(doc, str) else doc
    return F.try_variant_get(c, path, dtype)


def json_get(json_col: Column | str, path: str) -> Column:
    """String-level JSON path (``get_json_object``) — works without parsing
    the whole document; right choice for one-off extractions."""
    c = F.col(json_col) if isinstance(json_col, str) else json_col
    return F.get_json_object(c, path)
