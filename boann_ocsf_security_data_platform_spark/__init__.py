"""boann_ocsf_security_data_platform_spark — a PySpark-native security-data
analytics engine.

From-scratch re-conception of the capabilities of
RedHatProductSecurity/boann-ocsf-security-data-platform (reference studied at
/root/reference, snapshot 2025-11-28):

- SARIF -> OCSF conversion as a lazy DataFrame program
  (reference: scripts/converters/sarif_to_ocsf.py — record-at-a-time Python)
- enrichment plugins emitting Column expressions
  (reference: scripts/enrichments/*.py — per-dict Python plugins)
- append-only landing + incremental staging over Parquet
  (reference: dbt_project/models/{landing,staging}/*.sql over PostgreSQL)
- continuous file-monitor ingestion as Structured Streaming
  (reference: scripts/ocsf_monitor.py — sequential per-file loop)
- plus a full relational analytics surface and LLM-data-pipeline
  operators (dedup, similarity search, text analysis, multimodal),
  designed for 100 TB scale.

Everything is declarative DataFrame/SQL so Catalyst + Tungsten pick the
physical plan; Python UDFs appear only where semantics genuinely require
them (Arrow-vectorized, never row-at-a-time).
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
