"""Test-table catalog: the driver's synthetic TPC-H-ish parquet tables.

(`/root/repo/TESTDATA.md`: region nation customer supplier part orders
lineitem events documents embeddings, one parquet file each per scale
factor.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so `spark.sql` can query them."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
