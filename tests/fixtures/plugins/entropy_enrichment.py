"""Example discovered plugin: arbitrary-Python enrichment via the
Arrow-vectorized pandas_udf escape hatch (the reference's EnrichmentPlugin
ABC allows any Python; here that power costs one vectorized batch exchange
instead of per-row serialization)."""

import math

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from boann_ocsf_security_data_platform_spark.plans.enrich import (
    ColumnEnrichment,
    _append_enrichment,
)


def _make_entropy_udf():
    # created lazily: @pandas_udf needs an active SparkSession, and plugin
    # modules are imported at discovery time, possibly before one exists
    @pandas_udf("double")
    def _shannon_entropy(texts: pd.Series) -> pd.Series:
        def ent(s):
            if not s:
                return 0.0
            freq = {}
            for ch in s:
                freq[ch] = freq.get(ch, 0) + 1
            n = len(s)
            return round(-sum((c / n) * math.log2(c / n) for c in freq.values()), 6)

        return texts.map(ent)

    return _shannon_entropy


class DescEntropyEnrichment(ColumnEnrichment):
    """Attach the Shannon entropy of finding_info.desc as an enrichment —
    a classic secret-detection heuristic."""

    def __init__(self, threshold: str = "4.5"):
        self.threshold = float(threshold)

    def apply(self, df):
        entropy = _make_entropy_udf()(F.col("finding_info.desc"))
        return _append_enrichment(
            df,
            F.struct(
                F.lit("desc_entropy").alias("name"),
                F.when(entropy >= self.threshold, "high").otherwise("normal").alias("value"),
                F.lit("custom").alias("type"),
                F.create_map(
                    F.lit("entropy"), entropy.cast("string"),
                ).alias("data"),
            ),
        )
