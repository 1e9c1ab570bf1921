"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Methodology: one shared session (JVM startup excluded — the reference's
per-process cost model would count it, a long-lived engine shouldn't),
one warm-up pass of a cheap query, then each headline query executed to a
no-op sink (full materialization, no driver collect); best of 2 runs per
query to damp co-tenant machine-load noise.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "join_theta_inequality",
    "agg_rollup",
    "window_running_sum",
    "topk_per_group",
    "events_sessionize",
    "events_tumbling_window",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "knn_bruteforce_cosine",
    "text_quality_metrics",
    "multimodal_media_meta",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from boann_ocsf_security_data_platform_spark import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="boann-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # warm-up: JIT + filesystem caches on a trivial query
    qs["setop_union_all"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
