"""Synthesize a larger scale factor from an existing testdata dir by
key-offset replication — for scale-curve benchmarking only.

Each copy i shifts every surrogate key by i × (its table's key range), so
referential integrity (orders→customer, lineitem→orders/part/supplier)
holds and join/agg cardinalities scale linearly, like a real TPC-H scale-up.
Value columns are left as-is: the copies share value distributions, which
is what the bench queries exercise (group-bys keep the same key counts per
group ratio; dedup/similarity operators see proportionally more near-dups,
matching their real scaling behavior).

region/nation stay fixed (bounded dims at any SF). Timestamps are not
shifted: the reference workload is also date-range-filtered, so keeping the
same time window grows rows-per-window linearly — the worst (hardest) case
for the windowed queries.

Usage: python tools/scale_up.py SRC_DIR DST_DIR N_COPIES
e.g.   python tools/scale_up.py /root/testdata/sf0.1 /tmp/sf1 10
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

# table -> columns that must shift per copy (key, step source table)
KEYED = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "customer"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
FIXED = ["region", "nation"]
# Largest source (rows) we'll broadcast in the no-shuffle orientation;
# ~5M TPC-H-ish rows stay well under Spark's 8 GB broadcast hard limit.
BROADCAST_SAFE_ROWS = 5_000_000
# key column whose max defines each table's offset step
STEP_KEY = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def scale_up(spark, src: str, dst: str, n_copies: int) -> None:
    steps = {
        t: spark.read.parquet(f"{src}/{t}.parquet").agg(F.max(k)).collect()[0][0]
        + 1
        for t, k in STEP_KEY.items()
    }
    for t in FIXED:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )
    for t, key_cols in KEYED.items():
        df = spark.read.parquet(f"{src}/{t}.parquet")
        n_src = df.count()
        # Row-aware file count, produced WITHOUT shuffling the output: the
        # copies range is the STREAM side (repartitioned to the target file
        # count) and the small source table broadcasts, so generation
        # parallelizes across copies and each task writes its own file.
        # The original orientation (df.crossJoin(copies)) broadcast the
        # range and preserved the source's single partition — every table
        # landed as ~one parquet file, and byte-range splitting then
        # capped scan parallelism by COMPRESSED size: replicated text
        # compresses ~100:1, so the 5M-row sf100 documents table (one
        # 48 MB file) scanned as ONE task and dedup_simhash serialized
        # the corpus through a single core (round-10 sf100 sweep find).
        # Real corpora arrive as many files; target ~1M rows per file so
        # split work is bounded by ROWS, not compressed bytes.
        n_parts = max(32, min(512, (n_src * n_copies) // 1_000_000 + 1))
        if n_src <= BROADCAST_SAFE_ROWS:
            # n_parts granularity is capped at one copy per file in this
            # orientation, so big-source/low-copy runs land more than the
            # ~1M-row target per file — acceptable only because that
            # combination takes the fallback branch below.
            n_parts = min(n_parts, n_copies)
            copies = (
                spark.range(n_copies)
                .select(F.col("id").alias("_copy"))
                .repartition(n_parts)
            )
            out = copies.crossJoin(F.broadcast(df))
        else:
            # ADVICE r10 #3: broadcasting the source is bounded by driver
            # heap and Spark's 8 GB broadcast hard limit (sf1 lineitem is
            # already ~GB-scale in memory). Above the safe bound, flip the
            # orientation — the n_copies-row range is the broadcast side —
            # and buy the rows-per-file target with one output shuffle
            # instead (a tool-time cost, paid once per synthesized tree).
            copies = spark.range(n_copies).select(F.col("id").alias("_copy"))
            out = df.crossJoin(F.broadcast(copies)).repartition(n_parts)
        for col, step_tbl in key_cols.items():
            out = out.withColumn(
                col, F.col(col) + F.col("_copy") * F.lit(steps[step_tbl])
            )
        out.select(df.columns).write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )
        print(f"  {t}: x{n_copies} -> {n_parts} files")


def main():
    src, dst, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
    from boann_ocsf_security_data_platform_spark import get_spark

    spark = get_spark(app_name="scale-up")
    spark.sparkContext.setLogLevel("ERROR")
    scale_up(spark, src, dst, n)
    print(f"wrote {dst} = {src} x {n}")


if __name__ == "__main__":
    main()
