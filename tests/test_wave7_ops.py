"""Invariant tests for the wave-7 operators: partial-aggregate merging
(incremental view maintenance), the Count-Min frequency sketch, and the
streaming continuously-maintained rollup built from the same merge."""

import json

from pyspark.sql import functions as F

from boann_ocsf_security_data_platform_spark.operators.relational import (
    cms_estimate,
    count_min_sketch_agg,
    merge_partial_aggs,
)


def _rollup(df):
    return df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
    )


def _as_map(df):
    return {r.k: (r.n, r.s, r.mn, r.mx) for r in df.collect()}


def test_merge_equals_from_scratch(spark):
    full = spark.range(0, 1000).select(
        (F.col("id") % 13).alias("k"), (F.col("id") * 7 % 101).alias("v")
    )
    a = full.where(F.col("id") % 3 == 0)
    b = full.where(F.col("id") % 3 != 0)
    merged = merge_partial_aggs(
        _rollup(a), _rollup(b), ["k"],
        sum_cols=("n", "s"), min_cols=("mn",), max_cols=("mx",),
    )
    assert _as_map(merged) == _as_map(_rollup(full))


def test_merge_disjoint_keys_pass_through(spark):
    a = spark.createDataFrame([(1, 2, 10, 5, 20)], "k int, n long, s long, mn long, mx long")
    b = spark.createDataFrame([(9, 3, 30, 1, 15)], "k int, n long, s long, mn long, mx long")
    merged = merge_partial_aggs(
        a, b, ["k"], sum_cols=("n", "s"), min_cols=("mn",), max_cols=("mx",)
    )
    assert _as_map(merged) == {1: (2, 10, 5, 20), 9: (3, 30, 1, 15)}


def test_merge_empty_delta_is_identity(spark):
    full = spark.range(0, 100).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("v")
    )
    empty = _rollup(full.where(F.lit(False)))
    merged = merge_partial_aggs(
        _rollup(full), empty, ["k"],
        sum_cols=("n", "s"), min_cols=("mn",), max_cols=("mx",),
    )
    assert _as_map(merged) == _as_map(_rollup(full))


def test_merge_associative_three_way(spark):
    full = spark.range(0, 600).select(
        (F.col("id") % 7).alias("k"), (F.col("id") % 19).alias("v")
    )
    parts = [full.where(F.col("id") % 3 == i) for i in range(3)]
    kw = dict(sum_cols=("n", "s"), min_cols=("mn",), max_cols=("mx",))
    left = merge_partial_aggs(
        merge_partial_aggs(_rollup(parts[0]), _rollup(parts[1]), ["k"], **kw),
        _rollup(parts[2]), ["k"], **kw,
    )
    right = merge_partial_aggs(
        _rollup(parts[0]),
        merge_partial_aggs(_rollup(parts[1]), _rollup(parts[2]), ["k"], **kw),
        ["k"], **kw,
    )
    assert _as_map(left) == _as_map(right) == _as_map(_rollup(full))


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------

def test_cms_estimates_bounded(spark):
    """CMS guarantees true <= est <= true + eps*N (w.h.p.); with a tiny
    vocabulary and eps=0.001 over 5000 items the slack is ~5 — estimates
    are near-exact and NEVER undercount."""
    df = spark.range(0, 5000).select(
        F.concat(F.lit("w"), (F.col("id") % 37).cast("string")).alias("t")
    )
    exact = {r.t: r.c for r in df.groupBy("t").agg(F.count(F.lit(1)).alias("c")).collect()}
    sketch = count_min_sketch_agg(df, "t", eps=0.001).collect()[0].cms
    est = cms_estimate(spark, sketch, list(exact))
    n = sum(exact.values())
    for t, true in exact.items():
        assert est[t] >= true
        assert est[t] <= true + 0.001 * n + 1


def test_cms_deterministic_for_seed(spark):
    df = spark.range(0, 1000).select((F.col("id") % 11).cast("string").alias("t"))
    s1 = count_min_sketch_agg(df, "t", seed=7).collect()[0].cms
    s2 = count_min_sketch_agg(df, "t", seed=7).collect()[0].cms
    assert bytes(s1) == bytes(s2)


def test_cms_mergeable(spark):
    """Sketching two halves and merging JVM-side equals sketching the
    whole stream (same seed ⇒ same hash planes ⇒ counters add)."""
    df = spark.range(0, 2000).select((F.col("id") % 23).cast("string").alias("t"))
    a = df.where(F.col("t").cast("int") % 2 == 0)
    b = df.where(F.col("t").cast("int") % 2 == 1)
    sa = count_min_sketch_agg(a, "t").collect()[0].cms
    sb = count_min_sketch_agg(b, "t").collect()[0].cms
    jvm = spark.sparkContext._jvm
    m = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bytes(sa))
    m.mergeInPlace(
        jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bytes(sb))
    )
    whole = count_min_sketch_agg(df, "t").collect()[0].cms
    w = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bytes(whole))
    for i in range(23):
        assert m.estimateCount(str(i)) == w.estimateCount(str(i))


# ---------------------------------------------------------------------------
# streaming continuously-maintained rollup via foreachBatch + merge
# ---------------------------------------------------------------------------

def test_streaming_rollup_maintenance(spark, tmp_path):
    """merge_partial_aggs as the foreachBatch body: each micro-batch's
    rollup merges into a persisted running rollup; after the stream
    drains, the maintained table equals the from-scratch rollup of all
    data ever seen — the streaming materialized-view pattern."""
    src = tmp_path / "in"
    state_dir = str(tmp_path / "state")
    src.mkdir()
    rows1 = [{"k": i % 3, "v": i} for i in range(30)]
    rows2 = [{"k": i % 3, "v": 100 + i} for i in range(20)]
    (src / "a.json").write_text("\n".join(json.dumps(r) for r in rows1))

    stream = spark.readStream.schema("k long, v long").json(str(src))
    state = {"df": None}

    def upsert(batch_df, _bid):
        part = batch_df.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        try:
            prev = batch_df.sparkSession.read.parquet(state_dir)
            part = merge_partial_aggs(
                prev, part, ["k"],
                sum_cols=("n", "s"), min_cols=("mn",), max_cols=("mx",),
            )
        except Exception:
            pass  # first batch: no state yet
        part.localCheckpoint(eager=True).write.mode("overwrite").parquet(state_dir)

    q = stream.writeStream.foreachBatch(upsert).option(
        "checkpointLocation", str(tmp_path / "ckpt")
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)
    (src / "b.json").write_text("\n".join(json.dumps(r) for r in rows2))
    q2 = stream.writeStream.foreachBatch(upsert).option(
        "checkpointLocation", str(tmp_path / "ckpt")
    ).trigger(availableNow=True).start()
    q2.awaitTermination(120)

    maintained = {r.k: (r.n, r.s, r.mn, r.mx) for r in spark.read.parquet(state_dir).collect()}
    allrows = spark.createDataFrame(rows1 + rows2, "k long, v long")
    want = {
        r.k: (r.n, r.s, r.mn, r.mx)
        for r in allrows.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        ).collect()
    }
    assert maintained == want


def test_streaming_cms_maintenance(spark, tmp_path):
    """Count-Min as a continuously-maintained streaming summary: each
    micro-batch's sketch merges (JVM mergeInPlace — same seed ⇒ counters
    add) into a persisted sketch file; after the stream drains, point
    estimates equal the whole-history sketch's — the mergeable-summary
    counterpart of the rollup-maintenance test above."""
    import json

    src = tmp_path / "cms_in"
    src.mkdir()
    state_path = tmp_path / "cms_state.bin"
    rows1 = [{"t": f"w{i % 7}"} for i in range(140)]
    rows2 = [{"t": f"w{i % 5}"} for i in range(100)]
    (src / "a.json").write_text("\n".join(json.dumps(r) for r in rows1))

    stream = spark.readStream.schema("t string").json(str(src))
    jvm = spark.sparkContext._jvm

    def upsert(batch_df, _bid):
        part = count_min_sketch_agg(batch_df, "t").collect()[0].cms
        if state_path.exists():
            merged = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
                state_path.read_bytes()
            )
            merged.mergeInPlace(
                jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
                    bytes(part)
                )
            )
            out = jvm.java.io.ByteArrayOutputStream()
            merged.writeTo(out)
            state_path.write_bytes(bytes(out.toByteArray()))
        else:
            state_path.write_bytes(bytes(part))

    def drain():
        q = stream.writeStream.foreachBatch(upsert).option(
            "checkpointLocation", str(tmp_path / "ckpt")
        ).trigger(availableNow=True).start()
        q.awaitTermination(120)

    drain()
    (src / "b.json").write_text("\n".join(json.dumps(r) for r in rows2))
    drain()

    allrows = spark.createDataFrame(rows1 + rows2, "t string")
    whole = count_min_sketch_agg(allrows, "t").collect()[0].cms
    w = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bytes(whole))
    m = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        state_path.read_bytes()
    )
    for i in range(7):
        assert m.estimateCount(f"w{i}") == w.estimateCount(f"w{i}")


def test_cms_numeric_items(spark):
    """Numeric probes against an integral-column sketch must hash as
    long (ADVICE r4: Py4J boxes small ints as Integer; cms_estimate now
    coerces to java.lang.Long explicitly). Small ints, a >2^31 value,
    and an absent value all estimate correctly."""
    df = spark.range(0, 1000).select(
        (F.when(F.col("id") < 500, F.col("id") % 5).otherwise(F.lit(2**40)))
        .cast("long")
        .alias("v")
    )
    sketch = count_min_sketch_agg(df, "v", eps=0.0001).collect()[0].cms
    est = cms_estimate(spark, sketch, [0, 4, 2**40, 999999])
    assert est[0] == 100 and est[4] == 100
    assert est[2**40] == 500
    assert est[999999] == 0
