"""Scale utilities: stateful streaming operator, salted join, compaction."""

import json
import time

from pyspark.sql import functions as F

from boann_ocsf_security_data_platform_spark.operators.relational import (
    compact_table,
    salted_join,
)
from boann_ocsf_security_data_platform_spark.sources import load_table
from boann_ocsf_security_data_platform_spark.streaming.stateful import (
    running_user_stats,
)


def test_salted_join_matches_plain_join(spark, sf_smoke):
    orders = load_table(spark, sf_smoke, "orders").withColumnRenamed(
        "o_custkey", "c_custkey"
    )
    cust = load_table(spark, sf_smoke, "customer")
    plain = (
        orders.join(cust, "c_custkey")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("t"))
    )
    salted = (
        salted_join(orders, cust, "c_custkey", n_salts=4)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("t"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark, sf_smoke):
    cust = load_table(spark, sf_smoke, "customer")
    orders = load_table(spark, sf_smoke, "orders").withColumnRenamed(
        "o_custkey", "c_custkey"
    )
    plain = cust.join(orders, "c_custkey", "left").count()
    salted = salted_join(cust, orders, "c_custkey", n_salts=4, how="left").count()
    assert plain == salted


def test_compact_table(spark, tmp_path):
    path = str(tmp_path / "landing")
    df = spark.range(2000).select(
        F.col("id").alias("finding_uid").cast("string"),
        F.lit("{}").alias("raw_ocsf_json"),
        F.lit("2024-01-01").cast("date").alias("load_date"),
    )
    # simulate many tiny appended files
    for _ in range(4):
        df.repartition(16).write.mode("append").partitionBy("load_date").parquet(path)
    import glob

    before = len(glob.glob(f"{path}/load_date=*/*.parquet"))
    rows_before = spark.read.parquet(path).count()
    compact_table(spark, path)
    after = len(glob.glob(f"{path}/load_date=*/*.parquet"))
    assert spark.read.parquet(path).count() == rows_before == 8000
    assert after < before and after <= 4


def test_compact_recovers_from_crash_between_renames(spark, tmp_path):
    """Kill the swap at its most dangerous point — table dir already moved
    to backup, compacted output not yet moved in — and at every other
    intermediate state: the next compact_table/recover_compaction call must
    heal without manual intervention and lose no rows."""
    import os
    import shutil

    from boann_ocsf_security_data_platform_spark.operators.relational import (
        recover_compaction,
    )

    path = str(tmp_path / "t")
    df = spark.range(100).select(
        F.col("id").alias("finding_uid").cast("string"),
        F.lit("{}").alias("raw_ocsf_json"),
        F.lit("2024-01-01").cast("date").alias("load_date"),
    )
    df.write.mode("append").partitionBy("load_date").parquet(path)

    # crash state A: output fully written (_SUCCESS present), table renamed
    # to backup, second rename never happened → roll FORWARD
    spark.read.parquet(path).repartition(1).write.partitionBy(
        "load_date"
    ).parquet(path + "__compacting")
    os.rename(path, path + "__pre_compact")
    assert recover_compaction(spark, path) == "completed"
    assert spark.read.parquet(path).count() == 100
    assert not os.path.exists(path + "__pre_compact")

    # crash state B: rewrite died mid-job (no _SUCCESS), table already
    # moved aside → roll BACK the backup
    os.makedirs(path + "__compacting")
    open(path + "__compacting/part-00000.parquet", "w").close()  # partial
    os.rename(path, path + "__pre_compact")
    assert recover_compaction(spark, path) == "rolled_back"
    assert spark.read.parquet(path).count() == 100
    assert not os.path.exists(path + "__compacting")

    # crash state C: swap finished but backup delete didn't — stale debris
    # is cleared and a fresh compaction runs end-to-end on top
    shutil.copytree(path, path + "__pre_compact")
    compact_table(spark, path)
    assert spark.read.parquet(path).count() == 100
    assert not os.path.exists(path + "__pre_compact")


def test_stateful_running_stats_across_batches(spark, tmp_path):
    src = tmp_path / "stateful_in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    (src / "b1.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"user_id": 1, "ts": "2024-01-01T00:00:00", "value": 10.0},
                {"user_id": 1, "ts": "2024-01-01T00:01:00", "value": 5.0},
                {"user_id": 2, "ts": "2024-01-01T00:02:00", "value": 1.0},
            ]
        )
    )
    stream = spark.readStream.schema("user_id long, ts timestamp, value double").json(
        str(src)
    )
    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("running_stats")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        # second batch updates existing state
        (src / "b2.json").write_text(
            json.dumps({"user_id": 1, "ts": "2024-01-01T00:05:00", "value": 7.0})
        )
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT user_id, n_events, total_value FROM running_stats"
        ).collect()
    finally:
        q.stop()
    # memory sink in update mode appends updates; take the latest per user
    latest = {}
    for r in rows:
        latest[r.user_id] = (r.n_events, r.total_value)
    assert latest[1] == (3, 22.0)  # state carried across micro-batches
    assert latest[2] == (1, 1.0)


def test_bucketed_join_is_shuffle_free(spark, sf_smoke, tmp_path):
    """Tables bucketed on the join key by the same bucket count join with
    zero Exchange nodes (co-located join); the plain parquet join of the
    same data shuffles both sides."""
    from boann_ocsf_security_data_platform_spark.operators.relational import (
        write_bucketed,
    )
    from boann_ocsf_security_data_platform_spark.sources import load_table

    o = load_table(spark, sf_smoke, "orders")
    l = load_table(spark, sf_smoke, "lineitem")
    write_bucketed(o, "b_orders", "o_orderkey", n_buckets=8)
    write_bucketed(
        l.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem",
        "o_orderkey", n_buckets=8,
    )
    try:
        bo = spark.table("b_orders")
        bl = spark.table("b_lineitem")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            plan = (
                bo.join(bl, "o_orderkey")
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            baseline = (
                o.join(l, o.o_orderkey == l.l_orderkey)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )
        assert "Exchange" not in plan  # co-located: no shuffle either side
        assert "Exchange" in baseline  # same join, unbucketed: shuffles
        # results identical to the unbucketed join
        assert bo.join(bl, "o_orderkey").count() == o.join(
            l, o.o_orderkey == l.l_orderkey
        ).count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_transform_with_state_profile_across_batches(spark, tmp_path):
    """Spark 4 transformWithStateInPandas: composite typed state (ValueState
    running totals + bounded ListState recent window) carried across
    micro-batches, updated per key. The runtime needs google.protobuf for
    the state-server protocol — skip (not fail) where it isn't installed."""
    import pytest

    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas state server requires protobuf",
    )
    from boann_ocsf_security_data_platform_spark.streaming.stateful import (
        user_profile_stats,
    )

    src = tmp_path / "tws_in"
    src.mkdir()
    ckpt = str(tmp_path / "tws_ckpt")
    (src / "b1.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"user_id": 1, "ts": "2024-01-01T00:00:00", "value": 10.0},
                {"user_id": 1, "ts": "2024-01-01T00:01:00", "value": 5.0},
                {"user_id": 2, "ts": "2024-01-01T00:02:00", "value": 1.0},
            ]
        )
    )
    stream = spark.readStream.schema(
        "user_id long, ts timestamp, value double"
    ).json(str(src))
    q = (
        user_profile_stats(stream, recent_n=3)
        .writeStream.format("memory")
        .queryName("tws_profile")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: user 1 gets two more values; recent window must slide
        (src / "b2.json").write_text(
            "\n".join(
                json.dumps(r)
                for r in [
                    {"user_id": 1, "ts": "2024-01-01T00:05:00", "value": 7.0},
                    {"user_id": 1, "ts": "2024-01-01T00:06:00", "value": 2.0},
                ]
            )
        )
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT user_id, n_events, total_value, recent_avg FROM tws_profile"
        ).collect()
    finally:
        q.stop()
    latest = {}
    for r in rows:
        latest[r.user_id] = (r.n_events, r.total_value, r.recent_avg)
    n1, total1, avg1 = latest[1]
    assert (n1, total1) == (4, 24.0)  # totals survive the batch boundary
    # recent window = last 3 of [10, 5, 7, 2] -> (5+7+2)/3
    assert abs(avg1 - (5.0 + 7.0 + 2.0) / 3) < 1e-9
    assert latest[2] == (1, 1.0, 1.0)


def test_upsert_table_merge_semantics_and_recovery(spark, tmp_path):
    from boann_ocsf_security_data_platform_spark.operators.relational import (
        recover_compaction,
        upsert_table,
    )

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k int, v string, n int"
    )
    # first call on a missing table = plain write
    upsert_table(spark, path, base, ["k"])
    assert spark.read.parquet(path).count() == 3

    # matched keys replaced, new key inserted, new column evolves schema
    updates = spark.createDataFrame(
        [(2, "B", 21, "x"), (4, "d", 40, "y")], "k int, v string, n int, extra string"
    )
    upsert_table(spark, path, updates, ["k"])
    got = {
        r.k: (r.v, r.n, r.extra)
        for r in spark.read.option("mergeSchema", "true").parquet(path).collect()
    }
    assert got == {
        1: ("a", 10, None),
        2: ("B", 21, "x"),
        3: ("c", 30, None),
        4: ("d", 40, "y"),
    }

    # updates derived FROM the target must not self-destruct (read-then-
    # overwrite hazard): bump n for k<=2 from the table itself
    from pyspark.sql import functions as F

    derived = (
        spark.read.option("mergeSchema", "true").parquet(path)
        .filter("k <= 2")
        .withColumn("n", F.col("n") + 100)
    )
    upsert_table(spark, path, derived, ["k"])
    got = {r.k: r.n for r in spark.read.option("mergeSchema", "true").parquet(path).collect()}
    assert got == {1: 110, 2: 121, 3: 30, 4: 40}

    # crash between the renames heals on the next recover/upsert call
    import os
    import shutil

    shutil.move(path, path + "__pre_compact")      # simulate: src renamed away
    os.makedirs(path + "__compacting")             # incomplete tmp (no _SUCCESS)
    assert recover_compaction(spark, path) == "rolled_back"
    assert spark.read.option("mergeSchema", "true").parquet(path).count() == 4
