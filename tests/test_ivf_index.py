"""Persistent IVF index lifecycle: build-once/query-many parity with the
in-memory operator, exactness at full probe, and partition pruning as
the inverted-list seek."""

from pyspark.sql import functions as F

from boann_ocsf_security_data_platform_spark.operators.similarity import (
    append_to_ivf_index,
    build_ivf_index,
    compact_ivf_index,
    cosine_topk,
    cosine_topk_ivf,
    query_ivf_index,
    train_ivf_centroids,
)
from boann_ocsf_security_data_platform_spark.sources import load_table


def test_persisted_index_matches_in_memory_ivf(spark, sf_smoke, tmp_path):
    emb = load_table(spark, sf_smoke, "embeddings")
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, n_centroids=8, train_iters=2)
    q = emb.where(F.col("vec_id") < 10)
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in query_ivf_index(spark, path, q, k=5, n_probe=3).collect()
    }
    cents = [
        (r.cent_id, list(r.cent_vec))
        for r in spark.read.parquet(f"{path}/centroids").collect()
    ]
    want = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in cosine_topk_ivf(
            emb, q, k=5, n_probe=3, centroids=cents
        ).collect()
    }
    assert got == want and got


def test_full_probe_equals_exact_bruteforce(spark, sf_smoke, tmp_path):
    emb = load_table(spark, sf_smoke, "embeddings")
    path = str(tmp_path / "ivf_full")
    build_ivf_index(emb, path, n_centroids=8, train_iters=2)
    q = emb.where(F.col("vec_id") < 5)
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in query_ivf_index(spark, path, q, k=5, n_probe=8).collect()
    }
    want = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in cosine_topk(emb, q, k=5).collect()
    }
    assert got == want


def test_probe_prunes_list_partitions(spark, sf_smoke, tmp_path):
    """The probe's cent_id filter must reach the scan as a partition
    filter — reading only the probed lists IS the index seek."""
    emb = load_table(spark, sf_smoke, "embeddings")
    path = str(tmp_path / "ivf_prune")
    build_ivf_index(emb, path, n_centroids=8, train_iters=1)
    lists = spark.read.parquet(f"{path}/lists")
    pruned = lists.where(F.col("cent_id").isin(0, 1))
    plan = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cent_id" in m.group(1), plan[:2000]
    # and executing the pruned read returns only the probed lists' rows
    assert set(
        r.cent_id for r in pruned.select("cent_id").distinct().collect()
    ) <= {0, 1}
    assert pruned.count() < lists.count()


def test_rebuild_overwrites_cleanly(spark, sf_smoke, tmp_path):
    emb = load_table(spark, sf_smoke, "embeddings")
    path = str(tmp_path / "ivf_rebuild")
    build_ivf_index(emb, path, n_centroids=4, train_iters=1)
    n4 = spark.read.parquet(f"{path}/centroids").count()
    build_ivf_index(emb, path, n_centroids=8, train_iters=1)
    n8 = spark.read.parquet(f"{path}/centroids").count()
    assert (n4, n8) == (4, 8)
    # every corpus vector is in exactly one list after rebuild
    lists = spark.read.parquet(f"{path}/lists")
    assert lists.count() == emb.count()
    assert lists.select("vec_id").distinct().count() == emb.count()


def test_append_to_index_incremental(spark, sf_smoke, tmp_path):
    """The lifecycle's third leg: build on half the corpus, APPEND the
    other half — every vector ends up in exactly one list, appended rows
    land under the frozen centroids' partitions (no centroid rewrite),
    and a full-probe query over the appended index finds appended ids."""
    emb = load_table(spark, sf_smoke, "embeddings")
    first = emb.where(F.col("vec_id") % 2 == 0)
    rest = emb.where(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "ivf_append")
    build_ivf_index(first, path, n_centroids=4, train_iters=1)
    cents_before = sorted(
        r.cent_id for r in spark.read.parquet(f"{path}/centroids").collect()
    )
    append_to_ivf_index(rest, path)
    cents_after = sorted(
        r.cent_id for r in spark.read.parquet(f"{path}/centroids").collect()
    )
    assert cents_before == cents_after  # centroids frozen
    lists = spark.read.parquet(f"{path}/lists")
    assert lists.count() == emb.count()
    assert lists.select("vec_id").distinct().count() == emb.count()
    # a full-probe query surfaces appended (odd-id) neighbors
    queries = emb.limit(3)
    res = query_ivf_index(spark, path, queries, k=5, n_probe=4)
    got = {r.neighbor_id for r in res.collect()}
    assert any(int(i) % 2 == 1 for i in got)


def test_compact_ivf_index_folds_batches(spark, tmp_path):
    """Round-9 lifecycle completion: compaction folds the per-batch append
    partitions into the base generation — row multiset identical, every
    row under _batch_id=-1, query results unchanged (full probe = exact,
    so any divergence would surface as a result diff)."""
    import random

    from pyspark.sql import functions as F

    from boann_ocsf_security_data_platform_spark.operators.similarity import (
        append_to_ivf_index,
        build_ivf_index,
        compact_ivf_index,
        query_ivf_index,
    )

    def vec(i):
        rng = random.Random(i)
        return [round(rng.uniform(-1.0, 1.0), 6) for _ in range(64)]

    base = spark.createDataFrame(
        [(i, vec(i)) for i in range(20)], "vec_id long, embedding array<double>"
    )
    path = str(tmp_path / "ivf_compact")
    build_ivf_index(base, path, n_centroids=4, train_iters=2)
    for bid, ids in ((0, range(20, 30)), (1, range(30, 40))):
        append_to_ivf_index(
            spark.createDataFrame(
                [(i, vec(i)) for i in ids],
                "vec_id long, embedding array<double>",
            ),
            path,
            batch_id=bid,
        )
    probes = spark.createDataFrame(
        [(900, vec(900))], "vec_id long, embedding array<double>"
    )
    before_rows = sorted(
        (r.vec_id, r.cent_id)
        for r in spark.read.parquet(f"{path}/lists").collect()
    )
    before_q = sorted(
        tuple(r)
        for r in query_ivf_index(spark, path, probes, k=5, n_probe=4).collect()
    )

    n = compact_ivf_index(spark, path)
    assert n == 40

    lists = spark.read.parquet(f"{path}/lists")
    assert sorted(
        (r.vec_id, r.cent_id) for r in lists.collect()
    ) == before_rows
    assert lists.filter(F.col("_batch_id") != -1).count() == 0
    after_q = sorted(
        tuple(r)
        for r in query_ivf_index(spark, path, probes, k=5, n_probe=4).collect()
    )
    assert after_q == before_q
    # idempotent: compacting an already-compacted index is a no-op fold
    assert compact_ivf_index(spark, path) == 40


def test_recover_ivf_compaction_heals_crashes(spark, tmp_path):
    """Crash between the compaction renames must heal on the next writer:
    roll FORWARD when the folded output carries _SUCCESS, roll BACK to
    the backup when it does not."""
    import random

    from boann_ocsf_security_data_platform_spark.operators.similarity import (
        build_ivf_index,
        compact_ivf_index,
        recover_ivf_compaction,
    )

    def vec(i):
        rng = random.Random(i)
        return [round(rng.uniform(-1.0, 1.0), 6) for _ in range(64)]

    base = spark.createDataFrame(
        [(i, vec(i)) for i in range(20)], "vec_id long, embedding array<double>"
    )
    path = str(tmp_path / "ivf_crash")
    build_ivf_index(base, path, n_centroids=4, train_iters=2)
    rows = sorted(
        (r.vec_id, r.cent_id)
        for r in spark.read.parquet(f"{path}/lists").collect()
    )
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    P = jvm.org.apache.hadoop.fs.Path
    fs = P(path).getFileSystem(conf)

    # crash AFTER the rewrite (with _SUCCESS), between renames: lists
    # moved to backup, folded output never swapped in -> roll forward
    spark.read.parquet(f"{path}/lists").write.mode("overwrite").partitionBy(
        "cent_id", "_batch_id"
    ).parquet(f"{path}/lists__compacting")
    fs.rename(P(f"{path}/lists"), P(f"{path}/lists__old"))
    assert recover_ivf_compaction(spark, path) == "completed"
    assert sorted(
        (r.vec_id, r.cent_id)
        for r in spark.read.parquet(f"{path}/lists").collect()
    ) == rows

    # crash DURING the rewrite (no _SUCCESS): incomplete output, backup
    # intact -> roll back
    spark.read.parquet(f"{path}/lists").write.mode("overwrite").partitionBy(
        "cent_id", "_batch_id"
    ).parquet(f"{path}/lists__compacting")
    fs.delete(P(f"{path}/lists__compacting/_SUCCESS"), False)
    fs.rename(P(f"{path}/lists"), P(f"{path}/lists__old"))
    assert recover_ivf_compaction(spark, path) == "rolled_back"
    assert sorted(
        (r.vec_id, r.cent_id)
        for r in spark.read.parquet(f"{path}/lists").collect()
    ) == rows
    # and a subsequent compaction over the healed index still works
    assert compact_ivf_index(spark, path) == 20


def test_compact_ivf_index_up_to_batch_selective(spark, tmp_path):
    """Checkpoint-gated fold bound: compact(up_to_batch=0) folds ONLY
    batch 0 into the base generation, leaves batch 1's partition its own
    (so a later replay of batch 1 still dynamic-overwrites its original
    partition, never doubling against a folded copy), keeps the row
    multiset and query results identical, and a later unbounded compact
    folds the remainder."""
    import random

    from boann_ocsf_security_data_platform_spark.operators.similarity import (
        compact_ivf_index,
    )

    def vec(i):
        rng = random.Random(i)
        return [round(rng.uniform(-1.0, 1.0), 6) for _ in range(64)]

    base = spark.createDataFrame(
        [(i, vec(i)) for i in range(20)], "vec_id long, embedding array<double>"
    )
    path = str(tmp_path / "ivf_upto")
    build_ivf_index(base, path, n_centroids=4, train_iters=2)
    for bid, ids in ((0, range(20, 30)), (1, range(30, 40))):
        append_to_ivf_index(
            spark.createDataFrame(
                [(i, vec(i)) for i in ids],
                "vec_id long, embedding array<double>",
            ),
            path,
            batch_id=bid,
        )
    probes = spark.createDataFrame(
        [(900, vec(900))], "vec_id long, embedding array<double>"
    )
    before_rows = sorted(
        (r.vec_id, r.cent_id)
        for r in spark.read.parquet(f"{path}/lists").collect()
    )
    before_q = sorted(
        tuple(r)
        for r in query_ivf_index(spark, path, probes, k=5, n_probe=4).collect()
    )

    assert compact_ivf_index(spark, path, up_to_batch=0) == 30
    lists = spark.read.parquet(f"{path}/lists")
    by_bid = {
        r._batch_id: r.n
        for r in lists.groupBy("_batch_id").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert by_bid == {-1: 30, 1: 10}  # batch 0 folded, batch 1 intact
    assert sorted(
        (r.vec_id, r.cent_id) for r in lists.collect()
    ) == before_rows
    assert sorted(
        tuple(r)
        for r in query_ivf_index(spark, path, probes, k=5, n_probe=4).collect()
    ) == before_q

    # a replay of the NOT-yet-folded batch 1 overwrites its own partition
    # with identical rows — no double-count
    append_to_ivf_index(
        spark.createDataFrame(
            [(i, vec(i)) for i in range(30, 40)],
            "vec_id long, embedding array<double>",
        ),
        path,
        batch_id=1,
    )
    assert sorted(
        (r.vec_id, r.cent_id)
        for r in spark.read.parquet(f"{path}/lists").collect()
    ) == before_rows

    # no-op fast path: nothing foldable at or below the bound
    assert compact_ivf_index(spark, path, up_to_batch=0) == 30
    assert {
        r._batch_id
        for r in spark.read.parquet(f"{path}/lists")
        .select("_batch_id").distinct().collect()
    } == {-1, 1}

    # the unbounded compact folds the remainder
    assert compact_ivf_index(spark, path) == 40


def test_compact_funnel_index_checkpoint_gate(spark, tmp_path):
    """compact_funnel_index folds exactly the batches the checkpoint's
    commit log covers: with commits {0, 1} and appended batches {0, 1, 2},
    batches 0-1 fold and batch 2 (the replay frontier) survives as its own
    partition; before any commit the call is a no-op."""
    import random

    from boann_ocsf_security_data_platform_spark.streaming import (
        compact_funnel_index,
        last_committed_batch,
    )

    def vec(i):
        rng = random.Random(i)
        return [round(rng.uniform(-1.0, 1.0), 6) for _ in range(64)]

    base = spark.createDataFrame(
        [(i, vec(i)) for i in range(10)], "vec_id long, embedding array<double>"
    )
    path = str(tmp_path / "ivf_gate")
    build_ivf_index(base, path, n_centroids=2, train_iters=2)
    for bid in (0, 1, 2):
        append_to_ivf_index(
            spark.createDataFrame(
                [(100 + 10 * bid + j, vec(100 + 10 * bid + j)) for j in range(5)],
                "vec_id long, embedding array<double>",
            ),
            path,
            batch_id=bid,
        )

    ckpt = tmp_path / "gate_ckpt"
    assert last_committed_batch(spark, str(ckpt)) is None
    assert compact_funnel_index(spark, path, str(ckpt)) == 0  # no commits yet

    commits = ckpt / "commits"
    commits.mkdir(parents=True)
    for b in (0, 1):
        (commits / str(b)).write_text("v1\n{}")
    assert last_committed_batch(spark, str(ckpt)) == 1

    assert compact_funnel_index(spark, path, str(ckpt)) == 20  # 10 base + 2x5
    by_bid = {
        r._batch_id: r.n
        for r in spark.read.parquet(f"{path}/lists")
        .groupBy("_batch_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_bid == {-1: 20, 2: 5}


def test_reuse_gate_rejects_half_built_index(spark, tmp_path, monkeypatch):
    """ADVICE r9 #1: build_ivf_index is not atomic (centroids land before
    lists), so cached-reuse callers must gate on ivf_index_is_complete,
    which requires the lists COMMIT MARKER — and the build must
    invalidate that marker BEFORE touching centroids, so a crash at any
    point mid-build leaves an index the gate rejects."""
    import random

    from boann_ocsf_security_data_platform_spark.operators import similarity as sim

    def vec(i):
        rng = random.Random(i)
        return [round(rng.uniform(-1.0, 1.0), 6) for _ in range(64)]

    corpus = spark.createDataFrame(
        [(i, vec(i)) for i in range(20)], "vec_id long, embedding array<double>"
    )
    path = str(tmp_path / "ivf_gate_reuse")
    assert not sim.ivf_index_is_complete(spark, path)  # nothing yet

    build_ivf_index(corpus, path, n_centroids=2, train_iters=1)
    assert sim.ivf_index_is_complete(spark, path)

    # crash injection: a rebuild that dies during centroid training must
    # leave the previously-complete index UNREUSABLE (its marker gone),
    # never a fresh-centroids/stale-lists mix behind a valid marker
    def _boom(*a, **k):
        raise RuntimeError("injected mid-build crash")

    monkeypatch.setattr(sim, "train_ivf_centroids", _boom)
    try:
        sim.build_ivf_index(corpus, path, n_centroids=2, train_iters=1)
    except RuntimeError:
        pass
    assert not sim.ivf_index_is_complete(spark, path)

    # a completed rebuild restores the marker
    monkeypatch.undo()
    build_ivf_index(corpus, path, n_centroids=2, train_iters=1)
    assert sim.ivf_index_is_complete(spark, path)

    # centroids-only (crash between centroid write and lists write)
    half = str(tmp_path / "ivf_half")
    spark.read.parquet(f"{path}/centroids").write.parquet(f"{half}/centroids")
    assert not sim.ivf_index_is_complete(spark, half)


def test_append_rejects_legacy_layout_and_compact_migrates(spark, tmp_path):
    """ADVICE r9 #4: appending (cent_id, _batch_id) partitions into a
    pre-round-9 cent_id-only lists layout would mix partition depths and
    break discovery — append must refuse with a migration hint, and
    compact_ivf_index IS the migration (legacy rows fold into the
    _batch_id=-1 base generation)."""
    import random

    import pytest

    def vec(i):
        rng = random.Random(i)
        return [round(rng.uniform(-1.0, 1.0), 6) for _ in range(64)]

    path = str(tmp_path / "ivf_legacy")
    # hand-write a legacy index: centroids + cent_id-only lists
    spark.createDataFrame(
        [(0, vec(1000)), (1, vec(2000))], "cent_id int, cent_vec array<double>"
    ).repartition(1).write.parquet(f"{path}/centroids")
    spark.createDataFrame(
        [(i, vec(i), i % 2) for i in range(10)],
        "vec_id long, vec array<double>, cent_id int",
    ).write.partitionBy("cent_id").parquet(f"{path}/lists")

    newv = spark.createDataFrame(
        [(100 + j, vec(100 + j)) for j in range(4)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="legacy"):
        append_to_ivf_index(newv, path, batch_id=0)

    assert compact_ivf_index(spark, path) == 10  # migration
    append_to_ivf_index(newv, path, batch_id=0)  # now clean
    lists = spark.read.parquet(f"{path}/lists")
    by_bid = {
        r._batch_id: r.n
        for r in lists.groupBy("_batch_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert by_bid == {-1: 10, 0: 4}


def test_replay_with_different_survivors_leaves_no_orphans(spark, tmp_path):
    """ADVICE r9 #3: a replayed batch may produce a DIFFERENT survivor
    set than the crashed attempt (fewer rows, fewer cent_ids). The
    append must delete the batch's earlier partitions before the dynamic
    overwrite, so after the replay the index holds EXACTLY the replay's
    rows for that batch — never the crashed attempt's orphans."""
    import random

    def vec(i):
        rng = random.Random(i)
        return [round(rng.uniform(-1.0, 1.0), 6) for _ in range(64)]

    base = spark.createDataFrame(
        [(i, vec(i)) for i in range(20)], "vec_id long, embedding array<double>"
    )
    path = str(tmp_path / "ivf_replay_orphan")
    build_ivf_index(base, path, n_centroids=4, train_iters=2)

    # crashed attempt: 12 vectors spread over (very likely) all 4 lists
    attempt1 = spark.createDataFrame(
        [(100 + j, vec(100 + j)) for j in range(12)],
        "vec_id long, embedding array<double>",
    )
    append_to_ivf_index(attempt1, path, batch_id=7)
    got1 = {
        r.vec_id
        for r in spark.read.parquet(f"{path}/lists")
        .filter(F.col("_batch_id") == 7)
        .collect()
    }
    assert got1 == set(range(100, 112))

    # replay survives only 2 vectors (e.g. upstream store guards dropped
    # the rest) — batch 7 must shrink to exactly these two
    attempt2 = spark.createDataFrame(
        [(100, vec(100)), (101, vec(101))],
        "vec_id long, embedding array<double>",
    )
    append_to_ivf_index(attempt2, path, batch_id=7)
    lists = spark.read.parquet(f"{path}/lists")
    got2 = {r.vec_id for r in lists.filter(F.col("_batch_id") == 7).collect()}
    assert got2 == {100, 101}
    # base generation untouched
    assert lists.filter(F.col("_batch_id") == -1).count() == 20
