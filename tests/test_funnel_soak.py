"""Streaming soak / chaos test for the funnel + IVF index lifecycle
(round-9 verdict item #4).

The per-stage parity suites cover single replays and single compaction
events; this file runs the COMPOSED funnel over 20 micro-batches with
induced failures interleaved — kill-after-sink-before-commit (commit
marker deleted, Structured Streaming's at-least-once replay), a crashed
mid-batch attempt (stale sink/store partitions from a future batch id),
and checkpoint-gated compaction run MID-STREAM with an uncommitted
replay frontier — then verifies that survivors, the per-stage counts
rollup, the dedup stores, and the persisted IVF index all match a batch
run of the same corpus.

Reference contract mirrored: the monitor's at-least-once disposition
(/root/reference/scripts/ocsf_monitor.py:120-207) — a batch may run
twice, and the second run must land exactly where the first did.
"""

import json
import os
import random
import shutil

import pytest

from pyspark.sql import functions as F

from boann_ocsf_security_data_platform_spark.operators.dedup import (
    decontaminate,
    exact_dedup,
    minhash_near_dup_pairs,
)
from boann_ocsf_security_data_platform_spark.operators.similarity import (
    build_ivf_index,
    query_ivf_index,
)
from boann_ocsf_security_data_platform_spark.operators.text import text_quality
from boann_ocsf_security_data_platform_spark.streaming import (
    compact_funnel_index,
    read_funnel_report,
    read_funnel_survivors,
    start_curation_funnel_stream,
)

N_BATCHES = 20
DOCS_PER_BATCH = 5
DIM = 64
BENCH_TEXT = (
    "benchmark questions about ancient rome and the fall of its empire"
)
_CONTENT = (
    "spark cluster shuffle executor column scan join filter stream batch "
    "window partition schema parquet vector index lattice harbor meadow "
    "granite copper salmon timber orchard velvet lantern compass anchor "
    "harvest thunder crystal voyage ember falcon willow summit prairie "
    "canyon glacier"
).split()
_STOPS = "the and of to in is it for with on".split()


def _vec(i):
    rng = random.Random(i)
    return [round(rng.uniform(-1.0, 1.0), 6) for _ in range(DIM)]


def _fresh_text(i):
    """15 tokens, every third a stopword, no digits/punctuation — clears
    the text_quality blend (length, word length, stopword ratio, zero
    digit/punct density) so the quality gate tests real drops only."""
    rng = random.Random(1000 + i)
    return " ".join(
        rng.choice(_STOPS) if j % 3 == 0 else rng.choice(_CONTENT)
        for j in range(15)
    )


def _make_corpus():
    """100 docs, ids monotone with arrival order. Every funnel stage is
    exercised repeatedly: role 3 = exact dup (case/pad variant of the
    role-0 doc three ids earlier), role 4 = near dup (role-1 doc plus one
    word), id%12==5 = quality failure, id%12==11 = contaminated."""
    docs = []
    for i in range(1, N_BATCHES * DOCS_PER_BATCH + 1):
        role = i % 6
        if role == 3:
            text = "  " + _fresh_text(i - 3).upper() + "  "
        elif role == 4:
            text = _fresh_text(i - 3) + " extra"
        elif role == 5 and i % 12 == 5:
            text = f"zz!!! {i} ?? xx##"  # unique per id: survives s1
        elif role == 5:
            text = (
                "benchmark questions about ancient rome appear here so "
                "this training document must be quarantined immediately "
                + _CONTENT[i % len(_CONTENT)]  # unique per id
            )
        else:
            text = _fresh_text(i)
        docs.append({"doc_id": i, "text": text, "embedding": _vec(i)})
    return docs


def _write_batch_files(src, docs, first, last):
    """One JSON file per micro-batch (maxFilesPerTrigger=1), mtimes
    increasing so the file source picks them up in id order."""
    for b in range(first, last):
        chunk = docs[b * DOCS_PER_BATCH : (b + 1) * DOCS_PER_BATCH]
        f = src / f"b{b:02d}.json"
        f.write_text("\n".join(json.dumps(d) for d in chunk))
        os.utime(f, (1_700_000_000 + b * 60, 1_700_000_000 + b * 60))


def _delete_last_commit(ckpt):
    """Chaos: remove the newest commit marker — the crash window between
    foreachBatch returning (all sinks written) and the commit, which
    Structured Streaming answers with an at-least-once replay."""
    commits = os.path.join(ckpt, "commits")
    last = max(int(n) for n in os.listdir(commits) if n.isdigit())
    os.remove(os.path.join(commits, str(last)))
    # ChecksumFs shadow: with only the marker gone, the replay's rename
    # of the new marker fails on the stale .crc and SS reports a bogus
    # concurrent-query error — a real crash loses both files together
    crc = os.path.join(commits, f".{last}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    return last


@pytest.mark.slow  # ~160 s chaos soak — slow tier, r12 VERDICT #3
def test_funnel_soak_chaos_matches_batch(spark, tmp_path):
    docs = _make_corpus()
    benchmark = spark.createDataFrame([(BENCH_TEXT,)], "text string")
    src = tmp_path / "soak_in"
    src.mkdir()
    d = {k: str(tmp_path / f"soak_{k}") for k in
         ("hash", "band", "out", "counts")}
    ckpt = str(tmp_path / "soak_ckpt")

    seed = spark.createDataFrame(
        [(10_000 + j, _vec(10_000 + j)) for j in range(8)],
        "vec_id long, embedding array<double>",
    )
    idx = str(tmp_path / "soak_ivf")
    build_ivf_index(seed, idx, n_centroids=4, train_iters=2)

    def run_segment():
        stream = (
            spark.readStream.schema(
                "doc_id long, text string, embedding array<double>"
            )
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        q, release = start_curation_funnel_stream(
            stream, benchmark, d["hash"], d["band"], d["out"], d["counts"],
            ckpt, available_now=True, ivf_index_dir=idx,
        )
        q.awaitTermination(600)
        release()

    # ---- segment 1: batches 0-7 ------------------------------------
    _write_batch_files(src, docs, 0, 8)
    run_segment()

    # chaos 1: kill after sinks, before commit -> replay of batch 7
    replayed = _delete_last_commit(ckpt)
    assert replayed == 7
    run_segment()  # same files; replays batch 7 against warm stores

    # ---- segment 2: batches 8-15, then mid-stream compaction --------
    _write_batch_files(src, docs, 8, 16)
    run_segment()

    # chaos 2: crash window again, and compact WHILE batch 15 is an
    # uncommitted replay frontier — the checkpoint gate must fold only
    # batches <= 14 so the replay still overwrites its own partitions
    _delete_last_commit(ckpt)
    folded_rows = compact_funnel_index(spark, idx, ckpt)
    assert folded_rows > 0
    appended = spark.read.parquet(f"{idx}/lists")
    assert appended.filter(F.col("_batch_id") == 15).count() > 0, (
        "the uncommitted frontier batch must keep its append partitions"
    )
    assert appended.filter(
        (F.col("_batch_id") >= 0) & (F.col("_batch_id") < 15)
    ).count() == 0, "every committed batch must have been folded into -1"
    run_segment()  # replays batch 15 on top of the compacted index

    # chaos 3: a crashed attempt of FUTURE batch 16 wrote its sink and
    # store partitions (with a bogus survivor set) before dying; the real
    # batch 16 must dynamically overwrite all of them
    # schema-safe injection: one real row from each sink, doc_id swapped
    # to the sentinel and _batch_id to the not-yet-run batch 16
    for sink in (d["out"], d["hash"], d["band"]):
        store = spark.read.parquet(sink)
        bogus = (
            store.limit(1)
            .withColumn(
                "doc_id",
                F.lit(999_999).cast(store.schema["doc_id"].dataType),
            )
            .withColumn("_batch_id", F.lit(16))
        )
        bogus.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("_batch_id").parquet(sink)

    # ---- segment 3: batches 16-19, final compaction ------------------
    _write_batch_files(src, docs, 16, N_BATCHES)
    run_segment()
    compact_funnel_index(spark, idx, ckpt)

    # ---- verification vs one batch run of the same corpus ------------
    survivors = read_funnel_survivors(spark, d["out"])
    streamed = sorted(r.doc_id for r in survivors.select("doc_id").collect())
    assert 999_999 not in streamed, "crashed-attempt sink rows must be gone"

    full = spark.createDataFrame(
        [(x["doc_id"], x["text"]) for x in docs], "doc_id long, text string"
    )
    s1 = full.join(
        exact_dedup(full).select(F.col("keep_id").alias("doc_id")), "doc_id"
    )
    pairs = minhash_near_dup_pairs(s1)
    s2 = s1.join(
        pairs.select(F.col("id_b").alias("doc_id")).distinct(),
        "doc_id", "left_anti",
    )
    s3 = (
        text_quality(s2)
        .where((F.col("quality_score") >= 0.75) & (F.col("n_tokens") >= 10))
        .select("doc_id", "text")
    )
    s4 = decontaminate(s3, benchmark)
    batch_ids = sorted(r.doc_id for r in s4.select("doc_id").collect())
    assert streamed == batch_ids

    # the corpus really exercised every stage, repeatedly
    n_exact = s1.count()
    assert n_exact < 100, "exact dups must exist"
    assert len(batch_ids) < s3.count(), "contamination must drop docs"
    assert s3.count() < s2.count(), "quality gate must drop docs"

    # counts rollup: s0 saw the whole corpus exactly once per batch id,
    # despite three replays; downstream totals match the batch run
    report = {
        r.stage: r.n_docs
        for r in read_funnel_report(spark, d["counts"]).collect()
    }
    assert report["s0_raw"] == 100
    assert report["s1_exact_dedup"] == n_exact
    assert report["s2_near_dup"] == s2.count()
    assert report["s3_quality"] == s3.count()
    assert report["s4_decontaminated"] == report["s5_indexed"] == len(batch_ids)

    # stores: exactly one partition per batch id, none from the bogus set
    for store in (d["hash"], d["band"]):
        got = {
            r._batch_id
            for r in spark.read.parquet(store).select("_batch_id").distinct().collect()
        }
        assert got == set(range(N_BATCHES))
    assert spark.read.parquet(d["hash"]).filter(
        F.col("doc_id") == 999_999
    ).count() == 0

    # index parity: no double counts through replay + two compactions,
    # and full-probe queries equal a fresh build over seed + survivors
    lists = spark.read.parquet(f"{idx}/lists")
    assert lists.count() == 8 + len(batch_ids)
    assert lists.select("vec_id").distinct().count() == 8 + len(batch_ids)

    union = seed.unionByName(
        spark.createDataFrame(
            [(i, _vec(i)) for i in batch_ids],
            "vec_id long, embedding array<double>",
        )
    )
    fresh = str(tmp_path / "soak_ivf_fresh")
    build_ivf_index(union, fresh, n_centroids=4, train_iters=2)
    probes = spark.createDataFrame(
        [(900_000 + j, _vec(900_000 + j)) for j in range(3)],
        "vec_id long, embedding array<double>",
    )
    got = sorted(
        tuple(r)
        for r in query_ivf_index(spark, idx, probes, k=5, n_probe=4).collect()
    )
    want = sorted(
        tuple(r)
        for r in query_ivf_index(spark, fresh, probes, k=5, n_probe=4).collect()
    )
    assert got == want and len(got) == 15

    shutil.rmtree(fresh, ignore_errors=True)
