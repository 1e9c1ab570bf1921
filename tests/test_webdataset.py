"""WebDataset-style tar shard interchange: codec-free reader walk,
deterministic shard assignment, executor-side writer — round-tripped
against stdlib tarfile."""

import io
import os
import tarfile

from pyspark.sql import functions as F

from boann_ocsf_security_data_platform_spark.operators.multimodal import (
    assign_shards,
    tar_members,
    write_tar_shards,
)


def _mk_tar(members):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in members:
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def test_tar_members_walk_groups_by_sample_key(spark):
    tar = _mk_tar(
        [
            ("sample0.jpg", b"JPGBYTES0"),
            ("sample0.json", b'{"label": 1}'),
            ("sample1.jpg", b"JPGBYTES1"),
            ("sample1.json", b'{"label": 2}'),
        ]
    )
    df = spark.createDataFrame([(1, bytearray(tar))], "shard_no int, tar_bytes binary")
    rows = tar_members(df, keep_cols=("shard_no",)).collect()
    assert len(rows) == 4
    by_key = {}
    for r in rows:
        by_key.setdefault(r.sample_key, set()).add(r.member_ext)
        assert r.shard_no == 1
        assert r.member_size == len(bytes(r.payload))
    assert by_key == {"sample0": {"jpg", "json"}, "sample1": {"jpg", "json"}}


def test_tar_members_truncated_archive_is_data_not_error(spark):
    tar = _mk_tar([("a.txt", b"x" * 600), ("b.txt", b"y" * 100)])
    cut = tar[: 512 + 512]  # cut inside a.txt's data
    df = spark.createDataFrame(
        [(bytearray(cut),), (bytearray(_mk_tar([("ok.txt", b"z")])),)],
        "tar_bytes binary",
    )
    rows = tar_members(df).collect()
    assert {r.member_name for r in rows} == {"ok.txt"}


def test_tar_members_skips_directories(spark):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        d = tarfile.TarInfo(name="dir/")
        d.type = tarfile.DIRTYPE
        tf.addfile(d)
        info = tarfile.TarInfo(name="dir/f.bin")
        info.size = 3
        tf.addfile(info, io.BytesIO(b"abc"))
    df = spark.createDataFrame([(bytearray(buf.getvalue()),)], "tar_bytes binary")
    rows = tar_members(df).collect()
    assert [r.member_name for r in rows] == ["dir/f.bin"]
    assert rows[0].sample_key == "f"


def test_assign_shards_respects_budget_and_determinism(spark):
    rows = [(i, "s0" if i < 40 else "s1", 300) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string, nbytes long")
    out = assign_shards(df, "nbytes", shard_bytes=1000)
    per = (
        out.groupBy("source", "shard_id")
        .agg(F.sum("nbytes").alias("b"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    # exclusive-prefix-sum semantics: a shard's pre-straddle bytes < budget,
    # so with 300-byte items each shard holds ceil(1000/300)=4 items except
    # possibly the last
    for r in per:
        assert r.n <= 4
    # shards are contiguous id ranges within a group
    a = sorted(r for r in out.where("source='s0'").select("shard_id", "doc_id").collect())
    assert a == sorted(a, key=lambda r: (r.shard_id, r.doc_id))
    again = assign_shards(df, "nbytes", shard_bytes=1000).collect()
    assert sorted(map(tuple, again)) == sorted(
        map(tuple, out.collect())
    )


def test_write_tar_shards_round_trip(spark, tmp_path):
    rows = [
        (i, "s%d" % (i % 2), f"doc{i:03d}.txt", ("payload-%d" % i).encode())
        for i in range(20)
    ]
    df = spark.createDataFrame(
        [(a, b, c, bytearray(d)) for a, b, c, d in rows],
        "doc_id long, source string, member_name string, payload binary",
    )
    df = assign_shards(
        df.withColumn("nbytes", F.length("payload").cast("long")),
        "nbytes",
        shard_bytes=40,
    )
    manifest = write_tar_shards(df, str(tmp_path)).collect()
    assert sum(m.n_members for m in manifest) == 20
    # round-trip every shard through stdlib tarfile
    seen = {}
    for m in manifest:
        assert os.path.exists(m.path)
        with tarfile.open(m.path) as tf:
            for mem in tf.getmembers():
                seen[mem.name] = tf.extractfile(mem).read()
    want = {c: d for _, _, c, d in rows}
    assert seen == want


def test_tar_members_gnu_and_pax_long_names(spark):
    """Members with names >100 chars carry their full name in a GNU 'L'
    or PAX 'x' extension header; the walk must APPLY the override, not
    silently truncate the sample key (ADVICE r4). Round-trip against
    stdlib tarfile in both formats."""
    long_dir = "a" * 80 + "/" + "b" * 60
    long_name = f"{long_dir}/sample-000123.jpg"
    for fmt in (tarfile.GNU_FORMAT, tarfile.PAX_FORMAT):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w", format=fmt) as tf:
            info = tarfile.TarInfo(name=long_name)
            info.size = 3
            tf.addfile(info, io.BytesIO(b"jpg"))
            short = tarfile.TarInfo(name="short.txt")
            short.size = 2
            tf.addfile(short, io.BytesIO(b"ok"))
        df = spark.createDataFrame(
            [("s1", bytearray(buf.getvalue()))], "shard string, tar_bytes binary"
        )
        rows = {r.member_name: r for r in tar_members(df).collect()}
        assert long_name in rows, (fmt, sorted(rows))
        assert rows[long_name].sample_key == "sample-000123"
        assert bytes(rows[long_name].payload) == b"jpg"
        assert rows["short.txt"].payload == bytearray(b"ok")


def test_write_tar_shards_creates_out_dir_in_task(spark, tmp_path):
    """out_dir that does not pre-exist is created by the writing task
    itself (cluster-mode contract: driver-side mkdir doesn't exist on
    workers)."""
    out = str(tmp_path / "does" / "not" / "exist")
    df = spark.createDataFrame(
        [("web", 0, "k1.txt", bytearray(b"x"))],
        "source string, shard_id long, member_name string, payload binary",
    )
    manifest = write_tar_shards(df, out).collect()
    assert len(manifest) == 1
    assert os.path.exists(manifest[0].path)
