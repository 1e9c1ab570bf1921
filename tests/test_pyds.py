"""Spark 4 Python DataSource: the `ocsf_findings` format (partition-per-
file parallel verbatim array split with per-file error isolation)."""

import json

import pytest
from pyspark.sql import functions as F

from boann_ocsf_security_data_platform_spark.sources import (
    register_python_sources,
    split_json_array_verbatim,
)

WEIRD = (
    '[ {"z_last": 1, "a_first": {"nested":  "kept  spaces"}, "unknown_field": [1,2]} ,'
    '\n  {"b": "two"}]'
)


def test_split_verbatim_preserves_tokens():
    parts = split_json_array_verbatim(WEIRD)
    assert parts == [
        '{"z_last": 1, "a_first": {"nested":  "kept  spaces"}, "unknown_field": [1,2]}',
        '{"b": "two"}',
    ]
    # each slice is literally a substring of the input — no re-serialization
    for p in parts:
        assert p in WEIRD
    assert split_json_array_verbatim("  []  ") == []
    with pytest.raises(ValueError):
        split_json_array_verbatim('{"not": "an array"}')
    with pytest.raises(ValueError):
        split_json_array_verbatim('[{"unterminated": 1}')


def test_ocsf_findings_datasource(spark, tmp_path):
    register_python_sources(spark)
    (tmp_path / "a.ocsf.json").write_text(WEIRD)
    (tmp_path / "b.ocsf.json").write_text(json.dumps([{"f": i} for i in range(3)]))
    (tmp_path / "bad.ocsf.json").write_text("{definitely not an array")
    (tmp_path / "ignored.txt").write_text("x")

    df = spark.read.format("ocsf_findings").load(str(tmp_path))
    rows = df.collect()
    by_file = {}
    for r in rows:
        by_file.setdefault(r["source_file"].rsplit("/", 1)[-1], []).append(r)

    assert set(by_file) == {"a.ocsf.json", "b.ocsf.json", "bad.ocsf.json"}
    # verbatim slice (field order + unknown fields + inner spacing intact)
    assert by_file["a.ocsf.json"][0]["raw_json"].startswith('{"z_last": 1,')
    assert "kept  spaces" in by_file["a.ocsf.json"][0]["raw_json"]
    assert len(by_file["b.ocsf.json"]) == 3
    # malformed file isolated as one error row, not a scan failure
    bad = by_file["bad.ocsf.json"]
    assert len(bad) == 1 and bad[0]["raw_json"] is None
    assert bad[0]["_error"].startswith("ValueError")
    # one partition per file -> parallel parse
    assert df.rdd.getNumPartitions() == 3
    # and the rows feed the normal landing contract
    good = df.filter(F.col("_error").isNull())
    assert good.count() == 5


def test_streaming_reader_tails_directory(spark, tmp_path):
    """The ocsf_findings source also streams: each micro-batch picks up
    files named after the lexicographic high-water mark, exactly once."""
    from boann_ocsf_security_data_platform_spark.sources.pyds import (
        register_python_sources,
    )

    register_python_sources(spark)
    src = tmp_path / "stream_in"
    src.mkdir()
    (src / "2024-01-01T00.ocsf.json").write_text('[{"a": 1}, {"a": 2}]')

    stream = spark.readStream.format("ocsf_findings").load(str(src))
    q = (
        stream.writeStream.format("memory")
        .queryName("ocsf_tail")
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT count(*) FROM ocsf_tail").collect()[0][0] == 2
        # a later-named file lands -> next batch ingests ONLY the new one
        (src / "2024-01-01T01.ocsf.json").write_text('[{"a": 3}]')
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT source_file, finding_index, raw_json FROM ocsf_tail"
        ).collect()
        assert len(rows) == 3  # no re-reads of the first file
        assert sorted(r.raw_json for r in rows) == [
            '{"a": 1}', '{"a": 2}', '{"a": 3}'
        ]
    finally:
        q.stop()
