"""Custom Python DataSource (Spark 4 DataSource API): `ocsf_findings`.

The reference ingests `*.ocsf.json` files — each a JSON ARRAY of finding
objects — one file at a time (scripts/ingest_raw_ocsf_findings.py). The
engine's primary path does this with a distributed text read +
`from_json(array<string>)` split (sources/ocsf.py). This module provides
the same contract through Spark's Python DataSource extension point:

- one input partition PER FILE → files parse in parallel across executors,
  and a single huge file doesn't serialize the whole directory;
- VERBATIM fidelity: elements are sliced out of the original text by
  tracking `json.JSONDecoder.raw_decode` end offsets, so field order,
  unknown fields, and intra-object whitespace survive byte-for-byte
  (same guarantee the `from_json` path provides, stronger than a
  parse→re-serialize round trip);
- malformed files yield one row with `raw_json = NULL` and the error in
  `_error` instead of failing the scan (the monitor's isolate-the-bad-file
  behavior).

Registration is per-session: ``register_python_sources(spark)`` then
``spark.read.format("ocsf_findings").load(dir_or_file)``.

Scope: the reader lists files with POSIX APIs (executors see the same
filesystem in local/NFS deployments); object stores go through the
engine's primary Hadoop-FS path instead. Streaming: the same source also
exposes a SimpleDataSourceStreamReader (``spark.readStream.format(
"ocsf_findings")``) that tails the directory by lexicographic filename
high-water mark — producers must write monotonically-named files
(timestamped names, the standard landing convention). The simple-reader
variant prefetches on the driver, which fits this control-plane ingest
volume; the bulk path remains `streaming/monitor.py`.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


def split_json_array_verbatim(text: str) -> list[str]:
    """Slice the elements of a JSON array out of ``text`` verbatim.

    Walks the array with ``raw_decode`` to find element boundaries, then
    returns the ORIGINAL substrings (trimmed of inter-element whitespace),
    never a re-serialization. Raises ValueError on non-array / malformed
    input.
    """
    dec = json.JSONDecoder()
    i = 0
    n = len(text)
    while i < n and text[i].isspace():
        i += 1
    if i >= n or text[i] != "[":
        raise ValueError("not a JSON array")
    i += 1
    out: list[str] = []
    while True:
        while i < n and text[i] in " \t\r\n,":
            i += 1
        if i < n and text[i] == "]":
            return out
        if i >= n:
            raise ValueError("unterminated JSON array")
        _, end = dec.raw_decode(text, i)
        out.append(text[i:end])
        i = end


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class OCSFFindingsReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("ocsf_findings requires a path")
        self._path = path
        self._suffix = options.get("suffix", ".ocsf.json")

    def partitions(self) -> list[InputPartition]:
        if os.path.isdir(self._path):
            files = sorted(
                e.path
                for e in os.scandir(self._path)
                if e.is_file() and e.name.endswith(self._suffix)
            )
        else:
            files = [self._path]
        # one partition per file: per-file parallelism AND per-file error
        # isolation; an empty dir yields an empty scan, not a failure
        return [_FilePartition(p) for p in files]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        try:
            with open(partition.path, encoding="utf-8") as fh:
                text = fh.read()
            for idx, raw in enumerate(split_json_array_verbatim(text)):
                yield (partition.path, idx, raw, None)
        except (OSError, ValueError, json.JSONDecodeError) as exc:
            yield (partition.path, None, None, f"{type(exc).__name__}: {exc}")


def _read_findings_file(path: str) -> Iterator[tuple]:
    try:
        with open(path, encoding="utf-8") as fh:
            text = fh.read()
        for idx, raw in enumerate(split_json_array_verbatim(text)):
            yield (path, idx, raw, None)
    except (OSError, ValueError, json.JSONDecodeError) as exc:
        yield (path, None, None, f"{type(exc).__name__}: {exc}")


class OCSFFindingsStreamReader(SimpleDataSourceStreamReader):
    """Exactly-once directory tail keyed by lexicographic filename
    high-water mark: the offset is {"last": <name>}, each micro-batch
    reads every file sorted-after the mark, and replay between committed
    offsets re-reads the same name range — deterministic because
    producers write monotonically-named (timestamped) files and files are
    immutable once landed."""

    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("ocsf_findings requires a path")
        self._dir = path
        self._suffix = options.get("suffix", ".ocsf.json")

    def _files_after(self, last: str, upto: str | None = None) -> list[str]:
        names = sorted(
            e.name
            for e in os.scandir(self._dir)
            if e.is_file() and e.name.endswith(self._suffix)
        )
        return [
            n for n in names if n > last and (upto is None or n <= upto)
        ]

    def initialOffset(self) -> dict:
        return {"last": ""}

    def read(self, start: dict):
        names = self._files_after(start["last"])
        if not names:
            return iter([]), start
        rows = [
            row
            for n in names
            for row in _read_findings_file(os.path.join(self._dir, n))
        ]
        return iter(rows), {"last": names[-1]}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            row
            for n in self._files_after(start["last"], end["last"])
            for row in _read_findings_file(os.path.join(self._dir, n))
        )

    def commit(self, end: dict) -> None:
        pass  # the filename mark is self-contained; nothing to clean up


class OCSFFindingsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "ocsf_findings"

    def schema(self) -> str:
        return (
            "source_file string, finding_index bigint, "
            "raw_json string, _error string"
        )

    def reader(self, schema) -> OCSFFindingsReader:
        return OCSFFindingsReader(self.options)

    def simpleStreamReader(self, schema) -> OCSFFindingsStreamReader:
        return OCSFFindingsStreamReader(self.options)


def register_python_sources(spark) -> None:
    """Register the engine's Python DataSources on a session (idempotent)."""
    spark.dataSource.register(OCSFFindingsDataSource)
