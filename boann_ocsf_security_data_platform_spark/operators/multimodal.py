"""Multimodal columns: opaque binary payloads + typed metadata.

Contract: media travels as an opaque ``binary`` column plus a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages so each executor touches only its own
partition's bytes (at 100 TB the payload column stays columnar in Parquet
and is NEVER collected).

The actual codec step is environment-dependent (PIL / ffmpeg are not in
this container), so decoding is stubbed: ``decode_image`` raises
NotImplementedError unless a decoder import succeeds, while
``extract_media_meta`` computes a deterministic fake "decode" (md5-derived
dimensions) that exercises the full Spark plumbing — schema, batching,
partitioning — and is reproducible for the oracle harness.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("content_md5", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def attach_binary_payload(
    df: DataFrame, source_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Test-harness payload: utf-8 bytes of a text column standing in for
    real image/audio bytes (schema-identical to production ingestion)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(source_col), "utf-8").cast(BinaryType()).alias("payload"),
    )


def extract_media_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Arrow-batched metadata extraction over binary payloads.

    The width/height are a deterministic function of the payload's md5
    (stand-in for a real header parse): width = 32 + (first md5 byte % 64),
    height = 32 + (second md5 byte % 64). Replace the body with a real
    header sniff (PIL.Image.open(BytesIO(b)).size) in a decoder-equipped
    environment; the plumbing — schema, batch shape, partition locality —
    is exactly what production uses.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            digests = [hashlib.md5(bytes(b)).hexdigest() for b in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": payloads.map(len).astype("int64"),
                    "content_md5": digests,
                    "width": [32 + (int(d[0:2], 16) % 64) for d in digests],
                    "height": [32 + (int(d[2:4], 16) % 64) for d in digests],
                }
            )

    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target)
    return df.mapInPandas(batches, MEDIA_META_SCHEMA)


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Real image decode — requires a decoder library at runtime."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "image decoding requires Pillow; this environment ships none. "
            "The Spark plumbing is extract_media_meta — swap its batch body "
            "for PIL.Image.open(BytesIO(payload))."
        ) from e
    raise NotImplementedError("wire the PIL decode into extract_media_meta's body")


def frame_sample(
    df: DataFrame, payload_col: str = "payload", every_n: int = 10
) -> DataFrame:
    """Video frame sampling stub — same contract as decode_image."""
    raise NotImplementedError(
        "frame sampling requires ffmpeg/av; plumbing pattern: mapInPandas "
        "yielding one row per sampled frame with (media_id, frame_idx, frame_png)."
    )
