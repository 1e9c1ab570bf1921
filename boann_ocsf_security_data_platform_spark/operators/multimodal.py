"""Multimodal columns: opaque binary payloads + typed metadata.

Contract: media travels as an opaque ``binary`` column plus a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages so each executor touches only its own
partition's bytes (at 100 TB the payload column stays columnar in Parquet
and is NEVER collected).

What needs a codec and what doesn't:

- ``sniff_image_meta`` — REAL header-level decode (PNG/GIF/BMP/JPEG/WebP
  dimensions) in pure byte parsing; no library needed.
- ``sniff_audio_meta`` / ``audio_sample_pcm`` — REAL container parses:
  WAV/RIFF chunk walk, FLAC STREAMINFO, OGG Vorbis/Opus id header, MP3
  frame header (channels, rate, bit depth, duration where the container
  declares them) and 16-bit PCM waveform sampling; sample DECODING of
  compressed audio needs a codec — same shape, swap the parser body.
- ``sniff_video_meta`` — REAL MP4/ISO-BMFF box walk (brand, movie
  timescale/duration, track count); frame decode needs a demuxer.
- ``byte_histogram`` — real 256-bin byte features (numpy-vectorized).
- ``frame_sample`` — real frame sampling for raw fixed-frame-size media;
  compressed containers swap the slicing body for an ffmpeg demux.
- ``extract_media_meta`` — deterministic md5-derived dimensions standing in
  for a header parse, kept for the cross-engine oracle harness.
- ``decode_image`` — full pixel decode, the ONE step that genuinely needs a
  codec; import-gated on Pillow (not in this container).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
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

    from .dedup import _ensure_parallelism

    return _ensure_parallelism(df).mapInPandas(batches, MEDIA_META_SCHEMA)


IMAGE_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def _sniff_header(b: bytes) -> tuple[str | None, int | None, int | None]:
    """Real container-header parse — no codec library needed. PNG IHDR,
    GIF logical screen descriptor, BMP info header, and JPEG SOFn marker
    walk; anything else → (None, None, None)."""
    import struct

    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
            w, h = struct.unpack(">II", b[16:24])
            return "png", w, h
        if b[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", b[6:10])
            return "gif", w, h
        if b[:2] == b"BM" and len(b) >= 26:
            w, h = struct.unpack("<ii", b[18:26])
            return "bmp", w, abs(h)
        if b[:4] == b"RIFF" and b[8:12] == b"WEBP" and len(b) >= 30:
            cid = b[12:16]
            if cid == b"VP8X":  # extended: 24-bit canvas size minus one
                w = 1 + int.from_bytes(b[24:27], "little")
                h = 1 + int.from_bytes(b[27:30], "little")
                return "webp", w, h
            if cid == b"VP8 " and b[23:26] == b"\x9d\x01\x2a":
                w, h = struct.unpack("<HH", b[26:30])
                return "webp", w & 0x3FFF, h & 0x3FFF
            if cid == b"VP8L" and b[20] == 0x2F:
                bits = int.from_bytes(b[21:25], "little")
                return "webp", 1 + (bits & 0x3FFF), 1 + ((bits >> 14) & 0x3FFF)
            return "webp", None, None
        if b[:2] == b"\xff\xd8":  # JPEG: walk markers to SOF0..SOF15
            i = 2
            while i + 9 < len(b):
                if b[i] != 0xFF:
                    break
                # 0xFF fill/padding bytes may precede any marker — skip runs
                while i + 9 < len(b) and b[i + 1] == 0xFF:
                    i += 1
                marker = b[i + 1]
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                    return "jpeg", w, h
                if marker == 0x01 or 0xD0 <= marker <= 0xD9:
                    # standalone markers (TEM, RSTn, SOI, EOI) carry no
                    # length segment — advance past the marker only
                    i += 2
                    continue
                i += 2 + struct.unpack(">H", b[i + 2 : i + 4])[0]
    except (struct.error, IndexError):
        pass
    return None, None, None


def sniff_image_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Decode real image dimensions from the payload's container header
    (PNG/GIF/BMP/JPEG) — Arrow-batched, pure byte parsing, no PIL needed.
    Unknown formats yield NULL format/width/height rather than failing the
    batch (bad bytes are data, not errors, at 100 TB)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            sniffed = [_sniff_header(bytes(b)) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": [s[0] for s in sniffed],
                    "width": pd.array([s[1] for s in sniffed], dtype="Int32"),
                    "height": pd.array([s[2] for s in sniffed], dtype="Int32"),
                }
            )

    return df.mapInPandas(batches, IMAGE_META_SCHEMA)


BYTE_HIST_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("histogram", ArrayType(LongType())),
    ]
)


def byte_histogram(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """256-bin byte histogram per payload — a real, model-free feature
    vector for binary media (entropy/type signals). numpy ``bincount`` over
    a zero-copy ``frombuffer`` view, so the batch stays vectorized."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hists = [
                np.bincount(
                    np.frombuffer(bytes(b), dtype=np.uint8), minlength=256
                ).astype("int64")
                for b in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "histogram": hists}
            )

    return df.mapInPandas(batches, BYTE_HIST_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def frame_sample(
    df: DataFrame,
    frame_size: int,
    every_n: int = 10,
    payload_col: str = "payload",
) -> DataFrame:
    """Sample every ``every_n``-th frame from RAW (uncompressed,
    fixed-frame-size) media payloads: one input row fans out to one output
    row per sampled frame — the UDTF shape a video pipeline needs.

    Real and tested for raw streams (frame k = bytes
    [k*frame_size, (k+1)*frame_size)); compressed containers need a codec —
    keep this exact mapInPandas shape and swap the slicing body for an
    ffmpeg/av demux (import-gated in that environment). Trailing partial
    frames are dropped, matching raw-video reader conventions.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, b in zip(pdf["media_id"], pdf[payload_col]):
                raw = bytes(b)
                n_frames = len(raw) // frame_size
                for k in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(k)
                    frames.append(raw[k * frame_size : (k + 1) * frame_size])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return df.mapInPandas(batches, FRAME_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("out_w", IntegerType()),
        StructField("out_h", IntegerType()),
        StructField("pixels", BinaryType()),
    ]
)


def resize_raw(
    df: DataFrame,
    width: int,
    height: int,
    factor: int = 2,
    payload_col: str = "payload",
) -> DataFrame:
    """Nearest-neighbor downsample of RAW grayscale bitmaps (width×height
    uint8 payloads) by an integer factor — real pixel math via numpy strided
    slicing, no codec. Payloads of the wrong byte length yield NULL pixels
    (bad bytes are data). Compressed images decode first (PIL-gated
    ``decode_image``), then come through here."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out_w, out_h = width // factor, height // factor
        for pdf in it:
            pixels = []
            for b in pdf[payload_col]:
                raw = bytes(b)
                if len(raw) != width * height:
                    pixels.append(None)
                    continue
                img = np.frombuffer(raw, dtype=np.uint8).reshape(height, width)
                pixels.append(img[::factor, ::factor].tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_w": out_w,
                    "out_h": out_h,
                    "pixels": pixels,
                }
            )

    return df.mapInPandas(batches, RESIZED_SCHEMA)


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Full pixel decode — the one step that genuinely needs a codec
    library. Import-gated on Pillow; header-level metadata needs no codec
    at all (use :func:`sniff_image_meta`)."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "pixel decoding requires Pillow (not in this environment); "
            "header metadata works without it via sniff_image_meta, and the "
            "mapInPandas plumbing to extend is extract_media_meta/"
            "frame_sample."
        ) from e
    raise NotImplementedError(
        "wire PIL.Image.open(BytesIO(payload)) into a mapInPandas body "
        "shaped like frame_sample"
    )  # pragma: no cover


AUDIO_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("n_channels", IntegerType()),
        StructField("sample_rate_hz", IntegerType()),
        StructField("bits_per_sample", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("duration_ms", LongType()),
    ]
)


def _sniff_wav(b: bytes):
    """Real RIFF/WAVE container parse — chunk walk, no codec library.
    Returns (format, channels, sample_rate, bits, n_frames) or Nones."""
    import struct

    none = (None, None, None, None, None)
    try:
        if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
            return none
        i = 12
        fmt = None
        n_frames = None
        while i + 8 <= len(b):
            cid = b[i : i + 4]
            (size,) = struct.unpack("<I", b[i + 4 : i + 8])
            body = b[i + 8 : i + 8 + size]
            if cid == b"fmt " and size >= 16:
                audio_fmt, channels, rate = struct.unpack("<HHI", body[:8])
                block_align, bits = struct.unpack("<HH", body[12:16])
                fmt = (
                    "wav-pcm" if audio_fmt == 1 else f"wav-{audio_fmt}",
                    channels,
                    rate,
                    bits,
                    block_align,
                )
            elif cid == b"data" and fmt is not None:
                block = fmt[4] or 1
                n_frames = size // block
            i += 8 + size + (size & 1)  # chunks pad to even offsets
        if fmt is None:
            return none
        return fmt[0], fmt[1], fmt[2], fmt[3], n_frames
    except (struct.error, IndexError):
        return none


def _sniff_flac(b: bytes):
    """Real FLAC STREAMINFO parse (the mandatory first metadata block):
    sample rate (20 bits), channels (3+1), bits per sample (5+1), total
    samples (36 bits) — pure byte/bit arithmetic, the frames themselves
    stay opaque (decoding needs the codec; the metadata doesn't)."""
    none = (None, None, None, None, None)
    try:
        if b[:4] != b"fLaC" or len(b) < 8 + 18 or (b[4] & 0x7F) != 0:
            return none  # first block must be STREAMINFO (type 0)
        info = b[8:]  # STREAMINFO body
        packed = int.from_bytes(info[10:18], "big")
        rate = (packed >> 44) & 0xFFFFF
        channels = ((packed >> 41) & 0x7) + 1
        bits = ((packed >> 36) & 0x1F) + 1
        total = packed & 0xFFFFFFFFF
        return "flac", channels, rate or None, bits, (total or None)
    except IndexError:
        return none


def _sniff_ogg(b: bytes):
    """Real OGG page walk to the first packet's identification header —
    Vorbis (``\\x01vorbis``: channels, rate) or Opus (``OpusHead``:
    channels, input rate). Container-level only; no codec."""
    import struct

    none = (None, None, None, None, None)
    try:
        if b[:4] != b"OggS" or len(b) < 28:
            return none
        n_segs = b[26]
        body = b[27 + n_segs :]
        if body[:7] == b"\x01vorbis" and len(body) >= 16:
            channels = body[11]
            (rate,) = struct.unpack("<I", body[12:16])
            return "ogg-vorbis", channels, rate or None, None, None
        if body[:8] == b"OpusHead" and len(body) >= 16:
            channels = body[9]
            (rate,) = struct.unpack("<I", body[12:16])
            return "ogg-opus", channels, rate or None, None, None
        return "ogg", None, None, None, None
    except (struct.error, IndexError):
        return none


# MPEG-1 Layer III bitrate (kbps) and sample-rate tables, headers only
_MP3_BITRATE = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
_MP3_RATES = (44100, 48000, 32000)


def _sniff_mp3(b: bytes):
    """Real MP3 frame-header parse (MPEG-1 Layer III): skip a leading
    ID3v2 tag (syncsafe size), then read channels + sample rate from the
    first frame sync. Frame count / duration need a full frame walk (VBR)
    — reported NULL, honestly."""
    none = (None, None, None, None, None)
    try:
        i = 0
        if b[:3] == b"ID3" and len(b) >= 10:
            size = (
                (b[6] & 0x7F) << 21
                | (b[7] & 0x7F) << 14
                | (b[8] & 0x7F) << 7
                | (b[9] & 0x7F)
            )
            i = 10 + size
        if i + 4 > len(b) or b[i] != 0xFF or (b[i + 1] & 0xE0) != 0xE0:
            return none
        version = (b[i + 1] >> 3) & 0x3  # 3 = MPEG-1
        layer = (b[i + 1] >> 1) & 0x3  # 1 = Layer III
        if version != 3 or layer != 1:
            return ("mpeg-audio", None, None, None, None)
        rate_idx = (b[i + 2] >> 2) & 0x3
        if rate_idx > 2:
            return ("mp3", None, None, None, None)
        mode = (b[i + 3] >> 6) & 0x3  # 3 = mono
        return "mp3", (1 if mode == 3 else 2), _MP3_RATES[rate_idx], None, None
    except IndexError:
        return none


def _sniff_audio(b: bytes):
    """Dispatch across the audio container sniffers by magic bytes."""
    if b[:4] == b"RIFF":
        return _sniff_wav(b)
    if b[:4] == b"fLaC":
        return _sniff_flac(b)
    if b[:4] == b"OggS":
        return _sniff_ogg(b)
    return _sniff_mp3(b)


def sniff_audio_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Decode real audio metadata from container headers — WAV/RIFF chunk
    walk, FLAC STREAMINFO, OGG (Vorbis/Opus) identification header, MP3
    frame header — channels, sample rate, bit depth, frame count, duration
    where the container carries them (NULL where it honestly doesn't, e.g.
    VBR MP3 duration). Arrow-batched pure byte parsing, the audio sibling
    of :func:`sniff_image_meta`; unrecognized payloads yield NULLs rather
    than failing the batch. Sample DECODING still needs the codec — these
    parsers read only what the container declares."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [_sniff_audio(bytes(b)) for b in pdf[payload_col]]
            frames = pd.array([r[4] for r in rows], dtype="Int64")
            rates = pd.array([r[2] for r in rows], dtype="Int32")
            dur = pd.array(
                [
                    (r[4] * 1000) // r[2]
                    if r[4] is not None and r[2]
                    else None
                    for r in rows
                ],
                dtype="Int64",
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": [r[0] for r in rows],
                    "n_channels": pd.array([r[1] for r in rows], dtype="Int32"),
                    "sample_rate_hz": rates,
                    "bits_per_sample": pd.array(
                        [r[3] for r in rows], dtype="Int32"
                    ),
                    "n_frames": frames,
                    "duration_ms": dur,
                }
            )

    return df.mapInPandas(batches, AUDIO_META_SCHEMA)


PCM_SAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("samples", ArrayType(IntegerType())),
    ]
)


def audio_sample_pcm(
    df: DataFrame, n_points: int = 16, payload_col: str = "payload"
) -> DataFrame:
    """Evenly-spaced first-channel samples from 16-bit PCM WAV payloads —
    the waveform-fingerprint feature (coarse envelope for dedup /
    silence detection) without any codec. numpy ``frombuffer`` slicing
    over the data chunk; non-PCM-16 payloads yield NULL."""
    import struct

    import numpy as np

    def extract(b: bytes):
        fmt, channels, _rate, bits, _frames = _sniff_wav(b)
        if fmt != "wav-pcm" or bits != 16 or not channels:
            return None
        # find the data chunk again (cheap: header bytes only)
        i = 12
        while i + 8 <= len(b):
            cid = b[i : i + 4]
            (size,) = struct.unpack("<I", b[i + 4 : i + 8])
            if cid == b"data":
                # declared chunk size can exceed the actual bytes on a
                # truncated payload — clamp so frombuffer can't raise
                # (bad bytes are data, not task failures)
                avail = max(0, (len(b) - (i + 8)) // 2)
                pcm = np.frombuffer(
                    b, dtype="<i2", offset=i + 8, count=min(size // 2, avail)
                )
                ch0 = pcm[::channels]
                if len(ch0) == 0:
                    return []
                idx = np.linspace(0, len(ch0) - 1, num=min(n_points, len(ch0)))
                return ch0[idx.astype(np.int64)].astype("int32").tolist()
            i += 8 + size + (size & 1)
        return None

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "samples": [extract(bytes(b)) for b in pdf[payload_col]],
                }
            )

    return df.mapInPandas(batches, PCM_SAMPLE_SCHEMA)


VIDEO_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("brand", StringType()),
        StructField("timescale", LongType()),
        StructField("duration_ms", LongType()),
        StructField("n_tracks", IntegerType()),
    ]
)


def _sniff_mp4(b: bytes):
    """Real ISO-BMFF (MP4/MOV) box walk — ftyp major brand, mvhd
    timescale/duration, trak count. Pure byte parsing, no codec; the
    sample data itself stays opaque. Returns Nones for non-ISO-BMFF."""
    import struct

    none = (None, None, None, None, None)
    try:
        if len(b) < 12 or b[4:8] != b"ftyp":
            return none
        brand = b[8:12].decode("ascii", "replace")
        timescale = duration = None
        n_tracks = 0

        def walk(lo: int, hi: int, depth: int):
            nonlocal timescale, duration, n_tracks
            i = lo
            while i + 8 <= hi and depth < 8:
                (size,) = struct.unpack(">I", b[i : i + 4])
                box = b[i + 4 : i + 8]
                hdr = 8
                if size == 1:  # 64-bit largesize
                    (size,) = struct.unpack(">Q", b[i + 8 : i + 16])
                    hdr = 16
                elif size == 0:  # box extends to end of enclosing scope
                    size = hi - i
                if size < hdr:
                    return
                if box == b"moov":
                    walk(i + hdr, min(i + size, hi), depth + 1)
                elif box == b"trak":
                    n_tracks += 1
                elif box == b"mvhd":
                    ver = b[i + hdr]
                    if ver == 1:
                        timescale, duration = struct.unpack(
                            ">IQ", b[i + hdr + 20 : i + hdr + 32]
                        )
                    else:
                        timescale, duration = struct.unpack(
                            ">II", b[i + hdr + 12 : i + hdr + 20]
                        )
                i += size

        walk(0, len(b), 0)
        dur_ms = (
            (duration * 1000) // timescale
            if duration is not None and timescale
            else None
        )
        return "mp4", brand, timescale, dur_ms, (n_tracks or None)
    except (struct.error, IndexError):
        return none


def sniff_video_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Decode real video container metadata from MP4/ISO-BMFF boxes
    (brand, movie timescale, duration, track count) — the video sibling of
    the image/audio sniffers: Arrow-batched pure byte parsing, NULLs for
    non-ISO-BMFF payloads, sample data never decoded (frame-level work
    needs a demuxer — swap the parser body, keep this mapInPandas shape)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [_sniff_mp4(bytes(b)) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": [r[0] for r in rows],
                    "brand": [r[1] for r in rows],
                    "timescale": pd.array([r[2] for r in rows], dtype="Int64"),
                    "duration_ms": pd.array([r[3] for r in rows], dtype="Int64"),
                    "n_tracks": pd.array([r[4] for r in rows], dtype="Int32"),
                }
            )

    return df.mapInPandas(batches, VIDEO_META_SCHEMA)


# ---------------------------------------------------------------------------
# WebDataset-style tar shard interchange
# ---------------------------------------------------------------------------
#
# Large multimodal training corpora ship as tar shards of sample groups
# (WebDataset convention: files `<key>.<ext>` in one tar, consecutive files
# with the same key form one sample). Reading = a row-local 512-byte header
# walk over the opaque tar payload (codec-free, like the sniffers above);
# writing = deterministic shard assignment via the pack_sequences prefix-sum
# trick + a per-partition stdlib tarfile emit.

TAR_MEMBER_SCHEMA = (
    "sample_key string, member_name string, member_ext string, "
    "payload binary, member_size long"
)


def _pax_path_override(data: bytes) -> str | None:
    """Extract the ``path=`` record from a PAX extended-header payload
    (records are ``"<len> <key>=<value>\\n"`` with <len> counting the whole
    record). Returns None when no path record is present or parsing fails
    (treated as data, not an error)."""
    pos, path = 0, None
    while pos < len(data):
        sp = data.find(b" ", pos)
        if sp < 0:
            break
        try:
            rec_len = int(data[pos:sp])
        except ValueError:
            break
        if rec_len <= 0 or pos + rec_len > len(data):
            break
        rec = data[sp + 1 : pos + rec_len]
        if rec.endswith(b"\n"):
            rec = rec[:-1]  # exactly ONE terminator: a path may itself end in \n
        key, eq, val = rec.partition(b"=")
        if eq and key == b"path":
            path = val.decode("utf-8", "replace")
        pos += rec_len
    return path


def _walk_tar(b: bytes):
    """Yield (name, payload) from an uncompressed tar byte string — plain
    512-byte ustar header walk; bad bytes end the walk (data, not errors).
    Skips non-regular members (dirs, links). GNU ``L`` long-name and PAX
    ``x`` extended headers are APPLIED (the name they carry overrides the
    truncated 100-char header field of the following member — silently
    truncating would corrupt WebDataset sample keys); PAX ``g`` global
    headers are skipped."""
    pos = 0
    pending_name: str | None = None  # from a preceding L/x header
    while pos + 512 <= len(b):
        hdr = b[pos : pos + 512]
        if hdr == b"\x00" * 512:
            break
        name = hdr[0:100].split(b"\x00", 1)[0].decode("utf-8", "replace")
        size_field = hdr[124:136].split(b"\x00", 1)[0].strip()
        try:
            size = int(size_field or b"0", 8)
        except ValueError:
            break
        typeflag = hdr[156:157]
        data = b[pos + 512 : pos + 512 + size]
        if len(data) < size:
            break  # truncated archive: stop, keep what parsed
        if typeflag == b"L":
            # GNU long name: payload IS the next member's full name
            pending_name = data.split(b"\x00", 1)[0].decode("utf-8", "replace")
        elif typeflag == b"x":
            # PAX extended header: may carry a path= override for the
            # next member
            override = _pax_path_override(data)
            if override is not None:
                pending_name = override
        elif typeflag == b"K":
            pass  # GNU long LINK name: applies to linkname, keep pending
        elif typeflag == b"g":
            pass  # PAX global header: no per-member name override
        else:
            if pending_name is not None:
                name = pending_name  # full name; no prefix applies
            else:
                prefix = hdr[345:500].split(b"\x00", 1)[0].decode(
                    "utf-8", "replace"
                )
                if prefix:
                    name = f"{prefix}/{name}"
            if typeflag in (b"0", b"\x00") and name:
                yield name, data
            pending_name = None  # any real member consumes the override
        pos += 512 + ((size + 511) // 512) * 512


def tar_members(
    df: DataFrame, payload_col: str = "tar_bytes", keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Explode tar-shard payloads into WebDataset sample members:
    one row per regular tar member with ``sample_key`` (member name minus
    its last extension — the WebDataset grouping key), extension, payload
    and size. Row-local Arrow ``mapInPandas`` — shards parse where they
    sit, nothing is collected; at 100 TB parallelism = shard count."""
    schema = TAR_MEMBER_SCHEMA
    if keep_cols:
        src_schema = df.select(*keep_cols).schema
        schema = (
            ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in src_schema)
            + ", "
            + TAR_MEMBER_SCHEMA
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                raw = row[payload_col]
                if raw is None:
                    continue
                for name, data in _walk_tar(bytes(raw)):
                    base = name.rsplit("/", 1)[-1]
                    key, dot, ext = base.rpartition(".")
                    rec = {c: row[c] for c in keep_cols}
                    rec.update(
                        sample_key=key if dot else base,
                        member_name=name,
                        member_ext=ext if dot else "",
                        payload=data,
                        member_size=len(data),
                    )
                    rows.append(rec)
            cols = [*keep_cols, "sample_key", "member_name", "member_ext",
                    "payload", "member_size"]
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(batches, schema)


def assign_shards(
    df: DataFrame,
    size_col: str,
    group_col: str = "source",
    id_col: str = "doc_id",
    shard_bytes: int = 1 << 20,
) -> DataFrame:
    """Deterministic WebDataset shard assignment: within each group
    (shards never mix groups — the usual per-source/per-language layout),
    walk samples in id order and set ``shard_id`` = running byte offset ÷
    ``shard_bytes`` — the pack_sequences exclusive-prefix-sum trick, one
    window scan, groups packed independently in parallel. The same
    (group, id, sizes) always yields the same shard layout on any engine
    or cluster size."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum(size_col).over(w), F.lit(0)).cast("long")
    return df.withColumn(
        "shard_id", (offset / F.lit(shard_bytes)).cast("long")
    )


def write_tar_shards(
    df: DataFrame,
    out_dir: str,
    group_col: str = "source",
    shard_col: str = "shard_id",
    name_col: str = "member_name",
    payload_col: str = "payload",
) -> DataFrame:
    """Emit one uncompressed tar per (group, shard) under ``out_dir``
    (``<group>-<shard>.tar``, members in deterministic name order) and
    return a manifest DataFrame (group, shard, path, n_members, n_bytes).

    Executor-side: rows repartition by (group, shard) so each task owns
    whole shards and writes them with stdlib tarfile — the driver sees
    only the kilobyte manifest. Shard size is bounded by assign_shards,
    so per-task memory is bounded regardless of corpus size.

    Filesystem contract: shards are written with plain ``open()`` inside
    executor tasks, so ``out_dir`` must be a path every executor can
    write and readers can later see — a SHARED filesystem (NFS/FUSE
    mount, e.g. a gcsfuse/s3-mounted bucket) on a multi-node cluster, or
    any local path in local mode. Each task makedirs ``out_dir`` itself
    (driver-side creation doesn't exist on workers). For direct
    object-store URIs without a mount, write members through a
    Hadoop-FS-aware path instead (df.write per shard); the manifest
    contract is unchanged."""
    import io
    import os
    import tarfile

    schema = "group string, shard long, path string, n_members long, n_bytes long"

    def emit(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[tuple, list] = {}
        for pdf in it:
            for _, row in pdf.iterrows():
                acc.setdefault(
                    (str(row[group_col]), int(row[shard_col])), []
                ).append((str(row[name_col]), bytes(row[payload_col])))
        out = []
        if acc:
            # out_dir may only exist on the driver (cmd_corpus_pack mkdirs
            # there); in cluster mode each writing task must create it on
            # its own node/mount
            os.makedirs(out_dir, exist_ok=True)
        for (grp, shard), members in acc.items():
            path = os.path.join(out_dir, f"{grp}-{shard:05d}.tar")
            buf = io.BytesIO()
            with tarfile.open(fileobj=buf, mode="w") as tf:
                for name, data in sorted(members):
                    info = tarfile.TarInfo(name=name)
                    info.size = len(data)
                    info.mtime = 0  # deterministic bytes
                    tf.addfile(info, io.BytesIO(data))
            payload = buf.getvalue()
            with open(path, "wb") as fh:
                fh.write(payload)
            out.append(
                {
                    "group": grp,
                    "shard": shard,
                    "path": path,
                    "n_members": len(members),
                    "n_bytes": len(payload),
                }
            )
        yield pd.DataFrame(
            out, columns=["group", "shard", "path", "n_members", "n_bytes"]
        )

    return (
        df.repartition(F.col(group_col), F.col(shard_col))
        .mapInPandas(emit, schema)
    )


PCM_ENERGY_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_frames", LongType()),
        StructField("sum_samples", LongType()),
        StructField("sum_abs", LongType()),
        StructField("min_sample", IntegerType()),
        StructField("max_sample", IntegerType()),
    ]
)


def pcm_energy(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Whole-chunk 16-bit PCM energy statistics per payload: frame count,
    signed sum, absolute sum (the loudness/silence feature), min/max —
    the full-decode companion to :func:`audio_sample_pcm`'s sampled
    envelope, and deliberately SAMPLING-FREE so every statistic is an
    exact integer over all frames (reproducible across engines — the
    evenly-spaced sampler's float index arithmetic is not). numpy
    ``frombuffer`` over the data chunk; non-PCM-16 payloads yield NULLs.
    """
    import struct

    import numpy as np

    def extract(b: bytes):
        fmt, channels, _rate, bits, _frames = _sniff_wav(b)
        if fmt != "wav-pcm" or bits != 16 or not channels:
            return (None, None, None, None, None)
        i = 12
        while i + 8 <= len(b):
            cid = b[i : i + 4]
            (size,) = struct.unpack("<I", b[i + 4 : i + 8])
            if cid == b"data":
                avail = max(0, (len(b) - (i + 8)) // 2)
                pcm = np.frombuffer(
                    b, dtype="<i2", offset=i + 8, count=min(size // 2, avail)
                ).astype(np.int64)
                if len(pcm) == 0:
                    return (0, 0, 0, None, None)
                return (
                    len(pcm),
                    int(pcm.sum()),
                    int(np.abs(pcm).sum()),
                    int(pcm.min()),
                    int(pcm.max()),
                )
            i += 8 + size + (size & 1)
        return (None, None, None, None, None)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [extract(bytes(b)) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_frames": pd.array([r[0] for r in rows], dtype="Int64"),
                    "sum_samples": pd.array(
                        [r[1] for r in rows], dtype="Int64"
                    ),
                    "sum_abs": pd.array([r[2] for r in rows], dtype="Int64"),
                    "min_sample": pd.array(
                        [r[3] for r in rows], dtype="Int32"
                    ),
                    "max_sample": pd.array(
                        [r[4] for r in rows], dtype="Int32"
                    ),
                }
            )

    return df.mapInPandas(batches, PCM_ENERGY_SCHEMA)


PNG_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("bit_depth", IntegerType()),
        StructField("color_type", IntegerType()),
        StructField("crc_ok", BooleanType()),
    ]
)


def _parse_png(b: bytes):
    """Signature + IHDR chunk walk WITH CRC verification — strictly
    deeper than :func:`_sniff_header`'s PNG branch (which trusts the
    header): the stored IHDR CRC-32 is recomputed over type+data
    (PNG CRC == zlib CRC-32, ISO-HDLC) and compared, so a corrupted or
    hand-forged header reads as crc_ok=False instead of silently
    yielding dimensions."""
    import struct
    import zlib

    try:
        if b[:8] != b"\x89PNG\r\n\x1a\n":
            return None
        length = struct.unpack(">I", b[8:12])[0]
        ctype = b[12:16]
        if ctype != b"IHDR" or length != 13:
            return None
        data = b[16 : 16 + length]
        stored_crc = struct.unpack(">I", b[16 + length : 20 + length])[0]
        w, h = struct.unpack(">II", data[0:8])
        bit_depth, color_type = data[8], data[9]
        ok = zlib.crc32(ctype + data) & 0xFFFFFFFF == stored_crc
        return w, h, bit_depth, color_type, ok
    except (struct.error, IndexError):
        return None


def parse_png_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """PNG IHDR metadata with CRC verification, Arrow-batched — the
    trust-but-verify image sibling of :func:`sniff_audio_meta`: width,
    height, bit depth, color type, and whether the stored IHDR CRC-32
    matches a recomputation over the chunk bytes. Non-PNG payloads yield
    NULLs (bad bytes are data, not errors, at 100 TB)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [_parse_png(bytes(b)) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": ["png" if r else None for r in rows],
                    "width": pd.array(
                        [r[0] if r else None for r in rows], dtype="Int32"
                    ),
                    "height": pd.array(
                        [r[1] if r else None for r in rows], dtype="Int32"
                    ),
                    "bit_depth": pd.array(
                        [r[2] if r else None for r in rows], dtype="Int32"
                    ),
                    "color_type": pd.array(
                        [r[3] if r else None for r in rows], dtype="Int32"
                    ),
                    "crc_ok": [r[4] if r else None for r in rows],
                }
            )

    return df.mapInPandas(batches, PNG_META_SCHEMA)


BMP_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("bits_per_pixel", IntegerType()),
        StructField("row_stride", IntegerType()),
        StructField("top_down", BooleanType()),
        StructField("size_ok", BooleanType()),
    ]
)


def _parse_bmp(b: bytes):
    """BITMAPFILEHEADER + BITMAPINFOHEADER walk with the 4-byte row-stride
    padding arithmetic VERIFIED against the actual payload length: stride
    = ((bpp·width + 31) // 32) · 4, and the pixel array declared by the
    header (offset + stride·|height|) must fit inside the buffer — a
    truncated or forged BMP reads size_ok=False instead of silently
    yielding dimensions. Negative biHeight means top-down row order."""
    import struct

    try:
        if b[:2] != b"BM" or len(b) < 54:
            return None
        pixel_off = struct.unpack("<I", b[10:14])[0]
        hdr_size = struct.unpack("<I", b[14:18])[0]
        if hdr_size < 40:
            return None
        w, h = struct.unpack("<ii", b[18:26])
        planes, bpp = struct.unpack("<HH", b[26:30])
        if w <= 0 or h == 0 or planes != 1 or bpp == 0:
            return None
        stride = ((bpp * w + 31) // 32) * 4
        size_ok = pixel_off + stride * abs(h) <= len(b)
        return w, abs(h), bpp, stride, h < 0, size_ok
    except (struct.error, IndexError):
        return None


def parse_bmp_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """BMP header metadata with stride/size verification, Arrow-batched —
    the uncompressed-raster sibling of :func:`parse_png_meta`: width,
    height, bits per pixel, the padded row stride, top-down flag, and
    whether the declared pixel array actually fits the payload. Non-BMP
    payloads yield NULLs (bad bytes are data, not errors, at 100 TB)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [_parse_bmp(bytes(b)) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": ["bmp" if r else None for r in rows],
                    "width": pd.array(
                        [r[0] if r else None for r in rows], dtype="Int32"
                    ),
                    "height": pd.array(
                        [r[1] if r else None for r in rows], dtype="Int32"
                    ),
                    "bits_per_pixel": pd.array(
                        [r[2] if r else None for r in rows], dtype="Int32"
                    ),
                    "row_stride": pd.array(
                        [r[3] if r else None for r in rows], dtype="Int32"
                    ),
                    "top_down": [r[4] if r else None for r in rows],
                    "size_ok": [r[5] if r else None for r in rows],
                }
            )

    return df.mapInPandas(batches, BMP_META_SCHEMA)


GIF_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("gct_colors", IntegerType()),
        StructField("color_resolution", IntegerType()),
        StructField("size_ok", BooleanType()),
    ]
)


def _parse_gif(b: bytes):
    """GIF89a/87a logical-screen-descriptor walk with BIT-FIELD decoding:
    the packed byte carries the global-color-table flag (bit 7), color
    resolution (bits 6-4, stored as depth-1) and the GCT size exponent
    (bits 2-0, table = 3·2^(N+1) bytes) — the declared table must fit
    inside the buffer before the trailer or size_ok reads False."""
    import struct

    try:
        if b[:6] not in (b"GIF89a", b"GIF87a") or len(b) < 13:
            return None
        w, h = struct.unpack("<HH", b[6:10])
        packed = b[10]
        has_gct = (packed >> 7) & 1
        color_res = ((packed >> 4) & 0x7) + 1
        n_exp = packed & 0x7
        gct_colors = (2 ** (n_exp + 1)) if has_gct else 0
        gct_bytes = 3 * gct_colors
        size_ok = 13 + gct_bytes <= len(b)
        return w, h, gct_colors, color_res, size_ok
    except (struct.error, IndexError):
        return None


def parse_gif_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """GIF logical-screen metadata with bit-field decoding and
    table-fits verification, Arrow-batched — the palette-indexed sibling
    of :func:`parse_bmp_meta`. Non-GIF payloads yield NULLs (bad bytes
    are data, not errors, at 100 TB)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [_parse_gif(bytes(b)) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": ["gif" if r else None for r in rows],
                    "width": pd.array(
                        [r[0] if r else None for r in rows], dtype="Int32"
                    ),
                    "height": pd.array(
                        [r[1] if r else None for r in rows], dtype="Int32"
                    ),
                    "gct_colors": pd.array(
                        [r[2] if r else None for r in rows], dtype="Int32"
                    ),
                    "color_resolution": pd.array(
                        [r[3] if r else None for r in rows], dtype="Int32"
                    ),
                    "size_ok": [r[4] if r else None for r in rows],
                }
            )

    return df.mapInPandas(batches, GIF_META_SCHEMA)


ICO_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("n_images", IntegerType()),
        StructField("max_width", IntegerType()),
        StructField("max_height", IntegerType()),
        StructField("total_image_bytes", LongType()),
        StructField("offsets_ok", BooleanType()),
        StructField("size_ok", BooleanType()),
    ]
)


def _parse_ico(b: bytes):
    """ICONDIR + ICONDIRENTRY walk (the multi-image container Windows
    favicons use): validates reserved=0/type=1, decodes every 16-byte
    directory entry — including the width/height 0-means-256 convention
    — and verifies the payload layout the directory DECLARES: images
    must be contiguous starting right after the directory (offsets_ok)
    and the last image must end exactly at the buffer end (size_ok)."""
    import struct

    try:
        if len(b) < 6:
            return None
        res, typ, cnt = struct.unpack("<HHH", b[:6])
        if res != 0 or typ != 1 or cnt == 0:
            return None
        dir_end = 6 + 16 * cnt
        if len(b) < dir_end:
            return None
        widths, heights, sizes, offsets = [], [], [], []
        for i in range(cnt):
            o = 6 + 16 * i
            w8, h8, _cc, _r8, _planes, _bpp, size, ofs = struct.unpack(
                "<BBBBHHII", b[o : o + 16]
            )
            widths.append(256 if w8 == 0 else w8)
            heights.append(256 if h8 == 0 else h8)
            sizes.append(size)
            offsets.append(ofs)
        offsets_ok = offsets[0] == dir_end and all(
            offsets[i] == offsets[i - 1] + sizes[i - 1]
            for i in range(1, cnt)
        )
        size_ok = offsets[-1] + sizes[-1] == len(b)
        return (
            cnt,
            max(widths),
            max(heights),
            sum(sizes),
            offsets_ok,
            size_ok,
        )
    except (struct.error, IndexError):
        return None


def parse_ico_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """ICO directory metadata with contiguous-layout verification,
    Arrow-batched — the multi-image container sibling of
    :func:`parse_bmp_meta`/:func:`parse_gif_meta` (a directory of
    images instead of one raster, so the parser checks the DECLARED
    offsets against the actual buffer). Non-ICO payloads yield NULLs
    (bad bytes are data, not errors, at 100 TB)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [_parse_ico(bytes(b)) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": ["ico" if r else None for r in rows],
                    "n_images": pd.array(
                        [r[0] if r else None for r in rows], dtype="Int32"
                    ),
                    "max_width": pd.array(
                        [r[1] if r else None for r in rows], dtype="Int32"
                    ),
                    "max_height": pd.array(
                        [r[2] if r else None for r in rows], dtype="Int32"
                    ),
                    "total_image_bytes": pd.array(
                        [r[3] if r else None for r in rows], dtype="Int64"
                    ),
                    "offsets_ok": [r[4] if r else None for r in rows],
                    "size_ok": [r[5] if r else None for r in rows],
                }
            )

    return df.mapInPandas(batches, ICO_META_SCHEMA)
