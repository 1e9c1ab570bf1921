"""Hashing / normalization Column expressions shared across the engine.

All JVM-side (whole-stage codegen), no UDFs. ``hash64`` is deliberately
**engine-portable**: it is definable with identical results in Spark, DuckDB
and PostgreSQL (md5 → first 15 hex chars → 60-bit integer), which lets every
hash-dependent operator (MinHash, SimHash, LSH banding) be verified against
a DuckDB oracle bit-for-bit. Spark's native ``xxhash64`` would be faster per
call but is not reproducible outside Spark; at 100 TB the md5 cost is still
scan-dominated, and swapping to ``xxhash64`` is a one-line change once the
oracle no longer matters.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sha256_hex(col: Column | str) -> Column:
    """Lowercase hex SHA-256 — bit-exact with Python's
    ``hashlib.sha256(s.encode('utf-8')).hexdigest()`` used by the reference
    UID generator (scripts/enrichments/finding_uid_generator.py:288-298)."""
    return F.sha2(F.col(col) if isinstance(col, str) else col, 256)


def normalize_name(col: Column | str) -> Column:
    """Reference name normalization (finding_uid_generator.py:147-167):
    lowercase, ``[^a-z0-9]+`` → ``-``, strip leading/trailing hyphens."""
    c = F.col(col) if isinstance(col, str) else col
    lowered = F.lower(c)
    hyphened = F.regexp_replace(lowered, "[^a-z0-9]+", "-")
    return F.regexp_replace(hyphened, "^-+|-+$", "")


def normalize_text(col: Column | str) -> Column:
    """Canonical text form for exact dedup / fingerprinting:
    lowercase, collapse all whitespace runs to one space, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def hash64(col: Column | str) -> Column:
    """Portable 60-bit integer hash: ``int(md5(s)[:15], 16)``.

    DuckDB equivalent (see DUCKDB_HASH64_SQL) produces identical values,
    making LSH/MinHash operators oracle-verifiable across engines.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def hash64_fast(col: Column | str) -> Column:
    """Production 60-bit hash: Spark-native ``xxhash64`` masked to 60 bits
    (the mask keeps the weighted-XOR shingle combination overflow-free
    under ANSI mode, same bound as :func:`hash64`).

    NOT engine-portable — use for throughput once cross-engine oracle
    verification isn't needed; every dedup operator takes
    ``hash_fn=hash64_fast`` to switch. Identical algorithmic guarantees
    (uniformity, per-shingle independence); the LSH candidate set differs
    only as any hash-family member's does.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(c).bitwiseAND(F.lit((1 << 60) - 1))


# DuckDB-side rendering of hash64(expr) — format with the SQL expression text.
DUCKDB_HASH64_SQL = "CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"
