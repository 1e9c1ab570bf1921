"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the whole point at 100 TB):
- exact dedup is one hash-aggregate — Spark's partial/final aggregation
  means map-side combine before the shuffle, so the shuffle carries one row
  per distinct key per mapper, not per input row;
- near-dup NEVER does an O(n²) comparison: MinHash-LSH banding turns it into
  an equi-join on (band_idx, band_hash) — shuffle-partitionable, AQE handles
  skewed buckets, and pathological buckets can be capped;
- all hashes use the engine-portable ``hash64`` (md5-based) so every stage
  is verifiable against a DuckDB oracle; swap to ``xxhash64`` for ~2-3×
  cheaper hashing once cross-engine verification isn't needed.

MinHash permutations use the XOR scheme: ``sig_j = min_s(hash64(s) XOR C_j)``
with fixed 60-bit constants C_j — one md5 per shingle regardless of the
signature width, and no modular arithmetic that could overflow 64-bit
integers in either engine.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hash_fns import hash64, normalize_text


def _xor_constant(j: int) -> int:
    """Deterministic 60-bit MinHash permutation constant (same formula the
    DuckDB oracle uses)."""
    return int(hashlib.md5(f"minhash-perm-{j}".encode()).hexdigest()[:15], 16)


def _ensure_parallelism(df: DataFrame) -> DataFrame:
    """Spread CPU-bound per-row work (shingling, hashing) across cores.

    A small parquet input arrives as one split, serializing the whole
    map stage on one task. When the plan has fewer partitions than the
    cluster's default parallelism, repartition up; on real at-scale inputs
    (thousands of splits) this is a no-op so no gratuitous shuffle."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup on the canonicalized-text fingerprint: one surviving
    (minimum) id per distinct content hash + the duplicate count.
    Single hash-aggregate, no join."""
    return (
        df.select(
            F.md5(normalize_text(F.col(text_col))).alias("content_hash"),
            F.col(id_col),
        )
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def with_shingles(
    df: DataFrame, text_col: str = "text", k: int = 3, col_name: str = "shingles"
) -> DataFrame:
    """Distinct word k-gram shingles of the normalized text (row-local,
    shuffle-free). Documents with fewer than k words get their whole text
    as the single shingle so they still participate in dedup."""
    words = F.filter(F.split(normalize_text(F.col(text_col)), " "), lambda w: w != "")
    n = F.size(words)
    grams = F.transform(
        F.sequence(F.lit(1), n - k + 1),
        lambda i: F.array_join(F.slice(words, i, k), " "),
    )
    shingles = F.when(n >= k, grams).otherwise(F.array(F.array_join(words, " ")))
    return df.withColumn(col_name, F.array_distinct(shingles))


def minhash_signature(
    df: DataFrame,
    shingle_col: str = "shingles",
    n_hashes: int = 16,
    col_name: str = "minhash",
) -> DataFrame:
    """MinHash signature (array<long>, length n_hashes) over the shingle
    set. One md5 per shingle; permutations are XORs with fixed constants."""
    hashes = F.transform(F.col(shingle_col), lambda s: hash64(s))

    def _perm(j: int):
        c = _xor_constant(j)
        return lambda h: h.bitwiseXOR(F.lit(c))

    sig = F.array(
        *[F.array_min(F.transform(hashes, _perm(j))) for j in range(n_hashes)]
    )
    return df.withColumn(col_name, sig)


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    minhash_col: str = "minhash",
    n_bands: int = 4,
    rows_per_band: int = 4,
) -> DataFrame:
    """LSH banding: documents sharing ANY band hash become a candidate pair.

    explode(bands) → self-equi-join on (band_idx, band_hash) → distinct
    (a < b) pairs. The join is the only shuffle; at 100 TB add a bucket-size
    cap (count per band_hash, drop degenerate buckets) before the join —
    a degenerate bucket (e.g. the empty-document shingle) is quadratic.
    """
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.element_at(F.col(minhash_col), b * rows_per_band + r + 1)
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("band_hash"),
            )
            for b in range(n_bands)
        ]
    )
    exploded = df.select(
        F.col(id_col), F.explode(bands).alias("band")
    ).select(id_col, "band.band_idx", "band.band_hash")

    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    n_hashes: int = 16,
    n_bands: int = 4,
    jaccard_threshold: float | None = None,
) -> DataFrame:
    """Full near-dup pipeline: shingle → MinHash → LSH candidates →
    (optional) exact Jaccard verification of candidates only."""
    sh = with_shingles(_ensure_parallelism(df), text_col, k).select(
        id_col, "shingles"
    )
    sig = minhash_signature(sh, n_hashes=n_hashes)
    pairs = lsh_candidate_pairs(
        sig, id_col=id_col, n_bands=n_bands, rows_per_band=n_hashes // n_bands
    )
    if jaccard_threshold is None:
        return pairs
    sh_a = sh.select(
        F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a")
    )
    sh_b = sh.select(
        F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b")
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    return (
        pairs.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash16(
    df: DataFrame, text_col: str = "text", col_name: str = "simhash"
) -> DataFrame:
    """16-bit SimHash over whitespace tokens (row-local, shuffle-free).

    Each bit b is the sign of sum(±1 per token) where the token votes +1
    when bit b of its hash64 is set. 16 bits keeps the expression tree
    small while still bucketing near-identical token multisets together;
    widen to 64 via the same construction when finer granularity is needed.
    """
    toks = F.filter(F.split(normalize_text(F.col(text_col)), " "), lambda w: w != "")
    hashes = F.transform(toks, lambda t: hash64(t))
    def _vote(b: int):
        mask = F.lit(1 << b)
        return lambda acc, h: acc + F.when(
            h.bitwiseAND(mask) != 0, 1
        ).otherwise(-1)

    bit_votes = [F.aggregate(hashes, F.lit(0), _vote(b)) for b in range(16)]
    sim = None
    for b, vote in enumerate(bit_votes):
        term = F.when(vote > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return df.withColumn(col_name, sim.cast("long"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str = "source",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs within a blocking key.

    Set-oriented plan (no per-row pair loops): explode distinct shingles →
    self-join on (block, shingle) → count shared shingles per pair →
    jaccard = |∩| / (|A| + |B| - |∩|). The blocking column bounds the join
    fan-out; at scale use an LSH band as the block instead of a natural key.
    """
    sh = with_shingles(_ensure_parallelism(df), text_col, k).select(
        block_col, id_col, F.col("shingles")
    )
    sizes = sh.select(id_col, F.size("shingles").alias("n_sh"))
    # join on the 60-bit shingle hash, not the string: same distinct-count
    # semantics (collisions negligible at 2^-60), ~3× lighter shuffle keys
    tokensr = sh.select(
        block_col,
        id_col,
        F.explode(F.transform("shingles", lambda s: hash64(s))).alias("shingle"),
    )
    a = tokensr.alias("a")
    b = tokensr.alias("b")
    inter = (
        a.join(
            b,
            (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
            & (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
