"""Invariant tests for the wave-6 operators: Misra-Gries heavy hitters,
broadcast-Bloom semi join, degree-ordered triangle counting, and
substring-span duplication stats. (Oracle equivalence is covered by
test_oracle.py — these pin the guarantees an oracle can't: the MG
candidate superset under adversarial partitioning, Bloom false-positive
removal under a deliberately tiny filter, and the degree-ordered
enumeration matching brute force on known graphs.)"""

import itertools
import random

import pytest
from pyspark.sql import functions as F

from boann_ocsf_security_data_platform_spark.operators.graph import triangle_count
from boann_ocsf_security_data_platform_spark.operators.relational import (
    bloom_semi_join,
)
from boann_ocsf_security_data_platform_spark.operators.text import (
    duplicate_span_stats,
    heavy_hitter_tokens,
)


# ---------------------------------------------------------------------------
# heavy_hitter_tokens — exact output despite bounded per-partition state
# ---------------------------------------------------------------------------

def _exact_heavy_hitters(spark, docs, frac):
    from boann_ocsf_security_data_platform_spark.operators.text import tokens

    toks = docs.select(F.explode(tokens("text")).alias("token"))
    total = toks.count()
    return {
        (r.token, r.freq)
        for r in toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .where(F.col("freq") > int(total * frac))
        .collect()
    }


def test_heavy_hitters_exact_under_thin_spread(spark):
    """A token spread thin across many partitions (never locally hot)
    must still surface: the mergeable-MG error bound is global, not
    per-partition. 'hot' is 12% of the stream but arrives 3 tokens per
    partition alongside locally-hotter fillers."""
    rows = []
    rng = random.Random(7)
    for part in range(25):
        body = ["hot"] * 3 + [f"filler{part}_{i}" for i in range(6) for _ in (0, 1)] + [
            f"noise{rng.randrange(1000)}" for _ in range(10)
        ]
        rng.shuffle(body)
        rows.append((part, " ".join(body)))
    docs = spark.createDataFrame(rows, "doc_id int, text string").repartition(
        25, "doc_id"
    )
    frac = 0.1
    got = {
        (r.token, r.freq)
        for r in heavy_hitter_tokens(
            docs, min_count_frac=frac, capacity=10
        ).collect()
    }
    assert got == _exact_heavy_hitters(spark, docs, frac)
    assert any(t == "hot" for t, _ in got)


def test_heavy_hitters_matches_full_groupby_on_zipf(spark):
    rng = random.Random(11)
    words = [f"w{i}" for i in range(200)]
    rows = [
        (
            d,
            " ".join(
                words[min(int(rng.paretovariate(1.2)), 199)] for _ in range(60)
            ),
        )
        for d in range(80)
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string").repartition(8)
    frac = 0.01
    got = {
        (r.token, r.freq)
        for r in heavy_hitter_tokens(docs, min_count_frac=frac).collect()
    }
    assert got == _exact_heavy_hitters(spark, docs, frac)
    assert len(got) > 0


# ---------------------------------------------------------------------------
# bloom_semi_join — exact semi-join result even when the filter saturates
# ---------------------------------------------------------------------------

def test_bloom_semi_join_equals_plain_semi(spark):
    big = spark.range(0, 2000).select(F.col("id").alias("k"), (F.col("id") % 7).alias("x"))
    small = spark.range(0, 2000, 13).select(F.col("id").alias("k"))
    got = sorted((r.k, r.x) for r in bloom_semi_join(big, small, "k").collect())
    want = sorted(
        (r.k, r.x) for r in big.join(small, "k", "left_semi").collect()
    )
    assert got == want


def test_bloom_semi_join_tiny_filter_false_positives_removed(spark):
    """m_bits=32 saturates the filter (nearly every probe passes) — the
    exact left_semi behind it must still drop every false positive."""
    big = spark.range(0, 500).select(F.col("id").alias("k"))
    small = spark.createDataFrame([(3,), (487,)], "k long")
    got = sorted(r.k for r in bloom_semi_join(big, small, "k", m_bits=32, n_hashes=2).collect())
    assert got == [3, 487]


def test_bloom_semi_join_empty_small_side(spark):
    big = spark.range(0, 100).select(F.col("id").alias("k"))
    small = spark.range(0).select(F.col("id").alias("k"))
    assert bloom_semi_join(big, small, "k").count() == 0


# ---------------------------------------------------------------------------
# triangle_count — known graphs + randomized brute-force equivalence
# ---------------------------------------------------------------------------

def _brute_triangles(edges):
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({v for e in es for v in e})
    return sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in es and (b, c) in es and (a, c) in es
    )


def test_triangle_count_k4(spark):
    """K4 has C(4,3)=4 triangles; edges given in mixed orientation with
    duplicates and a self-loop to exercise canonicalization."""
    raw = [(1, 2), (2, 1), (1, 3), (1, 4), (3, 2), (2, 4), (3, 4), (5, 5), (4, 5)]
    e = spark.createDataFrame(raw, "src long, dst long")
    row = triangle_count(e).collect()[0]
    assert row.n_triangles == 4
    assert row.n_nodes == 5
    assert row.n_edges == 7  # K4's six + the 4-5 bridge; loop dropped


def test_triangle_count_matches_bruteforce_random(spark):
    rng = random.Random(23)
    edges = list({
        (rng.randrange(30), rng.randrange(30)) for _ in range(150)
    })
    e = spark.createDataFrame(edges, "src long, dst long")
    row = triangle_count(e).collect()[0]
    assert row.n_triangles == _brute_triangles(edges)


def test_triangle_count_star_has_none(spark):
    e = spark.createDataFrame([(0, i) for i in range(1, 12)], "src long, dst long")
    row = triangle_count(e).collect()[0]
    assert row.n_triangles == 0
    assert row.n_edges == 11


# ---------------------------------------------------------------------------
# duplicate_span_stats — substring-level duplication semantics
# ---------------------------------------------------------------------------

def test_duplicate_spans_shared_boilerplate(spark):
    shared = "the quick brown fox jumps over the lazy"  # exactly 8 words
    docs = spark.createDataFrame(
        [
            (1, shared + " dog one two three"),
            (2, shared + " cat four five six"),
            (3, "completely different words with no overlap at all here ok"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in duplicate_span_stats(docs, n=8).collect()}
    # docs 1 and 2 share exactly the one leading 8-gram; their other spans
    # diverge from word 9 onward... every span starting at position 1 is
    # the shared gram; spans 2..5 differ between the docs
    assert rows[1].n_dup_spans == 1 and rows[2].n_dup_spans == 1
    assert rows[3].n_dup_spans == 0
    assert rows[1].n_spans == 12 - 8 + 1
    assert rows[3].dup_frac == 0.0


def test_duplicate_spans_short_docs_excluded(spark):
    docs = spark.createDataFrame(
        [(1, "only seven words in this doc here"), (2, "a b c d e f g h i")],
        "doc_id long, text string",
    )
    got = {r.doc_id for r in duplicate_span_stats(docs, n=8).collect()}
    assert got == {2}


def test_duplicate_spans_within_doc_repeat_not_dup(spark):
    """A span repeated only WITHIN one doc is not cross-doc duplication
    (count distinct doc > 1 is the predicate)."""
    span = "x1 x2 x3 x4 x5 x6 x7 x8"
    docs = spark.createDataFrame(
        [(1, span + " mid " + span), (2, "u v w unrelated tokens padding more words")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in duplicate_span_stats(docs, n=8).collect()}
    assert rows[1].n_dup_spans == 0


# ---------------------------------------------------------------------------
# compression_ratio (wave 23 — no SQL oracle possible; invariants ARE the
# correctness story)
# ---------------------------------------------------------------------------

def test_compression_ratio_orders_repetitive_below_random(spark):
    import random as _r

    rng = _r.Random(5)
    rep = "the same phrase again and again " * 40
    rand = " ".join(
        "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(8))
        for _ in range(160)
    )
    from boann_ocsf_security_data_platform_spark.operators.text import (
        compression_ratio,
    )

    df = spark.createDataFrame(
        [(1, rep), (2, rand)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in compression_ratio(df).collect()}
    assert rows[1].ratio < rows[2].ratio
    assert rows[1].ratio < 0.15  # heavy repetition compresses hard


def test_compression_ratio_matches_python_zlib(spark):
    import zlib

    texts = [(1, "hello world " * 10), (2, ""), (3, "αβγ unicode ок")]
    from boann_ocsf_security_data_platform_spark.operators.text import (
        compression_ratio,
    )

    df = spark.createDataFrame(texts, "doc_id long, text string")
    rows = {r.doc_id: r for r in compression_ratio(df).collect()}
    for i, t in texts:
        b = t.encode()
        assert rows[i].n_bytes == len(b)
        assert rows[i].n_compressed == len(zlib.compress(b, 6))


def test_compression_ratio_deterministic(spark, sf_smoke):
    from boann_ocsf_security_data_platform_spark.operators.text import (
        compression_ratio,
    )
    from boann_ocsf_security_data_platform_spark.sources import load_table

    d = load_table(spark, sf_smoke, "documents")
    a = sorted(map(tuple, compression_ratio(d).collect()))
    b = sorted(map(tuple, compression_ratio(d).collect()))
    assert a == b and len(a) == d.count()
