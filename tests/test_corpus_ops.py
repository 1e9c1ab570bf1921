"""Corpus-management operators: domain caps, token budgets, mixture
resampling, boilerplate stripping, key profiling (round-3 third wave)."""

import pytest
from pyspark.sql import functions as F

from boann_ocsf_security_data_platform_spark.operators import (
    domain_cap,
    hash_sample_bucket,
    mixture_sample,
    profile_keys,
    strip_frequent_segments,
    token_budget_select,
)
from boann_ocsf_security_data_platform_spark.sources import load_table

DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOC_COLS)


# ---------------------------------------------------------------------------
# domain_cap
# ---------------------------------------------------------------------------

def test_domain_cap_respects_cap_and_is_deterministic(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    capped = domain_cap(docs, max_per_domain=7)
    per = capped.groupBy("source").count().collect()
    assert per and all(r["count"] <= 7 for r in per)
    # survivors are input rows (no mutation) and the draw is reproducible
    again = {r["doc_id"] for r in domain_cap(docs, max_per_domain=7).select("doc_id").collect()}
    assert {r["doc_id"] for r in capped.select("doc_id").collect()} == again
    assert capped.count() == capped.join(docs, "doc_id", "left_semi").count()


def test_domain_cap_keeps_small_domains_whole(spark):
    docs = _docs(spark, [(i, f"t{i}", "en", "only", 2) for i in range(3)])
    assert domain_cap(docs, max_per_domain=10).count() == 3


# ---------------------------------------------------------------------------
# token_budget_select
# ---------------------------------------------------------------------------

def test_token_budget_greedy_fill(spark):
    # one domain, scores force order c > b > a; budget cuts inside b
    rows = [
        (1, 0.9, 100, "s"),  # best: kept, tokens_before 0
        (2, 0.8, 100, "s"),  # kept, tokens_before 100 < 150
        (3, 0.7, 100, "s"),  # tokens_before 200 >= 150 -> dropped
    ]
    df = spark.createDataFrame(rows, ["doc_id", "quality_score", "n_tokens", "source"])
    out = token_budget_select(df, budget=150)
    got = {r["doc_id"]: r["tokens_before"] for r in out.collect()}
    assert got == {1: 0, 2: 100}


def test_token_budget_domains_independent(spark):
    rows = [
        (1, 0.9, 100, "a"),
        (2, 0.9, 100, "b"),
        (3, 0.1, 100, "a"),
        (4, 0.1, 100, "b"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "quality_score", "n_tokens", "source"])
    kept = {r["doc_id"] for r in token_budget_select(df, budget=100).collect()}
    assert kept == {1, 2}  # each domain fills its own budget


# ---------------------------------------------------------------------------
# strip_frequent_segments
# ---------------------------------------------------------------------------

def test_strip_boilerplate_lines(spark):
    banner = "ACCEPT COOKIES"
    rows = [
        (1, f"{banner}\nreal content one", "en", "s", 0),
        (2, f"{banner}\nother text", "en", "s", 0),
        (3, f"{banner}\nmore words", "en", "s", 0),
        (4, "independent document", "en", "s", 0),
    ]
    out = strip_frequent_segments(
        _docs(spark, rows), delim="\n", max_doc_ratio=0.5
    )
    got = {r["doc_id"]: r["cleaned_text"] for r in out.collect()}
    assert got == {
        1: "real content one",
        2: "other text",
        3: "more words",
        4: "independent document",
    }


def test_strip_boilerplate_keeps_emptied_docs_and_order(spark):
    rows = [
        (1, "x\ny\nx", "en", "s", 0),
        (2, "x\nz", "en", "s", 0),
        (3, "x", "en", "s", 0),  # only boilerplate -> survives empty
    ]
    out = strip_frequent_segments(
        _docs(spark, rows), delim="\n", max_doc_ratio=0.5
    )
    got = {r["doc_id"]: r["cleaned_text"] for r in out.collect()}
    # 'x' is in 3/3 docs (> 0.5) -> stripped everywhere; order of the
    # survivors is the original segment order
    assert got == {1: "y", 2: "z", 3: ""}
    assert out.count() == 3  # no silent row loss


# ---------------------------------------------------------------------------
# mixture_sample / hash_sample_bucket
# ---------------------------------------------------------------------------

def test_hash_sample_bucket_range(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    mm = docs.select(
        F.min(hash_sample_bucket("doc_id")).alias("lo"),
        F.max(hash_sample_bucket("doc_id")).alias("hi"),
    ).first()
    assert 0 <= mm["lo"] and mm["hi"] < 1_000_000


def test_mixture_sample_hits_target_mixture(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    weight = F.lit(1) + F.substring(F.col("source"), 4, 10).cast("int") % 3
    out = mixture_sample(docs, "source", weight, "doc_id", seed="mix0")
    # subset of the input, reproducible
    assert out.count() == out.join(docs, "doc_id", "left_semi").count()
    again = mixture_sample(docs, "source", weight, "doc_id", seed="mix0")
    assert out.count() == again.count()
    # realized shares approximate the target: weight-3 sources should hold
    # roughly 3x the rows of weight-1 sources (hash sampling is uniform but
    # finite-sample; assert the ordering, not exact ratios)
    shares = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    w1 = [n for s, n in shares.items() if int(s[3:]) % 3 == 0]
    w3 = [n for s, n in shares.items() if int(s[3:]) % 3 == 2]
    assert sum(w3) / len(w3) > 1.5 * (sum(w1) / len(w1))


def test_mixture_sample_never_upsamples(spark):
    rows = [(i, "t", "en", "a" if i < 90 else "srcb", 1) for i in range(100)]
    df = _docs(spark, rows)
    # target 50/50 from a 90/10 corpus: stratum 'srcb' caps the total;
    # everything of 'srcb' kept, 'a' sampled down toward ~10
    out = mixture_sample(df, "source", F.lit(1), "doc_id")
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["srcb"] == 10
    assert counts["a"] <= 25  # ~10 expected; generous bound for hash noise


# ---------------------------------------------------------------------------
# profile_keys
# ---------------------------------------------------------------------------

def test_profile_keys_exact_counts(spark):
    rows = [("hot",)] * 50 + [("warm",)] * 10 + [(f"k{i}",) for i in range(5)]
    df = spark.createDataFrame(rows, ["k"])
    top = profile_keys(df, "k", k=2).collect()
    assert [(r["k"], r["n_rows"]) for r in top] == [("hot", 50), ("warm", 10)]
    assert top[0]["share"] == round(50 / 65, 6)


def test_token_budget_always_keeps_best_doc(spark):
    # tokens_before of a domain's best doc is 0, so ANY positive budget
    # keeps at least (exactly, here) one doc per domain
    rows = [(i, 0.5 + i / 100, 1000, f"d{i % 3}") for i in range(9)]
    df = spark.createDataFrame(rows, ["doc_id", "quality_score", "n_tokens", "source"])
    out = token_budget_select(df, budget=1)
    assert out.groupBy("source").count().collect()[0]["count"] == 1
    assert out.count() == 3


def test_strip_boilerplate_identity_below_threshold(spark):
    # no segment reaches the document-frequency threshold -> text unchanged
    rows = [(1, "alpha beta", "en", "s", 0), (2, "gamma delta", "en", "s", 0)]
    out = strip_frequent_segments(_docs(spark, rows), delim=" ", max_doc_ratio=0.5)
    got = {r["doc_id"]: r["cleaned_text"] for r in out.collect()}
    assert got == {1: "alpha beta", 2: "gamma delta"}


def test_strip_boilerplate_idempotent(spark, sf_smoke):
    # removing boilerplate cannot create new boilerplate: surviving
    # segments keep their document frequency, so a second pass is a no-op
    docs = load_table(spark, sf_smoke, "documents")
    once = strip_frequent_segments(docs, delim=" ", max_doc_ratio=0.8)
    again_in = once.withColumnRenamed("cleaned_text", "text")
    twice = strip_frequent_segments(again_in, delim=" ", max_doc_ratio=0.8)
    diff = (
        once.withColumnRenamed("cleaned_text", "a")
        .join(twice.withColumnRenamed("cleaned_text", "b"), "doc_id")
        .filter(F.col("a") != F.col("b"))
    )
    assert diff.count() == 0
