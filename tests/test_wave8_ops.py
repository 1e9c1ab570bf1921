"""Invariant tests for the wave-8 operators: RAKE keyword extraction and
the native session_window summary (oracle equivalence is in
test_oracle.py; these pin the algorithmic semantics)."""

from pyspark.sql import functions as F

from boann_ocsf_security_data_platform_spark.operators.text import rake_keywords


def test_rake_scores_multiword_phrases_higher(spark):
    """Classic RAKE behavior: words co-occurring in longer candidate
    phrases get degree > freq, so multi-word phrases outscore the same
    words alone. 'deep learning systems' (one 3-word phrase) must rank
    above the isolated 'data' (freq-heavy, degree-light)."""
    docs = spark.createDataFrame(
        [(1, "deep learning systems of data. data and data for analysis")],
        "doc_id long, text string",
    )
    rows = rake_keywords(docs, top_k=2).collect()
    assert rows[0].phrase == "deep learning systems"
    # deep/learning/systems each: freq 1, degree 3 -> score 9
    assert rows[0].score == 9.0
    assert rows[0].rank == 1


def test_rake_stopwords_never_in_phrases(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox and the lazy dog for a while")],
        "doc_id long, text string",
    )
    for r in rake_keywords(docs, top_k=10, max_phrase_words=5).collect():
        for w in r.phrase.split(" "):
            from boann_ocsf_security_data_platform_spark.operators.text import (
                STOPWORDS_EN,
            )

            assert w not in STOPWORDS_EN, r.phrase


def test_rake_punctuation_breaks_phrases(spark):
    """'alpha beta. gamma' must yield phrases 'alpha beta' and 'gamma',
    never 'alpha beta gamma' (punctuation is a phrase boundary)."""
    docs = spark.createDataFrame(
        [(1, "alpha beta. gamma")], "doc_id long, text string"
    )
    phrases = {r.phrase for r in rake_keywords(docs, top_k=10).collect()}
    assert "alpha beta" in phrases and "gamma" in phrases
    assert not any("beta gamma" in p for p in phrases)


def test_rake_topk_bound_and_rank_contiguous(spark, sf_smoke):
    from boann_ocsf_security_data_platform_spark.sources import load_table

    out = rake_keywords(load_table(spark, sf_smoke, "documents"), top_k=3)
    per_doc = {}
    for r in out.collect():
        per_doc.setdefault(r.doc_id, []).append(r.rank)
    assert per_doc
    for ranks in per_doc.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3


def test_session_window_native_agrees_with_island_sessionize(spark, sf_smoke):
    """The native session_window operator and the lag/cumsum islands
    formulation must count the same sessions per user."""
    import __spark_entry__ as em

    native = {
        r.user_id: r.n_sessions
        for r in em.queries()["events_session_window_native"](
            spark, sf_smoke
        ).collect()
    }
    islands = (
        em.queries()["events_sessionize"](spark, sf_smoke)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    want = {r.user_id: r.n for r in islands.collect()}
    assert native == want
