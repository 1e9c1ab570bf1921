"""Testdata contract: the literals registry queries rely on must exist in
the driver-generated fixtures. The driver REGENERATES testdata between
rounds; if a regeneration drops a value class these assertions fail
loudly with a named cause instead of queries silently returning empty
results (the failure mode that would silently zero a funnel or a Bloom
demo)."""

from pyspark.sql import functions as F

from boann_ocsf_security_data_platform_spark.sources import load_table


def test_event_type_domain(spark, sf_smoke):
    """Funnel (view/click/purchase), attribution ('purchase' vs rest),
    Welch t-test (purchase vs error), and SLO burn ('error') all name
    event types."""
    got = {
        r.event_type
        for r in load_table(spark, sf_smoke, "events")
        .select("event_type")
        .distinct()
        .collect()
    }
    assert {"view", "click", "purchase", "error"} <= got, got


def test_customer_segment_literal(spark, sf_smoke):
    """join_bloom_filtered filters c_mktsegment = 'BUILDING' (the TPC-H
    segment the reference queries also use)."""
    got = {
        r.c_mktsegment
        for r in load_table(spark, sf_smoke, "customer")
        .select("c_mktsegment")
        .distinct()
        .collect()
    }
    assert "BUILDING" in got, got


def test_shipdate_year_span(spark, sf_smoke):
    """Triangle counting / label propagation filter year(l_shipdate)=1995;
    the PSI drift query also needs 1996."""
    years = {
        r.y
        for r in load_table(spark, sf_smoke, "lineitem")
        .select(F.year("l_shipdate").alias("y"))
        .distinct()
        .collect()
    }
    assert {1995, 1996} <= years, sorted(years)


def test_documents_lang_and_source_present(spark, sf_smoke):
    """Temperature sampling strata ('lang'), mixture sampling / domain
    caps ('source' in srcN form — the mixture oracle parses the numeric
    suffix), and the lang-ID eval's labels."""
    d = load_table(spark, sf_smoke, "documents")
    langs = {r.lang for r in d.select("lang").distinct().collect()}
    assert len(langs) >= 2, langs
    srcs = {r.source for r in d.select("source").distinct().collect()}
    assert srcs and all(s.startswith("src") and s[3:].isdigit() for s in srcs), srcs


def test_embeddings_dim_contract(spark, sf_smoke):
    """LSH hyperplanes, PQ codebooks, centroid oracles, and the truncated
    recall eval are all written for 64-dim vectors."""
    row = (
        load_table(spark, sf_smoke, "embeddings")
        .select(F.size("embedding").alias("d"))
        .distinct()
        .collect()
    )
    assert [r.d for r in row] == [64], row


def test_events_span_multiple_days_and_hours(spark, sf_smoke):
    """Rolling distinct / seasonal baseline / OHLC / streak queries need
    a multi-day, multi-hour event stream."""
    e = load_table(spark, sf_smoke, "events")
    days = e.select(F.date_trunc("day", "ts")).distinct().count()
    hours = e.select(F.hour("ts")).distinct().count()
    assert days >= 8, days  # the 7-day windows need more than one window
    assert hours >= 12, hours
