"""Invariant tests for wave-10: temperature sampling semantics and the
rolling-distinct explode trick (oracle equivalence in test_oracle.py)."""

from pyspark.sql import functions as F

from boann_ocsf_security_data_platform_spark.operators.relational import (
    temperature_sample,
)


def _mk_corpus(spark, sizes: dict):
    rows = []
    i = 0
    for lang, n in sizes.items():
        for _ in range(n):
            rows.append((i, lang))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_alpha_one_is_noop_mixture(spark):
    """alpha=1 keeps the natural mixture: the largest admissible corpus
    under the natural shares is the corpus itself, so every row stays."""
    df = _mk_corpus(spark, {"en": 400, "de": 100, "fr": 20})
    out = temperature_sample(df, "lang", alpha=1.0)
    assert out.count() == 520


def test_alpha_flattens_head_keeps_tail(spark):
    """alpha=0.5 must keep 100% of the smallest stratum (no upsampling ⇒
    the tail stratum is the binding constraint) and downsample the head:
    kept share of 'en' < kept share of 'fr'."""
    df = _mk_corpus(spark, {"en": 900, "de": 300, "fr": 25})
    out = temperature_sample(df, "lang", alpha=0.5)
    kept = {r.lang: r.n for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert kept["fr"] == 25
    assert kept["en"] / 900 < kept["de"] / 300 <= 1.0
    # expected sizes track n^0.5 ratios: en/de kept counts ~ sqrt(900/300)
    # ratio of kept = (900^.5/de 300^.5) scaled by same T: kept_en/kept_de
    # ≈ sqrt(900)/sqrt(300) ≈ 1.73 (hash-uniform, allow slack)
    assert 1.2 < kept["en"] / kept["de"] < 2.3


def test_temperature_deterministic(spark):
    df = _mk_corpus(spark, {"en": 500, "fr": 50})
    a = sorted(r.doc_id for r in temperature_sample(df, "lang").collect())
    b = sorted(r.doc_id for r in temperature_sample(df, "lang").collect())
    assert a == b and len(a) > 0


def test_rolling_distinct_window_membership(spark):
    """A user's event on day D contributes to exactly the seven daily
    windows D..D+6; distinct-ness holds within a window."""
    import __spark_entry__ as em
    import tempfile

    rows = [
        (1, "2024-01-01 10:00:00", 7),
        (2, "2024-01-01 11:00:00", 7),   # same user same day -> 1 distinct
        (3, "2024-01-05 09:00:00", 8),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts string, user_id long").select(
        "event_id", F.col("ts").cast("timestamp_ntz").alias("ts"), "user_id",
        F.lit("view").alias("event_type"), F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(f"{tmp}/events.parquet")
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "documents", "embeddings"):
            spark.createDataFrame([], "x int").write.parquet(f"{tmp}/{t}.parquet")
        out = {
            str(r.d)[:10]: r.wau_7d
            for r in em.queries()["events_rolling_distinct_users"](
                spark, tmp
            ).collect()
        }
    # days 01-01..01-04: only user 7; 01-05..01-07: users 7+8; beyond
    # 01-07 (=01-01+6) user 7 ages out -> only user 8 through 01-11
    assert out["2024-01-01"] == 1
    assert out["2024-01-05"] == 2
    assert out["2024-01-07"] == 2
    assert out["2024-01-08"] == 1
    assert out["2024-01-11"] == 1
    assert "2024-01-12" not in out
