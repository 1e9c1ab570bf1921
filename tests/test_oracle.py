"""DuckDB-oracle gate as a test: every declared query must hash-match its
oracle at sf0.001 (the driver runs the same comparison at sf0.01)."""

import pytest

import __spark_entry__ as entrymod
from tools.oracle_check import compare_one, duck_connect

QS = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_smoke):
    con = duck_connect(sf_smoke)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, duck, sf_smoke, name):
    ok, issues = compare_one(spark, duck, name, QS[name], ORACLES[name], sf_smoke)
    assert ok, issues


@pytest.mark.parametrize("name", sorted(set(QS) - set(ORACLES)))
def test_rows_only_queries_run(spark, sf_smoke, name):
    assert QS[name](spark, sf_smoke).count() >= 0


def test_entry_contract(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) == 10


def test_gate_window_covers_every_family():
    """The driver's correctness gate verifies the first 50 queries() entries
    in iteration order — pin that window: it must match _GATE_ORDER exactly,
    every gate entry except the approximate-by-design ones must carry an
    oracle, and one representative of each operator-family prefix must sit
    inside the window."""
    names = list(QS)
    assert names[:50] == entrymod._GATE_ORDER
    assert len(set(entrymod._GATE_ORDER)) == 50
    rows_only_by_design = {"knn_ivf_approx"}
    for n in names[:50]:
        assert n in ORACLES or n in rows_only_by_design, n
    window = set(names[:50])
    for family in (
        "q1", "q3", "join_", "agg_", "window_", "setop_", "scalar_",
        "events_", "dedup_", "knn_", "text_", "multimodal_", "subquery_",
        "range_join_", "unpivot_", "sort_", "asof_", "embedding_", "variant_",
    ):
        assert any(n.startswith(family) for n in window), family
    # everything outside the window was driver-verified in rounds 1-2 or is
    # approximate by design — nothing waits outside that never had a row
    never_verified_ok = {"knn_lsh_approx", "approx_count_distinct"}
    r2_green = {
        "join_left_outer", "join_full_outer", "join_semi", "join_anti",
        "join_cross", "join_theta_inequality", "agg_distinct_and_stats",
        "agg_collect_sorted", "agg_grouping_sets", "window_running_sum",
        "window_lag_lead", "topk_per_group", "q8_market_share",
        "agg_histogram_buckets", "map_and_array_functions", "q14_promo_share",
        "pivot_status_by_priority", "agg_percentiles", "explode_with_position",
        "setop_intersect", "setop_except", "setop_union_all",
        "events_json_extract", "q4_order_priority_check",
        "q17_small_quantity_correlated", "agg_rollup", "dedup_simhash",
        "events_tumbling_window", "dedup_ngram_jaccard",
    }
    assert set(names[50:]) <= r2_green | never_verified_ok


def test_embedding_near_dup_requires_block():
    """block_col=None must raise, not silently cross-join (O(n²))."""
    from boann_ocsf_security_data_platform_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    with pytest.raises(ValueError, match="blocking column"):
        embedding_near_dup_pairs(None, block_col=None)


# ---------------------------------------------------------------------------
# invariants for the approximate operators (no SQL oracle possible; the
# driver records rows-only — these properties are the correctness story)
# ---------------------------------------------------------------------------

def test_lsh_topk_subset_of_bruteforce(spark, sf_smoke):
    """Every LSH-approx neighbor must also be a brute-force neighbor pair
    with the IDENTICAL cosine (LSH only prunes candidates — it never
    invents similarity), and per-query result sets are <= k."""
    from boann_ocsf_security_data_platform_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_lsh,
    )
    from boann_ocsf_security_data_platform_spark.sources import load_table

    emb = load_table(spark, sf_smoke, "embeddings")
    queries = emb.filter("vec_id < 10")
    k = 5
    approx = cosine_topk_lsh(emb, queries, k=k).collect()
    # brute-force with k = |corpus| gives the full scored ranking
    n = emb.count()
    exact = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in cosine_topk(emb, queries, k=n).collect()
    }
    assert len(approx) > 0
    per_query = {}
    for r in approx:
        assert (r.query_id, r.neighbor_id) in exact
        assert r.cosine == exact[(r.query_id, r.neighbor_id)]
        per_query[r.query_id] = per_query.get(r.query_id, 0) + 1
    assert all(c <= k for c in per_query.values())


def test_approx_count_distinct_within_rsd(spark, sf_smoke):
    """HyperLogLog++ default rsd is 0.05; allow 4 sigma against the exact
    distinct count."""
    from boann_ocsf_security_data_platform_spark.sources import load_table
    from pyspark.sql import functions as F

    l = load_table(spark, sf_smoke, "lineitem")
    approx = l.agg(F.approx_count_distinct("l_orderkey")).collect()[0][0]
    exact = l.agg(F.countDistinct("l_orderkey")).collect()[0][0]
    assert abs(approx - exact) <= 4 * 0.05 * exact


def test_ivf_topk_subset_of_bruteforce(spark, sf_smoke):
    """IVF-Flat prunes via inverted lists but never invents similarity:
    every reported neighbor must be a brute-force pair with identical
    cosine; probing ALL lists must recover the exact top-k."""
    from boann_ocsf_security_data_platform_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_ivf,
    )
    from boann_ocsf_security_data_platform_spark.sources import load_table

    emb = load_table(spark, sf_smoke, "embeddings")
    queries = emb.filter("vec_id < 10")
    n = emb.count()
    exact_all = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in cosine_topk(emb, queries, k=n).collect()
    }
    approx = cosine_topk_ivf(emb, queries, k=5, n_centroids=16, n_probe=4).collect()
    assert len(approx) > 0
    for r in approx:
        assert (r.query_id, r.neighbor_id) in exact_all
        assert r.cosine == exact_all[(r.query_id, r.neighbor_id)]
    # full probe == exact top-k (rank-for-rank)
    full = cosine_topk_ivf(emb, queries, k=5, n_centroids=16, n_probe=16)
    exact5 = cosine_topk(emb, queries, k=5)
    got = {(r.query_id, r.rank): (r.neighbor_id, r.cosine) for r in full.collect()}
    want = {(r.query_id, r.rank): (r.neighbor_id, r.cosine) for r in exact5.collect()}
    assert got == want


def test_percentile_approx_within_tolerance(spark, sf_smoke):
    """approx percentile lands within a small rank-error band of the exact
    percentile (accuracy parameter 10000 → ~0.01% rank error)."""
    from boann_ocsf_security_data_platform_spark.sources import load_table
    from pyspark.sql import functions as F

    l = load_table(spark, sf_smoke, "lineitem")
    row = l.agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.01
