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


def _driver_green_prior_rounds():
    """Query names with a fully-matching row in any prior CORRECTNESS_r*.json
    (the driver's own gate output) — those entries keep their verification
    even when rotated out of the 50-row window."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    green = set()
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        for name, row in json.load(open(path)).items():
            if row.get("rows_match") and row.get("schema_match") and (
                row.get("hash_match") or row.get("hash_match") is None
            ):
                green.add(name)
    return green


def test_gate_window_covers_every_family():
    """The driver's correctness gate verifies the first 50 queries() entries
    in iteration order — pin that window: it must match _GATE_ORDER exactly,
    EVERY gate entry must carry an oracle (no slot burned on a row that can
    never be green), and every operator-family prefix must have a
    representative that is either inside the window (gets a row this round)
    or already driver-green in a prior round's CORRECTNESS file."""
    names = list(QS)
    assert names[:50] == entrymod._GATE_ORDER
    assert len(set(entrymod._GATE_ORDER)) == 50
    for n in names[:50]:
        assert n in ORACLES, f"{n}: gate entries must be oracle-backed"
    prior_green = _driver_green_prior_rounds()
    covered = set(names[:50]) | prior_green
    for family in (
        "q1", "q3", "join_", "agg_", "window_", "setop_", "scalar_",
        "events_", "dedup_", "knn_", "text_", "multimodal_", "subquery_",
        "range_join_", "unpivot_", "sort_", "asof_", "embedding_", "variant_",
        "semantic_", "topk_", "pivot_", "explode_", "map_", "corpus_",
        "profile_", "feature_", "graph_",
    ):
        assert any(n.startswith(family) for n in covered), family
    # everything outside the window is driver-verified in a prior round,
    # approximate by design (invariant-tested below), or a declared
    # candidate for the NEXT round's window (added after this round's 50
    # first-timer slots filled; oracle-checked every round by
    # tools/oracle_check.py and by the parametrized oracle tests above)
    never_verified_ok = {
        "knn_lsh_approx", "knn_ivf_approx", "approx_count_distinct",
        # GK-sketch quantiles: DuckDB's approx_quantile is a different
        # sketch; rank-error invariant pinned in test_round5_ops
        "agg_approx_percentiles",
    }
    next_window_pending = set({
        # Remaining round-7 backlog (waves 118-203 tail) after the round-8
        # rotation moved the first 50 pending entries (waves 81-117) into
        # the gate window; plus round-8 additions declared as they land.
        # All oracle-checked every round by tools/oracle_check.py and the
        # parametrized oracle tests above; they fill the round-9 window.
        # wave 131: closed-form two-predictor OLS (normal equations)
        "agg_ols_two_predictor",
        # wave 132: binned Epanechnikov KDE at a fixed 21-point grid
        "agg_kde_grid",
        # wave 133: Cook's distance top-10 influence diagnostics
        "agg_cooks_distance_topk",
        # wave 134: Poisson overdispersion index per event type
        "events_poisson_dispersion",
        # wave 135: Wilcoxon signed-rank test on paired customer spend
        "agg_wilcoxon_signed_rank",
        # wave 136: epoch allocation under a token budget
        "corpus_epoch_allocation",
        # wave 137: per-node local clustering coefficient
        "graph_clustering_coefficient",
        # wave 138: annualized Sharpe/Sortino of daily revenue returns
        "window_sharpe_sortino",
        # wave 139: IPv4 derive -> format -> parse round-trip profile
        "scalar_ipv4_roundtrip",
        # wave 140: Kendall tau-b from a bounded binned contingency
        "agg_kendall_tau_binned",
        # wave 141: Hurst exponent via rescaled-range analysis
        "events_hurst_exponent",
        # wave 142: Tukey HSD post-hoc pairwise comparisons
        "agg_tukey_hsd",
        # wave 143: circular statistics + Rayleigh uniformity test
        "agg_circular_stats",
        # wave 144: fixed-period periodogram probe
        "events_periodogram_probe",
        # wave 145: two-proportion z-test on the discount split
        "agg_two_proportion_ztest",
        # wave 146: quality x near-duplication interaction (odds ratio)
        "corpus_quality_dedup_interaction",
        # wave 147: adjacent-pair cosine calibration histogram
        "embedding_adjacent_cosine_histogram",
        # wave 148: mRMR greedy feature selection
        "feature_mrmr_selection",
        # wave 149: Lorenz curve decile points
        "orders_lorenz_curve",
        # wave 150: one-way ANOVA F-test on weekday groups
        "events_weekday_anova",
        # wave 151: negative binomial moment fit per event type
        "events_negative_binomial_fit",
        # wave 152: lognormal fit + decile-probe goodness of fit
        "agg_lognormal_fit_gof",
        # wave 153: ICO multi-image container round-trip
        "multimodal_ico_roundtrip",
        # wave 154: near-dup cluster size histogram
        "dedup_cluster_size_histogram",
        # wave 155: ABC revenue-class migration matrix
        "orders_abc_migration",
        # wave 156: Burrows' Delta stylometric distance
        "text_burrows_delta",
        # wave 157: ROC sweep + trapezoid AUC (quality vs near-dup)
        "corpus_quality_roc_auc",
        # wave 158: partial autocorrelation (Durbin-Levinson, lags 1-3)
        "events_pacf",
        # wave 159: Goh-Barabasi burstiness coefficient per event type
        "events_burstiness_memory",
        # wave 160: split-conformal prediction interval + coverage
        "agg_conformal_interval",
        # wave 161: Matryoshka truncation error profile
        "embedding_matryoshka_truncation",
        # wave 162: haversine nearest-warehouse assignment
        "scalar_haversine_assignment",
        # wave 163: day-of-week x month revenue uplift matrix
        "orders_dow_month_uplift",
        # wave 164: DSIR importance-weight effective sample size
        "corpus_importance_ess",
        # wave 165: two-hop reach profile (friend-of-friend)
        "graph_two_hop_reach",
        # wave 166: two-proportion power analysis (MDE + required n)
        "agg_power_analysis",
        # wave 167: turning-points randomness test
        "events_turning_points_test",
        # wave 168: MoM GMV growth decomposition (integer cents)
        "orders_gmv_decomposition",
        # wave 169: Mann-Kendall monotone trend test
        "events_mann_kendall_trend",
        # wave 170: depth-2 binary-segmentation changepoints
        "events_binary_segmentation",
        # wave 171: rich-club coefficient at three degree thresholds
        "graph_rich_club",
        # wave 172: item-item cosine co-purchase similarity
        "join_item_item_cosine",
        # wave 173: event-mix entropy trend (diversity drift)
        "events_mix_entropy_trend",
        # wave 174: Donchian channel breakout profile
        "window_donchian_breakouts",
        # wave 175: Jarque-Bera normality from explicit moments
        "agg_jarque_bera",
        # wave 176: Cohen's kappa between two tertile classifiers
        "agg_cohens_kappa",
        # wave 177: weekday seasonal strength (STL F_s)
        "events_seasonal_strength",
        # wave 178: referential-integrity audit (FK health)
        "profile_referential_integrity",
        # wave 179: base36 order-reference codec round-trip
        "scalar_base36_codec",
        # wave 180: Grubbs maximum-deviation outlier test
        "agg_grubbs_outlier",
        # wave 181: Chinchilla compute-optimal sizing report
        "corpus_chinchilla_sizing",
        # wave 182: vocabulary-size vs token-coverage curve
        "text_vocab_coverage_curve",
        # wave 183: empirical-Bayes shrinkage of supplier late rates
        "supplier_eb_shrunk_late_rate",
        # wave 184: Fleiss' kappa across three tertile raters
        "agg_fleiss_kappa",
        # wave 185: records-theory trend test (running maxima)
        "events_records_test",
        # wave 186: k-occurrence hubness profile (label-blocked)
        "embedding_hubness_profile",
        # wave 187: Parkinson range-based volatility per year
        "window_parkinson_volatility",
        # wave 188: Friedman within-blocks rank test
        "agg_friedman_test",
        # wave 189: Gray-code round-trip + one-bit-adjacency property
        "scalar_gray_code_roundtrip",
        # wave 190: Theil's U forecast-skill ratio
        "events_theil_u_skill",
        # wave 191: log-rank test between two conversion cohorts
        "events_logrank_test",
        # wave 192: Breusch-Pagan heteroskedasticity test
        "agg_breusch_pagan",
        # wave 193: CCNet-style quality buckets (head/middle/tail)
        "corpus_ccnet_buckets",
        # wave 194: Bartlett parametric variance-homogeneity test
        "agg_bartlett_test",
        # wave 195: Hodges-Lehmann two-sample shift estimator
        "agg_hodges_lehmann_shift",
        # wave 196: np-chart SPC on daily error counts
        "events_np_chart",
        # wave 197: Laspeyres/Paasche/Fisher price indices
        "parts_price_index",
        # wave 198: McNemar paired-classifier test
        "agg_mcnemar_test",
        # wave 199: newsvendor service-level stock targets
        "orders_newsvendor_levels",
        # wave 200: dataset card (cross-table inventory)
        "profile_dataset_card",
        # wave 201: Cochran's Q omnibus across three classifiers
        "agg_cochran_q_test",
        # wave 202: economic order quantity analysis
        "parts_eoq_analysis",
        # wave 203: Simpson's paradox probe (pooled vs within-group)
        "agg_simpson_paradox_probe",
        # --- round-8 additions (held to single digits per the r7 verdict
        # while the backlog drains) ---
        # wave 204: Spearman via bounded contingency ranks (the scale
        # recipe pinned in agg_spearman_rank_corr, implemented)
        "agg_spearman_binned",
    })
    stragglers = (
        set(names[50:]) - prior_green - never_verified_ok - next_window_pending
    )
    assert not stragglers, stragglers


def _next_window_pending_names():
    """The declared round-6 gate candidates (kept in
    test_gate_window_covers_every_family) — sortable-schema-checked NOW so
    the next rotation cannot repeat the r3 list-canon incident."""
    import inspect

    src = inspect.getsource(test_gate_window_covers_every_family)
    import re

    m = re.search(r"next_window_pending = set\(\{(.*?)\}\)", src, re.S)
    names = re.findall(r'"([a-z0-9_]+)"', m.group(1)) if m else []
    return [n for n in names if n in QS]


def test_gate_window_output_is_driver_sortable(spark, sf_smoke):
    """The driver's canonicalization sorts result cells with pandas and
    cannot hash array/map/struct cells (`TypeError: unhashable type:
    'list'` burned three r3 gate rows). Guardrail: every gate-window query
    AND every declared next-round candidate must produce only atomic
    output columns. Schema analysis only — no execution."""
    from pyspark.sql import types as T

    bad = {}
    for name in [*entrymod._GATE_ORDER, *_next_window_pending_names()]:
        fields = QS[name](spark, sf_smoke).schema.fields
        complex_cols = [
            f.name
            for f in fields
            if isinstance(
                f.dataType, (T.ArrayType, T.MapType, T.StructType)
            )
        ]
        if complex_cols:
            bad[name] = complex_cols
    assert not bad, f"non-driver-sortable output columns in gate window: {bad}"


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
