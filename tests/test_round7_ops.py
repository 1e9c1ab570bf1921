"""Round-7 invariant tests — mathematical properties of the wave 81-92
operators that a value-hash oracle can't express (the hash pins the
values; these pin the MEANING):

- Spearman is bounded in [-1, 1] and exactly 1 on a monotone pair.
- Market-basket rules: support ≤ confidence, lift consistency
  (lift = confidence / P(b)), symmetric support under pair order.
- RFM: the quintile cells partition ALL customers; scores are 1..5.
- Inter-arrival: CV ≈ 1 band is not asserted (data-dependent), but
  λ·mean_gap ≡ 1 and both are positive wherever defined.
- JS divergence: symmetric by construction, bounded by ln 2, zero for
  identical distributions.
- Markov stationary: probabilities sum to ≈ 1 and are non-negative —
  AND the chain's one-step evolution maps the returned vector (near)
  onto itself more closely than uniform does (fixed-point-ness).
- Cramér's V ∈ [0, 1].
- Temperature mixture: shares each sum to 1; τ < 1 upweights the
  SMALLEST source and downweights the LARGEST.
- Silhouette ∈ [-1, 1]; a well-separated synthetic clustering scores
  ≈ 1, a degenerate single-cluster labeling scores 0 (b undefined→NULL
  handling) — pinned on constructed data.
- RSI ∈ [0, 100]; all-gains series pins 100.
- Jackknife SE is non-negative and 0 when every group has an identical
  mean (constructed).
- Vocabulary Jaccard ∈ [0, 1], 1 for identical vocabularies.
"""

import math

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod

QS = entrymod.queries()


def test_spearman_bounds_and_monotone_exactness(spark, sf_smoke):
    rows = QS["agg_spearman_rank_corr"](spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r.spearman_rho <= 1.0
    # monotone pair → exactly +1 (ties in x mirrored in y keep avg ranks
    # aligned)
    df = spark.createDataFrame(
        [("A", float(i), float(i * 3 + 1)) for i in range(50)],
        "l_returnflag string, l_quantity double, l_extendedprice double",
    )
    import tempfile

    tmp = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(f"{tmp}/lineitem.parquet")
    out = QS["agg_spearman_rank_corr"](spark, tmp).collect()
    assert out[0].spearman_rho == pytest.approx(1.0)


def test_market_basket_rule_consistency(spark, sf_smoke):
    rows = QS["join_market_basket_rules"](spark, sf_smoke).collect()
    assert rows, "sf0.001 should produce at least one rule above 1% support"
    for r in rows:
        assert 0 < r.support <= r.confidence <= 1.0 + 1e-9
        assert r.lift > 0
        assert r.brand_a < r.brand_b  # canonical pair order, no mirrors


def test_rfm_cells_partition_all_customers(spark, sf_smoke):
    out = QS["orders_rfm_segmentation"](spark, sf_smoke)
    rows = out.collect()
    n_cells = sum(r.n_customers for r in rows)
    n_cust = (
        entrymod._t(spark, sf_smoke, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert n_cells == n_cust
    for r in rows:
        assert 1 <= r.r_score <= 5 and 1 <= r.f_score <= 5 and 1 <= r.m_score <= 5
        assert r.total_monetary_cents >= r.n_customers  # positive money


def test_interarrival_lambda_is_reciprocal_mean(spark, sf_smoke):
    for r in QS["events_interarrival_expfit"](spark, sf_smoke).collect():
        if r.lambda_per_s is not None:
            assert r.mean_gap_s > 0
            assert r.lambda_per_s == pytest.approx(
                1.0 / r.mean_gap_s, rel=1e-3
            )
            assert r.cv is None or r.cv >= 0


def test_js_divergence_bounds_and_identity(spark, sf_smoke, tmp_path):
    rows = QS["text_js_divergence_sources"](spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert -1e-9 <= r.js_divergence <= math.log(2) + 1e-9
        assert r.source_a < r.source_b
    # identical distributions → JSD exactly 0
    docs = [
        (1, "alpha beta gamma", "en", "s1", 16),
        (2, "alpha beta gamma", "en", "s2", 16),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = QS["text_js_divergence_sources"](spark, str(tmp_path)).collect()
    assert out[0].js_divergence == pytest.approx(0.0, abs=1e-9)


def test_markov_stationary_is_a_fixed_point(spark, sf_smoke):
    rows = QS["events_markov_stationary"](spark, sf_smoke).collect()
    pi = {r.event_type: r.stationary_prob for r in rows}
    assert all(p >= 0 for p in pi.values())
    assert sum(pi.values()) == pytest.approx(1.0, abs=1e-4)
    # one more chain step moves the returned vector less than it moves
    # the uniform start: ||piP - pi||_1 < ||uP - u||_1 (fixed-point-ness
    # without demanding full convergence at 6 fixed rounds)
    e = entrymod._t(spark, sf_smoke, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        e.select(
            F.lag("event_type").over(w).alias("src"),
            F.col("event_type").alias("dst"),
        )
        .filter(F.col("src").isNotNull())
        .groupBy("src", "dst")
        .count()
        .collect()
    )
    states = sorted(pi)
    tot = {}
    for r in edges:
        tot[r.src] = tot.get(r.src, 0) + r["count"]

    def step(v):
        out = dict.fromkeys(states, 0.0)
        dang = sum(p for s, p in v.items() if s not in tot)
        for r in edges:
            out[r.dst] += v[r.src] * r["count"] / tot[r.src]
        for s in states:
            out[s] += dang / len(states)
        return out

    def l1(a, b):
        return sum(abs(a[s] - b[s]) for s in states)

    uniform = dict.fromkeys(states, 1.0 / len(states))
    assert l1(step(pi), pi) < l1(step(uniform), uniform) or l1(
        step(pi), pi
    ) < 1e-6


def test_cramers_v_bounds(spark, sf_smoke):
    r = QS["agg_cramers_v"](spark, sf_smoke).collect()[0]
    assert 0.0 <= r.cramers_v <= 1.0
    assert r.dof == 16  # 5 segments × 5 priorities
    assert r.chi2 >= 0


def test_temperature_mixture_flattens_toward_uniform(spark, sf_smoke):
    rows = QS["corpus_temperature_mixture"](spark, sf_smoke).collect()
    assert sum(r.natural_share for r in rows) == pytest.approx(1.0, abs=1e-4)
    assert sum(r.temp_share for r in rows) == pytest.approx(1.0, abs=1e-4)
    smallest = min(rows, key=lambda r: r.n_tokens)
    largest = max(rows, key=lambda r: r.n_tokens)
    if smallest.n_tokens < largest.n_tokens:
        assert smallest.upweight > 1.0 > largest.upweight
    for r in rows:
        assert r.epochs_at_budget == pytest.approx(r.upweight, rel=1e-3)


def test_silhouette_bounds_and_separated_clusters(spark, sf_smoke, tmp_path):
    for r in QS["embedding_label_silhouette"](spark, sf_smoke).collect():
        assert -1.0 - 1e-9 <= r.mean_silhouette <= 1.0 + 1e-9
        assert r.mean_intra >= 0 and r.mean_nearest_other >= 0
    # two far-apart tight blobs → silhouette ≈ 1 for both labels
    import numpy as np

    rows = []
    for i in range(20):
        rows.append((i, [float(x) for x in np.zeros(4) + (i % 3) * 0.01], 0))
        rows.append(
            (100 + i, [float(x) for x in np.zeros(4) + 100 + (i % 3) * 0.01], 1)
        )
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = QS["embedding_label_silhouette"](spark, str(tmp_path)).collect()
    for r in out:
        assert r.mean_silhouette > 0.99


def test_rsi_bounds_and_all_gain_pins_100(spark, sf_smoke, tmp_path):
    for r in QS["window_rsi_indicator"](spark, sf_smoke).collect():
        assert 0.0 <= r.rsi_14 <= 100.0
        assert r.avg_gain_cents >= 0 and r.avg_loss_cents >= 0
    # strictly increasing daily revenue → RSI pinned at 100
    import datetime

    rows = [
        (
            i,
            datetime.datetime(1995, 1, 1) + datetime.timedelta(days=i),
            100.0 + i * 10,
        )
        for i in range(30)
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate timestamp, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = QS["window_rsi_indicator"](spark, str(tmp_path)).collect()
    assert out and all(r.rsi_14 == 100.0 for r in out)
    assert all(r.avg_loss_cents == 0 for r in out)


def test_jackknife_se_nonnegative_and_zero_on_identical_groups(
    spark, sf_smoke, tmp_path
):
    r = QS["agg_jackknife_variance"](spark, sf_smoke).collect()[0]
    assert r.jackknife_se >= 0
    assert r.n_groups == 25
    # identical per-group data → every leave-one-out estimate equals the
    # full estimate → SE exactly 0
    rows = [(k, g, 500.0) for g in range(5) for k in range(g * 10, g * 10 + 10)]
    spark.createDataFrame(
        rows, "c_custkey long, c_nationkey int, c_acctbal double"
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    out = QS["agg_jackknife_variance"](spark, str(tmp_path)).collect()[0]
    assert out.jackknife_se == pytest.approx(0.0, abs=1e-9)
    assert out.estimate == pytest.approx(500.0)


def test_vocab_jaccard_bounds_and_identity(spark, sf_smoke, tmp_path):
    for r in QS["text_vocab_jaccard_sources"](spark, sf_smoke).collect():
        assert 0.0 <= r.jaccard <= 1.0
        assert r.n_inter <= r.n_union
    docs = [
        (1, "alpha beta gamma", "en", "s1", 16),
        (2, "gamma beta alpha alpha", "en", "s2", 22),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = QS["text_vocab_jaccard_sources"](spark, str(tmp_path)).collect()
    assert out[0].jaccard == 1.0 and out[0].n_inter == 3


def test_permutation_test_p_bounds_and_null_behavior(spark, sf_smoke, tmp_path):
    r = QS["agg_permutation_test"](spark, sf_smoke).collect()[0]
    assert r.n_perms == 199
    assert 1.0 / 200 <= r.p_value <= 1.0
    # label-independent values -> p must be LARGE (the null holds by
    # construction: value identical for every row)
    import datetime

    rows = [
        (i, datetime.datetime(2024, 1, 1, 0, i % 60), i % 7, "t" + str(i % 3), 5.0, "{}")
        for i in range(300)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = QS["agg_permutation_test"](spark, str(tmp_path)).collect()[0]
    assert out.t_obs == 0.0 and out.p_value == 1.0


def test_bmp_parser_rejects_garbage_and_truncation(spark):
    from boann_ocsf_security_data_platform_spark.operators.multimodal import (
        _parse_bmp,
    )

    assert _parse_bmp(b"") is None
    assert _parse_bmp(b"not a bmp at all" * 10) is None
    assert _parse_bmp(b"BM" + bytes(20)) is None  # too short
    # valid header that DECLARES more pixels than the buffer holds
    import struct

    hdr = (
        b"BM"
        + struct.pack("<I", 54 + 100)
        + bytes(4)
        + struct.pack("<I", 54)
        + struct.pack("<I", 40)
        + struct.pack("<ii", 10, 10)  # needs 10 rows * 32-byte stride
        + struct.pack("<HH", 1, 24)
        + bytes(24)
    )
    r = _parse_bmp(hdr + bytes(10))  # only 10 pixel bytes present
    assert r is not None and r[5] is False  # size_ok False, not a crash
    # top-down flag: negative height
    hdr_td = (
        b"BM"
        + struct.pack("<I", 54)
        + bytes(4)
        + struct.pack("<I", 54)
        + struct.pack("<I", 40)
        + struct.pack("<ii", 1, -1)
        + struct.pack("<HH", 1, 24)
        + bytes(24)
        + bytes(4)
    )
    r = _parse_bmp(hdr_td)
    assert r is not None and r[4] is True and r[5] is True


def test_bollinger_pct_b_inside_band_meaning(spark, sf_smoke):
    rows = QS["window_bollinger_bands"](spark, sf_smoke).collect()
    assert rows
    for r in rows:
        # |close - ma| <= 2sd  <=>  0 <= pct_b <= 1; allow excursions but
        # sanity-pin the algebra: pct_b == (close - (ma-2sd)) / (4sd)
        if r.pct_b is not None and r.sd_dollars and r.sd_dollars > 0:
            sd_c = r.sd_dollars * 100
            recomputed = (r.close_cents - (r.ma_cents - 2 * sd_c)) / (4 * sd_c)
            assert abs(recomputed - r.pct_b) < 0.01
        assert r.bandwidth is None or r.bandwidth >= 0


def test_bellman_ford_triangle_inequality_and_source_zero(spark, sf_smoke):
    rows = QS["graph_bellman_ford_sssp"](spark, sf_smoke).collect()
    d = {r.nationkey: r.distance for r in rows}
    assert d.get(0) == 0.0
    reached = [v for v in d.values() if v is not None]
    assert all(v >= 0 for v in reached)
    # at sf0.001 the trade graph is sparse — just pin that SOMETHING
    # beyond the source is reached and nothing is negative; exact
    # reachability/values are the oracle's job
    assert len(reached) >= 2


def test_bellman_ford_unreached_stays_null(spark):
    from boann_ocsf_security_data_platform_spark.operators.graph import (
        bellman_ford_sssp,
    )

    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 2.0), (5, 6, 1.0)],  # 5->6 disconnected from 0
        "src long, dst long, w double",
    )
    d = {
        r.node: r.distance
        for r in bellman_ford_sssp(edges, source=0, iters=4).collect()
    }
    assert d[0] == 0.0 and d[1] == 1.0 and d[2] == 3.0
    assert d[6] is None and d[5] is None


def test_aging_buckets_partition_open_orders(spark, sf_smoke):
    rows = QS["orders_aging_buckets"](spark, sf_smoke).collect()
    n_open = (
        entrymod._t(spark, sf_smoke, "orders")
        .filter(F.col("o_orderstatus") != "F")
        .count()
    )
    assert sum(r.n_orders for r in rows) == n_open
    order = {"0-30": 0, "31-90": 1, "91-365": 2, "365+": 3}
    for r in rows:
        assert r.bucket in order
        assert r.min_age_days <= r.max_age_days


def test_capture_recapture_estimate_bounds(spark, sf_smoke):
    r = QS["events_capture_recapture"](spark, sf_smoke).collect()[0]
    # Chapman estimate can never be below the observed population minus
    # rounding, and overlap can't exceed either occasion
    assert r.m <= min(r.n1, r.n2)
    assert r.n_observed == r.n1 + r.n2 - r.m
    if r.chapman_estimate is not None:
        assert r.chapman_estimate >= r.n_observed - 1


def test_mahalanobis_outliers_scores_ordered_and_extreme_vector_wins(
    spark, sf_smoke, tmp_path
):
    rows = QS["embedding_mahalanobis_outliers"](spark, sf_smoke).collect()
    assert len(rows) == 20
    scores = [r.mahalanobis for r in rows]
    assert scores == sorted(scores, reverse=True)
    # a planted far-out vector must rank first
    import numpy as np

    data = [(i, [float(x) for x in np.ones(8) * (i % 5)], 0) for i in range(50)]
    data.append((999, [1e6] * 8, 1))
    spark.createDataFrame(
        data, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = QS["embedding_mahalanobis_outliers"](spark, str(tmp_path)).collect()
    assert out[0].vec_id == 999


def test_code_detection_separates_code_from_prose(spark, tmp_path):
    docs = [
        (1, "the quiet town sleeps under gentle rain tonight", "en", "prose", 47),
        (2, "for (i = 0; i < n; i++) { sum += a[i]; } // #inc", "en", "code", 48),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.source: r for r in QS["text_code_detection"](spark, str(tmp_path)).collect()
    }
    assert out["code"].code_share == 1.0 and out["prose"].code_share == 0.0
    assert out["code"].avg_symbol_ratio > out["prose"].avg_symbol_ratio


def test_rare_collapse_preserves_total_and_threshold(spark, sf_smoke):
    rows = QS["feature_rare_category_collapse"](spark, sf_smoke).collect()
    total = entrymod._t(spark, sf_smoke, "part").count()
    assert sum(r.n_rows for r in rows) == total
    for r in rows:
        if r.category != "__rare__":
            assert r.n_merged_categories == 1
            assert r.n_rows / total >= 0.005
    assert abs(sum(r.frequency for r in rows) - 1.0) < 1e-3


def test_peak_detection_finds_planted_spike(spark, tmp_path):
    import datetime

    rows = []
    eid = 0
    for d in range(30):
        # flat 10/day, except day 15 spikes to 50
        n = 50 if d == 15 else 10
        for j in range(n):
            eid += 1
            rows.append(
                (eid, datetime.datetime(2024, 1, 1 + d, j % 24), eid % 5,
                 "click", 1.0, "{}")
            )
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = QS["events_peak_detection"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0].day.day == 16 and out[0].n_events == 50
    assert out[0].spike_ratio == pytest.approx(5.0, rel=0.01)


def test_gumbel_p99_exceeds_mean_max(spark, sf_smoke):
    r = QS["agg_extreme_value_gumbel"](spark, sf_smoke).collect()[0]
    assert r.beta_dollars > 0
    assert r.p99_dollars > r.mu_dollars
    # mu < mean of block maxima (Gumbel mean = mu + gamma*beta > mu)
    assert r.mu_dollars < r.mean_max_cents / 100.0


def test_repetition_ratio_flags_looping_text(spark, tmp_path):
    docs = [
        (1, "one two three " * 20, "en", "loop", 280),
        (2, "every word here is completely unlike all other words present",
         "en", "fresh", 61),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.source: r
        for r in QS["text_repetition_ratio"](spark, str(tmp_path)).collect()
    }
    assert out["loop"].avg_repetition > 0.9
    assert out["fresh"].avg_repetition == 0.0
    assert out["loop"].n_degenerate == 1 and out["fresh"].n_degenerate == 0


def test_weibull_k_matches_cv_formula(spark, sf_smoke):
    r = QS["orders_weibull_moments_fit"](spark, sf_smoke).collect()[0]
    assert r.n > 0 and r.cv > 0
    assert r.weibull_k == pytest.approx(r.cv ** -1.086, rel=1e-3)


def test_int8_quant_error_bounded_by_half_step(spark, sf_smoke):
    for r in QS["embedding_int8_quant_error"](spark, sf_smoke).collect():
        # the linear-rounding contract: per-component error <= scale/2
        # (tiny float->double slack allowed)
        assert r.max_err_over_scale <= 0.5 + 1e-6
        assert 0 <= r.mean_abs_err <= r.max_abs_err
        assert r.rmse <= r.max_abs_err + 1e-12


def test_missing_days_detects_planted_hole(spark, sf_smoke, tmp_path):
    r = QS["events_missing_days"](spark, sf_smoke).collect()[0]
    assert r.expected_days == r.observed_days + r.n_missing
    assert 0 < r.coverage <= 1.0
    import datetime

    rows = []
    eid = 0
    for d in [1, 2, 3, 7, 8]:  # days 4-6 missing: 3-day hole
        eid += 1
        rows.append(
            (eid, datetime.datetime(2024, 1, d), 1, "click", 1.0, "{}")
        )
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = QS["events_missing_days"](spark, str(tmp_path)).collect()[0]
    assert out.expected_days == 8 and out.observed_days == 5
    assert out.n_missing == 3 and out.longest_gap_days == 3


def test_supplier_latency_ranking_is_worst_first(spark, sf_smoke):
    rows = QS["supplier_latency_ranking"](spark, sf_smoke).collect()
    assert 0 < len(rows) <= 10
    rates = [r.slow_rate for r in rows]
    assert rates == sorted(rates, reverse=True)
    for r in rows:
        assert r.n_lines >= 10
        assert 0.0 <= r.slow_rate <= 1.0
        assert r.worst_days >= r.avg_latency_days


def test_cohens_d_hedges_relationship(spark, sf_smoke):
    r = QS["agg_cohens_d_effect_size"](spark, sf_smoke).collect()[0]
    # Hedges' g shrinks d toward zero, same sign
    assert abs(r.hedges_g) <= abs(r.cohens_d) + 1e-9
    assert (r.hedges_g >= 0) == (r.cohens_d >= 0)


def test_dwell_histogram_shares_sum_to_one(spark, sf_smoke):
    rows = QS["events_dwell_time_histogram"](spark, sf_smoke).collect()
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-3
    bounds = {0: (0, 0), 1: (1, 9), 2: (10, 99), 3: (100, 999),
              4: (1000, 9999), 5: (10000, 99999)}
    for r in rows:
        if r.decade in bounds:
            lo, hi = bounds[r.decade]
            assert r.min_gap_s >= lo and r.max_gap_s <= hi


def test_brown_forsythe_detects_constructed_heteroscedasticity(
    spark, tmp_path
):
    # group A tightly clustered, group B wildly spread -> W must be large
    rows = []
    for i in range(200):
        rows.append(("A", 1.0, 100.0 + (i % 3)))
        rows.append(("B", 1.0, 100.0 + (i % 80) * 25.0))
    spark.createDataFrame(
        rows, "l_returnflag string, l_quantity double, l_extendedprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    r = QS["agg_brown_forsythe_test"](spark, str(tmp_path)).collect()[0]
    assert r.heteroscedastic is True and r.bf_statistic > 100


def test_partial_correlation_bounds_and_confounder_collapse(spark, tmp_path):
    # construct x,y driven ENTIRELY by z: partial corr must collapse
    # toward 0 while raw corr stays high
    rows = []
    for i in range(500):
        z = float(i % 97)
        rows.append(("A", z * 2.0 + (i % 7) * 0.01, z * 3.0 + (i % 5) * 0.01, z / 100.0))
    spark.createDataFrame(
        rows,
        "l_returnflag string, l_quantity double, l_extendedprice double, "
        "l_discount double",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    r = QS["agg_partial_correlation"](spark, str(tmp_path)).collect()[0]
    assert r.r_qty_price > 0.99  # raw association is near-perfect
    assert abs(r.partial_corr) < 0.5  # mostly explained by the confounder
    for v in (r.r_qty_price, r.r_qty_discount, r.r_price_discount):
        assert -1.0 <= v <= 1.0


def test_seasonal_decomposition_profile_shape(spark, sf_smoke):
    rows = QS["orders_seasonal_decomposition"](spark, sf_smoke).collect()
    assert 1 <= len(rows) <= 12
    for r in rows:
        assert 1 <= r.month_of_year <= 12
        assert r.mean_abs_dev_cents >= 0
        assert abs(r.seasonal_cents) <= r.mean_abs_dev_cents * 2 + 1


def test_katz_floor_and_connectivity_monotonicity(spark, sf_smoke):
    rows = QS["graph_katz_centrality"](spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert r.katz >= 1.0  # the +1 base is a hard floor
    # at least one node accumulates path mass beyond the floor
    assert max(r.katz for r in rows) > 1.0


def test_good_turing_rank_adaptive_head_and_planted_singletons(
    spark, sf_smoke, tmp_path
):
    rows = QS["text_good_turing_smoothing"](spark, sf_smoke).collect()
    assert 1 <= len(rows) <= 10  # rank-adaptive head always non-empty
    for r in rows:
        assert 0.0 < r.raw_mass <= 1.0
    # constructed corpus with known counts: 3 singletons, 1 doubleton
    docs = [(1, "apple banana cherry dog dog", "en", "s1", 27)]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.count_r: r for r in QS["text_good_turing_smoothing"](
        spark, str(tmp_path)).collect()}
    assert out[1].n_types == 3 and out[2].n_types == 1
    # r* for r=1: (1+1) * N_2/N_1 = 2/3
    import pytest as _pt

    assert out[1].r_star == _pt.approx(2.0 / 3.0, rel=1e-4)
    # unseen mass N_1 * 1 / N = 3/5
    assert out[1].raw_mass == _pt.approx(0.6, rel=1e-4)


def test_bigram_entropy_rate_bounds_and_deterministic_text(spark, tmp_path):
    # a fully deterministic sequence (each word always followed by the
    # same next word) has conditional entropy exactly 0
    docs = [(1, "a b c a b c a b c a b", "en", "det", 21),
            (2, "x y x z x y x w x q x v", "en", "mixed", 23)]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.source: r for r in QS["text_bigram_entropy_rate"](
        spark, str(tmp_path)).collect()}
    assert out["det"].cond_entropy_nats == 0.0
    assert out["mixed"].cond_entropy_nats > 0.5
    assert out["mixed"].cond_entropy_bits == pytest.approx(
        out["mixed"].cond_entropy_nats / math.log(2), rel=1e-4
    )


def test_nearest_centroid_confusion_diagonal_on_separated_blobs(
    spark, sf_smoke, tmp_path
):
    rows = QS["embedding_nearest_centroid_confusion"](spark, sf_smoke).collect()
    n_total = sum(r.n for r in rows)
    n_vecs = entrymod._t(spark, sf_smoke, "embeddings").count()
    assert n_total == n_vecs  # every vector classified exactly once
    # far-apart blobs -> perfectly diagonal confusion
    import numpy as np

    data = []
    for i in range(30):
        data.append((i, [float(x) for x in np.zeros(4) + (i % 3)], 0))
        data.append((100 + i, [float(x) for x in np.zeros(4) + 50 + (i % 3)], 1))
    spark.createDataFrame(
        data, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = QS["embedding_nearest_centroid_confusion"](
        spark, str(tmp_path)
    ).collect()
    assert all(r.true_label == r.predicted_label for r in out)
    assert sum(r.n for r in out) == 60


def test_anderson_darling_accepts_normal_rejects_uniform(spark, tmp_path):
    # z-standardized normal draws -> small A2; uniform data -> large A2
    import numpy as np

    rng = np.random.default_rng(7)
    rows = [("N", 1.0, float(v)) for v in rng.normal(0.05, 0.01, 800)]
    rows += [("U", 1.0, float(v)) for v in rng.uniform(0.0, 0.1, 800)]
    df = spark.createDataFrame(
        [(g, q, d, i, i % 7) for i, (g, q, d) in enumerate(rows)],
        "l_returnflag string, l_quantity double, l_discount double, "
        "l_orderkey long, l_linenumber int",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = {r.l_returnflag: r for r in QS["agg_anderson_darling_normality"](
        spark, str(tmp_path)).collect()}
    assert out["N"].a_squared < out["U"].a_squared
    assert out["U"].reject_normal_1pct is True
    assert out["N"].a_squared < 3.878


def test_best_split_exactly_one_best_and_gini_bounds(spark, sf_smoke):
    rows = QS["feature_best_split_gini"](spark, sf_smoke).collect()
    assert rows
    assert sum(1 for r in rows if r.is_best) >= 1
    best = min(r.weighted_gini for r in rows)
    for r in rows:
        assert 0.0 <= r.weighted_gini <= 0.5 + 1e-9  # binary Gini cap
        assert r.is_best == (r.weighted_gini == best)
    ths = [r.threshold for r in sorted(rows, key=lambda r: r.candidate)]
    assert ths == sorted(ths)  # quantile thresholds are monotone


def test_harmonic_closeness_bounds(spark, sf_smoke):
    rows = QS["graph_harmonic_closeness"](spark, sf_smoke).collect()
    n = len(rows)
    for r in rows:
        assert 0 <= r.n_reached <= n - 1
        # harmonic closeness is at most n_reached (each term <= 1)
        assert 0.0 <= r.harmonic_closeness <= r.n_reached + 1e-9


def test_cuped_reduction_is_corr_squared(spark, sf_smoke):
    r = QS["events_cuped_variance_reduction"](spark, sf_smoke).collect()[0]
    if r.variance_reduction is not None:
        assert 0.0 <= r.variance_reduction <= 1.0
        assert r.var_cuped <= r.var_y + 1e-6
        assert r.var_cuped == pytest.approx(
            r.var_y * (1 - r.variance_reduction), rel=1e-2
        )


def test_gif_parser_bitfields_and_garbage(spark):
    from boann_ocsf_security_data_platform_spark.operators.multimodal import _parse_gif

    assert _parse_gif(b"") is None
    assert _parse_gif(b"NOTGIF" + bytes(20)) is None
    # hand-built: 3x2, GCT of 4 colors (N=1), packed = 1|111|0|001 = 0xF1
    hdr = b"GIF89a" + b"\x03\x00\x02\x00" + bytes([0xF1, 0, 0])
    full = hdr + bytes(12) + b"\x3b"
    r = _parse_gif(full)
    assert r == (3, 2, 4, 8, True)
    # truncated table -> size_ok False
    r2 = _parse_gif(hdr + bytes(5))
    assert r2 is not None and r2[4] is False


def test_luhn_known_vector_and_distribution_covers_keys(spark, sf_smoke):
    rows = QS["scalar_luhn_checksum"](spark, sf_smoke).collect()
    n_orders = entrymod._t(spark, sf_smoke, "orders").count()
    assert sum(r.n_keys for r in rows) == n_orders
    assert all(0 <= r.check_digit <= 9 for r in rows)
    # known vector: 7992739871 -> check digit 3 (classic Luhn example),
    # padded to 12 digits (leading zeros don't change the Luhn sum parity
    # here because 12 and 10 digits share the doubling phase)
    import tempfile

    tmp = tempfile.mkdtemp()
    spark.createDataFrame(
        [(7992739871,)], "o_orderkey long"
    ).write.mode("overwrite").parquet(f"{tmp}/orders.parquet")
    out = QS["scalar_luhn_checksum"](spark, tmp).collect()
    assert len(out) == 1 and out[0].check_digit == 3


def test_mean_family_inequality(spark, sf_smoke):
    for r in QS["agg_mean_family"](spark, sf_smoke).collect():
        assert r.arithmetic_mean >= r.geometric_mean >= r.harmonic_mean
        assert r.harmonic_mean > 0


def test_casing_profile_flags_shouting(spark, tmp_path):
    docs = [(1, "BUY NOW LIMITED OFFER ACT FAST", "en", "spam", 30),
            (2, "a quiet evening walk in the park", "en", "calm", 32)]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.source: r for r in QS["text_casing_profile"](
        spark, str(tmp_path)).collect()}
    assert out["spam"].shout_ratio == 1.0
    assert out["calm"].shout_ratio == 0.0


def test_nearest_neighbor_matches_bruteforce_on_small_day(spark, tmp_path):
    import datetime

    prices = [100.00, 100.50, 102.00, 110.00, 110.40]
    rows = [
        (i, datetime.datetime(2024, 1, 1), p) for i, p in enumerate(prices)
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate timestamp, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    r = QS["orders_nearest_price_neighbor"](spark, str(tmp_path)).collect()[0]
    # brute-force nn gaps in cents: [50, 50, 150, 40, 40] -> mean 66
    assert r.n_orders == 5
    assert r.min_nn_gap_cents == 40
    assert r.mean_nn_gap_cents == 66
    assert r.n_near_twins == 4  # gaps under 100 cents


def test_basket_profile_partitions_orders(spark, sf_smoke):
    rows = QS["orders_basket_size_profile"](spark, sf_smoke).collect()
    n_orders = (
        entrymod._t(spark, sf_smoke, "lineitem")
        .select("l_orderkey")
        .distinct()
        .count()
    )
    assert sum(r.n_orders for r in rows) == n_orders
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-3
    for r in rows:
        assert r.basket_size >= 1
