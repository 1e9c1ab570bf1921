"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Methodology: one shared session (JVM startup excluded — the reference's
per-process cost model would count it, a long-lived engine shouldn't),
one warm-up pass of a cheap query, then each headline query executed to a
no-op sink (full materialization, no driver collect); best of N runs per
query (default 3, env SPARK_GRAFT_BENCH_RUNS) to damp co-tenant
machine-load noise — the JSON records n_runs plus each query's per-run
spread so a noisy co-tenant round is distinguishable from a regression.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "join_theta_inequality",
    "agg_rollup",
    "window_running_sum",
    "topk_per_group",
    "events_sessionize",
    "events_tumbling_window",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "knn_bruteforce_cosine",
    "text_quality_metrics",
    "multimodal_media_meta",
    # round-3 additions (new ops; r1/r2 totals exclude these three)
    "text_tfidf_top_terms",
    "text_strip_boilerplate",
    "corpus_mixture_sample",
    # round-3 fourth wave (r1/r2 totals exclude these too)
    "corpus_train_val_test_split",
    "corpus_weighted_sample",
    "events_transition_counts",
    # round-4 wave (excluded from core15 as well)
    "join_lateral_topk",
    "embedding_kmeans_refine",
    "text_bigram_lm_score",
    "dedup_containment_pairs",
    "corpus_dsir_weights",
    # round-4 second wave (excluded from core15 as well)
    "text_segment_dedup",
    "dedup_cross_corpus",
    "graph_pagerank",
    "embedding_pq_encode",
    # round-4 third wave (excluded from core15 as well)
    "events_time_weighted_avg",
    "events_ohlc_bars",
    "events_scd2",
    "events_top_paths",
    "embedding_dim_profile",
    "recursive_nation_reachability",
    "orders_in_flight_by_month",
    # round-4 sixth wave (excluded from core15 as well)
    "text_heavy_hitter_tokens",
    "dedup_duplicate_spans",
    "graph_triangle_count",
    "join_bloom_filtered",
    "events_window_funnel",
    # round-4 seventh wave (excluded from core15 as well)
    "corpus_curation_funnel",
    "agg_incremental_rollup_merge",
    "text_rake_keywords",
    "events_session_window_native",
    "events_rolling_distinct_users",
    # round-5 waves 26-28 (excluded from core15 as well)
    "knn_ivf_index_persisted",
    "text_bpe_roundtrip",
    "events_cusum_changepoint",
    "embedding_random_projection",
    "agg_ks_test",
    "multimodal_webdataset_roundtrip",
    # round-5 waves 30-36 (excluded from core15 as well)
    "text_hash_features",
    "graph_link_prediction",
    "events_kaplan_meier",
    "range_merge_intervals",
    "text_span_corruption_stats",
    "corpus_quality_logreg",
    "multimodal_wav_meta_roundtrip",
    # round-5 waves 37-41 (excluded from core15 as well; the bucketed-join
    # entry stays OUT: its per-call bucketed-table rewrite measures the
    # one-time write, not a query)
    "multimodal_pcm_energy_roundtrip",
    "agg_decimal_exact_revenue",
    "corpus_dedup_report",
    "graph_personalized_pagerank",
    # round-6 waves 42-49 (excluded from core15 as well)
    "text_bm25_retrieval",
    "graph_hits_hubs_authorities",
    "join_fuzzy_entity_resolution",
    "agg_bootstrap_subsample_ci",
    "multimodal_png_ihdr_roundtrip",
    "events_ewma_snapshot",
    "text_pmi_collocations",
    "embedding_pca_power_iteration",
    "dedup_weighted_jaccard",
    "multimodal_mp4_meta_roundtrip",
    "corpus_sequence_packing",
    "text_kneser_ney_bigrams",
    "graph_community_modularity",
    "text_token_burstiness",
    "embedding_mmr_rerank",
    "text_textrank_keywords",
    "knn_hard_negatives",
    "events_retention_triangle",
    "graph_degree_assortativity",
    # round-7 waves 81-84 (excluded from core15 as well)
    "agg_spearman_rank_corr",
    "join_market_basket_rules",
    "orders_rfm_segmentation",
    "events_interarrival_expfit",
    "text_js_divergence_sources",
    "events_markov_stationary",
    "agg_cramers_v",
    "corpus_temperature_mixture",
    "embedding_label_silhouette",
    "window_rsi_indicator",
    "agg_jackknife_variance",
    "text_vocab_jaccard_sources",
    "agg_permutation_test",
    "multimodal_bmp_roundtrip",
    "window_bollinger_bands",
    "graph_bellman_ford_sssp",
    "orders_aging_buckets",
    "events_capture_recapture",
    "embedding_mahalanobis_outliers",
    "text_code_detection",
    "feature_rare_category_collapse",
    "events_peak_detection",
    "agg_extreme_value_gumbel",
    "text_repetition_ratio",
    "orders_weibull_moments_fit",
    "embedding_int8_quant_error",
    "events_missing_days",
    "supplier_latency_ranking",
    "agg_cohens_d_effect_size",
    "events_dwell_time_histogram",
    "agg_brown_forsythe_test",
    "agg_kruskal_wallis",
    "graph_clustering_coefficient",
    "agg_kendall_tau_binned",
    "events_hurst_exponent",
    "feature_mrmr_selection",
    "corpus_quality_dedup_interaction",
    # round-8 additions (excluded from core15 as well)
    "agg_spearman_binned",
]

# HEADLINE GROWTH POLICY (declared round 8, r7 VERDICT item #7): the suite
# stays at <= 125 entries so best-of-3 measurement wall-clock stays ~6 min
# and the compact tail stays parseable. Each round may add its handful of
# new-wave entries; once 125 would be exceeded, the cheapest non-core
# entries rotate OUT of HEADLINE (they remain fully covered by the
# per-round oracle sweeps and the sf0.1->sf1->sf10 scale curves in
# COVERAGE.md — HEADLINE is the timing panel, not the correctness gate).
# CORE15 never rotates: it is the only round-over-round comparable total.

# the r1/r2 comparable subset is exactly the first 15 headline entries;
# every later wave is additive and excluded from the round-over-round total
CORE15 = HEADLINE[:15]


def compact_summary(
    timings: dict[str, float],
    core15: list[str],
    sf: float | None,
    n_runs: int,
    isolated: dict[str, float] | None = None,
    limit: int = 1800,
    load: dict[str, list[float]] | None = None,
) -> str:
    """The driver parses the LAST stdout line from a ~2 KB tail capture —
    build the summary and degrade per-query detail (2-decimal times, then
    core15-only) until the line fits. Unit-tested at 100 synthetic queries
    (tests/test_bench_summary.py) so suite growth can never push the
    headline metric past the tail window again (the round-4 "parsed":
    null incident)."""
    summary = {
        "metric": "headline_suite_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": dict(timings),
        "sf": sf,
        "n_runs": n_runs,
        # subtotal over the r1/r2 headline set — compare THIS to
        # prior rounds' totals (later waves are additive).
        # Round-over-round deltas on a single query must be read
        # against same-box variance (measured 35% same-query
        # same-plan swing r4); per-run spreads live in
        # BENCH_runs_verbose.json and the earlier stdout line.
        "core15_seconds": round(sum(timings[q] for q in core15), 3),
        "notes": "best-of-N shared-box; runs in BENCH_runs_verbose.json",
    }
    if load:
        # r10 VERDICT item #5: driver-capture totals drifted +23% between
        # rounds with zero code change on the moved entries; recording the
        # box's 1/5/15-min load before and after the suite makes the
        # environmental-vs-regression adjudication mechanical.
        summary["load"] = load
    if isolated:
        # round-close protocol (r5 VERDICT item #4): the most expensive
        # suite queries re-measured in a FRESH session, best-of-5 — the
        # co-tenant-noise adjudication baseline alongside in-suite times
        summary["isolated"] = {k: round(v, 3) for k, v in isolated.items()}
    line = json.dumps(summary)
    if len(line) > limit:
        summary["queries"] = {k: round(v, 2) for k, v in timings.items()}
        line = json.dumps(summary)
        if len(line) > limit:
            summary["queries"] = {k: round(timings[k], 2) for k in core15}
            summary["notes"] = "per-query detail in BENCH_runs_verbose.json"
            line = json.dumps(summary)
        if len(line) > limit and "isolated" in summary:
            summary.pop("isolated")
            line = json.dumps(summary)
        if len(line) > limit:
            # last resort: totals only — the headline metric must survive
            summary["queries"] = {}
            line = json.dumps(summary)
    return line


def isolated_rerun(
    names: list[str], sf_dir: str, n_runs: int = 5, timeout: int = 900
) -> dict[str, list[float]]:
    """Re-measure each query in its own FRESH interpreter + Spark session
    (subprocess), best-of-``n_runs`` — isolates the measurement from suite
    co-tenancy (cache pressure, ContextCleaner churn, JVM state). This is
    the adjudication protocol the r5 judge used by hand for
    knn_bruteforce_cosine (in-suite 1.22 s vs isolated 0.792 s); running
    it at every round close makes in-suite noise self-documenting.

    PROTOCOL NOTE (r7 VERDICT item #4): run 1 of each fresh session
    carries JVM/codegen/page-cache warmup beyond the setop_union_all
    warm-up query (measured r7: 12.3-14.9 s first run vs 3-7 s later
    runs). The recorded statistic is min over n_runs, which discards the
    warmup run by construction — read the per-run arrays in
    BENCH_runs_verbose.json with that in mind; run 1 is not a
    regression signal."""
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    template = """
import json, sys, time
sys.path.insert(0, {here!r})
from boann_ocsf_security_data_platform_spark import get_spark
import __spark_entry__ as entrymod
spark = get_spark(app_name="boann-bench-iso")
spark.sparkContext.setLogLevel("ERROR")
qs = entrymod.queries()
qs["setop_union_all"](spark, {sf_dir!r}).write.format("noop").mode("overwrite").save()
runs = []
for _ in range({n_runs}):
    t0 = time.perf_counter()
    qs[{name!r}](spark, {sf_dir!r}).write.format("noop").mode("overwrite").save()
    runs.append(round(time.perf_counter() - t0, 3))
print("ISO " + json.dumps(runs))
"""
    out: dict[str, list[float]] = {}
    for name in names:
        code = template.format(
            here=here, sf_dir=sf_dir, n_runs=n_runs, name=name
        )
        try:
            proc = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True,
                text=True,
                timeout=timeout,
                cwd=here,
            )
            for line in proc.stdout.splitlines():
                if line.startswith("ISO "):
                    out[name] = json.loads(line[4:])
                    break
        except (subprocess.TimeoutExpired, OSError, ValueError):
            continue
    return out


def _cpu_stat() -> list[int] | None:
    """Aggregate jiffies from /proc/stat (user nice system idle iowait irq
    softirq steal ...), or None off-Linux."""
    try:
        with open("/proc/stat") as f:
            return [int(x) for x in f.readline().split()[1:]]
    except (OSError, ValueError):
        return None


def _steal_pct(before: list[int] | None, after: list[int] | None):
    """Hypervisor steal share of all CPU time between two _cpu_stat()
    samples, as a rounded percentage — or None when unavailable.

    Round-13 finding: the loadavg rule is blind to HOST-level contention.
    This round's first idle capture ran at guest loadavg 0.5
    (rule satisfied) yet a 32-thread calibration loop measured 11% steal
    and ~57% of nominal throughput — the co-tenant pressure lives in the
    hypervisor, where os.getloadavg() cannot see it. Stamping the steal
    fraction over the suite makes THAT contamination adjudicable the
    same way the load field made guest co-tenancy adjudicable."""
    if not before or not after or len(before) < 8 or len(after) < 8:
        return None
    d = [a - b for a, b in zip(after, before)]
    tot = sum(d)
    return round(100.0 * d[7] / tot, 2) if tot > 0 else None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from boann_ocsf_security_data_platform_spark import get_spark

    import __spark_entry__ as entrymod

    # Load rule (round-11 verdict item #7): a capture started on a busy box
    # needs prose adjudication afterwards, so don't start one — wait for the
    # 1-min load to drop under 1.0 (bounded: co-tenants may never go idle;
    # after the cap, proceed and stamp the waiver so the artifact says WHY
    # the numbers ran hot instead of leaving it to round-over-round
    # archaeology). Override the cap with SPARK_GRAFT_BENCH_LOAD_WAIT=0 while
    # iterating locally. Round-12 lesson (r12 VERDICT #1: both captures ran
    # at loadavg 16-27, the 600 s cap expired, and the whole round's perf
    # comparison was non-adjudicable): a hot capture is WORSE than a late
    # one, so the default cap is now an hour — a 15 GB co-tenant synthesis
    # finishes inside it — and tools/round_close.py refuses to ship a
    # headline BENCH whose rule stamped satisfied: false.
    load_rule: dict | None = None
    wait_cap = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_WAIT", "3600"))
    try:
        waited = 0.0
        while os.getloadavg()[0] > 1.0 and waited < wait_cap:
            time.sleep(15.0)
            waited += 15.0
        load_before = [round(x, 2) for x in os.getloadavg()]
        load_rule = {
            "threshold": 1.0,
            "waited_sec": waited,
            "satisfied": load_before[0] <= 1.0,
        }
    except OSError:
        load_before = None
    cpu_before = _cpu_stat()

    spark = get_spark(app_name="boann-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # warm-up: JIT + filesystem caches on a trivial query
    qs["setop_union_all"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    spreads: dict[str, list[float]] = {}
    for name in HEADLINE:
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        timings[name] = min(runs)
        spreads[name] = runs

    core15 = CORE15
    # Verbose per-run spreads go to a FILE (and an EARLY stdout line), never
    # the last line: in round 4 the runs arrays grew the single JSON line
    # past the driver's ~2 KB stdout tail-capture window and the round's
    # headline metric was truncated mid-JSON ("parsed": null). The driver
    # parses the LAST stdout line, so the compact summary must come last.
    # isolated-close protocol: top-N most expensive suite queries re-run in
    # fresh sessions (0 disables — set SPARK_GRAFT_BENCH_ISOLATED=0 while
    # iterating locally; the driver's per-round run keeps the default)
    n_iso = int(os.environ.get("SPARK_GRAFT_BENCH_ISOLATED", "5"))
    iso_runs: dict[str, list[float]] = {}
    if n_iso > 0:
        top = sorted(timings, key=timings.get, reverse=True)[:n_iso]
        iso_runs = isolated_rerun(top, sf_dir)
    isolated = {k: min(v) for k, v in iso_runs.items() if v}

    # Capture load BEFORE dumping the verbose artifact (ADVICE r11: the
    # file was written first, so the persisted artifact never carried the
    # load field — only stdout did, defeating the r10 verdict-#5 goal).
    # The suite has fully finished at this point, so measuring here is
    # equivalent.
    try:
        load_after = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        load_after = None
    load = (
        {"before": load_before, "after": load_after}
        if load_before or load_after
        else None
    )
    if load is not None and load_rule is not None:
        load["rule"] = load_rule
    steal = _steal_pct(cpu_before, _cpu_stat())
    if load is not None and steal is not None:
        load["steal_pct"] = steal
    verbose = {
        "n_runs": n_runs,
        "runs": spreads,
        "sf": sf,
        "isolated_runs": iso_runs,
        "load": load,
    }
    verbose_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_runs_verbose.json"
    )
    try:
        with open(verbose_path, "w") as f:
            json.dump(verbose, f)
    except OSError:
        pass

    print(json.dumps(verbose))
    print(
        compact_summary(
            timings, core15, sf, n_runs, isolated=isolated, load=load
        )
    )


if __name__ == "__main__":
    main()
