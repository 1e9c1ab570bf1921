"""Driver contract: flagship entry, query inventory, and DuckDB oracles.

Every entry in ``queries()`` is an operator/capability from SURVEY.md §2
(relational surface §2.7 + LLM-pipeline extensions) expressed Spark-first;
``oracle_sql()`` holds the equivalent DuckDB SQL over the same parquet
tables. Column names and types are aligned pair-wise; double-valued
aggregates are rounded identically on both sides so order-of-accumulation
noise cannot break the value hash. Approximate operators
(approx_count_distinct, LSH top-k) intentionally have NO oracle entry —
the driver records a rows-only check for them.
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from boann_ocsf_security_data_platform_spark.operators import (
    exact_dedup,
    lang_id,
    simhash16,
    text_quality,
)
from boann_ocsf_security_data_platform_spark.operators import gates as _gates
from boann_ocsf_security_data_platform_spark.operators.gates import size_gated
from boann_ocsf_security_data_platform_spark.operators.dedup import (
    _xor_constant,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
)
from boann_ocsf_security_data_platform_spark.operators.multimodal import (
    attach_binary_payload,
    extract_media_meta,
)
from boann_ocsf_security_data_platform_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_ivf,
    cosine_topk_lsh,
    embedding_near_dup_pairs,
)
from boann_ocsf_security_data_platform_spark.operators.text import (
    LANG_STOPWORDS,
    STOPWORDS_EN,
    bpe_ish_tokens,
)
from boann_ocsf_security_data_platform_spark.sources import load_table

SF_SMOKE = "/root/testdata/sf0.001"

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _collapse_exact_docs(dd: DataFrame, n: int) -> DataFrame:
    """size_gated scale arm shared by the documents pairwise entries
    (prefix-filter, containment): collapse exact duplicates to one
    representative per content hash BEFORE the similarity join. Replica
    pairs are similarity-1.0 TRUE OUTPUT growing with copies² and belong
    to exact dedup's linear report (pipeline-order discipline); genuine
    near-dup pairs survive among the distinct texts."""
    keep = exact_dedup(dd).select(F.col("keep_id").alias("doc_id"))
    # the survivor-id set is corpus-scaling (derived aggregate — estimate
    # unreliable): pin sort-merge so it can never become a broadcast build
    return dd.join(keep.hint("merge"), "doc_id")


def _pin(df: DataFrame, pin: bool) -> DataFrame:
    """Conditional sort-merge pin for a corpus-scaling join input —
    ``hint("merge")`` when ``pin`` (derived from a MEASURED table count,
    never an estimate), planner freedom otherwise. See
    operators.dedup._corpus_sized for the defect class this guards."""
    return df.hint("merge") if pin else df


# Per-sort-task row target for sized fact shuffles: ~4M narrow fact rows
# ≈ 130 MB unsafe sort memory — spills rarely, and a spilled merge holds
# few enough files that the per-reader read-ahead buffers (unmanaged
# heap, ~2 MB each) stay bounded. The round-12 q8 find: at the session
# default of 32 shuffle partitions a FULL-fact sort-merge join sorts
# 19M rows per task, and 32 concurrent tasks × two sides × dozens of
# spill readers OOM'd the default 8g heap in the merge phase — the
# filtered TPC-H siblings (q3/q5/q7) survive only because their date
# predicates cut the sorted volume first.
_FACT_SORT_TARGET_ROWS = 4_000_000


def _widen_fact_shuffle(df: DataFrame, key: str, n_rows: int) -> DataFrame:
    """Spill-aware shuffle sizing for an UNFILTERED fact join side:
    above the fact gate, hash-repartition on the join key to a measured
    partition count (~_FACT_SORT_TARGET_ROWS rows per sort task) instead
    of riding the session-wide 32. Both join sides must be widened with
    the SAME n_rows so the partition counts match and the sort-merge
    join reuses the partitioning (no extra exchange — this IS the
    join's shuffle, just sized). Below the gate: planner freedom, the
    default partitioning is measured-safe and small-scale plans keep
    their broadcast forms."""
    if n_rows <= _gates.PIN_FACT_MIN_ROWS:
        return df
    parts = min(2048, max(32, n_rows // _FACT_SORT_TARGET_ROWS + 1))
    return df.repartition(parts, F.col(key))


def _order_buckets(
    df: DataFrame, col: str, ascending: bool = True, n_buckets: int = 200
) -> DataFrame:
    """Quantile-bucket a GLOBAL window order so running aggregates
    parallelize (round-11 defect class: ``Window.orderBy`` with no
    partition key is the rank-window funnel at cardinality 1 — the whole
    grain sorts in ONE task; 437 s for the skyline's 150M rows at sf100).

    Adds a ``bkt`` column that RESPECTS the global order on ``col``:
    every row of bucket i sorts before every row of bucket i+1, and
    equal values always share a bucket (assignment depends on the value
    alone). Any running aggregate over the global order then decomposes
    exactly into (aggregate over all earlier buckets — a prefix over the
    tiny bucket-summary table) ⊕ (in-bucket running aggregate over a
    ``partitionBy("bkt")`` window). Boundaries come from approxQuantile
    — a bounded driver-side model (≤ n_buckets doubles, never data);
    their QUALITY affects only bucket balance, never values, so sketch
    nondeterminism is harmless. ``col`` must be non-null."""
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = sorted(set(df.stat.approxQuantile(col, probs, 0.001)))
    if not bounds:
        return df.withColumn("bkt", F.lit(0))
    arr = F.array(*[F.lit(float(b)) for b in bounds])
    v = F.col(col)
    cond = (lambda b: b < v) if ascending else (lambda b: b > v)
    return df.withColumn("bkt", F.size(F.filter(arr, cond)))


def _bucketed_ntile(
    df: DataFrame,
    value_col: str,
    key_col: str,
    k: int,
    ascending: bool = True,
) -> DataFrame:
    """Exact ``ntile(k)`` over the deterministic (value, unique key)
    order WITHOUT a global single-task sort (round-11 defect class): the
    global row rank r = lower-bucket prefix count + in-bucket row_number
    (equal values share a bucket — see :func:`_order_buckets`), and
    ntile's remainder rule is closed-form in (r, n): the first n%k
    buckets take ceil(n/k) rows. Bit-identical to the literal ntile;
    adds a ``bin`` column, drops the helper columns. ``ascending=False``
    mirrors ``orderBy(desc(value), key)`` (the key tie-break stays
    ascending, matching the entries' deterministic orders)."""
    bkts = _order_buckets(df, value_col, ascending=ascending)
    order_v = F.asc(value_col) if ascending else F.desc(value_col)
    w_in = Window.partitionBy("bkt").orderBy(order_v, F.asc(key_col))
    w_pre = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    prefix = (
        bkts.groupBy("bkt")
        .agg(F.count(F.lit(1)).alias("_bn"))
        .select(
            "bkt",
            F.coalesce(F.sum("_bn").over(w_pre), F.lit(0)).alias("_prev_n"),
        )
    )
    nn = df.agg(F.count(F.lit(1)).alias("_n"))
    r = F.col("_prev_n") + F.row_number().over(w_in)
    q = F.floor(F.col("_n") / k)
    rem = F.col("_n") % k
    thr = rem * (q + 1)
    bin_expr = (
        F.when(r <= thr, F.floor((r - 1) / (q + 1)))
        .otherwise(rem + F.floor((r - thr - 1) / q))
        + 1
    )
    return (
        bkts.join(F.broadcast(prefix), "bkt")
        .crossJoin(F.broadcast(nn))
        .withColumn("bin", bin_expr)
        .drop("bkt", "_prev_n", "_n")
    )


def _bucketed_ntiles(
    df: DataFrame,
    specs: "list[tuple[str, bool, str]]",
    key_col: str,
    k: int,
) -> DataFrame:
    """Several exact ntiles over one frame with ONE sketch action:
    ``specs`` is [(value_col, ascending, out_col), ...]. Chaining
    :func:`_bucketed_ntile` would run one approxQuantile action per
    metric, each re-executing every previous ntile's join/window plan
    (round-11: the 3-chain over 15M RFM customers cost 390 s at sf100);
    the multi-column approxQuantile reads the BASE frame once and every
    bucket/prefix/window composition after that is lazy plan."""
    probs = [i / 200 for i in range(1, 200)]
    all_bounds = df.stat.approxQuantile([s[0] for s in specs], probs, 0.001)
    nn = df.agg(F.count(F.lit(1)).alias("_n"))
    out = df.crossJoin(F.broadcast(nn))
    q = F.floor(F.col("_n") / k)
    rem = F.col("_n") % k
    thr = rem * (q + 1)
    for (col, asc, name), bounds in zip(specs, all_bounds):
        bounds = sorted(set(bounds))
        v = F.col(col)
        if bounds:
            arr = F.array(*[F.lit(float(b)) for b in bounds])
            cond = (lambda b: b < v) if asc else (lambda b: b > v)
            bkt_expr = F.size(F.filter(arr, cond))
        else:
            bkt_expr = F.lit(0)
        out = out.withColumn("_bkt", bkt_expr)
        order_v = F.asc(col) if asc else F.desc(col)
        w_in = Window.partitionBy("_bkt").orderBy(order_v, F.asc(key_col))
        w_pre = Window.orderBy("_bkt").rowsBetween(
            Window.unboundedPreceding, -1
        )
        # prefix counts derive from the BASE frame, not `out`: a branch
        # over `out` would re-execute every previous ntile's window at
        # execution time — the very recompute this helper exists to kill
        prefix = (
            df.groupBy(bkt_expr.alias("_bkt"))
            .agg(F.count(F.lit(1)).alias("_bn"))
            .select(
                "_bkt",
                F.coalesce(F.sum("_bn").over(w_pre), F.lit(0)).alias(
                    "_prev_n"
                ),
            )
        )
        r = F.col("_prev_n") + F.row_number().over(w_in)
        out = (
            out.join(F.broadcast(prefix), "_bkt")
            .withColumn(
                name,
                F.when(r <= thr, F.floor((r - 1) / (q + 1))).otherwise(
                    rem + F.floor((r - thr - 1) / q)
                )
                + 1,
            )
            .drop("_bkt", "_prev_n")
        )
    return out.drop("_n")


def _cum_before(
    df: DataFrame,
    order_col: str,
    sum_col: str,
    out_col: str,
    n_buckets: int = 200,
) -> DataFrame:
    """Exclusive running sum over a global order, bucket-decomposed via
    :func:`_order_buckets`: ``out_col`` = sum of ``sum_col`` over every
    row with a strictly smaller ``order_col`` — the cum-count primitive
    behind the distinct-value average-rank formulation (Mann-Whitney,
    Kruskal-Wallis, Wilcoxon, KS). Requires ``order_col`` unique per row
    (these frames are grouped by the value first). For integer
    ``sum_col`` the decomposition is bit-exact (integer addition is
    associative); the windows run |bucket|-parallel instead of funneling
    the whole value domain through one task — the domain is bounded on
    the bench corpora but scales with genuinely continuous data
    (ADVICE r10 #1's hazard class). Drops the helper ``bkt`` column.

    ``df`` is persisted here (round 13): it fans out to THREE consumers
    — the approxQuantile sketch ACTION inside _order_buckets, the
    bucket-summary prefix branch, and the bucketed window join — and
    every caller feeds it a chain ending in a fact scan, so unpersisted
    each consumer re-ran that scan (the agg_kruskal_wallis plan showed
    the orders⋈customer join FIVE times). Domain-grain rows, so
    MEMORY_AND_DISK_DESER is bounded at the gate scales and evicts
    gracefully past them."""
    df = df.persist(StorageLevel.MEMORY_AND_DISK_DESER)
    b = _order_buckets(df, order_col, ascending=True, n_buckets=n_buckets)
    w_in = (
        Window.partitionBy("bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_pre = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    prefix = (
        b.groupBy("bkt")
        .agg(F.sum(sum_col).alias("_bsum"))
        .select(
            "bkt",
            F.coalesce(F.sum("_bsum").over(w_pre), F.lit(0)).alias("_prev"),
        )
    )
    return (
        b.join(F.broadcast(prefix), "bkt")
        .withColumn(
            out_col,
            F.col("_prev")
            + F.coalesce(F.sum(sum_col).over(w_in), F.lit(0)),
        )
        .drop("bkt", "_prev")
    )


def _grouped_percentile_cont(
    df: DataFrame,
    part_col: str,
    value_col: str,
    ps: "list[tuple[float, str]]",
) -> DataFrame:
    """Exact per-group ``percentile_cont`` WITHOUT concentrating a
    group's value domain in one task (round-12 class: Spark's exact
    Percentile aggregate carries an OpenHashMap of value -> count per
    group, merges every map of a group onto ONE reducer and sorts it
    there — bounded on the replicated bench domains, but O(rows) on a
    genuinely continuous column, ADVICE r10 #1's hazard shape).

    The same counts, distributed: one hash aggregate builds the
    (group, value) domain with row counts, the bucketed exclusive
    cum-count (:func:`_order_buckets` discipline, partitioned per
    group) gives each domain row its 0-based starting index, and the
    percentile is Spark's own interpolation over the two straddled
    order statistics: pos = p*(n-1), result = v_lo*(ceil(pos)-pos) +
    v_hi*(pos-floor(pos)) — the identical doubles Percentile emits,
    so oracle hashes cannot move. ``ps`` is [(fraction, out_col)...];
    returns one row per group with the named percentile columns,
    computed from ONE scan of ``df``.

    PRECONDITION (ADVICE r12 #1): every group must have at least one
    non-null ``value_col`` row. An all-null group is dropped here (the
    null filter precedes the groupBy) but kept — with a NULL percentile
    — by the native ordered-set arm, so the two arms of
    :func:`_percentiles_by_group` would diverge on it. No current
    caller's grouping can produce an all-null group (the TPC-H numeric
    columns are NOT NULL); a new caller that can must left-join its
    distinct group keys back."""
    dv = (
        df.where(F.col(value_col).isNotNull())  # percentile ignores nulls
        .groupBy(part_col, value_col)
        .agg(F.count(F.lit(1)).alias("_c"))
        # fan-out persist (round 13): dv feeds the approxQuantile ACTION,
        # the bucketed join chain, and the per-group total — unpersisted,
        # each re-ran the fact scan this arm exists to protect
        .persist(StorageLevel.MEMORY_AND_DISK_DESER)
    )
    b = _order_buckets(dv, value_col)
    w_in = (
        Window.partitionBy(part_col, "bkt")
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_pre = (
        Window.partitionBy(part_col)
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = (
        b.groupBy(part_col, "bkt")
        .agg(F.sum("_c").alias("_bn"))
        .select(
            part_col,
            "bkt",
            F.coalesce(F.sum("_bn").over(w_pre), F.lit(0)).alias("_prev"),
        )
    )
    nn = dv.groupBy(part_col).agg(F.sum("_c").alias("_n"))
    idx = (
        b.join(F.broadcast(prefix), [part_col, "bkt"])
        .join(F.broadcast(nn), part_col)
        .select(
            part_col,
            value_col,
            "_c",
            "_n",
            (
                F.col("_prev")
                + F.coalesce(F.sum("_c").over(w_in), F.lit(0))
            ).alias("_cb"),
        )
    )
    # idx is re-filtered once per requested percentile — persist it so a
    # three-percentile caller (trimmed/winsorized, psi) pays the bucketed
    # cum-count pipeline once, not three times (round 13)
    idx = idx.persist(StorageLevel.MEMORY_AND_DISK_DESER)
    out = None
    for p, name in ps:
        pos = F.lit(float(p)) * (F.col("_n") - 1)
        lower, higher = F.floor(pos), F.ceil(pos)
        hit = idx.filter(
            (F.col("_cb") <= higher) & (lower < F.col("_cb") + F.col("_c"))
        )
        v = F.col(value_col)
        one = hit.groupBy(part_col).agg(
            F.when(F.min(lower) == F.max(higher), F.min(v))
            .otherwise(
                F.min(v) * (F.max(higher) - F.max(pos))
                + F.max(v) * (F.max(pos) - F.min(lower))
            )
            .alias(name)
        )
        out = one if out is None else out.join(one, part_col)
    return out


def _percentiles_by_group(
    spark,
    sf_dir: str,
    df: DataFrame,
    count_table: str,
    part_col: str,
    value_col: str,
    ps: "list[tuple[float, str]]",
) -> DataFrame:
    """Concentration-gated exact grouped ``percentile_cont``: below the
    fact gate Spark's own ordered-set aggregate runs (single pass, its
    per-group value-count map measured-bounded there — and ~4x cheaper
    than the distributed pipeline at bench scale, the round-12
    regression find); above it
    :func:`_grouped_percentile_cont` distributes the identical
    computation through domain counts. Both arms emit bit-identical
    doubles (raw-equality pin), so oracle hashes cannot move.
    ``count_table`` names the fact table whose measured row count
    drives the dispatch — the same count every other gate on the entry
    shares via :func:`_table_count`. The count is a PROXY for the
    percentile input's size (ADVICE r12 #2): callers feeding a filtered
    slice (psi's 1995 window, MAD's dev frame) engage the distributed
    form a bit earlier than the threshold's ~4x-cheaper rationale
    strictly needs — a conservative plan heuristic, never a correctness
    concern (both arms are bit-identical). Inherits
    :func:`_grouped_percentile_cont`'s non-null-per-group
    precondition."""
    if _gates.distribute_exact_percentile(
        _table_count(spark, sf_dir, count_table)
    ):
        return _grouped_percentile_cont(df, part_col, value_col, ps)
    return df.groupBy(part_col).agg(
        *[
            F.expr(
                f"percentile_cont({float(p)!r}) WITHIN GROUP"
                f" (ORDER BY `{value_col}`)"
            ).alias(name)
            for p, name in ps
        ]
    )


_COUNT_CACHE: "dict[tuple[str, str], int]" = {}


def _table_count(spark, sf_dir: str, name: str) -> int:
    """Memoized table row count per (sf_dir, table). The count only
    drives size-based PLAN choices (gates, valves, join pins) and a
    dozen entries re-derive the identical number within one bench or
    sweep run — one job instead of twelve. Test/benchmark data dirs are
    immutable within a session; a pipeline overwriting its inputs
    mid-session should call ``_COUNT_CACHE.clear()``."""
    key = (sf_dir, name)
    if key not in _COUNT_CACHE:
        _COUNT_CACHE[key] = _t(spark, sf_dir, name).count()
    return _COUNT_CACHE[key]


def _docs_gated_with_pin(spark, sf_dir):
    """(docs', lsh_valve, pin_shuffle_join) for the minhash-family
    entries: ONE corpus count drives all three size-based plan choices —
    the exact-dedup-first collapse (above HUBNESS_EXACT_MAX_ROWS), the
    LSH bucket valve, and whether the pair operators pin their
    corpus-scaling join inputs to sort-merge (above LSH_VALVE_MIN_ROWS;
    below it the frames provably fit a broadcast build and the static
    broadcast is ~2x on the bench-scale path)."""
    docs = _t(spark, sf_dir, "documents")
    n = _table_count(spark, sf_dir, "documents")
    if n > HUBNESS_EXACT_MAX_ROWS:
        docs = _collapse_exact_docs(docs, n)
    valve = (
        _gates.MAX_LSH_BUCKET if n > _gates.LSH_VALVE_MIN_ROWS else None
    )
    return docs, valve, _gates.pin_shuffle_join(n)


def _near_dup_clusters_gated(spark, sf_dir: str) -> DataFrame:
    """(node, cluster_id) near-dup clusters with the round-9 collapse-and-
    expand dispatch shared by the clusters family (dedup_clusters /
    dedup_filtered_corpus / dedup_cluster_size_histogram): below the
    pairwise gate the pipeline runs on the full corpus (the oracle-hashed
    arm); above it, it runs on exact-dedup REPRESENTATIVES and expands
    over replicas — output PROVABLY IDENTICAL (identical text -> identical
    signatures -> identical band membership; see
    operators.dedup.near_dup_clusters_collapsed and the identity tests in
    tests/test_round9_ops.py) while replica candidate pairs, which grow
    with copies², are never enumerated."""
    from boann_ocsf_security_data_platform_spark.operators.dedup import (
        cluster_pairs,
        near_dup_clusters_collapsed,
        release_caches,
    )

    docs = _t(spark, sf_dir, "documents")
    n = _table_count(spark, sf_dir, "documents")
    valve = (
        _gates.MAX_LSH_BUCKET if n > _gates.LSH_VALVE_MIN_ROWS else None
    )
    if n <= HUBNESS_EXACT_MAX_ROWS:
        pairs = minhash_near_dup_pairs(
            docs,
            max_bucket_size=valve,
            pin_shuffle_join=_gates.pin_shuffle_join(n),
        )
        out = cluster_pairs(pairs)  # eager: result is checkpointed
        release_caches(pairs)
        return out
    return near_dup_clusters_collapsed(docs, max_bucket_size=valve)


def _near_dup_participants_gated(spark, sf_dir: str) -> DataFrame:
    """Distinct doc_ids participating in >= 1 near-dup candidate pair,
    with the same collapse-and-expand dispatch (used by the dup-flag
    entries: quality x dedup interaction, quality ROC). Identity above
    the gate: a doc participates iff its text has >= 2 copies or its
    representative participates at the representative level."""
    from boann_ocsf_security_data_platform_spark.operators.dedup import (
        near_dup_participants_collapsed,
        release_caches,
    )

    docs = _t(spark, sf_dir, "documents")
    n = _table_count(spark, sf_dir, "documents")
    valve = (
        _gates.MAX_LSH_BUCKET if n > _gates.LSH_VALVE_MIN_ROWS else None
    )
    if n <= HUBNESS_EXACT_MAX_ROWS:
        pairs = minhash_near_dup_pairs(
            docs,
            max_bucket_size=valve,
            pin_shuffle_join=_gates.pin_shuffle_join(n),
        )
        out = (
            pairs.select(F.col("id_a").alias("doc_id"))
            .union(pairs.select(F.col("id_b").alias("doc_id")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        release_caches(pairs)
        return out
    return near_dup_participants_collapsed(docs, max_bucket_size=valve)


def _artifact_scope() -> str:
    """Deterministic scope tag for on-disk artifacts (bucketed tables, the
    persisted IVF index, tar shards). Per-(sf, shard) instead of per-PID so
    repeated sweeps OVERWRITE the same artifact rather than accumulating
    one copy per run (51 ``bkt_*`` tables / 73 MB of warehouse litter by
    round 5 — r5 VERDICT "What's wrong" #2). Parallel safety is preserved:
    pytest shards carry ``PYTEST_SHARD=i/n``, and the oracle sweep
    partitions query names disjointly across its shard processes, so no
    two concurrent processes share a scope for the same entry.

    SINGLE-WRITER ASSUMPTION (r6 ADVICE #2): when neither env var is set
    the scope is the shared literal ``main`` — two concurrent unscoped
    processes (e.g. a manual query run alongside bench.py) that hit the
    SAME artifact-writing entry would rmtree/overwrite each other's
    bucketed tables / IVF index / tar shards mid-read. Anything that
    runs artifact entries concurrently must either rely on the sweep's
    disjoint name-partitioning or set ``SPARK_GRAFT_ARTIFACT_SCOPE`` to a
    unique tag per process (and clean up its scoped copies afterwards)."""
    import os

    scope = os.environ.get("SPARK_GRAFT_ARTIFACT_SCOPE") or os.environ.get(
        "PYTEST_SHARD", "main"
    )
    return scope.replace("/", "_")


def _fresh_managed_table(spark: SparkSession, name: str) -> None:
    """Make ``saveAsTable(name, mode='overwrite')`` safe across sessions:
    the in-memory catalog forgets tables on restart, but the warehouse
    directory survives — a fresh session's CREATE TABLE then fails with
    LOCATION_ALREADY_EXISTS. Drop the catalog entry if present, and remove
    an orphaned location if not."""
    if spark.catalog.tableExists(name):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        return
    import os
    import shutil

    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    shutil.rmtree(os.path.join(wh, name.lower()), ignore_errors=True)


# --- shared DuckDB-oracle building blocks (text normalization, the
# engine-portable 60-bit md5 hash, integer shingles, MinHash banding) ---

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_WORDS = f"list_filter(string_split({_NORM}, ' '), w -> w <> '')"
_H64 = "CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def _duck_shingles(k: int = 3) -> str:
    gram = " || ' ' || ".join([f"ws[i + {j}]" for j in range(k)])
    # range() is stop-exclusive: i runs 1 .. len(ws)-k+1 like Spark's
    # sequence(1, n-k+1) inclusive
    return (
        f"CASE WHEN len(ws) >= {k} THEN "
        f"list_distinct(list_transform(range(1, len(ws) - {k - 2}), i -> {gram})) "
        f"ELSE [array_to_string(ws, ' ')] END"
    )


def _duck_hashed_shingles(k: int = 3) -> str:
    """Integer shingles matching operators.dedup.with_hashed_shingles:
    per-word md5-hash64, combined as weighted XOR (h_i * 2^(k-1-j))."""
    gram = f"xor(xor(wh[i] * 4, wh[i + 1] * 2), wh[i + 2])"
    assert k == 3, "oracle written for k=3"
    word_hash = _H64.format(expr="w")
    whole = _H64.format(expr="array_to_string(ws, ' ')")
    return (
        f"CASE WHEN len(ws) >= {k} THEN "
        f"list_distinct(list_transform(range(1, len(ws) - {k - 2}), i -> {gram})) "
        f"ELSE [{whole}] END"
    ), f"list_transform(ws, w -> {word_hash})"


def _minhash_oracle(n_hashes: int = 16, n_bands: int = 4) -> str:
    rows = n_hashes // n_bands
    sig_items = ", ".join(
        f"list_min(list_transform(hs, h -> xor(h, {_xor_constant(j)})))"
        for j in range(n_hashes)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, md5(concat_ws(',', "
        + ", ".join(f"sig[{b * rows + r + 1}]" for r in range(rows))
        + ")) AS band_hash FROM sig"
        for b in range(n_bands)
    )
    shingle_expr, word_hash_expr = _duck_hashed_shingles(3)
    return f"""
    WITH words AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
    wh_t AS (SELECT doc_id, ws, {word_hash_expr} AS wh FROM words),
    hh AS (SELECT doc_id, {shingle_expr} AS hs FROM wh_t),
    sig AS (SELECT doc_id, [{sig_items}] AS sig FROM hh),
    bands AS ({band_rows})
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
    """


# Broadcast policy (scale contract): an explicit F.broadcast hint is a
# promise the table fits in every executor FOREVER — only `nation` (25 rows)
# and `region` (5 rows) keep that promise at any scale factor, so only they
# carry hints below. Tables that grow with the data (customer, supplier,
# part, orders, lineitem) carry NO hint: Spark's autoBroadcastJoinThreshold
# + AQE pick broadcast when the (filtered) side is actually small at runtime
# and degrade to shuffle joins past the threshold, instead of OOMing
# executors at 100×.


# ---------------------------------------------------------------------------
# TPC-H-ish relational core
# ---------------------------------------------------------------------------

@_q(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                   AS sum_qty,
           round(sum(l_extendedprice), 2)                              AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4)                                   AS avg_qty,
           round(avg(l_extendedprice), 4)                              AS avg_price,
           round(avg(l_discount), 4)                                   AS avg_disc,
           count(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@_q(
    "q3_shipping_priority",
    """
    SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@_q(
    "q5_local_supplier_volume",
    """
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5. Below the measured dim gate the r11 bench shape is kept
    verbatim: every dim broadcasts, lineitem streams through five
    broadcast hash joins without ever shuffling. Above the gate
    (customer > PIN_DIM_MIN_ROWS — the scale where customer stops
    broadcasting and the old syntactic order planned an UNFILTERED
    lineitem⋈orders SMJ, 600 M × 150 M rows at sf100, before the ASIA
    filter cut anything) the join order is rewritten to push the region
    filter into both dimension paths first (guide §2.3/§3.1): nations
    pruned to ASIA broadcast into customer, orders join the ~1/5
    surviving customers, and only then does lineitem join the reduced
    orders — so the second fact join's output carries ~1/5 the rows into
    the supplier probe, and the supplier side (pruned to ASIA, two
    columns) broadcasts on a measured count instead of riding a second
    SMJ. Both fact joins get the q8 spill-aware shuffle sizing
    (_widen_fact_shuffle) instead of the session's 32 partitions.
    Join-order changes on inner joins cannot move results; n_name is
    carried from the customer's nation, identical to the supplier's
    nation under the c_nationkey = s_nationkey join condition
    (forced-gate identity test pins the arms row-equal)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    if not _gates.pin_shuffle_join_dim(
        _table_count(spark, sf_dir, "customer")
    ):
        return (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .join(
                s,
                (l.l_suppkey == s.s_suppkey)
                & (c.c_nationkey == s.s_nationkey),
            )
            .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy("n_name")
            .agg(
                F.round(
                    F.sum(
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ),
                    2,
                ).alias("revenue")
            )
        )
    n_li = _table_count(spark, sf_dir, "lineitem")
    n_ord = _table_count(spark, sf_dir, "orders")
    n_asia = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    c_asia = c.join(
        F.broadcast(n_asia), c.c_nationkey == n_asia.n_nationkey
    ).select("c_custkey", "c_nationkey", "n_name")
    o2 = (
        _widen_fact_shuffle(
            o.select("o_orderkey", "o_custkey"), "o_custkey", n_ord
        )
        .join(
            _widen_fact_shuffle(c_asia, "c_custkey", n_ord),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("o_orderkey", "c_nationkey", "n_name")
    )
    # ASIA suppliers, projected to the two join columns: ~n_supplier/5
    # rows at ~16 B each — measured-safe broadcast far past sf100 (1 M
    # suppliers ≈ 3 MB); above the bound, planner freedom with the
    # corpus-scaling pin.
    s_asia = s.join(
        F.broadcast(n_asia.select(F.col("n_nationkey").alias("_snk"))),
        F.col("s_nationkey") == F.col("_snk"),
    ).select("s_suppkey", "s_nationkey")
    s_side = (
        F.broadcast(s_asia)
        if _table_count(spark, sf_dir, "supplier") <= 10_000_000
        else _pin(s_asia, True)
    )
    return (
        _widen_fact_shuffle(
            l.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"),
            "l_orderkey",
            n_li,
        )
        .join(
            _widen_fact_shuffle(o2, "o_orderkey", n_li),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            s_side,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@_q(
    "join_left_outer",
    """
    SELECT n_name, count(c_custkey) AS n_customers,
           round(coalesce(sum(c_acctbal), 0), 2) AS total_acctbal
    FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
    GROUP BY n_name
    """,
)
def join_left_outer(spark, sf_dir):
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    return (
        n.join(c, n.n_nationkey == c.c_nationkey, "left")
        .groupBy("n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.round(F.coalesce(F.sum("c_acctbal"), F.lit(0.0)), 2).alias(
                "total_acctbal"
            ),
        )
    )


@_q(
    "join_full_outer",
    """
    WITH cn AS (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1),
         sn AS (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT coalesce(cn.nk, sn.nk) AS nationkey,
           coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
    FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
    """,
)
def join_full_outer(spark, sf_dir):
    cn = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    sn = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return cn.join(sn, "nk", "full").select(
        F.coalesce(cn.nk, sn.nk).alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@_q(
    "join_semi",
    "SELECT c_custkey, c_name FROM customer WHERE EXISTS "
    "(SELECT 1 FROM orders WHERE o_custkey = c_custkey)",
)
def join_semi(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@_q(
    "join_anti",
    "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS "
    "(SELECT 1 FROM orders WHERE o_custkey = c_custkey)",
)
def join_anti(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@_q(
    "join_cross",
    "SELECT r_name, n_name FROM region CROSS JOIN nation",
)
def join_cross(spark, sf_dir):
    return (
        _t(spark, sf_dir, "region")
        .crossJoin(_t(spark, sf_dir, "nation"))
        .select("r_name", "n_name")
    )


@_q(
    "join_theta_inequality",
    """
    SELECT n_nationkey, count(*) AS n_pairs
    FROM customer JOIN supplier
      ON c_nationkey = s_nationkey AND c_acctbal > s_acctbal
    JOIN nation ON n_nationkey = c_nationkey
    GROUP BY n_nationkey
    """,
)
def join_theta_inequality(spark, sf_dir):
    """Per-nation count of (customer, supplier) pairs with
    c_acctbal > s_acctbal — the theta-join COUNT, without the theta
    join. Round-12 sf100 find: the literal equi+inequality join
    materializes every qualifying pair before the count — ~12B rows per
    nation at 15M customers x 1M suppliers (quadratic in the nation's
    member counts; the sweep entry ran unbounded). The count is an
    order statistic, not a join: per nation,
    n_pairs = sum over customers of |{suppliers with smaller acctbal}|,
    so one (nation, bal) domain aggregate per side, an exclusive
    running supplier count over the bal order, and a weighted sum give
    the identical total. acctbal's domain is fixed (cents in
    [-999.99, 9999.99], <= 1.1M values at ANY scale factor), so the
    per-nation domain window is bounded forever. The oracle keeps the
    literal theta-join SQL the decomposition provably equals.

    Round-13 (r12 VERDICT #2): the domain form is GATED on the measured
    customer count — ungated it ran its extra aggregate/full-outer-SMJ/
    window stages at every scale and tripled this headline entry at
    sf0.1 (0.40 s -> 1.29 s) where the literal join streams only ~600 k
    pairs through one broadcast join + partial count. Below the gate the
    literal form runs (the plan the bench had through round 11); above
    it the pair stream is the hazard (~24 B pairs at sf100) and the
    domain form engages — the distribute_exact_percentile discipline.
    Both arms produce identical counts (forced-gate identity test)."""
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    if not _gates.count_pairs_order_stats(
        _table_count(spark, sf_dir, "customer")
    ):
        return (
            c.join(
                s,
                (c.c_nationkey == s.s_nationkey)
                & (c.c_acctbal > s.s_acctbal),
            )
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("n_nationkey")
            .agg(F.count(F.lit(1)).alias("n_pairs"))
        )
    sd = s.groupBy(
        F.col("s_nationkey").alias("nk"), F.col("s_acctbal").alias("bal")
    ).agg(F.count(F.lit(1)).alias("s_cnt"))
    cd = c.groupBy(
        F.col("c_nationkey").alias("nk"), F.col("c_acctbal").alias("bal")
    ).agg(F.count(F.lit(1)).alias("c_cnt"))
    dom = (
        sd.join(cd, ["nk", "bal"], "full_outer")
        .select(
            "nk",
            "bal",
            F.coalesce("s_cnt", F.lit(0)).alias("s_cnt"),
            F.coalesce("c_cnt", F.lit(0)).alias("c_cnt"),
        )
    )
    w = (
        Window.partitionBy("nk")
        .orderBy("bal")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pairs = dom.select(
        "nk",
        (
            F.col("c_cnt")
            * F.coalesce(F.sum("s_cnt").over(w), F.lit(0))
        ).alias("p"),
    )
    return (
        pairs.groupBy("nk")
        .agg(F.sum("p").alias("n_pairs"))
        .join(F.broadcast(n), F.col("nk") == F.col("n_nationkey"))
        .filter(F.col("n_pairs") > 0)
        .select("n_nationkey", "n_pairs")
    )


# ---------------------------------------------------------------------------
# Aggregation / grouping-set family
# ---------------------------------------------------------------------------

@_q(
    "agg_distinct_and_stats",
    """
    SELECT c_mktsegment,
           count(DISTINCT c_nationkey)      AS n_nations,
           count(*)                         AS n_customers,
           round(avg(c_acctbal), 4)         AS avg_bal,
           round(stddev_samp(c_acctbal), 4) AS sd_bal,
           round(min(c_acctbal), 2)         AS min_bal,
           round(max(c_acctbal), 2)         AS max_bal
    FROM customer GROUP BY c_mktsegment
    """,
)
def agg_distinct_and_stats(spark, sf_dir):
    return (
        _t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
            F.round(F.stddev_samp("c_acctbal"), 4).alias("sd_bal"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        )
    )


@_q(
    "agg_collect_sorted",
    """
    SELECT r_name, string_agg(DISTINCT n_name, ',' ORDER BY n_name) AS nations
    FROM region JOIN nation ON r_regionkey = n_regionkey
    GROUP BY r_name
    """,
)
def agg_collect_sorted(spark, sf_dir):
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    return (
        r.join(n, r.r_regionkey == n.n_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_set("n_name")), ",").alias("nations")
        )
    )


@_q(
    "agg_rollup",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS total
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_rollup(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@_q(
    "agg_cube",
    """
    SELECT coalesce(o_orderstatus, '<all>')   AS status,
           coalesce(o_orderpriority, '<all>') AS priority,
           CAST(grouping(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark, sf_dir):
    """CUBE + grouping_id in one query: the gid distinguishes 'NULL because
    subtotal' from data NULLs, the coalesced labels render the subtotal rows
    the way a report would (consolidated from the former separate
    agg_cube_grouping_id entry)."""
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            "gid",
            "n_orders",
        )
    )


@_q(
    "agg_grouping_sets",
    """
    SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def agg_grouping_sets(spark, sf_dir):
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------

@_q(
    "window_rank",
    """
    SELECT c_custkey, c_nationkey, c_acctbal,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           CAST(rank()       OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           CAST(ntile(4)     OVER w AS BIGINT) AS quartile,
           round(percent_rank() OVER w, 6) AS prank,
           round(last_value(c_acctbal)   OVER wf, 2) AS top_bal,
           round(nth_value(c_acctbal, 2) OVER wf, 2) AS second_bal,
           round(cume_dist() OVER wo, 6)             AS cdist
    FROM customer
    WINDOW w  AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey),
           wf AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
           wo AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
)
def window_rank(spark, sf_dir):
    """The full ranking-family surface (row_number/rank/dense_rank/ntile/
    percent_rank + last/nth_value/cume_dist) over one customer scan — three
    window specs, one driver row (consolidated from the former separate
    window_last_nth_cume entry)."""
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    wf = (
        Window.partitionBy("c_nationkey")
        .orderBy("c_acctbal", "c_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    wo = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
        F.round(F.last("c_acctbal").over(wf), 2).alias("top_bal"),
        F.round(F.nth_value("c_acctbal", 2).over(wf), 2).alias("second_bal"),
        F.round(F.cume_dist().over(wo), 6).alias("cdist"),
    )


@_q(
    "window_running_sum",
    """
    SELECT o_custkey, o_orderkey, o_orderdate,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
           CAST(count(*) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_so_far
    FROM orders
    """,
)
def window_running_sum(spark, sf_dir):
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
        F.count(F.lit(1)).over(w).alias("n_so_far"),
    )


@_q(
    "window_lag_lead",
    """
    SELECT user_id, event_id, ts,
           round(value - lag(value)  OVER w, 6) AS delta_prev,
           round(lead(value) OVER w - value, 6) AS delta_next,
           round(first_value(value) OVER w, 6)  AS first_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = F.col("value")
    return _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.round(v - F.lag("value").over(w), 6).alias("delta_prev"),
        F.round(F.lead("value").over(w) - v, 6).alias("delta_next"),
        F.round(F.first("value").over(w), 6).alias("first_val"),
    )


@_q(
    "topk_per_group",
    """
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
)
def topk_per_group_q(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@_q(
    "q17_small_quantity_correlated",
    """
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < (
        SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey)
    """,
)
def q17_small_quantity_correlated(spark, sf_dir):
    """Correlated scalar subquery — Catalyst decorrelates it into an
    aggregate + join (DecorrelateInnerQuery), no per-row re-execution."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    _t(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#1'
          AND l.l_quantity < (
            SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
            WHERE l2.l_partkey = l.l_partkey)
        """
    )


@_q(
    "q8_market_share",
    """
    SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
           round(sum(CASE WHEN n_name = 'CHINA'
                     THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY 1
    """,
)
def q8_market_share(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # unfiltered full-fact SMJ: size the join shuffle by the measured
    # fact count (19M-row sorts per task at 32 partitions OOM'd 8g —
    # see _widen_fact_shuffle; both sides same count so the partitioning
    # is reused, this is the join's own shuffle)
    n_l = _table_count(spark, sf_dir, "lineitem")
    l = _widen_fact_shuffle(l, "l_orderkey", n_l)
    o = _widen_fact_shuffle(o, "o_orderkey", n_l)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("yr"))
        .agg(
            F.round(
                F.sum(F.when(F.col("n_name") == "CHINA", rev).otherwise(0))
                / F.sum(rev),
                6,
            ).alias("mkt_share")
        )
    )


@_q(
    "agg_histogram_buckets",
    """
    SELECT CAST(floor(c_acctbal / 1000) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(min(c_acctbal), 2) AS lo, round(max(c_acctbal), 2) AS hi
    FROM customer GROUP BY 1
    """,
)
def agg_histogram_buckets(spark, sf_dir):
    return (
        _t(spark, sf_dir, "customer")
        .groupBy(
            F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("c_acctbal"), 2).alias("lo"),
            F.round(F.max("c_acctbal"), 2).alias("hi"),
        )
    )


@_q(
    "map_and_array_functions",
    """
    WITH t AS (
      SELECT n_nationkey,
             map_from_entries(list_transform(string_split(n_name, ' '),
                                             w -> struct_pack(k := w, v := length(w)))) AS m,
             string_split(n_name, ' ') AS words
      FROM nation)
    SELECT n_nationkey,
           array_to_string(map_keys(m), ',') AS keys_joined,
           CAST(list_sum(map_values(m)) AS BIGINT) AS total_len,
           CAST(len(list_filter(words, w -> length(w) > 4)) AS BIGINT) AS long_words,
           array_to_string(list_sort(words), '|') AS sorted_words
    FROM t
    """,
)
def map_and_array_functions(spark, sf_dir):
    n = _t(spark, sf_dir, "nation")
    words = F.split("n_name", " ")
    m = F.map_from_entries(
        F.transform(words, lambda w: F.struct(w.alias("k"), F.length(w).alias("v")))
    )
    return n.select(
        "n_nationkey",
        F.array_join(F.map_keys(m), ",").alias("keys_joined"),
        F.aggregate(
            F.map_values(m), F.lit(0), lambda acc, v: acc + v
        )
        .cast("long")
        .alias("total_len"),
        F.size(F.filter(words, lambda w: F.length(w) > 4))
        .cast("long")
        .alias("long_words"),
        F.array_join(F.array_sort(words), "|").alias("sorted_words"),
    )


@_q(
    "q4_order_priority_check",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority_check(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem")
    matched = o.join(
        l,
        (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return matched.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@_q(
    "q14_promo_share",
    """
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                  THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-02-01'
    """,
)
def q14_promo_share(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return l.join(p, l.l_partkey == p.p_partkey).agg(
        F.round(
            100.0
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
            / F.sum(rev),
            6,
        ).alias("promo_revenue_pct")
    )


def _levenshtein_oracle() -> str:
    # same banding the dedup_minhash_lsh oracle replicates, then exact
    # edit-distance verification of candidates only
    return f"""
    WITH pairs AS ({_minhash_oracle()}),
    p AS (SELECT doc_id, substr({_NORM}, 1, 30) AS prefix FROM documents)
    SELECT id_a, id_b,
           CAST(levenshtein(a.prefix, b.prefix) AS BIGINT) AS edit_dist
    FROM pairs JOIN p a ON a.doc_id = id_a JOIN p b ON b.doc_id = id_b
    WHERE levenshtein(a.prefix, b.prefix) <= 5
    """


@_q("text_levenshtein_fuzzy", _levenshtein_oracle())
def text_levenshtein_fuzzy(spark, sf_dir):
    """Edit-distance fuzzy matching at scale: MinHash-LSH candidate pairs
    first (equi-join on band hashes — sub-quadratic everywhere), then exact
    ``levenshtein`` verification on normalized 30-char prefixes of the
    candidates ONLY. Replaces the former all-pairs-within-``source`` join,
    whose per-block pair count grew quadratically with data because the
    blocking key had fixed cardinality.

    SIZE-GATED (the containment discipline): above HUBNESS_EXACT_MAX_ROWS
    documents, exact duplicates collapse to one representative first —
    replica candidate pairs are edit-distance-0 TRUE OUTPUT growing with
    copies² and belong to exact dedup's report; fuzzy matches among
    distinct texts are unaffected. Oracle arm below the gate unchanged."""
    from boann_ocsf_security_data_platform_spark.functions.hash_fns import (
        normalize_text,
    )
    from boann_ocsf_security_data_platform_spark.operators.dedup import (
        minhash_near_dup_pairs,
        release_caches,
    )

    docs, valve, pin = _docs_gated_with_pin(spark, sf_dir)
    pairs = minhash_near_dup_pairs(
        docs, max_bucket_size=valve, pin_shuffle_join=pin
    )
    p = docs.select(
        "doc_id", F.substring(normalize_text(F.col("text")), 1, 30).alias("prefix")
    )
    a = p.select(F.col("doc_id").alias("id_a"), F.col("prefix").alias("p_a"))
    b = p.select(F.col("doc_id").alias("id_b"), F.col("prefix").alias("p_b"))
    out = (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.levenshtein("p_a", "p_b").cast("long").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 5)
        .localCheckpoint(eager=True)  # materialize so the caches can go
    )
    release_caches(pairs)
    return out


@_q(
    "asof_join_events_orders",
    """
    WITH o AS (  -- one order per (custkey, date): deterministic as-of target
      SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
      FROM orders GROUP BY 1, 2)
    SELECT event_id, user_id, ts,
           o.o_orderkey AS r_o_orderkey, o.o_orderdate AS r_o_orderdate
    FROM (SELECT event_id, user_id, ts FROM events) e
    ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
    """,
)
def asof_join_events_orders(spark, sf_dir):
    """As-of join on the all-JVM zero-fan-out scale path
    (``asof_join_union``: union + carry-forward window — one shuffle+sort
    of |left|+|right| rows, whole-stage codegen, no per-group Python
    round-trip). Round-8 switch: the former ``asof_join_pandas`` arm
    (co-grouped Arrow merge_asof) measured 100 s at sf1 — overhead-bound
    at ~30k sparse key groups, one pandas call each — vs ~2 s for the
    identical result from the union window; merge_asof remains the
    library's per-group scale path for DENSE time series and the
    equivalence is pinned in tests/test_operators.py. The declarative
    ``asof_join`` remains the pure-Column reference implementation."""
    from boann_ocsf_security_data_platform_spark.operators import asof_join_union

    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"), "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
        .select("user_id", "o_orderkey", "o_orderdate")
    )
    return asof_join_union(
        e, o, on="user_id", left_time="ts", right_time="o_orderdate"
    )


@_q(
    "pivot_status_by_priority",
    """
    SELECT o_orderpriority,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS F,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS O,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS P
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark, sf_dir):
    out = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return out.select(
        "o_orderpriority",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in ("F", "O", "P")],
    )


@_q(
    "agg_percentiles",
    """
    SELECT c_mktsegment,
           round(quantile_cont(c_acctbal, 0.5), 4) AS p50,
           round(quantile_cont(c_acctbal, 0.9), 4) AS p90
    FROM customer GROUP BY c_mktsegment
    """,
)
def agg_percentiles(spark, sf_dir):
    return (
        _t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.expr("percentile(c_acctbal, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(c_acctbal, 0.9)"), 4).alias("p90"),
        )
    )


@_q(
    "explode_with_position",
    """
    WITH t AS (SELECT p_partkey, string_split(p_name, ' ') AS ws FROM part)
    SELECT p_partkey,
           CAST(unnest(range(1, len(ws) + 1)) AS BIGINT) AS pos,
           unnest(ws) AS word
    FROM t
    """,
)
def explode_with_position(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey", F.posexplode(F.split("p_name", " ")).alias("pos", "word")
    ).select(
        "p_partkey", (F.col("pos") + 1).cast("long").alias("pos"), "word"
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------

@_q(
    "setop_intersect",
    "SELECT c_nationkey AS nationkey FROM customer "
    "INTERSECT SELECT s_nationkey FROM supplier",
)
def setop_intersect(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@_q(
    "setop_except",
    "SELECT c_nationkey AS nationkey FROM customer "
    "EXCEPT SELECT s_nationkey FROM supplier",
)
def setop_except(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)  # EXCEPT (distinct) semantics, not exceptAll


@_q(
    "setop_union_all",
    """
    SELECT side, count(*) AS n FROM (
      SELECT 'cust' AS side, c_nationkey AS nk FROM customer
      UNION ALL
      SELECT 'supp' AS side, s_nationkey AS nk FROM supplier) t
    GROUP BY side
    """,
)
def setop_union_all(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(
        F.lit("cust").alias("side"), F.col("c_nationkey").alias("nk")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.lit("supp").alias("side"), F.col("s_nationkey").alias("nk")
    )
    return c.unionByName(s).groupBy("side").agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# Scalar function coverage
# ---------------------------------------------------------------------------

@_q(
    "scalar_string_date_hash",
    """
    SELECT p_partkey,
           lower(p_type)                                   AS type_lower,
           substr(p_name, 1, 8)                            AS name_prefix,
           regexp_replace(p_brand, '[^0-9]', '', 'g')      AS brand_num,
           concat_ws('|', p_brand, p_type)                 AS brand_type,
           (p_name LIKE '%a%')                             AS has_a,
           CAST(length(p_name) AS BIGINT)                  AS name_len,
           md5(p_name)                                     AS name_md5,
           sha256(p_name)                                  AS name_sha256,
           regexp_extract(p_name, '([a-z]+)', 1)           AS first_word,
           split_part(p_type, ' ', 1)                      AS type_head,
           translate(p_brand, '#', '-')                    AS brand_dash,
           upper(p_name)                                   AS name_upper,
           lpad(CAST(p_size AS VARCHAR), 4, '0')           AS size_padded,
           repeat('*', p_size % 5)                         AS stars,
           reverse(p_brand)                                AS brand_rev,
           CAST(position('o' IN p_name) AS BIGINT)         AS first_o,
           trim(BOTH ' ' FROM concat(' ', p_name, ' '))    AS retrimmed,
           array_to_string(regexp_extract_all(p_name, '[aeiou]+'), ',') AS vowel_runs,
           CAST(len(regexp_extract_all(p_name, '[a-z]+')) AS BIGINT) AS n_words
    FROM part
    """,
)
def scalar_string_date_hash(spark, sf_dir):
    """Composite string-function coverage (basic + advanced + extract_all)
    in one scan of part — consolidated so every string primitive shares one
    driver-verified row."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_type").alias("type_lower"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.regexp_replace("p_brand", "[^0-9]", "").alias("brand_num"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.col("p_name").like("%a%").alias("has_a"),
        F.length("p_name").cast("long").alias("name_len"),
        F.md5("p_name").alias("name_md5"),
        F.sha2("p_name", 256).alias("name_sha256"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
        F.translate("p_brand", "#", "-").alias("brand_dash"),
        F.upper("p_name").alias("name_upper"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.repeat(F.lit("*"), F.col("p_size") % 5).alias("stars"),
        F.reverse("p_brand").alias("brand_rev"),
        F.instr("p_name", "o").cast("long").alias("first_o"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias(
            "retrimmed"
        ),
        F.array_join(
            F.regexp_extract_all("p_name", F.lit("[aeiou]+"), 0), ","
        ).alias("vowel_runs"),
        F.size(F.regexp_extract_all("p_name", F.lit("[a-z]+"), 0))
        .cast("long")
        .alias("n_words"),
    )


@_q(
    "scalar_datetime",
    """
    SELECT o_orderkey,
           date_trunc('month', o_orderdate)                        AS order_month,
           CAST(year(o_orderdate)  AS BIGINT)                      AS order_year,
           CAST(month(o_orderdate) AS BIGINT)                      AS order_m,
           CAST(day(o_orderdate)   AS BIGINT)                      AS order_d,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01') AS BIGINT) AS days_to_2002,
           o_orderdate + INTERVAL 1 MONTH                     AS next_month,
           o_orderdate + INTERVAL 10 DAY                      AS plus_10d,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(date_part('dow', o_orderdate) + 1 AS BIGINT)  AS dow_1sun,
           CAST(week(o_orderdate)    AS BIGINT)               AS iso_week,
           CAST(quarter(o_orderdate) AS BIGINT)               AS qtr,
           CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS week_start
    FROM orders
    """,
)
def scalar_datetime(spark, sf_dir):
    """Composite datetime coverage (extraction + arithmetic) in one scan.
    Parity notes: Spark ``add_months`` and DuckDB ``+ INTERVAL 1 MONTH``
    both clamp to month end; Spark ``dayofweek`` is 1=Sunday vs DuckDB
    ``dow`` 0=Sunday (offset in the oracle); both ``weekofyear``/``week``
    are ISO weeks."""
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_m"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_d"),
        F.datediff(
            F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")
        )
        .cast("long")
        .alias("days_to_2002"),
        F.add_months(d, 1).cast("timestamp").alias("next_month"),
        F.date_add(d.cast("date"), 10).cast("timestamp").alias("plus_10d"),
        F.last_day(d).cast("timestamp").alias("month_end"),
        F.dayofweek(d).cast("long").alias("dow_1sun"),
        F.weekofyear(d).cast("long").alias("iso_week"),
        F.quarter(d).cast("long").alias("qtr"),
        F.date_trunc("week", d).alias("week_start"),
    )


# ---------------------------------------------------------------------------
# Events: micro-batch analytics (batch equivalents of the streaming ops)
# ---------------------------------------------------------------------------

@_q(
    "events_tumbling_window",
    """
    SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start, event_type,
           count(*) AS n_events, round(sum(value), 2) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def events_tumbling_window(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@_q(
    "events_sessionize",
    """
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN ts - lag(ts) OVER w <= INTERVAL '30 minutes' THEN 0 ELSE 1 END AS new_sess
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, event_id, ts,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM sess GROUP BY user_id, session_id
    """,
)
def events_sessionize(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Interval compare, same as DuckDB's `ts - lag(ts) <= INTERVAL '30 minutes'`.
    # Deliberately NOT unix_micros: timestamp subtraction works for both
    # TIMESTAMP and TIMESTAMP_NTZ (the driver's parquet is tz-less, which
    # Spark 4 reads as NTZ), and needs no session-timezone interpretation.
    gap_ok = F.col("ts") - F.lag("ts").over(w) <= F.expr("INTERVAL '30' MINUTE")
    flagged = e.withColumn(
        "new_sess", F.when(gap_ok, F.lit(0)).otherwise(F.lit(1))
    )
    sess = flagged.withColumn("session_id", F.sum("new_sess").over(cum))
    return sess.groupBy("user_id", F.col("session_id").cast("long").alias("session_id")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@_q(
    "events_json_extract",
    """
    SELECT event_type,
           round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def events_json_extract(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy("event_type").agg(
        F.round(F.avg(k), 4).alias("avg_k"), F.count(F.lit(1)).alias("n")
    )


# ---------------------------------------------------------------------------
# LLM-pipeline: dedup family (documents table)
# ---------------------------------------------------------------------------

@_q(
    "dedup_exact",
    f"""
    SELECT md5({_NORM}) AS content_hash,
           min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def dedup_exact_q(spark, sf_dir):
    return exact_dedup(_t(spark, sf_dir, "documents"))


@_q("dedup_minhash_lsh", _minhash_oracle())
def dedup_minhash_lsh(spark, sf_dir):
    """Banded-MinHash near-dup candidate pairs with exact Jaccard ≥ 0.5.

    SIZE-GATED via _docs_gated_with_pin (round 10): this was the LAST
    pair entry still banding the RAW corpus. Replicas share every band
    key, so on a replicated corpus the bucket valve alone does not help —
    a 1000-copy text fills a bucket to exactly MAX_LSH_BUCKET and its
    copies² similarity-1.0 pairs are TRUE OUTPUT (the sf100 sweep filled
    the 65 GB scratch disk shuffling them before the write). Above the
    gate, exact duplicates collapse to representatives first — replica
    pairs belong to exact dedup's linear report (the same pipeline-order
    discipline as dedup_ngram_jaccard); pairs among distinct texts are
    unaffected. Below the gate the full pair set is the oracle-hashed
    arm."""
    d, valve, pin = _docs_gated_with_pin(spark, sf_dir)
    return minhash_near_dup_pairs(
        d, max_bucket_size=valve, pin_shuffle_join=pin
    )


def _clusters_oracle() -> str:
    """Connected components via recursive reachability: min reachable node
    per source = the cluster id (small pair sets only — the engine side is
    the scalable iterative version)."""
    return f"""
    WITH RECURSIVE pairs AS ({_minhash_oracle()}),
    edges AS (SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b AS a, id_a AS b FROM pairs),
    nodes AS (SELECT DISTINCT a AS node FROM edges),
    reach(node, r) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT reach.node, e.b FROM reach JOIN edges e ON reach.r = e.a
    )
    SELECT node, CAST(min(r) AS BIGINT) AS cluster_id FROM reach GROUP BY node
    """


@_q("dedup_clusters", _clusters_oracle())
def dedup_clusters(spark, sf_dir):
    """Near-dup pairs → transitive dedup clusters (auto-dispatched
    min-label / large-star-small-star). Round 9: routes through
    _near_dup_clusters_gated — above the pairwise gate the clusters are
    computed on exact-dedup representatives and expanded over replicas,
    output provably identical, replica pairs (copies² growth) never
    enumerated; size_gated-equivalent dispatch, oracle arm below."""
    return _near_dup_clusters_gated(spark, sf_dir)


@_q(
    "dedup_filtered_corpus",
    f"""
    WITH RECURSIVE pairs AS ({_minhash_oracle()}),
    edges AS (SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b AS a, id_a AS b FROM pairs),
    nodes AS (SELECT DISTINCT a AS node FROM edges),
    reach(node, r) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT reach.node, e.b FROM reach JOIN edges e ON reach.r = e.a
    ),
    losers AS (SELECT node FROM reach GROUP BY node HAVING min(r) <> node)
    SELECT doc_id, n_chars FROM documents
    WHERE doc_id NOT IN (SELECT node FROM losers)
    """,
)
def dedup_filtered_corpus(spark, sf_dir):
    """The full training-data dedup flow: near-dup pairs → transitive
    clusters → keep one representative (the min id) per cluster, drop the
    rest. Anti-join of the corpus against cluster losers — the shape a
    100 TB dedup job materializes. Round 9: clusters come from
    _near_dup_clusters_gated (collapse-and-expand above the pairwise
    gate, provably identical survivors, replica pairs never
    enumerated)."""
    docs = _t(spark, sf_dir, "documents")
    clusters = _near_dup_clusters_gated(spark, sf_dir)
    losers = clusters.filter(F.col("node") != F.col("cluster_id"))
    return docs.join(
        _pin(losers, _gates.pin_shuffle_join(_table_count(spark, sf_dir, "documents"))),
        docs.doc_id == losers.node,
        "left_anti",
    ).select("doc_id", "n_chars")


def _simhash_oracle() -> str:
    votes = " + ".join(
        f"(CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h >> {b}) & 1 = 1 "
        f"THEN 1 ELSE -1 END)) > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(16)
    )
    return f"""
    WITH words AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
    hh AS (SELECT doc_id, list_transform(ws, t -> {_H64.format(expr='t')}) AS hs
           FROM words)
    SELECT doc_id, CAST({votes} AS BIGINT) AS simhash FROM hh
    """


@_q("dedup_simhash", _simhash_oracle())
def dedup_simhash(spark, sf_dir):
    return simhash16(_t(spark, sf_dir, "documents")).select("doc_id", "simhash")


_HS_EXPR, _WH_EXPR = _duck_hashed_shingles(3)


@_q(
    "dedup_ngram_jaccard",
    f"""
    WITH words AS (SELECT doc_id, source, {_WORDS} AS ws FROM documents),
    wh_t AS (SELECT doc_id, source, ws, {_WH_EXPR} AS wh FROM words),
    sh AS (SELECT doc_id, source, {_HS_EXPR} AS shingles FROM wh_t),
    ex AS (SELECT doc_id, source, unnest(shingles) AS shingle FROM sh),
    sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      FROM ex a JOIN ex b
        ON a.source = b.source AND a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id_a, id_b,
           round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
    FROM inter JOIN sizes sa ON sa.doc_id = id_a
               JOIN sizes sb ON sb.doc_id = id_b
    WHERE round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.5
    """,
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact source-blocked n-gram Jaccard pairs ≥ 0.5.

    SIZE-GATED (the containment discipline, round 9): above
    HUBNESS_EXACT_MAX_ROWS documents, exact duplicates collapse to one
    representative per content hash before the shingle self-join —
    replica pairs are jaccard-1.0 TRUE OUTPUT growing with copies² (the
    sf10 sweep measured 85x wall on the 100-copy corpus) and belong to
    exact dedup's linear report; genuine near-dup pairs among distinct
    texts are unaffected. Below the gate the full pair set is the
    oracle-hashed arm."""
    d, _, pin = _docs_gated_with_pin(spark, sf_dir)
    return ngram_jaccard_pairs(d, threshold=0.5, pin_shuffle_join=pin)


# ---------------------------------------------------------------------------
# LLM-pipeline: similarity search (embeddings table)
# ---------------------------------------------------------------------------

_COS = (
    "list_dot_product(a.v, b.v) / "
    "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"
)


@_q(
    "knn_bruteforce_cosine",
    f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank FROM (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             round({_COS}, 6) AS cosine,
             row_number() OVER (PARTITION BY a.vec_id
                                ORDER BY round({_COS}, 6) DESC, b.vec_id) AS rank
      FROM e a JOIN e b ON a.vec_id <> b.vec_id
      WHERE a.vec_id < 10) t
    WHERE rank <= 5
    """,
)
def knn_bruteforce_cosine(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=5).withColumn(
        "rank", F.col("rank").cast("long")
    )


def _lsh_bucket_sql(n_planes: int = 4, dim: int = 64) -> str:
    """DuckDB replica of operators.similarity.lsh_bucket: same md5-seeded
    hyperplanes inlined as literals, same left-to-right double dot product,
    one sign bit per plane."""
    from boann_ocsf_security_data_platform_spark.operators.similarity import (
        _hyperplanes,
    )

    terms = []
    for p, plane in enumerate(_hyperplanes(n_planes, dim)):
        arr = "[" + ", ".join(repr(x) for x in plane) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), {arr}) > 0 "
            f"THEN {1 << p} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


@_q(
    "embedding_near_dup",
    f"""
    WITH e AS (SELECT vec_id, {_lsh_bucket_sql(4, 64)} AS blk,
                      CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, round({_COS}, 6) AS cosine
    FROM e a JOIN e b ON a.blk = b.blk AND a.vec_id < b.vec_id
    WHERE round({_COS}, 6) >= 0.3
    """,
)
def embedding_near_dup(spark, sf_dir):
    """Embedding near-dup pairs blocked by a random-hyperplane LSH bucket —
    the block that keeps working when no bounded-cardinality natural key
    exists: bucket count grows with 2^n_planes (tunable), so per-block pair
    counts stay sub-quadratic as data grows. Replaces the former ``label``
    block (fixed cardinality → quadratic per-block growth).

    SIZE-GATED (round 8): n_planes stays the oracle-pinned 4 at or below
    HUBNESS_EXACT_MAX_ROWS rows; above it auto_n_planes holds the
    expected bucket at ~64 vectors (4 fixed planes = 16 buckets measured
    111.7 s at sf1 — exactly the fixed-plane degradation this entry's
    own docstring describes) AND identical vectors collapse to one
    representative first: replicas of a vector share EVERY bucket at any
    plane count, so on duplication-heavy data their cosine-1.0 pairs are
    quadratic TRUE OUTPUT in the copy count (223 s at sf10, 100
    copies/vector) — those pairs belong to exact dedup's linear report
    (the containment/prefix-filter pipeline-order discipline); pairs
    here are emitted among DISTINCT vectors."""
    from boann_ocsf_security_data_platform_spark.operators.similarity import (
        auto_n_planes,
        lsh_bucket,
    )

    from boann_ocsf_security_data_platform_spark.operators.similarity import (
        exact_vector_dedup,
    )

    def _exact(e, n):
        return e, 4

    def _scale(e, n):
        # Plane count must be sized from the POST-collapse corpus: replicas
        # are removed before blocking, so sizing from the raw row count
        # over-splits (expected bucket ≈ target × distinct/n_rows — on
        # 100-copy data nearly every distinct vector sits alone and
        # near-dup recall collapses, the same failure the hubness fix
        # documents). semantic_dedup sizes from reps.count() for the same
        # reason; round-9 ADVICE item.
        e = exact_vector_dedup(e)
        return e, auto_n_planes(e.count(), _HUBNESS_LSH_TARGET_BUCKET)

    emb, planes = size_gated(
        _t(spark, sf_dir, "embeddings"), _exact, _scale, HUBNESS_EXACT_MAX_ROWS
    )
    emb = emb.withColumn(
        "_blk", lsh_bucket(F.col("embedding"), n_planes=planes, dim=64)
    )
    return embedding_near_dup_pairs(
        emb,
        block_col="_blk",
        threshold=0.3,
        pin_shuffle_join=_gates.pin_shuffle_join(_table_count(spark, sf_dir, "embeddings")),
    )


@_q(
    "variant_json_path",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_variant,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_string
    FROM events
    """,
)
def variant_json_path(spark, sf_dir):
    """Spark 4 VariantType (the JSONB analog, SURVEY §1.3) vs string-level
    JSON path over the same document — both must agree with DuckDB's JSON
    extraction."""
    from boann_ocsf_security_data_platform_spark.functions.json_fns import (
        json_get,
        variant_get,
        with_variant,
    )

    e = with_variant(_t(spark, sf_dir, "events"), json_col="props", out="doc")
    return e.select(
        "event_id",
        variant_get("doc", "$.k", "int").alias("k_variant"),
        json_get("props", "$.k").cast("int").alias("k_string"),
    )


# approximate scale-path — deliberately NO oracle (recall < 1 by design)
@_q("knn_lsh_approx")
def knn_lsh_approx(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return cosine_topk_lsh(emb, emb.filter(F.col("vec_id") < 10), k=5)


@_q("approx_count_distinct")
def approx_count_distinct_q(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .agg(F.approx_count_distinct("l_orderkey").alias("approx_orders"))
    )


# ---------------------------------------------------------------------------
# LLM-pipeline: text analysis (documents table)
# ---------------------------------------------------------------------------

_STOP_EN_SQL = "[" + ", ".join(f"'{w}'" for w in STOPWORDS_EN) + "]"


_TQ_ORACLE = f"""
    WITH t AS (SELECT doc_id, text, {_WORDS} AS ws FROM documents),
    m AS (SELECT doc_id,
            CAST(len(ws) AS BIGINT) AS n_tokens,
            CASE WHEN len(ws) > 0 THEN CAST(length(text) AS DOUBLE) / len(ws) ELSE 0 END AS mwl,
            CASE WHEN len(ws) > 0 THEN CAST(len(list_filter(ws, w -> list_contains({_STOP_EN_SQL}, w))) AS DOUBLE) / len(ws) ELSE 0 END AS sr,
            CASE WHEN length(text) > 0 THEN CAST(length(regexp_replace(text, '[^.,;:!?''"()]', '', 'g')) AS DOUBLE) / length(text) ELSE 0 END AS pr,
            CASE WHEN length(text) > 0 THEN CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / length(text) ELSE 0 END AS dr
          FROM t)
    SELECT doc_id, n_tokens, round(mwl, 6) AS mean_word_len,
           round(sr, 6) AS stopword_ratio, round(pr, 6) AS punct_ratio,
           round(dr, 6) AS digit_ratio,
           round(0.25 * (CASE WHEN n_tokens BETWEEN 10 AND 100000 THEN 1 ELSE 0 END)
               + 0.25 * (CASE WHEN mwl BETWEEN 2.0 AND 15.0 THEN 1 ELSE 0 END)
               + 0.25 * least(sr * 4, 1.0)
               + 0.25 * (1 - least((pr + dr) * 4, 1.0)), 6) AS quality_score
    FROM m
    """


@_q("text_quality_metrics", _TQ_ORACLE)
def text_quality_metrics(spark, sf_dir):
    return text_quality(_t(spark, sf_dir, "documents")).select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "mean_word_len",
        "stopword_ratio",
        "punct_ratio",
        "digit_ratio",
        "quality_score",
    )


@_q(
    "text_quality_filtered",
    f"""
    SELECT doc_id, quality_score FROM ({_TQ_ORACLE}) m
    WHERE quality_score >= 0.75 AND n_tokens >= 10
    """,
)
def text_quality_filtered(spark, sf_dir):
    """The composite keep/drop gate (operators.text.quality_filter):
    surviving documents with their score — the corpus a pretraining run
    would actually ingest."""
    from boann_ocsf_security_data_platform_spark.operators.text import quality_filter

    return quality_filter(
        _t(spark, sf_dir, "documents"), min_score=0.75, min_tokens=10
    ).select("doc_id", "quality_score")


_PII_SQL_REPL = (
    "regexp_replace(regexp_replace(regexp_replace(regexp_replace(text, "
    "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '[EMAIL]', 'g'), "
    "'[0-9]{{3}}-[0-9]{{2}}-[0-9]{{4}}', '[SSN]', 'g'), "
    "'(\\+?[0-9]{{1,3}}[-. ])?\\(?[0-9]{{3}}\\)?[-. ][0-9]{{3}}[-. ][0-9]{{4}}', '[PHONE]', 'g'), "
    "'([0-9]{{1,3}}\\.){{3}}[0-9]{{1,3}}', '[IPV4]', 'g')"
).format()


@_q(
    "text_redact_pii",
    f"""
    SELECT doc_id, md5({_PII_SQL_REPL}) AS redacted_md5
    FROM documents
    """,
)
def text_redact_pii(spark, sf_dir):
    """PII scrub (operators.text.redact_pii) — compare via md5 of the
    redacted text so the oracle exchange stays small."""
    from boann_ocsf_security_data_platform_spark.operators.text import redact_pii

    return redact_pii(_t(spark, sf_dir, "documents")).select(
        "doc_id", F.md5("text_redacted").alias("redacted_md5")
    )


def _langid_oracle() -> str:
    score_exprs = {
        lang: (
            f"CASE WHEN len(ws) > 0 THEN CAST(len(list_filter(ws, w -> list_contains("
            + "["
            + ", ".join(f"'{w}'" for w in words)
            + f"], w))) AS DOUBLE) / len(ws) ELSE 0 END"
        )
        for lang, words in LANG_STOPWORDS.items()
    }
    sel = ", ".join(f"{e} AS s_{lang}" for lang, e in score_exprs.items())
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in score_exprs) + ")"
    case = " ".join(
        f"WHEN {best} = s_{lang} THEN '{lang}'" for lang in LANG_STOPWORDS
    )
    return f"""
    WITH t AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
    s AS (SELECT doc_id, {sel} FROM t)
    SELECT doc_id, round({best}, 6) AS lang_score,
           CASE WHEN {best} > 0 THEN (CASE {case} END) ELSE 'und' END AS lang_pred
    FROM s
    """


@_q("text_lang_id", _langid_oracle())
def text_lang_id(spark, sf_dir):
    return lang_id(_t(spark, sf_dir, "documents")).select(
        "doc_id", "lang_score", "lang_pred"
    )


@_q(
    "text_fingerprint",
    f"SELECT doc_id, md5({_NORM}) AS fingerprint FROM documents",
)
def text_fingerprint(spark, sf_dir):
    from boann_ocsf_security_data_platform_spark.operators import doc_fingerprint

    return doc_fingerprint(_t(spark, sf_dir, "documents")).select(
        "doc_id", "fingerprint"
    )


@_q(
    "text_token_counts",
    f"""
    WITH t AS (SELECT doc_id, {_WORDS} AS ws,
      list_filter(string_split_regex(trim(regexp_replace(lower(text),
        '([0-9]+|[^a-z0-9\\s]+)', ' \\1 ', 'g')), '\\s+'), w -> w <> '') AS bts
      FROM documents)
    SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
           CAST(len(bts) AS BIGINT) AS n_subtokens
    FROM t
    """,
)
def text_token_counts(spark, sf_dir):
    from boann_ocsf_security_data_platform_spark.operators.text import tokens

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("long").alias("n_words"),
        F.size(bpe_ish_tokens(F.col("text"))).cast("long").alias("n_subtokens"),
    )


# ---------------------------------------------------------------------------
# Multimodal plumbing (binary payload + Arrow-batched metadata extraction)
# ---------------------------------------------------------------------------

@_q(
    "multimodal_media_meta",
    """
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           md5(text) AS content_md5,
           CAST(32 + (CAST(concat('0x', substr(md5(text), 1, 2)) AS INT) % 64) AS INT) AS width,
           CAST(32 + (CAST(concat('0x', substr(md5(text), 3, 2)) AS INT) % 64) AS INT) AS height
    FROM documents
    """,
)
def multimodal_media_meta(spark, sf_dir):
    return extract_media_meta(
        attach_binary_payload(_t(spark, sf_dir, "documents"))
    )


# ---------------------------------------------------------------------------
# Round-2 additions: remaining declared primitives (SURVEY §2.7)
# ---------------------------------------------------------------------------

@_q(
    "join_right_outer",
    """
    SELECT n_name, CAST(count(s_suppkey) AS BIGINT) AS n_rich_suppliers,
           round(coalesce(sum(s_acctbal), 0), 2) AS total_bal
    FROM (SELECT * FROM supplier WHERE s_acctbal > 5000) s
    RIGHT JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def join_right_outer(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 5000)
    n = _t(spark, sf_dir, "nation")
    return (
        s.join(n, s.s_nationkey == n.n_nationkey, "right")
        .groupBy("n_name")
        .agg(
            F.count("s_suppkey").alias("n_rich_suppliers"),
            F.round(F.coalesce(F.sum("s_acctbal"), F.lit(0.0)), 2).alias(
                "total_bal"
            ),
        )
    )


@_q(
    "window_range_frame",
    """
    SELECT o_orderkey, o_custkey, o_totalprice,
           round(sum(o_totalprice) OVER w, 2)  AS near_total,
           CAST(count(*) OVER w AS BIGINT)     AS near_n
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice
                 RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING)
    """,
)
def window_range_frame(spark, sf_dir):
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, 1000)
    )
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.round(F.sum("o_totalprice").over(w), 2).alias("near_total"),
        F.count(F.lit(1)).over(w).alias("near_n"),
    )


@_q(
    "setop_intersect_all",
    """
    SELECT nationkey, CAST(count(*) AS BIGINT) AS n FROM (
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT ALL
      SELECT s_nationkey FROM supplier) t
    GROUP BY nationkey
    """,
)
def setop_intersect_all(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersectAll(s).groupBy("nationkey").agg(F.count(F.lit(1)).alias("n"))


@_q(
    "setop_except_all",
    """
    SELECT nationkey, CAST(count(*) AS BIGINT) AS n FROM (
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT ALL
      SELECT s_nationkey FROM supplier) t
    GROUP BY nationkey
    """,
)
def setop_except_all(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.exceptAll(s).groupBy("nationkey").agg(F.count(F.lit(1)).alias("n"))


@_q(
    "setop_union_by_name",
    """
    SELECT src, CAST(count(*) AS BIGINT) AS n,
           CAST(count(seg) AS BIGINT) AS n_with_seg,
           round(sum(bal), 2) AS total_bal
    FROM (
      SELECT c_custkey AS id, c_acctbal AS bal, 'cust' AS src,
             c_mktsegment AS seg
      FROM customer
      UNION ALL BY NAME
      SELECT 'supp' AS src, s_suppkey AS id, s_acctbal AS bal FROM supplier) t
    GROUP BY src
    """,
)
def setop_union_by_name(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_acctbal").alias("bal"),
        F.lit("cust").alias("src"),
        F.col("c_mktsegment").alias("seg"),
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.lit("supp").alias("src"),
        F.col("s_suppkey").alias("id"),
        F.col("s_acctbal").alias("bal"),
    )
    return (
        c.unionByName(s, allowMissingColumns=True)
        .groupBy("src")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("seg").alias("n_with_seg"),
            F.round(F.sum("bal"), 2).alias("total_bal"),
        )
    )


@_q(
    "events_sliding_window",
    """
    SELECT ws AS window_start, CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value
    FROM (
      SELECT unnest([time_bucket(INTERVAL '5 minutes', ts),
                     time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes']) AS ws,
             value
      FROM events) t
    GROUP BY ws
    """,
)
def events_sliding_window(spark, sf_dir):
    """Hopping window (length 10 min, slide 5 min): every event lands in
    exactly two windows; the oracle expands the two containing bucket
    starts explicitly."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "n_events", "total_value"
        )
    )


@_q(
    "scalar_math",
    """
    SELECT l_orderkey, l_linenumber,
           round(abs(l_discount - 0.05), 6)        AS abs_disc,
           CAST(ceil(l_quantity)  AS BIGINT)       AS qty_ceil,
           CAST(floor(l_quantity) AS BIGINT)       AS qty_floor,
           round(sqrt(l_extendedprice), 6)         AS price_sqrt,
           round(ln(l_extendedprice), 6)           AS price_ln,
           round(log10(l_extendedprice), 6)        AS price_log10,
           round(power(1 + l_tax, 2), 6)           AS tax_sq,
           CAST(l_linenumber % 3 AS BIGINT)        AS mod3,
           round(sign(l_discount - 0.05), 1)       AS disc_sign
    FROM lineitem
    """,
)
def scalar_math(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("abs_disc"),
        F.ceil("l_quantity").cast("long").alias("qty_ceil"),
        F.floor("l_quantity").cast("long").alias("qty_floor"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), 6).alias("price_log10"),
        F.round(F.pow(F.lit(1) + F.col("l_tax"), 2), 6).alias("tax_sq"),
        (F.col("l_linenumber") % 3).cast("long").alias("mod3"),
        F.round(F.signum(F.col("l_discount") - 0.05), 1).alias("disc_sign"),
    )


@_q(
    "agg_median_countif_bool",
    """
    SELECT o_orderpriority,
           round(median(o_totalprice), 2) AS med_price,
           CAST(sum(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_big,
           bool_and(o_totalprice > 0)      AS all_positive,
           bool_or(o_orderstatus = 'F')    AS any_finished
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_median_countif_bool(spark, sf_dir):
    """count_if / bool_and / bool_or are one map-combinable pass; the
    exact median is concentration-gated: below the fact gate it rides
    the SAME single aggregate (one pass over orders, the per-group
    value-count map measured-bounded), above it
    :func:`_grouped_percentile_cont` distributes the order statistics
    and joins back on the 5-row priority grain — identical doubles
    either way (raw-equality pin)."""
    o = _t(spark, sf_dir, "orders")
    if not _gates.distribute_exact_percentile(
        _table_count(spark, sf_dir, "orders")
    ):
        return o.groupBy("o_orderpriority").agg(
            F.round(F.median("o_totalprice"), 2).alias("med_price"),
            F.count_if(F.col("o_totalprice") > 100000).alias("n_big"),
            F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
            F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
        )
    med = _grouped_percentile_cont(
        o, "o_orderpriority", "o_totalprice", [(0.5, "_med")]
    )
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count_if(F.col("o_totalprice") > 100000).alias("n_big"),
            F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
            F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
        )
        .join(F.broadcast(med), "o_orderpriority")
        .select(
            "o_orderpriority",
            F.round(F.col("_med"), 2).alias("med_price"),
            "n_big",
            "all_positive",
            "any_finished",
        )
    )


@_q(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           c_acctbal, n_name
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1995-10-01'
      AND o_orderdate <  TIMESTAMP '1996-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@_q(
    "q19_disjunctive_predicates",
    """
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1  AND 11 AND p_size BETWEEN 1 AND 5)
       OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
       OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
    """,
)
def q19_disjunctive_predicates(spark, sf_dir):
    """TPC-H q19 shape: OR of conjunctive predicate groups across the join —
    exercises CNF conversion / partial pushdown of disjunctions."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#12") & q.between(1, 11) & sz.between(1, 5))
        | ((F.col("p_brand") == "Brand#23") & q.between(10, 20) & sz.between(1, 10))
        | ((F.col("p_brand") == "Brand#34") & q.between(20, 30) & sz.between(1, 15))
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@_q(
    "scalar_null_semantics",
    """
    SELECT o_orderkey,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN')              AS status_or_open,
           ifnull(nullif(o_totalprice, 0), -1)                       AS price_nz,
           (o_orderstatus IS NOT DISTINCT FROM 'F')                  AS null_safe_f,
           (nullif(o_orderstatus, o_orderstatus) IS NOT DISTINCT FROM
            nullif('x', 'x'))                                        AS null_eq_null,
           CAST(count(o_orderstatus = 'zzz' OR NULL) OVER () AS BIGINT) AS zero_true
    FROM orders
    """,
)
def scalar_null_semantics(spark, sf_dir):
    """NULL-semantics scalar surface. The oracle's ``count(...) OVER ()``
    is a whole-frame scalar — as a literal Window it repartitions the
    entire order fact to ONE task (round-12 sf100 find: the empty
    partitionBy is the rank-window funnel's unordered sibling); the
    identical value rides a broadcast 1-row aggregate instead."""
    o = _t(spark, sf_dir, "orders")
    st = F.col("o_orderstatus")
    zero = o.agg(
        F.count(F.when(st == "zzz", F.lit(True))).alias("zero_true")
    )
    return o.crossJoin(F.broadcast(zero)).select(
        "o_orderkey",
        F.coalesce(F.nullif(st, F.lit("O")), F.lit("OPEN")).alias(
            "status_or_open"
        ),
        F.ifnull(F.nullif("o_totalprice", F.lit(0)), F.lit(-1)).alias(
            "price_nz"
        ),
        st.eqNullSafe("F").alias("null_safe_f"),
        F.nullif(st, st)
        .eqNullSafe(F.nullif(F.lit("x"), F.lit("x")))
        .alias("null_eq_null"),
        "zero_true",
    )


@_q(
    "join_null_safe",
    """
    WITH l AS (SELECT o_orderkey, nullif(o_orderstatus, 'P') AS k FROM orders),
         r AS (SELECT nullif(s, 'P') AS k, tag FROM (VALUES ('O', 'open'),
               ('F', 'finished'), ('P', 'pending')) v(s, tag))
    SELECT tag, CAST(count(o_orderkey) AS BIGINT) AS n
    FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
    GROUP BY tag
    """,
)
def join_null_safe(spark, sf_dir):
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of being dropped — Spark still plans this as a
    hash join (the operator treats null as a normal key value)."""
    o = _t(spark, sf_dir, "orders")
    l = o.select("o_orderkey", F.nullif("o_orderstatus", F.lit("P")).alias("k"))
    r = o.sparkSession.createDataFrame(
        [("O", "open"), ("F", "finished"), ("P", "pending")], "s string, tag string"
    ).select(F.nullif("s", F.lit("P")).alias("k"), "tag")
    return (
        l.join(r, l.k.eqNullSafe(r.k))
        .groupBy("tag")
        .agg(F.count("o_orderkey").alias("n"))
    )


@_q(
    "agg_corr_covar",
    """
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6)       AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covs,
           round(covar_pop(l_quantity, l_extendedprice), 4)  AS qty_price_covp,
           round(stddev_samp(l_discount), 6)                 AS disc_sd
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_corr_covar(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "qty_price_corr"
        ),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "qty_price_covs"
        ),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias(
            "qty_price_covp"
        ),
        F.round(F.stddev_samp("l_discount"), 6).alias("disc_sd"),
    )


_SUBQ_SQL = """
    SELECT
      (SELECT CAST(count(*) AS BIGINT) FROM customer
       WHERE c_custkey IN (SELECT o_custkey FROM orders
                           WHERE o_totalprice > 300000)) AS n_big_spenders,
      (SELECT CAST(count(*) AS BIGINT) FROM orders
       WHERE o_orderstatus NOT IN (SELECT nullif(o_orderstatus, 'P')
                                   FROM orders))          AS n_not_in_with_null
    """


@_q("subquery_in_not_in", _SUBQ_SQL)
def subquery_in_not_in(spark, sf_dir):
    """IN / NOT IN subqueries with three-valued-logic semantics: the NOT IN
    list contains NULLs (every 'P' nullified), so the predicate is never
    TRUE and the count is 0 — the classic NOT-IN-with-NULL trap, identical
    in Spark and DuckDB. Catalyst plans IN as left-semi and NOT IN as
    null-aware anti join."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_SUBQ_SQL)


@_q(
    "range_join_purchases_after_signup",
    """
    SELECT s.event_id AS signup_id, CAST(count(p.event_id) AS BIGINT) AS n_purchases,
           round(coalesce(sum(p.value), 0), 2) AS purchase_value
    FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'signup') s
    LEFT JOIN (SELECT user_id, event_id, ts, value FROM events
               WHERE event_type = 'purchase') p
      ON p.user_id = s.user_id
     AND s.ts <= p.ts AND p.ts < s.ts + INTERVAL '1 hour'
    GROUP BY s.event_id
    """,
)
def range_join_purchases_after_signup(spark, sf_dir):
    """Point-in-interval range join via bin bucketing
    (operators.relational.range_join_binned): purchases within 1 h after
    each signup — an equi-join on (user, time-bin) instead of a per-key
    theta scan. Left-join semantics restored by re-attaching empty signups."""
    from boann_ocsf_security_data_platform_spark.operators.relational import (
        range_join_binned,
    )

    e = _t(spark, sf_dir, "events")
    signups = e.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("event_id").alias("signup_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("w_end"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), "value"
    )
    matched = range_join_binned(
        purchases,
        signups,
        key="user_id",
        left_ts="p_ts",
        right_start="w_start",
        right_end="w_end",
        bin_seconds=3600,
    )
    counts = matched.groupBy("signup_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.round(F.sum("value"), 2).alias("purchase_value"),
    )
    return (
        signups.select("signup_id")
        .join(counts, "signup_id", "left")
        .select(
            "signup_id",
            F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
            F.round(F.coalesce("purchase_value", F.lit(0.0)), 2).alias(
                "purchase_value"
            ),
        )
    )


@_q(
    "unpivot_lineitem_measures",
    """
    SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS val
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
    """,
)
def unpivot_lineitem_measures(spark, sf_dir):
    """Wide → long melt (`DataFrame.unpivot`, the inverse of pivot)."""
    return _t(spark, sf_dir, "lineitem").unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="metric",
        valueColumnName="val",
    ).withColumn("metric", F.replace(F.col("metric"), F.lit("l_"), F.lit("")))


@_q(
    "scalar_try_functions",
    """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN (l_linenumber % 3) = 0 THEN NULL
                ELSE round(l_quantity / (l_linenumber % 3), 6) END AS safe_div,
           TRY_CAST(l_returnflag AS INTEGER)                       AS rf_int,
           TRY_CAST(CAST(l_linenumber AS VARCHAR) AS INTEGER)      AS ln_int
    FROM lineitem
    """,
)
def scalar_try_functions(spark, sf_dir):
    """ANSI-safe `try_*` family: errors become NULLs instead of failing the
    job — division by zero and non-numeric casts. The oracle spells the
    same semantics with CASE/TRY_CAST.

    SCALE NOTE (round 8): Spark's try_cast on a FAILING string→int is
    exception-driven per row (throw/catch inside the codegen'd cast) —
    with l_returnflag failing on EVERY row that measured 51 s at sf1 for
    a plain 5-column projection (8 µs/row of JVM exception machinery).
    rf_int therefore uses the regex-guarded cast — bit-identical output
    (digits-only strings cast, everything else NULL) with zero
    exceptions on the common all-fail path. The cast INSIDE the guard is
    still try_cast (round-9 ADVICE): under non-ANSI mode a plain cast
    would behave identically, but under ANSI an overflow-range digit
    string ('99999999999') would throw where try_cast returns NULL — the
    guard admits only digit strings, so the try machinery evaluates on
    the rare matched rows only and costs nothing. ln_int keeps the bare
    try_cast (it succeeds per row, where try eval is cheap) so the entry
    still exercises the real function; the rule for 100 TB: try_cast
    where failure is RARE, guarded try_cast where failure is common."""
    l = _t(spark, sf_dir, "lineitem")
    denom = F.col("l_linenumber") % 3
    rf_guarded = F.when(
        F.col("l_returnflag").rlike(r"^\s*[+-]?\d+\s*$"),
        F.col("l_returnflag").try_cast("int"),
    )
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.try_divide(F.col("l_quantity"), denom), 6).alias("safe_div"),
        rf_guarded.alias("rf_int"),
        F.col("l_linenumber").cast("string").try_cast("int").alias("ln_int"),
    )


@_q(
    "sort_nulls_ordering",
    """
    SELECT o_orderkey, nullif(o_orderstatus, 'P') AS st
    FROM orders
    ORDER BY st NULLS FIRST, o_orderkey
    LIMIT 50
    """,
)
def sort_nulls_ordering(spark, sf_dir):
    """NULLS FIRST/LAST placement: the row-set compare is order-agnostic,
    so the LIMIT makes null placement observable — only with NULLS FIRST do
    the nullified rows win the cut."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", F.nullif("o_orderstatus", F.lit("P")).alias("st"))
        .orderBy(F.col("st").asc_nulls_first(), F.col("o_orderkey").asc())
        .limit(50)
    )


@_q(
    "window_moving_average",
    """
    SELECT user_id, event_id, ts,
           round(avg(value) OVER w, 6)      AS ma3,
           round(max(value) OVER w, 6)      AS max3,
           CAST(count(*) OVER w AS BIGINT)  AS n_in_frame
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def window_moving_average(spark, sf_dir):
    """Bounded ROWS frame (trailing window): the moving-average shape."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.avg("value").over(w), 6).alias("ma3"),
        F.round(F.max("value").over(w), 6).alias("max3"),
        F.count(F.lit(1)).over(w).alias("n_in_frame"),
    )


@_q("knn_ivf_approx")
def knn_ivf_approx(spark, sf_dir):
    """IVF-Flat ANN (approximate by design — no SQL oracle; invariants
    pinned in tests/test_oracle.py: results ⊆ brute-force with identical
    cosines)."""
    emb = _t(spark, sf_dir, "embeddings")
    return cosine_topk_ivf(emb, emb.filter(F.col("vec_id") < 10), k=5)


# ---------------------------------------------------------------------------
# Round-3 additions: decontamination, centroids, sequence packing
# ---------------------------------------------------------------------------

_DECON_BENCH = "src0"  # stands in for the held-out eval/benchmark set


@_q(
    "text_decontaminate",
    f"""
    WITH words AS (SELECT doc_id, source, {_WORDS} AS ws FROM documents),
    wh_t AS (SELECT doc_id, source, ws, {_WH_EXPR} AS wh FROM words),
    sh AS (SELECT doc_id, source, {_HS_EXPR} AS shingles FROM wh_t),
    bench_sh AS (SELECT DISTINCT unnest(shingles) AS s FROM sh
                 WHERE source = '{_DECON_BENCH}'),
    corpus_sh AS (SELECT doc_id, unnest(shingles) AS s FROM sh
                  WHERE source <> '{_DECON_BENCH}'),
    contaminated AS (SELECT DISTINCT doc_id FROM corpus_sh
                     WHERE s IN (SELECT s FROM bench_sh))
    SELECT doc_id, source, n_chars FROM documents
    WHERE source <> '{_DECON_BENCH}'
      AND doc_id NOT IN (SELECT doc_id FROM contaminated)
    """,
)
def text_decontaminate(spark, sf_dir):
    """Train/test-overlap removal: corpus documents sharing ANY word
    3-gram with the benchmark shard are dropped (operators.dedup.
    decontaminate — broadcast semi-join probe, corpus never shuffled)."""
    from boann_ocsf_security_data_platform_spark.operators.dedup import (
        decontaminate,
    )

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("source") == _DECON_BENCH)
    corpus = docs.filter(F.col("source") != _DECON_BENCH)
    return decontaminate(corpus, bench).select("doc_id", "source", "n_chars")


def _centroid_oracle(dim: int = 64) -> str:
    # components are serialized as micro-units (round(x*1e6) as BIGINT) and
    # comma-joined: the driver's canonicalizer sorts cell values and cannot
    # hash array cells, so the vector must leave the query as an atomic
    # string. Integer scaling avoids double→string formatting divergence.
    comps = ", ".join(
        f"CAST(round(round(avg(v[{i + 1}]), 6) * 1000000) AS BIGINT)"
        for i in range(dim)
    )
    return f"""
    WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT label, array_to_string([{comps}], ',') AS centroid,
           CAST(count(*) AS BIGINT) AS n_members
    FROM e GROUP BY label
    """


@_q("embedding_centroids", _centroid_oracle())
def embedding_centroids(spark, sf_dir):
    """Per-label mean embedding + member count (operators.similarity.
    label_centroids) — the IVF-training / class-prototype aggregate; one
    hash-aggregate, shuffle carries |labels|×dim doubles. The centroid
    vector is serialized to a comma-joined micro-unit string so the gate
    window stays array-free (driver canon sorts cells; lists are
    unhashable there)."""
    from boann_ocsf_security_data_platform_spark.operators.similarity import (
        label_centroids,
    )

    cent = label_centroids(_t(spark, sf_dir, "embeddings"))
    return cent.select(
        "label",
        F.array_join(
            F.transform(
                "centroid",
                lambda x: F.round(x * 1e6).cast("long").cast("string"),
            ),
            ",",
        ).alias("centroid"),
        "n_members",
    )


@_q(
    "text_pack_sequences",
    f"""
    WITH t AS (SELECT doc_id, source, CAST(len({_WORDS}) AS BIGINT) AS n_tokens
               FROM documents),
    c AS (SELECT doc_id, source, n_tokens,
            coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
          FROM t)
    SELECT doc_id, source, n_tokens,
           CAST(floor(cb / 512) AS BIGINT) AS pack_id,
           CAST(cb % 512 AS BIGINT) AS pack_offset
    FROM c
    """,
)
def text_pack_sequences(spark, sf_dir):
    """Training-sequence packing (operators.text.pack_sequences): per-shard
    exclusive token prefix sum → pack id/offset in one window scan — the
    concat-then-chunk batch layout a pretraining dataloader produces."""
    from boann_ocsf_security_data_platform_spark.operators.text import (
        pack_sequences,
    )

    return pack_sequences(_t(spark, sf_dir, "documents")).select(
        "doc_id", "source", "n_tokens", "pack_id", "pack_offset"
    )


@_q(
    "text_vocabulary",
    f"""
    WITH t AS (SELECT doc_id, unnest({_WORDS}) AS token FROM documents)
    SELECT token, CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq
    FROM t GROUP BY token
    ORDER BY n_occurrences DESC, token
    LIMIT 100
    """,
)
def text_vocabulary(spark, sf_dir):
    """Corpus vocabulary top-100 (operators.text.vocabulary) — tokenizer-
    training aggregate; global top-N plans as TakeOrderedAndProject so the
    driver never materializes the full vocab."""
    from boann_ocsf_security_data_platform_spark.operators.text import vocabulary

    return vocabulary(_t(spark, sf_dir, "documents"), top_n=100)


@_q(
    "embedding_quantize",
    """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    s AS (SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx FROM e)
    SELECT vec_id,
           array_to_string(
             CASE WHEN mx > mn
                  THEN list_transform(v, x -> CAST(round((x - mn) / ((mx - mn) / 254.0)) AS INT) - 127)
                  ELSE list_transform(v, x -> 0) END, ',') AS q_vec,
           CASE WHEN mx > mn THEN (mx - mn) / 254.0 ELSE 0.0 END AS q_scale,
           mn AS q_offset
    FROM s
    """,
)
def embedding_quantize(spark, sf_dir):
    """Int8 scalar quantization of the embedding corpus (operators.
    similarity.quantize_embeddings) — 4× smaller storage at a bounded
    scale/2 per-component reconstruction error; shuffle-free projection.
    ``q_vec`` is serialized to a comma-joined string for the gate window
    (driver canon cannot sort array cells)."""
    from boann_ocsf_security_data_platform_spark.operators.similarity import (
        quantize_embeddings,
    )

    q = quantize_embeddings(_t(spark, sf_dir, "embeddings"))
    return q.select(
        "vec_id",
        F.array_join(
            F.transform("q_vec", lambda x: x.cast("string")), ","
        ).alias("q_vec"),
        "q_scale",
        "q_offset",
    )


@_q(
    "corpus_shuffle_sample",
    """
    SELECT doc_id, md5(concat('epoch0', CAST(doc_id AS VARCHAR))) AS shuffle_key
    FROM documents
    ORDER BY shuffle_key
    LIMIT 100
    """,
)
def corpus_shuffle_sample(spark, sf_dir):
    """Deterministic epoch shuffle (operators.relational.
    deterministic_shuffle): the row-set compare is order-insensitive, so
    the LIMIT makes the global shuffle order observable — only the correct
    hash order yields these 100 ids."""
    from boann_ocsf_security_data_platform_spark.operators.relational import (
        deterministic_shuffle,
    )

    return (
        deterministic_shuffle(
            _t(spark, sf_dir, "documents").select("doc_id"), seed="epoch0"
        )
        .limit(100)
        .select("doc_id", F.col("_shuffle_key").alias("shuffle_key"))
    )


# ---------------------------------------------------------------------------
# TPC-H-shape coverage, batch 2 (round 3): the remaining canonical plan
# shapes — simple predicate agg (q6), nation-pair volume with OR'd join
# predicate (q7), multi-way profit rollup with LIKE (q9), outer-join count
# distribution (q13), agg = max(agg) subquery (q15), HAVING + IN over a
# grouped subquery (q18), correlated multi-EXISTS/NOT-EXISTS (q21), scalar
# avg subquery + NOT EXISTS (q22). The testdata is TPC-H-ish (no partsupp,
# no comment/phone/shipmode columns), so predicates are adapted to the
# columns that exist; the plan shape is the point, not the constants.
# ---------------------------------------------------------------------------


@_q(
    "q6_forecast_revenue",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: every predicate pushes to the parquet scan (range +
    between + comparison), one partial-aggregate pair, no shuffle of data
    rows — the minimal scan-bound aggregate."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


@_q(
    "q7_nation_volume",
    """
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_volume(spark, sf_dir):
    """TPC-H Q7 shape: the OR'd nation-pair predicate is NOT a join key —
    it lands as a post-join filter over two broadcast nation joins, while
    the scaling joins (l⋈o⋈c⋈s) stay equi-joins Catalyst can reorder."""
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1997-12-31").cast("timestamp"),
        )
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    n1 = F.broadcast(n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        s.join(l, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@_q(
    "q9_product_profit",
    """
    SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
    FROM (
      SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount)
               - 0.1 * p_retailprice * l_quantity AS amount
      FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    """,
)
def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape (adapted: no partsupp table, so supply cost is
    modeled as 10% of p_retailprice). The LIKE filter prunes part BEFORE
    the join — at 100× the filtered part side is what AQE sizes for
    broadcast, not the full table."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.1 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        p.join(l, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(amount), 2).alias("sum_profit"))
    )


@_q(
    "q13_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape: outer join with a non-key join predicate, then a
    two-level aggregation (count per customer, then the distribution of
    those counts). count(o_orderkey) counts only matched rows — customers
    with no qualifying order contribute c_count = 0."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@_q(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: aggregate = max(aggregate). The revenue CTE is
    computed once and reused for both the max scalar and the probe side
    (persist-free: Spark's ReuseExchange shares the shuffle). Revenue is
    rounded BEFORE the equality so the compare is exact on both engines."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    s = _t(spark, sf_dir, "supplier")
    return (
        s.join(rev, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(mx), F.col("total_revenue") == F.col("_mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@_q(
    "q18_large_volume_customers",
    """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           round(sum(l_quantity), 2) AS total_qty
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 300)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
)
def q18_large_volume_customers(spark, sf_dir):
    """TPC-H Q18 shape: IN over a grouped-HAVING subquery → a semi-join
    against the aggregated key set. The qualifying key set is tiny BY
    CONSTRUCTION (p99 of per-order quantity is ~262, the filter is
    > 300), but leaving the join form to size ESTIMATES let the static
    plan fuse the semi-SMJ with the lineitem join-back into one
    5-sorter region at sf10 (round-12 sorter-pipeline scan) — so the
    key set is persisted, COUNTED (the measured-count discipline: a
    bounded scalar that picks the PLAN, never moves data), and
    broadcast-hinted when it measures small, with a sort-merge
    fallback above the bound."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 300)
        .select(F.col("l_orderkey").alias("_bk"))
        .persist(StorageLevel.MEMORY_AND_DISK_DESER)
    )
    # one long per qualifying order: 5M keys ≈ 40 MB broadcast build
    big_side = F.broadcast(big) if big.count() <= 5_000_000 else big
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(big_side, F.col("o_orderkey") == F.col("_bk"), "left_semi")
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
    )


@_q(
    "q21_waiting_suppliers",
    """
    SELECT s_name, count(*) AS numwait
    FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 365 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 365 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape (adapted: 'late' = shipped >365 days after the
    order date, since the testdata has no commit/receipt dates).

    The correlated EXISTS / NOT EXISTS are evaluated as per-order
    supplier statistics, not as self-joins (the textbook Q21 rewrite):
    on the F-orders join frame, EXISTS(another supplier on the order) ⇔
    countDistinct(suppkey) ≥ 2, and NOT EXISTS(another supplier late on
    the order) ⇔ the distinct-late-supplier count is exactly 1 (the
    candidate line is itself late, so it accounts for the 1). Both
    correlate only on l_orderkey and the candidate's own lateness, so
    one (orderkey, suppkey) rollup replaces two 600M×600M semi/anti
    joins. Round-11 sf100 find: the join form chained THREE sort-merge
    joins into one stage — four concurrent external sorters per task ×
    32 tasks exhausted the 8g heap (GC-locker retry on the 32 MB sort
    pointer arrays). Round-12 find (judge re-run): the rollup alone was
    NOT enough — `lines` feeds both the per-supplier rollup and
    `late_lines`, so Catalyst scanned lineitem TWICE and, because the
    orderkey partitioning satisfies every downstream distribution
    (ClusteredDistribution accepts a key subset), fused BOTH
    lineitem⋈orders sort-merge joins, the four rollup hash-agg levels
    and the qualifying join into ONE exchange-free pipeline — 5 sorts +
    3 SMJ buffers per task, OOM at the default 8g heap. Persisting
    `lines` DISK_ONLY above the fact gate (the parts_abc_xyz
    discipline) halves the fact scan AND caps any single pipeline at a
    plain-SMJ sorter footprint (pinned via tools/plan_audit.py's
    sorter-pipeline gate). Identical result (oracle hash unchanged;
    pinned in tests/test_round11_ops.py)."""
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = _t(spark, sf_dir, "lineitem")
    late_cut = F.col("o_orderdate") + F.expr("INTERVAL 365 DAYS")
    pin = _gates.pin_shuffle_join_fact(_table_count(spark, sf_dir, "lineitem"))
    lines = (
        l.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > late_cut).alias("is_late"),
        )
    ).persist(
        StorageLevel.DISK_ONLY if pin else StorageLevel.MEMORY_AND_DISK_DESER
    )
    # (orderkey, suppkey) grain first — map-side partial combine shrinks
    # the shuffle to distinct pairs; both follow-up aggs and the join
    # back to the late lines then share the orderkey exchange family.
    per_supp = lines.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.col("is_late").cast("int")).alias("supp_late")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("supp_late").alias("n_late_supp"),
    )
    late_lines = lines.filter(F.col("is_late")).select(
        "l_orderkey", "l_suppkey"
    )
    qualified = late_lines.join(
        per_order.filter(
            (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
        ).select("l_orderkey"),
        "l_orderkey",
    )
    return (
        qualified.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


@_q(
    "q22_inactive_customers",
    """
    SELECT cntrycode, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
    FROM (
      SELECT CAST(c_nationkey % 10 AS INT) AS cntrycode, c_acctbal
      FROM customer c
      WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c.c_custkey AND o_orderstatus = 'F')
    ) custsale
    GROUP BY cntrycode
    """,
)
def q22_inactive_customers(spark, sf_dir):
    """TPC-H Q22 shape (adapted: country code = nationkey mod 10, 'no
    orders' = no completed orders, since every testdata customer has some
    order): uncorrelated scalar avg subquery → one-row broadcast cross
    join; NOT EXISTS → left-anti join against the filtered orders side."""
    c = _t(spark, sf_dir, "customer")
    o_f = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    avg_pos = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("_avg_bal")
    )
    return (
        c.join(o_f, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(avg_pos))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .groupBy(F.pmod(F.col("c_nationkey"), F.lit(10)).cast("int").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@_q(
    "q2_min_balance_supplier",
    """
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_partkey, p_name, s_name, round(s_acctbal, 2) AS acctbal, n_name
    FROM part
      JOIN ps ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
    WHERE p_size = 15
      AND s_acctbal = (SELECT min(s2.s_acctbal)
                       FROM ps ps2 JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
                       WHERE ps2.l_partkey = p_partkey)
    """,
)
def q2_min_balance_supplier(spark, sf_dir):
    """TPC-H Q2 shape (adapted: the part-supplier relation is derived from
    lineitem since there is no partsupp table, and min acctbal stands in
    for min supplycost): correlated min subquery ≡ a per-part window min —
    the equality compares a double against the min OF THE SAME SET, so it
    is exact on both engines without rounding."""
    ps = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    w = Window.partitionBy("p_partkey")
    return (
        p.join(ps, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .withColumn("_min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("_min_bal"))
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            F.round("s_acctbal", 2).alias("acctbal"),
            "n_name",
        )
    )


@_q(
    "q11_important_parts",
    """
    WITH pr AS (
      SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS val
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      WHERE s_nationkey < 5
      GROUP BY l_partkey)
    SELECT l_partkey AS partkey, round(val, 2) AS value
    FROM pr
    WHERE val > (SELECT sum(val) * 0.02 FROM pr)
    """,
)
def q11_important_parts(spark, sf_dir):
    """TPC-H Q11 shape (adapted: value = revenue through suppliers of a
    nation group, no partsupp): aggregate filtered by a scalar aggregate
    OVER THE SAME aggregate — the grouped frame is computed once and feeds
    both the total (one-row broadcast) and the probe side."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 5)
    pr = (
        l.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("val")
        )
    )
    total = pr.agg((F.sum("val") * 0.02).alias("_cut"))
    return (
        pr.join(F.broadcast(total))
        .filter(F.col("val") > F.col("_cut"))
        .select(
            F.col("l_partkey").alias("partkey"), F.round("val", 2).alias("value")
        )
    )


@_q(
    "q12_shipping_delay_classes",
    """
    SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 90
                THEN 'SLOW' ELSE 'FAST' END AS ship_class,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
)
def q12_shipping_delay_classes(spark, sf_dir):
    """TPC-H Q12 shape (adapted: no l_shipmode, so lineitems classify by
    ship delay instead): two-class conditional counting inside one
    aggregate pass — the CASE-in-sum pivot that avoids two scans."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.when(
                F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 90, "SLOW"
            )
            .otherwise("FAST")
            .alias("ship_class")
        )
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@_q(
    "q16_supplier_part_counts",
    """
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part JOIN ps ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'MEDIUM'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark, sf_dir):
    """TPC-H Q16 shape: negated IN-list + NOT IN subquery (anti-join; the
    excluded supplier set is tiny and non-null, so it broadcasts) feeding a
    count-distinct aggregate over a derived part-supplier relation."""
    ps = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        p.join(ps, F.col("p_partkey") == F.col("l_partkey"))
        .join(bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# LLM-pipeline, round-3 batch 2: within-doc repetition filters, RAG-style
# chunking, TF-IDF keyword extraction, SemDeDup-style semantic dedup.
# ---------------------------------------------------------------------------


@_q(
    "text_repetition_metrics",
    f"""
    WITH w AS (SELECT doc_id, {_WORDS} AS ws, length({_NORM}) AS nl FROM documents),
    g AS (SELECT doc_id, ws, nl,
            CASE WHEN len(ws) >= 2
                 THEN list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])
                 ELSE CAST([] AS VARCHAR[]) END AS gs
          FROM w)
    SELECT doc_id,
      CAST(len(ws) AS BIGINT) AS n_words,
      round(CASE WHEN len(ws) > 0
                 THEN 1 - len(list_distinct(ws)) / len(ws) ELSE 0.0 END, 6)
        AS dup_word_frac,
      round(CASE WHEN len(gs) > 0
                 THEN list_sum(list_transform(gs, x ->
                        CASE WHEN len(list_filter(gs, y -> y = x)) > 1
                             THEN 1 ELSE 0 END)) / len(gs)
                 ELSE 0.0 END, 6) AS dup_2gram_frac,
      round(CASE WHEN len(gs) > 0 AND nl > 0
                 THEN list_max(list_transform(gs, x ->
                        len(list_filter(gs, y -> y = x)) * length(x))) / nl
                 ELSE 0.0 END, 6) AS top_2gram_cover
    FROM g
    """,
)
def text_repetition_metrics(spark, sf_dir):
    """Gopher/RefinedWeb-style within-document repetition filters
    (operators.text.repetition_metrics): row-local array expressions, no
    shuffle — the per-row cost is quadratic in the document's OWN length,
    never in corpus size."""
    from boann_ocsf_security_data_platform_spark.operators.text import (
        repetition_metrics,
    )

    return repetition_metrics(_t(spark, sf_dir, "documents"))


@_q(
    "text_chunk_overlap",
    f"""
    WITH w AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
    s AS (SELECT doc_id, ws, unnest(range(1, len(ws) + 1, 16)) AS st
          FROM w WHERE len(ws) > 0)
    SELECT doc_id,
           CAST((st - 1) // 16 + 1 AS BIGINT) AS chunk_idx,
           CAST(len(list_slice(ws, st, st + 31)) AS BIGINT) AS n_tokens,
           array_to_string(list_slice(ws, st, st + 31), ' ') AS chunk_text
    FROM s
    """,
)
def text_chunk_overlap(spark, sf_dir):
    """Overlapping fixed-size token chunking (operators.text.
    chunk_documents, size=32 stride=16) — the RAG / embedding-indexing
    splitter. One generate, no shuffle; chunks stay co-partitioned with
    their parent document."""
    from boann_ocsf_security_data_platform_spark.operators.text import (
        chunk_documents,
    )

    return chunk_documents(_t(spark, sf_dir, "documents"), size=32, stride=16)


@_q(
    "text_tfidf_top_terms",
    f"""
    WITH w AS (SELECT doc_id, unnest({_WORDS}) AS term FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY 1, 2),
    dfq AS (SELECT term, count(DISTINCT doc_id) AS dft FROM w GROUP BY 1),
    n AS (SELECT count(*) AS nn FROM documents)
    SELECT doc_id, term, tf, score, rank FROM (
      SELECT tf.doc_id, tf.term, CAST(tf.tf AS BIGINT) AS tf,
             round(tf.tf * (ln((nn + 1.0) / (dft + 1.0)) + 1.0), 6) AS score,
             row_number() OVER (
               PARTITION BY tf.doc_id
               ORDER BY round(tf.tf * (ln((nn + 1.0) / (dft + 1.0)) + 1.0), 6) DESC,
                        tf.term) AS rank
      FROM tf JOIN dfq USING (term), n) t
    WHERE rank <= 5
    """,
)
def text_tfidf_top_terms(spark, sf_dir):
    """Smoothed TF-IDF top-5 terms per document (operators.text.
    tfidf_top_terms): two map-side-combinable aggregates + a broadcast
    one-row corpus count + a WindowGroupLimit top-k. Scores rounded before
    ranking, term tie-break — deterministic across engines."""
    from boann_ocsf_security_data_platform_spark.operators.text import (
        tfidf_top_terms,
    )

    out = tfidf_top_terms(
        _t(spark, sf_dir, "documents"),
        k=5,
        pin_shuffle_join=_gates.pin_shuffle_join(_table_count(spark, sf_dir, "documents")),
    )
    return out.withColumn("rank", F.col("rank").cast("long"))


@_q(
    "semantic_dedup_survivors",
    f"""
    WITH RECURSIVE e AS (SELECT vec_id, {_lsh_bucket_sql(4, 64)} AS blk,
                                CAST(embedding AS DOUBLE[]) AS v
                         FROM embeddings),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM e a JOIN e b ON a.blk = b.blk AND a.vec_id < b.vec_id
      WHERE round({_COS}, 6) >= 0.3),
    edges AS (SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b AS a, id_a AS b FROM pairs),
    nodes AS (SELECT DISTINCT a AS node FROM edges),
    reach(node, r) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT reach.node, e2.b FROM reach JOIN edges e2 ON reach.r = e2.a
    ),
    losers AS (SELECT node FROM reach GROUP BY node HAVING min(r) <> node)
    SELECT vec_id, label FROM embeddings
    WHERE vec_id NOT IN (SELECT node FROM losers)
    """,
)
def semantic_dedup_survivors(spark, sf_dir):
    """SemDeDup-style semantic dedup over the embedding corpus
    (operators.similarity.semantic_dedup): LSH-blocked cosine pairs →
    connected components → keep the min-id representative per group. The
    full embedding-space analogue of dedup_filtered_corpus.

    SIZE-GATED (round 8): at or below HUBNESS_EXACT_MAX_ROWS rows,
    n_planes is pinned to 4 so the DuckDB oracle (which inlines the same
    4 hyperplanes) stays bit-identical — the hash-verified arm at
    sf0.01/sf0.1. Above it the operator's auto_n_planes tuning takes
    over with a 64-vector target bucket (16 fixed buckets at 20k rows
    measured 121 s at sf1 — the fixed-plane failure mode the operator's
    own docstring warns about); survivors remain exact for every pair
    the finer blocking co-buckets, and exact-duplicate mass belongs to
    exact dedup upstream (pipeline order, same note as containment)."""
    from boann_ocsf_security_data_platform_spark.operators.similarity import (
        semantic_dedup,
    )

    def _exact(e, n):
        return semantic_dedup(e, threshold=0.3, n_planes=4)

    def _scale(e, n):
        # collapse identical vectors first — SEMANTICS-PRESERVING here:
        # a replica group is fully connected (cosine 1.0 >= threshold) and
        # identical vectors share every LSH bucket, so the group's min id is
        # both the group survivor and its component's representative; CC over
        # representatives yields exactly the ungated survivor set (replicas
        # can never survive), while the edge count drops from copies^2 to
        # distinct^2 (sf10: 100 copies/vector timed out ungated).
        from boann_ocsf_security_data_platform_spark.operators.similarity import (
            exact_vector_dedup,
        )

        # reps feeds the pair pipeline AND the final anti-join: both
        # consumers re-ran the replica collapse, and the two vec_id
        # joins fused into one 5-sorter region (round-12 scan-all find).
        # The scale arm only runs above HUBNESS_EXACT_MAX_ROWS, so the
        # persist goes straight to DISK_ONLY (the parts_abc_xyz
        # discipline; vectors are wide — keep them off the heap).
        reps = exact_vector_dedup(e).persist(StorageLevel.DISK_ONLY)
        return semantic_dedup(
            reps, threshold=0.3, target_bucket_size=_HUBNESS_LSH_TARGET_BUCKET
        )

    emb = _t(spark, sf_dir, "embeddings")
    return size_gated(emb, _exact, _scale, HUBNESS_EXACT_MAX_ROWS).select(
        "vec_id", "label"
    )


@_q(
    "events_funnel",
    """
    WITH u1 AS (
      SELECT user_id, min(ts) FILTER (WHERE event_type = 'click') AS t1
      FROM events GROUP BY user_id),
    u2 AS (
      SELECT e.user_id, u1.t1,
             min(e.ts) FILTER (WHERE e.event_type = 'signup'
                               AND e.ts > u1.t1) AS t2
      FROM events e JOIN u1 ON e.user_id = u1.user_id
      GROUP BY e.user_id, u1.t1),
    u3 AS (
      SELECT e.user_id, u2.t1, u2.t2,
             min(e.ts) FILTER (WHERE e.event_type = 'purchase'
                               AND e.ts > u2.t2) AS t3
      FROM events e JOIN u2 ON e.user_id = u2.user_id
      GROUP BY e.user_id, u2.t1, u2.t2)
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(count(t1) AS BIGINT) AS n_click,
           CAST(count(t2) AS BIGINT) AS n_signup_after_click,
           CAST(count(t3) AS BIGINT) AS n_purchase_after_signup
    FROM u3
    """,
)
def events_funnel(spark, sf_dir):
    """Ordered conversion funnel (click → signup → purchase, each step
    strictly after the previous): one conditional-min aggregate per step,
    re-joined on user_id — per-user state is a fixed number of timestamps,
    never a collected event array, so hot users cost nothing extra and
    every round shuffles on the same key (AQE reuses the partitioning)."""
    e = _t(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    u1 = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t1")
    )
    u2 = (
        e.join(u1, "user_id")
        .groupBy("user_id", "t1")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "signup")
                    & (F.col("ts") > F.col("t1")),
                    F.col("ts"),
                )
            ).alias("t2")
        )
    )
    u3 = (
        e.join(u2, "user_id")
        .groupBy("user_id", "t1", "t2")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t2")),
                    F.col("ts"),
                )
            ).alias("t3")
        )
    )
    return u3.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t1").alias("n_click"),
        F.count("t2").alias("n_signup_after_click"),
        F.count("t3").alias("n_purchase_after_signup"),
    )


@_q(
    "events_retention_cohorts",
    """
    WITH first AS (
      SELECT user_id, CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS cohort_day
      FROM events GROUP BY user_id),
    act AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
      FROM events)
    SELECT cohort_day,
           CAST(datediff('day', cohort_day, day) AS BIGINT) AS days_since,
           CAST(count(user_id) AS BIGINT) AS n_users
    FROM act JOIN first USING (user_id)
    GROUP BY cohort_day, days_since
    """,
)
def events_retention_cohorts(spark, sf_dir):
    """Cohort retention triangle: users grouped by first-activity day,
    counted on each subsequent active day. Two aggregates (cohort min,
    distinct activity days) shuffling on user_id, then one small
    (cohort, offset) aggregate — the standard product-analytics rollup."""
    e = _t(spark, sf_dir, "events")
    first = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    )
    act = e.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    return (
        act.join(first, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day"))
            .cast("long")
            .alias("days_since"),
        )
        .agg(F.count("user_id").alias("n_users"))
    )


@_q(
    "events_gap_fill",
    """
    WITH daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             count(*) AS n_events, round(max(value), 6) AS day_max
      FROM events GROUP BY 1, 2),
    bounds AS (SELECT user_id, min(day) AS d0, max(day) AS d1
               FROM daily GROUP BY user_id),
    series AS (
      SELECT user_id,
             unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
      FROM bounds),
    joined AS (
      SELECT s.user_id, s.day,
             coalesce(d.n_events, 0) AS n_events, d.day_max
      FROM series s LEFT JOIN daily d USING (user_id, day))
    SELECT user_id, day, CAST(n_events AS BIGINT) AS n_events,
           last_value(day_max IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_max
    FROM joined
    """,
)
def events_gap_fill(spark, sf_dir):
    """Time-series regularization: zero-fill each user's daily series over
    their own [first, last] activity span (sequence + explode — the
    generated rows stay co-partitioned with the user), then forward-fill
    the last observed per-day max with an ignore-nulls window — the
    resample/ffill primitive. Day aggregation uses max (order-independent)
    so doubles compare bit-exactly across engines."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.max("value"), 6).alias("day_max"),
    )
    series = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(
                F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
            ).alias("day"),
        )
    )
    joined = series.join(daily, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        "day_max",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.withColumn(
        "filled_max", F.last("day_max", ignorenulls=True).over(w)
    ).drop("day_max")


@_q(
    "events_zscore_anomalies",
    """
    WITH s AS (
      SELECT user_id, event_id, value,
             avg(value) OVER w AS mu,
             stddev_samp(value) OVER w AS sigma
      FROM events WINDOW w AS (PARTITION BY user_id)
    )
    SELECT user_id, event_id, round(value, 6) AS value,
           round((value - mu) / sigma, 4) AS zscore
    FROM s
    WHERE sigma > 0 AND abs((value - mu) / sigma) > 2
    """,
)
def events_zscore_anomalies(spark, sf_dir):
    """Per-entity anomaly flagging: z-score of each event's value against
    its user's own distribution (whole-partition window — one shuffle on
    user_id, no self-join), keep |z| > 2. The partition-wide avg/stddev
    window is the standard streaming-adjacent outlier primitive."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    mu = F.avg("value").over(w)
    sigma = F.stddev_samp("value").over(w)
    z = (F.col("value") - mu) / sigma
    return (
        e.select(
            "user_id",
            "event_id",
            F.round(F.col("value"), 6).alias("value"),
            F.round(z, 4).alias("zscore"),
            sigma.alias("_sigma"),
            z.alias("_z"),
        )
        .filter((F.col("_sigma") > 0) & (F.abs(F.col("_z")) > 2))
        .drop("_sigma", "_z")
    )


@_q(
    "agg_argmax",
    """
    SELECT o_orderpriority,
           max_by(o_orderkey, o_totalprice * 100000 + o_orderkey)
             AS top_orderkey,
           round(max(o_totalprice), 2) AS top_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_argmax(spark, sf_dir):
    """Argmax per group via max_by. The ordering key is made UNIQUE
    (price scaled to an exact integer plus the orderkey — both under 2^53,
    so the double arithmetic is exact) because max_by on a tied key is
    nondeterministic in any engine; tie-free keys make the result
    engine-portable."""
    o = _t(spark, sf_dir, "orders")
    ord_key = F.col("o_totalprice") * 100000 + F.col("o_orderkey")
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", ord_key).alias("top_orderkey"),
        F.round(F.max("o_totalprice"), 2).alias("top_price"),
    )


@_q(
    "events_cumulative_users",
    """
    WITH first AS (
      SELECT user_id, CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS first_day
      FROM events GROUP BY user_id),
    daily_new AS (
      SELECT first_day AS day, count(*) AS new_users
      FROM first GROUP BY first_day)
    SELECT day, CAST(new_users AS BIGINT) AS new_users,
           CAST(sum(new_users) OVER (
             ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cumulative_users
    FROM daily_new
    """,
)
def events_cumulative_users(spark, sf_dir):
    """Cumulative distinct users over time WITHOUT a running-distinct
    window (which doesn't exist in any engine): each user reduces to their
    first-seen day, daily first-seen counts get a running sum. Two
    aggregates + one tiny ordered window over days — the growth-curve
    primitive at any scale (the global window runs over #days rows, not
    #events)."""
    e = _t(spark, sf_dir, "events")
    first = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("first_day")
    )
    daily_new = first.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = (
        Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily_new.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("cumulative_users"),
    )


@_q(
    "q20_excess_suppliers",
    """
    WITH widget_li AS (
      SELECT l_partkey, l_suppkey, l_quantity
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_partkey IN (SELECT p_partkey FROM part
                          WHERE p_name LIKE '%widget%')),
    part_totals AS (
      SELECT l_partkey, sum(l_quantity) AS part_total
      FROM widget_li GROUP BY l_partkey),
    eligible AS (
      SELECT w.l_suppkey
      FROM widget_li w JOIN part_totals t ON w.l_partkey = t.l_partkey
      GROUP BY w.l_suppkey, w.l_partkey, t.part_total
      HAVING sum(w.l_quantity) > 0.2 * t.part_total)
    SELECT s_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name LIKE 'NATION_1%'
      AND s_suppkey IN (SELECT l_suppkey FROM eligible)
    ORDER BY s_name
    """,
)
def q20_excess_suppliers(spark, sf_dir):
    """TPC-H Q20 shape (adapted: no partsupp table, so 'excess
    availability' becomes 'carries >20% of a part's two-year shipped
    volume'): IN-subquery on a LIKE-filtered part list → left-semi join;
    the correlated availability threshold → a per-part total joined back
    and compared in HAVING; the outer IN → another left-semi. Both
    aggregates group on l_partkey, so the total and the per-supplier sum
    share one shuffle family; quantities are whole doubles, so the sums
    are order-exact and the 0.2× boundary is engine-stable."""
    part_w = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("l_partkey", "l_suppkey", "l_quantity")
        .join(part_w, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
    )
    totals = li.groupBy("l_partkey").agg(
        F.sum("l_quantity").alias("part_total")
    )
    eligible = (
        li.groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("supp_qty"))
        .join(totals, "l_partkey")
        .filter(F.col("supp_qty") > 0.2 * F.col("part_total"))
        .select("l_suppkey")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name").like("NATION_1%"))
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "inner")
        .join(eligible, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name")
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# Round-3 additions, third wave: corpus-management operators (domain caps,
# token budgets, mixture resampling, boilerplate stripping) and the skew
# toolkit (salted join, key profiler)
# ---------------------------------------------------------------------------

_H64_CAP = _H64.format(expr="concat('cap:', CAST(doc_id AS VARCHAR))")
_H64_MIX = _H64.format(expr="concat('mix0:', CAST(doc_id AS VARCHAR))")


@_q(
    "join_salted_skew",
    """
    SELECT o_orderkey, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def join_salted_skew(spark, sf_dir):
    """Skew-resistant salted equi-join (operators.relational.salted_join):
    the oracle is the PLAIN join — salting must be invisible in the result
    while spreading each hot key over n_salts shuffle partitions."""
    from boann_ocsf_security_data_platform_spark.operators.relational import salted_join

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("c_custkey")
    )
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    return salted_join(o, c, "c_custkey", n_salts=8).select(
        "o_orderkey", "c_name", "c_mktsegment"
    )


@_q(
    "corpus_domain_cap",
    f"""
    SELECT doc_id, source FROM documents
    QUALIFY row_number() OVER (
        PARTITION BY source ORDER BY {_H64_CAP}, doc_id) <= 10
    """,
)
def corpus_domain_cap(spark, sf_dir):
    """Per-domain document cap in deterministic hash order
    (operators.text.domain_cap) — survivors are an unbiased, reproducible
    uniform sample of each domain; WindowGroupLimit bounds the shuffle."""
    from boann_ocsf_security_data_platform_spark.operators.text import domain_cap

    return domain_cap(
        _t(spark, sf_dir, "documents"), max_per_domain=10
    ).select("doc_id", "source")


@_q(
    "corpus_token_budget",
    f"""
    WITH m AS ({_TQ_ORACLE}),
    j AS (SELECT d.doc_id, d.source, m.n_tokens, m.quality_score
          FROM documents d JOIN m USING (doc_id)),
    w AS (SELECT *, CAST(coalesce(sum(n_tokens) OVER (
              PARTITION BY source
              ORDER BY quality_score DESC, doc_id ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
              AS tokens_before
          FROM j)
    SELECT doc_id, source, n_tokens, quality_score, tokens_before
    FROM w WHERE tokens_before < 1500
    """,
)
def corpus_token_budget(spark, sf_dir):
    """Greedy best-first selection under a per-domain token budget
    (operators.text.token_budget_select) — one exclusive-prefix-sum window
    scan per domain."""
    from boann_ocsf_security_data_platform_spark.operators.text import (
        text_quality,
        token_budget_select,
    )

    scored = text_quality(_t(spark, sf_dir, "documents"))
    return token_budget_select(scored, budget=1500).select(
        "doc_id",
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "quality_score",
        "tokens_before",
    )


@_q(
    "text_strip_boilerplate",
    """
    WITH segs AS (
      SELECT doc_id,
             unnest(string_split(text, ' ')) AS seg,
             unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
      FROM documents),
    total AS (SELECT count(*) AS n_docs FROM documents),
    boiler AS (
      SELECT seg FROM segs, total
      WHERE seg <> ''
      GROUP BY seg, n_docs
      HAVING count(DISTINCT doc_id) > 0.8 * n_docs),
    kept AS (SELECT doc_id, pos, seg FROM segs
             WHERE seg NOT IN (SELECT seg FROM boiler)),
    re AS (SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS cleaned_text
           FROM kept GROUP BY doc_id)
    SELECT d.doc_id, coalesce(re.cleaned_text, '') AS cleaned_text
    FROM documents d LEFT JOIN re USING (doc_id)
    """,
)
def text_strip_boilerplate(spark, sf_dir):
    """Corpus-frequency boilerplate removal
    (operators.text.strip_frequent_segments): segments shared by >80% of
    documents are dropped, survivors reassembled in original order."""
    from boann_ocsf_security_data_platform_spark.operators.text import (
        strip_frequent_segments,
    )

    return strip_frequent_segments(
        _t(spark, sf_dir, "documents"), delim=" ", max_doc_ratio=0.8
    )


@_q(
    "corpus_mixture_sample",
    f"""
    WITH counts AS (
      SELECT source, count(*) AS n,
             1 + CAST(substr(source, 4) AS INT) % 3 AS w
      FROM documents GROUP BY source),
    tot AS (SELECT sum(w) AS wsum FROM counts),
    shares AS (SELECT source, n, w / wsum AS share FROM counts, tot),
    tmax AS (SELECT min(n / share) AS t_max FROM shares),
    fracs AS (SELECT source, round(least(1.0, share * t_max / n), 6) AS frac
              FROM shares, tmax)
    SELECT d.doc_id, d.source
    FROM documents d JOIN fracs f USING (source)
    WHERE ({_H64_MIX} % 1000000) < f.frac * 1000000
    """,
)
def corpus_mixture_sample(spark, sf_dir):
    """Deterministic resampling to a target domain mixture
    (operators.relational.mixture_sample): target share per source is
    1 + (source number mod 3); the operator finds the largest total the
    mixture admits without upsampling and hash-samples each stratum to its
    derived fraction — exact expected sizes, reproducible across engines."""
    from boann_ocsf_security_data_platform_spark.operators.relational import (
        mixture_sample,
    )

    weight = F.lit(1) + F.substring(F.col("source"), 4, 10).cast("int") % 3
    return mixture_sample(
        _t(spark, sf_dir, "documents"),
        strata_col="source",
        weight=weight,
        id_col="doc_id",
        seed="mix0",
    ).select("doc_id", "source")


@_q(
    "profile_key_skew",
    """
    WITH total AS (SELECT count(*) AS t FROM orders),
    c AS (SELECT o_custkey, count(*) AS n_rows FROM orders GROUP BY o_custkey)
    SELECT o_custkey, CAST(n_rows AS BIGINT) AS n_rows,
           round(n_rows / t, 6) AS share
    FROM c, total
    ORDER BY n_rows DESC, o_custkey ASC LIMIT 20
    """,
)
def profile_key_skew(spark, sf_dir):
    """Heavy-hitter join-key profiler (operators.relational.profile_keys):
    the diagnosis step before choosing salting / AQE skew-join /
    broadcast; top-k plans as TakeOrderedAndProject."""
    from boann_ocsf_security_data_platform_spark.operators.relational import (
        profile_keys,
    )

    return profile_keys(_t(spark, sf_dir, "orders"), "o_custkey", k=20)


# ---------------------------------------------------------------------------
# LLM-pipeline, fourth wave (round 3): deterministic dataset splits,
# fixed-budget per-stratum sampling, and n-gram LM statistics.
# ---------------------------------------------------------------------------


@_q(
    "corpus_train_val_test_split",
    """
    SELECT doc_id,
           CASE WHEN b < 800000 THEN 'train'
                WHEN b < 900000 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id,
                 CAST(concat('0x', substr(md5(concat('split0:',
                      CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 1000000 AS b
          FROM documents)
    """,
)
def corpus_train_val_test_split(spark, sf_dir):
    """Deterministic 80/10/10 split (operators.relational.
    train_val_test_split): portable-hash bucket vs cumulative thresholds —
    a document's split never changes under resharding or corpus growth,
    unlike randomSplit. Shuffle-free row-local projection."""
    from boann_ocsf_security_data_platform_spark.operators.relational import (
        train_val_test_split,
    )

    return train_val_test_split(
        _t(spark, sf_dir, "documents"), id_col="doc_id"
    ).select("doc_id", "split")


@_q(
    "corpus_sample_k_per_group",
    """
    SELECT source, doc_id FROM (
      SELECT source, doc_id,
             row_number() OVER (
               PARTITION BY source
               ORDER BY CAST(concat('0x', substr(md5(concat('samp0:',
                        CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT),
                        doc_id) AS rn
      FROM documents) WHERE rn <= 7
    """,
)
def corpus_sample_k_per_group(spark, sf_dir):
    """Fixed-budget per-stratum draw (operators.relational.
    sample_k_per_group): exactly min(7, stratum size) docs per source by
    portable-hash order; the rank filter plans as WindowGroupLimit so map
    tasks forward at most k rows per group before the exchange."""
    from boann_ocsf_security_data_platform_spark.operators.relational import (
        sample_k_per_group,
    )

    return sample_k_per_group(
        _t(spark, sf_dir, "documents"), group_col="source", k=7, id_col="doc_id"
    ).select("source", "doc_id")


@_q(
    "text_bigram_counts",
    f"""
    WITH toks AS (
      SELECT list_filter(string_split({_NORM}, ' '), t -> t <> '') AS l
      FROM documents
    ), grams AS (
      SELECT unnest(list_transform(list_zip(l[1:len(l)-1], l[2:len(l)]),
                                   s -> concat(s[1], ' ', s[2]))) AS ngram
      FROM toks WHERE len(l) >= 2
    )
    SELECT ngram, CAST(count(*) AS BIGINT) AS n_occurrences
    FROM grams GROUP BY ngram
    ORDER BY n_occurrences DESC, ngram ASC LIMIT 50
    """,
)
def text_bigram_counts(spark, sf_dir):
    """Corpus bigram table (operators.text.ngram_counts): row-local n-gram
    construction via transform(sequence)+slice — no token self-join — then
    one map-side-combined count; the top-50 cut plans as
    TakeOrderedAndProject."""
    from boann_ocsf_security_data_platform_spark.operators.text import ngram_counts

    return ngram_counts(
        _t(spark, sf_dir, "documents"), text_col="text", n=2, top_k=50
    )


@_q(
    "dedup_prefix_filter_jaccard",
    f"""
    WITH s AS (
      SELECT doc_id,
             list_distinct(list_filter(string_split({_NORM}, ' '),
                                       x -> x <> '')) AS toks
      FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
                 (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))),
                 6) AS jaccard
    FROM s a JOIN s b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
          (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.9
    """,
)
def dedup_prefix_filter_jaccard(spark, sf_dir):
    """Exact set-similarity join WITHOUT a blocking key (operators.dedup.
    prefix_filter_jaccard_pairs, PPJoin-style prefix filtering): candidates
    join only on globally-rare prefix tokens, then exact Jaccard verifies —
    output provably identical to the oracle's O(n²) loop (which the oracle
    runs; the operator does not).

    SIZE-GATED (round 8): above HUBNESS_EXACT_MAX_ROWS documents, exact
    duplicates are collapsed to one representative per content hash
    BEFORE the similarity join, and pairs are emitted among DISTINCT
    texts only. On a duplication-heavy corpus the jaccard=1.0 replica
    pairs are the quadratic TRUE OUTPUT (measured 972 s at sf1 on the
    key-offset-replicated corpus, where every doc has 10 exact copies:
    prefix tokens of identical token sets always collide — no filter can
    help when the output itself is O(copies²)); nobody consumes that
    list — exact dedup reports duplicate GROUPS in linear time (the
    containment pipeline-order note). Below the gate (sf0.01/sf0.1) the
    full pair set is emitted, provably identical to the O(n²) oracle."""
    from boann_ocsf_security_data_platform_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )

    d, _, pin = _docs_gated_with_pin(spark, sf_dir)
    return prefix_filter_jaccard_pairs(
        d, threshold=0.9, pin_shuffle_join=pin
    )


@_q(
    "corpus_weighted_sample",
    """
    SELECT doc_id, n_chars FROM (
      SELECT doc_id, n_chars,
             -ln((CAST(concat('0x', substr(md5(concat('wsamp0:',
                   CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 1000000
                  + 0.5) / 1000000.0) / n_chars AS es_key
      FROM documents WHERE n_chars > 0)
    ORDER BY es_key, doc_id LIMIT 100
    """,
)
def corpus_weighted_sample(spark, sf_dir):
    """Deterministic weighted sample without replacement (operators.
    relational.weighted_sample, Efraimidis–Spirakis keys over the portable
    hash): inclusion probability ∝ n_chars; the k-smallest-keys cut plans
    as TakeOrderedAndProject."""
    from boann_ocsf_security_data_platform_spark.operators.relational import (
        weighted_sample,
    )

    return weighted_sample(
        _t(spark, sf_dir, "documents"),
        id_col="doc_id",
        weight_col="n_chars",
        k=100,
    ).select("doc_id", "n_chars")


@_q(
    "events_transition_counts",
    """
    WITH seq AS (
      SELECT user_id,
             list(coalesce(event_type, '(null)') ORDER BY ts, event_id) AS ev
      FROM events GROUP BY user_id
    ), trans AS (
      SELECT unnest(list_transform(list_zip(ev[1:len(ev)-1], ev[2:len(ev)]),
                                   s -> concat(s[1], '->', s[2]))) AS transition
      FROM seq WHERE len(ev) >= 2
    )
    SELECT transition, CAST(count(*) AS BIGINT) AS n_occurrences
    FROM trans GROUP BY transition
    """,
)
def events_transition_counts(spark, sf_dir):
    """User-journey transition matrix (Markov counts): per-user event
    sequences ordered by (ts, event_id), consecutive pairs counted
    corpus-wide. One shuffle groups each user's events; the pairing is
    row-local (`zip_with` over two slices — no self-join on position), and
    the final count is map-side combined over the tiny transition space.
    NULL event_type is coalesced to '(null)' on BOTH engines: Spark's
    ``concat`` null-propagates while DuckDB's skips NULL args, so the
    sentinel keeps the oracle pairing identical under schema drift."""
    e = _t(spark, sf_dir, "events")
    seq = e.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ).alias("s")
    )
    ev = F.transform("s", lambda x: F.coalesce(x["event_type"], F.lit("(null)")))
    trans = F.when(
        F.size(ev) >= 2,
        F.zip_with(
            F.slice(ev, 1, F.size(ev) - 1),
            F.slice(ev, 2, F.size(ev) - 1),
            lambda a, b: F.concat(a, F.lit("->"), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        seq.select(F.explode(trans).alias("transition"))
        .groupBy("transition")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )


@_q(
    "profile_lineitem_columns",
    """
    SELECT 'l_quantity' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count(l_quantity) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
           CAST(min(l_quantity) AS DOUBLE) AS min_val,
           CAST(max(l_quantity) AS DOUBLE) AS max_val
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(l_extendedprice) AS BIGINT),
           CAST(count(DISTINCT l_extendedprice) AS BIGINT),
           CAST(min(l_extendedprice) AS DOUBLE),
           CAST(max(l_extendedprice) AS DOUBLE)
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(l_discount) AS BIGINT),
           CAST(count(DISTINCT l_discount) AS BIGINT),
           CAST(min(l_discount) AS DOUBLE),
           CAST(max(l_discount) AS DOUBLE)
    FROM lineitem
    """,
)
def profile_lineitem_columns(spark, sf_dir):
    """One-pass data-quality profile (operators.relational.
    profile_columns, exact mode for the oracle; approx=True is the scale
    default — HLL distincts keep it a single partial+final aggregate with
    no Expand duplication)."""
    from boann_ocsf_security_data_platform_spark.operators.relational import (
        profile_columns,
    )

    return profile_columns(
        _t(spark, sf_dir, "lineitem"),
        ["l_quantity", "l_extendedprice", "l_discount"],
        approx=False,
    )


@_q(
    "text_bm25_search",
    f"""
    WITH base AS (
      SELECT doc_id, list_filter(string_split({_NORM}, ' '), t -> t <> '') AS l
      FROM documents
    ), b2 AS (SELECT doc_id, len(l) AS dl, l FROM base),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avg_dl FROM b2),
    hits AS (SELECT doc_id, dl, unnest(l) AS term FROM b2),
    tf AS (
      SELECT doc_id, dl, term, count(*) AS tf FROM hits
      WHERE term IN ('hash', 'join', 'filter')
      GROUP BY doc_id, dl, term
    ), dft AS (SELECT term, count(*) AS df_t FROM tf GROUP BY term)
    SELECT doc_id,
           round(sum(ln(1 + (n_docs - df_t + 0.5) / (df_t + 0.5))
                     * tf * 2.2
                     / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avg_dl))), 6) AS bm25
    FROM tf JOIN dft USING (term), stats
    GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id LIMIT 10
    """,
)
def text_bm25_search(spark, sf_dir):
    """Okapi BM25 keyword retrieval (operators.text.bm25_search): the
    lexical RAG-search baseline. Token stream filters to the query terms
    before any shuffle; corpus stats ride one broadcast row; the cut is
    TakeOrderedAndProject."""
    from boann_ocsf_security_data_platform_spark.operators.text import bm25_search

    return bm25_search(
        _t(spark, sf_dir, "documents"),
        query_terms=["hash", "join", "filter"],
        k=10,
    )


@_q(
    "feature_quantile_bins",
    """
    WITH th AS (
      SELECT quantile_cont(l_extendedprice, [0.25, 0.5, 0.75]) AS t
      FROM lineitem
    )
    SELECT CAST(len(list_filter(t, x -> l_extendedprice > x)) + 1 AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           round(min(l_extendedprice), 2) AS bin_min,
           round(max(l_extendedprice), 2) AS bin_max
    FROM lineitem, th
    GROUP BY 1
    """,
)
def feature_quantile_bins(spark, sf_dir):
    """Equi-depth feature discretization (operators.relational.
    quantile_bins): quartile boundaries from one exact-percentile
    aggregate, broadcast as a one-row table; assignment is a row-local
    count over the threshold array — no data shuffle."""
    from boann_ocsf_security_data_platform_spark.operators.relational import (
        quantile_bins,
    )

    return (
        quantile_bins(_t(spark, sf_dir, "lineitem"), "l_extendedprice")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("l_extendedprice"), 2).alias("bin_min"),
            F.round(F.max("l_extendedprice"), 2).alias("bin_max"),
        )
    )


# ---------------------------------------------------------------------------
# Round-4 additions: lateral join, k-means refine, bigram LM, containment
# ---------------------------------------------------------------------------


@_q(
    "join_lateral_topk",
    """
    SELECT n.n_name, t.c_name, t.c_acctbal
    FROM nation n,
    LATERAL (SELECT c_name, c_acctbal FROM customer c
             WHERE c.c_nationkey = n.n_nationkey
             ORDER BY c_acctbal DESC, c_name LIMIT 2) t
    """,
)
def join_lateral_topk(spark, sf_dir):
    """Correlated LATERAL derived table (top-2 customers per nation by
    account balance) — the per-row-subquery join shape. Spark decorrelates
    the lateral ORDER BY/LIMIT into a ranked window over one equi-join on
    the correlation key (a DomainJoin rewrite), so the plan is the same
    shuffle-once WindowGroupLimit a hand-written top-k-per-group gets —
    no nested-loop per-outer-row execution at scale."""
    _t(spark, sf_dir, "nation").createOrReplaceTempView("_lat_nation")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("_lat_customer")
    return spark.sql(
        """
        SELECT n.n_name, t.c_name, t.c_acctbal
        FROM _lat_nation n,
        LATERAL (SELECT c_name, c_acctbal FROM _lat_customer c
                 WHERE c.c_nationkey = n.n_nationkey
                 ORDER BY c_acctbal DESC, c_name LIMIT 2) t
        """
    )


def _kmeans_oracle(k: int = 8, dim: int = 64) -> str:
    comps = ", ".join(
        f"CAST(round(round(avg(v[{i + 1}]), 6) * 1000000) AS BIGINT)"
        for i in range(dim)
    )
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    seeds AS (SELECT vec_id AS cent_id, v AS c FROM e ORDER BY vec_id LIMIT {k}),
    scored AS (
      SELECT e.vec_id, e.v, seeds.cent_id,
             round(list_dot_product(e.v, seeds.c) /
                   (sqrt(list_dot_product(e.v, e.v))
                    * sqrt(list_dot_product(seeds.c, seeds.c))), 6) AS cos
      FROM e CROSS JOIN seeds),
    assign AS (
      SELECT vec_id, v, cent_id,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cos DESC, cent_id ASC) AS rn
      FROM scored)
    SELECT cent_id, array_to_string([{comps}], ',') AS centroid,
           CAST(count(*) AS BIGINT) AS n_members
    FROM assign WHERE rn = 1
    GROUP BY cent_id
    """


@_q("embedding_kmeans_refine", _kmeans_oracle())
def embedding_kmeans_refine(spark, sf_dir):
    """One Lloyd iteration of IVF-centroid training (operators.similarity.
    kmeans_refine) from the deterministic lowest-id seed: nearest-centroid
    assignment is a PURE PROJECTION over inlined centroid literals (the
    corpus is never shuffled), the recompute one k×dim hash-aggregate.
    Assignment scores round to 6 decimals with ties to the lowest cent_id
    so the argmax is engine-portable. Centroid serialized as micro-unit
    CSV (gate window is array-free)."""
    from boann_ocsf_security_data_platform_spark.operators.similarity import (
        kmeans_refine,
    )

    emb = _t(spark, sf_dir, "embeddings")
    seeds = [
        (r[0], [float(x) for x in r[1]])
        for r in emb.orderBy("vec_id")
        .limit(8)
        .select("vec_id", "embedding")
        .collect()  # bounded: the model seed (8 × 64 floats)
    ]
    out = kmeans_refine(emb, seeds)
    return out.select(
        "cent_id",
        F.array_join(
            F.transform(
                "centroid",
                lambda x: F.round(x * 1e6).cast("long").cast("string"),
            ),
            ",",
        ).alias("centroid"),
        "n_members",
    )


@_q(
    "text_bigram_lm_score",
    f"""
    WITH toks AS (SELECT doc_id, {_WORDS} AS w FROM documents),
    bi AS (SELECT doc_id,
                  list_transform(range(1, len(w)),
                                 i -> concat(w[i], ' ', w[i + 1])) AS gs
           FROM toks WHERE len(w) >= 2),
    inst AS (SELECT doc_id, unnest(gs) AS bigram FROM bi),
    dg AS (SELECT doc_id, bigram, count(*) AS n FROM inst
           GROUP BY doc_id, bigram),
    cbi AS (SELECT bigram, sum(n) AS c_bi FROM dg GROUP BY bigram),
    ctx AS (SELECT split_part(bigram, ' ', 1) AS w1, sum(c_bi) AS c_ctx
            FROM cbi GROUP BY w1),
    voc AS (SELECT count(DISTINCT t) AS v
            FROM (SELECT unnest(w) AS t FROM toks)),
    sc AS (SELECT dg.doc_id, CAST(sum(dg.n) AS BIGINT) AS n_bigrams,
                  round(sum(dg.n * ln((c_bi + 1.0) / (c_ctx + 1.0 * v)))
                        / sum(dg.n), 6) AS lm_score
           FROM dg JOIN cbi USING (bigram)
           JOIN ctx ON split_part(dg.bigram, ' ', 1) = ctx.w1, voc
           GROUP BY dg.doc_id)
    SELECT d.doc_id, CAST(coalesce(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           sc.lm_score
    FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
    """,
)
def text_bigram_lm_score(spark, sf_dir):
    """Corpus-bigram LM quality score (operators.text.bigram_lm_score):
    mean log-prob of each document's bigrams under an add-1-smoothed
    bigram model fit on the corpus itself — the CCNet-style perplexity
    filter without an external LM. Model tables are two distinct-gram
    aggregates; scoring joins (doc, gram) counts to them; V rides a
    one-row broadcast."""
    from boann_ocsf_security_data_platform_spark.operators.text import (
        bigram_lm_score,
    )

    return bigram_lm_score(
        _t(spark, sf_dir, "documents"),
        pin_shuffle_join=_gates.pin_shuffle_join(_table_count(spark, sf_dir, "documents")),
    )


@_q(
    "dedup_containment_pairs",
    f"""
    WITH words AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
    wh_t AS (SELECT doc_id, ws, {_WH_EXPR} AS wh FROM words),
    sh AS (SELECT doc_id, unnest({_HS_EXPR}) AS s FROM wh_t),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT id_a, id_b, round(c * 1.0 / sz, 6) AS containment
    FROM inter JOIN sizes ON inter.id_a = sizes.doc_id
    WHERE round(c * 1.0 / sz, 6) >= 0.8
    """,
)
def dedup_containment_pairs(spark, sf_dir):
    """Directional shingle-containment pairs ≥ 0.8 (operators.dedup.
    containment_pairs): |shingles(A) ∩ shingles(B)| / |shingles(A)| —
    catches documents EMBEDDED in larger ones (quote inclusion, benchmark
    question inside a crawl page), which symmetric Jaccard misses.
    Candidates come only from the shingle-key equi-join; the
    max_shingle_df stop-gram valve is the 100 TB skew control.

    SIZE-GATED (round 8, the prefix-filter discipline): above
    HUBNESS_EXACT_MAX_ROWS documents, exact duplicates collapse to one
    representative per content hash BEFORE the shingle join — replica
    pairs are containment-1.0 TRUE OUTPUT growing with copies² (the r4
    note's 42 s uncapped at sf1; 94.6 s in the round-8 registry sweep)
    and belong to exact dedup's linear report, while genuine
    embedded-document pairs survive among the distinct texts. Below the
    gate the full pair set is emitted (the oracle-hashed arm)."""
    from boann_ocsf_security_data_platform_spark.operators.dedup import (
        containment_pairs,
        exact_dedup,
    )

    d, _, pin = _docs_gated_with_pin(spark, sf_dir)
    return containment_pairs(
        d,
        threshold=0.8,
        max_shingle_df=_gates.MAX_SHINGLE_DF,
        pin_shuffle_join=pin,
    )


@_q(
    "corpus_dsir_weights",
    f"""
    WITH toks AS (SELECT doc_id, source, {_WORDS} AS w FROM documents),
    grams AS (SELECT doc_id, source,
                     list_transform(range(1, len(w)),
                                    i -> concat(w[i], ' ', w[i + 1])) AS gs
              FROM toks WHERE len(w) >= 2),
    feats AS (SELECT doc_id, source,
                     {_H64.format(expr="unnest(gs)")} % 1024 AS bucket
              FROM grams),
    raw_c AS (SELECT bucket, count(*) AS c_raw FROM feats
              WHERE source <> '{_DECON_BENCH}' GROUP BY bucket),
    tgt_c AS (SELECT bucket, count(*) AS c_tgt FROM feats
              WHERE source = '{_DECON_BENCH}' GROUP BY bucket),
    n_r AS (SELECT sum(c_raw) AS n_raw FROM raw_c),
    n_t AS (SELECT sum(c_tgt) AS n_tgt FROM tgt_c),
    model AS (
      SELECT coalesce(raw_c.bucket, tgt_c.bucket) AS bucket,
             ln(((coalesce(c_tgt, 0) + 1.0) / (n_tgt + 1.0 * 1024))
                / ((coalesce(c_raw, 0) + 1.0) / (n_raw + 1.0 * 1024))) AS lr
      FROM raw_c FULL OUTER JOIN tgt_c ON raw_c.bucket = tgt_c.bucket, n_r, n_t),
    sc AS (SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
                  round(sum(lr), 6) AS dsir_logweight
           FROM feats f JOIN model USING (bucket)
           WHERE f.source <> '{_DECON_BENCH}'
           GROUP BY f.doc_id)
    SELECT d.doc_id, CAST(coalesce(sc.n_feats, 0) AS BIGINT) AS n_feats,
           sc.dsir_logweight
    FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
    WHERE d.source <> '{_DECON_BENCH}'
    """,
)
def corpus_dsir_weights(spark, sf_dir):
    """DSIR importance weights (operators.text.dsir_importance, Xie et al.
    2023): score corpus documents by hashed-bigram distribution similarity
    to the held-out target shard — the domain-upsampling selection signal.
    The log-ratio model is ≤1024 rows and BROADCASTS, so the corpus
    shuffles exactly once (per-doc aggregate) at any scale."""
    from boann_ocsf_security_data_platform_spark.operators.text import (
        dsir_importance,
    )

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("source") != _DECON_BENCH)
    target = docs.filter(F.col("source") == _DECON_BENCH)
    return dsir_importance(
        corpus, target, pin_shuffle_join=_gates.pin_shuffle_join(_table_count(spark, sf_dir, "documents"))
    )


# ---------------------------------------------------------------------------
# Round-4 second wave: sub-document dedup, incremental dedup, PQ, PageRank,
# corpus statistics, regression/bit aggregates
# ---------------------------------------------------------------------------


@_q(
    "text_segment_dedup",
    f"""
    WITH w AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
    st AS (SELECT doc_id, ws, unnest(range(1, len(ws) + 1, 10)) AS s
           FROM w WHERE len(ws) > 0),
    segs AS (SELECT doc_id, CAST((s - 1) // 10 + 1 AS BIGINT) AS seg_idx,
                    array_to_string(list_slice(ws, s, s + 9), ' ') AS seg
             FROM st),
    win AS (SELECT seg, min({{'d': doc_id, 'i': seg_idx}}) AS mk
            FROM segs GROUP BY seg),
    kept AS (SELECT s.doc_id, s.seg_idx, s.seg
             FROM segs s JOIN win ON s.seg = win.seg
             WHERE s.doc_id = win.mk.d AND s.seg_idx = win.mk.i),
    re AS (SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_idx) AS text_deduped,
                  CAST(count(*) AS BIGINT) AS n_seg_kept
           FROM kept GROUP BY doc_id)
    SELECT w.doc_id, coalesce(re.text_deduped, '') AS text_deduped,
           CAST(coalesce(re.n_seg_kept, 0) AS BIGINT) AS n_seg_kept,
           CAST(ceil(len(w.ws) / 10.0) AS BIGINT) AS n_seg_total
    FROM w LEFT JOIN re ON w.doc_id = re.doc_id
    """,
)
def text_segment_dedup(spark, sf_dir):
    """Sub-document exact dedup (operators.text.segment_dedup): C4/Gopher
    repeated-passage removal — keep only the corpus-wide FIRST occurrence
    of every distinct 10-word segment and reassemble documents in order.
    One generate + one map-side-combinable winner aggregate + one
    segment-key join + one regroup; deliberately NOT a window over the
    segment key, whose hot boilerplate partitions would skew at 100 TB."""
    from boann_ocsf_security_data_platform_spark.operators.text import segment_dedup

    return segment_dedup(
        _t(spark, sf_dir, "documents"),
        seg_words=10,
        pin_shuffle_join=_gates.pin_shuffle_join(_table_count(spark, sf_dir, "documents")),
    )


@_q(
    "dedup_cross_corpus",
    f"""
    WITH words AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
    wh_t AS (SELECT doc_id, ws, {_WH_EXPR} AS wh FROM words),
    sh AS (SELECT doc_id, {_HS_EXPR} AS shingles FROM wh_t),
    ex_new AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh
               WHERE doc_id % 5 = 0),
    ex_idx AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh
               WHERE doc_id % 5 <> 0),
    sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
    inter AS (
      SELECT n.doc_id AS new_id, i.doc_id AS index_id, count(*) AS n_inter
      FROM ex_new n JOIN ex_idx i ON n.shingle = i.shingle
      GROUP BY 1, 2)
    SELECT new_id, index_id,
           round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
    FROM inter JOIN sizes sa ON sa.doc_id = new_id
               JOIN sizes sb ON sb.doc_id = index_id
    WHERE round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.5
    """,
)
def dedup_cross_corpus(spark, sf_dir):
    """Incremental new-batch-vs-index dedup (operators.dedup.
    cross_corpus_jaccard_pairs): exact n-gram Jaccard of each new delivery
    (doc_id % 5 = 0 stands in for today's crawl) against the already-
    ingested index — candidates only where a shingle is shared, never
    |new| × |index|; at scale the index's exploded shingles are the
    persisted artifact, bucketed by shingle for a co-located join.

    SIZE-GATED (the containment/prefix-filter discipline): above
    HUBNESS_EXACT_MAX_ROWS documents, exact duplicates collapse to one
    representative per content hash WITHIN EACH SIDE before the shingle
    join. Within-side replicas are jaccard-1.0 TRUE OUTPUT growing with
    copies² (the r4 scale note measured exactly 100.0x pairs at 10x data;
    the sf10 sweep hit 71x wall on the same inherent blowup) and belong
    to exact dedup's linear report; cross-side duplicates — the very
    signal incremental dedup exists to emit — survive as one
    representative pair per distinct text. Below the gate the full pair
    set is emitted (the oracle-hashed arm)."""
    from boann_ocsf_security_data_platform_spark.operators.dedup import (
        cross_corpus_jaccard_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    new_df = docs.filter(F.col("doc_id") % 5 == 0)
    idx_df = docs.filter(F.col("doc_id") % 5 != 0)
    n = _table_count(spark, sf_dir, "documents")
    if n > HUBNESS_EXACT_MAX_ROWS:
        new_df = _collapse_exact_docs(new_df, 0)
        idx_df = _collapse_exact_docs(idx_df, 0)
    return cross_corpus_jaccard_pairs(
        new_df,
        idx_df,
        threshold=0.5,
        max_shingle_df=_gates.MAX_SHINGLE_DF,
        pin_shuffle_join=_gates.pin_shuffle_join(n),
    )


@_q(
    "text_zipf_stats",
    f"""
    WITH c AS (SELECT term, count(*) AS freq
               FROM (SELECT unnest({_WORDS}) AS term FROM documents)
               GROUP BY term ORDER BY freq DESC, term LIMIT 1000),
    r AS (SELECT freq, row_number() OVER (ORDER BY freq DESC, term) AS rank
          FROM c)
    SELECT CAST(count(*) AS BIGINT) AS n_terms,
           round(regr_slope(ln(CAST(freq AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 6) AS zipf_slope,
           round(regr_intercept(ln(CAST(freq AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 6) AS zipf_intercept,
           round(regr_r2(ln(CAST(freq AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 6) AS zipf_r2
    FROM r
    """,
)
def text_zipf_stats(spark, sf_dir):
    """Zipf's-law fit over the corpus term-frequency distribution
    (operators.text.zipf_stats): regress ln(freq) on ln(rank) over the
    top-1000 terms — a one-row corpus-health signal (natural language sits
    near slope −1; templated/synthetic corpora drift). One token-count
    aggregate + a TakeOrderedAndProject cut; the ranking window runs over
    the bounded top-N set only, never the full vocabulary."""
    from boann_ocsf_security_data_platform_spark.operators.text import zipf_stats

    return zipf_stats(_t(spark, sf_dir, "documents"), top_n=1000)


def _pagerank_oracle(damping: float = 0.85, iters: int = 3) -> str:
    base = """
    WITH e AS (SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
                      CAST(count(*) AS DOUBLE) AS w
               FROM lineitem l
               JOIN orders o ON l.l_orderkey = o.o_orderkey
               JOIN customer c ON o.o_custkey = c.c_custkey
               JOIN supplier s ON l.l_suppkey = s.s_suppkey
               GROUP BY 1, 2),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    outw AS (SELECT src, sum(w) AS w_out FROM e GROUP BY src),
    r0 AS (SELECT node, round(1.0 / n, 8) AS r FROM nodes, nn)"""
    prev = "r0"
    for i in range(1, iters + 1):
        base += f""",
    d{i} AS (SELECT coalesce(sum(r), 0.0) AS dang FROM {prev}
             LEFT JOIN outw ON {prev}.node = outw.src WHERE outw.src IS NULL),
    c{i} AS (SELECT e.dst AS node, sum({prev}.r * e.w / outw.w_out) AS c
             FROM e JOIN {prev} ON e.src = {prev}.node
             JOIN outw ON e.src = outw.src GROUP BY e.dst),
    r{i} AS (SELECT nodes.node,
                    round((1 - {damping}) / n
                          + {damping} * (coalesce(c{i}.c, 0.0) + dang / n),
                          8) AS r
             FROM nodes LEFT JOIN c{i} ON nodes.node = c{i}.node, nn, d{i})"""
        prev = f"r{i}"
    return base + f"""
    SELECT node AS nationkey, round(r, 6) AS pagerank FROM {prev}
    """


@_q("graph_pagerank", _pagerank_oracle())
def graph_pagerank(spark, sf_dir):
    """Weighted PageRank over the customer-nation → supplier-nation trade
    graph (operators.graph.pagerank), 3 fixed rounds, damping 0.85, proper
    dangling-mass redistribution — the iterative-graph-algorithm shape
    behind the CommonCrawl-link-graph quality prior in pretraining
    pipelines. Each round is one edges⋈ranks equi-join + one
    map-side-combinable aggregate with localCheckpoint lineage cuts;
    per-round rounding keeps engine summation-order ULPs from
    compounding."""
    from boann_ocsf_security_data_platform_spark.operators.graph import pagerank

    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    edges = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    pr = pagerank(edges, weight_col="w", damping=0.85, iters=3)
    return pr.select(
        F.col("node").alias("nationkey"), F.round("pagerank", 6).alias("pagerank")
    )


@_q(
    "agg_linear_regression",
    """
    SELECT l_returnflag,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           round(regr_avgx(l_extendedprice, l_quantity), 4) AS avg_x,
           round(regr_avgy(l_extendedprice, l_quantity), 4) AS avg_y
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_linear_regression(spark, sf_dir):
    """Linear-regression aggregates (regr_slope/intercept/r2/count/avgx/
    avgy) of extended price on quantity per return flag — the in-database
    OLS family, one partial+final hash-aggregate (Spark's regr_* are
    declarative aggregates with map-side combine, same as sum/avg)."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.expr("regr_count(l_extendedprice, l_quantity)").cast("long").alias("n"),
        F.round(F.expr("regr_slope(l_extendedprice, l_quantity)"), 4).alias("slope"),
        F.round(
            F.expr("regr_intercept(l_extendedprice, l_quantity)"), 4
        ).alias("intercept"),
        F.round(F.expr("regr_r2(l_extendedprice, l_quantity)"), 6).alias("r2"),
        F.round(F.expr("regr_avgx(l_extendedprice, l_quantity)"), 4).alias("avg_x"),
        F.round(F.expr("regr_avgy(l_extendedprice, l_quantity)"), 4).alias("avg_y"),
    )


@_q(
    "agg_mode_bitops",
    """
    WITH c AS (SELECT l_returnflag, l_quantity, count(*) AS cnt
               FROM lineitem GROUP BY 1, 2),
    m AS (SELECT l_returnflag,
                 min({'nc': -cnt, 'q': l_quantity}).q AS mode_qty
          FROM c GROUP BY 1),
    b AS (SELECT l_returnflag,
                 CAST(bit_and(l_linenumber) AS BIGINT) AS lines_bit_and,
                 CAST(bit_or(l_linenumber) AS BIGINT) AS lines_bit_or,
                 CAST(bit_xor(l_linenumber) AS BIGINT) AS lines_bit_xor
          FROM lineitem GROUP BY 1)
    SELECT m.l_returnflag, round(m.mode_qty, 2) AS mode_qty,
           lines_bit_and, lines_bit_or, lines_bit_xor
    FROM m JOIN b ON m.l_returnflag = b.l_returnflag
    """,
)
def agg_mode_bitops(spark, sf_dir):
    """Deterministic mode (most frequent quantity per return flag, ties to
    the smallest value — an explicit (count desc, value asc) argmin rather
    than the engine-defined tie order of a native mode()) plus the bitwise
    aggregate family (bit_and/bit_or/bit_xor). Two map-side-combinable
    aggregates and a tiny join — no window over the full table."""
    l = _t(spark, sf_dir, "lineitem")
    counts = l.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    mode = counts.groupBy("l_returnflag").agg(
        F.min(
            F.struct((-F.col("cnt")).alias("nc"), F.col("l_quantity").alias("q"))
        )["q"].alias("mode_qty")
    )
    bits = l.groupBy("l_returnflag").agg(
        F.bit_and("l_linenumber").cast("long").alias("lines_bit_and"),
        F.bit_or("l_linenumber").cast("long").alias("lines_bit_or"),
        F.bit_xor("l_linenumber").cast("long").alias("lines_bit_xor"),
    )
    # both sides are PROVABLY return-flag grain (<= a handful of rows)
    # but carry fact-scaling estimates, so the planner sort-merged them
    # and fused the mode's SortAggregate into the join region (round-12
    # scan-all find) — explicit bounded broadcast.
    return mode.join(F.broadcast(bits), "l_returnflag").select(
        "l_returnflag",
        F.round("mode_qty", 2).alias("mode_qty"),
        "lines_bit_and",
        "lines_bit_or",
        "lines_bit_xor",
    )


def _pq_oracle(m: int = 4, k_codes: int = 4, dim: int = 64) -> str:
    sub = dim // m
    diff = (
        f"(CAST(e.embedding[sp.s * {sub} + i] AS DOUBLE)"
        f" - CAST(sd.cv[sp.s * {sub} + i] AS DOUBLE))"
    )
    pivot = ", ".join(
        f"CAST(max(CASE WHEN s = {s} THEN code END) AS BIGINT) AS code_{s}"
        for s in range(m)
    )
    return f"""
    WITH seeds AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS scode,
             embedding AS cv
      FROM (SELECT vec_id, embedding FROM embeddings
            ORDER BY vec_id LIMIT {k_codes})),
    sp AS (SELECT unnest(range(0, {m})) AS s),
    dist AS (
      SELECT e.vec_id, sp.s, sd.scode,
             round(list_sum(list_transform(range(1, {sub + 1}),
                   i -> {diff} * {diff})), 6) AS d
      FROM embeddings e CROSS JOIN sp CROSS JOIN seeds sd),
    best AS (SELECT vec_id, s, min({{'d': d, 'c': scode}}).c AS code
             FROM dist GROUP BY vec_id, s)
    SELECT vec_id, {pivot} FROM best GROUP BY vec_id
    """


@_q("embedding_pq_encode", _pq_oracle())
def embedding_pq_encode(spark, sf_dir):
    """Product-quantization encoding (operators.similarity.pq_encode):
    4 subspaces × 4 deterministic seed codes over the 64-dim embeddings —
    vector compression to m scalar codes with ANN-searchable structure
    (pq_adc_topk is the search side; lossless-codebook ADC == exact is the
    pinned invariant). The codebook is a bounded literal model, so
    encoding is a shuffle-free pure projection at scan bandwidth."""
    from boann_ocsf_security_data_platform_spark.operators.similarity import (
        pq_codebooks_from_seeds,
        pq_encode,
    )

    emb = _t(spark, sf_dir, "embeddings")
    books = pq_codebooks_from_seeds(emb, m=4, k_codes=4, dim=64)
    return pq_encode(emb, books)


# ---------------------------------------------------------------------------
# Round-4 third wave: TSDB-style event rollups, SCD2, path mining,
# embedding drift profile
# ---------------------------------------------------------------------------


@_q(
    "events_time_weighted_avg",
    """
    WITH s AS (SELECT user_id, value, ts, event_id,
                      lead(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS lead_ts
               FROM events),
    d AS (SELECT user_id, value,
                 CAST(date_diff('microsecond', ts, lead_ts) AS DOUBLE)
                   / 1000000.0 AS dur
          FROM s)
    SELECT user_id,
           round(sum(value * dur) / sum(dur), 6) AS twa,
           CAST(count(dur) AS BIGINT) AS n_intervals,
           CAST(floor(coalesce(sum(dur), 0)) AS BIGINT) AS total_seconds
    FROM d GROUP BY user_id
    """,
)
def events_time_weighted_avg(spark, sf_dir):
    """Time-weighted average per user (operators.timeseries.
    time_weighted_avg): each observation weighted by the seconds it was
    'held' — the correct mean for irregularly-sampled gauges. One lead()
    window + one aggregate; timestampdiff keeps it NTZ-safe."""
    from boann_ocsf_security_data_platform_spark.operators.timeseries import (
        time_weighted_avg,
    )

    return time_weighted_avg(_t(spark, sf_dir, "events"))


@_q(
    "events_ohlc_bars",
    """
    SELECT event_type, date_trunc('hour', ts) AS bar_start,
           round(min({'t': ts, 'e': event_id, 'v': value}).v, 6) AS open,
           round(max(value), 6) AS high,
           round(min(value), 6) AS low,
           round(max({'t': ts, 'e': event_id, 'v': value}).v, 6) AS close,
           round(sum(value), 6) AS volume,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1, 2
    """,
)
def events_ohlc_bars(spark, sf_dir):
    """Hourly open/high/low/close/volume bars per event type
    (operators.timeseries.ohlc_bars) — the TSDB downsampling rollup as
    ONE map-side-combinable hash-aggregate: open/close are min/max over a
    (ts, event_id, value) struct, so no window and no sort, and first/
    last stay deterministic under equal timestamps."""
    from boann_ocsf_security_data_platform_spark.operators.timeseries import (
        ohlc_bars,
    )

    return ohlc_bars(_t(spark, sf_dir, "events"))


@_q(
    "events_locf_fill",
    """
    SELECT event_id, user_id, ts, obs,
           last_value(obs IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
    FROM (SELECT event_id, user_id, ts,
                 CASE WHEN event_type IN ('purchase', 'signup') THEN value
                 END AS obs
          FROM events)
    """,
)
def events_locf_fill(spark, sf_dir):
    """Last-observation-carried-forward gap repair (operators.timeseries.
    locf_fill): values observed only on purchase/signup events forward-
    fill every other row per user — last(ignorenulls) over a running
    frame, the IGNORE NULLS window family in one query."""
    from boann_ocsf_security_data_platform_spark.operators.timeseries import (
        locf_fill,
    )

    e = _t(spark, sf_dir, "events").withColumn(
        "obs",
        F.when(
            F.col("event_type").isin("purchase", "signup"), F.col("value")
        ),
    )
    return locf_fill(e, val_col="obs").select(
        "event_id", "user_id", "ts", "obs", "filled"
    )


@_q(
    "events_scd2",
    """
    WITH c AS (SELECT user_id, event_type, ts, event_id,
                      lag(event_type) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id) AS prev
               FROM events),
    ch AS (SELECT user_id, event_type, ts AS valid_from, event_id
           FROM c WHERE prev IS NULL OR prev <> event_type)
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from, event_id) AS valid_to,
           lead(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from, event_id) IS NULL
             AS is_current
    FROM ch
    """,
)
def events_scd2(spark, sf_dir):
    """Slowly-changing-dimension type-2 build (operators.timeseries.
    scd2_intervals): collapse the per-user event_type change log into
    (attr, valid_from, valid_to, is_current) intervals — the CDC
    dimension-build. Two windows over one per-key ordering; the open
    interval has NULL valid_to."""
    from boann_ocsf_security_data_platform_spark.operators.timeseries import (
        scd2_intervals,
    )

    return scd2_intervals(_t(spark, sf_dir, "events"))


@_q(
    "events_top_paths",
    """
    WITH o AS (SELECT user_id, list(event_type ORDER BY ts, event_id) AS steps
               FROM events GROUP BY user_id),
    p AS (SELECT unnest(CASE WHEN len(steps) >= 3 THEN
                   list_transform(range(1, len(steps) - 1),
                     i -> steps[i] || '>' || steps[i + 1] || '>' || steps[i + 2])
                 ELSE CAST([] AS VARCHAR[]) END) AS path
          FROM o)
    SELECT path, CAST(count(*) AS BIGINT) AS n_occurrences
    FROM p GROUP BY path ORDER BY n_occurrences DESC, path LIMIT 10
    """,
)
def events_top_paths(spark, sf_dir):
    """Top-10 three-step user journeys (operators.timeseries.top_k_paths)
    — sequence/path mining over the event log (attack-chain shape in a
    security pipeline). Ordered per-user re-aggregation (bounded by
    per-user event counts), row-local path slicing, map-side-combinable
    count, TakeOrderedAndProject cut."""
    from boann_ocsf_security_data_platform_spark.operators.timeseries import (
        top_k_paths,
    )

    return top_k_paths(_t(spark, sf_dir, "events"))


@_q(
    "embedding_dim_profile",
    """
    WITH c AS (SELECT generate_subscripts(embedding, 1) AS dim,
                      CAST(unnest(embedding) AS DOUBLE) AS v
               FROM embeddings)
    SELECT CAST(dim AS INT) AS dim,
           round(avg(v), 6) AS mean,
           round(stddev_samp(v), 6) AS stddev,
           round(min(v), 6) AS mn,
           round(max(v), 6) AS mx
    FROM c GROUP BY 1
    """,
)
def embedding_dim_profile(spark, sf_dir):
    """Per-dimension embedding statistics (operators.similarity.
    embedding_dim_profile): (dim, mean, stddev, min, max) — the vector-
    corpus drift monitor. posexplode feeds a map-side-combinable
    aggregate, so the shuffle carries dim × partials, never vectors."""
    from boann_ocsf_security_data_platform_spark.operators.similarity import (
        embedding_dim_profile,
    )

    return embedding_dim_profile(_t(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# Round-4 fourth wave: recursive CTE, pagination
# ---------------------------------------------------------------------------

_REACH_EDGES = """
    SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
"""


@_q(
    "recursive_nation_reachability",
    f"""
    WITH RECURSIVE edges AS ({_REACH_EDGES}),
    r(node, hops) AS (
      SELECT CAST(0 AS BIGINT), 0
      UNION ALL
      SELECT CAST(e.dst AS BIGINT), r.hops + 1
      FROM r JOIN edges e ON e.src = r.node
      WHERE r.hops < 3
    )
    SELECT node, CAST(min(hops) AS BIGINT) AS hops
    FROM r GROUP BY node
    """,
)
def recursive_nation_reachability(spark, sf_dir):
    """Transitive reachability via WITH RECURSIVE (Spark 4 recursive CTE):
    which nations are reachable from nation 0 through the trade graph, and
    in how few hops — the graph-traversal query shape (BOM explosion, org
    charts, attack paths) expressed declaratively. The hop cap bounds the
    recursion (each round is one equi-join against the bounded frontier);
    min(hops) collapses revisits after the fixpoint. Identical SQL runs on
    DuckDB — the recursion IS the oracle pairing."""
    for name in ("lineitem", "orders", "customer", "supplier"):
        _t(spark, sf_dir, name).createOrReplaceTempView(name)
    # materialize the (tiny) edge list BEFORE recursing: the recursion
    # re-evaluates its non-recursive relations each level, so an inline
    # edges CTE would re-run the 4-table join per hop (measured 6.2x at
    # 10x data); checkpointing it makes each level a join against a
    # bounded cached table
    spark.sql(_REACH_EDGES).localCheckpoint(eager=True).createOrReplaceTempView(
        "_reach_edges"
    )
    return spark.sql(
        """
        WITH RECURSIVE r(node, hops) AS (
          SELECT CAST(0 AS BIGINT), 0
          UNION ALL
          SELECT CAST(e.dst AS BIGINT), r.hops + 1
          FROM r JOIN _reach_edges e ON e.src = r.node
          WHERE r.hops < 3
        )
        SELECT node, CAST(min(hops) AS BIGINT) AS hops
        FROM r GROUP BY node
        """
    )


@_q(
    "sort_limit_offset",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 50
    """,
)
def sort_limit_offset(spark, sf_dir):
    """Keyset-free pagination: page 3 of the orders leaderboard via
    ORDER BY + OFFSET + LIMIT (`df.offset`, Spark 4). Plans as a global
    top-(offset+limit) — CollectLimit with the sort pushed into
    per-partition top-k partials — so the driver materializes 70 rows,
    not the table; deep offsets degrade linearly in offset, which is why
    the operator exists for PAGES, not scans (cursor on the sort key is
    the scale path past that)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .offset(50)
        .limit(20)
    )


@_q(
    "orders_in_flight_by_month",
    """
    WITH span AS (
      SELECT unnest(generate_series(date_trunc('month', o.o_orderdate),
                                    date_trunc('month', l.l_shipdate),
                                    INTERVAL '1 month')) AS month
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate >= o.o_orderdate)
    SELECT month, CAST(count(*) AS BIGINT) AS n_in_flight
    FROM span GROUP BY month
    """,
)
def orders_in_flight_by_month(spark, sf_dir):
    """Interval→period alignment: how many line items were in fulfillment
    (ordered but not yet shipped) during each calendar month — the
    'active intervals per period' rollup (concurrent sessions, open
    incidents, in-transit stock). NOT an interval-overlap join: each
    interval explodes row-locally to the months it spans (sequence +
    explode — bounded fan-out: span months per row), then one
    map-side-combinable count. At 100 TB this is a generate over the scan
    plus one tiny-keyed aggregate; no join against a period table, no
    window."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    j = l.join(o, l.l_orderkey == o.o_orderkey).filter(
        F.col("l_shipdate") >= F.col("o_orderdate")
    )
    months = F.sequence(
        F.date_trunc("month", F.col("o_orderdate")),
        F.date_trunc("month", F.col("l_shipdate")),
        F.expr("INTERVAL '1' MONTH"),
    )
    return (
        j.select(F.explode(months).alias("month"))
        .groupBy("month")
        .agg(F.count(F.lit(1)).alias("n_in_flight"))
    )


@_q(
    "agg_percentile_disc_cont",
    """
    SELECT l_returnflag,
           round(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p50_cont,
           round(percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p50_disc,
           round(percentile_cont(0.9) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p90_cont,
           round(percentile_disc(0.9) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p90_disc
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentile_disc_cont(spark, sf_dir):
    """Interpolating vs discrete percentiles side by side
    (percentile_cont / percentile_disc WITHIN GROUP) — the ordered-set
    aggregate family, whose cont/disc distinction silently changes
    reported SLO/pricing numbers. One sort-based ordered-set aggregate
    per group, still partial+final."""
    l = _t(spark, sf_dir, "lineitem")
    l.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               round(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p50_cont,
               round(percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p50_disc,
               round(percentile_cont(0.9) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p90_cont,
               round(percentile_disc(0.9) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p90_disc
        FROM lineitem GROUP BY l_returnflag
        """
    )


@_q(
    "events_mad_anomalies",
    """
    WITH med AS (SELECT event_type, median(value) AS med
                 FROM events GROUP BY event_type),
    dev AS (SELECT e.event_type, e.value, med.med,
                   abs(e.value - med.med) AS adev
            FROM events e JOIN med ON e.event_type = med.event_type),
    mad AS (SELECT event_type, median(adev) AS mad FROM dev
            GROUP BY event_type)
    SELECT d.event_type,
           round(max(d.med), 4) AS med,
           round(max(mad.mad), 4) AS mad,
           CAST(count(*) FILTER (
             WHERE abs(d.value - d.med) > 3 * 1.4826 * mad.mad
           ) AS BIGINT) AS n_outliers,
           CAST(count(*) AS BIGINT) AS n_events
    FROM dev d JOIN mad ON d.event_type = mad.event_type
    GROUP BY d.event_type
    """,
)
def events_mad_anomalies(spark, sf_dir):
    """Robust outlier detection via median absolute deviation: flag values
    outside median ± 3·1.4826·MAD per event type — the z-score detector's
    robust sibling (immune to the outliers it hunts). Two median
    aggregates with a broadcast-able per-type model table joined back;
    the output is the per-type summary, so the final aggregate is
    map-side combinable."""
    e = _t(spark, sf_dir, "events")
    med = _percentiles_by_group(
        spark, sf_dir, e, "events", "event_type", "value", [(0.5, "med")]
    )
    dev = e.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = _percentiles_by_group(
        spark, sf_dir, dev, "events", "event_type", "adev", [(0.5, "mad")]
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.max("med"), 4).alias("med"),
            F.round(F.max("mad"), 4).alias("mad"),
            F.sum(
                (
                    F.abs(F.col("value") - F.col("med"))
                    > 3 * 1.4826 * F.col("mad")
                ).cast("long")
            ).alias("n_outliers"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@_q(
    "text_heavy_hitter_tokens",
    f"""
    WITH toks AS (SELECT unnest({_WORDS}) AS token FROM documents),
    tot AS (SELECT count(*) AS n FROM toks)
    SELECT token, CAST(count(*) AS BIGINT) AS freq
    FROM toks GROUP BY token
    HAVING count(*) > (SELECT CAST(floor(n * 0.0335) AS BIGINT) FROM tot)
    """,
)
def text_heavy_hitter_tokens(spark, sf_dir):
    """EXACT heavy hitters (tokens with >3.35% corpus share) WITHOUT
    shuffling the vocabulary: per-partition Misra-Gries candidate
    summaries (provable superset for freq > N/(cap+1)) + broadcast exact
    recount — the oracle is the plain GROUP BY/HAVING the operator
    provably equals. See operators/text.py:heavy_hitter_tokens for the
    100 TB argument (candidate kilobytes per partition vs |vocab|
    partial counts)."""
    from boann_ocsf_security_data_platform_spark.operators.text import (
        heavy_hitter_tokens,
    )

    return heavy_hitter_tokens(
        _t(spark, sf_dir, "documents"), min_count_frac=0.0335
    )


def _duck_spans(n: int = 8) -> str:
    gram = f"array_to_string(ws[i:i + {n - 1}], ' ')"
    return (
        f"CASE WHEN len(ws) >= {n} THEN "
        f"list_transform(range(1, len(ws) - {n - 2}), i -> {gram}) "
        f"ELSE []::VARCHAR[] END"
    )


@_q(
    "dedup_duplicate_spans",
    f"""
    WITH words AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
    g AS (SELECT doc_id, unnest({_duck_spans(8)}) AS span FROM words),
    dup AS (SELECT span FROM g GROUP BY span
            HAVING count(DISTINCT doc_id) > 1),
    tot AS (SELECT doc_id, count(*) AS n_spans FROM g GROUP BY doc_id),
    d AS (SELECT doc_id, count(*) AS n_dup_spans
          FROM g JOIN dup USING (span) GROUP BY doc_id)
    SELECT t.doc_id,
           CAST(t.n_spans AS BIGINT) AS n_spans,
           CAST(coalesce(d.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
           round(coalesce(d.n_dup_spans, 0)::DOUBLE / t.n_spans, 4)
             AS dup_frac
    FROM tot t LEFT JOIN d USING (doc_id)
    """,
)
def dedup_duplicate_spans(spark, sf_dir):
    """Substring-level duplication profile (Lee et al. 2022) at 8-word
    span granularity: per doc, the fraction of span positions whose
    content occurs in another document — the signal substring dedup
    thresholds to drop boilerplate-heavy docs. One span-keyed shuffle
    (what a distributed suffix array would shuffle anyway) + one
    semi-join; production hashes spans to 8-byte keys
    (operators/text.py:duplicate_span_stats)."""
    from boann_ocsf_security_data_platform_spark.operators.dedup import (
        release_caches,
    )
    from boann_ocsf_security_data_platform_spark.operators.text import (
        duplicate_span_stats,
    )

    # size-gated scale arm (round-10 sf100 find): above the gate the span
    # shuffle carries xxhash64 8-byte keys instead of ~50-byte strings
    # (the dominant exchange at 450M spans) and the duplicated-span set
    # pins sort-merge; below it, verbatim strings = the oracle-hashed arm
    n_docs = _table_count(spark, sf_dir, "documents")
    gated = n_docs > _gates.LSH_VALVE_MIN_ROWS
    res = duplicate_span_stats(
        _t(spark, sf_dir, "documents"),
        n=8,
        hash_keys=gated,
        pin_shuffle_join=gated,
    )
    out = res.localCheckpoint(eager=True)  # materialize; the span cache can go
    release_caches(res)
    return out


@_q(
    "graph_triangle_count",
    """
    WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                FROM lineitem WHERE year(l_shipdate) = 1995),
    e AS (SELECT a.pk AS u, b.pk AS v FROM li a
          JOIN li b ON a.ok = b.ok AND a.pk < b.pk
          GROUP BY a.pk, b.pk)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM
              (SELECT u AS x FROM e UNION SELECT v FROM e)) AS n_nodes,
           (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
           (SELECT CAST(count(*) AS BIGINT) FROM e e1
              JOIN e e2 ON e1.v = e2.u
              JOIN e e3 ON e1.u = e3.u AND e2.v = e3.v) AS n_triangles
    """,
)
def graph_triangle_count(spark, sf_dir):
    """Exact triangle count of the 1995 part-co-order graph (parts
    ordered together in one order share an edge) — triangle density is
    the classic cohesion/community statistic. The engine enumerates
    wedges degree-ordered (O(m^1.5) bound, skew-proof); the oracle is
    the naive (a<b<c) 3-way self-join the optimization provably equals.
    operators/graph.py:triangle_count."""
    from boann_ocsf_security_data_platform_spark.operators.graph import (
        triangle_count,
    )

    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.year("l_shipdate") == 1995)
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, "ok")
        .where(F.col("a.pk") < F.col("b.pk"))
        .select(F.col("a.pk").alias("src"), F.col("b.pk").alias("dst"))
        .distinct()
    )
    return triangle_count(edges, pin_shuffle_join=_gates.pin_shuffle_join_fact(_table_count(spark, sf_dir, "lineitem")))


@_q(
    "join_bloom_filtered",
    """
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = 'BUILDING')
    """,
)
def join_bloom_filtered(spark, sf_dir):
    """Semi join behind an explicit broadcast-Bloom pre-filter: non-
    matching fact rows die at the scan (map-side membership probes)
    instead of riding the shuffle; the exact left_semi on survivors
    makes the result bit-identical to the plain semi join the oracle
    runs. The hand-rolled form of Spark's runtime bloom-filter join
    injection. operators/relational.py:bloom_semi_join."""
    from boann_ocsf_security_data_platform_spark.operators.relational import (
        bloom_semi_join,
    )

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("total")
    )
    dim = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    return bloom_semi_join(o, dim, "o_custkey")


@_q(
    "range_join_overlapping_orders",
    """
    SELECT a.o_custkey, a.o_orderkey AS okey_a, b.o_orderkey AS okey_b,
           CAST(date_diff('day', CAST(a.o_orderdate AS DATE),
                          CAST(b.o_orderdate AS DATE)) AS BIGINT)
             AS gap_days
    FROM orders a JOIN orders b
      ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
     AND CAST(b.o_orderdate AS DATE) >= CAST(a.o_orderdate AS DATE)
     AND CAST(b.o_orderdate AS DATE)
           <= CAST(a.o_orderdate AS DATE) + INTERVAL 30 DAY
    """,
)
def range_join_overlapping_orders(spark, sf_dir):
    """Interval-overlap self join: per customer, order pairs placed
    within 30 days of each other (the 'concurrent activity' shape —
    session stitching, double-billing detection). Equi-join on the
    partition key carries the shuffle; the band predicate is a cheap
    residual filter — never a cartesian. For band joins WITHOUT an
    equi-key, operators/relational.py:range_join_binned buckets time."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("od"),
    )
    a, b = o.alias("a"), o.alias("b")
    return (
        a.join(b, "o_custkey")
        .where(
            (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
            & (F.col("b.od") >= F.col("a.od"))
            & (F.col("b.od") <= F.date_add(F.col("a.od"), 30))
        )
        .select(
            "o_custkey",
            F.col("a.o_orderkey").alias("okey_a"),
            F.col("b.o_orderkey").alias("okey_b"),
            F.datediff(F.col("b.od"), F.col("a.od")).cast("long").alias(
                "gap_days"
            ),
        )
    )


@_q(
    "events_window_funnel",
    """
    WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.ts) AS t2, min(v.t1) AS t1
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts > v.t1
            AND e.ts <= v.t1 + INTERVAL 1 HOUR
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS t3
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.t2
            AND e.ts <= c.t1 + INTERVAL 1 HOUR
          GROUP BY e.user_id)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_viewed,
           (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_clicked,
           (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_purchased
    """,
)
def events_window_funnel(spark, sf_dir):
    """Time-constrained funnel (the windowFunnel shape): users whose
    first view is followed by a click and then a purchase, all inside
    one hour of the first view, with strictly increasing timestamps.
    Three chained min-aggregates equi-joined on user_id — each stage is
    partial+final combinable, every join is on the same partition key
    (one co-partitioned lineage, no re-shuffle under AQE), and interval
    arithmetic keeps it timestamp-flavor (TZ/NTZ) robust."""
    e = _t(spark, sf_dir, "events")
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(
            (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"), F.min("t1").alias("t1"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(
            (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_viewed"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_clicked")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchased")))
    )


@_q(
    "events_attribution_last_touch",
    """
    WITH seq AS (
      SELECT user_id, event_type, value,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prior
      FROM events)
    SELECT coalesce(prior, 'direct') AS channel,
           CAST(count(*) AS BIGINT) AS n_purchases,
           round(sum(value), 2) AS total_value
    FROM seq WHERE event_type = 'purchase' GROUP BY 1
    """,
)
def events_attribution_last_touch(spark, sf_dir):
    """Last-touch attribution: each purchase credits the user's most
    recent preceding non-purchase event type ('direct' when none). One
    window pass per user (last IGNORE NULLS over the preceding frame,
    tie-broken by event_id so both engines order identically), then a
    tiny channel rollup — no self-join, no as-of join needed when the
    probe and the touches live in the same stream."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        e.withColumn(
            "prior",
            F.last(
                F.when(F.col("event_type") != "purchase", F.col("event_type")),
                ignorenulls=True,
            ).over(w),
        )
        .where(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("prior", F.lit("direct")).alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@_q(
    "agg_welch_ttest",
    """
    WITH s AS (SELECT event_type, count(*) AS n, avg(value) AS m,
                      var_samp(value) AS v
               FROM events WHERE event_type IN ('purchase', 'error')
               GROUP BY event_type),
    a AS (SELECT * FROM s WHERE event_type = 'purchase'),
    b AS (SELECT * FROM s WHERE event_type = 'error')
    SELECT CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
           round(a.m, 4) AS mean_a, round(b.m, 4) AS mean_b,
           round((a.m - b.m) / sqrt(a.v / a.n + b.v / b.n), 4) AS t_stat,
           round(pow(a.v / a.n + b.v / b.n, 2)
                 / (pow(a.v / a.n, 2) / (a.n - 1)
                    + pow(b.v / b.n, 2) / (b.n - 1)), 2) AS df_welch
    FROM a, b
    """,
)
def agg_welch_ttest(spark, sf_dir):
    """Welch's unequal-variance t statistic (with Welch-Satterthwaite
    degrees of freedom) comparing purchase vs error event values — the
    A/B-test primitive. Two partial+final aggregates produce one row per
    arm; the test statistic is driver-free scalar algebra on a
    broadcast-trivial 2-row frame."""
    e = _t(spark, sf_dir, "events")
    s = (
        e.where(F.col("event_type").isin("purchase", "error"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("value").alias("m"),
            F.var_samp("value").alias("v"),
        )
    )
    a = s.where(F.col("event_type") == "purchase").select(
        F.col("n").alias("n_a"), F.col("m").alias("m_a"), F.col("v").alias("v_a")
    )
    b = s.where(F.col("event_type") == "error").select(
        F.col("n").alias("n_b"), F.col("m").alias("m_b"), F.col("v").alias("v_b")
    )
    se_a = F.col("v_a") / F.col("n_a")
    se_b = F.col("v_b") / F.col("n_b")
    return a.crossJoin(b).select(
        F.col("n_a"),
        F.col("n_b"),
        F.round("m_a", 4).alias("mean_a"),
        F.round("m_b", 4).alias("mean_b"),
        F.round((F.col("m_a") - F.col("m_b")) / F.sqrt(se_a + se_b), 4).alias(
            "t_stat"
        ),
        F.round(
            F.pow(se_a + se_b, 2)
            / (
                F.pow(se_a, 2) / (F.col("n_a") - 1)
                + F.pow(se_b, 2) / (F.col("n_b") - 1)
            ),
            2,
        ).alias("df_welch"),
    )


@_q(
    "corpus_source_entropy",
    """
    WITH c AS (SELECT lang, source, count(*) AS n FROM documents
               GROUP BY lang, source),
    t AS (SELECT lang, sum(n) AS tot, count(*) AS k FROM c GROUP BY lang)
    SELECT c.lang, CAST(t.tot AS BIGINT) AS n_docs,
           CAST(t.k AS BIGINT) AS n_sources,
           round(-sum((c.n / t.tot) * log2(c.n / t.tot)), 4)
             AS entropy_bits,
           round(log2(t.k) + sum((c.n / t.tot) * log2(c.n / t.tot)), 4)
             AS kl_uniform_bits
    FROM c JOIN t USING (lang) GROUP BY c.lang, t.tot, t.k
    """,
)
def corpus_source_entropy(spark, sf_dir):
    """Per-language source-mix diagnostics: Shannon entropy of the
    source distribution and its KL divergence from uniform — the
    mixture-health metric a pretraining curator watches when one crawl
    starts dominating a language. Two stacked aggregates over bounded
    (lang, source) keys; everything after the first count is
    kilobyte-scale."""
    d = _t(spark, sf_dir, "documents")
    c = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("lang").agg(
        F.sum("n").alias("tot"), F.count(F.lit(1)).alias("k")
    )
    p = F.col("n") / F.col("tot")
    return (
        c.join(t, "lang")
        .groupBy("lang", "tot", "k")
        .agg(
            F.round(-F.sum(p * F.log2(p)), 4).alias("entropy_bits"),
            F.round(F.log2("k") + F.sum(p * F.log2(p)), 4).alias(
                "kl_uniform_bits"
            ),
        )
        .select(
            "lang",
            F.col("tot").alias("n_docs"),
            F.col("k").alias("n_sources"),
            "entropy_bits",
            "kl_uniform_bits",
        )
    )


@_q(
    "agg_trimmed_winsorized",
    """
    WITH th AS (SELECT l_returnflag,
                  percentile_cont(0.1) WITHIN GROUP
                    (ORDER BY l_extendedprice) AS lo,
                  percentile_cont(0.9) WITHIN GROUP
                    (ORDER BY l_extendedprice) AS hi
                FROM lineitem GROUP BY l_returnflag)
    SELECT l.l_returnflag,
           round(avg(l.l_extendedprice), 2) AS mean_raw,
           round(avg(l.l_extendedprice) FILTER (
             WHERE l.l_extendedprice BETWEEN th.lo AND th.hi), 2)
             AS mean_trimmed,
           round(avg(least(greatest(l.l_extendedprice, th.lo), th.hi)), 2)
             AS mean_winsorized
    FROM lineitem l JOIN th ON l.l_returnflag = th.l_returnflag
    GROUP BY l.l_returnflag
    """,
)
def agg_trimmed_winsorized(spark, sf_dir):
    """Robust means: 10%-trimmed (drop the tails) and winsorized (clamp
    to the p10/p90 fence) per return flag — outlier-resistant central
    tendency for noisy value columns. The per-group fences (3 rows,
    broadcast back) come from :func:`_percentiles_by_group` —
    concentration-gated, so the single-pass ordered-set aggregate runs
    below the fact gate and the distributed domain-count form above it
    (Spark's Percentile aggregate merges each group's whole value-count
    map onto one reducer, the concentration this round's sweep class
    names) — then a single partial+final pass computes all three
    means."""
    l = _t(spark, sf_dir, "lineitem")
    th = _percentiles_by_group(
        spark, sf_dir, l, "lineitem",
        "l_returnflag",
        "l_extendedprice",
        [(0.1, "lo"), (0.9, "hi")],
    )
    x = F.col("l_extendedprice")
    return (
        l.join(F.broadcast(th), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.avg(x), 2).alias("mean_raw"),
            F.round(
                F.avg(F.when((x >= F.col("lo")) & (x <= F.col("hi")), x)), 2
            ).alias("mean_trimmed"),
            F.round(
                F.avg(F.least(F.greatest(x, F.col("lo")), F.col("hi"))), 2
            ).alias("mean_winsorized"),
        )
    )


_CAP_HASH = _H64.format(expr="concat('cap:', CAST(doc_id AS VARCHAR))")


@_q(
    "corpus_curation_funnel",
    f"""
    WITH base AS (SELECT doc_id, source, len({_WORDS}) AS nt FROM documents),
    s1 AS (SELECT min(doc_id) AS doc_id
           FROM (SELECT md5({_NORM}) AS h, doc_id FROM documents)
           GROUP BY h),
    q AS ({_TQ_ORACLE}),
    d1 AS (SELECT b.* FROM base b JOIN s1 USING (doc_id)),
    d2 AS (SELECT d1.*, q.quality_score FROM d1 JOIN q USING (doc_id)
           WHERE q.quality_score >= 0.75 AND q.n_tokens >= 10),
    d3 AS (SELECT * FROM (
             SELECT d2.*, row_number() OVER (
               PARTITION BY source ORDER BY {_CAP_HASH}, doc_id) AS rn
             FROM d2) WHERE rn <= 15),
    d4 AS (SELECT * FROM (
             SELECT d3.*, coalesce(sum(nt) OVER (
               PARTITION BY source
               ORDER BY quality_score DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tb
             FROM d3) WHERE tb < 600)
    SELECT 's0_raw' AS stage, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(nt) AS BIGINT) AS n_tokens FROM base
    UNION ALL SELECT 's1_exact_dedup', CAST(count(*) AS BIGINT),
           CAST(sum(nt) AS BIGINT) FROM d1
    UNION ALL SELECT 's2_quality', CAST(count(*) AS BIGINT),
           CAST(sum(nt) AS BIGINT) FROM d2
    UNION ALL SELECT 's3_domain_cap', CAST(count(*) AS BIGINT),
           CAST(sum(nt) AS BIGINT) FROM d3
    UNION ALL SELECT 's4_token_budget', CAST(count(*) AS BIGINT),
           CAST(sum(nt) AS BIGINT) FROM d4
    """,
)
def corpus_curation_funnel(spark, sf_dir):
    """The end-to-end curation pipeline as ONE composed query — raw →
    exact dedup → quality gate → per-source cap → per-source token budget
    — reporting surviving docs and tokens after each stage (the funnel a
    pretraining data team reviews before a run). Every stage is the
    actual library operator (exact_dedup, text_quality, domain_cap,
    token_budget_select) chained on DataFrames; the oracle replays the
    same five stages in SQL. Scale: dedup is one hash-aggregate, the gate
    is a projection, cap and budget are WindowGroupLimit / prefix-sum
    windows keyed on source — the funnel adds NO shuffle beyond its
    stages, and the stage counts are one-row aggregates."""
    from boann_ocsf_security_data_platform_spark.operators.dedup import exact_dedup
    from boann_ocsf_security_data_platform_spark.operators.text import (
        domain_cap,
        text_quality,
        token_budget_select,
    )

    docs = _t(spark, sf_dir, "documents")
    base = text_quality(docs).select(
        "doc_id", "source", "n_tokens", "quality_score"
    )
    keep = exact_dedup(docs).select(F.col("keep_id").alias("doc_id"))
    d1 = base.join(keep, "doc_id")
    d2 = d1.where(
        (F.col("quality_score") >= 0.75) & (F.col("n_tokens") >= 10)
    )
    d3 = domain_cap(d2, max_per_domain=15)
    d4 = token_budget_select(
        d3.withColumn("q6", F.round("quality_score", 6)),
        budget=600,
        score_col="q6",
    )

    def stage(name, df):
        return df.agg(
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_tokens").cast("long")).alias("n_tokens"),
        )

    return (
        stage("s0_raw", base)
        .unionAll(stage("s1_exact_dedup", d1))
        .unionAll(stage("s2_quality", d2))
        .unionAll(stage("s3_domain_cap", d3))
        .unionAll(stage("s4_token_budget", d4))
    )


@_q(
    "agg_incremental_rollup_merge",
    """
    SELECT date_trunc('month', o_orderdate) AS mon,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS sum_total,
           round(min(o_totalprice), 2) AS min_total,
           round(max(o_totalprice), 2) AS max_total
    FROM orders GROUP BY 1
    """,
)
def agg_incremental_rollup_merge(spark, sf_dir):
    """Incremental view maintenance: roll up the 'history' partition
    (4/5 of orders) and the 'delta' (1/5) separately, then MERGE the
    partial aggregates (sums/counts add, min/max take extremes) — the
    oracle is the from-scratch rollup over everything, which the merge
    must reproduce. At 100 TB this is the difference between re-scanning
    history daily and joining two model-sized rollup tables.
    operators/relational.py:merge_partial_aggs (also the foreachBatch
    body for a continuously-maintained streaming rollup)."""
    from boann_ocsf_security_data_platform_spark.operators.relational import (
        merge_partial_aggs,
    )

    o = _t(spark, sf_dir, "orders").withColumn(
        "mon", F.date_trunc("month", F.col("o_orderdate"))
    )

    def roll(df):
        return df.groupBy("mon").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("sum_total"),
            F.min("o_totalprice").alias("min_total"),
            F.max("o_totalprice").alias("max_total"),
        )

    merged = merge_partial_aggs(
        roll(o.where(F.col("o_orderkey") % 5 != 0)),
        roll(o.where(F.col("o_orderkey") % 5 == 0)),
        ["mon"],
        sum_cols=("n_orders", "sum_total"),
        min_cols=("min_total",),
        max_cols=("max_total",),
    )
    return merged.select(
        "mon",
        "n_orders",
        F.round("sum_total", 2).alias("sum_total"),
        F.round("min_total", 2).alias("min_total"),
        F.round("max_total", 2).alias("max_total"),
    )


@_q(
    "window_distribution_ranks",
    """
    SELECT o_orderkey, o_orderpriority,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cum_dist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_distribution_ranks(spark, sf_dir):
    """The distribution-rank window family (ntile / percent_rank /
    cume_dist) per priority class — quartile assignment and empirical
    CDF position, tie-broken by orderkey so both engines rank
    identically.

    Round-12 sf100 find: the literal PARTITION BY o_orderpriority window
    is the rank-window funnel at cardinality 5 — the whole order fact
    sorts in five tasks (144 s isolated at sf100, ~10x the parallel
    scan cost). The deterministic (price, orderkey) order has no ties,
    so rank == row_number and all three functions are closed-form in
    the per-priority rank r and count n: percent_rank = (r-1)/(n-1),
    cume_dist = r/n, and ntile's remainder rule is the same expression
    :func:`_bucketed_ntile` uses. r decomposes through global price
    buckets exactly as in the other bucketed windows — equal prices
    share a bucket (:func:`_order_buckets`), so r = per-(priority,
    lower-bucket) prefix count + in-(priority, bucket) row_number over
    the same order. Bit-identical output, (5 x n_buckets)-parallel
    sort instead of 5 tasks."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    b = _order_buckets(o, "o_totalprice")
    w_in = Window.partitionBy("o_orderpriority", "bkt").orderBy(
        "o_totalprice", "o_orderkey"
    )
    w_pre = (
        Window.partitionBy("o_orderpriority")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # both model tables are bounded: |priorities| x |buckets| and
    # |priorities| rows — broadcast joins, never a fact shuffle
    prefix = (
        b.groupBy("o_orderpriority", "bkt")
        .agg(F.count(F.lit(1)).alias("_bn"))
        .select(
            "o_orderpriority",
            "bkt",
            F.coalesce(F.sum("_bn").over(w_pre), F.lit(0)).alias("_prev_n"),
        )
    )
    nn = o.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("_n"))
    r = F.col("_prev_n") + F.row_number().over(w_in)
    n = F.col("_n")
    q = F.floor(n / 4)
    rem = n % 4
    thr = rem * (q + 1)
    quartile = (
        F.when(r <= thr, F.floor((r - 1) / (q + 1)))
        .otherwise(rem + F.floor((r - thr - 1) / q))
        + 1
    )
    return (
        b.join(F.broadcast(prefix), ["o_orderpriority", "bkt"])
        .join(F.broadcast(nn), "o_orderpriority")
        .select(
            "o_orderkey",
            "o_orderpriority",
            quartile.cast("long").alias("quartile"),
            F.round(
                F.when(n > 1, (r - 1) / (n - 1)).otherwise(F.lit(0.0)), 6
            ).alias("pct_rank"),
            F.round(r / n, 6).alias("cum_dist"),
        )
    )


@_q(
    "events_seasonal_baseline",
    """
    WITH prof AS (SELECT event_type, hour(ts) AS hr, avg(value) AS mu,
                         stddev_samp(value) AS sd
                  FROM events GROUP BY event_type, hour(ts))
    SELECT e.event_type, CAST(p.hr AS BIGINT) AS hr,
           CAST(count(*) AS BIGINT) AS n_events,
           round(max(p.mu), 3) AS mean_value,
           round(max(p.sd), 3) AS sd_value,
           CAST(count(*) FILTER (
             WHERE abs(e.value - p.mu) > 2 * p.sd) AS BIGINT)
             AS n_anomalies
    FROM events e JOIN prof p
      ON e.event_type = p.event_type AND hour(e.ts) = p.hr
    GROUP BY e.event_type, p.hr
    """,
)
def events_seasonal_baseline(spark, sf_dir):
    """Seasonal (hour-of-day) baseline per event type with residual
    anomaly counts: values outside mean ± 2σ OF THEIR HOUR flag as
    anomalous — the decomposition-lite detector that doesn't false-alarm
    on daily rhythm the way a global z-score does. The per-(type, hour)
    profile is a bounded model table joined back by broadcast; hour
    extraction is timestamp-flavor robust."""
    e = _t(spark, sf_dir, "events")
    prof = e.groupBy("event_type", F.hour("ts").alias("hr")).agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sd")
    )
    return (
        e.withColumn("hr", F.hour("ts"))
        .join(F.broadcast(prof), ["event_type", "hr"])
        .groupBy("event_type", "hr")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.max("mu"), 3).alias("mean_value"),
            F.round(F.max("sd"), 3).alias("sd_value"),
            F.sum(
                (F.abs(F.col("value") - F.col("mu")) > 2 * F.col("sd")).cast(
                    "long"
                )
            ).alias("n_anomalies"),
        )
        .select(
            "event_type",
            F.col("hr").cast("long").alias("hr"),
            "n_events",
            "mean_value",
            "sd_value",
            "n_anomalies",
        )
    )


_RAKE_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in STOPWORDS_EN) + "]"


@_q(
    "text_rake_keywords",
    f"""
    WITH ph AS (
      SELECT doc_id, unnest(list_filter(
        list_transform(
          string_split(array_to_string(
            list_transform(
              list_filter(
                string_split_regex(trim(regexp_replace(lower(text),
                  '[^a-z0-9\\s]+', ' | ', 'g')), '\\s+'),
                t -> t <> ''),
              t -> CASE WHEN list_contains({_RAKE_STOP_SQL}, t)
                        THEN '|' ELSE t END),
            ' '), '|'),
          p -> trim(p)),
        p -> p <> '' AND len(string_split(p, ' ')) <= 3)) AS phrase
      FROM documents),
    pw AS (SELECT doc_id, phrase,
                  len(string_split(phrase, ' ')) AS phlen,
                  unnest(string_split(phrase, ' ')) AS w
           FROM ph),
    ws AS (SELECT w, count(*) AS freq, sum(phlen) AS degree
           FROM pw GROUP BY w),
    sc AS (SELECT doc_id, phrase,
                  round(sum(CAST(degree AS DOUBLE) / freq), 6) AS score
           FROM pw JOIN ws USING (w) GROUP BY doc_id, phrase),
    rk AS (SELECT doc_id, phrase, score, row_number() OVER (
             PARTITION BY doc_id ORDER BY score DESC, phrase) AS rank
           FROM sc)
    SELECT doc_id, phrase, score, CAST(rank AS BIGINT) AS rank
    FROM rk WHERE rank <= 3
    """,
)
def text_rake_keywords(spark, sf_dir):
    """RAKE keyword extraction (Rose et al. 2010): top-3 candidate
    phrases per document scored by summed word degree/frequency.
    operators/text.py:rake_keywords — RE2-safe phrase splitting (no
    lookarounds), scores rounded before ranking so cross-engine ULPs
    cannot flip ranks."""
    from boann_ocsf_security_data_platform_spark.operators.text import rake_keywords

    return rake_keywords(_t(spark, sf_dir, "documents"), top_k=3)


@_q(
    "events_session_window_native",
    """
    WITH s AS (SELECT user_id, ts, event_id,
                 CASE WHEN ts - lag(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id)
                      <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS brk
               FROM events),
    i AS (SELECT user_id, ts, sum(brk) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM s),
    g AS (SELECT user_id, sid, count(*) AS n,
                 -- whole seconds: Spark's interval->long cast truncates
                 floor(epoch(max(ts) - min(ts))) AS dur
          FROM i GROUP BY user_id, sid)
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(n) AS BIGINT) AS n_events,
           CAST(max(n) AS BIGINT) AS max_session_events,
           round(avg(dur), 2) AS avg_session_secs
    FROM g GROUP BY user_id
    """,
)
def events_session_window_native(spark, sf_dir):
    """Spark's NATIVE session_window operator (dynamic-gap session
    aggregation in one groupBy — the same operator Structured Streaming
    uses for stateful session windows) summarized per user; the oracle
    replays the identical islands with the lag/cumsum formulation.
    Merge semantics verified inclusive: a gap of exactly 30 min stays in
    the session. Session duration = last-first event (interval cast,
    timestamp-flavor robust); one shuffle on user_id."""
    e = _t(spark, sf_dir, "events")
    s = e.groupBy("user_id", F.session_window("ts", "30 minutes")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("ts").alias("t0"),
        F.max("ts").alias("t1"),
    )
    return s.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n").alias("n_events"),
        F.max("n").alias("max_session_events"),
        F.round(
            F.avg((F.col("t1") - F.col("t0")).cast("long")), 2
        ).alias("avg_session_secs"),
    )


@_q(
    "agg_pareto_abc",
    """
    WITH c AS (SELECT o_custkey, sum(o_totalprice) AS rev
               FROM orders GROUP BY o_custkey),
    r AS (SELECT o_custkey, rev,
                 sum(rev) OVER (ORDER BY rev DESC, o_custkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                 sum(rev) OVER () AS tot
          FROM c)
    SELECT CASE WHEN (cum - rev) / tot < 0.8 THEN 'A'
                WHEN (cum - rev) / tot < 0.95 THEN 'B'
                ELSE 'C' END AS klass,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(rev), 2) AS revenue
    FROM r GROUP BY 1
    """,
)
def agg_pareto_abc(spark, sf_dir):
    """Pareto/ABC revenue segmentation: customers sorted by revenue,
    classed by the cumulative share BEFORE them (A < 80%, B < 95%, C
    rest) so the straddling customer deterministically lands in the
    earlier class. Round-12 sf100 find: 'the window input is already an
    aggregate' stopped being a defense at customer grain — the rollup
    is 15M rows at sf100 and the global Window.orderBy sorted all of
    them in ONE task (the rank-window funnel at cardinality 1). Same
    bucketed running sum as parts_abc_xyz_classification: cum = prefix
    over strictly-higher-revenue buckets + in-bucket running sum; tot
    rides a broadcast scalar, not a whole-frame window. The rollup is
    persisted (r12 VERDICT #6): it feeds FOUR consumers — the
    approxQuantile sketch action, the scalar total, the bucket prefix
    table and the classed aggregate — and unpersisted each re-ran the
    fact scan + customer rollup (4 scans of orders; DISK_ONLY above the
    fact gate, the q21 discipline)."""
    o = _t(spark, sf_dir, "orders")
    c = (
        o.groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("rev"))
        .persist(
            StorageLevel.DISK_ONLY
            if _table_count(spark, sf_dir, "orders")
            > _gates.PIN_FACT_MIN_ROWS
            else StorageLevel.MEMORY_AND_DISK_DESER
        )
    )
    tot = c.agg(F.sum("rev").alias("tot"))
    b = _order_buckets(c, "rev", ascending=False)
    w_cum = (
        Window.partitionBy("bkt")
        .orderBy(F.col("rev").desc(), F.col("o_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_pre = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    prefix = (
        b.groupBy("bkt")
        .agg(F.sum("rev").alias("bsum"))
        .select(
            "bkt",
            F.coalesce(F.sum("bsum").over(w_pre), F.lit(0.0)).alias(
                "prev_rev"
            ),
        )
    )
    share_before = (
        F.col("prev_rev") + F.sum("rev").over(w_cum) - F.col("rev")
    ) / F.col("tot")
    return (
        b.join(F.broadcast(prefix), "bkt")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "klass",
            F.when(share_before < 0.8, "A")
            .when(share_before < 0.95, "B")
            .otherwise("C"),
        )
        .groupBy("klass")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("rev"), 2).alias("revenue"),
        )
    )


@_q(
    "dedup_minhash_eval",
    f"""
    WITH cand AS ({_minhash_oracle()}),
    words AS (SELECT doc_id, source, {_WORDS} AS ws FROM documents),
    wh_t AS (SELECT doc_id, source, ws, {{wh}} AS wh FROM words),
    sh AS (SELECT doc_id, source, {{hs}} AS shingles FROM wh_t),
    ex AS (SELECT doc_id, source, unnest(shingles) AS shingle FROM sh),
    sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      FROM ex a JOIN ex b
        ON a.source = b.source AND a.shingle = b.shingle
       AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    truth AS (
      SELECT id_a, id_b
      FROM inter JOIN sizes sa ON sa.doc_id = id_a
                 JOIN sizes sb ON sb.doc_id = id_b
      WHERE round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6)
            >= 0.5),
    src AS (SELECT doc_id, source FROM documents),
    cand_ss AS (SELECT c.id_a, c.id_b FROM cand c
                JOIN src a ON a.doc_id = c.id_a
                JOIN src b ON b.doc_id = c.id_b
                WHERE a.source = b.source),
    hits AS (SELECT t.id_a FROM truth t
             JOIN cand c ON c.id_a = t.id_a AND c.id_b = t.id_b)
    SELECT CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth,
           CAST((SELECT count(*) FROM cand_ss) AS BIGINT)
             AS n_cand_same_source,
           CAST((SELECT count(*) FROM hits) AS BIGINT) AS n_hits,
           round((SELECT count(*) FROM hits)
                 / CAST((SELECT count(*) FROM truth) AS DOUBLE), 6)
             AS recall,
           round((SELECT count(*) FROM hits)
                 / CAST((SELECT count(*) FROM cand_ss) AS DOUBLE), 6)
             AS precision
    """.format(wh=_WH_EXPR, hs=_HS_EXPR),
)
def dedup_minhash_eval(spark, sf_dir):
    """Pipeline QA: measure the MinHash-LSH candidate generator against
    EXACT shingle-Jaccard ground truth (the blocked exact join) —
    recall = truth pairs surfaced as candidates, precision = same-source
    candidates that are true ≥0.5-Jaccard pairs. The eval every dedup
    deployment should run before trusting banding parameters; both the
    detector and the truth are themselves oracle-verified operators, and
    the whole evaluation is three counts over their joined outputs.

    SIZE-GATED (the containment/cross-corpus discipline): above
    HUBNESS_EXACT_MAX_ROWS documents, exact duplicates collapse to one
    representative before BOTH the detector and the truth run. Replica
    pairs are trivially-caught jaccard-1.0 output growing with copies²
    (the exact-Jaccard truth side hit the same inherent blowup as
    dedup_cross_corpus in the sf10 sweep) and measuring them only
    inflates recall with pairs exact dedup already removes upstream; the
    banding-parameter decision this eval informs is about the DISTINCT
    texts. Below the gate the full-corpus eval is the oracle-hashed
    arm."""
    from boann_ocsf_security_data_platform_spark.operators.dedup import (
        minhash_near_dup_pairs,
        ngram_jaccard_pairs,
        release_caches,
    )

    docs, valve, pin = _docs_gated_with_pin(spark, sf_dir)
    cand = minhash_near_dup_pairs(
        docs, max_bucket_size=valve, pin_shuffle_join=pin
    ).select("id_a", "id_b")
    truth = ngram_jaccard_pairs(
        docs, threshold=0.5, pin_shuffle_join=pin
    ).select("id_a", "id_b")
    src = docs.select("doc_id", "source")
    cand_ss = (
        cand.join(src.withColumnRenamed("doc_id", "id_a"), "id_a")
        .withColumnRenamed("source", "src_a")
        .join(src.withColumnRenamed("doc_id", "id_b"), "id_b")
        .where(F.col("src_a") == F.col("source"))
        .select("id_a", "id_b")
    )
    hits = truth.join(cand, ["id_a", "id_b"], "left_semi")
    row = (
        truth.agg(F.count(F.lit(1)).alias("n_truth"))
        .crossJoin(cand_ss.agg(F.count(F.lit(1)).alias("n_cand_same_source")))
        .crossJoin(hits.agg(F.count(F.lit(1)).alias("n_hits")))
        .select(
            "n_truth",
            "n_cand_same_source",
            "n_hits",
            F.round(F.col("n_hits") / F.col("n_truth"), 6).alias("recall"),
            F.round(
                F.col("n_hits") / F.col("n_cand_same_source"), 6
            ).alias("precision"),
        )
        .localCheckpoint(eager=True)
    )
    release_caches(cand)
    release_caches(truth)
    return row


_COS_T = (
    "list_dot_product(a.tv, b.tv) / "
    "(sqrt(list_dot_product(a.tv, a.tv)) * sqrt(list_dot_product(b.tv, b.tv)))"
)


@_q(
    "knn_truncated_recall",
    f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                      CAST(embedding[1:16] AS DOUBLE[]) AS tv
               FROM embeddings),
    fullk AS (SELECT query_id, neighbor_id FROM (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             row_number() OVER (PARTITION BY a.vec_id
                                ORDER BY round({_COS}, 6) DESC, b.vec_id)
               AS rank
      FROM e a JOIN e b ON a.vec_id <> b.vec_id
      WHERE a.vec_id < 10) t WHERE rank <= 5),
    trunck AS (SELECT query_id, neighbor_id FROM (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             row_number() OVER (PARTITION BY a.vec_id
                                ORDER BY round({_COS_T}, 6) DESC, b.vec_id)
               AS rank
      FROM e a JOIN e b ON a.vec_id <> b.vec_id
      WHERE a.vec_id < 10) t WHERE rank <= 5),
    ov AS (SELECT f.query_id, count(*) AS n_overlap
           FROM fullk f JOIN trunck t
             ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
           GROUP BY 1)
    SELECT q.query_id,
           CAST(coalesce(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
           round(coalesce(ov.n_overlap, 0) / 5.0, 2) AS recall_at_5
    FROM (SELECT DISTINCT query_id FROM fullk) q
    LEFT JOIN ov USING (query_id)
    """,
)
def knn_truncated_recall(spark, sf_dir):
    """Matryoshka-style dimension-truncation evaluation: top-5 cosine
    recall of 16-dim-prefix vectors against the full 64-dim ranking, per
    query — the measurement behind 'can we serve the short embedding?'.
    Both rankings are the exact brute-force operator (broadcast queries,
    corpus never shuffled); truncation is a row-local slice, so the eval
    costs two scored scans + one tiny per-query join."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    # `full` is <= 10 queries x 5 = 50 rows but its lineage is a
    # brute-force scored corpus scan, and BOTH the overlap join and the
    # query spine consumed it — unpersisted, the spine branch re-ran the
    # whole scan, and the bounded-by-construction joins sort-merged on
    # fact-scaling estimates, fusing 4 sorters into one region (round-12
    # scan-all find). Persist the tiny frame; broadcast the bounded sides.
    full = cosine_topk(emb, q, k=5).select(
        "query_id", "neighbor_id"
    ).persist(StorageLevel.MEMORY_AND_DISK_DESER)
    tr = emb.withColumn("embedding", F.slice("embedding", 1, 16))
    trunc = cosine_topk(tr, tr.where(F.col("vec_id") < 10), k=5).select(
        "query_id", "neighbor_id"
    )
    ov = (
        full.join(F.broadcast(trunc), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        full.select("query_id")
        .distinct()
        .join(F.broadcast(ov), "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            F.round(F.coalesce("n_overlap", F.lit(0)) / 5.0, 2).alias(
                "recall_at_5"
            ),
        )
    )


_H64_TEMP = _H64.format(expr="concat('temp0:', CAST(doc_id AS VARCHAR))")


@_q(
    "corpus_temperature_sample",
    f"""
    WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    w AS (SELECT lang, n, CAST(floor(pow(n, 0.5) * 1000000) AS BIGINT) AS w
         FROM counts),
    tot AS (SELECT sum(w) AS wsum FROM w),
    shares AS (SELECT lang, n, w / wsum AS share FROM w, tot),
    tmax AS (SELECT min(n / share) AS t_max FROM shares),
    fracs AS (SELECT lang, round(least(1.0, share * t_max / n), 6) AS frac
              FROM shares, tmax)
    SELECT d.doc_id, d.lang
    FROM documents d JOIN fracs f USING (lang)
    WHERE ({_H64_TEMP} % 1000000) < f.frac * 1000000
    """,
)
def corpus_temperature_sample(spark, sf_dir):
    """Temperature (alpha=0.5) mixture rebalancing over languages — the
    multilingual-pretraining alpha-sampling recipe: target share per
    language ∝ natural_share^0.5, flattening dominant languages while
    boosting the tail, realized as the largest admissible corpus with no
    upsampling and deterministic hash selection.
    operators/relational.py:temperature_sample (delegates to
    mixture_sample, inheriting its broadcast-fraction scan-filter plan)."""
    from boann_ocsf_security_data_platform_spark.operators.relational import (
        temperature_sample,
    )

    return temperature_sample(
        _t(spark, sf_dir, "documents"), "lang", alpha=0.5
    ).select("doc_id", "lang")


@_q(
    "events_rolling_distinct_users",
    """
    SELECT date_trunc('day', ts) + INTERVAL (t.range) DAY AS d,
           CAST(count(DISTINCT user_id) AS BIGINT) AS wau_7d
    FROM events, range(7) t
    GROUP BY 1
    """,
)
def events_rolling_distinct_users(spark, sf_dir):
    """Rolling 7-day distinct users (WAU) per day — the rolling
    COUNT(DISTINCT) a window frame cannot express. Instead of joining a
    day grid against the event range (a theta join), each event emits the
    seven days whose trailing window it falls in (row-local explode,
    bounded 7× fan-out) and one distinct-aggregate does the rest — the
    explode-to-window trick that keeps rolling-distinct linear at 100 TB,
    shuffling (day, user) pairs exactly once."""
    e = _t(spark, sf_dir, "events")
    return (
        e.select(
            F.date_trunc("day", "ts").alias("d0"),
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
        )
        .select(
            F.expr("d0 + make_dt_interval(i, 0, 0, 0)").alias("d"), "user_id"
        )
        .groupBy("d")
        .agg(F.count_distinct("user_id").alias("wau_7d"))
    )


def _lpa_iter(prev: str, out: str) -> str:
    return f"""
    {out} AS (SELECT node, label FROM (
        SELECT e.a AS node, l.label, count(*) AS c,
               row_number() OVER (PARTITION BY e.a
                 ORDER BY count(*) DESC, l.label) AS rn
        FROM e2 e JOIN {prev} l ON l.node = e.b
        GROUP BY e.a, l.label) t WHERE rn = 1)"""


@_q(
    "graph_label_propagation",
    f"""
    WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                FROM lineitem WHERE year(l_shipdate) = 1995),
    ec AS (SELECT a.pk AS u, b.pk AS v FROM li a
           JOIN li b ON a.ok = b.ok AND a.pk < b.pk
           GROUP BY a.pk, b.pk),
    e2 AS (SELECT u AS a, v AS b FROM ec UNION SELECT v, u FROM ec),
    l0 AS (SELECT DISTINCT a AS node, a AS label FROM e2),
    {_lpa_iter('l0', 'i1')},
    {_lpa_iter('i1', 'i2')},
    {_lpa_iter('i2', 'i3')}
    SELECT label, CAST(count(*) AS BIGINT) AS n_nodes
    FROM i3 GROUP BY label
    """,
)
def graph_label_propagation(spark, sf_dir):
    """Community detection on the 1995 part-co-order graph via
    deterministic synchronous label propagation (Raghavan et al. 2007,
    3 rounds, min-label tie-break): community label → member count. Each
    round is one neighbor-label equi-join + count aggregate + map-side-
    cut argmax window (the PageRank iteration shape); the oracle replays
    the identical three rounds as chained CTEs.
    operators/graph.py:label_propagation."""
    from boann_ocsf_security_data_platform_spark.operators.graph import (
        label_propagation,
    )

    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.year("l_shipdate") == 1995)
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, "ok")
        .where(F.col("a.pk") < F.col("b.pk"))
        .select(F.col("a.pk").alias("src"), F.col("b.pk").alias("dst"))
        .distinct()
    )
    return (
        label_propagation(edges, iters=3)
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )


@_q(
    "orders_cohort_revenue",
    """
    WITH fo AS (SELECT o_custkey,
                       min(date_trunc('month', o_orderdate)) AS cohort
                FROM orders GROUP BY o_custkey)
    SELECT fo.cohort,
           CAST(date_diff('month', fo.cohort,
                          date_trunc('month', o.o_orderdate)) AS BIGINT)
             AS age_months,
           CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_customers,
           round(sum(o.o_totalprice), 2) AS revenue
    FROM orders o JOIN fo ON o.o_custkey = fo.o_custkey
    GROUP BY fo.cohort, age_months
    """,
)
def orders_cohort_revenue(spark, sf_dir):
    """Cohort lifetime-value matrix in long form: customers grouped by
    first-order month (the cohort), revenue and active-customer counts
    by months-since-cohort — the retention/LTV triangle. One per-customer
    min-aggregate (model-sized, joined back on the partition key) + one
    (cohort, age) rollup; months_between on month-truncated stamps is
    exact integers on both engines."""
    o = _t(spark, sf_dir, "orders").withColumn(
        "mon", F.date_trunc("month", F.col("o_orderdate"))
    )
    fo = o.groupBy("o_custkey").agg(F.min("mon").alias("cohort"))
    return (
        o.join(fo, "o_custkey")
        .groupBy(
            "cohort",
            F.months_between(F.col("mon"), F.col("cohort"))
            .cast("long")
            .alias("age_months"),
        )
        .agg(
            F.count_distinct("o_custkey").alias("n_customers"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


_PSI_TH = ", ".join(
    f"percentile_cont(0.{i}) WITHIN GROUP (ORDER BY x) AS t{i}"
    for i in range(1, 10)
)
_PSI_BIN = " + ".join(f"CAST(x > t{i} AS INT)" for i in range(1, 10))


@_q(
    "feature_psi_drift",
    f"""
    WITH ref AS (SELECT l_returnflag AS flag, l_extendedprice AS x
                 FROM lineitem WHERE year(l_shipdate) = 1995),
    cur AS (SELECT l_returnflag AS flag, l_extendedprice AS x
            FROM lineitem WHERE year(l_shipdate) = 1996),
    th AS (SELECT flag, {_PSI_TH} FROM ref GROUP BY flag),
    rb AS (SELECT r.flag, {_PSI_BIN} AS bin
           FROM ref r JOIN th USING (flag)),
    cb AS (SELECT c.flag, {_PSI_BIN} AS bin
           FROM cur c JOIN th USING (flag)),
    spine AS (SELECT DISTINCT flag, t.range AS bin
              FROM th, range(10) t),
    pn AS (SELECT flag, bin, count(*) AS n FROM rb GROUP BY flag, bin),
    qn AS (SELECT flag, bin, count(*) AS n FROM cb GROUP BY flag, bin),
    j AS (SELECT s.flag, s.bin,
                 coalesce(pn.n, 0) AS np, coalesce(qn.n, 0) AS nq
          FROM spine s LEFT JOIN pn USING (flag, bin)
                       LEFT JOIN qn USING (flag, bin)),
    tot AS (SELECT flag, sum(np) AS tp, sum(nq) AS tq FROM j GROUP BY flag),
    sh AS (SELECT j.flag,
                  (np + 0.5) / (tp + 5.0) AS p,
                  (nq + 0.5) / (tq + 5.0) AS q
           FROM j JOIN tot USING (flag))
    SELECT flag AS l_returnflag,
           round(sum((q - p) * ln(q / p)), 4) AS psi
    FROM sh GROUP BY flag
    """,
)
def feature_psi_drift(spark, sf_dir):
    """Population Stability Index per return flag: 1996 price
    distribution vs a 1995 reference, binned by the REFERENCE's deciles
    (Laplace-smoothed so empty bins stay finite) — the drift metric
    feature stores alarm on before a model silently degrades. One
    ordered-set aggregate builds the 9 fences per flag (broadcast), bin
    assignment is a row-local comparison sum, and the PSI is a 30-row
    rollup — a scan plus model-sized joins."""
    l = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("x"),
        F.year("l_shipdate").alias("yr"),
    )
    ref = l.where(F.col("yr") == 1995)
    cur = l.where(F.col("yr") == 1996)
    # th is flag-grain (5 rows) but its lineage is a percentile
    # SortAggregate over the 1995 fact slice, and FOUR consumers
    # (both binned() broadcasts, the spine, and their recomputes via j)
    # each re-ran it — round-12 sorter-pipeline scan found the
    # duplicated subtrees fusing 5 sorters into one region at sf10.
    # Persist the bounded frame; every branch then reads 5 cached rows.
    th = _percentiles_by_group(
        spark, sf_dir, ref, "lineitem",
        "flag", "x", [(i / 10, f"t{i}") for i in range(1, 10)],
    ).persist(StorageLevel.MEMORY_AND_DISK_DESER)
    bin_expr = sum(
        (F.col("x") > F.col(f"t{i}")).cast("int") for i in range(1, 10)
    ).alias("bin")

    def binned(df):
        return (
            df.join(F.broadcast(th), "flag")
            .select("flag", bin_expr)
            .groupBy("flag", "bin")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    spine = th.select("flag").crossJoin(
        spark.range(10).select(F.col("id").cast("int").alias("bin"))
    )
    # binned() outputs are PROVABLY bounded (flags x 10 bins ≤ 50 rows)
    # but their Catalyst estimates scale with the fact input, so the
    # planner sort-merged them — fusing 3 sorts + 2 SMJs into one region
    # (round-12 scan-all find). Explicit bounded broadcast, the
    # pair-entry broadcast-budget discipline.
    j = (
        spine.join(F.broadcast(binned(ref).withColumnRenamed("n", "np")), ["flag", "bin"], "left")
        .join(F.broadcast(binned(cur).withColumnRenamed("n", "nq")), ["flag", "bin"], "left")
        .select(
            "flag",
            "bin",
            F.coalesce("np", F.lit(0)).alias("np"),
            F.coalesce("nq", F.lit(0)).alias("nq"),
        )
    ).persist(StorageLevel.MEMORY_AND_DISK_DESER)
    # j is 50 bounded rows but carries BOTH fact-slice bin rollups in its
    # lineage; the totals branch and the share branch each re-ran them.
    tot = j.groupBy("flag").agg(
        F.sum("np").alias("tp"), F.sum("nq").alias("tq")
    )
    sh = j.join(F.broadcast(tot), "flag").select(
        "flag",
        ((F.col("np") + 0.5) / (F.col("tp") + 5.0)).alias("p"),
        ((F.col("nq") + 0.5) / (F.col("tq") + 5.0)).alias("q"),
    )
    return sh.groupBy(F.col("flag").alias("l_returnflag")).agg(
        F.round(
            F.sum((F.col("q") - F.col("p")) * F.log(F.col("q") / F.col("p"))),
            4,
        ).alias("psi")
    )


@_q(
    "agg_gini_coefficient",
    """
    WITH c AS (SELECT o_custkey, sum(o_totalprice) AS rev
               FROM orders GROUP BY o_custkey),
    r AS (SELECT rev,
                 row_number() OVER (ORDER BY rev, o_custkey) AS i,
                 count(*) OVER () AS n,
                 sum(rev) OVER () AS tot
          FROM c)
    SELECT round(2.0 * sum(i * rev) / (max(n) * max(tot))
                 - (max(n) + 1.0) / max(n), 6) AS gini,
           CAST(max(n) AS BIGINT) AS n_customers
    FROM r
    """,
)
def agg_gini_coefficient(spark, sf_dir):
    """Gini coefficient of customer revenue concentration (the
    inequality summary behind the Pareto view): rank-weighted-sum
    formula G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over revenue-sorted
    customers. Round-12 sf100 find: the global rank window sorted the
    15M-row customer rollup in ONE task (rank-window funnel at
    cardinality 1), and the two whole-frame aggregate windows shuffled
    the frame to a single partition besides. The rank decomposes
    through revenue buckets (i = lower-bucket prefix count + in-bucket
    row_number — exact integers); n and Σx ride ONE broadcast scalar
    row. The rollup is persisted (r12 VERDICT #6): it feeds the sketch
    action, the (n, tot) scalar, the prefix table and the ranked frame —
    unpersisted, 4 fact scans (DISK_ONLY above the fact gate)."""
    o = _t(spark, sf_dir, "orders")
    c = (
        o.groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("rev"))
        .persist(
            StorageLevel.DISK_ONLY
            if _table_count(spark, sf_dir, "orders")
            > _gates.PIN_FACT_MIN_ROWS
            else StorageLevel.MEMORY_AND_DISK_DESER
        )
    )
    nt = c.agg(
        F.count(F.lit(1)).alias("n"), F.sum("rev").alias("tot")
    )
    b = _order_buckets(c, "rev", ascending=True)
    w_in = Window.partitionBy("bkt").orderBy(
        F.col("rev"), F.col("o_custkey")
    )
    w_pre = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    prefix = (
        b.groupBy("bkt")
        .agg(F.count(F.lit(1)).alias("bn"))
        .select(
            "bkt",
            F.coalesce(F.sum("bn").over(w_pre), F.lit(0)).alias("prev_n"),
        )
    )
    r = (
        b.join(F.broadcast(prefix), "bkt")
        .crossJoin(F.broadcast(nt))
        .select(
            "rev",
            (F.col("prev_n") + F.row_number().over(w_in)).alias("i"),
            "n",
            "tot",
        )
    )
    return r.agg(
        F.round(
            2.0 * F.sum(F.col("i") * F.col("rev"))
            / (F.max("n") * F.max("tot"))
            - (F.max("n") + 1.0) / F.max("n"),
            6,
        ).alias("gini"),
        F.max("n").cast("long").alias("n_customers"),
    )


@_q(
    "text_langid_eval",
    f"""
    WITH p AS ({_langid_oracle()})
    SELECT d.lang, p.lang_pred, CAST(count(*) AS BIGINT) AS n
    FROM documents d JOIN p USING (doc_id)
    GROUP BY d.lang, p.lang_pred
    """,
)
def text_langid_eval(spark, sf_dir):
    """Language-ID confusion matrix: the detector's predictions crossed
    with the corpus's labeled ``lang`` column — the classifier-QA view
    (which languages bleed into which) that decides whether the
    stopword heuristic is good enough before it gates a corpus. One
    row-local scoring pass + a bounded (lang × pred) rollup."""
    d = _t(spark, sf_dir, "documents")
    return (
        lang_id(d)
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@_q(
    "events_longest_streak",
    """
    WITH d AS (SELECT event_type, date_trunc('day', ts) AS day,
                      round(sum(value), 6) AS v
               FROM events GROUP BY event_type, date_trunc('day', ts)),
    s AS (SELECT event_type, day, v,
                 CASE WHEN lag(day) OVER w = day - INTERVAL 1 DAY
                       AND lag(v) OVER w < v THEN 0 ELSE 1 END AS brk
          FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day)),
    i AS (SELECT event_type, sum(brk) OVER (
            PARTITION BY event_type ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
          FROM s),
    r AS (SELECT event_type, run_id, count(*) AS len
          FROM i GROUP BY event_type, run_id)
    SELECT event_type, CAST(max(len) AS BIGINT) AS longest_up_streak,
           CAST(count(*) AS BIGINT) AS n_runs
    FROM r GROUP BY event_type
    """,
)
def events_longest_streak(spark, sf_dir):
    """Longest run of strictly-increasing consecutive daily totals per
    event type — the monotonic-run variant of gaps-and-islands (a break
    is a missing day OR a non-increase; daily totals round before the
    comparison so engine summation ULPs can't flip a break). One daily
    rollup + one lag/cumsum window over the bounded (type, day) table."""
    e = _t(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.round(F.sum("value"), 6).alias("v"))
    w = Window.partitionBy("event_type").orderBy("day")
    s = d.withColumn(
        "brk",
        F.when(
            (F.lag("day").over(w) == F.expr("day - INTERVAL 1 DAY"))
            & (F.lag("v").over(w) < F.col("v")),
            F.lit(0),
        ).otherwise(F.lit(1)),
    )
    cum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    i = s.withColumn("run_id", F.sum("brk").over(cum))
    r = i.groupBy("event_type", "run_id").agg(F.count(F.lit(1)).alias("len"))
    return r.groupBy("event_type").agg(
        F.max("len").alias("longest_up_streak"),
        F.count(F.lit(1)).alias("n_runs"),
    )


_PII_ORACLE_TYPES = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ssn", r"[0-9]{3}-[0-9]{2}-[0-9]{4}"),
    (
        "phone",
        r"(\+?[0-9]{1,3}[-. ])?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}",
    ),
    ("ipv4", r"([0-9]{1,3}\.){3}[0-9]{1,3}"),
]


@_q(
    "text_pii_stats",
    " UNION ALL ".join(
        f"""
    SELECT '{name}' AS pii_type,
           CAST(sum(len(regexp_extract_all(text, '{pat}'))) AS BIGINT)
             AS n_spans,
           CAST(count(*) FILTER (
             WHERE len(regexp_extract_all(text, '{pat}')) > 0) AS BIGINT)
             AS n_docs
    FROM documents"""
        for name, pat in _PII_ORACLE_TYPES
    ),
)
def text_pii_stats(spark, sf_dir):
    """PII exposure report: matched span counts and affected-document
    counts per PII class (email/SSN/phone/IPv4, the same RE2-safe
    patterns the redactor rewrites) — the measurement that accompanies
    redaction in a compliance pipeline. Four row-local regexp scans
    folded into per-type one-row aggregates; counting and replacing are
    the same leftmost-non-overlapping match walk, so these counts ARE
    the redactor's replacement counts."""
    from boann_ocsf_security_data_platform_spark.operators.text import PII_PATTERNS

    d = _t(spark, sf_dir, "documents")
    parts = []
    for name, _ in _PII_ORACLE_TYPES:
        n = F.size(F.regexp_extract_all("text", F.lit(PII_PATTERNS[name]), 0))
        parts.append(
            d.agg(
                F.lit(name).alias("pii_type"),
                F.sum(n).alias("n_spans"),
                F.sum((n > 0).cast("long")).alias("n_docs"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


@_q(
    "diff_table_versions",
    """
    WITH b AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 89 = 0
                  THEN round(o_totalprice + 1, 2)
                  ELSE o_totalprice END AS o_totalprice,
             o_orderstatus
      FROM orders WHERE o_orderkey % 97 <> 0
      UNION ALL
      SELECT o_orderkey + 100000000, o_totalprice, o_orderstatus
      FROM orders WHERE o_orderkey % 101 = 0),
    a AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
    j AS (SELECT coalesce(a.o_orderkey, b.o_orderkey) AS k,
                 CASE WHEN b.o_orderkey IS NULL THEN 'removed'
                      WHEN a.o_orderkey IS NULL THEN 'added'
                      WHEN a.o_totalprice IS DISTINCT FROM b.o_totalprice
                        OR a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
                        THEN 'changed'
                      ELSE 'unchanged' END AS diff_status
          FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey)
    SELECT diff_status, CAST(count(*) AS BIGINT) AS n
    FROM j GROUP BY diff_status
    """,
)
def diff_table_versions(spark, sf_dir):
    """Snapshot reconciliation: diff two versions of orders (version B
    deterministically derived — deletes at key%97, +1 price changes at
    key%89, key-shifted inserts at key%101) into added/removed/changed/
    unchanged counts — the migration-sign-off / CDC-backfill primitive.
    One key-partitioned full-outer join with null-safe column compare.
    operators/relational.py:table_diff."""
    from boann_ocsf_security_data_platform_spark.operators.relational import (
        table_diff,
    )

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    b = (
        o.where(F.col("o_orderkey") % 97 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 89 == 0,
                F.round(F.col("o_totalprice") + 1, 2),
            ).otherwise(F.col("o_totalprice")),
        )
        .unionAll(
            o.where(F.col("o_orderkey") % 101 == 0).select(
                (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
                "o_totalprice",
                "o_orderstatus",
            )
        )
    )
    return (
        table_diff(o, b, ["o_orderkey"])
        .groupBy("diff_status")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@_q(
    "orders_rfm_segments",
    """
    WITH mx AS (SELECT max(o_orderdate) AS now FROM orders),
    c AS (SELECT o_custkey,
                 date_diff('day', max(o_orderdate), (SELECT now FROM mx))
                   AS recency_days,
                 count(*) AS frequency,
                 sum(o_totalprice) AS monetary
          FROM orders GROUP BY o_custkey),
    s AS (SELECT o_custkey,
                 ntile(5) OVER (ORDER BY recency_days DESC, o_custkey)
                   AS r_score,
                 ntile(5) OVER (ORDER BY frequency, o_custkey) AS f_score,
                 ntile(5) OVER (ORDER BY monetary, o_custkey) AS m_score
          FROM c)
    SELECT concat(r_score, f_score, m_score) AS rfm,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM s GROUP BY concat(r_score, f_score, m_score)
    """,
)
def orders_rfm_segments(spark, sf_dir):
    """RFM customer segmentation: recency (days since last order, scored
    so recent = 5), frequency, monetary quintiles concatenated into the
    classic 'RFM cell' with customer counts per cell. One per-customer
    rollup (model-sized) + three quintile windows over it + a 125-cell
    rollup; the raw fact table is touched once."""
    o = _t(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_orderdate").alias("now"))
    c = (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum("o_totalprice").alias("monetary"),
        )
        .crossJoin(F.broadcast(mx))
        .select(
            "o_custkey",
            F.datediff(
                F.col("now").cast("date"), F.col("last_order").cast("date")
            ).alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    # three bucket-decomposed exact ntiles, one sketch action (round 11
    # — each literal ntile was a global single-task customer-grain sort)
    s = _bucketed_ntiles(
        c,
        [
            ("recency_days", False, "r_score"),
            ("frequency", True, "f_score"),
            ("monetary", True, "m_score"),
        ],
        "o_custkey",
        5,
    ).select("o_custkey", "r_score", "f_score", "m_score")
    return s.groupBy(
        F.concat("r_score", "f_score", "m_score").alias("rfm")
    ).agg(F.count(F.lit(1)).alias("n_customers"))


@_q(
    "orders_basket_lift",
    """
    WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                FROM lineitem),
    n AS (SELECT count(DISTINCT ok) AS n_orders FROM li),
    item AS (SELECT pk, count(*) AS n_pk FROM li GROUP BY pk),
    pair AS (SELECT a.pk AS pk_a, b.pk AS pk_b, count(*) AS n_ab
             FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
             GROUP BY a.pk, b.pk),
    scored AS (SELECT pk_a, pk_b, n_ab,
                      round(CAST(n_ab AS DOUBLE) * n.n_orders
                            / (ia.n_pk * ib.n_pk), 4) AS lift
               FROM pair JOIN item ia ON ia.pk = pair.pk_a
                         JOIN item ib ON ib.pk = pair.pk_b
                         CROSS JOIN n
               WHERE n_ab >= 3)
    SELECT pk_a, pk_b, CAST(n_ab AS BIGINT) AS n_ab, lift
    FROM scored ORDER BY lift DESC, pk_a, pk_b LIMIT 20
    """,
)
def orders_basket_lift(spark, sf_dir):
    """Market-basket association mining: lift = P(a,b)/(P(a)·P(b)) for
    part pairs co-occurring in ≥3 orders, top-20 by lift — the apriori
    support/lift primitive. The pair join is the same blocked co-order
    equi-join as the graph family (never all-pairs across orders); item
    stats join back by key; the global cut is TakeOrderedAndProject."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    n = li.select("ok").distinct().agg(F.count(F.lit(1)).alias("n_orders"))
    item = li.groupBy("pk").agg(F.count(F.lit(1)).alias("n_pk"))
    # all three join inputs below are DERIVED fact-scaling frames (the
    # distinct basket stream and the per-item support table) — pin
    # sort-merge so a low estimate can't broadcast them (the
    # dedup._corpus_sized discipline); the one-row n_orders scalar keeps
    # its explicit broadcast
    _fpin = _gates.pin_shuffle_join_fact(_table_count(spark, sf_dir, "lineitem"))
    a, b = li.alias("a"), _pin(li.alias("b"), _fpin)
    pair = (
        a.join(b, "ok")
        .where(F.col("a.pk") < F.col("b.pk"))
        .groupBy(F.col("a.pk").alias("pk_a"), F.col("b.pk").alias("pk_b"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= 3)
    )
    ia = item.select(F.col("pk").alias("pk_a"), F.col("n_pk").alias("n_a"))
    ib = item.select(F.col("pk").alias("pk_b"), F.col("n_pk").alias("n_b"))
    return (
        pair.join(_pin(ia, _fpin), "pk_a")
        .join(_pin(ib, _fpin), "pk_b")
        .crossJoin(F.broadcast(n))
        .select(
            "pk_a",
            "pk_b",
            "n_ab",
            F.round(
                F.col("n_ab").cast("double") * F.col("n_orders")
                / (F.col("n_a") * F.col("n_b")),
                4,
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "pk_a", "pk_b")
        .limit(20)
    )


_CENT_COMPS = ", ".join(f"round(avg(v[{i + 1}]), 6)" for i in range(64))
_COS_VC = (
    "list_dot_product(e.v, cent.c) / "
    "(sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cent.c, cent.c)))"
)
_COS_CC = (
    "list_dot_product(a.c, b.c) / "
    "(sqrt(list_dot_product(a.c, a.c)) * sqrt(list_dot_product(b.c, b.c)))"
)


@_q(
    "embedding_cluster_quality",
    f"""
    WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    cent AS (SELECT label, [{_CENT_COMPS}] AS c, count(*) AS n
             FROM e GROUP BY label),
    intra AS (SELECT e.label,
                     round(avg(round({_COS_VC}, 6)), 4) AS intra_cos
              FROM e JOIN cent USING (label) GROUP BY e.label),
    inter AS (SELECT a.label, max(round({_COS_CC}, 6)) AS nearest_other_cos
              FROM cent a JOIN cent b ON a.label <> b.label
              GROUP BY a.label)
    SELECT cent.label, CAST(cent.n AS BIGINT) AS n_members,
           intra.intra_cos, inter.nearest_other_cos
    FROM cent JOIN intra USING (label) JOIN inter USING (label)
    """,
)
def embedding_cluster_quality(spark, sf_dir):
    """Cluster-cohesion diagnostics per label: mean member→centroid
    cosine (compactness) vs the closest OTHER centroid's cosine
    (separation) — the silhouette-style health check run before trusting
    labels as retrieval shards or distillation classes. One centroid
    aggregate (|labels|×dim shuffle), one broadcast join back for the
    member pass, and a |labels|² centroid cross — model-sized after the
    single scan."""
    from boann_ocsf_security_data_platform_spark.operators.similarity import (
        cosine_sim,
        label_centroids,
    )

    emb = _t(spark, sf_dir, "embeddings")
    cent = label_centroids(emb)
    intra = (
        emb.join(F.broadcast(cent.select("label", "centroid")), "label")
        .groupBy("label")
        .agg(
            F.round(
                F.avg(
                    F.round(
                        cosine_sim(F.col("embedding"), F.col("centroid")), 6
                    )
                ),
                4,
            ).alias("intra_cos")
        )
    )
    a = cent.select(F.col("label").alias("l_a"), F.col("centroid").alias("c_a"))
    b = cent.select(F.col("label").alias("l_b"), F.col("centroid").alias("c_b"))
    inter = (
        a.crossJoin(b)
        .where(F.col("l_a") != F.col("l_b"))
        .groupBy(F.col("l_a").alias("label"))
        .agg(
            F.max(
                F.round(cosine_sim(F.col("c_a"), F.col("c_b")), 6)
            ).alias("nearest_other_cos")
        )
    )
    return (
        cent.select("label", F.col("n_members"))
        .join(intra, "label")
        .join(inter, "label")
    )


@_q(
    "text_tokenizer_fertility",
    f"""
    WITH t AS (SELECT lang, {_WORDS} AS ws,
      list_filter(string_split_regex(trim(regexp_replace(lower(text),
        '([0-9]+|[^a-z0-9\\s]+)', ' \\1 ', 'g')), '\\s+'), w -> w <> '') AS bts
      FROM documents)
    SELECT lang,
           round(avg(CAST(len(bts) AS DOUBLE) / len(ws)), 4) AS fertility,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM t WHERE len(ws) > 0 GROUP BY lang
    """,
)
def text_tokenizer_fertility(spark, sf_dir):
    """Tokenizer fertility per language: mean subword-per-word ratio of
    the BPE-ish pre-tokenizer vs whitespace words — the metric that
    exposes a tokenizer taxing some languages with more tokens per word
    (cost + context budget skew). Row-local double tokenization + a
    bounded per-language rollup."""
    d = _t(spark, sf_dir, "documents")
    from boann_ocsf_security_data_platform_spark.operators.text import tokens

    t = d.select(
        "lang",
        F.size(tokens("text")).alias("nw"),
        F.size(bpe_ish_tokens("text")).alias("nb"),
    ).where(F.col("nw") > 0)
    return t.groupBy("lang").agg(
        F.round(
            F.avg(F.col("nb").cast("double") / F.col("nw")), 4
        ).alias("fertility"),
        F.count(F.lit(1)).alias("n_docs"),
    )


@_q(
    "events_dau_wau_stickiness",
    """
    WITH daily AS (SELECT date_trunc('day', ts) AS d,
                          count(DISTINCT user_id) AS dau
                   FROM events GROUP BY 1),
    wau AS (SELECT date_trunc('day', ts) + INTERVAL (t.range) DAY AS d,
                   count(DISTINCT user_id) AS wau_7d
            FROM events, range(7) t GROUP BY 1)
    SELECT daily.d, CAST(daily.dau AS BIGINT) AS dau,
           CAST(wau.wau_7d AS BIGINT) AS wau_7d,
           round(CAST(daily.dau AS DOUBLE) / wau.wau_7d, 4) AS stickiness
    FROM daily JOIN wau ON daily.d = wau.d
    """,
)
def events_dau_wau_stickiness(spark, sf_dir):
    """DAU/WAU stickiness per day — the engagement ratio product teams
    track: daily distinct users over the trailing-7-day distinct users
    (the explode-to-window rolling distinct), joined on the day key.
    Two distinct aggregates + a model-sized day-keyed join."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count_distinct("user_id").alias("dau")
    )
    wau = (
        e.select(
            F.date_trunc("day", "ts").alias("d0"),
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
        )
        .select(
            F.expr("d0 + make_dt_interval(i, 0, 0, 0)").alias("d"), "user_id"
        )
        .groupBy("d")
        .agg(F.count_distinct("user_id").alias("wau_7d"))
    )
    return daily.join(wau, "d").select(
        "d",
        "dau",
        "wau_7d",
        F.round(F.col("dau").cast("double") / F.col("wau_7d"), 4).alias(
            "stickiness"
        ),
    )


@_q(
    "events_autocorrelation",
    """
    WITH d AS (SELECT event_type, date_trunc('day', ts) AS day,
                      round(sum(value), 6) AS v
               FROM events GROUP BY event_type, date_trunc('day', ts)),
    l AS (SELECT event_type, v,
                 lag(v) OVER (PARTITION BY event_type ORDER BY day) AS v1,
                 lag(v, 7) OVER (PARTITION BY event_type ORDER BY day) AS v7
          FROM d)
    SELECT event_type, round(corr(v, v1), 4) AS acf_lag1,
           round(corr(v, v7), 4) AS acf_lag7,
           CAST(count(*) AS BIGINT) AS n_days
    FROM l GROUP BY event_type
    """,
)
def events_autocorrelation(spark, sf_dir):
    """Daily-total autocorrelation at lag 1 and lag 7 per event type —
    the seasonality fingerprint (a high lag-7 ACF says 'weekly rhythm',
    feeding the seasonal-baseline detector's period choice). One daily
    rollup + lag windows + a corr aggregate per type; corr's null-pair
    exclusion handles the series head identically on both engines."""
    e = _t(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.round(F.sum("value"), 6).alias("v"))
    w = Window.partitionBy("event_type").orderBy("day")
    l = d.select(
        "event_type",
        "v",
        F.lag("v", 1).over(w).alias("v1"),
        F.lag("v", 7).over(w).alias("v7"),
    )
    return l.groupBy("event_type").agg(
        F.round(F.corr("v", "v1"), 4).alias("acf_lag1"),
        F.round(F.corr("v", "v7"), 4).alias("acf_lag7"),
        F.count(F.lit(1)).alias("n_days"),
    )


@_q(
    "text_readability_scores",
    f"""
    WITH t AS (SELECT doc_id,
                      len(list_filter(string_split_regex(text, '[.!?]+'),
                                      s -> trim(s) <> '')) AS n_sentences,
                      len({_WORDS}) AS n_words,
                      len(regexp_extract_all(lower(text), '[aeiouy]+'))
                        AS n_vgroups
               FROM documents)
    SELECT doc_id, CAST(n_sentences AS BIGINT) AS n_sentences,
           CAST(n_words AS BIGINT) AS n_words,
           -- exact-integer milli-points via floor: the true value is a
           -- rational whose distance from any integer is >= 1/(s*w), ten
           -- orders above double error, so floor is engine-identical --
           -- unlike round(,2), where Spark rounds the SHORTEST-DECIMAL
           -- repr and DuckDB the binary value (ties diverge)
           CAST(floor(CAST(1000 * (206835 * n_sentences * n_words
                                   - 1015 * n_words * n_words
                                   - 84600 * n_vgroups * n_sentences)
                           AS DOUBLE)
                      / (1000 * n_sentences * n_words)) AS BIGINT)
             AS flesch_milli
    FROM t WHERE n_sentences > 0 AND n_words > 0
    """,
)
def text_readability_scores(spark, sf_dir):
    """Flesch-style readability per document (vowel-group runs as the
    syllable proxy — deterministic and engine-portable, unlike dictionary
    syllabification): the classic text-difficulty prior corpus curricula
    sort on. Pure row-local regexp counting — scan bandwidth, no
    shuffle."""
    d = _t(spark, sf_dir, "documents")
    n_sent = F.size(
        F.filter(
            F.split(F.col("text"), r"[.!?]+"), lambda s: F.trim(s) != ""
        )
    )
    from boann_ocsf_security_data_platform_spark.operators.text import tokens

    n_words = F.size(tokens("text"))
    n_vg = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[aeiouy]+"), 0)
    )
    return (
        d.select(
            "doc_id",
            n_sent.cast("long").alias("n_sentences"),
            n_words.cast("long").alias("n_words"),
            n_vg.alias("n_vg"),
        )
        .where((F.col("n_sentences") > 0) & (F.col("n_words") > 0))
        .select(
            "doc_id",
            "n_sentences",
            "n_words",
            F.floor(
                (
                    1000
                    * (
                        206835 * F.col("n_sentences") * F.col("n_words")
                        - 1015 * F.col("n_words") * F.col("n_words")
                        - 84600 * F.col("n_vg") * F.col("n_sentences")
                    )
                ).cast("double")
                / (1000 * F.col("n_sentences") * F.col("n_words"))
            )
            .cast("long")
            .alias("flesch_milli"),
        )
    )


@_q(
    "text_ngram_novelty",
    f"""
    WITH words AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
    g AS (SELECT DISTINCT doc_id, unnest({_duck_spans(3)}) AS gram
          FROM words),
    m AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY gram)
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS n_distinct_grams,
           CAST(sum(CASE WHEN m.first_doc = g.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           round(sum(CASE WHEN m.first_doc = g.doc_id THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 4) AS novelty
    FROM g JOIN m USING (gram) GROUP BY g.doc_id
    """,
)
def text_ngram_novelty(spark, sf_dir):
    """Corpus novelty curve: per document (in id order), the fraction of
    its distinct 3-gram spans never seen in any earlier document — the
    diminishing-returns signal data curators watch when deciding how much
    more of a source to crawl. First-occurrence is one min-aggregate on
    the gram key (the same shuffle the span-dedup family pays); novelty
    is a per-doc rollup over the joined stream."""
    from boann_ocsf_security_data_platform_spark.operators.text import (
        _with_word_ngrams,
    )

    grams = _with_word_ngrams(
        _t(spark, sf_dir, "documents").select("doc_id", "text"),
        "text",
        3,
        "_grams",
    )
    g = grams.select(
        "doc_id", F.explode("_grams").alias("gram")
    ).distinct()
    m = g.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    novel = (F.col("first_doc") == F.col("doc_id")).cast("long")
    return (
        # first-occurrence table is gram-count-sized (corpus-scaling) —
        # pinned sort-merge above the measured-count threshold (the
        # dedup._corpus_sized discipline)
        g.join(_pin(m, _gates.pin_shuffle_join(_table_count(spark, sf_dir, "documents"))), "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_distinct_grams"),
            F.sum(novel).alias("n_novel"),
            F.round(
                F.sum(novel) / F.count(F.lit(1)).cast("double"), 4
            ).alias("novelty"),
        )
    )


@_q(
    "parts_supplier_concentration",
    """
    WITH ps AS (SELECT l_partkey AS pk, l_suppkey AS sk,
                       sum(CAST(l_quantity AS BIGINT)) AS q
                FROM lineitem GROUP BY l_partkey, l_suppkey),
    agg AS (SELECT pk, count(*) AS n_suppliers,
                   sum(q * q) AS nsq, sum(q) AS qt
            FROM ps GROUP BY pk)
    SELECT pk AS l_partkey, CAST(n_suppliers AS BIGINT) AS n_suppliers,
           CAST(floor(CAST(10000 * nsq AS DOUBLE) / (qt * qt)) AS BIGINT)
             AS hhi_bp
    FROM agg
    """,
)
def parts_supplier_concentration(spark, sf_dir):
    """Supply-concentration risk per part: Herfindahl-Hirschman index of
    supplier quantity shares in basis points — HHI 10000 = sole-sourced,
    the procurement-risk screen. Quantities cast to exact integers so
    HHI = 10000·Σq²⁄(Σq)² is a single floor-safe rational (the same
    integer-exactness discipline as the readability score); two stacked
    partial+final aggregates, no joins."""
    l = _t(spark, sf_dir, "lineitem")
    ps = l.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
    agg = ps.groupBy("pk").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum(F.col("q") * F.col("q")).alias("nsq"),
        F.sum("q").alias("qt"),
    )
    return agg.select(
        F.col("pk").alias("l_partkey"),
        "n_suppliers",
        F.floor(
            (10000 * F.col("nsq")).cast("double")
            / (F.col("qt") * F.col("qt"))
        )
        .cast("long")
        .alias("hhi_bp"),
    )


@_q(
    "events_slo_burn_rate",
    """
    WITH hourly AS (SELECT date_trunc('hour', ts) AS h,
                           count(*) AS n,
                           count(*) FILTER (WHERE event_type = 'error')
                             AS ne
                    FROM events GROUP BY 1),
    r6 AS (SELECT h0.h + INTERVAL (t.range) HOUR AS h,
                  sum(h0.n) AS n6, sum(h0.ne) AS ne6
           FROM hourly h0, range(6) t GROUP BY 1)
    SELECT hourly.h, CAST(hourly.n AS BIGINT) AS n_events,
           CAST(floor(CAST(10000 * hourly.ne AS DOUBLE) / hourly.n)
                AS BIGINT) AS err_rate_bp,
           CAST(floor(CAST(20000 * hourly.ne AS DOUBLE) / hourly.n)
                AS BIGINT) AS burn_1h_milli,
           CAST(floor(CAST(20000 * r6.ne6 AS DOUBLE) / r6.n6) AS BIGINT)
             AS burn_6h_milli
    FROM hourly JOIN r6 ON hourly.h = r6.h
    """,
)
def events_slo_burn_rate(spark, sf_dir):
    """SRE error-budget burn rate per hour against a 5% SLO: the 1-hour
    and trailing-6-hour burn multipliers (rate ÷ budget) that drive
    multi-window burn-rate alerts — emitted as exact-integer basis
    points / milli-multipliers via the floor discipline (ratios of
    counts are rationals; round() is engine-divergent on ties). The
    6-hour window is the explode-to-window trick again — no hour-grid
    join, one (hour) shuffle."""
    e = _t(spark, sf_dir, "events")
    hourly = e.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("event_type") == "error").cast("long")).alias("ne"),
    )
    r6 = (
        hourly.select(
            "h", "n", "ne", F.explode(F.sequence(F.lit(0), F.lit(5))).alias("i")
        )
        .select(
            F.expr("h + make_interval(0, 0, 0, 0, i, 0, 0)").alias("h"),
            "n",
            "ne",
        )
        .groupBy("h")
        .agg(F.sum("n").alias("n6"), F.sum("ne").alias("ne6"))
    )
    return hourly.join(r6, "h").select(
        "h",
        F.col("n").alias("n_events"),
        F.floor((10000 * F.col("ne")).cast("double") / F.col("n"))
        .cast("long")
        .alias("err_rate_bp"),
        F.floor((20000 * F.col("ne")).cast("double") / F.col("n"))
        .cast("long")
        .alias("burn_1h_milli"),
        F.floor((20000 * F.col("ne6")).cast("double") / F.col("n6"))
        .cast("long")
        .alias("burn_6h_milli"),
    )


@_q(
    "embedding_threshold_sweep",
    f"""
    WITH e AS (SELECT vec_id, {_lsh_bucket_sql(4, 64)} AS blk,
                      CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    p AS (SELECT round({_COS}, 6) AS c
          FROM e a JOIN e b ON a.blk = b.blk AND a.vec_id < b.vec_id
          WHERE round({_COS}, 6) >= 0.3)
    SELECT t.t AS threshold, CAST(count(p.c) AS BIGINT) AS n_pairs
    FROM (VALUES (0.3), (0.5), (0.7), (0.9)) t(t)
    LEFT JOIN p ON p.c >= t.t
    GROUP BY t.t
    """,
)
def embedding_threshold_sweep(spark, sf_dir):
    """Dedup-threshold calibration curve: LSH-blocked near-dup pair
    counts at cosine ≥ 0.3/0.5/0.7/0.9 in ONE pass over the pair stream
    — the sweep a curator reads before committing to a dedup threshold
    (each candidate pair is scored once; the four thresholds are a
    4-row broadcast joined by inequality).

    SIZE-GATED DISPATCH (round 8, closing the documented 99x fixed-block
    caveat): at or below HUBNESS_EXACT_MAX_ROWS rows the blocking is the
    oracle-pinned 4 fixed hyperplanes (the hash-verified path at
    sf0.01/sf0.1); above it, plane count comes from auto_n_planes (held
    expected bucket size) AND each block's rows are capped
    deterministically at _HUBNESS_MAX_BLOCK_CAND (xxhash64 order) — the
    same replica-proof valve as the hubness profile, because exact
    duplicates share every bucket at any plane count. Above the gate the
    sweep is therefore a CALIBRATION SAMPLE (per-block bounded pair
    counts, curve shape preserved), not a pair census — which is the
    artifact a curator actually reads at 100 TB."""
    from boann_ocsf_security_data_platform_spark.operators.similarity import (
        auto_n_planes,
        lsh_bucket,
    )

    def _exact(e, n):
        return e.withColumn(
            "_blk", lsh_bucket(F.col("embedding"), n_planes=4, dim=64)
        )

    def _scale(e, n):
        planes = auto_n_planes(n, _HUBNESS_LSH_TARGET_BUCKET)
        e = e.withColumn(
            "_blk", lsh_bucket(F.col("embedding"), n_planes=planes, dim=64)
        )
        wb = Window.partitionBy("_blk").orderBy(
            F.xxhash64("vec_id"), "vec_id"
        )
        return (
            e.withColumn("_crn", F.row_number().over(wb))
            .filter(F.col("_crn") <= _HUBNESS_MAX_BLOCK_CAND)
            .drop("_crn")
        )

    emb = size_gated(
        _t(spark, sf_dir, "embeddings"), _exact, _scale, HUBNESS_EXACT_MAX_ROWS
    )
    pairs = embedding_near_dup_pairs(
        emb,
        block_col="_blk",
        threshold=0.3,
        pin_shuffle_join=_gates.pin_shuffle_join(_table_count(spark, sf_dir, "embeddings")),
    )
    th = spark.createDataFrame(
        [(0.3,), (0.5,), (0.7,), (0.9,)], "threshold double"
    )
    return (
        F.broadcast(th)
        .join(pairs, pairs.cosine >= th.threshold, "left")
        .groupBy("threshold")
        .agg(F.count("cosine").alias("n_pairs"))
    )


@_q(
    "agg_chi_square_independence",
    """
    WITH o AS (SELECT event_type, dayofweek(ts) + 1 AS dow,
                      count(*) AS obs
               FROM events GROUP BY event_type, dayofweek(ts)),
    r AS (SELECT event_type, sum(obs) AS rt FROM o GROUP BY event_type),
    c AS (SELECT dow, sum(obs) AS ct FROM o GROUP BY dow),
    t AS (SELECT sum(obs) AS tot FROM o),
    cells AS (SELECT o.obs, r.rt * c.ct / CAST(t.tot AS DOUBLE) AS exp
              FROM o JOIN r USING (event_type) JOIN c USING (dow)
                     CROSS JOIN t)
    SELECT round(sum((obs - exp) * (obs - exp) / exp), 3) AS chi2,
           CAST((SELECT count(*) - 1 FROM r)
                * (SELECT count(*) - 1 FROM c) AS BIGINT) AS dof,
           CAST((SELECT tot FROM t) AS BIGINT) AS n_events
    FROM cells
    """,
)
def agg_chi_square_independence(spark, sf_dir):
    """Pearson chi-square test of independence between event type and
    day-of-week (are error rates weekday-dependent?) — the categorical
    counterpart to the Welch t-test in the stats family. Observed cell
    counts, broadcast row/column marginals, one scalar sum; day-of-week
    conventions normalized across engines (Spark Sun=1, DuckDB Sun=0)."""
    e = _t(spark, sf_dir, "events")
    o = e.groupBy(
        "event_type", F.dayofweek("ts").alias("dow")
    ).agg(F.count(F.lit(1)).alias("obs"))
    r = o.groupBy("event_type").agg(F.sum("obs").alias("rt"))
    c = o.groupBy("dow").agg(F.sum("obs").alias("ct"))
    t = o.agg(F.sum("obs").alias("tot"))
    cells = (
        o.join(F.broadcast(r), "event_type")
        .join(F.broadcast(c), "dow")
        .crossJoin(F.broadcast(t))
        .select(
            "obs",
            (F.col("rt") * F.col("ct") / F.col("tot").cast("double")).alias(
                "exp"
            ),
        )
    )
    chi2 = cells.agg(
        F.round(
            F.sum(
                (F.col("obs") - F.col("exp"))
                * (F.col("obs") - F.col("exp"))
                / F.col("exp")
            ),
            3,
        ).alias("chi2")
    )
    dof = (
        r.agg((F.count(F.lit(1)) - 1).alias("r1"))
        .crossJoin(c.agg((F.count(F.lit(1)) - 1).alias("c1")))
        .select((F.col("r1") * F.col("c1")).cast("long").alias("dof"))
    )
    return (
        chi2.crossJoin(dof)
        .crossJoin(t.select(F.col("tot").cast("long").alias("n_events")))
    )


@_q(
    "join_point_in_time_scd2",
    """
    WITH c AS (SELECT user_id, event_type, ts, event_id,
                      lag(event_type) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id) AS prev
               FROM events),
    ch AS (SELECT user_id, event_type, ts AS valid_from, event_id
           FROM c WHERE prev IS NULL OR prev <> event_type),
    dim AS (SELECT user_id, event_type, valid_from,
                   lead(valid_from) OVER (PARTITION BY user_id
                     ORDER BY valid_from, event_id) AS valid_to
            FROM ch)
    SELECT dim.event_type AS state_at_order,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_customers,
           round(sum(o.o_totalprice), 2) AS revenue
    FROM orders o JOIN dim
      ON o.o_custkey = dim.user_id
     AND dim.valid_from <= o.o_orderdate
     AND (dim.valid_to IS NULL OR o.o_orderdate < dim.valid_to)
    GROUP BY dim.event_type
    """,
)
def join_point_in_time_scd2(spark, sf_dir):
    """Point-in-time (PIT) join: each order looks up the customer's SCD2
    state AS OF its order date — the feature-store join that prevents
    train/serve leakage (naive latest-state joins leak the future). The
    dimension is the scd2_intervals build; the lookup is an equi-join on
    the entity key with a residual validity predicate — never a
    cartesian, and at 100 TB the same shape as the binned range join /
    as-of family. Inner semantics: orders before the entity's first
    interval have no state and drop (the leakage-safe default)."""
    from boann_ocsf_security_data_platform_spark.operators.timeseries import (
        scd2_intervals,
    )

    dim = scd2_intervals(_t(spark, sf_dir, "events")).select(
        "user_id", "event_type", "valid_from", "valid_to"
    )
    o = _t(spark, sf_dir, "orders")
    return (
        o.join(
            dim,
            (o.o_custkey == dim.user_id)
            & (dim.valid_from <= o.o_orderdate)
            & (dim.valid_to.isNull() | (o.o_orderdate < dim.valid_to)),
        )
        .groupBy(F.col("event_type").alias("state_at_order"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count_distinct("o_custkey").alias("n_customers"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


def _kcore_round(prev: str, out: str, k: int = 2) -> str:
    return f"""
    d_{out} AS (SELECT node, count(*) AS d FROM (
        SELECT u AS node FROM {prev} UNION ALL SELECT v FROM {prev})
        GROUP BY node),
    k_{out} AS (SELECT node FROM d_{out} WHERE d >= {k}),
    {out} AS (SELECT e.u, e.v FROM {prev} e
              JOIN k_{out} ku ON ku.node = e.u
              JOIN k_{out} kv ON kv.node = e.v)"""


@_q(
    "graph_kcore_peel",
    f"""
    WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                FROM lineitem WHERE year(l_shipdate) = 1995),
    e0 AS (SELECT a.pk AS u, b.pk AS v FROM li a
           JOIN li b ON a.ok = b.ok AND a.pk < b.pk
           GROUP BY a.pk, b.pk),
    {_kcore_round('e0', 'e1')},
    {_kcore_round('e1', 'e2')},
    {_kcore_round('e2', 'e3')}
    SELECT 1 AS round,
           (SELECT CAST(count(DISTINCT n) AS BIGINT) FROM
             (SELECT u AS n FROM e1 UNION ALL SELECT v FROM e1)) AS n_nodes,
           (SELECT CAST(count(*) AS BIGINT) FROM e1) AS n_edges
    UNION ALL SELECT 2,
           (SELECT CAST(count(DISTINCT n) AS BIGINT) FROM
             (SELECT u AS n FROM e2 UNION ALL SELECT v FROM e2)),
           (SELECT CAST(count(*) AS BIGINT) FROM e2)
    UNION ALL SELECT 3,
           (SELECT CAST(count(DISTINCT n) AS BIGINT) FROM
             (SELECT u AS n FROM e3 UNION ALL SELECT v FROM e3)),
           (SELECT CAST(count(*) AS BIGINT) FROM e3)
    """,
)
def graph_kcore_peel(spark, sf_dir):
    """Bounded-round 2-core peeling of the 1995 part-co-order graph: the
    (round, surviving nodes, surviving edges) trajectory — the
    graph-cleaning pass that strips leaves/tendrils before community
    detection. Each round = degree aggregate + two node-keyed semi-joins
    (the oracle replays identical rounds as chained CTEs).
    operators/graph.py:kcore_peel."""
    from boann_ocsf_security_data_platform_spark.operators.graph import kcore_peel

    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.year("l_shipdate") == 1995)
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, "ok")
        .where(F.col("a.pk") < F.col("b.pk"))
        .select(F.col("a.pk").alias("src"), F.col("b.pk").alias("dst"))
        .distinct()
    )
    rows = kcore_peel(edges, k=2, rounds=3)
    return spark.createDataFrame(
        rows, "round int, n_nodes long, n_edges long"
    ).select(F.col("round").cast("int"), "n_nodes", "n_edges")


@_q(
    "text_jsd_divergence",
    f"""
    WITH toks AS (SELECT source, unnest({_WORDS}) AS token FROM documents),
    c AS (SELECT source, token, count(*) AS n FROM toks
          GROUP BY source, token),
    tot AS (SELECT source, sum(n) AS t FROM c GROUP BY source),
    p AS (SELECT c.source, c.token, c.n / CAST(tot.t AS DOUBLE) AS p
          FROM c JOIN tot USING (source)),
    -- tokens present in only ONE source contribute their mass at
    -- log2(2) = 1 bit, handled in closed form below from the shared-token
    -- sums — so the pair join only carries tokens present in BOTH sources
    st AS (SELECT a.source AS src_a, b.source AS src_b, a.p AS pa,
                  b.p AS pb
           FROM p a JOIN p b
             ON a.token = b.token AND a.source < b.source),
    shared AS (SELECT src_a, src_b,
                      sum(pa) AS ma, sum(pb) AS mb,
                      sum(pa * log2(2 * pa / (pa + pb))
                          + pb * log2(2 * pb / (pa + pb))) AS s
               FROM st GROUP BY src_a, src_b)
    SELECT src_a, src_b,
           round(0.5 * (s + (1 - ma) + (1 - mb)), 4) AS jsd_bits
    FROM shared
    """,
)
def text_jsd_divergence(spark, sf_dir):
    """Pairwise Jensen-Shannon divergence between source token
    distributions — the mixture-similarity matrix behind "are these two
    crawls the same corpus?" dedup-at-the-source-level decisions.
    Tokens present in only one source contribute their full mass at
    log2(2)=1 bit (handled in closed form from the shared-token sums, so
    the join only carries tokens present in BOTH sources); per-source
    distributions are one aggregate, the pair sums a |shared vocab|
    equi-join."""
    from boann_ocsf_security_data_platform_spark.operators.text import tokens

    d = _t(spark, sf_dir, "documents")
    toks = d.select("source", F.explode(tokens("text")).alias("token"))
    c = toks.groupBy("source", "token").agg(F.count(F.lit(1)).alias("n"))
    tot = c.groupBy("source").agg(F.sum("n").alias("t"))
    p = c.join(tot, "source").select(
        "source", "token", (F.col("n") / F.col("t").cast("double")).alias("p")
    )
    a = p.select(
        F.col("source").alias("src_a"),
        F.col("token").alias("token"),
        F.col("p").alias("pa"),
    )
    b = p.select(
        F.col("source").alias("src_b"),
        F.col("token").alias("token"),
        F.col("p").alias("pb"),
    )
    # per-source token distributions are vocabulary-scaling (derived
    # aggregates) — pinned sort-merge above the measured-count threshold
    both = a.join(_pin(b, _gates.pin_shuffle_join(_table_count(spark, sf_dir, "documents"))), "token").where(
        F.col("src_a") < F.col("src_b")
    )
    shared = both.groupBy("src_a", "src_b").agg(
        F.sum("pa").alias("ma"),
        F.sum("pb").alias("mb"),
        F.sum(
            F.col("pa") * F.log2(2 * F.col("pa") / (F.col("pa") + F.col("pb")))
            + F.col("pb")
            * F.log2(2 * F.col("pb") / (F.col("pa") + F.col("pb")))
        ).alias("s"),
    )
    return shared.select(
        "src_a",
        "src_b",
        F.round(
            0.5 * (F.col("s") + (1 - F.col("ma")) + (1 - F.col("mb"))), 4
        ).alias("jsd_bits"),
    )


@_q(
    "events_forecast_backtest",
    """
    WITH d AS (SELECT event_type, date_trunc('day', ts) AS day,
                      round(sum(value), 6) AS v
               FROM events GROUP BY event_type, date_trunc('day', ts)),
    f AS (SELECT event_type, day, v,
                 lag(v) OVER w AS naive,
                 lag(v, 7) OVER w AS snaive
          FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day))
    SELECT event_type,
           CAST(count(naive) AS BIGINT) AS n_scored,
           round(avg(abs(v - naive)), 3) AS mae_naive,
           round(avg(abs(v - snaive)), 3) AS mae_seasonal_naive
    FROM f GROUP BY event_type
    """,
)
def events_forecast_backtest(spark, sf_dir):
    """Forecast-baseline backtest: mean absolute error of the naive
    (yesterday's value) and seasonal-naive (same weekday last week)
    forecasts of daily totals per event type — the benchmark any real
    forecasting model must beat, and the companion measurement to the
    autocorrelation fingerprint (high lag-7 ACF ⇒ seasonal-naive should
    win). Lag windows over the bounded daily table; avg's null exclusion
    drops the unscorable series head identically on both engines."""
    e = _t(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.round(F.sum("value"), 6).alias("v"))
    w = Window.partitionBy("event_type").orderBy("day")
    f = d.select(
        "event_type",
        "v",
        F.lag("v", 1).over(w).alias("naive"),
        F.lag("v", 7).over(w).alias("snaive"),
    )
    return f.groupBy("event_type").agg(
        F.count("naive").alias("n_scored"),
        F.round(F.avg(F.abs(F.col("v") - F.col("naive"))), 3).alias(
            "mae_naive"
        ),
        F.round(F.avg(F.abs(F.col("v") - F.col("snaive"))), 3).alias(
            "mae_seasonal_naive"
        ),
    )


@_q(
    "multimodal_size_profile",
    """
    WITH m AS (SELECT CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
                      CAST(32 + (CAST(concat('0x', substr(md5(text), 1, 2))
                                      AS INT) % 64) AS INT) AS width
               FROM documents)
    SELECT CAST(width // 16 AS INT) AS width_bucket,
           CAST(count(*) AS BIGINT) AS n_media,
           CAST(sum(byte_len) AS BIGINT) AS total_bytes,
           CAST(min(byte_len) AS BIGINT) AS min_bytes,
           CAST(max(byte_len) AS BIGINT) AS max_bytes
    FROM m GROUP BY CAST(width // 16 AS INT)
    """,
)
def multimodal_size_profile(spark, sf_dir):
    """Media-catalog profile over the extracted metadata: payload size
    distribution bucketed by sniffed width class — the storage-planning
    rollup (which media classes dominate the bytes?). Aggregates the
    mapInPandas metadata stream without ever collecting a payload; the
    rollup itself is a bounded partial+final aggregate."""
    meta = extract_media_meta(
        attach_binary_payload(_t(spark, sf_dir, "documents"))
    )
    return (
        meta.groupBy(
            F.floor(F.col("width") / 16).cast("int").alias("width_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("byte_len").alias("total_bytes"),
            F.min("byte_len").alias("min_bytes"),
            F.max("byte_len").alias("max_bytes"),
        )
    )


# ---------------------------------------------------------------------------
# Round-5 wave 26: persisted-IVF-index lifecycle (build → pruned query)
# ---------------------------------------------------------------------------


@_q(
    "knn_ivf_index_persisted",
    f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank FROM (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             round({_COS}, 6) AS cosine,
             row_number() OVER (PARTITION BY a.vec_id
                                ORDER BY round({_COS}, 6) DESC, b.vec_id) AS rank
      FROM e a JOIN e b ON a.vec_id <> b.vec_id
      WHERE a.vec_id < 10) t
    WHERE rank <= 5
    """,
)
def knn_ivf_index_persisted(spark, sf_dir):
    """Full index lifecycle: train centroids, persist inverted lists
    PARTITIONED BY cent_id, then answer a query batch through the
    persisted index with n_probe == n_centroids — where IVF provably
    equals exact brute force, so the entry is hash-verified against the
    same DuckDB top-k oracle as knn_bruteforce_cosine while exercising
    the on-disk layout whose partition pruning IS the list seek at
    100 TB (probing p of c lists reads only p/c of the corpus
    directories). Build-once/query-many: real deployments amortize the
    build; this entry rebuilds per call so the driver exercises both
    halves deterministically (fixed seed, fixed temp path per sf).
    operators/similarity.py:build_ivf_index,query_ivf_index."""
    import os
    import tempfile

    from boann_ocsf_security_data_platform_spark.operators.similarity import (
        build_ivf_index,
        query_ivf_index,
    )

    emb = _t(spark, sf_dir, "embeddings")
    # PID in the path: parallel test shards / oracle sweeps may run this
    # entry concurrently at the same sf; a shared dir would let one
    # process rmtree files another's executors are mid-read
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    # deterministic per-(sf, shard) path — repeated sweeps overwrite this
    # one index instead of leaving a PID-scoped dir per run in /tmp
    # (r5 VERDICT "What's wrong" #2); _artifact_scope keeps concurrent
    # shards collision-free
    path = os.path.join(
        tempfile.gettempdir(), f"boann_ivf_index_{tag}_{_artifact_scope()}"
    )
    n_centroids = 8
    # sample-trained centroids (round 9): with n_probe == n_centroids the
    # query is EXACT for ANY centroid placement (the invariant this entry
    # pins), so paying full-corpus Lloyd iterations buys nothing — train
    # on a bounded hash-sample and spend the scan budget on the one real
    # assignment pass (sf1: 21.7 s -> the build is assignment-bound)
    build_ivf_index(
        emb, path, n_centroids=n_centroids,
        train_sample_size=64 * n_centroids,
    )
    return query_ivf_index(
        spark,
        path,
        emb.filter(F.col("vec_id") < 10),
        k=5,
        n_probe=n_centroids,
    ).withColumn("rank", F.col("rank").cast("long"))


def _bpe_iter_sql(prev: str, out: str) -> str:
    """One BPE training iteration as DuckDB CTEs: explode adjacent symbol
    pairs weighted by word freq, pick the top pair (ties: lexicographic,
    matching train_bpe_merges), apply it with the same greedy
    left-to-right fold (list_reduce over singleton lists — acc starts as
    the first symbol's list, exactly like folding from empty with
    append). HAVING >= 2 replicates the trainer's early-stop: once no
    pair reaches 2 the vocab passes through unchanged, so continuing
    no-op iterations equals the trainer's break."""
    return f"""
    p_{out} AS (
      SELECT unnest(list_transform(range(1, len(syms)), j ->
               struct_pack(a := syms[j], b := syms[j+1]))) AS p, freq
      FROM {prev}),
    t_{out} AS (
      SELECT p.a AS a, p.b AS b FROM p_{out}
      GROUP BY p.a, p.b HAVING sum(freq) >= 2
      ORDER BY sum(freq) DESC, p.a, p.b LIMIT 1),
    {out} AS (
      SELECT w, CASE WHEN t.a IS NULL THEN syms ELSE
        list_reduce(list_transform(syms, s -> [s]),
          (acc, x) -> CASE WHEN acc[-1] = t.a AND x[1] = t.b
                      THEN acc[:-2] || [t.a || t.b]
                      ELSE acc || x END)
      END AS syms, freq FROM {prev} LEFT JOIN t_{out} t ON TRUE)"""


_BPE_N_MERGES = 8
_BPE_CHAIN = ",".join(
    _bpe_iter_sql(f"v{i}", f"v{i + 1}") for i in range(_BPE_N_MERGES)
)


@_q(
    "text_bpe_roundtrip",
    f"""
    WITH words AS (SELECT unnest({_WORDS}) AS w FROM documents),
    vocab AS (SELECT w, count(*) AS freq FROM words GROUP BY w),
    v0 AS (SELECT w, string_split(w, '') || ['</w>'] AS syms, freq
           FROM vocab),{_BPE_CHAIN}
    SELECT w AS word, array_to_string(syms, ' ') AS bpe,
           CAST(len(syms) AS INT) AS n_subwords
    FROM v{_BPE_N_MERGES}
    """,
)
def text_bpe_roundtrip(spark, sf_dir):
    """Tokenizer-training round-trip: train 8 BPE merges on the corpus
    vocabulary (Sennrich et al. 2016; one corpus pass collapses to a
    (word, freq) table, every merge iteration runs on the vocab alone),
    then SEGMENT every vocabulary word with the trained merge list —
    per word: its subword split and piece count. The DuckDB oracle
    replays the identical training (chained CTEs, same tie-break, same
    greedy fold), so the entire train→encode loop is hash-verified.
    operators/text.py:train_bpe_merges,bpe_segment."""
    from boann_ocsf_security_data_platform_spark.operators.text import (
        bpe_segment,
        tokens,
        train_bpe_merges,
    )

    docs = _t(spark, sf_dir, "documents")
    merges = train_bpe_merges(docs, n_merges=_BPE_N_MERGES)
    vocab = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    seg = bpe_segment("w", merges)
    return vocab.select(
        F.col("w").alias("word"),
        F.array_join(seg, " ").alias("bpe"),
        F.size(seg).cast("int").alias("n_subwords"),
    )


# ---------------------------------------------------------------------------
# Round-5 wave 28: CUSUM change points, JL projection, KS test
# ---------------------------------------------------------------------------


@_q(
    "events_cusum_changepoint",
    """
    WITH daily AS (SELECT date_trunc('day', ts) AS d, sum(value) AS v
                   FROM events GROUP BY 1),
    st AS (SELECT avg(v) AS mu, stddev_samp(v) AS sigma FROM daily),
    z AS (SELECT d, v, (v - mu) / sigma AS z FROM daily, st),
    p AS (SELECT d, v, z,
            sum(z - 0.5) OVER w AS pp,
            sum(-z - 0.5) OVER w AS pn
          FROM z WINDOW w AS (ORDER BY d ROWS UNBOUNDED PRECEDING)),
    s AS (SELECT d, v, z,
            pp - least(min(pp) OVER w, 0) AS sp,
            pn - least(min(pn) OVER w, 0) AS sn
          FROM p WINDOW w AS (ORDER BY d ROWS UNBOUNDED PRECEDING))
    SELECT d, round(v, 6) AS daily_value, round(z, 4) AS zscore,
           round(sp, 4) AS cusum_pos, round(sn, 4) AS cusum_neg,
           (sp > 4.0 OR sn > 4.0) AS is_changepoint
    FROM s
    """,
)
def events_cusum_changepoint(spark, sf_dir):
    """CUSUM drift detection (Page 1954) on the daily event-value series:
    the recursion S_t = max(0, S_{t-1} + z_t - k) rewritten to its closed
    form P_t - min(P_0..P_t), so the whole detector is one day-grain
    rollup + two running windows — no iteration, no self-join; the
    ordered window runs on the bounded per-day series, never raw events.
    operators/timeseries.py:cusum_changepoints."""
    from boann_ocsf_security_data_platform_spark.operators.timeseries import (
        cusum_changepoints,
    )

    return cusum_changepoints(_t(spark, sf_dir, "events"))


def _jl_planes_sql(out_dim: int = 8, dim: int = 64) -> str:
    """DuckDB replica of operators.similarity.random_projection: the same
    md5-seeded unit hyperplanes inlined as literals, one
    list_dot_product per output coordinate."""
    from boann_ocsf_security_data_platform_spark.operators.similarity import (
        _hyperplanes,
    )

    cols = []
    for p, plane in enumerate(_hyperplanes(out_dim, dim)):
        arr = "[" + ", ".join(repr(x) for x in plane) + "]"
        cols.append(
            f"round(list_dot_product(CAST(embedding AS DOUBLE[]), {arr}), 6)"
            f" AS proj_{p}"
        )
    return ",\n           ".join(cols)


@_q(
    "embedding_random_projection",
    f"""
    SELECT vec_id, {_jl_planes_sql(8, 64)}
    FROM embeddings
    """,
)
def embedding_random_projection(spark, sf_dir):
    """Johnson-Lindenstrauss projection of the 64-d embeddings onto the 8
    deterministic md5-seeded hyperplanes (the LSH bucketer's planes,
    pre-sign-bit): the dimensionality-reduction front of the ANN stack —
    distances approximately preserved, downstream shuffles 8x narrower.
    Pure inlined-literal projection, no shuffle, scalar output columns.
    operators/similarity.py:random_projection."""
    from boann_ocsf_security_data_platform_spark.operators.similarity import (
        random_projection,
    )

    return random_projection(
        _t(spark, sf_dir, "embeddings"), out_dim=8, dim=64
    ).select("vec_id", *[f"proj_{p}" for p in range(8)])


@_q(
    "agg_ks_test",
    """
    WITH j AS (SELECT o.o_totalprice AS v, c.c_mktsegment AS g
               FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
               WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')),
    pv AS (SELECT v,
             count(*) FILTER (WHERE g = 'BUILDING') AS na,
             count(*) FILTER (WHERE g = 'MACHINERY') AS nb
           FROM j GROUP BY v),
    tot AS (SELECT sum(na) AS n_a, sum(nb) AS n_b FROM pv),
    stepped AS (SELECT sum(na) OVER w AS ca, sum(nb) OVER w AS cb
                FROM pv WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)),
    d AS (SELECT max(abs(ca / CAST(n_a AS DOUBLE) - cb / CAST(n_b AS DOUBLE)))
                   AS dd,
                 max(n_a) AS n_a, max(n_b) AS n_b
          FROM stepped, tot)
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           round(dd, 6) AS ks_stat,
           round(1.36 * sqrt((n_a + n_b) / CAST(n_a * n_b AS DOUBLE)), 6)
             AS critical_value,
           dd > 1.36 * sqrt((n_a + n_b) / CAST(n_a * n_b AS DOUBLE))
             AS reject_h0
    FROM d
    """,
)
def agg_ks_test(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov test comparing order-price
    distributions of the BUILDING vs MACHINERY customer segments — the
    binning-free member of the drift family (PSI/chi-square/JSD need
    bins; KS does not). One hash aggregate collapses rows to distinct
    values, then ECDFs are running sums over the ordered value table.
    operators/relational.py:ks_statistic."""
    from boann_ocsf_security_data_platform_spark.operators.relational import (
        ks_statistic,
    )

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("o_totalprice").alias("price"),
        F.col("c_mktsegment").alias("seg"),
    )
    return ks_statistic(j, "price", "seg", "BUILDING", "MACHINERY")


# ---------------------------------------------------------------------------
# Round-5 wave 29: WebDataset tar shard write -> read round-trip
# ---------------------------------------------------------------------------


@_q(
    "multimodal_webdataset_roundtrip",
    """
    WITH m AS (SELECT source AS grp, doc_id,
                      strlen(text) AS b,
                      lpad(CAST(doc_id AS VARCHAR), 8, '0') AS key
               FROM documents),
    off AS (SELECT grp, doc_id, b, key,
              coalesce(sum(b) OVER (PARTITION BY grp ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
            FROM m)
    SELECT grp AS shard_group, CAST((o // 65536) AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(sum(b) AS BIGINT) AS total_bytes,
           min(key) AS first_key, max(key) AS last_key
    FROM off GROUP BY 1, 2
    """,
)
def multimodal_webdataset_roundtrip(spark, sf_dir):
    """Full WebDataset interchange lifecycle, hash-verified: documents
    become (member, payload) samples, the deterministic prefix-sum shard
    assignment packs them into 64 KiB tar shards (executor-side stdlib
    tarfile writes), the written tars are read BACK through the
    codec-free 512-byte header walk, and the per-shard membership rollup
    must equal what the DuckDB oracle computes from the raw table alone
    — so the oracle cross-checks the writer AND the reader (any byte
    lost, misassigned, or renamed in the tar round-trip breaks the
    hash). Integer floor division on both sides (DuckDB's double->INT
    cast rounds; Spark's truncates — the wave-25 lesson).
    operators/multimodal.py:assign_shards,write_tar_shards,tar_members."""
    import os
    import shutil
    import tempfile

    from boann_ocsf_security_data_platform_spark.operators.multimodal import (
        assign_shards,
        tar_members,
        write_tar_shards,
    )

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    # deterministic per-(sf, shard) dir, rm'd before each write: repeated
    # sweeps reuse ONE path instead of littering /tmp per PID (see
    # _artifact_scope for the parallel-shard safety argument)
    out = os.path.join(
        tempfile.gettempdir(), f"boann_wds_{tag}_{_artifact_scope()}"
    )
    shutil.rmtree(out, ignore_errors=True)

    docs = _t(spark, sf_dir, "documents").select(
        F.col("source"),
        F.col("doc_id"),
        F.format_string("%08d.txt", F.col("doc_id")).alias("member_name"),
        F.encode("text", "utf-8").cast("binary").alias("payload"),
        F.octet_length("text").cast("long").alias("b"),
    )
    sharded = assign_shards(
        docs, size_col="b", group_col="source", id_col="doc_id",
        shard_bytes=1 << 16,
    )
    # force the executor-side writes; the manifest is kilobytes
    write_tar_shards(sharded, out, group_col="source").collect()

    back = (
        spark.read.format("binaryFile")
        .load(os.path.join(out, "*.tar"))
        .select(
            F.regexp_extract("path", r"([^/]+)-\d{5}\.tar$", 1).alias(
                "shard_group"
            ),
            F.regexp_extract("path", r"-(\d{5})\.tar$", 1)
            .cast("long")
            .alias("shard"),
            F.col("content").alias("tar_bytes"),
        )
    )
    members = tar_members(back, keep_cols=("shard_group", "shard"))
    return members.groupBy("shard_group", "shard").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum("member_size").alias("total_bytes"),
        F.min("sample_key").alias("first_key"),
        F.max("sample_key").alias("last_key"),
    )


# ---------------------------------------------------------------------------
# Round-5 wave 30: hashing-trick features, link prediction, approx quantiles
# ---------------------------------------------------------------------------

_H64_WORD = _H64.format(expr="w")


@_q(
    "text_hash_features",
    f"""
    WITH w AS (SELECT doc_id, unnest({_WORDS}) AS w FROM documents),
    h AS (SELECT doc_id, {_H64_WORD} % 8 AS b FROM w)
    SELECT d.doc_id,
           {", ".join(
               f"CAST(coalesce(sum(CASE WHEN b = {i} THEN 1 END), 0) AS BIGINT)"
               f" AS f_{i}" for i in range(8)
           )}
    FROM documents d LEFT JOIN h ON d.doc_id = h.doc_id
    GROUP BY d.doc_id
    """,
)
def text_hash_features(spark, sf_dir):
    """Hashing-trick bag-of-words featurization (fastText/VW recipe):
    fixed 8-bucket token-count vector per document with NO vocabulary
    table or fit step — the cheap text-embedding front for quality
    classifiers and dedup triage. Row-local array expressions only
    (tokenize, hash each token once, per-bucket filter+size); no
    shuffle, no UDF. operators/text.py:hash_feature_vector."""
    from boann_ocsf_security_data_platform_spark.operators.text import (
        hash_feature_vector,
    )

    return hash_feature_vector(_t(spark, sf_dir, "documents"), n_buckets=8)


@_q(
    "graph_link_prediction",
    """
    WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                FROM lineitem WHERE year(l_shipdate) = 1995),
    ec AS (SELECT a.pk AS u, b.pk AS v FROM li a
           JOIN li b ON a.ok = b.ok AND a.pk < b.pk
           GROUP BY a.pk, b.pk),
    e2 AS (SELECT u AS a, v AS b FROM ec UNION SELECT v, u FROM ec),
    deg AS (SELECT a AS n, count(*) AS d FROM e2 GROUP BY a),
    wedge AS (SELECT x.a AS ua, y.a AS ub, count(*) AS n_common
              FROM e2 x JOIN e2 y ON x.b = y.b AND x.a < y.a
              GROUP BY x.a, y.a),
    cand AS (SELECT w.* FROM wedge w
             WHERE NOT EXISTS (SELECT 1 FROM e2
                               WHERE e2.a = w.ua AND e2.b = w.ub)),
    scored AS (SELECT ua, ub, n_common,
                 round(n_common / CAST(da.d + db.d - n_common AS DOUBLE), 6)
                   AS jaccard
               FROM cand JOIN deg da ON da.n = ua JOIN deg db ON db.n = ub)
    SELECT ua, ub, CAST(n_common AS BIGINT) AS n_common, jaccard
    FROM scored ORDER BY jaccard DESC, ua, ub LIMIT 50
    """,
)
def graph_link_prediction(spark, sf_dir):
    """Neighborhood-Jaccard link prediction (Liben-Nowell & Kleinberg
    2003) on the 1995 part-co-order graph: top 50 NON-adjacent part
    pairs ranked by shared-neighbor Jaccard — the recommender/entity-
    resolution primitive. Work is the wedge bound (sum deg^2) via the
    triangle-count join shape, never |V|^2.
    operators/graph.py:jaccard_link_prediction."""
    from boann_ocsf_security_data_platform_spark.operators.dedup import (
        release_caches,
    )
    from boann_ocsf_security_data_platform_spark.operators.graph import (
        jaccard_link_prediction,
    )

    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.year("l_shipdate") == 1995)
        .select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
        )
        .distinct()
    )
    edges = (
        li.alias("x")
        .join(li.alias("y"), F.col("x.ok") == F.col("y.ok"))
        .filter(F.col("x.pk") < F.col("y.pk"))
        .select(F.col("x.pk").alias("a"), F.col("y.pk").alias("b"))
        .distinct()
    )
    scored = jaccard_link_prediction(
        edges, k=50, pin_shuffle_join=_gates.pin_shuffle_join_fact(_table_count(spark, sf_dir, "lineitem"))
    )
    out = scored.localCheckpoint(eager=True)  # materialize, then free caches
    release_caches(scored)
    return out


@_q("agg_approx_percentiles")
def agg_approx_percentiles(spark, sf_dir):
    """Mergeable approximate quantiles (Spark's Greenwald–Khanna-style
    percentile_approx sketch) over lineitem prices — approximate by
    design, no SQL oracle (DuckDB's approx_quantile uses a different
    sketch); the rank-error invariant vs exact percentiles is pinned in
    tests/test_round5_ops.py::test_approx_percentiles_rank_error."""
    l = _t(spark, sf_dir, "lineitem")
    return l.agg(
        *[
            F.round(
                F.percentile_approx("l_extendedprice", p, 10000), 2
            ).alias(f"p{int(p * 100)}")
            for p in (0.25, 0.5, 0.75, 0.95, 0.99)
        ]
    )


# ---------------------------------------------------------------------------
# Round-5 wave 31: conversion latency, Mann-Whitney rank-sum test
# ---------------------------------------------------------------------------


@_q(
    "events_time_to_convert",
    """
    WITH s AS (SELECT user_id, min(ts) AS t0 FROM events
               WHERE event_type = 'signup' GROUP BY user_id),
    p AS (SELECT user_id, min(ts) AS t1 FROM events
          WHERE event_type = 'purchase' GROUP BY user_id),
    d AS (SELECT s.user_id,
                 date_diff('microsecond', s.t0, p.t1) / 1000000.0 AS dt
          FROM s JOIN p ON s.user_id = p.user_id AND p.t1 >= s.t0)
    SELECT CAST(count(*) AS BIGINT) AS n_converted,
           round(quantile_cont(dt, 0.5), 3) AS median_seconds,
           round(quantile_cont(dt, 0.9), 3) AS p90_seconds,
           round(avg(dt), 3) AS mean_seconds
    FROM d
    """,
)
def events_time_to_convert(spark, sf_dir):
    """Conversion-latency distribution: per user, seconds from FIRST
    signup to FIRST subsequent purchase; report converted-user count and
    median/p90/mean latency — the funnel-depth companion to
    events_funnel (which counts WHO converts; this measures HOW FAST).
    Two per-user min-aggregates (map-side combined) + one equi-join +
    one bounded exact-percentile aggregate; microsecond-exact interval
    arithmetic, NTZ-safe. Spark's exact `percentile` and DuckDB's
    quantile_cont share the same linear-interpolation definition."""
    # ONE events scan: the signup/purchase first-times are conditional
    # mins in the same per-user aggregate (a filtered-split + join would
    # read events twice); the inner join's semantics survive as the
    # both-not-null filter
    e = _t(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "t0"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t1"
        ),
    )
    d = per_user.filter(
        F.col("t0").isNotNull()
        & F.col("t1").isNotNull()
        & (F.col("t1") >= F.col("t0"))
    ).select(
        (
            F.expr("timestampdiff(MICROSECOND, t0, t1)").cast("double")
            / F.lit(1_000_000.0)
        ).alias("dt")
    )
    return d.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.expr("percentile(dt, 0.5)"), 3).alias("median_seconds"),
        F.round(F.expr("percentile(dt, 0.9)"), 3).alias("p90_seconds"),
        F.round(F.avg("dt"), 3).alias("mean_seconds"),
    )


@_q(
    "agg_mann_whitney_u",
    """
    WITH j AS (SELECT o.o_totalprice AS v,
                      (c.c_mktsegment = 'BUILDING') AS is_a
               FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
               WHERE c.c_mktsegment IN ('BUILDING', 'AUTOMOBILE')),
    r AS (SELECT is_a, v,
                 rank() OVER (ORDER BY v) AS rk,
                 count(*) OVER (PARTITION BY v) AS tie_n
          FROM j),
    -- average rank for ties: rank() gives the lower bound; add (n-1)/2
    a AS (SELECT is_a, rk + (tie_n - 1) / 2.0 AS arank, tie_n FROM r),
    st AS (SELECT
             sum(CASE WHEN is_a THEN arank END) AS r_a,
             sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS n_a,
             sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS n_b,
             count(*) AS n
           FROM a),
    ties AS (SELECT coalesce(sum(tn * (tn * tn - 1)), 0) AS tie_term
             FROM (SELECT count(*) AS tn FROM j GROUP BY v HAVING count(*) > 1)),
    u AS (SELECT n_a, n_b,
                 r_a - n_a * (n_a + 1) / 2.0 AS u_a,
                 n_a * CAST(n_b AS DOUBLE) / 2.0 AS mu,
                 sqrt((n_a * CAST(n_b AS DOUBLE) / 12.0)
                      * ((n + 1) - tie_term / (CAST(n AS DOUBLE) * (n - 1))))
                   AS sigma
          FROM st, ties)
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           round(u_a, 2) AS u_stat,
           round((u_a - mu) / sigma, 4) AS zscore,
           abs((u_a - mu) / sigma) > 1.96 AS reject_h0
    FROM u
    """,
)
def agg_mann_whitney_u(spark, sf_dir):
    """Mann-Whitney U rank-sum test (normal approximation with tie
    correction) comparing order prices between the BUILDING and
    AUTOMOBILE segments — the nonparametric medians-differ companion to
    Welch's t (means) and KS (whole distribution). Ranks are one global
    ordered window over the joined fact (average-rank tie handling via
    rank() + (ties-1)/2 — identical arithmetic both engines); everything
    after is scalar aggregates of exact integers, so the statistic is
    reproducible to the rounding."""
    # Distinct-value formulation (the KS-test shape): collapse the
    # joined fact to per-distinct-value group counts FIRST (one hash
    # aggregate — the only pass over the data), then the average rank of
    # value v is cum_count(<v) + (ties+1)/2, computed with one ordered
    # window over the BOUNDED distinct-value table. Identical arithmetic
    # to row-level average ranks, but no global row-level sort — the
    # oracle SQL deliberately keeps the textbook row-rank formulation,
    # so the hash match is a cross-derivation proof, not an echo.
    o = _t(spark, sf_dir, "orders")
    # measured-count sort-merge pin — same estimate-driven-broadcast
    # hazard as agg_kruskal_wallis (see comment there)
    pin = _gates.pin_shuffle_join_fact(_table_count(spark, sf_dir, "orders"))
    c = _pin(_t(spark, sf_dir, "customer"), pin)
    pv = (
        o.join(c, o.o_custkey == c.c_custkey)
        .filter(F.col("c_mktsegment").isin(["BUILDING", "AUTOMOBILE"]))
        .select(
            F.col("o_totalprice").alias("v"),
            (F.col("c_mktsegment") == "BUILDING").alias("is_a"),
        )
        .groupBy("v")
        .agg(
            F.sum(F.when(F.col("is_a"), 1).otherwise(0)).alias("na"),
            F.sum(F.when(~F.col("is_a"), 1).otherwise(0)).alias("nb"),
        )
    )
    # bucket-parallel exclusive cum-count (round 11, ADVICE r10 #1);
    # integer sums, so bit-exact vs the single global window
    pv = _cum_before(
        pv.withColumn("tn", F.col("na") + F.col("nb")), "v", "tn", "_cb"
    )
    arank = F.col("_cb") + (F.col("tn") + 1) / F.lit(2.0)
    st = pv.select(
        "na", "nb", "tn", arank.alias("arank")
    ).agg(
        F.sum(F.col("na") * F.col("arank")).alias("r_a"),
        F.sum("na").alias("n_a"),
        F.sum("nb").alias("n_b"),
        F.sum("tn").alias("n"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("tn") > 1,
                    F.col("tn") * (F.col("tn") * F.col("tn") - 1),
                )
            ),
            F.lit(0),
        ).alias("tie_term"),
    )
    u_a = F.col("r_a") - F.col("n_a") * (F.col("n_a") + 1) / F.lit(2.0)
    mu = F.col("n_a") * F.col("n_b").cast("double") / F.lit(2.0)
    sigma = F.sqrt(
        (F.col("n_a") * F.col("n_b").cast("double") / F.lit(12.0))
        * (
            (F.col("n") + 1)
            - F.col("tie_term")
            / (F.col("n").cast("double") * (F.col("n") - 1))
        )
    )
    z = (u_a - mu) / sigma
    return st.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(u_a, 2).alias("u_stat"),
        F.round(z, 4).alias("zscore"),
        (F.abs(z) > F.lit(1.96)).alias("reject_h0"),
    )


# ---------------------------------------------------------------------------
# Round-5 wave 32: Benford audit, LOO target encoding, Kaplan-Meier
# ---------------------------------------------------------------------------


@_q(
    "agg_benford_deviation",
    """
    WITH cents AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c
                   FROM orders WHERE o_totalprice > 0),
    d AS (SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INT) AS digit
          FROM cents),
    obs AS (SELECT digit, count(*) AS n_obs FROM d GROUP BY digit),
    tot AS (SELECT sum(n_obs) AS n FROM obs)
    SELECT digit, CAST(n_obs AS BIGINT) AS n_obs,
           round(n_obs / CAST(n AS DOUBLE), 6) AS obs_share,
           round(log10(1 + 1.0 / digit), 6) AS benford_share,
           round(n_obs / CAST(n AS DOUBLE) - log10(1 + 1.0 / digit), 6)
             AS deviation
    FROM obs, tot ORDER BY digit
    """,
)
def agg_benford_deviation(spark, sf_dir):
    """Benford's-law first-digit audit over order totals — the classic
    fraud/data-fabrication screen: observed first-digit shares vs the
    log10(1+1/d) law. The first digit comes from the INTEGER-CENTS
    string, never floor(log10(v)) — a price sitting one ulp below a
    power of ten would flip floor(log10) between engines, while
    round(v*100) is unambiguous for 2-decimal money. One hash aggregate
    to 9 rows + a broadcast total."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    d = o.select(
        F.substring(
            F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
            1,
            1,
        )
        .cast("int")
        .alias("digit")
    )
    obs = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n_obs"))
    wall = Window.orderBy("digit").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    n = F.sum("n_obs").over(wall)
    benford = F.log10(1 + 1.0 / F.col("digit"))
    return obs.select(
        "digit",
        "n_obs",
        F.round(F.col("n_obs") / n, 6).alias("obs_share"),
        F.round(benford, 6).alias("benford_share"),
        F.round(F.col("n_obs") / n - benford, 6).alias("deviation"),
    ).orderBy("digit")


@_q(
    "feature_loo_target_encoding",
    """
    WITH j AS (SELECT o.o_orderkey AS k, o.o_totalprice AS y,
                      c.c_mktsegment AS seg
               FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
    seg_stats AS (SELECT seg, count(*) AS n, sum(y) AS s FROM j GROUP BY seg),
    g AS (SELECT avg(y) AS prior FROM j)
    SELECT j.k AS o_orderkey,
           round((ss.s - j.y + g.prior * 10) / (ss.n - 1 + 10), 4)
             AS seg_price_loo
    FROM j JOIN seg_stats ss ON j.seg = ss.seg, g
    """,
)
def feature_loo_target_encoding(spark, sf_dir):
    """Leave-one-out target encoding with additive smoothing (m=10
    toward the global prior) — the categorical-feature encoder that
    avoids self-leakage: each order's segment encoding excludes its OWN
    target. One per-segment aggregate (bounded model, broadcast back) +
    a one-row global prior; the encode itself is a projection. The
    training-pipeline feature-engineering shape: no row explodes, no
    self-join."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    # customer SCALES with the corpus but its pruned scan estimates tiny
    # (replicated text compresses ~100:1) — left to estimates Catalyst
    # broadcast-built 15M rows at sf100 and OOM'd. Measured-count pin.
    c = _pin(
        c, _gates.pin_shuffle_join_dim(_table_count(spark, sf_dir, "customer"))
    )
    j = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("o_orderkey"),
        F.col("o_totalprice").alias("y"),
        F.col("c_mktsegment").alias("seg"),
    )
    seg_stats = j.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("s")
    )
    prior = j.agg(F.avg("y").alias("prior"))
    enc = (F.col("s") - F.col("y") + F.col("prior") * 10) / (
        F.col("n") - 1 + 10
    )
    return (
        j.join(F.broadcast(seg_stats), "seg")
        .join(F.broadcast(prior))
        .select("o_orderkey", F.round(enc, 4).alias("seg_price_loo"))
    )


@_q(
    "events_kaplan_meier",
    """
    WITH s AS (SELECT user_id, min(ts) AS t0 FROM events
               WHERE event_type = 'signup' GROUP BY user_id),
    p AS (SELECT user_id, min(ts) AS t1 FROM events
          WHERE event_type = 'purchase' GROUP BY user_id),
    horizon AS (SELECT max(ts) AS tmax FROM events),
    subj AS (SELECT s.user_id,
               CASE WHEN p.t1 IS NOT NULL AND p.t1 >= s.t0 THEN
                 date_diff('microsecond', s.t0, p.t1) / 1000000.0
               ELSE date_diff('microsecond', s.t0, h.tmax) / 1000000.0 END
                 AS dur,
               (p.t1 IS NOT NULL AND p.t1 >= s.t0) AS converted
             FROM s LEFT JOIN p ON s.user_id = p.user_id, horizon h),
    et AS (SELECT dur AS t, count(*) AS d FROM subj
           WHERE converted GROUP BY dur),
    risk AS (SELECT et.t, et.d,
               (SELECT count(*) FROM subj WHERE subj.dur >= et.t) AS n_risk
             FROM et)
    SELECT round(t, 3) AS t_seconds, CAST(d AS BIGINT) AS n_events,
           CAST(n_risk AS BIGINT) AS n_risk,
           round(exp(sum(ln(1 - d / CAST(n_risk AS DOUBLE)))
                     OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)), 4)
             AS survival
    FROM risk ORDER BY t
    """,
)
def events_kaplan_meier(spark, sf_dir):
    """Kaplan-Meier survival curve for signup→purchase conversion with
    right-censoring (users who never purchase are censored at the
    observation horizon) — the time-to-event estimator behind churn and
    incident-MTTR analytics, which naive mean latencies get WRONG when
    many subjects are censored. S(t) = Π (1 − d_i/n_i) over event
    times; at-risk counts come from one descending-cumulative window
    over the duration-grain rollup (not a per-time correlated scan),
    and the running product is exp·Σln over the bounded event-time
    table. Two joins total, all aggregates map-side combinable."""
    # ONE events scan: per-user conditional mins AND the per-user max
    # in the same aggregate; the global horizon is then an empty-frame
    # window over the bounded per-user table (no second scan of events)
    e = _t(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "t0"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t1"
        ),
        F.max("ts").alias("_tmax_u"),
    )
    whor = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    conv = F.col("t1").isNotNull() & (F.col("t1") >= F.col("t0"))
    subj = (
        per_user.withColumn("tmax", F.max("_tmax_u").over(whor))
        .filter(F.col("t0").isNotNull())
        .select(
            F.when(
                conv,
                F.expr("timestampdiff(MICROSECOND, t0, t1)").cast("double")
                / 1_000_000.0,
            )
            .otherwise(
                F.expr("timestampdiff(MICROSECOND, t0, tmax)").cast("double")
                / 1_000_000.0
            )
            .alias("dur"),
            conv.alias("converted"),
        )
    )
    # duration-grain rollup: events (d) and total subjects (a) per dur;
    # n_risk(t) = Σ over durs >= t of a  — one descending running sum
    per_dur = subj.groupBy("dur").agg(
        F.sum(F.when(F.col("converted"), 1).otherwise(0)).alias("d"),
        F.count(F.lit(1)).alias("a"),
    )
    wdesc = Window.orderBy(F.desc("dur")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = per_dur.withColumn("n_risk", F.sum("a").over(wdesc)).filter(
        F.col("d") > 0
    )
    wasc = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    surv = F.exp(
        F.sum(F.log(1 - F.col("d") / F.col("n_risk").cast("double"))).over(
            wasc
        )
    )
    return risk.select(
        F.round("dur", 3).alias("t_seconds"),
        F.col("d").cast("long").alias("n_events"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.round(surv, 4).alias("survival"),
    ).orderBy("t_seconds")


# ---------------------------------------------------------------------------
# Round-5 wave 33: nearest-direction as-of join
# ---------------------------------------------------------------------------


@_q(
    "asof_join_nearest",
    """
    WITH l AS (SELECT user_id, event_id, ts FROM events
               WHERE event_type = 'purchase'),
    r AS (SELECT user_id, event_id AS r_event_id, ts AS r_ts FROM events
          WHERE event_type = 'error'),
    ranked AS (SELECT l.user_id, l.event_id, r.r_event_id,
                 row_number() OVER (
                   PARTITION BY l.user_id, l.event_id
                   ORDER BY abs(date_diff('microsecond', l.ts, r.r_ts)),
                            r.r_ts, r.r_event_id) AS rn
               FROM l LEFT JOIN r ON l.user_id = r.user_id)
    SELECT user_id, event_id, r_event_id AS nearest_error_event
    FROM ranked WHERE rn = 1
    """,
)
def asof_join_nearest(spark, sf_dir):
    """Nearest-direction as-of join: for each purchase, the SAME user's
    error event closest in time (either side; ties to the earlier
    error, pinned — engines disagree on nearest-tie conventions) — the
    incident-correlation join ("which error is this purchase nearest
    to?") that backward/forward as-of cannot express. Declarative
    range-join + rank-1 composition; microsecond-exact NTZ-safe
    interval arithmetic. operators/relational.py:asof_join
    (direction='nearest')."""
    from boann_ocsf_security_data_platform_spark.operators.relational import (
        asof_join,
    )

    e = _t(spark, sf_dir, "events")
    l = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    r = e.filter(F.col("event_type") == "error").select(
        "user_id", "event_id", "ts"
    )
    return asof_join(
        l, r, on="user_id", left_time="ts", right_time="ts",
        direction="nearest", right_tiebreak="event_id",
    ).select(
        "user_id",
        "event_id",
        F.col("r_event_id").alias("nearest_error_event"),
    )


# ---------------------------------------------------------------------------
# Round-5 wave 34: span-corruption masks, interval merge/coverage
# ---------------------------------------------------------------------------

_H64_POS = _H64.format(expr="concat('mask0:', CAST(doc_id AS VARCHAR), ':', CAST(i AS VARCHAR))")


@_q(
    "text_span_corruption_stats",
    f"""
    WITH w AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
    pos AS (SELECT doc_id, i, ({_H64_POS} % 100) < 15 AS masked
            FROM w, unnest(range(1, len(ws) + 1)) t(i)),
    runs AS (SELECT doc_id,
               count(*) FILTER (WHERE masked) AS n_masked,
               count(*) FILTER (WHERE masked AND NOT coalesce(prev, FALSE))
                 AS n_spans
             FROM (SELECT doc_id, masked,
                     lag(masked) OVER (PARTITION BY doc_id ORDER BY i) AS prev
                   FROM pos)
             GROUP BY doc_id)
    SELECT w.doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
           CAST(coalesce(r.n_masked, 0) AS BIGINT) AS n_masked,
           CAST(coalesce(r.n_spans, 0) AS BIGINT) AS n_spans
    FROM w LEFT JOIN runs r ON w.doc_id = r.doc_id
    """,
)
def text_span_corruption_stats(spark, sf_dir):
    """T5-style span-corruption mask planning (Raffel et al. 2020):
    deterministically mask ~15% of token positions per document
    (portable hash of (doc_id, position) — reproducible across engines,
    epochs keyed by the seed string) and report tokens/masked/spans per
    doc, where a span is a maximal run of masked positions — the
    denoising-objective preprocessing step of an LLM data pipeline.
    Entirely row-local array expressions (mask array via transform,
    span starts via zip_with against the shifted mask); no explode, no
    shuffle beyond the scan. The oracle takes the EXPLODED route
    (unnest + lag window) — a cross-derivation hash match."""
    from boann_ocsf_security_data_platform_spark.functions.hash_fns import (
        hash64,
    )
    from boann_ocsf_security_data_platform_spark.operators.text import tokens

    ws = tokens(F.col("text"))
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", ws.alias("ws")
    )
    # sequence(1, 0) yields the DESCENDING array [1, 0], not [] — an
    # empty-token doc would get 2 phantom positions and diverge from the
    # oracle's range(1, len+1) (empty). Guard: empty docs get an empty mask.
    positions = F.when(
        F.size("ws") > 0, F.sequence(F.lit(1), F.size("ws"))
    ).otherwise(F.array().cast("array<int>"))
    mask = F.transform(
        positions,
        lambda i: (
            hash64(
                F.concat(
                    F.lit("mask0:"),
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    i.cast("string"),
                )
            )
            % 100
        )
        < 15,
    )
    d = d.select("doc_id", F.size("ws").alias("n_tokens"), mask.alias("m"))
    n_masked = F.size(F.filter(F.col("m"), lambda x: x))
    # span starts: masked AND (first position OR previous unmasked)
    shifted = F.concat(F.array(F.lit(False)), F.slice(F.col("m"), 1, F.greatest(F.size("m") - 1, F.lit(0))))
    starts = F.zip_with(
        F.col("m"), shifted, lambda cur, prev: cur & ~prev
    )
    n_spans = F.size(F.filter(starts, lambda x: x))
    return d.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        n_masked.cast("long").alias("n_masked"),
        n_spans.cast("long").alias("n_spans"),
    )


@_q(
    "range_merge_intervals",
    """
    WITH iv AS (SELECT l.l_suppkey AS k, o.o_orderdate AS s,
                       l.l_shipdate AS e
                FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
                WHERE l.l_shipdate > o.o_orderdate AND l.l_suppkey <= 20),
    marked AS (SELECT k, s, e,
                 CASE WHEN s > coalesce(max(e) OVER (
                     PARTITION BY k ORDER BY s, e
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     DATE '1000-01-01')
                 THEN 1 ELSE 0 END AS new_island
               FROM iv),
    islands AS (SELECT k, s, e,
                  sum(new_island) OVER (PARTITION BY k ORDER BY s, e
                    ROWS UNBOUNDED PRECEDING) AS island
                FROM marked),
    merged AS (SELECT k, island, min(s) AS ms, max(e) AS me
               FROM islands GROUP BY k, island)
    SELECT k AS suppkey, CAST(count(*) AS BIGINT) AS n_intervals,
           CAST(sum(date_diff('day', ms, me)) AS BIGINT) AS covered_days,
           min(ms) AS first_start, max(me) AS last_end
    FROM merged GROUP BY k
    """,
)
def range_merge_intervals(spark, sf_dir):
    """Merge overlapping [order, ship) intervals per supplier and report
    merged-interval count + covered days — THE interval-coalescing
    primitive (uptime/downtime windows, coverage gaps, concurrent-load
    spans). Classic gaps-and-islands: an interval starts a new island
    iff its start exceeds the running max of previous ends (one ordered
    window per key), islands collapse with one aggregate. Suppliers
    capped to 20 keys keeps the demo output bounded; the plan is
    per-key windows + aggregates — one shuffle on the key, any key
    count."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    iv = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(
            (F.col("l_shipdate") > F.col("o_orderdate"))
            & (F.col("l_suppkey") <= 20)
        )
        .select(
            F.col("l_suppkey").alias("k"),
            F.col("o_orderdate").alias("s"),
            F.col("l_shipdate").alias("e"),
        )
    )
    wprev = (
        Window.partitionBy("k")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wrun = (
        Window.partitionBy("k")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = iv.withColumn(
        "new_island",
        F.when(
            F.col("s")
            > F.coalesce(
                F.max("e").over(wprev), F.lit("1000-01-01").cast("date")
            ),
            1,
        ).otherwise(0),
    )
    islands = marked.withColumn("island", F.sum("new_island").over(wrun))
    merged = islands.groupBy("k", "island").agg(
        F.min("s").alias("ms"), F.max("e").alias("me")
    )
    return merged.groupBy(F.col("k").alias("suppkey")).agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum(F.datediff("me", "ms")).cast("long").alias("covered_days"),
        F.min("ms").alias("first_start"),
        F.max("me").alias("last_end"),
    )


# ---------------------------------------------------------------------------
# Round-5 wave 35: trainable quality classifier (logistic regression by GD)
# ---------------------------------------------------------------------------


@_q(
    "corpus_quality_logreg",
    """
    WITH t AS (SELECT source, text,
                 list_filter(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '), w -> w <> '') AS ws
               FROM documents),
    feat AS (
      SELECT round(least(len(ws) / 100.0, 1.0), 6) AS x1,
             round(CASE WHEN len(ws) > 0 THEN
               CAST(len(list_filter(ws, w -> list_contains(['the', 'a', 'of', 'and', 'to', 'in', 'is', 'that', 'it', 'for', 'this', 'with', 'as', 'on', 'be', 'are'], w))) AS DOUBLE) / len(ws)
               ELSE 0 END, 6) AS x2,
             round(CASE WHEN len(ws) > 0 THEN
               CAST(length(text) AS DOUBLE) / len(ws) / 10.0 ELSE 0 END, 6)
               AS x3,
             round(CASE WHEN length(text) > 0 THEN
               CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
               / length(text) ELSE 0 END, 6) AS x4,
             CASE WHEN source = 'src0' THEN 1.0 ELSE 0.0 END AS y
      FROM t),
    w0 AS (SELECT 0.0 AS b0, 0.0 AS b1, 0.0 AS b2, 0.0 AS b3, 0.0 AS b4),
    g1 AS (
      SELECT avg(p - y) AS g0, avg((p - y) * x1) AS g1,
             avg((p - y) * x2) AS g2, avg((p - y) * x3) AS g3,
             avg((p - y) * x4) AS g4
      FROM (SELECT y, x1, x2, x3, x4,
              1.0 / (1.0 + exp(-(w.b0 + w.b1 * x1 + w.b2 * x2
                                 + w.b3 * x3 + w.b4 * x4))) AS p
            FROM feat, w0 w)),
    w1 AS (
      SELECT round(w.b0 - g.g0, 8) AS b0, round(w.b1 - g.g1, 8) AS b1,
             round(w.b2 - g.g2, 8) AS b2, round(w.b3 - g.g3, 8) AS b3,
             round(w.b4 - g.g4, 8) AS b4
      FROM w0 w, g1 g),
    g2 AS (
      SELECT avg(p - y) AS g0, avg((p - y) * x1) AS g1,
             avg((p - y) * x2) AS g2, avg((p - y) * x3) AS g3,
             avg((p - y) * x4) AS g4
      FROM (SELECT y, x1, x2, x3, x4,
              1.0 / (1.0 + exp(-(w.b0 + w.b1 * x1 + w.b2 * x2
                                 + w.b3 * x3 + w.b4 * x4))) AS p
            FROM feat, w1 w)),
    w2 AS (
      SELECT round(w.b0 - g.g0, 8) AS b0, round(w.b1 - g.g1, 8) AS b1,
             round(w.b2 - g.g2, 8) AS b2, round(w.b3 - g.g3, 8) AS b3,
             round(w.b4 - g.g4, 8) AS b4
      FROM w1 w, g2 g),
    g3 AS (
      SELECT avg(p - y) AS g0, avg((p - y) * x1) AS g1,
             avg((p - y) * x2) AS g2, avg((p - y) * x3) AS g3,
             avg((p - y) * x4) AS g4
      FROM (SELECT y, x1, x2, x3, x4,
              1.0 / (1.0 + exp(-(w.b0 + w.b1 * x1 + w.b2 * x2
                                 + w.b3 * x3 + w.b4 * x4))) AS p
            FROM feat, w2 w)),
    w3 AS (
      SELECT round(w.b0 - g.g0, 8) AS b0, round(w.b1 - g.g1, 8) AS b1,
             round(w.b2 - g.g2, 8) AS b2, round(w.b3 - g.g3, 8) AS b3,
             round(w.b4 - g.g4, 8) AS b4
      FROM w2 w, g3 g)
    SELECT round(w.b0, 6) AS w_bias, round(w.b1, 6) AS w_len,
           round(w.b2, 6) AS w_stop, round(w.b3, 6) AS w_mwl,
           round(w.b4, 6) AS w_digit,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(CASE WHEN (1.0 / (1.0 + exp(-(w.b0 + w.b1 * x1
                  + w.b2 * x2 + w.b3 * x3 + w.b4 * x4))) >= 0.5)
                  = (y = 1.0) THEN 1.0 ELSE 0.0 END), 6) AS train_accuracy
    FROM feat, w3 w
    GROUP BY w.b0, w.b1, w.b2, w.b3, w.b4
    """,
)
def corpus_quality_logreg(spark, sf_dir):
    """TRAIN a logistic-regression quality classifier with batch gradient
    descent, hash-verified end-to-end: 4 quality features (capped token
    count, stopword ratio, scaled mean word length, digit ratio — each
    quantized to 6 decimals BEFORE training so both engines descend on
    identical inputs) + bias, 3 full-batch GD steps from w=0 at lr=1,
    labels = source heuristic; output = the trained weights + training
    accuracy. The per-step weight rounding (8 decimals) quantizes the
    model between iterations — the same ULP-drift kill the PageRank
    entry uses — so the whole training trajectory is engine-portable and
    the DuckDB oracle replays it as chained CTEs. Each GD step is ONE
    map-side-combinable aggregate over the feature frame (a bounded
    5-float model round-trips through the driver, never data) — the
    quality-classifier training loop of a CCNet/GPT-style curation
    pipeline in pure DataFrame ops."""
    import math

    from boann_ocsf_security_data_platform_spark.operators.text import (
        STOPWORDS_EN,
        tokens,
    )

    t = _t(spark, sf_dir, "documents")
    ws = tokens(F.col("text"))
    n_tok = F.size(ws)
    sr = F.when(
        n_tok > 0,
        F.size(F.filter(ws, lambda w: w.isin(*STOPWORDS_EN)))
        .cast("double")
        / n_tok,
    ).otherwise(F.lit(0.0))
    mwl = F.when(
        n_tok > 0, F.length("text").cast("double") / n_tok / 10.0
    ).otherwise(F.lit(0.0))
    dr = F.when(
        F.length("text") > 0,
        F.length(F.regexp_replace("text", r"[^0-9]", "")).cast("double")
        / F.length("text"),
    ).otherwise(F.lit(0.0))
    feat = t.select(
        F.round(F.least(n_tok / 100.0, F.lit(1.0)), 6).alias("x1"),
        F.round(sr, 6).alias("x2"),
        F.round(mwl, 6).alias("x3"),
        F.round(dr, 6).alias("x4"),
        F.when(F.col("source") == "src0", 1.0).otherwise(0.0).alias("y"),
    ).localCheckpoint(eager=True)  # 3 GD scans + accuracy reuse one pass

    w = [0.0, 0.0, 0.0, 0.0, 0.0]
    for _ in range(3):
        z = (
            F.lit(w[0])
            + F.lit(w[1]) * F.col("x1")
            + F.lit(w[2]) * F.col("x2")
            + F.lit(w[3]) * F.col("x3")
            + F.lit(w[4]) * F.col("x4")
        )
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        r = feat.agg(
            F.avg(p - F.col("y")).alias("g0"),
            F.avg((p - F.col("y")) * F.col("x1")).alias("g1"),
            F.avg((p - F.col("y")) * F.col("x2")).alias("g2"),
            F.avg((p - F.col("y")) * F.col("x3")).alias("g3"),
            F.avg((p - F.col("y")) * F.col("x4")).alias("g4"),
        ).collect()[0]  # bounded: the 5-float model step, not data
        w = [round(w[j] - r[f"g{j}"], 8) for j in range(5)]

    z = (
        F.lit(w[0])
        + F.lit(w[1]) * F.col("x1")
        + F.lit(w[2]) * F.col("x2")
        + F.lit(w[3]) * F.col("x3")
        + F.lit(w[4]) * F.col("x4")
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return feat.agg(
        F.round(F.lit(w[0]), 6).alias("w_bias"),
        F.round(F.lit(w[1]), 6).alias("w_len"),
        F.round(F.lit(w[2]), 6).alias("w_stop"),
        F.round(F.lit(w[3]), 6).alias("w_mwl"),
        F.round(F.lit(w[4]), 6).alias("w_digit"),
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            F.avg(
                F.when((p >= 0.5) == (F.col("y") == 1.0), 1.0).otherwise(0.0)
            ),
            6,
        ).alias("train_accuracy"),
    )


# ---------------------------------------------------------------------------
# Round-5 wave 36: WAV container synthesis -> REAL parser round-trip
# ---------------------------------------------------------------------------


def _le_bytes(n, width_hex: int):
    """Little-endian byte string of an int column via hex/unhex — Spark
    has no int->LE-binary builtin; pairs of the zero-padded hex string
    reversed ARE the LE byte order."""
    h = F.lpad(F.hex(n), width_hex, "0")
    pairs = [
        F.substring(h, i, 2) for i in range(width_hex - 1, 0, -2)
    ]
    return F.unhex(F.concat(*pairs))


@_q(
    "multimodal_wav_meta_roundtrip",
    """
    SELECT doc_id, 'wav-pcm' AS format, CAST(1 AS INT) AS n_channels,
           CAST(8000 AS INT) AS sample_rate_hz, CAST(16 AS INT) AS bits_per_sample,
           CAST((strlen(text) - strlen(text) % 2) // 2 AS BIGINT) AS n_frames,
           CAST(((strlen(text) - strlen(text) % 2) // 2 * 1000) // 8000
             AS BIGINT) AS duration_ms
    FROM documents
    """,
)
def multimodal_wav_meta_roundtrip(spark, sf_dir):
    """Synthesize a VALID RIFF/WAVE container per document in pure Column
    expressions (constant mono/8 kHz/16-bit fmt chunk; variable-length
    fields little-endian via hex/unhex; payload = the text bytes as PCM
    frames) and push it through the REAL chunk-walk parser
    (operators/multimodal.py:sniff_audio_meta) — so the byte-level audio
    parsing that was previously unit-tested-only is now HASH-VERIFIED:
    the oracle computes the expected channels/rate/bits/frame-count/
    duration directly from the text length, and any drift in either the
    synthesizer or the parser breaks the match. Synthesis is a row-local
    projection; parsing is the Arrow mapInPandas stage production uses."""
    import struct

    from boann_ocsf_security_data_platform_spark.operators.multimodal import (
        sniff_audio_meta,
    )

    fmt_body = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").cast("binary").alias("_data"),
    )
    dl = F.octet_length("_data") - (F.octet_length("_data") % 2)
    wav = F.concat(
        F.lit(b"RIFF"),
        _le_bytes(dl + 36, 8),
        F.lit(b"WAVEfmt "),
        _le_bytes(F.lit(16), 8),
        F.lit(fmt_body),
        F.lit(b"data"),
        _le_bytes(dl, 8),
        F.substring(F.col("_data"), 1, dl),
    )
    meta = sniff_audio_meta(d.select("media_id", wav.alias("payload")))
    return meta.select(
        F.col("media_id").alias("doc_id"),
        "format",
        "n_channels",
        "sample_rate_hz",
        "bits_per_sample",
        "n_frames",
        "duration_ms",
    )


# ---------------------------------------------------------------------------
# Round-5 wave 37: full-chunk PCM energy round-trip
# ---------------------------------------------------------------------------


@_q(
    "multimodal_pcm_energy_roundtrip",
    """
    WITH f AS (SELECT doc_id, text,
                 (strlen(text) - strlen(text) % 2) // 2 AS nf
               FROM documents),
    s AS (SELECT doc_id, nf,
            list_transform(range(1, CAST(nf + 1 AS BIGINT)), i ->
              CASE WHEN ord(substr(text, CAST(2 * i - 1 AS INT), 1))
                        + 256 * ord(substr(text, CAST(2 * i AS INT), 1))
                        >= 32768
                   THEN ord(substr(text, CAST(2 * i - 1 AS INT), 1))
                        + 256 * ord(substr(text, CAST(2 * i AS INT), 1))
                        - 65536
                   ELSE ord(substr(text, CAST(2 * i - 1 AS INT), 1))
                        + 256 * ord(substr(text, CAST(2 * i AS INT), 1))
              END) AS pcm
          FROM f)
    SELECT doc_id, CAST(nf AS BIGINT) AS n_frames,
           CAST(coalesce(list_sum(pcm), 0) AS BIGINT) AS sum_samples,
           CAST(coalesce(list_sum(list_transform(pcm, x -> abs(x))), 0)
             AS BIGINT) AS sum_abs,
           CAST(list_min(pcm) AS INT) AS min_sample,
           CAST(list_max(pcm) AS INT) AS max_sample
    FROM s
    """,
)
def multimodal_pcm_energy_roundtrip(spark, sf_dir):
    """Waveform-level round-trip: the same Column-expression WAV
    synthesis as multimodal_wav_meta_roundtrip, decoded back to EVERY
    16-bit PCM frame by the numpy full-chunk reader (operators/
    multimodal.py:pcm_energy) — frame count, signed/absolute sums and
    min/max per document are exact integers, and the oracle recomputes
    them from the text's character codes alone (ASCII corpus: codepoint
    == byte; each frame is the little-endian pair 2i-1,2i with two's-
    complement sign). Any drift in synthesis, chunk walk, or frombuffer
    decode breaks the hash — the deepest multimodal verification in the
    registry: header fields (wave 36) AND every payload sample (this
    entry)."""
    import struct

    from boann_ocsf_security_data_platform_spark.operators.multimodal import (
        pcm_energy,
    )

    fmt_body = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").cast("binary").alias("_data"),
    )
    dl = F.octet_length("_data") - (F.octet_length("_data") % 2)
    wav = F.concat(
        F.lit(b"RIFF"),
        _le_bytes(dl + 36, 8),
        F.lit(b"WAVEfmt "),
        _le_bytes(F.lit(16), 8),
        F.lit(fmt_body),
        F.lit(b"data"),
        _le_bytes(dl, 8),
        F.substring(F.col("_data"), 1, dl),
    )
    return pcm_energy(d.select("media_id", wav.alias("payload"))).select(
        F.col("media_id").alias("doc_id"),
        "n_frames",
        "sum_samples",
        "sum_abs",
        "min_sample",
        "max_sample",
    )


# ---------------------------------------------------------------------------
# Round-5 wave 38: robust (median/IQR) feature scaling
# ---------------------------------------------------------------------------


@_q(
    "feature_robust_scale",
    """
    WITH st AS (SELECT c_mktsegment AS seg,
                  quantile_cont(o_totalprice, 0.5) AS med,
                  quantile_cont(o_totalprice, 0.75)
                    - quantile_cont(o_totalprice, 0.25) AS iqr
                FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                GROUP BY c_mktsegment)
    SELECT o.o_orderkey,
           round((o.o_totalprice - st.med) / st.iqr, 4) + 0.0
             AS price_robust_z
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN st ON st.seg = c.c_mktsegment
    """,
)
def feature_robust_scale(spark, sf_dir):
    """Robust per-segment standardization: (x − median) / IQR — the
    outlier-immune scaler (z-scores explode on heavy tails; quartiles
    don't). One exact-percentile aggregate per segment (bounded model,
    broadcast back; Spark's `percentile` and DuckDB's quantile_cont
    share the linear-interpolation definition) + a projection — the
    scaling itself never shuffles the fact table a second time."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey",
        F.col("o_totalprice").alias("v"),
        F.col("c_mktsegment").alias("seg"),
    )
    st = j.groupBy("seg").agg(
        F.expr("percentile(v, 0.5)").alias("med"),
        (
            F.expr("percentile(v, 0.75)") - F.expr("percentile(v, 0.25)")
        ).alias("iqr"),
    )
    # + 0.0 normalizes IEEE negative zero: a value one ulp below the
    # median rounds to -0.0 in one engine and 0.0 in the other, which
    # the driver's text canonicalization renders differently
    return j.join(F.broadcast(st), "seg").select(
        "o_orderkey",
        (
            F.round((F.col("v") - F.col("med")) / F.col("iqr"), 4)
            + F.lit(0.0)
        ).alias("price_robust_z"),
    )


# ---------------------------------------------------------------------------
# Round-5 wave 39: bucketed co-located join, exact DECIMAL money totals
# ---------------------------------------------------------------------------


@_q(
    "join_bucketed_colocated",
    """
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate >= DATE '1995-01-01'
    GROUP BY o.o_orderpriority
    """,
)
def join_bucketed_colocated(spark, sf_dir):
    """The bucketed co-location play, driver-verified: both fact tables
    are written `bucketBy(32, orderkey)` + sorted (one-time cost), then
    the join consumes the bucket layout with ZERO exchanges on either
    side — each task reads matching bucket files from both tables (the
    plan-audit pin asserts no Exchange feeds the SortMergeJoin). This is
    the 100 TB recipe for fact-to-fact joins repeated across many
    queries: one bucketed write replaces a per-query shuffle of the big
    side. Results are hash-verified against the PLAIN join (bucketing
    must be result-invisible). Table names are PID-scoped so parallel
    verification shards cannot collide in the shared warehouse.
    operators/relational.py:write_bucketed."""
    import os

    from boann_ocsf_security_data_platform_spark.operators.relational import (
        write_bucketed,
    )

    # deterministic per-(sf, shard) table names: repeated sweeps OVERWRITE
    # these two tables instead of leaving a new pair per PID in the shared
    # warehouse (51 tables / 73 MB by round 5 — r5 VERDICT "What's wrong"
    # #2); _fresh_managed_table clears orphaned locations left by prior
    # sessions (the in-memory catalog forgets, the directory survives)
    tag = (
        f"{os.path.basename(os.path.normpath(sf_dir))}_{_artifact_scope()}"
    ).replace(".", "_").replace("-", "_")
    lt, ot = f"bkt_lineitem_{tag}", f"bkt_orders_{tag}"
    _fresh_managed_table(spark, lt)
    _fresh_managed_table(spark, ot)
    write_bucketed(
        _t(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        ),
        lt,
        "l_orderkey",
        # 32 buckets = the box's core count. The one-time write cost is
        # bucket-count-invariant (measured 17-21 s at sf1 either way),
        # but the CO-LOCATED JOIN's parallelism is exactly the bucket
        # count — 8 buckets capped the exchange-free join at 8 tasks; at
        # cluster scale size buckets to executors x cores the same way.
        # Bucket count never changes results (hash-pinned vs plain join).
        n_buckets=32,
    )
    write_bucketed(
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
        .select("o_orderkey", "o_orderpriority"),
        ot,
        "o_orderkey",
        n_buckets=32,
    )
    l, o = spark.table(lt), spark.table(ot)
    # merge hint: at verification SF the orders side is broadcast-sized,
    # which would bypass the bucket layout entirely; the hint pins the
    # co-located SortMergeJoin this entry exists to demonstrate (at
    # 100 TB neither fact side broadcasts anyway)
    return (
        l.join(o.hint("merge"), l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


@_q(
    "agg_decimal_exact_revenue",
    """
    SELECT o_orderpriority,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18, 2))) AS DOUBLE)
             AS total_exact,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_decimal_exact_revenue(spark, sf_dir):
    """Money arithmetic on DECIMAL, not DOUBLE: order totals cast to
    DECIMAL(18,2) sum EXACTLY (no partial-aggregation-order ulp drift —
    the reason every double-sum entry needs rounding while this one
    doesn't), then the exact decimal converts to double once for the
    driver (cents magnitudes here sit far below 2^53, so the conversion
    is itself exact). The accounting-grade aggregation contract a
    security/billing pipeline needs at any scale; map-side combinable
    like any sum."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_exact"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# Round-5 wave 40: one-row curation report over the whole dedup pipeline
# ---------------------------------------------------------------------------


@_q(
    "corpus_dedup_report",
    f"""
    WITH RECURSIVE pairs AS ({_minhash_oracle()}),
    edges AS (SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b AS a, id_a AS b FROM pairs),
    nodes AS (SELECT DISTINCT a AS node FROM edges),
    reach(node, r) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT reach.node, e.b FROM reach JOIN edges e ON reach.r = e.a
    ),
    cl AS (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node),
    ex AS (SELECT md5({_NORM}) AS h, count(*) AS n FROM documents GROUP BY 1)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
           (SELECT CAST(count(*) AS BIGINT) FROM ex WHERE n > 1)
             AS n_exact_groups,
           (SELECT CAST(coalesce(sum(n - 1), 0) AS BIGINT) FROM ex
             WHERE n > 1) AS n_exact_losers,
           (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS n_near_pairs,
           (SELECT CAST(count(DISTINCT cluster_id) AS BIGINT) FROM cl)
             AS n_near_clusters,
           (SELECT CAST(count(*) AS BIGINT) FROM cl
             WHERE node <> cluster_id) AS n_near_losers,
           (SELECT CAST(count(*) AS BIGINT) FROM documents)
             - (SELECT CAST(count(*) AS BIGINT) FROM cl
                 WHERE node <> cluster_id) AS n_kept_after_near
    """,
)
def corpus_dedup_report(spark, sf_dir):
    """The curation sign-off artifact: ONE row summarizing the whole
    dedup pipeline — corpus size, exact-duplicate groups and losers
    (normalized-fingerprint aggregate), MinHash-LSH near-dup pair count,
    transitive cluster count, near-dup losers, and surviving corpus size
    — each number produced by the SAME operators the individual entries
    verify (exact_dedup, minhash_near_dup_pairs, cluster_pairs), and the
    composition hash-verified against one oracle query that recomputes
    the entire pipeline (recursive-CTE reachability for the clusters).
    Driver-side cost: six count aggregates over already-distributed
    frames; the intermediate pair/cluster frames are the bounded
    near-dup set, never the corpus."""
    from boann_ocsf_security_data_platform_spark.operators.dedup import (
        cluster_pairs,
        exact_dedup,
        minhash_near_dup_pairs,
        release_caches,
        replica_map,
    )

    docs = _t(spark, sf_dir, "documents")
    n_docs = _table_count(spark, sf_dir, "documents")
    ex = exact_dedup(docs).filter(F.col("n_copies") > 1)
    ex_row = ex.agg(
        F.count(F.lit(1)).alias("g"),
        F.coalesce(F.sum(F.col("n_copies") - 1), F.lit(0)).alias("l"),
    ).collect()[0]
    valve = (
        _gates.MAX_LSH_BUCKET
        if n_docs > _gates.LSH_VALVE_MIN_ROWS
        else None
    )
    if n_docs <= HUBNESS_EXACT_MAX_ROWS:
        pairs = minhash_near_dup_pairs(docs, max_bucket_size=valve)
        n_pairs = pairs.count()  # while the shingle caches are live
        clusters = cluster_pairs(pairs)  # eager, checkpointed
        release_caches(pairs)
    else:
        # round 9, collapse-and-expand (see _near_dup_clusters_gated):
        # the FULL-corpus pair count expands exactly from representative
        # pairs and copy counts — a candidate pair exists between any
        # copies of adjacent texts, plus every within-text copy pair:
        #   n_pairs = Σ_(a,b)∈rep_pairs n_a·n_b + Σ_t C(n_t, 2)
        m = replica_map(docs).persist()
        reps = docs.join(
            m.filter(F.col("doc_id") == F.col("rep_id"))
            .select("doc_id")
            .hint("merge"),
            "doc_id",
        )
        rep_pairs = minhash_near_dup_pairs(reps, max_bucket_size=valve)
        cnt = (
            m.groupBy("rep_id")
            .agg(F.first("n_copies").alias("n"))
            .localCheckpoint(eager=True)
        )
        cross = (
            rep_pairs.join(
                cnt.select(
                    F.col("rep_id").alias("id_a"), F.col("n").alias("n_a")
                ).hint("merge"),
                "id_a",
            )
            .join(
                cnt.select(
                    F.col("rep_id").alias("id_b"), F.col("n").alias("n_b")
                ).hint("merge"),
                "id_b",
            )
            .agg(F.coalesce(F.sum(F.col("n_a") * F.col("n_b")), F.lit(0)))
            .collect()[0][0]
        )
        within = (
            cnt.agg(
                F.coalesce(
                    F.sum(F.col("n") * (F.col("n") - 1) / 2), F.lit(0)
                )
            ).collect()[0][0]
        )
        n_pairs = int(cross) + int(within)
        repcl = cluster_pairs(rep_pairs)
        release_caches(rep_pairs)
        clusters = (
            m.join(
                repcl.hint("merge"), m.rep_id == repcl.node, "left"
            )
            .where(
                (F.col("n_copies") > 1) | F.col("cluster_id").isNotNull()
            )
            .select(
                F.col("doc_id").alias("node"),
                F.coalesce("cluster_id", F.col("rep_id")).alias(
                    "cluster_id"
                ),
            )
            .localCheckpoint(eager=True)
        )
        m.unpersist()
    cl_row = clusters.agg(
        F.count_distinct("cluster_id").alias("c"),
        F.sum(
            F.when(F.col("node") != F.col("cluster_id"), 1).otherwise(0)
        ).alias("l"),
    ).collect()[0]
    n_near_losers = int(cl_row["l"] or 0)
    return spark.createDataFrame(
        [
            (
                n_docs,
                int(ex_row["g"]),
                int(ex_row["l"]),
                n_pairs,
                int(cl_row["c"] or 0),
                n_near_losers,
                n_docs - n_near_losers,
            )
        ],
        "n_docs long, n_exact_groups long, n_exact_losers long, "
        "n_near_pairs long, n_near_clusters long, n_near_losers long, "
        "n_kept_after_near long",
    )


# ---------------------------------------------------------------------------
# Round-5 wave 41: personalized PageRank (random walk with restart)
# ---------------------------------------------------------------------------

_PPR_SEEDS = (0, 1, 2)
_PPR_PV = (
    "CASE WHEN {n} IN (0, 1, 2) THEN 1.0 / 3 ELSE 0.0 END"
)


@_q(
    "graph_personalized_pagerank",
    """
    WITH e AS (SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
                      CAST(count(*) AS DOUBLE) AS w
               FROM lineitem l
               JOIN orders o ON l.l_orderkey = o.o_orderkey
               JOIN customer c ON o.o_custkey = c.c_custkey
               JOIN supplier s ON l.l_suppkey = s.s_suppkey
               GROUP BY 1, 2),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    outw AS (SELECT src, sum(w) AS w_out FROM e GROUP BY src),
    r0 AS (SELECT node, round(CASE WHEN node IN (0, 1, 2) THEN 1.0 / 3 ELSE 0.0 END, 8) AS r FROM nodes),
    d1 AS (SELECT coalesce(sum(r), 0.0) AS dang FROM r0
             LEFT JOIN outw ON r0.node = outw.src WHERE outw.src IS NULL),
    c1 AS (SELECT e.dst AS node, sum(r0.r * e.w / outw.w_out) AS c
             FROM e JOIN r0 ON e.src = r0.node
             JOIN outw ON e.src = outw.src GROUP BY e.dst),
    r1 AS (SELECT nodes.node,
                    round((1 - 0.85) * CASE WHEN nodes.node IN (0, 1, 2) THEN 1.0 / 3 ELSE 0.0 END
                          + 0.85 * (coalesce(c1.c, 0.0)
                                    + dang * CASE WHEN nodes.node IN (0, 1, 2) THEN 1.0 / 3 ELSE 0.0 END),
                          8) AS r
             FROM nodes LEFT JOIN c1 ON nodes.node = c1.node, d1),
    d2 AS (SELECT coalesce(sum(r), 0.0) AS dang FROM r1
             LEFT JOIN outw ON r1.node = outw.src WHERE outw.src IS NULL),
    c2 AS (SELECT e.dst AS node, sum(r1.r * e.w / outw.w_out) AS c
             FROM e JOIN r1 ON e.src = r1.node
             JOIN outw ON e.src = outw.src GROUP BY e.dst),
    r2 AS (SELECT nodes.node,
                    round((1 - 0.85) * CASE WHEN nodes.node IN (0, 1, 2) THEN 1.0 / 3 ELSE 0.0 END
                          + 0.85 * (coalesce(c2.c, 0.0)
                                    + dang * CASE WHEN nodes.node IN (0, 1, 2) THEN 1.0 / 3 ELSE 0.0 END),
                          8) AS r
             FROM nodes LEFT JOIN c2 ON nodes.node = c2.node, d2),
    d3 AS (SELECT coalesce(sum(r), 0.0) AS dang FROM r2
             LEFT JOIN outw ON r2.node = outw.src WHERE outw.src IS NULL),
    c3 AS (SELECT e.dst AS node, sum(r2.r * e.w / outw.w_out) AS c
             FROM e JOIN r2 ON e.src = r2.node
             JOIN outw ON e.src = outw.src GROUP BY e.dst),
    r3 AS (SELECT nodes.node,
                    round((1 - 0.85) * CASE WHEN nodes.node IN (0, 1, 2) THEN 1.0 / 3 ELSE 0.0 END
                          + 0.85 * (coalesce(c3.c, 0.0)
                                    + dang * CASE WHEN nodes.node IN (0, 1, 2) THEN 1.0 / 3 ELSE 0.0 END),
                          8) AS r
             FROM nodes LEFT JOIN c3 ON nodes.node = c3.node, d3)
    SELECT node, r3.r AS ppr FROM r3
    """,
)
def graph_personalized_pagerank(spark, sf_dir):
    """Personalized PageRank (random walk with restart, Jeh & Widom
    2003) on the customer-nation → supplier-nation trade graph, seeded
    at nations {0, 1, 2}: teleport AND dangling mass return to the seed
    distribution, ranking every nation by relevance TO THOSE SEEDS —
    the related-entity primitive global PageRank cannot express. Same
    per-round join+aggregate shape and per-round rounding as
    graph_pagerank; the oracle replays the identical three rounds as
    chained CTEs. operators/graph.py:personalized_pagerank."""
    from boann_ocsf_security_data_platform_spark.operators.graph import (
        personalized_pagerank,
    )

    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    edges = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    return personalized_pagerank(
        edges, seeds=list(_PPR_SEEDS), weight_col="w"
    )


_BM25_QUERIES = (
    (1, "hash join table"),
    (2, "vector scan filter"),
    (3, "group agg sort dup"),
)
_BM25_VALUES = ", ".join(f"({i}, '{{q}}')".format(q=q) for i, q in _BM25_QUERIES)
_QWORDS = (
    "list_filter(string_split(trim(regexp_replace(lower(qtext), "
    "'\\s+', ' ', 'g')), ' '), x -> x <> '')"
)


@_q(
    "text_bm25_retrieval",
    f"""
    WITH q(query_id, qtext) AS (VALUES {_BM25_VALUES}),
    w AS (SELECT doc_id, unnest({_WORDS}) AS term FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY 1, 2),
    dl AS (SELECT doc_id, count(*) AS dl FROM w GROUP BY 1),
    qt AS (SELECT DISTINCT query_id, unnest({_QWORDS}) AS term FROM q),
    tfq AS (SELECT * FROM tf WHERE term IN (SELECT term FROM qt)),
    dft AS (SELECT term, count(*) AS df_t FROM tfq GROUP BY 1),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM documents),
    ad AS (SELECT avg(dl) AS avgdl FROM dl),
    scored AS (
      SELECT qt.query_id, tfq.doc_id,
             round(sum(
               ln(1 + (nn - df_t + 0.5) / (df_t + 0.5))
               * (tf * (1.2 + 1.0))
               / (tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl))), 6) AS score
      FROM tfq JOIN qt USING (term) JOIN dl USING (doc_id)
           JOIN dft USING (term), n, ad
      GROUP BY 1, 2)
    SELECT query_id, doc_id, score, CAST(rank AS BIGINT) AS rank FROM (
      SELECT query_id, doc_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, doc_id) AS rank
      FROM scored) t
    WHERE rank <= 5
    """,
)
def text_bm25_retrieval(spark, sf_dir):
    """Okapi BM25 top-5 retrieval for a fixed 3-query batch over the
    documents corpus — the sparse lexical-retrieval baseline of every
    RAG / curation stack (Robertson & Zaragoza 2009; Lucene's
    non-negative idf). Inverted-index shape: the broadcast query-term
    list prunes the (doc, term) frame BEFORE any per-term statistic, so
    only documents containing a query term are ever scored; per-query
    top-5 plans as WindowGroupLimit with rounded-score + doc-id
    tie-break. The oracle replays the identical pipeline as CTEs.
    operators/text.py:bm25_topk."""
    from boann_ocsf_security_data_platform_spark.operators.text import (
        bm25_topk,
    )

    queries = spark.createDataFrame(
        list(_BM25_QUERIES), "query_id int, qtext string"
    )
    return bm25_topk(
        _t(spark, sf_dir, "documents"), queries, k=5
    ).withColumn("query_id", F.col("query_id").cast("int"))


@_q(
    "graph_hits_hubs_authorities",
    f"""
    WITH e AS (SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
                      CAST(count(*) AS DOUBLE) AS w
               FROM lineitem l
               JOIN orders o ON l.l_orderkey = o.o_orderkey
               JOIN customer c ON o.o_custkey = c.c_custkey
               JOIN supplier s ON l.l_suppkey = s.s_suppkey
               GROUP BY 1, 2),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    nn AS (SELECT count(*) AS cnt FROM nodes),
    h0 AS (SELECT node, round(1.0 / cnt, 8) AS h FROM nodes, nn),
    ra1 AS (SELECT e.dst AS node, sum(e.w * h0.h) AS ra
             FROM e JOIN h0 ON e.src = h0.node GROUP BY e.dst),
    na1 AS (SELECT sum(ra) AS s FROM ra1),
    a1 AS (SELECT nodes.node, round(coalesce(ra, 0.0) / s, 8) AS a
            FROM nodes LEFT JOIN ra1 ON nodes.node = ra1.node, na1),
    rh1 AS (SELECT e.src AS node, sum(e.w * a1.a) AS rh
             FROM e JOIN a1 ON e.dst = a1.node GROUP BY e.src),
    nh1 AS (SELECT sum(rh) AS s FROM rh1),
    h1 AS (SELECT nodes.node, round(coalesce(rh, 0.0) / s, 8) AS h
            FROM nodes LEFT JOIN rh1 ON nodes.node = rh1.node, nh1),
    ra2 AS (SELECT e.dst AS node, sum(e.w * h1.h) AS ra
             FROM e JOIN h1 ON e.src = h1.node GROUP BY e.dst),
    na2 AS (SELECT sum(ra) AS s FROM ra2),
    a2 AS (SELECT nodes.node, round(coalesce(ra, 0.0) / s, 8) AS a
            FROM nodes LEFT JOIN ra2 ON nodes.node = ra2.node, na2),
    rh2 AS (SELECT e.src AS node, sum(e.w * a2.a) AS rh
             FROM e JOIN a2 ON e.dst = a2.node GROUP BY e.src),
    nh2 AS (SELECT sum(rh) AS s FROM rh2),
    h2 AS (SELECT nodes.node, round(coalesce(rh, 0.0) / s, 8) AS h
            FROM nodes LEFT JOIN rh2 ON nodes.node = rh2.node, nh2)
    SELECT h2.node, h2.h AS hub, a2.a AS authority
    FROM h2 JOIN a2 ON h2.node = a2.node
    """,
)
def graph_hits_hubs_authorities(spark, sf_dir):
    """HITS hubs-and-authorities (Kleinberg 1999) on the customer-nation
    -> supplier-nation trade graph, 2 fixed rounds with L1 normalization
    and per-half-step rounding: hubs rank nations by how much they BUY
    from authoritative sellers, authorities by how much they SELL to
    hub buyers — the two-sided centrality PageRank's single score cannot
    separate. Same iterative join+aggregate shape (and oracle-replay
    strategy) as graph_pagerank / graph_personalized_pagerank.
    operators/graph.py:hits."""
    from boann_ocsf_security_data_platform_spark.operators.graph import hits

    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    edges = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    return hits(edges, weight_col="w", iters=2)


@_q(
    "events_rate_ratio_test",
    """
    WITH d AS (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day
               FROM events),
    bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
    half AS (SELECT d0, d1,
                    CAST(floor(date_diff('day', d0, d1) / 2.0) AS BIGINT)
                      AS mid,
                    date_diff('day', d0, d1) + 1 AS total
             FROM bounds),
    marked AS (SELECT event_type,
                      date_diff('day', d0, day) < mid AS in_p1,
                      mid, total
               FROM d, half),
    agg AS (SELECT event_type,
                   CAST(count(*) FILTER (WHERE in_p1) AS BIGINT) AS n1,
                   CAST(count(*) FILTER (WHERE NOT in_p1) AS BIGINT) AS n2,
                   CAST(any_value(mid) AS DOUBLE) AS t1,
                   CAST(any_value(total) - any_value(mid) AS DOUBLE) AS t2
            FROM marked GROUP BY event_type)
    SELECT event_type, n1, n2,
           round(CASE WHEN t1 > 0 THEN n1 / t1 END, 6) AS rate1,
           round(n2 / t2, 6) AS rate2,
           round(CASE WHEN t1 > 0 THEN (n1 / t1 - n2 / t2)
                 / sqrt(n1 / (t1 * t1) + n2 / (t2 * t2)) END, 4) AS z,
           CASE WHEN t1 > 0 THEN abs((n1 / t1 - n2 / t2)
               / sqrt(n1 / (t1 * t1) + n2 / (t2 * t2))) > 1.96 END
             AS significant
    FROM agg
    """,
)
def events_rate_ratio_test(spark, sf_dir):
    """Poisson rate-ratio z-test per event type between the first and
    second half of the observed day range — the did-the-error-rate-
    actually-change primitive behind every deploy healthcheck and A/B
    guardrail: z = (r1 − r2) / sqrt(r1/t1 + r2/t2) under the Poisson
    normal approximation (counts as rates over day-exposures). One scan,
    one conditional aggregate; the day bounds ride a broadcast one-row
    frame. Integer day arithmetic on both sides (no timestamp-epoch
    math — NTZ/timezone-proof by construction). Degenerate single-day
    inputs (d0 = d1 so mid = 0, exposure t1 = 0) yield NULL rate1/z/
    significant via an explicit guard on BOTH engines instead of relying
    on matching division-by-zero behavior (r6 ADVICE #4)."""
    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    )
    bounds = e.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    ).select(
        "d0",
        F.floor(F.datediff("d1", "d0") / 2.0).cast("long").alias("mid"),
        (F.datediff("d1", "d0") + 1).alias("total"),
    )
    marked = e.join(F.broadcast(bounds)).select(
        "event_type",
        (F.datediff("day", "d0") < F.col("mid")).alias("in_p1"),
        "mid",
        "total",
    )
    agg = marked.groupBy("event_type").agg(
        F.count(F.when(F.col("in_p1"), 1)).alias("n1"),
        F.count(F.when(~F.col("in_p1"), 1)).alias("n2"),
        F.any_value("mid").cast("double").alias("t1"),
        (F.any_value("total") - F.any_value("mid"))
        .cast("double")
        .alias("t2"),
    )
    ok = F.col("t1") > 0
    r1 = F.col("n1") / F.col("t1")
    r2 = F.col("n2") / F.col("t2")
    z = (r1 - r2) / F.sqrt(
        F.col("n1") / (F.col("t1") * F.col("t1"))
        + F.col("n2") / (F.col("t2") * F.col("t2"))
    )
    return agg.select(
        "event_type",
        "n1",
        "n2",
        F.round(F.when(ok, r1), 6).alias("rate1"),
        F.round(r2, 6).alias("rate2"),
        F.round(F.when(ok, z), 4).alias("z"),
        F.when(ok, F.abs(z) > 1.96).alias("significant"),
    )


@_q(
    "feature_quantile_binning",
    """
    WITH b AS (SELECT o_totalprice,
                 ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bin
               FROM orders)
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi,
           round(avg(o_totalprice), 6) AS mean_price
    FROM b GROUP BY bin
    """,
)
def feature_quantile_binning(spark, sf_dir):
    """Equal-frequency discretization (10-bin quantile binning) of order
    totals with per-bin boundaries and means — the feature-engineering
    primitive behind monotone binning, WoE encoding, and histogram-based
    GBDT inputs. Exact ntile semantics over a DETERMINISTIC order (value
    + unique key tie-break, so equal prices land in the same bin on
    every engine); the rollup is one map-combinable aggregate over the
    binned frame.
    Round-11 sf100 find: the literal ntile ran a global single-task sort
    of the whole order fact (518 s in-sweep). The global row rank r
    decomposes through price buckets exactly like the other bucketed
    windows (equal prices share a bucket; r = prefix count of lower
    buckets + in-bucket row_number over the same (price, key) order) and
    ntile's exact remainder rule — the first n%10 bins take one extra
    row — is closed-form in (r, n). Bit-identical bins, bucket-parallel
    sort."""
    o = _t(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    b = _bucketed_ntile(o, "o_totalprice", "o_orderkey", 10)
    return b.groupBy(F.col("bin").cast("long").alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
        F.round(F.avg("o_totalprice"), 6).alias("mean_price"),
    )


@_q(
    "text_zipf_fit",
    f"""
    WITH w AS (SELECT source, unnest({_WORDS}) AS term FROM documents),
    freq AS (SELECT source, term, CAST(count(*) AS DOUBLE) AS f
             FROM w GROUP BY 1, 2),
    ranked AS (SELECT source, term, f,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY f DESC, term) AS r
               FROM freq),
    top AS (SELECT * FROM ranked WHERE r <= 100)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_terms,
           round(regr_slope(ln(f), ln(CAST(r AS DOUBLE))), 6) AS zipf_slope,
           round(regr_intercept(ln(f), ln(CAST(r AS DOUBLE))), 6)
             AS zipf_intercept,
           round(regr_r2(ln(f), ln(CAST(r AS DOUBLE))), 6) AS r2
    FROM top GROUP BY source
    """,
)
def text_zipf_fit(spark, sf_dir):
    """Zipf's-law fit per source: OLS slope of ln(frequency) on ln(rank)
    over each source's top-100 terms — the corpus-health fingerprint
    (natural text sits near slope −1; template/boilerplate-heavy or
    synthetic sources bend the curve, making this a cheap generated-text
    / scraper-junk detector). Rank ties break on the term so the top-100
    cut is engine-deterministic; the regression is the regr_* aggregate
    family over a bounded 100-row-per-source frame."""
    from boann_ocsf_security_data_platform_spark.operators.text import tokens

    w = _t(spark, sf_dir, "documents").select(
        "source", F.explode(tokens(F.col("text"))).alias("term")
    )
    freq = w.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("double").alias("f")
    )
    ranked = freq.select(
        "source",
        "f",
        F.row_number()
        .over(
            Window.partitionBy("source").orderBy(F.desc("f"), F.asc("term"))
        )
        .alias("r"),
    ).filter(F.col("r") <= 100)
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.round(F.expr("regr_slope(ln(f), ln(CAST(r AS DOUBLE)))"), 6).alias(
            "zipf_slope"
        ),
        F.round(
            F.expr("regr_intercept(ln(f), ln(CAST(r AS DOUBLE)))"), 6
        ).alias("zipf_intercept"),
        F.round(F.expr("regr_r2(ln(f), ln(CAST(r AS DOUBLE)))"), 6).alias(
            "r2"
        ),
    )


FUZZY_EXACT_MAX_ROWS = _gates.FUZZY_EXACT_MAX_ROWS
# Size gate for join_fuzzy_entity_resolution: the first-name-token
# blocking key has FIXED cardinality (the synthetic generator uses only
# ~8 color words; real TPC-H ~92), so blocks grow linearly with the
# catalog and candidates (probes x block) grow QUADRATICALLY — the same
# class of defect as the pre-r8 hubness plan (caught by the round-8
# full-suite sf1 run: 74.8 s at sf1, ~60x per decade, never
# scale-curved before). At or below this row count the blocking stays
# the oracle-pinned single token; above it two valves engage:
#   1. the block key widens to the first TWO tokens (multi-token
#      blocking — helps in proportion to vocabulary size), and
#   2. the catalog side of each block is CAPPED at
#      FUZZY_MAX_BLOCK_CAND rows deterministically (xxhash64 order) —
#      the max_bucket_size discipline, because on a SATURATED
#      vocabulary (measured: 64 two-token blocks at sf1, avg 3125
#      rows) no token scheme bounds block size; the cap turns pair
#      work into probes x cap, strictly linear.
# Above the gate the resolution is therefore a bounded-candidate
# approximation (each probe ranks a deterministic ~cap-row panel per
# block, top-3 of the panel); on realistic large-vocabulary name data
# the cap rarely binds and results are complete.
FUZZY_MAX_BLOCK_CAND = _gates.MAX_FUZZY_BLOCK_CANDIDATES



@_q(
    "join_fuzzy_entity_resolution",
    """
    WITH p AS (SELECT p_partkey, p_name,
                      string_split(p_name, ' ')[1] AS blk
               FROM part),
    probes AS (SELECT * FROM p WHERE p_partkey % 100 = 0),
    cand AS (SELECT a.p_partkey AS probe_key, b.p_partkey AS match_key,
                    levenshtein(a.p_name, b.p_name) AS dist
             FROM probes a JOIN p b
               ON a.blk = b.blk AND a.p_partkey <> b.p_partkey),
    ranked AS (SELECT probe_key, match_key, dist,
                 row_number() OVER (PARTITION BY probe_key
                                    ORDER BY dist, match_key) AS rank
               FROM cand WHERE dist <= 4)
    SELECT probe_key, match_key, CAST(dist AS INT) AS dist,
           CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 3
    """,
)
def join_fuzzy_entity_resolution(spark, sf_dir):
    """Blocked fuzzy join (entity resolution): every 100th part plays the
    incoming batch to be resolved against the catalog — candidates come
    ONLY from the shared blocking key (first name token, the standard
    blocking pass), survivors need edit distance ≤ 4, and each probe
    keeps its 3 nearest matches (distance + key tie-break, so the cut is
    engine-deterministic). The record-linkage primitive behind catalog
    dedup / supplier-master matching. 100 TB posture: the blocked
    equi-join touches candidate pairs only (never all-pairs), the probe
    side is a pushed-down filter scan, a LENGTH-BAND prefilter
    (dist ≤ 4 forces |len(a) − len(b)| ≤ 4 — a cheap int compare that
    never changes results) prunes pairs before the O(len²) Levenshtein,
    Levenshtein runs JVM-side (built-in, no UDF), the top-3 plans as
    WindowGroupLimit, and above FUZZY_EXACT_MAX_ROWS the block key
    widens to two tokens so block sizes stay flat as the catalog grows
    (see the gate comment)."""
    def _exact(pp, n):
        blk = F.split("p_name", " ").getItem(0)
        pp = pp.select("p_partkey", "p_name", blk.alias("blk"))
        return pp, pp

    def _scale(pp, n):
        toks = F.split("p_name", " ")
        blk = F.concat_ws(" ", toks.getItem(0), toks.getItem(1))
        pp = pp.select("p_partkey", "p_name", blk.alias("blk"))
        wb = Window.partitionBy("blk").orderBy(
            F.xxhash64("p_partkey"), "p_partkey"
        )
        # the cap's WindowGroupLimit sort shares the blk partitioning
        # with the candidate join, so unpersisted they FUSE into one
        # 4-sorter region (round-12 scan-all find) — and the probe side
        # would re-run the cap. The scale arm only runs above
        # FUZZY_EXACT_MAX_ROWS, so persist straight to DISK_ONLY.
        capped = (
            pp.withColumn("_crn", F.row_number().over(wb))
            .filter(F.col("_crn") <= FUZZY_MAX_BLOCK_CAND)
            .drop("_crn")
            .persist(StorageLevel.DISK_ONLY)
        )
        return pp, capped

    p, catalog = size_gated(
        _t(spark, sf_dir, "part"), _exact, _scale, FUZZY_EXACT_MAX_ROWS
    )
    probes = p.filter(F.col("p_partkey") % 100 == 0).select(
        F.col("p_partkey").alias("probe_key"),
        F.col("p_name").alias("probe_name"),
        "blk",
    )
    cand = (
        # the catalog side is the full (or block-capped) part table —
        # catalog-scaling; pinned above the measured-count threshold
        probes.join(
            _pin(
                catalog,
                _gates.pin_shuffle_join(_table_count(spark, sf_dir, "part")),
            ),
            "blk",
        )
        .filter(F.col("probe_key") != F.col("p_partkey"))
        .filter(
            F.abs(F.length("probe_name") - F.length("p_name")) <= 4
        )
    )
    ranked = (
        cand.select(
            "probe_key",
            F.col("p_partkey").alias("match_key"),
            F.levenshtein("probe_name", "p_name").alias("dist"),
        )
        .filter(F.col("dist") <= 4)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("probe_key").orderBy(
                    "dist", "match_key"
                )
            ),
        )
        .filter(F.col("rank") <= 3)
    )
    return ranked.select(
        "probe_key",
        "match_key",
        F.col("dist").cast("int").alias("dist"),
        F.col("rank").cast("long").alias("rank"),
    )


_BOOT_B = 50
# 25 exact powers of five: digit j of a 60-bit hash in base 5 is
# (h div 5^j) % 5 — an exact Bernoulli(4/5) draw per digit. Two hashes
# per ROW give 50 independent digits, so resample membership costs two
# md5 calls per order instead of one per (order, resample): the 25x
# hashing reduction that took this entry from 7.3 s to ~1 s at sf0.1.
# Literal longs, not pow(5, j): 5^24 exceeds double's 53-bit mantissa,
# so a float pow would corrupt high digits on BOTH engines.
_BOOT_POW5 = [5 ** j for j in range(25)]
_BOOT_POW5_SQL = "[" + ", ".join(str(p) for p in _BOOT_POW5) + "]"


def _boot_h_sql(seed: str) -> str:
    return (
        f"CAST(concat('0x', substr(md5(concat('{seed}:', "
        "CAST(o_orderkey AS VARCHAR))), 1, 15)) AS BIGINT)"
    )


@_q(
    "agg_bootstrap_subsample_ci",
    f"""
    WITH hashed AS (SELECT o_totalprice, {_boot_h_sql("bs1")} AS h1,
                           {_boot_h_sql("bs2")} AS h2
                    FROM orders),
    r AS (SELECT o_totalprice, h1, h2, unnest(range(1, {_BOOT_B} + 1)) AS b
          FROM hashed),
    kept AS (SELECT b, o_totalprice FROM r
             WHERE ((CASE WHEN b <= 25 THEN h1 ELSE h2 END)
                    // ({_BOOT_POW5_SQL}[(b - 1) % 25 + 1])) % 5 <> 0),
    means AS (SELECT b, avg(o_totalprice) AS m FROM kept GROUP BY b)
    SELECT CAST(count(*) AS BIGINT) AS n_resamples,
           round(avg(m), 4) AS point_estimate,
           round(quantile_cont(m, 0.05), 4) AS ci_lo,
           round(quantile_cont(m, 0.95), 4) AS ci_hi,
           round(stddev_samp(m), 4) AS se
    FROM means
    """,
)
def agg_bootstrap_subsample_ci(spark, sf_dir):
    """Deterministic subsample bootstrap (m-out-of-n, Bickel et al.): 50
    resamples, each keeping ~80% of orders — membership is base-5 digit
    j of a portable 60-bit hash of the key ((h div 5^j) % 5 != 0, an
    exact Bernoulli(4/5) per digit), so the draw is fully reproducible
    across engines AND reshardings with only TWO md5 calls per order
    (25 digits per hash) instead of one per (order, resample). The
    5th/95th percentiles of the resample means give the confidence band
    for mean order value; se is the bootstrap standard error. 100 TB
    posture: hash before the row-local ``explode(sequence)`` (B=50
    bounded), every resample mean is one map-combinable aggregate
    sharing a single scan, and the final CI aggregates a 50-row frame —
    no data duplicated to disk, no driver-side loop per resample."""
    from boann_ocsf_security_data_platform_spark.functions.hash_fns import (
        hash64,
    )

    pow5 = F.array(*[F.lit(p) for p in _BOOT_POW5])
    hashed = _t(spark, sf_dir, "orders").select(
        "o_totalprice",
        hash64(
            F.concat(F.lit("bs1:"), F.col("o_orderkey").cast("string"))
        ).alias("h1"),
        hash64(
            F.concat(F.lit("bs2:"), F.col("o_orderkey").cast("string"))
        ).alias("h2"),
    )
    r = hashed.select(
        "o_totalprice",
        F.explode(F.sequence(F.lit(1), F.lit(_BOOT_B))).alias("b"),
        # `div`, not `/`: float division of a 60-bit hash loses the low
        # bits past double's 53-bit mantissa and corrupts the digit
        F.when(F.col("b") <= 25, F.col("h1"))
        .otherwise(F.col("h2"))
        .alias("h_sel"),
        F.element_at(pow5, (F.col("b") - 1) % 25 + 1).alias("p5"),
    )
    means = (
        r.filter(F.expr("(h_sel div p5) % 5") != 0)
        .groupBy("b")
        .agg(F.avg("o_totalprice").alias("m"))
    )
    return means.agg(
        F.count(F.lit(1)).alias("n_resamples"),
        F.round(F.avg("m"), 4).alias("point_estimate"),
        F.round(F.expr("percentile(m, 0.05)"), 4).alias("ci_lo"),
        F.round(F.expr("percentile(m, 0.95)"), 4).alias("ci_hi"),
        F.round(F.stddev_samp("m"), 4).alias("se"),
    )


# ---------------------------------------------------------------------------
# Round-6 wave 48: PNG header synthesis -> CRC-verified parser round-trip
# ---------------------------------------------------------------------------


def _be_bytes(n, width_hex: int):
    """Big-endian byte string of an int column — zero-padded hex IS the
    BE byte order (the little-endian sibling `_le_bytes` must reverse)."""
    return F.unhex(F.lpad(F.hex(n), width_hex, "0"))


@_q(
    "multimodal_png_ihdr_roundtrip",
    """
    SELECT doc_id, 'png' AS format,
           CAST(n_chars % 640 + 1 AS INT) AS width,
           CAST(doc_id % 480 + 1 AS INT) AS height,
           CAST(8 AS INT) AS bit_depth, CAST(0 AS INT) AS color_type,
           TRUE AS crc_ok
    FROM documents
    """,
)
def multimodal_png_ihdr_roundtrip(spark, sf_dir):
    """Synthesize a PNG header per document in pure Column expressions —
    signature, IHDR with data-derived dimensions (width from n_chars,
    height from doc_id), and the REAL chunk CRC computed JVM-side with
    F.crc32 (PNG CRC == zlib CRC-32, exactly what java.util.zip.CRC32
    implements) plus the constant IEND chunk — then push it through the
    CRC-VERIFYING parser (operators/multimodal.py:parse_png_meta). The
    oracle computes the expected dimensions directly from the table, and
    crc_ok must read TRUE on every row: if the Column-expr synthesis ever
    byte-drifts OR the parser's recomputation disagrees, the hash breaks.
    The image sibling of multimodal_wav_meta_roundtrip; synthesis is a
    row-local projection, parsing the Arrow mapInPandas stage."""
    from boann_ocsf_security_data_platform_spark.operators.multimodal import (
        parse_png_meta,
    )

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        (F.col("n_chars") % 640 + 1).cast("long").alias("w"),
        (F.col("doc_id") % 480 + 1).cast("long").alias("h"),
    )
    ihdr_payload = F.concat(
        F.lit(b"IHDR"),
        _be_bytes(F.col("w"), 8),
        _be_bytes(F.col("h"), 8),
        F.lit(bytes([8, 0, 0, 0, 0])),
    )
    png = F.concat(
        F.lit(b"\x89PNG\r\n\x1a\n"),
        _be_bytes(F.lit(13), 8),
        ihdr_payload,
        _be_bytes(F.crc32(ihdr_payload), 8),
        _be_bytes(F.lit(0), 8),
        F.lit(b"IEND"),
        F.lit(b"\xaeB`\x82"),
    )
    meta = parse_png_meta(d.select("media_id", png.alias("payload")))
    return meta.select(
        F.col("media_id").alias("doc_id"),
        "format",
        "width",
        "height",
        "bit_depth",
        "color_type",
        "crc_ok",
    )


@_q(
    "events_ewma_snapshot",
    """
    WITH ord AS (
      SELECT user_id, value,
        list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS arr,
        row_number() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) AS rn,
        count(*) OVER (PARTITION BY user_id) AS n_events
      FROM events),
    last AS (SELECT * FROM ord WHERE rn = 1)
    SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
           round(value, 2) AS last_value,
           round(
             list_sum(list_transform(range(1, len(arr) + 1),
               i -> arr[i] * 0.3 * pow(0.7, len(arr) - i)))
             / list_sum(list_transform(range(1, len(arr) + 1),
               i -> 0.3 * pow(0.7, len(arr) - i))), 6) AS ewma
    FROM last
    """,
)
def events_ewma_snapshot(spark, sf_dir):
    """Exponentially-weighted moving average per user, snapshotted at each
    user's LAST event — the smoothed-metric primitive behind alert
    baselines and dashboard trend lines. The IIR recursion s_t = α·v_t +
    (1−α)·s_{t−1} is replaced by its 20-tap FIR truncation (weights
    α·(1−α)^k renormalized over the window, so short histories are exact
    rather than biased toward 0): a windowed collect_list + one row-local
    weighted fold — NO recursive self-join, no iterative driver loop, and
    the state per row is a bounded 20-element array regardless of corpus
    size. Deterministic (ts, event_id) frame order on both engines; the
    oracle replays the identical fold via list_transform over an indexed
    range."""
    ordw = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        "value",
        F.collect_list("value")
        .over(ordw.rowsBetween(-19, 0))
        .alias("arr"),
        F.row_number()
        .over(
            Window.partitionBy("user_id").orderBy(
                F.desc("ts"), F.desc("event_id")
            )
        )
        .alias("rn"),
        F.count(F.lit(1))
        .over(
            Window.partitionBy("user_id").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("n_events"),
    ).filter(F.col("rn") == 1)
    idx = F.sequence(F.lit(1), F.size("arr"))
    weight = lambda i: F.lit(0.3) * F.pow(
        F.lit(0.7), (F.size("arr") - i).cast("double")
    )
    num = F.aggregate(
        F.zip_with(F.col("arr"), idx, lambda v, i: v * weight(i)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    den = F.aggregate(
        F.transform(idx, weight),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return e.select(
        "user_id",
        F.col("n_events").cast("long").alias("n_events"),
        F.round("value", 2).alias("last_value"),
        F.round(num / den, 6).alias("ewma"),
    )


@_q(
    "embedding_pca_power_iteration",
    f"""
    WITH xx AS (SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS val,
                       generate_subscripts(embedding, 1) AS dim
                FROM embeddings),
    mu AS (SELECT dim, avg(val) AS m FROM xx GROUP BY dim),
    v0 AS (SELECT dim, 0.125 AS v FROM mu),
    s1 AS (SELECT vec_id, sum((xx.val - mu.m) * v0.v) AS s
             FROM xx JOIN mu USING (dim) JOIN v0 USING (dim)
             GROUP BY vec_id),
    w1 AS (SELECT xx.dim AS dim, avg((xx.val - mu.m) * s1.s) AS w
             FROM xx JOIN mu USING (dim) JOIN s1 USING (vec_id)
             GROUP BY xx.dim),
    n1 AS (SELECT sqrt(sum(w * w)) AS nrm FROM w1),
    v1 AS (SELECT dim, round(w / nrm, 8) AS v FROM w1, n1),
    s2 AS (SELECT vec_id, sum((xx.val - mu.m) * v1.v) AS s
             FROM xx JOIN mu USING (dim) JOIN v1 USING (dim)
             GROUP BY vec_id),
    w2 AS (SELECT xx.dim AS dim, avg((xx.val - mu.m) * s2.s) AS w
             FROM xx JOIN mu USING (dim) JOIN s2 USING (vec_id)
             GROUP BY xx.dim),
    n2 AS (SELECT sqrt(sum(w * w)) AS nrm FROM w2),
    v2 AS (SELECT dim, round(w / nrm, 8) AS v FROM w2, n2),
    s3 AS (SELECT vec_id, sum((xx.val - mu.m) * v2.v) AS s
           FROM xx JOIN mu USING (dim) JOIN v2 USING (dim)
           GROUP BY vec_id),
    w3 AS (SELECT xx.dim AS dim, avg((xx.val - mu.m) * s3.s) AS w
           FROM xx JOIN mu USING (dim) JOIN s3 USING (vec_id)
           GROUP BY xx.dim),
    n3 AS (SELECT sqrt(sum(w * w)) AS nrm FROM w3)
    SELECT CAST(w3.dim AS INT) AS dim, round(w / nrm, 8) AS loading,
           round(nrm, 6) AS lambda_hat
    FROM w3, n3
    """,
)
def embedding_pca_power_iteration(spark, sf_dir):
    """Top principal component of the 64-d embedding corpus via 3 rounds
    of power iteration — distributed PCA WITHOUT materializing the d×d
    covariance: per round one row-local centered dot product and one
    d-sum aggregate; only the d-float mean and iterate cross the driver
    (bounded model state, the k-means/logreg precedent). v0 = 1/8
    uniform (exact in binary), per-round rounding makes the trajectory
    oracle-replayable: the DuckDB side replays the identical three
    rounds as chained CTEs over an index-unnested view. The final round
    (loadings + Rayleigh eigenvalue estimate) is computed fully
    distributed. operators/similarity.py:pca_top_component."""
    from boann_ocsf_security_data_platform_spark.operators.similarity import (
        pca_top_component,
    )

    return pca_top_component(
        _t(spark, sf_dir, "embeddings"), dim=64, iters=3
    )


@_q(
    "text_pmi_collocations",
    f"""
    WITH w AS (SELECT {_WORDS} AS ws FROM documents),
    uni AS (SELECT unnest(ws) AS t FROM w),
    ucnt AS (SELECT t, CAST(count(*) AS DOUBLE) AS c FROM uni GROUP BY t),
    bi AS (SELECT unnest(list_transform(range(1, len(ws)),
             i -> struct_pack(a := ws[i], b := ws[i + 1]))) AS p FROM w),
    bcnt AS (SELECT p.a AS w1, p.b AS w2, CAST(count(*) AS DOUBLE) AS cab
             FROM bi GROUP BY 1, 2),
    tot AS (SELECT (SELECT sum(c) FROM ucnt) AS tt,
                   (SELECT sum(cab) FROM bcnt) AS bb),
    pmi AS (SELECT w1, w2, cab,
              round(ln((cab / bb) / ((ua.c / tt) * (ub.c / tt))), 6) AS pmi
            FROM bcnt JOIN ucnt ua ON bcnt.w1 = ua.t
                 JOIN ucnt ub ON bcnt.w2 = ub.t, tot
            WHERE cab >= 5)
    SELECT w1, w2, CAST(cab AS BIGINT) AS n_pair, pmi
    FROM pmi ORDER BY pmi DESC, w1, w2 LIMIT 20
    """,
)
def text_pmi_collocations(spark, sf_dir):
    """Top-20 collocations by pointwise mutual information — PMI(a,b) =
    ln(p(ab) / p(a)p(b)) over adjacent word pairs with a min-count-5
    support floor (Church & Hanks 1990): the phrase-mining primitive
    behind tokenizer-vocabulary seeding and multi-word-expression
    detection, and the association-strength complement of the raw
    bigram counts already in the registry. Bigrams build ROW-LOCALLY
    (the ngram_counts path — no token self-join); unigram and bigram
    totals ride a broadcast one-row frame; the global top-20 plans as
    TakeOrderedAndProject with a rounded-PMI + pair tie-break so the
    cut is engine-deterministic."""
    from boann_ocsf_security_data_platform_spark.operators.text import (
        ngram_counts,
    )

    docs = _t(spark, sf_dir, "documents")
    uni = ngram_counts(docs, n=1).select(
        F.col("ngram").alias("t"),
        F.col("n_occurrences").cast("double").alias("c"),
    )
    bi = ngram_counts(docs, n=2).select(
        F.split("ngram", " ").getItem(0).alias("w1"),
        F.split("ngram", " ").getItem(1).alias("w2"),
        F.col("n_occurrences").cast("double").alias("cab"),
    )
    tot = uni.agg(F.sum("c").alias("tt")).crossJoin(
        bi.agg(F.sum("cab").alias("bb"))
    )
    ua = uni.select(F.col("t").alias("w1"), F.col("c").alias("ca"))
    ub = uni.select(F.col("t").alias("w2"), F.col("c").alias("cb"))
    pmi = F.round(
        F.log(
            (F.col("cab") / F.col("bb"))
            / ((F.col("ca") / F.col("tt")) * (F.col("cb") / F.col("tt")))
        ),
        6,
    )
    return (
        bi.filter(F.col("cab") >= 5)
        .join(ua, "w1")
        .join(ub, "w2")
        .join(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("cab").cast("long").alias("n_pair"),
            pmi.alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(20)
    )


@_q(
    "multimodal_mp4_meta_roundtrip",
    """
    SELECT doc_id, 'mp4' AS format, 'isom' AS brand,
           CAST(600 AS BIGINT) AS timescale,
           CAST((n_chars * 60 * 1000) // 600 AS BIGINT) AS duration_ms,
           CAST(2 AS INT) AS n_tracks
    FROM documents
    """,
)
def multimodal_mp4_meta_roundtrip(spark, sf_dir):
    """Synthesize a minimal ISO-BMFF (MP4) container per document in pure
    Column expressions — ftyp with the isom brand, a moov holding a v0
    mvhd whose movie duration derives from the document (n_chars × 60
    units at timescale 600) plus two trak boxes — and push it through the
    REAL box-walk parser (operators/multimodal.py:sniff_video_meta), so
    the video-container parsing that was unit-tested-only is now
    HASH-VERIFIED end-to-end: the oracle computes brand/timescale/
    duration/track-count straight from the table, integer floor division
    on both sides (the wave-25 double→INT cast lesson). Completes the
    synthesis-roundtrip trilogy: WAV (audio), PNG (image), MP4 (video).
    Synthesis is row-local; parsing is the Arrow mapInPandas stage."""
    from boann_ocsf_security_data_platform_spark.operators.multimodal import (
        sniff_video_meta,
    )

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        (F.col("n_chars") * 60).cast("long").alias("dur"),
    )
    mvhd = F.concat(
        _be_bytes(F.lit(28), 8),
        F.lit(b"mvhd"),
        _be_bytes(F.lit(0), 8),  # version 0 + flags
        _be_bytes(F.lit(0), 8),  # creation
        _be_bytes(F.lit(0), 8),  # modification
        _be_bytes(F.lit(600), 8),  # timescale
        _be_bytes(F.col("dur"), 8),  # duration in timescale units
    )
    trak = F.concat(_be_bytes(F.lit(8), 8), F.lit(b"trak"))
    moov_size = 8 + 28 + 2 * 8
    mp4 = F.concat(
        _be_bytes(F.lit(16), 8),
        F.lit(b"ftyp"),
        F.lit(b"isom"),
        _be_bytes(F.lit(0), 8),
        _be_bytes(F.lit(moov_size), 8),
        F.lit(b"moov"),
        mvhd,
        trak,
        trak,
    )
    meta = sniff_video_meta(d.select("media_id", mp4.alias("payload")))
    return meta.select(
        F.col("media_id").alias("doc_id"),
        "format",
        "brand",
        "timescale",
        "duration_ms",
        "n_tracks",
    )


@_q(
    "dedup_weighted_jaccard",
    f"""
    WITH words AS (SELECT doc_id, source, {_WORDS} AS ws FROM documents),
    wh_t AS (SELECT doc_id, source, ws, {_WH_EXPR} AS wh FROM words),
    sh AS (SELECT doc_id, source, {_HS_EXPR} AS shingles FROM wh_t),
    ex AS (SELECT doc_id, source, unnest(shingles) AS shingle FROM sh),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM sh),
    dft AS (SELECT shingle, count(*) AS df_t FROM ex GROUP BY 1),
    idf AS (SELECT shingle, ln(nn / df_t) AS idf FROM dft, n),
    exw AS (SELECT ex.doc_id, ex.source, ex.shingle, idf.idf
            FROM ex JOIN idf USING (shingle)),
    wd AS (SELECT doc_id, sum(idf) AS w FROM exw GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, sum(a.idf) AS i_w
              FROM exw a JOIN exw b
                ON a.source = b.source AND a.shingle = b.shingle
                   AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
    SELECT id_a, id_b,
           round(i_w / (wa.w + wb.w - i_w), 6) AS wjaccard
    FROM inter JOIN wd wa ON wa.doc_id = id_a
               JOIN wd wb ON wb.doc_id = id_b
    WHERE round(i_w / (wa.w + wb.w - i_w), 6) >= 0.4
    """,
)
def dedup_weighted_jaccard(spark, sf_dir):
    """IDF-weighted Jaccard near-dup pairs (idf = ln(N/df) over distinct
    3-gram shingles): boilerplate shingles contribute ~nothing, so pairs
    only score high on shared RARE content — the discriminative-overlap
    upgrade plain dedup_ngram_jaccard dilutes on template-heavy corpora.
    Same blocked self-join plan plus one vocabulary-sized df pass;
    |A∪B| weight as W_A + W_B − I so no union materializes.
    operators/dedup.py:weighted_jaccard_pairs.

    SIZE-GATED like dedup_ngram_jaccard: above HUBNESS_EXACT_MAX_ROWS,
    exact duplicates collapse first — replica pairs (weighted jaccard
    1.0 by definition) grow with copies² (81x wall in the sf10 sweep)
    and belong to exact dedup's report; the oracle arm below the gate is
    unchanged."""
    from boann_ocsf_security_data_platform_spark.operators.dedup import (
        weighted_jaccard_pairs,
    )

    d, _, pin = _docs_gated_with_pin(spark, sf_dir)
    return weighted_jaccard_pairs(d, threshold=0.4, pin_shuffle_join=pin)


@_q(
    "corpus_sequence_packing",
    f"""
    WITH t AS (SELECT doc_id, source, len({_WORDS}) AS n_tok FROM documents),
    nz AS (SELECT * FROM t WHERE n_tok > 0),
    pos AS (SELECT doc_id, source, n_tok,
              coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
            FROM nz),
    spans AS (SELECT source, doc_id, n_tok, s, s + n_tok AS e,
                unnest(range(CAST(s // 2048 AS BIGINT),
                             CAST((s + n_tok - 1) // 2048 AS BIGINT) + 1))
                  AS chunk
              FROM pos),
    per AS (SELECT source, chunk,
              least(e, (chunk + 1) * 2048) - greatest(s, chunk * 2048)
                AS overlap
            FROM spans)
    SELECT source, CAST(chunk AS BIGINT) AS chunk_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(overlap) AS BIGINT) AS n_tokens,
           round(sum(overlap) / 2048.0, 6) AS fill_ratio
    FROM per GROUP BY source, chunk
    """,
)
def corpus_sequence_packing(spark, sf_dir):
    """GPT-style sequence packing (concatenate-and-chunk): documents are
    concatenated in deterministic (source, doc_id) order and cut into
    2048-token training sequences; per chunk report how many documents
    touch it, its token fill, and the fill ratio — the
    how-much-padding-am-I-burning accounting every pretraining data prep
    runs. Zero iteration: the token offset is one ordered window cumsum,
    a document's chunk span is a row-local range explode (a doc spans
    floor(start/2048)..floor((end−1)/2048)), and per-chunk stats are one
    map-combinable aggregate. Empty documents are filtered BEFORE the
    span expansion (the sequence(1,0) descending-array trap). Integer
    floor division on both sides."""
    from boann_ocsf_security_data_platform_spark.operators.text import tokens

    seq_len = 2048
    t = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(tokens(F.col("text"))).alias("n_tok")
    ).filter(F.col("n_tok") > 0)
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pos = t.select(
        "source",
        "n_tok",
        F.coalesce(F.sum("n_tok").over(w), F.lit(0)).alias("s"),
    ).withColumn("e", F.col("s") + F.col("n_tok"))
    spans = pos.select(
        "source",
        "s",
        "e",
        F.explode(
            F.sequence(
                F.floor(F.col("s") / seq_len),
                F.floor((F.col("e") - 1) / seq_len),
            )
        ).alias("chunk"),
    )
    per = spans.select(
        "source",
        "chunk",
        (
            F.least(F.col("e"), (F.col("chunk") + 1) * seq_len)
            - F.greatest(F.col("s"), F.col("chunk") * seq_len)
        ).alias("overlap"),
    )
    return per.groupBy("source", F.col("chunk").cast("long").alias("chunk_id")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("overlap").cast("long").alias("n_tokens"),
        F.round(F.sum("overlap") / float(seq_len), 6).alias("fill_ratio"),
    )


@_q(
    "agg_mutual_information",
    """
    WITH j AS (SELECT o.o_orderpriority AS x, c.c_mktsegment AS y
               FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM j),
    pxy AS (SELECT x, y, count(*) AS cxy FROM j GROUP BY x, y),
    px AS (SELECT x, count(*) AS cx FROM j GROUP BY x),
    py AS (SELECT y, count(*) AS cy FROM j GROUP BY y)
    SELECT CAST(max(nn) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS n_cells,
           round(sum((cxy / nn) * ln((cxy * nn)
                 / (CAST(cx AS DOUBLE) * cy))), 6) AS mutual_information
    FROM pxy JOIN px USING (x) JOIN py USING (y), n
    """,
)
def agg_mutual_information(spark, sf_dir):
    """Mutual information between order priority and customer market
    segment: MI = Σ p(x,y)·ln(p(x,y)/(p(x)p(y))) in nats — the
    model-free dependence measure that complements the registry's
    chi-square test (chi-square answers 'is there dependence', MI
    answers 'how many bits does knowing one buy you'). Three
    map-combinable aggregates over one join; the marginals are
    category-sized frames broadcast back into the cell table."""
    j = (
        _t(spark, sf_dir, "orders")
        .join(
            _t(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            F.col("o_orderpriority").alias("x"),
            F.col("c_mktsegment").alias("y"),
        )
    )
    n = j.agg(F.count(F.lit(1)).cast("double").alias("nn"))
    pxy = j.groupBy("x", "y").agg(F.count(F.lit(1)).alias("cxy"))
    px = j.groupBy("x").agg(F.count(F.lit(1)).alias("cx"))
    py = j.groupBy("y").agg(F.count(F.lit(1)).alias("cy"))
    cell = (
        pxy.join(F.broadcast(px), "x")
        .join(F.broadcast(py), "y")
        .join(F.broadcast(n))
    )
    term = (F.col("cxy") / F.col("nn")) * F.log(
        (F.col("cxy") * F.col("nn"))
        / (F.col("cx").cast("double") * F.col("cy"))
    )
    return cell.agg(
        F.max("nn").cast("long").alias("n"),
        F.count(F.lit(1)).alias("n_cells"),
        F.round(F.sum(term), 6).alias("mutual_information"),
    )


@_q(
    "parts_price_elasticity",
    """
    WITH u AS (SELECT p.p_brand AS brand,
                      ln(l.l_quantity) AS lq,
                      ln(l.l_extendedprice / l.l_quantity) AS lp
               FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
               WHERE l.l_quantity > 0)
    SELECT brand, CAST(count(*) AS BIGINT) AS n,
           round(regr_slope(lq, lp), 6) AS elasticity,
           round(regr_r2(lq, lp), 6) AS r2
    FROM u GROUP BY brand
    """,
)
def parts_price_elasticity(spark, sf_dir):
    """Log-log price elasticity of demand per part brand: the OLS slope
    of ln(quantity) on ln(unit price) — the pricing-analytics primitive
    (elasticity ≈ 0 on TPC-H's uniform quantities, which is itself the
    correct finding: demand there does not respond to price). One join +
    one regr_* aggregate pass; unit price derives row-locally."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    u = (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(F.col("l_quantity") > 0)
        .select(
            F.col("p_brand").alias("brand"),
            F.log("l_quantity").alias("lq"),
            F.log(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "lp"
            ),
        )
    )
    return u.groupBy("brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.expr("regr_slope(lq, lp)"), 6).alias("elasticity"),
        F.round(F.expr("regr_r2(lq, lp)"), 6).alias("r2"),
    )


@_q(
    "agg_hill_tail_index",
    """
    WITH r AS (SELECT o_totalprice AS x,
                 row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey)
                   AS rk
               FROM orders),
    xk AS (SELECT x AS x_ref FROM r WHERE rk = 501)
    SELECT CAST(500 AS BIGINT) AS k,
           round(avg(ln(x / x_ref)), 6) AS hill_xi,
           round(1.0 / avg(ln(x / x_ref)), 6) AS tail_alpha,
           round(max(x), 2) AS x_max
    FROM r, xk WHERE rk <= 500
    """,
)
def agg_hill_tail_index(spark, sf_dir):
    """Hill estimator of the heavy-tail index over the top-500 order
    values: ξ = (1/k)·Σ ln(x_(i)/x_(k+1)), α = 1/ξ — the
    does-this-distribution-have-a-power-law-tail diagnostic behind
    skew-aware partitioning decisions and top-heavy revenue analysis
    (TPC-H's bounded uniform totals correctly read as thin-tailed,
    large α). The order statistics come from one ranked window with a
    unique-key tie-break (deterministic cut), the k+1-st value rides a
    broadcast one-row frame, and the estimator is a single aggregate —
    at 100 TB replace the global sort with a top-(k+1)
    TakeOrderedAndProject; semantics unchanged."""
    r = _t(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("x"),
        F.row_number()
        .over(Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")))
        .alias("rk"),
    )
    xk = r.filter(F.col("rk") == 501).select(F.col("x").alias("x_ref"))
    top = r.filter(F.col("rk") <= 500).join(F.broadcast(xk))
    xi = F.avg(F.log(F.col("x") / F.col("x_ref")))
    return top.agg(
        F.lit(500).cast("long").alias("k"),
        F.round(xi, 6).alias("hill_xi"),
        F.round(F.lit(1.0) / xi, 6).alias("tail_alpha"),
        F.round(F.max("x"), 2).alias("x_max"),
    )


@_q(
    "orders_mom_growth",
    """
    WITH m AS (SELECT date_trunc('month', o_orderdate) AS month,
                      sum(o_totalprice) AS rev,
                      count(*) AS n_orders
               FROM orders GROUP BY 1)
    SELECT month,
           round(rev, 2) AS revenue,
           CAST(n_orders AS BIGINT) AS n_orders,
           round(100.0 * (rev - lag(rev) OVER (ORDER BY month))
                 / lag(rev) OVER (ORDER BY month), 4) AS mom_pct,
           round(avg(rev) OVER (ORDER BY month
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2)
             AS rev_3mo_avg
    FROM m
    """,
)
def orders_mom_growth(spark, sf_dir):
    """Month-over-month revenue growth with a trailing 3-month average —
    the reporting-layer staple (growth %, smoothed trend) expressed as a
    month-grain rollup plus two ordered windows over the BOUNDED monthly
    series: the scan aggregates to ~one row per month before any window
    runs, so the ordered computation never touches raw orders. NULL
    mom_pct on the first month (no prior) on both engines."""
    m = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.date_trunc("month", F.col("o_orderdate")).alias("month")
        )
        .agg(
            F.sum("o_totalprice").alias("rev"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    w = Window.orderBy("month")
    return m.select(
        "month",
        F.round("rev", 2).alias("revenue"),
        F.col("n_orders").cast("long").alias("n_orders"),
        F.round(
            100.0 * (F.col("rev") - F.lag("rev").over(w)) / F.lag("rev").over(w),
            4,
        ).alias("mom_pct"),
        F.round(F.avg("rev").over(w.rowsBetween(-2, 0)), 2).alias(
            "rev_3mo_avg"
        ),
    )


@_q(
    "text_kneser_ney_bigrams",
    f"""
    WITH w AS (SELECT {_WORDS} AS ws FROM documents),
    bi AS (SELECT unnest(list_transform(range(1, len(ws)),
             i -> struct_pack(a := ws[i], b := ws[i + 1]))) AS p FROM w),
    bc AS (SELECT p.a AS w1, p.b AS w2, count(*) AS c FROM bi GROUP BY 1, 2),
    uc AS (SELECT w1, sum(c) AS cw1, count(*) AS n_follow FROM bc GROUP BY w1),
    cont AS (SELECT w2, count(*) AS n_prec FROM bc GROUP BY w2),
    tot AS (SELECT CAST(count(*) AS DOUBLE) AS n_bi_types FROM bc),
    scored AS (
      SELECT bc.w1, bc.w2, bc.c,
        round(greatest(bc.c - 0.75, 0) / uc.cw1
              + (0.75 * uc.n_follow / uc.cw1)
                * (cont.n_prec / n_bi_types), 6) AS p_kn
      FROM bc JOIN uc USING (w1) JOIN cont USING (w2), tot)
    SELECT w1, w2, CAST(c AS BIGINT) AS n_pair, p_kn
    FROM scored ORDER BY p_kn DESC, w1, w2 LIMIT 25
    """,
)
def text_kneser_ney_bigrams(spark, sf_dir):
    """Kneser-Ney smoothed bigram probabilities (Kneser & Ney 1995, the
    workhorse n-gram smoothing): P_KN(w2|w1) = max(c−d,0)/c(w1) +
    d·|follow(w1)|/c(w1) · |prec(w2)|/|bigram types|, d = 0.75 — the
    CONTINUATION-count backoff that distinguishes versatile words from
    frequent-but-rigid ones, which add-α smoothing (the registry's
    bigram LM) cannot. Everything is exact integer counts from one
    row-local bigram pass + three vocabulary-sized aggregates; the
    top-25 cut is rounded-probability + pair tie-broken. The corpus-LM
    depth entry beside bigram_lm_score and BPE."""
    from boann_ocsf_security_data_platform_spark.operators.text import (
        ngram_counts,
    )

    docs = _t(spark, sf_dir, "documents")
    bc = ngram_counts(docs, n=2).select(
        F.split("ngram", " ").getItem(0).alias("w1"),
        F.split("ngram", " ").getItem(1).alias("w2"),
        F.col("n_occurrences").alias("c"),
    )
    uc = bc.groupBy("w1").agg(
        F.sum("c").alias("cw1"), F.count(F.lit(1)).alias("n_follow")
    )
    cont = bc.groupBy("w2").agg(F.count(F.lit(1)).alias("n_prec"))
    tot = bc.agg(F.count(F.lit(1)).cast("double").alias("n_bi_types"))
    d = 0.75
    p_kn = F.round(
        F.greatest(F.col("c") - d, F.lit(0.0)) / F.col("cw1")
        + (d * F.col("n_follow") / F.col("cw1"))
        * (F.col("n_prec") / F.col("n_bi_types")),
        6,
    )
    return (
        # unigram-context and continuation-count tables are VOCABULARY-
        # scaling (derived aggregates over the bigram table) — pinned
        # above the measured-count threshold; the one-row total keeps
        # its broadcast
        bc.join(_pin(uc, _gates.pin_shuffle_join(_table_count(spark, sf_dir, "documents"))), "w1")
        .join(_pin(cont, _gates.pin_shuffle_join(_table_count(spark, sf_dir, "documents"))), "w2")
        .join(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("c").cast("long").alias("n_pair"),
            p_kn.alias("p_kn"),
        )
        .orderBy(F.desc("p_kn"), "w1", "w2")
        .limit(25)
    )


@_q(
    "graph_community_modularity",
    f"""
    WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                FROM lineitem WHERE year(l_shipdate) = 1995),
    ec AS (SELECT a.pk AS u, b.pk AS v FROM li a
           JOIN li b ON a.ok = b.ok AND a.pk < b.pk
           GROUP BY a.pk, b.pk),
    e2 AS (SELECT u AS a, v AS b FROM ec UNION SELECT v, u FROM ec),
    l0 AS (SELECT DISTINCT a AS node, a AS label FROM e2),
    {_lpa_iter('l0', 'i1')},
    {_lpa_iter('i1', 'i2')},
    {_lpa_iter('i2', 'i3')},
    m AS (SELECT CAST(count(*) AS DOUBLE) AS mm FROM ec),
    deg AS (SELECT a AS node, count(*) AS d FROM e2 GROUP BY a),
    within AS (SELECT CAST(count(*) AS DOUBLE) AS wc, la.label
               FROM ec JOIN i3 la ON ec.u = la.node
                       JOIN i3 lb ON ec.v = lb.node
               WHERE la.label = lb.label GROUP BY la.label),
    dsum AS (SELECT i3.label, CAST(sum(d) AS DOUBLE) AS dc
             FROM i3 JOIN deg USING (node) GROUP BY i3.label),
    terms AS (SELECT dsum.label,
                coalesce(within.wc, 0.0) / mm
                  - (dsum.dc / (2 * mm)) * (dsum.dc / (2 * mm)) AS q
              FROM dsum LEFT JOIN within ON dsum.label = within.label, m)
    SELECT CAST((SELECT count(*) FROM terms) AS BIGINT) AS n_communities,
           CAST((SELECT count(*) FROM l0) AS BIGINT) AS n_nodes,
           CAST(max(mm) AS BIGINT) AS n_edges,
           round(sum(q), 6) AS modularity
    FROM terms, m
    """,
)
def graph_community_modularity(spark, sf_dir):
    """Newman modularity Q = Σ_c (m_c/m − (d_c/2m)²) of the communities
    the 3-round label propagation finds on the 1995 part-co-order graph —
    the did-the-clustering-actually-find-structure score (Q > 0 means
    denser-than-random within communities), making this the evaluation
    harness for graph_label_propagation exactly as dedup_minhash_eval
    evaluates the LSH pipeline. Reuses the SAME deterministic LPA rounds
    (min-label tie-break, oracle replays them as CTEs); the score itself
    is two community-sized aggregates joined on the bounded label table.
    operators/graph.py:label_propagation."""
    from boann_ocsf_security_data_platform_spark.operators.graph import (
        label_propagation,
    )

    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.year("l_shipdate") == 1995)
        .select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
        )
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    ec = (
        a.join(b, "ok")
        .where(F.col("a.pk") < F.col("b.pk"))
        .select(F.col("a.pk").alias("u"), F.col("b.pk").alias("v"))
        .distinct()
        .persist()
    )
    labels = label_propagation(
        ec.select(F.col("u").alias("src"), F.col("v").alias("dst")), iters=3
    ).persist()
    e2 = ec.select(F.col("u").alias("x")).unionAll(
        ec.select(F.col("v").alias("x"))
    )
    deg = e2.groupBy("x").agg(F.count(F.lit(1)).alias("d"))
    m = ec.agg(F.count(F.lit(1)).cast("double").alias("mm"))
    la = labels.select(F.col("node").alias("u"), F.col("label").alias("cu"))
    lb = labels.select(F.col("node").alias("v"), F.col("label").alias("cv"))
    within = (
        ec.join(la, "u")
        .join(lb, "v")
        .filter(F.col("cu") == F.col("cv"))
        .groupBy(F.col("cu").alias("label"))
        .agg(F.count(F.lit(1)).cast("double").alias("wc"))
    )
    dsum = (
        labels.join(deg, labels.node == deg.x)
        .groupBy("label")
        .agg(F.sum("d").cast("double").alias("dc"))
    )
    terms = (
        dsum.join(within, "label", "left")
        .join(F.broadcast(m))
        .select(
            (
                F.coalesce("wc", F.lit(0.0)) / F.col("mm")
                - (F.col("dc") / (2 * F.col("mm")))
                * (F.col("dc") / (2 * F.col("mm")))
            ).alias("q")
        )
    )
    n_nodes = labels.count()
    n_comms = dsum.count()
    out = terms.join(F.broadcast(m)).agg(
        F.lit(n_comms).cast("long").alias("n_communities"),
        F.lit(n_nodes).cast("long").alias("n_nodes"),
        F.max("mm").cast("long").alias("n_edges"),
        F.round(F.sum("q"), 6).alias("modularity"),
    )
    from boann_ocsf_security_data_platform_spark.operators.dedup import (
        _register_caches,
    )

    return _register_caches(out, [ec, labels])


@_q(
    "text_token_burstiness",
    f"""
    WITH w AS (SELECT doc_id, unnest({_WORDS}) AS term FROM documents),
    per_doc AS (SELECT doc_id, term, count(*) AS c FROM w GROUP BY 1, 2),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
    st AS (SELECT term,
             CAST(count(*) AS BIGINT) AS df_t,
             sum(c) AS total,
             sum(c * c) AS sq
           FROM per_doc GROUP BY term),
    disp AS (SELECT term, df_t, CAST(total AS BIGINT) AS total,
               (sq / n_docs - (total / n_docs) * (total / n_docs))
                 / (total / n_docs) AS vmr
             FROM st, n WHERE df_t >= 10)
    SELECT term, df_t, total, round(vmr, 6) AS burstiness
    FROM disp ORDER BY round(vmr, 6) DESC, term LIMIT 25
    """,
)
def text_token_burstiness(spark, sf_dir):
    """Token burstiness: the variance-to-mean ratio of per-document
    counts across the corpus (Church & Gale 1995) — bursty tokens
    (VMR ≫ 1 after the Poisson baseline of 1) are topical CONTENT,
    evenly-sprinkled tokens are function words / boilerplate, making
    this the statistics-only content-word detector (no stopword list)
    and a generated-text tell (LLM output under-disperses). Zero-count
    documents enter the moments implicitly via the corpus-size
    denominator — no dense doc×term frame is ever built: one (doc,term)
    aggregate then one vocabulary-sized moment rollup. Deterministic
    rounded-VMR + term tie-broken top-25."""
    from boann_ocsf_security_data_platform_spark.operators.text import tokens

    per_doc = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = _t(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).cast("double").alias("n_docs")
    )
    st = per_doc.groupBy("term").agg(
        F.count(F.lit(1)).alias("df_t"),
        F.sum("c").alias("total"),
        F.sum(F.col("c") * F.col("c")).alias("sq"),
    )
    mean = F.col("total") / F.col("n_docs")
    vmr = (F.col("sq") / F.col("n_docs") - mean * mean) / mean
    return (
        st.filter(F.col("df_t") >= 10)
        .join(F.broadcast(n))
        .select(
            "term",
            F.col("df_t").cast("long").alias("df_t"),
            F.col("total").cast("long").alias("total"),
            F.round(vmr, 6).alias("burstiness"),
        )
        .orderBy(F.desc("burstiness"), "term")
        .limit(25)
    )


@_q(
    "parts_abc_xyz_classification",
    """
    WITH pm AS (SELECT l_partkey AS pk,
                       date_trunc('month', l_shipdate) AS month,
                       sum(l_quantity) AS qty,
                       sum(l_extendedprice) AS rev
                FROM lineitem GROUP BY 1, 2),
    per_part AS (SELECT pk, sum(rev) AS rev,
                   CASE WHEN avg(qty) > 0
                        THEN stddev_samp(qty) / avg(qty) ELSE NULL END AS cv,
                   count(*) AS n_months
                 FROM pm GROUP BY pk),
    ranked AS (SELECT *,
                 sum(rev) OVER (ORDER BY rev DESC, pk
                   ROWS UNBOUNDED PRECEDING) AS cum_rev,
                 sum(rev) OVER () AS tot_rev
               FROM per_part),
    classed AS (SELECT pk, rev, cv, n_months,
                  CASE WHEN cum_rev / tot_rev <= 0.8 THEN 'A'
                       WHEN cum_rev / tot_rev <= 0.95 THEN 'B'
                       ELSE 'C' END AS abc,
                  CASE WHEN cv IS NULL OR n_months < 2 THEN 'Z'
                       WHEN cv <= 0.5 THEN 'X'
                       WHEN cv <= 1.0 THEN 'Y'
                       ELSE 'Z' END AS xyz
                FROM ranked)
    SELECT abc, xyz, CAST(count(*) AS BIGINT) AS n_parts,
           round(sum(rev), 2) AS revenue,
           round(avg(cv), 6) AS avg_cv
    FROM classed GROUP BY abc, xyz
    """,
)
def parts_abc_xyz_classification(spark, sf_dir):
    """ABC-XYZ inventory classification — the supply-chain planning
    matrix: ABC from the cumulative revenue Pareto (top 80% = A, next
    15% = B) over a deterministically-ranked running sum, XYZ from the
    coefficient of variation of monthly demand (steady X ≤ 0.5, variable
    Y ≤ 1.0, erratic/sparse Z). The ordered window runs over the
    part-grain frame (not raw lineitem), the monthly rollup is one
    map-combinable pass, and the output is the bounded 3×3 matrix with
    revenue and mean-CV per cell."""
    pm = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_partkey").alias("pk"),
            F.date_trunc("month", F.col("l_shipdate")).alias("month"),
        )
        .agg(
            F.sum("l_quantity").alias("qty"),
            F.sum("l_extendedprice").alias("rev"),
        )
    )
    # The part-grain frame is consumed four times (quantile sketch,
    # bucket-prefix branch, total branch, main) and its lineage is the
    # expensive double rollup of the lineitem fact — pin it so the fact
    # is read once (DISK_ONLY above the fact gate, the
    # graph_degree_assortativity discipline; isolated sf100: 365 s of
    # recomputes -> one rollup).
    pin = _gates.pin_shuffle_join_fact(_table_count(spark, sf_dir, "lineitem"))
    per_part = pm.groupBy("pk").agg(
        F.sum("rev").alias("rev"),
        F.when(
            F.avg("qty") > 0, F.stddev_samp("qty") / F.avg("qty")
        ).alias("cv"),
        F.count(F.lit(1)).alias("n_months"),
    ).persist(
        StorageLevel.DISK_ONLY if pin else StorageLevel.MEMORY_AND_DISK_DESER
    )
    # Bucketed running sum (round-11: the global Window.orderBy funneled
    # the whole part grain — 20M rows at sf100 — through one task; see
    # _order_buckets). cum = prefix over strictly-higher-revenue buckets
    # + in-bucket running sum; tot rides a broadcast scalar, not a
    # whole-frame window.
    tot = per_part.agg(F.sum("rev").alias("tot_rev"))
    b = _order_buckets(per_part, "rev", ascending=False)
    w_cum = (
        Window.partitionBy("bkt")
        .orderBy(F.desc("rev"), F.asc("pk"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_pre = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    prefix = (
        b.groupBy("bkt")
        .agg(F.sum("rev").alias("bsum"))
        .select(
            "bkt",
            F.coalesce(F.sum("bsum").over(w_pre), F.lit(0.0)).alias(
                "prev_rev"
            ),
        )
    )
    ranked = (
        b.join(F.broadcast(prefix), "bkt")
        .crossJoin(F.broadcast(tot))
        .select(
            "pk",
            "rev",
            "cv",
            "n_months",
            (F.col("prev_rev") + F.sum("rev").over(w_cum)).alias("cum_rev"),
            "tot_rev",
        )
    )
    share = F.col("cum_rev") / F.col("tot_rev")
    classed = ranked.select(
        "rev",
        "cv",
        F.when(share <= 0.8, "A")
        .when(share <= 0.95, "B")
        .otherwise("C")
        .alias("abc"),
        F.when(F.col("cv").isNull() | (F.col("n_months") < 2), "Z")
        .when(F.col("cv") <= 0.5, "X")
        .when(F.col("cv") <= 1.0, "Y")
        .otherwise("Z")
        .alias("xyz"),
    )
    return classed.groupBy("abc", "xyz").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.sum("rev"), 2).alias("revenue"),
        F.round(F.avg("cv"), 6).alias("avg_cv"),
    )


@_q(
    "embedding_mmr_rerank",
    f"""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings
               WHERE vec_id = 0),
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
          WHERE vec_id <> 0),
    rel AS (SELECT c.vec_id,
              round(list_dot_product(c.v, q.v)
                    / (sqrt(list_dot_product(c.v, c.v))
                       * sqrt(list_dot_product(q.v, q.v))), 8) AS rel,
              c.v
            FROM c, q),
    p1 AS (SELECT vec_id, rel, v FROM rel
           ORDER BY rel DESC, vec_id LIMIT 1),
    s2 AS (SELECT r.vec_id, r.rel, r.v,
               round(0.7 * r.rel - 0.3 * round(list_dot_product(r.v, p1.v) / (sqrt(list_dot_product(r.v, r.v)) * sqrt(list_dot_product(p1.v, p1.v))), 8), 8) AS score
             FROM rel r, p1
             WHERE r.vec_id NOT IN (p1.vec_id)),
    p2 AS (SELECT vec_id, rel, v FROM s2
             ORDER BY score DESC, vec_id LIMIT 1),
    s3 AS (SELECT r.vec_id, r.rel, r.v,
               round(0.7 * r.rel - 0.3 * greatest(round(list_dot_product(r.v, p1.v) / (sqrt(list_dot_product(r.v, r.v)) * sqrt(list_dot_product(p1.v, p1.v))), 8), round(list_dot_product(r.v, p2.v) / (sqrt(list_dot_product(r.v, r.v)) * sqrt(list_dot_product(p2.v, p2.v))), 8)), 8) AS score
             FROM rel r, p1, p2
             WHERE r.vec_id NOT IN (p1.vec_id, p2.vec_id)),
    p3 AS (SELECT vec_id, rel, v FROM s3
             ORDER BY score DESC, vec_id LIMIT 1),
    s4 AS (SELECT r.vec_id, r.rel, r.v,
               round(0.7 * r.rel - 0.3 * greatest(round(list_dot_product(r.v, p1.v) / (sqrt(list_dot_product(r.v, r.v)) * sqrt(list_dot_product(p1.v, p1.v))), 8), round(list_dot_product(r.v, p2.v) / (sqrt(list_dot_product(r.v, r.v)) * sqrt(list_dot_product(p2.v, p2.v))), 8), round(list_dot_product(r.v, p3.v) / (sqrt(list_dot_product(r.v, r.v)) * sqrt(list_dot_product(p3.v, p3.v))), 8)), 8) AS score
             FROM rel r, p1, p2, p3
             WHERE r.vec_id NOT IN (p1.vec_id, p2.vec_id, p3.vec_id)),
    p4 AS (SELECT vec_id, rel, v FROM s4
             ORDER BY score DESC, vec_id LIMIT 1),
    s5 AS (SELECT r.vec_id, r.rel, r.v,
               round(0.7 * r.rel - 0.3 * greatest(round(list_dot_product(r.v, p1.v) / (sqrt(list_dot_product(r.v, r.v)) * sqrt(list_dot_product(p1.v, p1.v))), 8), round(list_dot_product(r.v, p2.v) / (sqrt(list_dot_product(r.v, r.v)) * sqrt(list_dot_product(p2.v, p2.v))), 8), round(list_dot_product(r.v, p3.v) / (sqrt(list_dot_product(r.v, r.v)) * sqrt(list_dot_product(p3.v, p3.v))), 8), round(list_dot_product(r.v, p4.v) / (sqrt(list_dot_product(r.v, r.v)) * sqrt(list_dot_product(p4.v, p4.v))), 8)), 8) AS score
             FROM rel r, p1, p2, p3, p4
             WHERE r.vec_id NOT IN (p1.vec_id, p2.vec_id, p3.vec_id, p4.vec_id)),
    p5 AS (SELECT vec_id, rel, v FROM s5
             ORDER BY score DESC, vec_id LIMIT 1)
    SELECT CAST(1 AS BIGINT) AS rank, vec_id, rel AS relevance FROM p1
    UNION ALL SELECT CAST(2 AS BIGINT) AS rank, vec_id, rel AS relevance FROM p2
    UNION ALL SELECT CAST(3 AS BIGINT) AS rank, vec_id, rel AS relevance FROM p3
    UNION ALL SELECT CAST(4 AS BIGINT) AS rank, vec_id, rel AS relevance FROM p4
    UNION ALL SELECT CAST(5 AS BIGINT) AS rank, vec_id, rel AS relevance FROM p5
    """,
)
def embedding_mmr_rerank(spark, sf_dir):
    """Maximal Marginal Relevance (Carbonell & Goldstein 1998): pick 5
    results for the vec_id-0 query that are RELEVANT but not redundant —
    each greedy step maximizes λ·cos(q,d) − (1−λ)·max_{s∈S} cos(d,s),
    λ=0.7 — the diversity-aware rerank every RAG retrieval stack bolts
    onto plain top-k (which happily returns five near-duplicates).
    Greedy selection is inherently sequential, but the per-step state is
    ONE selected row (id + 64-float vector): each of the 5 steps is a
    distributed argmax over the corpus with the selected vectors inlined
    as literals (bounded MODEL state crossing the driver, the
    k-means/logreg/PCA precedent), per-step 8-dp rounding + id tie-break
    making the trajectory engine-deterministic. The oracle replays the
    identical greedy steps as chained one-row CTEs; the final (rank,
    id, relevance) projection recomputes relevance distributed."""
    emb = _t(spark, sf_dir, "embeddings")
    x = F.transform(F.col("embedding"), lambda c: c.cast("double"))
    q_vec = [
        float(v)
        for v in emb.filter(F.col("vec_id") == 0)
        .select(x.alias("x"))
        .collect()[0]["x"]
    ]
    q_norm = sum(v * v for v in q_vec) ** 0.5

    def dot_lit(vec):
        arr = F.array(*[F.lit(float(v)) for v in vec])
        return F.aggregate(
            F.zip_with(F.col("x"), arr, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, y: acc + y,
        )

    x_norm = F.sqrt(
        F.aggregate(
            F.transform(F.col("x"), lambda a: a * a),
            F.lit(0.0),
            lambda acc, y: acc + y,
        )
    )
    base = emb.filter(F.col("vec_id") != 0).select(
        "vec_id", x.alias("x")
    ).withColumn(
        "rel", F.round(dot_lit(q_vec) / (x_norm * q_norm), 8)
    ).localCheckpoint(eager=True)  # 5 argmax scans reuse one pass

    selected = []  # (vec_id, rel, vector) — bounded model state
    for _ in range(5):
        if selected:
            pens = [
                F.round(
                    dot_lit(vec)
                    / (x_norm * (sum(v * v for v in vec) ** 0.5)),
                    8,
                )
                for (_, _, vec) in selected
            ]
            pen = pens[0] if len(pens) == 1 else F.greatest(*pens)
            score = F.round(0.7 * F.col("rel") - 0.3 * pen, 8)
        else:
            score = F.col("rel")
        top = (
            base.filter(
                ~F.col("vec_id").isin([s[0] for s in selected])
            )
            .orderBy(F.desc(score), F.asc("vec_id"))
            .select("vec_id", "rel", "x")
            .limit(1)
            .collect()[0]
        )
        selected.append((top["vec_id"], top["rel"], list(top["x"])))

    rank_expr = F.lit(None).cast("long")
    for i, (vid, _, _) in enumerate(reversed(selected)):
        rank_expr = F.when(
            F.col("vec_id") == vid, F.lit(len(selected) - i).cast("long")
        ).otherwise(rank_expr)
    return base.filter(
        F.col("vec_id").isin([s[0] for s in selected])
    ).select(
        rank_expr.alias("rank"),
        "vec_id",
        F.col("rel").alias("relevance"),
    )


_TEXTRANK_ORACLE = f"""
    WITH w AS (SELECT {_WORDS} AS ws FROM documents),
    bi AS (SELECT unnest(list_transform(range(1, len(ws)),
             i -> struct_pack(a := ws[i], b := ws[i + 1]))) AS p FROM w),
    bc AS (SELECT p.a AS w1, p.b AS w2, count(*) AS c FROM bi
           WHERE p.a <> p.b GROUP BY 1, 2),
    e AS (SELECT src, dst, CAST(sum(c) AS DOUBLE) AS w FROM
            (SELECT w1 AS src, w2 AS dst, c FROM bc
             UNION ALL SELECT w2, w1, c FROM bc)
          GROUP BY 1, 2),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    outw AS (SELECT src, sum(w) AS w_out FROM e GROUP BY src),
    r0 AS (SELECT node, round(1.0 / n, 8) AS r FROM nodes, nn),
    d1 AS (SELECT coalesce(sum(r), 0.0) AS dang FROM r0
             LEFT JOIN outw ON r0.node = outw.src WHERE outw.src IS NULL),
    c1 AS (SELECT e.dst AS node, sum(r0.r * e.w / outw.w_out) AS c
             FROM e JOIN r0 ON e.src = r0.node
             JOIN outw ON e.src = outw.src GROUP BY e.dst),
    r1 AS (SELECT nodes.node,
                    round((1 - 0.85) / n
                          + 0.85 * (coalesce(c1.c, 0.0) + dang / n),
                          8) AS r
             FROM nodes LEFT JOIN c1 ON nodes.node = c1.node, nn, d1),
    d2 AS (SELECT coalesce(sum(r), 0.0) AS dang FROM r1
             LEFT JOIN outw ON r1.node = outw.src WHERE outw.src IS NULL),
    c2 AS (SELECT e.dst AS node, sum(r1.r * e.w / outw.w_out) AS c
             FROM e JOIN r1 ON e.src = r1.node
             JOIN outw ON e.src = outw.src GROUP BY e.dst),
    r2 AS (SELECT nodes.node,
                    round((1 - 0.85) / n
                          + 0.85 * (coalesce(c2.c, 0.0) + dang / n),
                          8) AS r
             FROM nodes LEFT JOIN c2 ON nodes.node = c2.node, nn, d2),
    d3 AS (SELECT coalesce(sum(r), 0.0) AS dang FROM r2
             LEFT JOIN outw ON r2.node = outw.src WHERE outw.src IS NULL),
    c3 AS (SELECT e.dst AS node, sum(r2.r * e.w / outw.w_out) AS c
             FROM e JOIN r2 ON e.src = r2.node
             JOIN outw ON e.src = outw.src GROUP BY e.dst),
    r3 AS (SELECT nodes.node,
                    round((1 - 0.85) / n
                          + 0.85 * (coalesce(c3.c, 0.0) + dang / n),
                          8) AS r
             FROM nodes LEFT JOIN c3 ON nodes.node = c3.node, nn, d3)
    SELECT node AS term, round(r, 6) AS score FROM r3
    ORDER BY round(r, 6) DESC, node LIMIT 20
    """


@_q("text_textrank_keywords", _TEXTRANK_ORACLE)
def text_textrank_keywords(spark, sf_dir):
    """TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank on
    the word co-occurrence graph (adjacent-word edges, undirected,
    count-weighted, self-loops dropped), top-20 terms by rank — the
    graph-centrality keyword family beside RAKE (degree-scored phrases)
    and TF-IDF (frequency-scored terms): a word matters because IMPORTANT
    words co-occur with it, which pure counting cannot express. Reuses
    the verified fixed-round pagerank operator verbatim on string nodes;
    edges build row-locally from the same bigram pass as the n-gram
    family; the oracle replays the full trajectory (graph build + 3
    rounds) as CTEs. operators/graph.py:pagerank."""
    from boann_ocsf_security_data_platform_spark.operators.graph import (
        pagerank,
    )
    from boann_ocsf_security_data_platform_spark.operators.text import (
        ngram_counts,
    )

    bc = (
        ngram_counts(_t(spark, sf_dir, "documents"), n=2)
        .select(
            F.split("ngram", " ").getItem(0).alias("w1"),
            F.split("ngram", " ").getItem(1).alias("w2"),
            F.col("n_occurrences").alias("c"),
        )
        .filter(F.col("w1") != F.col("w2"))
    )
    edges = (
        bc.select(
            F.col("w1").alias("src"), F.col("w2").alias("dst"), "c"
        )
        .unionAll(
            bc.select(
                F.col("w2").alias("src"), F.col("w1").alias("dst"), "c"
            )
        )
        .groupBy("src", "dst")
        .agg(F.sum("c").cast("double").alias("w"))
    )
    return (
        pagerank(edges, weight_col="w", iters=3)
        .select(
            F.col("node").alias("term"),
            F.round("pagerank", 6).alias("score"),
        )
        .orderBy(F.desc("score"), "term")
        .limit(20)
    )


@_q(
    "feature_woe_information_value",
    """
    WITH b AS (SELECT o_totalprice,
                 CAST(o_orderpriority = '1-URGENT' AS INT) AS y,
                 ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bin
               FROM orders),
    tot AS (SELECT CAST(sum(y) AS DOUBLE) AS n_pos,
                   CAST(count(*) - sum(y) AS DOUBLE) AS n_neg
            FROM b),
    per AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
              sum(y) AS pos, count(*) - sum(y) AS neg
            FROM b GROUP BY bin)
    SELECT CAST(bin AS BIGINT) AS bin, n,
           round((pos / n_pos) / (neg / n_neg), 6) AS odds_ratio,
           round(ln((pos / n_pos) / (neg / n_neg)), 6) AS woe,
           round((pos / n_pos - neg / n_neg)
                 * ln((pos / n_pos) / (neg / n_neg)), 8) AS iv_term
    FROM per, tot
    """,
)
def feature_woe_information_value(spark, sf_dir):
    """Weight of Evidence / Information Value per price decile for the
    is-the-order-urgent target — the credit-scoring encoding standard
    (WoE = ln(share-of-positives / share-of-negatives) per bin; the IV
    terms sum to the feature's predictive power). Composes the exact
    ntile binning with one conditional aggregate; totals ride a
    broadcast one-row frame. Near-zero IV on TPC-H's independent
    priority column is the correct reading. The supervised sibling of
    feature_quantile_binning beside feature_loo_target_encoding."""
    # bucket-decomposed exact ntile (round 11 — the literal ntile was a
    # global single-task fact sort; see _bucketed_ntile)
    b = _bucketed_ntile(
        _t(spark, sf_dir, "orders").select(
            "o_totalprice",
            "o_orderkey",
            (F.col("o_orderpriority") == "1-URGENT").cast("int").alias("y"),
        ),
        "o_totalprice",
        "o_orderkey",
        10,
    )
    tot = b.agg(
        F.sum("y").cast("double").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("y")).cast("double").alias("n_neg"),
    )
    per = b.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("pos"),
        (F.count(F.lit(1)) - F.sum("y")).alias("neg"),
    )
    pr = F.col("pos") / F.col("n_pos")
    nr = F.col("neg") / F.col("n_neg")
    return per.join(F.broadcast(tot)).select(
        F.col("bin").cast("long").alias("bin"),
        F.col("n").cast("long").alias("n"),
        F.round(pr / nr, 6).alias("odds_ratio"),
        F.round(F.log(pr / nr), 6).alias("woe"),
        F.round((pr - nr) * F.log(pr / nr), 8).alias("iv_term"),
    )


@_q(
    "knn_hard_negatives",
    f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank FROM (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             round({_COS}, 6) AS cosine,
             row_number() OVER (PARTITION BY a.vec_id
                                ORDER BY round({_COS}, 6) DESC, b.vec_id)
               AS rank
      FROM e a JOIN e b ON a.vec_id <> b.vec_id
      WHERE a.vec_id < 10 AND round({_COS}, 6) < 0.9) t
    WHERE rank <= 5
    """,
)
def knn_hard_negatives(spark, sf_dir):
    """Hard-negative mining for contrastive retrieval training: per query
    the 5 MOST similar vectors that stay under cosine 0.9 — hard enough
    to teach, capped so near-duplicates never enter the negative set
    (the standard contrastive-training pitfall). Same broadcast plan as
    knn_bruteforce_cosine with the cap applied before ranking.
    operators/similarity.py:hard_negatives.

    SIZE-GATED (round 9, r8 VERDICT item #6): below the gate, exact
    brute force (the oracle-hashed arm). Above it, probes route through
    the PERSISTED IVF index — built once per (sf, shard) path and REUSED
    on every later call (the build-once/query-many amortization that is
    the entire point of a serving index: per-call training can never
    beat a 10-probe brute scan, because Lloyd iterations alone cost
    iters × n_centroids cosines per row vs the scan's |probes|). The
    build trains on a bounded hash-sample (train_sample_size — a few
    dozen points per centroid place the lists; the corpus still gets one
    exact assignment pass), lists are auto-sized (auto_n_centroids), and
    the query scores only the probe's 4 nearest lists with the same
    max_cosine cap before ranking — candidate work per query batch drops
    from the whole corpus to the probed fraction. Every returned cosine
    is EXACT (list selection never changes scores). The funnel's index
    stage (append_to_ivf_index) maintains the same layout
    incrementally."""
    from boann_ocsf_security_data_platform_spark.operators.similarity import (
        auto_n_centroids,
        build_ivf_index,
        hard_negatives,
        ivf_index_is_complete,
        query_ivf_index,
    )

    emb = _t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10)

    def _exact(e, n):
        return hard_negatives(e, probes, k=5, max_cosine=0.9)

    def _scale(e, n):
        import os
        import tempfile

        tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
        path = os.path.join(
            tempfile.gettempdir(),
            f"boann_ivf_hardneg_{tag}_{_artifact_scope()}",
        )
        # reuse gated on the lists commit marker, NOT directory
        # existence: a crash mid-build leaves centroids/ without a
        # complete lists generation, and querying that half-index
        # silently returns incomplete negatives (ADVICE r9 #1)
        if not ivf_index_is_complete(spark, path):
            nc = auto_n_centroids(n)
            build_ivf_index(
                e, path, n_centroids=nc, train_iters=2,
                train_sample_size=64 * nc,
            )
        return query_ivf_index(
            spark, path, probes, k=5, n_probe=4, max_cosine=0.9
        )

    return size_gated(emb, _exact, _scale, HUBNESS_EXACT_MAX_ROWS).withColumn(
        "rank", F.col("rank").cast("long")
    )


@_q(
    "events_retention_triangle",
    """
    WITH ua AS (SELECT DISTINCT user_id, date_trunc('month', ts) AS month
                FROM events),
    cohort AS (SELECT user_id, min(month) AS cm FROM ua GROUP BY user_id),
    sizes AS (SELECT cm, count(*) AS n_cohort FROM cohort GROUP BY cm),
    cells AS (SELECT cohort.cm, date_diff('month', cohort.cm, ua.month) AS k,
                     count(DISTINCT ua.user_id) AS n_active
              FROM ua JOIN cohort USING (user_id)
              GROUP BY 1, 2)
    SELECT cells.cm AS cohort_month, CAST(k AS BIGINT) AS k,
           CAST(n_active AS BIGINT) AS n_active,
           CAST(n_cohort AS BIGINT) AS n_cohort,
           round(100.0 * n_active / n_cohort, 4) AS retention_pct
    FROM cells JOIN sizes ON cells.cm = sizes.cm
    """,
)
def events_retention_triangle(spark, sf_dir):
    """The cohort retention triangle — product analytics' canonical
    table: users grouped by first-activity month, each cell the share of
    the cohort still active k months later. One distinct
    (user, month) pass feeds both the cohort assignment (min month per
    user) and the activity cells; cohort sizes are a month-grain frame
    broadcast back. Month arithmetic stays on truncated timestamps
    (integer month difference on both engines — no epoch math)."""
    ua = (
        _t(spark, sf_dir, "events")
        .select(
            "user_id", F.date_trunc("month", F.col("ts")).alias("month")
        )
        .distinct()
    )
    cohort = ua.groupBy("user_id").agg(F.min("month").alias("cm"))
    sizes = cohort.groupBy("cm").agg(F.count(F.lit(1)).alias("n_cohort"))
    cells = (
        ua.join(cohort, "user_id")
        .groupBy(
            "cm",
            F.months_between(F.col("month"), F.col("cm"))
            .cast("long")
            .alias("k"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )
    return cells.join(F.broadcast(sizes), "cm").select(
        F.col("cm").alias("cohort_month"),
        "k",
        F.col("n_active").cast("long").alias("n_active"),
        F.col("n_cohort").cast("long").alias("n_cohort"),
        F.round(
            100.0 * F.col("n_active") / F.col("n_cohort"), 4
        ).alias("retention_pct"),
    )


@_q(
    "events_nelson_aalen_hazard",
    """
    WITH s AS (SELECT user_id, min(ts) AS t0 FROM events
               WHERE event_type = 'signup' GROUP BY user_id),
    p AS (SELECT user_id, min(ts) AS t1 FROM events
          WHERE event_type = 'purchase' GROUP BY user_id),
    horizon AS (SELECT max(ts) AS tmax FROM events),
    subj AS (SELECT s.user_id,
               CASE WHEN p.t1 IS NOT NULL AND p.t1 >= s.t0 THEN
                 date_diff('microsecond', s.t0, p.t1) / 1000000.0
               ELSE date_diff('microsecond', s.t0, h.tmax) / 1000000.0 END
                 AS dur,
               (p.t1 IS NOT NULL AND p.t1 >= s.t0) AS converted
             FROM s LEFT JOIN p ON s.user_id = p.user_id, horizon h),
    et AS (SELECT dur AS t, count(*) AS d FROM subj
           WHERE converted GROUP BY dur),
    risk AS (SELECT et.t, et.d,
               (SELECT count(*) FROM subj WHERE subj.dur >= et.t) AS n_risk
             FROM et)
    SELECT round(t, 3) AS t_seconds, CAST(d AS BIGINT) AS n_events,
           CAST(n_risk AS BIGINT) AS n_risk,
           round(sum(d / CAST(n_risk AS DOUBLE))
                 OVER (ORDER BY t ROWS UNBOUNDED PRECEDING), 6)
             AS cum_hazard,
           round(exp(-sum(d / CAST(n_risk AS DOUBLE))
                 OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)), 4)
             AS breslow_survival
    FROM risk ORDER BY t
    """,
)
def events_nelson_aalen_hazard(spark, sf_dir):
    """Nelson-Aalen cumulative hazard H(t) = Σ d_i/n_i with the Breslow
    survival estimate exp(−H) — the Kaplan-Meier sibling that sums
    hazard INCREMENTS instead of multiplying survival factors, which is
    what you need to COMPARE risk between periods or plot hazard slope
    (constant slope ⇒ exponential/memoryless conversion; KM's product
    form can't read slope directly). Identical right-censored subject
    derivation and plan shape as events_kaplan_meier — duration-grain
    rollup, descending running sum for at-risk counts, ascending running
    sum for the hazard — so the two curves are comparable cell-for-cell."""
    e = _t(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "t0"
        ),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("t1"),
        F.max("ts").alias("_tmax_u"),
    )
    whor = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    conv = F.col("t1").isNotNull() & (F.col("t1") >= F.col("t0"))
    subj = (
        per_user.withColumn("tmax", F.max("_tmax_u").over(whor))
        .filter(F.col("t0").isNotNull())
        .select(
            F.when(
                conv,
                F.expr("timestampdiff(MICROSECOND, t0, t1)").cast("double")
                / 1_000_000.0,
            )
            .otherwise(
                F.expr("timestampdiff(MICROSECOND, t0, tmax)").cast(
                    "double"
                )
                / 1_000_000.0
            )
            .alias("dur"),
            conv.alias("converted"),
        )
    )
    per_dur = subj.groupBy("dur").agg(
        F.sum(F.when(F.col("converted"), 1).otherwise(0)).alias("d"),
        F.count(F.lit(1)).alias("a"),
    )
    wdesc = Window.orderBy(F.desc("dur")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = per_dur.withColumn("n_risk", F.sum("a").over(wdesc)).filter(
        F.col("d") > 0
    )
    wasc = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    haz = F.sum(F.col("d") / F.col("n_risk").cast("double")).over(wasc)
    return risk.select(
        F.round("dur", 3).alias("t_seconds"),
        F.col("d").cast("long").alias("n_events"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.round(haz, 6).alias("cum_hazard"),
        F.round(F.exp(-haz), 4).alias("breslow_survival"),
    ).orderBy("t_seconds")


@_q(
    "join_price_band_pairs",
    """
    WITH o AS (SELECT o_orderkey AS k, o_orderpriority AS pri,
                      o_totalprice AS v, year(o_orderdate) AS y
               FROM orders WHERE o_orderkey % 20 = 0)
    SELECT a.pri, CAST(count(*) AS BIGINT) AS n_pairs,
           round(avg(abs(a.v - b.v)), 6) AS avg_diff,
           round(max(abs(a.v - b.v)), 2) AS max_diff
    FROM o a JOIN o b
      ON a.pri = b.pri AND a.k < b.k AND a.y <> b.y
         AND abs(a.v - b.v) <= 100.0
    GROUP BY a.pri
    """,
)
def join_price_band_pairs(spark, sf_dir):
    """Banded numeric similarity join — |price_a − price_b| ≤ ε across
    different years within a priority class, the generic
    match-on-a-numeric-band primitive (price matching, sensor
    correlation, fraud twin-transactions). The naive theta join is
    quadratic; this plans as an EQUI-join on floor(v/ε) buckets with
    each left row exploded to its 3 candidate buckets (a band match can
    only sit in the same or an adjacent bucket — same trick as the LSH
    band join), then the exact band filter. The oracle runs the plain
    theta join (exact semantics); the plan audit pins the bucketed path
    to hash joins (no cartesian). Sampled keys keep the pair count
    bounded at verification SF; per-class aggregate output."""
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 20 == 0)
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderpriority").alias("pri"),
            F.col("o_totalprice").alias("v"),
            F.year("o_orderdate").alias("y"),
        )
    )
    eps = 100.0
    bkt = F.floor(F.col("v") / eps).cast("long")
    a = o.select(
        "k", "pri", "v", "y",
        F.explode(
            F.array(bkt - 1, bkt, bkt + 1)
        ).alias("b"),
    )
    b = o.select(
        F.col("k").alias("k2"),
        F.col("pri").alias("pri2"),
        F.col("v").alias("v2"),
        F.col("y").alias("y2"),
        bkt.alias("b"),
    )
    pairs = a.join(b, ["b"]).filter(
        (F.col("pri") == F.col("pri2"))
        & (F.col("k") < F.col("k2"))
        & (F.col("y") != F.col("y2"))
        & (F.abs(F.col("v") - F.col("v2")) <= eps)
    )
    return pairs.groupBy("pri").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.avg(F.abs(F.col("v") - F.col("v2"))), 6).alias(
            "avg_diff"
        ),
        F.round(F.max(F.abs(F.col("v") - F.col("v2"))), 2).alias(
            "max_diff"
        ),
    )


@_q(
    "events_bitmap_activity_rollup",
    """
    WITH daily AS (SELECT event_type, date_trunc('day', ts) AS day,
                     bit_or(CAST(1 AS BIGINT) << CAST(user_id % 63 AS INT))
                       AS bm
                   FROM events GROUP BY 1, 2)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(bit_count(bm)) AS BIGINT) AS daily_slot_total,
           CAST(bit_count(bit_or(bm)) AS BIGINT) AS distinct_slots
    FROM daily GROUP BY event_type
    """,
)
def events_bitmap_activity_rollup(spark, sf_dir):
    """Bitmap-index activity rollup: each (event_type, day) compresses
    its active users into one 63-slot bitmap (bit = user slot; 63 not 64\n    because DuckDB raises on a shift into the BIGINT sign bit), daily
    bitmaps OR together per type, and popcounts read activity — the
    roaring-bitmap/bitmap-index pattern OLAP engines use for
    distinct-user rollups, in its 64-slot miniature: a day's actives are
    ONE long instead of a user list, merging periods is bitwise OR
    (associative, map-side combinable), and the daily-total vs
    distinct-slot gap measures repeat visitors. Two bit-aggregate passes,
    no distinct-count shuffle of user ids at the rollup level."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.date_trunc("day", F.col("ts")).alias("day")
        )
        .agg(
            F.bit_or(
                F.expr(
                    "shiftleft(CAST(1 AS BIGINT),"
                    " CAST(user_id % 63 AS INT))"
                )
            ).alias("bm")
        )
    )
    return daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.bit_count("bm")).cast("long").alias("daily_slot_total"),
        F.bit_count(F.bit_or("bm")).cast("long").alias("distinct_slots"),
    )


@_q(
    "agg_theil_sen_trend",
    """
    WITH m AS (SELECT date_trunc('month', o_orderdate) AS month,
                      sum(o_totalprice) AS rev
               FROM orders GROUP BY 1),
    idx AS (SELECT row_number() OVER (ORDER BY month) AS i, rev FROM m),
    slopes AS (SELECT (b.rev - a.rev) / (b.i - a.i) AS s
               FROM idx a JOIN idx b ON a.i < b.i)
    SELECT CAST((SELECT count(*) FROM idx) AS BIGINT) AS n_months,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(quantile_cont(s, 0.5), 4) AS theil_sen_slope,
           round(avg(s), 4) AS mean_pairwise_slope
    FROM slopes
    """,
)
def agg_theil_sen_trend(spark, sf_dir):
    """Theil-Sen robust trend of monthly revenue: the MEDIAN of all
    pairwise slopes — up to ~29% of months can be corrupted (an outage,
    a backfill spike) without moving the estimate, where OLS follows the
    outlier (the robust sibling of the regr_slope entries). The pairwise
    self-join runs on the BOUNDED month-grain frame (k months → k²/2
    pairs — dozens, not data), never on raw orders; the month index
    comes from one ordered window."""
    m = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    idx = m.select(
        F.row_number().over(Window.orderBy("month")).alias("i"), "rev"
    )
    a = idx.select(F.col("i").alias("ia"), F.col("rev").alias("ra"))
    b = idx.select(F.col("i").alias("ib"), F.col("rev").alias("rb"))
    slopes = a.join(b, F.col("ia") < F.col("ib")).select(
        ((F.col("rb") - F.col("ra")) / (F.col("ib") - F.col("ia"))).alias(
            "s"
        )
    )
    n_months = idx.count()
    return slopes.agg(
        F.lit(n_months).cast("long").alias("n_months"),
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.expr("percentile(s, 0.5)"), 4).alias("theil_sen_slope"),
        F.round(F.avg("s"), 4).alias("mean_pairwise_slope"),
    )


@_q(
    "window_max_drawdown",
    """
    WITH d AS (SELECT date_trunc('day', o_orderdate) AS day,
                      sum(o_totalprice) AS rev
               FROM orders GROUP BY 1),
    c AS (SELECT day,
            sum(rev) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS cum
          FROM d),
    r AS (SELECT day, cum,
            max(cum) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS peak
          FROM c)
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           round(max(peak - cum), 2) AS max_drawdown_abs,
           round(max((peak - cum) / peak), 8) AS max_drawdown_frac,
           round(max(cum), 2) AS final_cum
    FROM r
    """,
)
def window_max_drawdown(spark, sf_dir):
    """Maximum drawdown of the cumulative daily revenue curve — the
    worst peak-to-trough fall, THE risk statistic for any cumulative
    series (P&L, capacity headroom, token-budget burn): two stacked
    running windows (cumsum, then running max) over the bounded
    day-grain rollup, then one aggregate for the worst gap. Raw orders
    are touched exactly once."""
    d = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("day"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    r = d.select("day", F.sum("rev").over(w).alias("cum"))
    r = r.select(
        "cum",
        F.max("cum")
        .over(Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0))
        .alias("peak"),
    )
    return r.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.max(F.col("peak") - F.col("cum")), 2).alias(
            "max_drawdown_abs"
        ),
        F.round(
            F.max((F.col("peak") - F.col("cum")) / F.col("peak")), 8
        ).alias("max_drawdown_frac"),
        F.round(F.max("cum"), 2).alias("final_cum"),
    )


@_q(
    "graph_degree_assortativity",
    """
    WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                FROM lineitem WHERE year(l_shipdate) = 1995),
    ec AS (SELECT a.pk AS u, b.pk AS v FROM li a
           JOIN li b ON a.ok = b.ok AND a.pk < b.pk
           GROUP BY a.pk, b.pk),
    e2 AS (SELECT u AS a, v AS b FROM ec UNION ALL SELECT v, u FROM ec),
    deg AS (SELECT a AS node, CAST(count(*) AS DOUBLE) AS d
            FROM e2 GROUP BY a)
    SELECT CAST((SELECT count(*) FROM ec) AS BIGINT) AS n_edges,
           CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
           round(corr(da.d, db.d), 6) AS assortativity
    FROM e2 JOIN deg da ON e2.a = da.node JOIN deg db ON e2.b = db.node
    """,
)
def graph_degree_assortativity(spark, sf_dir):
    """Degree assortativity (Newman 2002): the Pearson correlation of
    endpoint degrees over every directed edge instance — do hubs link to
    hubs (positive, social-network-like) or to leaves (negative,
    hub-and-spoke/technological)? The one-number wiring fingerprint that
    decides whether degree-based partitioning skew valves matter.
    One degree aggregate + two broadcast-able joins of the edge list
    against the degree table + one corr() — no iteration."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.year("l_shipdate") == 1995)
        .select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
        )
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    # round-10 sf100 fix: this entry had missed BOTH round-9 disciplines
    # and blew the heap at 600M lineitem — the memory-resident edge
    # persist (hundreds of millions of pairs) plus TWO estimate-driven
    # broadcast builds of the derived degree table. Above the fact gate
    # the edge cache goes DISK_ONLY and the degree joins pin sort-merge.
    pin = _gates.pin_shuffle_join_fact(_table_count(spark, sf_dir, "lineitem"))
    ec = (
        a.join(b, "ok")
        .where(F.col("a.pk") < F.col("b.pk"))
        .select(F.col("a.pk").alias("u"), F.col("b.pk").alias("v"))
        .distinct()
        .persist(
            StorageLevel.DISK_ONLY if pin else StorageLevel.MEMORY_AND_DISK_DESER
        )
    )
    e2 = ec.select(F.col("u").alias("x"), F.col("v").alias("y")).unionAll(
        ec.select(F.col("v").alias("x"), F.col("u").alias("y"))
    )
    deg = e2.groupBy("x").agg(F.count(F.lit(1)).cast("double").alias("d"))
    n_edges = ec.count()
    n_nodes = deg.count()
    da = _pin(deg.select(F.col("x").alias("_a"), F.col("d").alias("da")), pin)
    db = _pin(deg.select(F.col("x").alias("_b"), F.col("d").alias("db")), pin)
    out = (
        e2.join(da, e2.x == da._a)
        .join(db, e2.y == db._b)
        .agg(
            F.lit(n_edges).cast("long").alias("n_edges"),
            F.lit(n_nodes).cast("long").alias("n_nodes"),
            F.round(F.corr("da", "db"), 6).alias("assortativity"),
        )
    )
    from boann_ocsf_security_data_platform_spark.operators.dedup import (
        _register_caches,
    )

    return _register_caches(out, [ec])


@_q(
    "text_heaps_law_fit",
    f"""
    WITH w AS (SELECT doc_id, unnest({_WORDS}) AS term FROM documents),
    first_doc AS (SELECT term, min(doc_id) AS fd FROM w GROUP BY term),
    tok_per_doc AS (SELECT doc_id, count(*) AS n_tok FROM w GROUP BY doc_id),
    new_per_doc AS (SELECT fd AS doc_id, count(*) AS n_new
                    FROM first_doc GROUP BY fd),
    curve AS (SELECT t.doc_id,
                sum(t.n_tok) OVER (ORDER BY t.doc_id
                  ROWS UNBOUNDED PRECEDING) AS n_cum,
                sum(coalesce(n.n_new, 0)) OVER (ORDER BY t.doc_id
                  ROWS UNBOUNDED PRECEDING) AS v_cum
              FROM tok_per_doc t LEFT JOIN new_per_doc n USING (doc_id)),
    sampled AS (SELECT * FROM curve WHERE doc_id % 50 = 49)
    SELECT CAST(count(*) AS BIGINT) AS n_points,
           round(regr_slope(ln(CAST(v_cum AS DOUBLE)),
                            ln(CAST(n_cum AS DOUBLE))), 6) AS heaps_beta,
           round(exp(regr_intercept(ln(CAST(v_cum AS DOUBLE)),
                                    ln(CAST(n_cum AS DOUBLE)))), 4)
             AS heaps_k,
           CAST(max(v_cum) AS BIGINT) AS final_vocab,
           CAST(max(n_cum) AS BIGINT) AS final_tokens
    FROM sampled
    """,
)
def text_heaps_law_fit(spark, sf_dir):
    """Heaps'-law vocabulary growth fit, V(n) = K·n^β — the
    companion curve to the Zipf entry: natural corpora grow vocabulary
    as a power law (β ≈ 0.4-0.6); a FLATTENING curve is the classic
    tell that a crawl has started re-ingesting duplicates or a
    generator is looping. The cumulative-distinct count that makes this
    expensive naively is rewritten via FIRST OCCURRENCE: a term
    contributes to the vocabulary exactly at its min doc_id, so the
    curve is one min-aggregate plus two running sums over the bounded
    per-doc frame — no distinct-over-growing-prefix scan. Sampled every
    50 docs, fitted with regr_* in log-log space."""
    from boann_ocsf_security_data_platform_spark.operators.text import tokens

    w = _t(spark, sf_dir, "documents").select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    # ONE token-explode pass: the reduced (doc, term, count) frame feeds
    # both the first-occurrence aggregate and the per-doc token totals
    # (the BM25 lesson — re-deriving the explode per aggregate is the
    # 100 TB cost)
    per_doc_term = (
        w.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    first_doc = per_doc_term.groupBy("term").agg(F.min("doc_id").alias("fd"))
    tok_per_doc = per_doc_term.groupBy("doc_id").agg(
        F.sum("c").alias("n_tok")
    )
    new_per_doc = first_doc.groupBy(F.col("fd").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    ww = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    curve = (
        tok_per_doc.join(new_per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.sum("n_tok").over(ww).alias("n_cum"),
            F.sum(F.coalesce("n_new", F.lit(0))).over(ww).alias("v_cum"),
        )
        .filter(F.col("doc_id") % 50 == 49)
    )
    lv = "ln(CAST(v_cum AS DOUBLE))"
    ln = "ln(CAST(n_cum AS DOUBLE))"
    out = curve.agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(F.expr(f"regr_slope({lv}, {ln})"), 6).alias("heaps_beta"),
        F.round(F.exp(F.expr(f"regr_intercept({lv}, {ln})")), 4).alias(
            "heaps_k"
        ),
        F.max("v_cum").cast("long").alias("final_vocab"),
        F.max("n_cum").cast("long").alias("final_tokens"),
    )
    from boann_ocsf_security_data_platform_spark.operators.dedup import (
        _register_caches,
    )

    return _register_caches(out, [per_doc_term])


@_q(
    "agg_runs_test_randomness",
    """
    WITH d AS (SELECT date_trunc('day', o_orderdate) AS day,
                      sum(o_totalprice) AS rev
               FROM orders GROUP BY 1),
    med AS (SELECT quantile_cont(rev, 0.5) AS m FROM d),
    signed AS (SELECT day, CAST(rev > m AS INT) AS s
               FROM d, med WHERE rev <> m),
    runs AS (SELECT s,
               CASE WHEN lag(s) OVER (ORDER BY day) IS NULL
                    OR s <> lag(s) OVER (ORDER BY day)
                    THEN 1 ELSE 0 END AS new_run
             FROM signed),
    agg AS (SELECT CAST(sum(new_run) AS DOUBLE) AS r,
                   CAST(count(*) FILTER (WHERE s = 1) AS DOUBLE) AS n1,
                   CAST(count(*) FILTER (WHERE s = 0) AS DOUBLE) AS n2
            FROM runs)
    SELECT CAST(r AS BIGINT) AS n_runs,
           CAST(n1 AS BIGINT) AS n_above, CAST(n2 AS BIGINT) AS n_below,
           round((r - (2 * n1 * n2 / (n1 + n2) + 1))
                 / sqrt(2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
                        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1))), 4)
             AS z,
           abs((r - (2 * n1 * n2 / (n1 + n2) + 1))
               / sqrt(2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
                      / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1)))) > 1.96
             AS nonrandom
    FROM agg
    """,
)
def agg_runs_test_randomness(spark, sf_dir):
    """Wald-Wolfowitz runs test on daily revenue vs its median: too FEW
    runs of above/below-median days means trending or regime-switching,
    too MANY means oscillation — the is-this-series-actually-random
    check that belongs before any i.i.d.-assuming test in the registry's
    stats family (Welch, KS, Mann-Whitney all assume it). One ordered
    lag window over the bounded day-grain series; z uses the exact
    run-count moments."""
    d = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("day"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    med = d.agg(F.expr("percentile(rev, 0.5)").alias("m"))
    signed = (
        d.join(F.broadcast(med))
        .filter(F.col("rev") != F.col("m"))
        .select("day", (F.col("rev") > F.col("m")).cast("int").alias("s"))
    )
    wlag = Window.orderBy("day")
    runs = signed.select(
        "s",
        F.when(
            F.lag("s").over(wlag).isNull()
            | (F.col("s") != F.lag("s").over(wlag)),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    agg = runs.agg(
        F.sum("new_run").cast("double").alias("r"),
        F.count(F.when(F.col("s") == 1, 1)).cast("double").alias("n1"),
        F.count(F.when(F.col("s") == 0, 1)).cast("double").alias("n2"),
    )
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r")
    mu = 2 * n1 * n2 / (n1 + n2) + 1
    var = (
        2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1))
    )
    z = (r - mu) / F.sqrt(var)
    return agg.select(
        r.cast("long").alias("n_runs"),
        n1.cast("long").alias("n_above"),
        n2.cast("long").alias("n_below"),
        F.round(z, 4).alias("z"),
        (F.abs(z) > 1.96).alias("nonrandom"),
    )


@_q(
    "orders_littles_law_check",
    """
    WITH o AS (SELECT o_orderkey, CAST(date_trunc('day', o_orderdate) AS DATE)
                        AS d0
               FROM orders),
    done AS (SELECT l_orderkey, CAST(date_trunc('day', max(l_shipdate)) AS DATE)
                      AS d1
             FROM lineitem GROUP BY l_orderkey),
    iv AS (SELECT o.d0, done.d1 FROM o JOIN done ON o.o_orderkey = done.l_orderkey
           WHERE done.d1 > o.d0),
    bounds AS (SELECT min(d0) AS lo, max(d1) AS hi FROM iv),
    spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
              FROM bounds),
    deltas AS (SELECT d AS day, sum(delta) AS delta FROM (
                 SELECT d0 AS d, 1 AS delta FROM iv
                 UNION ALL SELECT d1, -1 FROM iv) t GROUP BY d),
    inflight AS (SELECT spine.day,
                   sum(coalesce(delta, 0)) OVER (ORDER BY spine.day
                     ROWS UNBOUNDED PRECEDING) AS l
                 FROM spine LEFT JOIN deltas
                   ON CAST(spine.day AS DATE) = deltas.day),
    stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_days, avg(l) AS big_l
              FROM inflight),
    arr AS (SELECT CAST(count(*) AS DOUBLE) AS n_orders,
                   avg(date_diff('day', d0, d1)) AS w FROM iv)
    SELECT CAST(n_orders AS BIGINT) AS n_orders,
           CAST(n_days AS BIGINT) AS n_days,
           round(big_l, 4) AS avg_in_flight,
           round(n_orders / n_days, 6) AS lambda_per_day,
           round(w, 4) AS avg_days_in_flight,
           round(big_l / ((n_orders / n_days) * w), 6) AS littles_ratio
    FROM stats, arr
    """,
)
def orders_littles_law_check(spark, sf_dir):
    """Little's Law validation, L = λ·W: average work-in-progress must
    equal arrival rate × average time-in-system — the queueing identity
    every capacity model leans on, here CHECKED from two independent
    measurements (L by day-grain interval counting over a generated day
    spine with a +1/−1 running sum; λ and W directly from the order
    intervals) instead of assumed; ratio ≈ 1 up to edge effects. The
    spine is the bounded calendar range, the running sum is one ordered
    window on it, and the interval endpoints come from one
    lineitem-grain aggregate — raw tables are scanned once each."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("d0"),
    )
    done = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.date_trunc("day", F.max("l_shipdate")).cast("date").alias("d1")
        )
    )
    iv = o.join(done, o.o_orderkey == done.l_orderkey).filter(
        F.col("d1") > F.col("d0")
    ).select("d0", "d1")
    bounds = iv.agg(F.min("d0").alias("lo"), F.max("d1").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("day")
    )
    deltas = (
        iv.select(F.col("d0").alias("day"), F.lit(1).alias("delta"))
        .unionAll(iv.select(F.col("d1").alias("day"), F.lit(-1).alias("delta")))
        .groupBy("day")
        .agg(F.sum("delta").alias("delta"))
    )
    wrun = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    inflight = spine.join(deltas, "day", "left").select(
        "day",
        F.sum(F.coalesce("delta", F.lit(0))).over(wrun).alias("l"),
    )
    stats = inflight.agg(
        F.count(F.lit(1)).cast("double").alias("n_days"),
        F.avg("l").alias("big_l"),
    )
    arr = iv.agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        F.avg(F.datediff("d1", "d0")).alias("w"),
    )
    lam = F.col("n_orders") / F.col("n_days")
    return stats.crossJoin(arr).select(
        F.col("n_orders").cast("long").alias("n_orders"),
        F.col("n_days").cast("long").alias("n_days"),
        F.round("big_l", 4).alias("avg_in_flight"),
        F.round(lam, 6).alias("lambda_per_day"),
        F.round("w", 4).alias("avg_days_in_flight"),
        F.round(F.col("big_l") / (lam * F.col("w")), 6).alias(
            "littles_ratio"
        ),
    )


@_q(
    "agg_bh_fdr_correction",
    f"""
    WITH d AS (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day
               FROM events),
    bounds AS (SELECT min(day) AS b0, max(day) AS b1 FROM d),
    half AS (SELECT b0, CAST(floor(date_diff('day', b0, b1) / 2.0) AS BIGINT)
                      AS mid,
                    date_diff('day', b0, b1) + 1 AS total
             FROM bounds),
    agg AS (SELECT event_type,
              CAST(count(*) FILTER (WHERE date_diff('day', b0, day) < mid)
                AS DOUBLE) AS n1,
              CAST(count(*) FILTER (WHERE date_diff('day', b0, day) >= mid)
                AS DOUBLE) AS n2,
              CAST(any_value(mid) AS DOUBLE) AS t1,
              CAST(any_value(total) - any_value(mid) AS DOUBLE) AS t2
            FROM d, half GROUP BY event_type),
    zs AS (SELECT event_type,
             (n1 / t1 - n2 / t2)
               / sqrt(n1 / (t1 * t1) + n2 / (t2 * t2)) AS z
           FROM agg WHERE t1 > 0),
    ps AS (SELECT event_type, z, abs(z) AS az,
                  1.0 / (1.0 + 0.3275911 * (abs(z) / 1.4142135623730951))
                    AS tt
           FROM zs),
    pv AS (SELECT event_type, round(z, 4) AS z,
                  round(2 * (1 - (0.5 * (1 + (1 - (0.254829592 * tt - 0.284496736 * tt * tt + 1.421413741 * tt * tt * tt - 1.453152027 * tt * tt * tt * tt + 1.061405429 * tt * tt * tt * tt * tt) * exp(-(az / 1.4142135623730951) * (az / 1.4142135623730951)))))), 8) AS p
           FROM ps),
    ranked AS (SELECT event_type, z, p,
                 row_number() OVER (ORDER BY p, event_type) AS rk,
                 count(*) OVER () AS m
               FROM pv),
    crit AS (SELECT *, round(0.10 * rk / m, 8) AS bh_crit FROM ranked),
    kmax AS (SELECT coalesce(max(rk), 0) AS k FROM crit WHERE p <= bh_crit)
    SELECT event_type, z, p, CAST(rk AS BIGINT) AS rank, bh_crit,
           rk <= k AS rejected
    FROM crit, kmax
    """,
)
def agg_bh_fdr_correction(spark, sf_dir):
    """Benjamini-Hochberg FDR correction over the per-event-type
    rate-ratio z-tests: p-values rank ascending and the step-up rule
    rejects every hypothesis up to the largest k with p_(k) ≤ α·k/m
    (α = 0.10) — the multiple-testing discipline the registry's test
    family needs once you run one test PER GROUP (at 5% per test, 20
    event types expect one false alarm every run; BH caps the expected
    FALSE DISCOVERY share instead). Neither engine ships erf, so Φ uses
    the Abramowitz-Stegun 7.1.26 polynomial verbatim on both sides
    (pure arithmetic — bit-comparable after rounding). One conditional
    aggregate for the tests, two ordered windows on the bounded
    per-type frame for the step-up. Degenerate single-day inputs
    (mid = 0 so exposure t1 = 0) are excluded from the hypothesis set
    on both engines — an undefined test is not a hypothesis (r6
    ADVICE #4)."""
    d = _t(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    )
    bounds = d.agg(F.min("day").alias("b0"), F.max("day").alias("b1")).select(
        "b0",
        F.floor(F.datediff("b1", "b0") / 2.0).cast("long").alias("mid"),
        (F.datediff("b1", "b0") + 1).alias("total"),
    )
    agg = (
        d.join(F.broadcast(bounds))
        .groupBy("event_type")
        .agg(
            F.count(
                F.when(F.datediff("day", "b0") < F.col("mid"), 1)
            ).cast("double").alias("n1"),
            F.count(
                F.when(F.datediff("day", "b0") >= F.col("mid"), 1)
            ).cast("double").alias("n2"),
            F.any_value("mid").cast("double").alias("t1"),
            (F.any_value("total") - F.any_value("mid"))
            .cast("double")
            .alias("t2"),
        )
    )
    z = (
        F.col("n1") / F.col("t1") - F.col("n2") / F.col("t2")
    ) / F.sqrt(
        F.col("n1") / (F.col("t1") * F.col("t1"))
        + F.col("n2") / (F.col("t2") * F.col("t2"))
    )
    zs = agg.filter(F.col("t1") > 0).select("event_type", z.alias("z"))
    az = F.abs(F.col("z"))
    x = az / F.lit(2.0 ** 0.5)
    t = 1.0 / (1.0 + 0.3275911 * x)
    erf = 1.0 - (
        0.254829592 * t
        - 0.284496736 * t * t
        + 1.421413741 * t * t * t
        - 1.453152027 * t * t * t * t
        + 1.061405429 * t * t * t * t * t
    ) * F.exp(-x * x)
    p = F.round(2 * (1 - (0.5 * (1 + erf))), 8)
    pv = zs.select("event_type", F.round("z", 4).alias("z"), p.alias("p"))
    wr = Window.orderBy("p", "event_type")
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = pv.select(
        "event_type",
        "z",
        "p",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(wall).alias("m"),
    ).withColumn(
        "bh_crit", F.round(0.10 * F.col("rk") / F.col("m"), 8)
    )
    kmax = ranked.filter(F.col("p") <= F.col("bh_crit")).agg(
        F.coalesce(F.max("rk"), F.lit(0)).alias("k")
    )
    return ranked.join(F.broadcast(kmax)).select(
        "event_type",
        "z",
        "p",
        F.col("rk").cast("long").alias("rank"),
        "bh_crit",
        (F.col("rk") <= F.col("k")).alias("rejected"),
    )


@_q(
    "orders_skyline_pareto_front",
    """
    WITH pts AS (SELECT o.o_orderkey AS k, o.o_totalprice AS price,
                        date_diff('day',
                          CAST(date_trunc('day', o.o_orderdate) AS DATE),
                          CAST(date_trunc('day', max(l.l_shipdate)) AS DATE))
                          AS days
                 FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
                 GROUP BY o.o_orderkey, o.o_totalprice, o.o_orderdate),
    ranked AS (SELECT k, price, days,
                 min(days) OVER (ORDER BY price, days, k
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS best_prev
               FROM pts WHERE days > 0)
    SELECT k AS o_orderkey, round(price, 2) AS price,
           CAST(days AS BIGINT) AS days_to_ship
    FROM ranked WHERE best_prev IS NULL OR days < best_prev
    """,
)
def orders_skyline_pareto_front(spark, sf_dir):
    """Skyline / Pareto-front query: the orders no other order beats on
    BOTH price and days-to-ship — the multi-criteria shortlist operator
    (cheapest-AND-fastest offers, best cost-latency configs) that plain
    ORDER BY cannot express. The naive dominance test is an O(n²)
    anti-self-join; sorted by (price, days, key) it collapses to ONE
    running-min window: a point survives iff its days beat the best days
    of every strictly-preceding (≤-price) point — the classic
    sort-filter skyline (Börzsönyi et al. 2001), output size ~O(log n)
    on independent dims.

    Round-11 sf100 find: the original single global window WAS the
    rank-window funnel at cardinality 1 — Window.orderBy with no
    partition key sorts the whole 150M-order fact in ONE task (437 s at
    sf100). The window is now partitioned by a 1000-cell price bucket
    with the cross-bucket floor folded in: global
    min-over-preceding(p) = min(min days over ALL strictly-lower price
    buckets [every such point precedes p, since equal prices can never
    straddle a bucket boundary], running min over the in-bucket
    (price, days, k)-preceding points). Identical statistic, fact sort
    spread over 1000 parallel partitions; the only global window left
    runs over the 1000 bucket-summary rows. Identity vs the
    single-window form pinned in tests/test_round11_ops.py."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    pts = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderkey", "o_totalprice", "o_orderdate")
        .agg(
            F.datediff(
                F.date_trunc("day", F.max("l_shipdate")).cast("date"),
                F.date_trunc("day", F.col("o_orderdate")).cast("date"),
            ).alias("days")
        )
        .filter(F.col("days") > 0)
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_totalprice").alias("price"),
            "days",
        )
    )
    mm = pts.agg(F.min("price").alias("x0"), F.max("price").alias("x1"))
    bucketed = pts.join(F.broadcast(mm)).select(
        "k",
        "price",
        "days",
        F.when(
            F.col("x1") > F.col("x0"),
            F.least(
                F.lit(999),
                F.floor(
                    (F.col("price") - F.col("x0"))
                    / (F.col("x1") - F.col("x0"))
                    * 1000
                ),
            ),
        )
        .otherwise(F.lit(0))
        .alias("bkt"),
    )
    wb = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    floors = (
        bucketed.groupBy("bkt")
        .agg(F.min("days").alias("bmin"))
        .select("bkt", F.min("bmin").over(wb).alias("floor_days"))
    )
    wp = Window.partitionBy("bkt").orderBy("price", "days", "k").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = bucketed.join(F.broadcast(floors), "bkt").withColumn(
        "best_prev", F.least(F.min("days").over(wp), F.col("floor_days"))
    )
    return ranked.filter(
        F.col("best_prev").isNull() | (F.col("days") < F.col("best_prev"))
    ).select(
        F.col("k").alias("o_orderkey"),
        F.round("price", 2).alias("price"),
        F.col("days").cast("long").alias("days_to_ship"),
    )


@_q(
    "text_char_entropy_profile",
    """
    WITH ch AS (SELECT doc_id, source,
                  substr(text, CAST(unnest(range(1, length(text) + 1))
                               AS INT), 1) AS c
                FROM documents WHERE length(text) > 0),
    cnt AS (SELECT doc_id, source, c, count(*) AS n FROM ch GROUP BY 1, 2, 3),
    tot AS (SELECT doc_id, CAST(sum(n) AS DOUBLE) AS t FROM cnt GROUP BY 1),
    ent AS (SELECT cnt.source, cnt.doc_id,
              -sum((n / t) * ln(n / t)) AS h
            FROM cnt JOIN tot USING (doc_id) GROUP BY 1, 2)
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(h), 6) AS avg_entropy,
           round(min(h), 6) AS min_entropy,
           round(max(h), 6) AS max_entropy
    FROM ent GROUP BY source
    """,
)
def text_char_entropy_profile(spark, sf_dir):
    """Character-level Shannon entropy per document, profiled per source
    — the compression-free repetitiveness signal: natural text sits in a
    narrow entropy band, while looping generators, base64 blobs, and
    padding junk fall outside it (low = repetitive, high = random-ish),
    making this the cheapest anomalous-source detector in the quality
    family. Characters come from a POSITION explode (substr at an
    unnested index — identical semantics on both engines, avoiding
    split-on-empty-regex edge cases; DuckDB length()/substr() are
    CHARACTER-based like Spark's, where strlen() is bytes and would mint
    phantom empty chars on non-ASCII text — r6 ADVICE #3); per-doc
    entropy is two
    map-combinable aggregates; the source profile rolls up the bounded
    per-doc frame."""
    d = _t(spark, sf_dir, "documents").filter(F.length("text") > 0)
    ch = (
        d.select(
            "doc_id",
            "source",
            F.explode(
                F.sequence(F.lit(1), F.length("text"))
            ).alias("pos"),
            "text",
        )
        .select(
            "doc_id",
            "source",
            F.expr("substr(text, CAST(pos AS INT), 1)").alias("c"),
        )
    )
    cnt = ch.groupBy("doc_id", "source", "c").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = cnt.groupBy("doc_id").agg(F.sum("n").cast("double").alias("t"))
    ent = (
        # per-doc totals are doc-grain (corpus-scaling) — pinned
        # sort-merge above the measured-count threshold
        cnt.join(_pin(tot, _gates.pin_shuffle_join(_table_count(spark, sf_dir, "documents"))), "doc_id")
        .groupBy("source", "doc_id")
        .agg(
            (-F.sum((F.col("n") / F.col("t")) * F.log(F.col("n") / F.col("t"))))
            .alias("h")
        )
    )
    return ent.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("h"), 6).alias("avg_entropy"),
        F.round(F.min("h"), 6).alias("min_entropy"),
        F.round(F.max("h"), 6).alias("max_entropy"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 81: Spearman rank correlation (tie-aware average ranks)
# ---------------------------------------------------------------------------


@_q(
    "agg_spearman_rank_corr",
    """
    WITH r AS (SELECT l_returnflag,
                 rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
                   + (count(*) OVER (PARTITION BY l_returnflag, l_quantity)
                      - 1) / 2.0 AS rq,
                 rank() OVER (PARTITION BY l_returnflag
                              ORDER BY l_extendedprice)
                   + (count(*) OVER (PARTITION BY l_returnflag,
                                     l_extendedprice) - 1) / 2.0 AS rp
               FROM lineitem)
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
           round(corr(rq, rp), 6) + 0.0 AS spearman_rho
    FROM r GROUP BY l_returnflag
    """,
)
def agg_spearman_rank_corr(spark, sf_dir):
    """Spearman rank correlation between quantity and price per return
    flag — the monotone-association measure that survives outliers and
    nonlinearity where Pearson (agg_linear_regression) does not; the
    robustness primitive behind feature screening on heavy-tailed data.
    Tie-aware AVERAGE ranks built from min-rank + (tie_count-1)/2 (both
    engines lack a native avg-rank; rank()+count() over the value
    partition reconstructs it exactly), then one corr() over the ranked
    frame — Pearson-on-ranks IS Spearman.

    SIZE-GATED on the fact count (round 10): below the gate, two rank
    windows + corr — the oracle-hashed row-level arm, whose rank-sort
    parallelism is capped by the 3 partition keys (measured 1.1 s
    sf0.1 / 7.6 s sf1 / 61 s sf10 / **830 s sf100** — the decade-3
    sweep's worst entry). Above it, the EXACT same statistic from
    contingencies: tie-aware average ranks depend only on per-value
    counts (avg_rank(v) = rows-below(v) + (c(v)+1)/2), so two
    value-rank maps (bounded by the value domains, windowed over the
    aggregated domain rows — never the fact) and one joint
    (flag, qty, price) count — all map-side-combinable hash
    aggregates, no row-level sort — feed a weighted Pearson over the
    joint groups. Identical mathematics; identical rounded output
    (forced-gate identity pinned in tests/test_round10_ops.py).
    agg_spearman_binned (wave 204) remains the bounded-bin recipe for
    continuous domains where the value-domain rank maps themselves
    would scale with the data."""
    l = _t(spark, sf_dir, "lineitem")
    if not _gates.pin_shuffle_join_fact(
        _table_count(spark, sf_dir, "lineitem")
    ):
        wq = Window.partitionBy("l_returnflag").orderBy("l_quantity")
        wp = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
        tq = Window.partitionBy("l_returnflag", "l_quantity")
        tp = Window.partitionBy("l_returnflag", "l_extendedprice")
        r = l.select(
            "l_returnflag",
            (F.rank().over(wq) + (F.count(F.lit(1)).over(tq) - 1) / 2.0).alias("rq"),
            (F.rank().over(wp) + (F.count(F.lit(1)).over(tp) - 1) / 2.0).alias("rp"),
        )
        return r.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("n"),
            (F.round(F.corr("rq", "rp"), 6) + 0.0).alias("spearman_rho"),
        )

    def rank_map(col, alias):
        # per-(flag, value) tie-aware average rank from counts alone;
        # the window sorts the aggregated VALUE DOMAIN, never fact rows
        c = l.groupBy("l_returnflag", col).agg(F.count(F.lit(1)).alias("_c"))
        w = (
            Window.partitionBy("l_returnflag")
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return c.select(
            "l_returnflag",
            col,
            (
                F.coalesce(F.sum("_c").over(w), F.lit(0))
                + (F.col("_c") + 1) / 2.0
            ).alias(alias),
        )

    joint = l.groupBy("l_returnflag", "l_quantity", "l_extendedprice").agg(
        F.count(F.lit(1)).alias("c")
    )
    # sort-merge pins, NOT broadcast (ADVICE r10 #1): the rank maps'
    # cardinality is distinct (flag, value) — data-dependent, and for a
    # near-continuous price domain on a genuine corpus it grows toward
    # fact scale, the exact derived-table-broadcast hazard fixed in
    # graph_degree_assortativity. Both sides here are already aggregated
    # to the join grain, so the shuffle is domain-bounded either way.
    j = joint.join(
        rank_map("l_quantity", "rq").hint("merge"),
        ["l_returnflag", "l_quantity"],
    ).join(
        rank_map("l_extendedprice", "rp").hint("merge"),
        ["l_returnflag", "l_extendedprice"],
    )
    g = j.groupBy("l_returnflag").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.col("rq")).alias("sq"),
        F.sum(F.col("c") * F.col("rp")).alias("sp"),
        F.sum(F.col("c") * F.col("rq") * F.col("rq")).alias("sqq"),
        F.sum(F.col("c") * F.col("rp") * F.col("rp")).alias("spp"),
        F.sum(F.col("c") * F.col("rq") * F.col("rp")).alias("sqp"),
    )
    rho = (F.col("n") * F.col("sqp") - F.col("sq") * F.col("sp")) / F.sqrt(
        (F.col("n") * F.col("sqq") - F.col("sq") * F.col("sq"))
        * (F.col("n") * F.col("spp") - F.col("sp") * F.col("sp"))
    )
    return g.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        (F.round(rho, 6) + 0.0).alias("spearman_rho"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 82: market-basket association rules (support/confidence/lift)
# ---------------------------------------------------------------------------


@_q(
    "join_market_basket_rules",
    """
    WITH items AS (SELECT DISTINCT l_orderkey, p_brand
                   FROM lineitem JOIN part ON l_partkey = p_partkey),
    n AS (SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n_orders
          FROM items),
    freq AS (SELECT p_brand, CAST(count(*) AS DOUBLE) AS n_b FROM items
             GROUP BY p_brand),
    pairs AS (SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
                     CAST(count(*) AS BIGINT) AS n_ab
              FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey
                                       AND a.p_brand < b.p_brand
              GROUP BY 1, 2)
    SELECT brand_a, brand_b, n_ab,
           round(n_ab / n_orders, 6) AS support,
           round(n_ab / fa.n_b, 6) AS confidence,
           round(n_ab * n_orders / (fa.n_b * fb.n_b), 4) AS lift
    FROM pairs
    JOIN freq fa ON brand_a = fa.p_brand
    JOIN freq fb ON brand_b = fb.p_brand
    CROSS JOIN n
    WHERE n_ab / n_orders >= 0.01
    """,
)
def join_market_basket_rules(spark, sf_dir):
    """Market-basket association rules over order baskets at brand
    granularity: support, confidence(a→b) and lift for every co-occurring
    brand pair above 1% support — the a-priori primitive behind
    recommend-with, cross-sell, and (in corpus work) tag-co-occurrence
    mining. One DISTINCT projection builds the basket-item frame; the
    pair generation is an equi-self-join on the basket key (never a
    cross join — the brand inequality prunes inside the join), and the
    item frequencies ride broadcast joins (bounded: one row per brand).
    At 100 TB: prune to frequent items FIRST (the a-priori downward-
    closure step) so the self-join only sees items that can clear min
    support; basket key stays the shuffle key throughout."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    items = (
        l.join(p, l.l_partkey == p.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    n = items.agg(
        F.countDistinct("l_orderkey").cast("double").alias("n_orders")
    )
    freq = items.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("double").alias("n_b")
    )
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .groupBy(
            F.col("a.p_brand").alias("brand_a"),
            F.col("b.p_brand").alias("brand_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    fa = freq.select(
        F.col("p_brand").alias("brand_a"), F.col("n_b").alias("n_a")
    )
    fb = freq.select(
        F.col("p_brand").alias("brand_b"), F.col("n_b").alias("n_bb")
    )
    out = (
        pairs.join(F.broadcast(fa), "brand_a")
        .join(F.broadcast(fb), "brand_b")
        .join(F.broadcast(n))
        .filter(F.col("n_ab") / F.col("n_orders") >= 0.01)
    )
    return out.select(
        "brand_a",
        "brand_b",
        "n_ab",
        F.round(F.col("n_ab") / F.col("n_orders"), 6).alias("support"),
        F.round(F.col("n_ab") / F.col("n_a"), 6).alias("confidence"),
        F.round(
            F.col("n_ab") * F.col("n_orders") / (F.col("n_a") * F.col("n_bb")),
            4,
        ).alias("lift"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 83: RFM customer segmentation (deterministic quintiles)
# ---------------------------------------------------------------------------


@_q(
    "orders_rfm_segmentation",
    """
    WITH mx AS (SELECT max(CAST(date_trunc('day', o_orderdate) AS DATE)) AS gmax
                FROM orders),
    cust AS (SELECT o_custkey,
               date_diff('day',
                         max(CAST(date_trunc('day', o_orderdate) AS DATE)),
                         gmax) AS rec,
               count(*) AS freq,
               sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS mon_c
             FROM orders CROSS JOIN mx GROUP BY o_custkey, gmax),
    scored AS (SELECT
                 ntile(5) OVER (ORDER BY rec DESC, o_custkey) AS r_score,
                 ntile(5) OVER (ORDER BY freq ASC, o_custkey) AS f_score,
                 ntile(5) OVER (ORDER BY mon_c ASC, o_custkey) AS m_score,
                 mon_c
               FROM cust)
    SELECT CAST(r_score AS BIGINT) AS r_score,
           CAST(f_score AS BIGINT) AS f_score,
           CAST(m_score AS BIGINT) AS m_score,
           CAST(count(*) AS BIGINT) AS n_customers,
           floor(sum(mon_c) * 1.0 / count(*) + 0.5) / 100.0 AS avg_monetary,
           CAST(sum(mon_c) AS BIGINT) AS total_monetary_cents
    FROM scored GROUP BY 1, 2, 3
    """,
)
def orders_rfm_segmentation(spark, sf_dir):
    """RFM (recency/frequency/monetary) quintile segmentation — the
    classic customer-value matrix: score 5 = most recent / most frequent
    / highest spend, summarized per (R,F,M) cell. Recency is integer-day
    arithmetic against the global max order day (broadcast one-row
    frame, NTZ-proof); the three quintiles are ntile over DETERMINISTIC
    orders (metric + custkey tie-break so equal values land identically
    on every engine — the feature_quantile_binning discipline). Money is
    INTEGER CENTS end-to-end: exact order-independent sums, a cents-keyed
    m_score sort, and an explicit floor(+0.5) half-up mean — engine
    round() half-mode differences can't touch any cell (the
    agg_decimal_exact_revenue discipline). At 100 TB swap the three
    global ntile sorts for approx_percentile cut points; the per-cell
    rollup is map-combinable either way."""
    o = _t(spark, sf_dir, "orders")
    day = F.date_trunc("day", F.col("o_orderdate")).cast("date")
    mx = o.agg(F.max(day).alias("gmax"))
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    cust = (
        o.join(F.broadcast(mx))
        .groupBy("o_custkey", "gmax")
        .agg(
            F.max(day).alias("last_day"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(cents).alias("mon_c"),
        )
        .select(
            "o_custkey",
            F.datediff("gmax", "last_day").alias("rec"),
            "freq",
            "mon_c",
        )
    )
    # three bucket-decomposed exact ntiles, one sketch action (round 11
    # — each literal ntile was a global single-task customer-grain sort)
    scored = _bucketed_ntiles(
        cust,
        [
            ("rec", False, "r_score"),
            ("freq", True, "f_score"),
            ("mon_c", True, "m_score"),
        ],
        "o_custkey",
        5,
    ).select("r_score", "f_score", "m_score", "mon_c")
    return scored.groupBy(
        F.col("r_score").cast("long").alias("r_score"),
        F.col("f_score").cast("long").alias("f_score"),
        F.col("m_score").cast("long").alias("m_score"),
    ).agg(
        F.count(F.lit(1)).alias("n_customers"),
        (
            F.floor(
                F.sum("mon_c") * 1.0 / F.count(F.lit(1)) + 0.5
            ) / 100.0
        ).alias("avg_monetary"),
        F.sum("mon_c").alias("total_monetary_cents"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 84: inter-arrival exponential fit (MLE rate + burstiness CV)
# ---------------------------------------------------------------------------


@_q(
    "events_interarrival_expfit",
    """
    WITH g AS (SELECT event_type,
                 floor(epoch(ts - lag(ts) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id)))
                   AS gap_s
               FROM events),
    a AS (SELECT event_type,
                 CAST(count(gap_s) AS BIGINT) AS n_gaps,
                 avg(gap_s) AS mean_gap,
                 stddev_samp(gap_s) AS sd_gap
          FROM g GROUP BY event_type)
    SELECT event_type, n_gaps,
           round(mean_gap, 4) AS mean_gap_s,
           round(CASE WHEN mean_gap > 0 THEN 1.0 / mean_gap END, 8)
             AS lambda_per_s,
           round(CASE WHEN mean_gap > 0 THEN sd_gap / mean_gap END, 4)
             AS cv
    FROM a
    """,
)
def events_interarrival_expfit(spark, sf_dir):
    """Per-type inter-arrival analysis: MLE exponential rate (λ = 1/mean
    gap) and the coefficient of variation — the Poisson-ness check behind
    capacity planning and burst detection (CV ≈ 1 is memoryless, ≫ 1 is
    bursty, ≪ 1 is metronomic). Gaps come from one lag window in whole
    seconds via interval subtraction (timestamp-flavor robust — the
    events_sessionize discipline: no session-timezone epoch math);
    degenerate all-simultaneous streams (mean gap 0) yield NULL λ/CV via
    an explicit guard on both engines. One window + one map-combinable
    aggregate, both partitioned by event_type."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    g = e.select(
        "event_type",
        (F.col("ts") - F.lag("ts").over(w)).cast("long").alias("gap_s"),
    )
    a = g.groupBy("event_type").agg(
        F.count("gap_s").alias("n_gaps"),
        F.avg("gap_s").alias("mean_gap"),
        F.stddev_samp("gap_s").alias("sd_gap"),
    )
    ok = F.col("mean_gap") > 0
    return a.select(
        "event_type",
        "n_gaps",
        F.round("mean_gap", 4).alias("mean_gap_s"),
        F.round(F.when(ok, 1.0 / F.col("mean_gap")), 8).alias("lambda_per_s"),
        F.round(F.when(ok, F.col("sd_gap") / F.col("mean_gap")), 4).alias("cv"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 85: Jensen-Shannon divergence between source unigram LMs
# ---------------------------------------------------------------------------


@_q(
    "text_js_divergence_sources",
    f"""
    WITH w AS (SELECT source, unnest({_WORDS}) AS term FROM documents),
    d AS (SELECT source, term, count(*) AS n FROM w GROUP BY 1, 2),
    t AS (SELECT source, CAST(sum(n) AS DOUBLE) AS tot FROM d GROUP BY 1),
    p AS (SELECT d.source, term, n / tot AS p
          FROM d JOIN t ON d.source = t.source),
    srcs AS (SELECT DISTINCT source FROM documents),
    pairs AS (SELECT a.source AS sa, b.source AS sb
              FROM srcs a JOIN srcs b ON a.source < b.source),
    sup AS (SELECT sa, sb, term FROM pairs JOIN p ON p.source = sa
            UNION
            SELECT sa, sb, term FROM pairs JOIN p ON p.source = sb),
    terms AS (SELECT sup.sa, sup.sb, sup.term,
                coalesce(pa.p, 0.0) AS pa, coalesce(pb.p, 0.0) AS pb
              FROM sup
              LEFT JOIN p pa ON pa.source = sup.sa AND pa.term = sup.term
              LEFT JOIN p pb ON pb.source = sup.sb AND pb.term = sup.term)
    SELECT sa AS source_a, sb AS source_b,
           CAST(count(*) AS BIGINT) AS n_union_terms,
           round(sum(CASE WHEN pa > 0
                          THEN 0.5 * pa * ln(pa / ((pa + pb) / 2))
                          ELSE 0.0 END)
               + sum(CASE WHEN pb > 0
                          THEN 0.5 * pb * ln(pb / ((pa + pb) / 2))
                          ELSE 0.0 END), 6) + 0.0 AS js_divergence
    FROM terms GROUP BY 1, 2
    """,
)
def text_js_divergence_sources(spark, sf_dir):
    """Jensen-Shannon divergence between every pair of per-source unigram
    distributions — the symmetric, bounded (≤ ln 2) distribution-shift
    measure behind domain-mixture monitoring and dedup-across-dumps
    triage (CCNet-style corpus QA: a source whose JSD to its siblings
    jumps changed its crawler or its spam mix). The pair support set is
    the UNION of each pair's vocabularies (two equi-joins — never words ×
    pairs), zero-probability terms contribute exactly their one-sided KL
    share, and the bounded pair frame (|sources|²) rolls up in one
    aggregate. Tokenization is the shared engine pair (operators.text.
    tokens ≡ the oracle's split/normalize)."""
    from boann_ocsf_security_data_platform_spark.operators.text import tokens

    d = (
        _t(spark, sf_dir, "documents")
        .select("source", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    t = d.groupBy("source").agg(F.sum("n").cast("double").alias("tot"))
    p = d.join(t, "source").select(
        "source", "term", (F.col("n") / F.col("tot")).alias("p")
    )
    srcs = p.select("source").distinct()
    pairs = (
        srcs.alias("a")
        .join(
            srcs.alias("b"),
            F.col("a.source") < F.col("b.source"),
        )
        .select(
            F.col("a.source").alias("sa"), F.col("b.source").alias("sb")
        )
    )
    sup = (
        pairs.join(p.alias("pa0"), F.col("sa") == F.col("pa0.source"))
        .select("sa", "sb", "term")
        .union(
            pairs.join(p.alias("pb0"), F.col("sb") == F.col("pb0.source"))
            .select("sa", "sb", "term")
        )
        .distinct()
    )
    pa = p.select(
        F.col("source").alias("sa"), F.col("term"), F.col("p").alias("pa")
    )
    pb = p.select(
        F.col("source").alias("sb"), F.col("term"), F.col("p").alias("pb")
    )
    terms = (
        sup.join(pa, ["sa", "term"], "left")
        .join(pb, ["sb", "term"], "left")
        .select(
            "sa",
            "sb",
            F.coalesce("pa", F.lit(0.0)).alias("pa"),
            F.coalesce("pb", F.lit(0.0)).alias("pb"),
        )
    )
    m = (F.col("pa") + F.col("pb")) / 2
    kl_a = F.when(
        F.col("pa") > 0, 0.5 * F.col("pa") * F.log(F.col("pa") / m)
    ).otherwise(0.0)
    kl_b = F.when(
        F.col("pb") > 0, 0.5 * F.col("pb") * F.log(F.col("pb") / m)
    ).otherwise(0.0)
    return terms.groupBy(
        F.col("sa").alias("source_a"), F.col("sb").alias("source_b")
    ).agg(
        F.count(F.lit(1)).alias("n_union_terms"),
        (F.round(F.sum(kl_a) + F.sum(kl_b), 6) + 0.0).alias("js_divergence"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 86: Markov stationary distribution of event-type transitions
# ---------------------------------------------------------------------------


def _markov_stationary_oracle(iters: int = 6) -> str:
    """Unrolled power-iteration CTE chain (the _pagerank_oracle pattern,
    damping 1.0) over the per-user consecutive event-type transition
    graph."""
    base = """
    WITH seq AS (SELECT event_type AS dst,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS src
                 FROM events),
    e AS (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w
          FROM seq WHERE src IS NOT NULL GROUP BY 1, 2),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    outw AS (SELECT src, sum(w) AS w_out FROM e GROUP BY src),
    r0 AS (SELECT node, round(1.0 / n, 8) AS r FROM nodes, nn)"""
    prev = "r0"
    for i in range(1, iters + 1):
        base += f""",
    d{i} AS (SELECT coalesce(sum(r), 0.0) AS dang FROM {prev}
             LEFT JOIN outw ON {prev}.node = outw.src WHERE outw.src IS NULL),
    c{i} AS (SELECT e.dst AS node, sum({prev}.r * e.w / outw.w_out) AS c
             FROM e JOIN {prev} ON e.src = {prev}.node
             JOIN outw ON e.src = outw.src GROUP BY e.dst),
    r{i} AS (SELECT nodes.node,
                    round(0.0 / n
                          + 1.0 * (coalesce(c{i}.c, 0.0) + dang / n),
                          8) AS r
             FROM nodes LEFT JOIN c{i} ON nodes.node = c{i}.node, nn, d{i})"""
        prev = f"r{i}"
    return base + f"""
    SELECT node AS event_type, round(r, 6) AS stationary_prob FROM {prev}
    """


@_q("events_markov_stationary", _markov_stationary_oracle())
def events_markov_stationary(spark, sf_dir):
    """Stationary distribution of the first-order Markov chain over
    event types (per-user consecutive transitions; 6 fixed power-
    iteration rounds) — where user journeys SPEND their time in the
    long run, the equilibrium view that transition counts
    (events_transition_counts) can't give. Reuses operators.graph.
    pagerank with damping 1.0: teleport vanishes and the dangling-mass
    redistribution becomes the standard stuck-state→uniform patch, so
    the iteration IS the chain's power method; per-round 8-decimal
    rounding keeps engine ULPs from compounding (the graph_pagerank
    discipline, replayed exactly by the unrolled oracle CTE chain).
    The state space is bounded (distinct event types), so each round is
    one tiny equi-join + one map-combinable aggregate."""
    from boann_ocsf_security_data_platform_spark.operators.graph import pagerank

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.lag("event_type").over(w).alias("src"),
        F.col("event_type").alias("dst"),
    ).filter(F.col("src").isNotNull())
    edges = seq.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("double").alias("w")
    )
    pr = pagerank(edges, weight_col="w", damping=1.0, iters=6)
    return pr.select(
        F.col("node").alias("event_type"),
        F.round("pagerank", 6).alias("stationary_prob"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 87: Cramér's V effect size (market segment × order priority)
# ---------------------------------------------------------------------------


@_q(
    "agg_cramers_v",
    """
    WITH j AS (SELECT c_mktsegment AS seg, o_orderpriority AS pri
               FROM orders JOIN customer ON o_custkey = c_custkey),
    nt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM j),
    cell AS (SELECT seg, pri, CAST(count(*) AS DOUBLE) AS o
             FROM j GROUP BY 1, 2),
    rowm AS (SELECT seg, sum(o) AS rt FROM cell GROUP BY seg),
    colm AS (SELECT pri, sum(o) AS ct FROM cell GROUP BY pri),
    chi AS (SELECT sum((o - rt * ct / n) * (o - rt * ct / n)
                       / (rt * ct / n)) AS chi2
            FROM cell JOIN rowm USING (seg) JOIN colm USING (pri)
            CROSS JOIN nt),
    rd AS (SELECT CAST(count(*) AS DOUBLE) AS r FROM rowm),
    cd AS (SELECT CAST(count(*) AS DOUBLE) AS c FROM colm)
    SELECT CAST(n AS BIGINT) AS n,
           round(chi2, 4) AS chi2,
           CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
           round(sqrt(chi2 / (n * least(r - 1, c - 1))), 6) AS cramers_v
    FROM chi CROSS JOIN nt CROSS JOIN rd CROSS JOIN cd
    """,
)
def agg_cramers_v(spark, sf_dir):
    """Cramér's V between customer market segment and order priority —
    the normalized [0,1] effect size the raw chi-square statistic
    (agg_chi_square_independence) can't give across tables of different
    size: V = sqrt(χ² / (N·min(r−1, c−1))). Expected counts come from
    broadcast marginal joins against the bounded cell frame (r×c rows);
    the fact join shuffles once on the customer key and everything after
    is map-combinable."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    # same estimate-forced dim-broadcast hazard as loo_target_encoding:
    # the 2-column customer projection estimates under the threshold at
    # sf100 while really holding 15M rows. Measured-count pin.
    c = _pin(
        c, _gates.pin_shuffle_join_dim(_table_count(spark, sf_dir, "customer"))
    )
    j = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        F.col("o_orderpriority").alias("pri"),
    )
    nt = j.agg(F.count(F.lit(1)).cast("double").alias("n"))
    cell = j.groupBy("seg", "pri").agg(
        F.count(F.lit(1)).cast("double").alias("o")
    )
    rowm = cell.groupBy("seg").agg(F.sum("o").alias("rt"))
    colm = cell.groupBy("pri").agg(F.sum("o").alias("ct"))
    exp = F.col("rt") * F.col("ct") / F.col("n")
    chi = (
        cell.join(F.broadcast(rowm), "seg")
        .join(F.broadcast(colm), "pri")
        .join(F.broadcast(nt))
        .agg(F.sum((F.col("o") - exp) * (F.col("o") - exp) / exp).alias("chi2"))
    )
    rd = rowm.agg(F.count(F.lit(1)).cast("double").alias("r"))
    cd = colm.agg(F.count(F.lit(1)).cast("double").alias("c"))
    return (
        chi.join(F.broadcast(nt))
        .join(F.broadcast(rd))
        .join(F.broadcast(cd))
        .select(
            F.col("n").cast("long").alias("n"),
            F.round("chi2", 4).alias("chi2"),
            ((F.col("r") - 1) * (F.col("c") - 1)).cast("long").alias("dof"),
            F.round(
                F.sqrt(
                    F.col("chi2")
                    / (F.col("n") * F.least(F.col("r") - 1, F.col("c") - 1))
                ),
                6,
            ).alias("cramers_v"),
        )
    )


# ---------------------------------------------------------------------------
# Round-7 wave 88: temperature-scaled dataset-mixture weights (τ = 0.7)
# ---------------------------------------------------------------------------


@_q(
    "corpus_temperature_mixture",
    f"""
    WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                      CAST(sum(len({_WORDS})) AS DOUBLE) AS n_tokens
               FROM documents GROUP BY source),
    tot AS (SELECT sum(n_tokens) AS t FROM c),
    s AS (SELECT source, n_docs, n_tokens, n_tokens / t AS nat,
                 pow(n_tokens, 0.7) AS pw
          FROM c CROSS JOIN tot),
    z AS (SELECT sum(pw) AS zsum FROM s)
    SELECT source, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
           round(nat, 6) AS natural_share,
           round(pw / zsum, 6) AS temp_share,
           round((pw / zsum) / nat, 4) AS upweight,
           round(t * (pw / zsum) / n_tokens, 4) AS epochs_at_budget
    FROM s CROSS JOIN z CROSS JOIN tot
    """,
)
def corpus_temperature_mixture(spark, sf_dir):
    """Temperature-scaled dataset-mixture weights (τ = 0.7, the
    multilingual-pretraining recipe): per-source sampling share ∝
    tokens^τ, reported against the natural share with the implied
    upweight ratio and epochs-per-source at a one-pass token budget —
    the how-many-times-does-the-small-domain-repeat planning table every
    mixture decision starts from (complements corpus_mixture_sample,
    which EXECUTES a target mixture). One token-count aggregate over the
    corpus; every later step lives on the bounded per-source frame with
    scalar totals on broadcast one-row frames."""
    from boann_ocsf_security_data_platform_spark.operators.text import tokens

    c = (
        _t(spark, sf_dir, "documents")
        .select("source", F.size(tokens(F.col("text"))).alias("nt"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").cast("double").alias("n_tokens"),
        )
    )
    tot = c.agg(F.sum("n_tokens").alias("t"))
    s = c.join(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        (F.col("n_tokens") / F.col("t")).alias("nat"),
        F.pow("n_tokens", F.lit(0.7)).alias("pw"),
        "t",
    )
    z = s.agg(F.sum("pw").alias("zsum"))
    share = F.col("pw") / F.col("zsum")
    return s.join(F.broadcast(z)).select(
        "source",
        "n_docs",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round("nat", 6).alias("natural_share"),
        F.round(share, 6).alias("temp_share"),
        F.round(share / F.col("nat"), 4).alias("upweight"),
        F.round(F.col("t") * share / F.col("n_tokens"), 4).alias(
            "epochs_at_budget"
        ),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 89: simplified silhouette over label clusters (embeddings)
# ---------------------------------------------------------------------------


@_q(
    "embedding_label_silhouette",
    """
    WITH pts AS (SELECT vec_id, label,
                   CAST(unnest(range(1, len(embedding) + 1)) AS INT) AS pos,
                   embedding
                 FROM embeddings),
    x AS (SELECT vec_id, label, pos, CAST(embedding[pos] AS DOUBLE) AS v
          FROM pts),
    cent AS (SELECT label AS clabel, pos, round(avg(v), 8) AS c
             FROM x GROUP BY label, pos),
    d2 AS (SELECT vec_id, label, clabel,
                  sqrt(sum((v - c) * (v - c))) AS dist
           FROM x JOIN cent USING (pos) GROUP BY vec_id, label, clabel),
    ab AS (SELECT vec_id, label,
             min(CASE WHEN clabel = label THEN dist END) AS a,
             min(CASE WHEN clabel <> label THEN dist END) AS b
           FROM d2 GROUP BY vec_id, label),
    s AS (SELECT vec_id, label, a, b,
            CASE WHEN greatest(a, b) > 0 THEN (b - a) / greatest(a, b)
                 ELSE 0.0 END AS sil
          FROM ab)
    SELECT label, CAST(count(*) AS BIGINT) AS n_points,
           round(avg(sil), 6) + 0.0 AS mean_silhouette,
           round(avg(a), 4) AS mean_intra,
           round(avg(b), 4) AS mean_nearest_other
    FROM s GROUP BY label
    """,
)
def embedding_label_silhouette(spark, sf_dir):
    """Simplified (centroid-based) silhouette score per label cluster:
    a = distance to own centroid, b = distance to the nearest OTHER
    centroid, s = (b−a)/max(a,b) — the did-my-clustering/labeling-
    actually-separate check behind embedding-space QA, at O(n·k) instead
    of the textbook O(n²) pairwise silhouette. Vectors unnest
    POSITIONALLY (index into the array at an unnested range — the
    text_char_entropy_profile discipline, identical on both engines);
    centroids round to 8 decimals so engine summation-order ULPs cannot
    flip the nearest-other argmin; distances are one positional
    equi-join (n·k·dim rows) + a map-combinable aggregate. At 100 TB the
    centroid frame (k·dim rows) rides a broadcast join and the big side
    never reshuffles."""
    e = _t(spark, sf_dir, "embeddings")
    x = e.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos0", "v0"),
    ).select(
        "vec_id",
        "label",
        (F.col("pos0") + 1).alias("pos"),
        F.col("v0").cast("double").alias("v"),
    )
    cent = x.groupBy(F.col("label").alias("clabel"), "pos").agg(
        F.round(F.avg("v"), 8).alias("c")
    )
    d2 = (
        x.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "label", "clabel")
        .agg(
            F.sqrt(
                F.sum((F.col("v") - F.col("c")) * (F.col("v") - F.col("c")))
            ).alias("dist")
        )
    )
    ab = d2.groupBy("vec_id", "label").agg(
        F.min(F.when(F.col("clabel") == F.col("label"), F.col("dist"))).alias(
            "a"
        ),
        F.min(F.when(F.col("clabel") != F.col("label"), F.col("dist"))).alias(
            "b"
        ),
    )
    sil = F.when(
        F.greatest("a", "b") > 0,
        (F.col("b") - F.col("a")) / F.greatest("a", "b"),
    ).otherwise(0.0)
    return ab.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_points"),
        (F.round(F.avg(sil), 6) + 0.0).alias("mean_silhouette"),
        F.round(F.avg("a"), 4).alias("mean_intra"),
        F.round(F.avg("b"), 4).alias("mean_nearest_other"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 90: RSI-14 momentum indicator over the daily revenue series
# ---------------------------------------------------------------------------


@_q(
    "window_rsi_indicator",
    """
    WITH daily AS (SELECT date_trunc('day', o_orderdate) AS day,
                     sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                       AS rev_c
                   FROM orders GROUP BY 1),
    d AS (SELECT day, rev_c,
                 rev_c - lag(rev_c) OVER (ORDER BY day) AS delta,
                 row_number() OVER (ORDER BY day) AS rn
          FROM daily),
    g AS (SELECT day, rn,
                 avg(greatest(delta, 0)) OVER (
                   ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
                   AS ag,
                 avg(greatest(-delta, 0)) OVER (
                   ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
                   AS al
          FROM d)
    SELECT day,
           round(CASE WHEN al > 0 THEN 100 - 100 / (1 + ag / al)
                      ELSE 100.0 END, 4) AS rsi_14,
           CAST(floor(ag + 0.5) AS BIGINT) AS avg_gain_cents,
           CAST(floor(al + 0.5) AS BIGINT) AS avg_loss_cents
    FROM g WHERE rn >= 15
    """,
)
def window_rsi_indicator(spark, sf_dir):
    """14-period RSI (simple-average variant) over the daily revenue
    series: RSI = 100 − 100/(1 + avgGain/avgLoss) over a 14-row frame —
    the bounded-oscillator shape behind overbought/oversold monitors and
    any is-this-metric-trending-too-hard alert. Revenue is exact integer
    cents (order-independent sums); the day key stays TIMESTAMP on both
    engines (date-render parity); the all-gain degenerate frame pins RSI
    to 100 by definition on both sides. Warm-up rows (fewer than 14
    deltas) are excluded by row_number, not by date arithmetic. One
    aggregate to the bounded daily frame, then two window passes over
    the same global order — a single sort at scale (and a per-series
    partition key the moment there are multiple series)."""
    o = _t(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    daily = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day")
    ).agg(F.sum(cents).alias("rev_c"))
    w = Window.orderBy("day")
    d = daily.select(
        "day",
        (F.col("rev_c") - F.lag("rev_c").over(w)).alias("delta"),
        F.row_number().over(w).alias("rn"),
    )
    frame = Window.orderBy("day").rowsBetween(-13, 0)
    g = d.select(
        "day",
        "rn",
        F.avg(F.greatest("delta", F.lit(0))).over(frame).alias("ag"),
        F.avg(F.greatest(-F.col("delta"), F.lit(0))).over(frame).alias("al"),
    )
    rsi = F.when(
        F.col("al") > 0, 100 - 100 / (1 + F.col("ag") / F.col("al"))
    ).otherwise(F.lit(100.0))
    return g.filter(F.col("rn") >= 15).select(
        "day",
        F.round(rsi, 4).alias("rsi_14"),
        F.floor(F.col("ag") + 0.5).cast("long").alias("avg_gain_cents"),
        F.floor(F.col("al") + 0.5).cast("long").alias("avg_loss_cents"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 91: delete-one-group jackknife variance of the mean
# ---------------------------------------------------------------------------


@_q(
    "agg_jackknife_variance",
    """
    WITH g AS (SELECT c_nationkey,
                 sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS s_c,
                 CAST(count(*) AS BIGINT) AS m
               FROM customer GROUP BY c_nationkey),
    tot AS (SELECT sum(s_c) AS st, sum(m) AS nt,
                   CAST(count(*) AS DOUBLE) AS gg FROM g),
    loo AS (SELECT c_nationkey,
                   (st - s_c) * 1.0 / (nt - m) / 100.0 AS theta_g
            FROM g CROSS JOIN tot),
    jm AS (SELECT avg(theta_g) AS theta_bar FROM loo)
    SELECT CAST(nt AS BIGINT) AS n_customers,
           CAST(gg AS BIGINT) AS n_groups,
           round(any_value(st) * 1.0 / nt / 100.0, 6) AS estimate,
           round(sqrt((gg - 1) / gg
                 * sum((theta_g - theta_bar) * (theta_g - theta_bar))), 6)
             AS jackknife_se
    FROM loo CROSS JOIN tot CROSS JOIN jm
    GROUP BY nt, gg
    """,
)
def agg_jackknife_variance(spark, sf_dir):
    """Delete-one-GROUP jackknife standard error of the mean account
    balance, nations as the resampling blocks — the cluster-aware
    uncertainty estimate plain SE gets wrong when observations within a
    group are correlated (and the agg_bootstrap_subsample_ci sibling
    without resampling randomness: every leave-one-out estimate is
    algebra over the group sums). Balances are exact integer cents so
    the group sums are order-independent; the G leave-one-out estimates
    are row-local arithmetic on the bounded per-group frame against a
    broadcast one-row total. One scan, one shuffle on the group key."""
    c = _t(spark, sf_dir, "customer")
    cents = F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long")
    # the bounded per-group frame feeds four branches (totals, LOO
    # estimates, jack mean, final) — checkpoint it so the customer scan
    # happens ONCE, not once per branch
    g = (
        c.groupBy("c_nationkey")
        .agg(F.sum(cents).alias("s_c"), F.count(F.lit(1)).alias("m"))
        .localCheckpoint(eager=True)
    )
    tot = g.agg(
        F.sum("s_c").alias("st"),
        F.sum("m").alias("nt"),
        F.count(F.lit(1)).cast("double").alias("gg"),
    )
    loo = g.join(F.broadcast(tot)).select(
        "st",
        "nt",
        "gg",
        (
            (F.col("st") - F.col("s_c"))
            * 1.0
            / (F.col("nt") - F.col("m"))
            / 100.0
        ).alias("theta_g"),
    )
    jm = loo.agg(F.avg("theta_g").alias("theta_bar"))
    dev = F.col("theta_g") - F.col("theta_bar")
    return (
        loo.join(F.broadcast(jm))
        .groupBy("nt", "gg")
        .agg(
            F.round(
                F.sqrt(
                    (F.col("gg") - 1) / F.col("gg") * F.sum(dev * dev)
                ),
                6,
            ).alias("jackknife_se"),
            F.round(
                F.any_value(F.col("st") * 1.0 / F.col("nt") / 100.0), 6
            ).alias("estimate"),
        )
        .select(
            F.col("nt").cast("long").alias("n_customers"),
            F.col("gg").cast("long").alias("n_groups"),
            "estimate",
            "jackknife_se",
        )
    )


# ---------------------------------------------------------------------------
# Round-7 wave 92: pairwise source vocabulary Jaccard overlap
# ---------------------------------------------------------------------------


@_q(
    "text_vocab_jaccard_sources",
    f"""
    WITH v AS (SELECT DISTINCT source, unnest({_WORDS}) AS term
               FROM documents),
    sz AS (SELECT source, CAST(count(*) AS BIGINT) AS nv FROM v
           GROUP BY source),
    inter AS (SELECT a.source AS sa, b.source AS sb,
                     CAST(count(*) AS BIGINT) AS n_inter
              FROM v a JOIN v b ON a.term = b.term AND a.source < b.source
              GROUP BY 1, 2)
    SELECT sa AS source_a, sb AS source_b, n_inter,
           na.nv + nb.nv - n_inter AS n_union,
           round(n_inter * 1.0 / (na.nv + nb.nv - n_inter), 6) AS jaccard
    FROM inter
    JOIN sz na ON sa = na.source
    JOIN sz nb ON sb = nb.source
    """,
)
def text_vocab_jaccard_sources(spark, sf_dir):
    """Vocabulary Jaccard overlap between every source pair — the
    set-level companion to text_js_divergence_sources (shared WORDS
    rather than shared MASS): low overlap between dumps that should
    share a domain flags tokenizer drift or crawl-scope change, high
    overlap across supposedly-distinct domains flags mirror
    contamination. The intersection is one equi-self-join on the term
    of the DISTINCT (source, term) frame (term is the shuffle key;
    source inequality prunes inside the join); vocab sizes ride
    broadcast joins on the bounded per-source frame."""
    from boann_ocsf_security_data_platform_spark.operators.text import tokens

    v = (
        _t(spark, sf_dir, "documents")
        .select("source", F.explode(tokens(F.col("text"))).alias("term"))
        .distinct()
    )
    sz = v.groupBy("source").agg(F.count(F.lit(1)).alias("nv"))
    a = v.alias("a")
    # per-source vocabularies are vocabulary-scaling — pinned above the
    # measured-count threshold
    b = _pin(v.alias("b"), _gates.pin_shuffle_join(_table_count(spark, sf_dir, "documents")))
    inter = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("sa"), F.col("b.source").alias("sb")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    na = sz.select(F.col("source").alias("sa"), F.col("nv").alias("na_v"))
    nb = sz.select(F.col("source").alias("sb"), F.col("nv").alias("nb_v"))
    uni = F.col("na_v") + F.col("nb_v") - F.col("n_inter")
    return (
        inter.join(F.broadcast(na), "sa")
        .join(F.broadcast(nb), "sb")
        .select(
            F.col("sa").alias("source_a"),
            F.col("sb").alias("source_b"),
            "n_inter",
            uni.alias("n_union"),
            F.round(F.col("n_inter") * 1.0 / uni, 6).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Round-7 wave 93: Monte-Carlo permutation test (deterministic hash labels)
# ---------------------------------------------------------------------------


_H64_PERMBLK = _H64.format(
    expr="concat('permblk', CAST(b AS VARCHAR), ':', CAST(event_id AS VARCHAR))"
)


@_q(
    "agg_permutation_test",
    f"""
    WITH mn AS (SELECT min(event_type) AS m FROM events),
    obs AS (SELECT
              CAST(count(*) FILTER (WHERE event_type = m) AS BIGINT) AS n_a,
              CAST(count(*) FILTER (WHERE event_type <> m) AS BIGINT) AS n_b,
              round(avg(value) FILTER (WHERE event_type = m)
                    - avg(value) FILTER (WHERE event_type <> m), 8) AS t_obs
            FROM events CROSS JOIN mn),
    hs AS (SELECT value,
             list_transform(range(0, 4),
               b -> {_H64_PERMBLK}) AS hlist
           FROM events),
    ks AS (SELECT CAST(unnest(range(1, 200)) AS BIGINT) AS k),
    perm AS (SELECT k,
               round(avg(CASE WHEN
                   (hlist[CAST((k - 1) // 60 AS INT) + 1] >> ((k - 1) % 60))
                     & 1 = 0 THEN value END)
                 - avg(CASE WHEN
                   (hlist[CAST((k - 1) // 60 AS INT) + 1] >> ((k - 1) % 60))
                     & 1 = 1 THEN value END), 8) AS t_k
             FROM hs CROSS JOIN ks GROUP BY k)
    SELECT n_a, n_b, round(t_obs, 4) AS t_obs,
           CAST(count(*) AS BIGINT) AS n_perms,
           round((1.0 + count(*) FILTER (WHERE abs(t_k) >= abs(t_obs)))
                 / (count(*) + 1), 6) AS p_value
    FROM perm CROSS JOIN obs GROUP BY n_a, n_b, t_obs
    """,
)
def agg_permutation_test(spark, sf_dir):
    """Monte-Carlo permutation test of the mean-value difference between
    the first event type and the rest, 199 DETERMINISTIC relabelings —
    the assumption-free two-sample test (no normality, no equal
    variances: the null is built by breaking the label-value link
    itself). Each row hashes FOUR portable 60-bit md5 blocks ONCE
    (materialized in their own projection — the lambda-CSE discipline);
    permutation k's pseudo-label is bit (k-1)%60 of block (k-1)//60, so
    the rows x 199 explode does only shift-and-mask arithmetic, never
    another hash (first cut recomputed md5 per exploded row: 18.4 s at
    sf0.1; this shape runs ~1 s). Statistics round to 8 decimals BEFORE
    the exceedance comparison so summation-order ULPs cannot flip a
    count. One map-combinable aggregate keyed by k; at 100 TB run the
    permutations over a stratified hash-subsample (the documented
    approximate path) — the plan shape stays one shuffle."""
    e = _t(spark, sf_dir, "events")
    mn = e.agg(F.min("event_type").alias("m"))
    is_a = F.col("event_type") == F.col("m")
    obs = (
        e.join(F.broadcast(mn))
        .agg(
            F.count(F.when(is_a, 1)).alias("n_a"),
            F.count(F.when(~is_a, 1)).alias("n_b"),
            F.round(
                F.avg(F.when(is_a, F.col("value")))
                - F.avg(F.when(~is_a, F.col("value"))),
                8,
            ).alias("t_obs"),
        )
    )
    from boann_ocsf_security_data_platform_spark.functions.hash_fns import hash64

    hs = e.select(
        "value",
        F.array(
            *[
                hash64(
                    F.concat(
                        F.lit(f"permblk{b}:"),
                        F.col("event_id").cast("string"),
                    )
                )
                for b in range(4)
            ]
        ).alias("hlist"),
    )
    exploded = hs.withColumn(
        "k", F.explode(F.sequence(F.lit(1), F.lit(199)).cast("array<long>"))
    ).select(
        "k",
        "value",
        F.expr(
            "(shiftright(element_at(hlist, CAST((k - 1) DIV 60 AS INT) + 1),"
            " CAST((k - 1) % 60 AS INT)) & 1) AS g"
        ),
    )
    perm = exploded.groupBy("k").agg(
        F.round(
            F.avg(F.when(F.col("g") == 0, F.col("value")))
            - F.avg(F.when(F.col("g") == 1, F.col("value"))),
            8,
        ).alias("t_k")
    )
    return (
        perm.join(F.broadcast(obs))
        .groupBy("n_a", "n_b", "t_obs")
        .agg(
            F.count(F.lit(1)).alias("n_perms"),
            F.round(
                (
                    1.0
                    + F.count(F.when(F.abs("t_k") >= F.abs("t_obs"), 1))
                )
                / (F.count(F.lit(1)) + 1),
                6,
            ).alias("p_value"),
        )
        .select(
            "n_a",
            "n_b",
            F.round("t_obs", 4).alias("t_obs"),
            "n_perms",
            "p_value",
        )
    )


# ---------------------------------------------------------------------------
# Round-7 wave 94: BMP container synthesis -> stride-verified parse round-trip
# ---------------------------------------------------------------------------


@_q(
    "multimodal_bmp_roundtrip",
    """
    WITH dims AS (SELECT doc_id,
                    CAST(n_chars % 31 + 1 AS BIGINT) AS w,
                    CAST(doc_id % 7 + 1 AS BIGINT) AS h
                  FROM documents)
    SELECT doc_id, 'bmp' AS format,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(24 AS INT) AS bits_per_pixel,
           CAST(((3 * w + 3) // 4) * 4 AS INT) AS row_stride,
           FALSE AS top_down,
           TRUE AS size_ok
    FROM dims
    """,
)
def multimodal_bmp_roundtrip(spark, sf_dir):
    """Synthesize a VALID 24-bit BMP per document in pure Column
    expressions — BITMAPFILEHEADER + BITMAPINFOHEADER little-endian via
    hex/unhex, data-derived dimensions (width from n_chars exercises
    every remainder case of the 4-byte row-stride padding), and a zero
    pixel array sized EXACTLY stride*height — then push it through the
    stride/size-verifying parser (operators/multimodal.py:
    parse_bmp_meta). The oracle computes expected dimensions and the
    padded stride directly from the table with integer floor division
    (engine-cast discipline), and size_ok must read TRUE on every row:
    any byte drift in the synthesis or the parser's stride arithmetic
    breaks the hash. The uncompressed-raster sibling of the PNG/WAV/MP4
    round-trips; synthesis is row-local, parsing the Arrow mapInPandas
    stage."""
    from boann_ocsf_security_data_platform_spark.operators.multimodal import (
        parse_bmp_meta,
    )

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        (F.col("n_chars") % 31 + 1).cast("long").alias("w"),
        (F.col("doc_id") % 7 + 1).cast("long").alias("h"),
    )
    stride = (F.floor((3 * F.col("w") + 3) / 4) * 4).cast("long")
    data_len = stride * F.col("h")
    bmp = F.concat(
        F.lit(b"BM"),
        _le_bytes(data_len + 54, 8),          # file size
        F.lit(bytes(4)),                      # reserved
        _le_bytes(F.lit(54), 8),              # pixel-array offset
        _le_bytes(F.lit(40), 8),              # BITMAPINFOHEADER size
        _le_bytes(F.col("w"), 8),             # width  (LE32)
        _le_bytes(F.col("h"), 8),             # height (LE32, bottom-up)
        _le_bytes(F.lit(1), 4),               # planes (LE16)
        _le_bytes(F.lit(24), 4),              # bpp    (LE16)
        _le_bytes(F.lit(0), 8),               # BI_RGB
        _le_bytes(data_len, 8),               # image size
        _le_bytes(F.lit(2835), 8),            # x ppm
        _le_bytes(F.lit(2835), 8),            # y ppm
        _le_bytes(F.lit(0), 8),               # palette colors
        _le_bytes(F.lit(0), 8),               # important colors
        F.unhex(F.repeat(F.lit("00"), data_len.cast("int"))),
    )
    meta = parse_bmp_meta(d.select("media_id", bmp.alias("payload")))
    return meta.select(
        F.col("media_id").alias("doc_id"),
        "format",
        "width",
        "height",
        "bits_per_pixel",
        "row_stride",
        "top_down",
        "size_ok",
    )


# ---------------------------------------------------------------------------
# Round-7 wave 95: Bollinger bands + %B over the daily revenue series
# ---------------------------------------------------------------------------


@_q(
    "window_bollinger_bands",
    """
    WITH daily AS (SELECT date_trunc('day', o_orderdate) AS day,
                     sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                       AS rev_c
                   FROM orders GROUP BY 1),
    b AS (SELECT day, rev_c,
                 row_number() OVER (ORDER BY day) AS rn,
                 avg(rev_c) OVER (ORDER BY day
                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS ma,
                 stddev_samp(rev_c) OVER (ORDER BY day
                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS sd
          FROM daily)
    SELECT day, CAST(rev_c AS BIGINT) AS close_cents,
           CAST(floor(ma + 0.5) AS BIGINT) AS ma_cents,
           round(sd / 100.0, 2) AS sd_dollars,
           round(CASE WHEN sd > 0
                      THEN (rev_c - (ma - 2 * sd)) / (4 * sd) END, 4)
             AS pct_b,
           round(CASE WHEN ma > 0 THEN 4 * sd / ma END, 6) AS bandwidth
    FROM b WHERE rn >= 20
    """,
)
def window_bollinger_bands(spark, sf_dir):
    """Bollinger bands (20-day mean +/- 2 sigma) with %B and relative
    bandwidth over the daily revenue series — the volatility-envelope
    companion to window_rsi_indicator: %B locates today inside the
    envelope, the bandwidth spike IS the volatility-regime-change alarm.
    Revenue is exact integer cents; mean/stddev run over the same fixed
    20-row frame (one global sort shared with a row_number pass — at
    scale, a per-series partition key); degenerate zero-variance frames
    yield NULL %B via an explicit guard on both engines."""
    o = _t(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    daily = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day")
    ).agg(F.sum(cents).alias("rev_c"))
    w = Window.orderBy("day")
    frame = Window.orderBy("day").rowsBetween(-19, 0)
    b = daily.select(
        "day",
        "rev_c",
        F.row_number().over(w).alias("rn"),
        F.avg("rev_c").over(frame).alias("ma"),
        F.stddev_samp("rev_c").over(frame).alias("sd"),
    )
    pct_b = F.when(
        F.col("sd") > 0,
        (F.col("rev_c") - (F.col("ma") - 2 * F.col("sd")))
        / (4 * F.col("sd")),
    )
    return b.filter(F.col("rn") >= 20).select(
        "day",
        F.col("rev_c").alias("close_cents"),
        F.floor(F.col("ma") + 0.5).cast("long").alias("ma_cents"),
        F.round(F.col("sd") / 100.0, 2).alias("sd_dollars"),
        F.round(pct_b, 4).alias("pct_b"),
        F.round(
            F.when(F.col("ma") > 0, 4 * F.col("sd") / F.col("ma")), 6
        ).alias("bandwidth"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 96: Bellman-Ford shortest paths (min-plus fixed rounds)
# ---------------------------------------------------------------------------


def _bellman_ford_oracle(iters: int = 5) -> str:
    """Unrolled min-plus relaxation CTE chain (the _pagerank_oracle
    pattern on a different semiring) over the nation trade graph with
    affinity costs w = 1/count; the explicit NULL ladder mirrors the
    operator exactly (engine least() NULL semantics differ)."""
    base = """
    WITH e0 AS (SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
                       CAST(count(*) AS DOUBLE) AS cnt
                FROM lineitem l
                JOIN orders o ON l.l_orderkey = o.o_orderkey
                JOIN customer c ON o.o_custkey = c.c_custkey
                JOIN supplier s ON l.l_suppkey = s.s_suppkey
                GROUP BY 1, 2),
    e AS (SELECT src, dst, round(1.0 / cnt, 8) AS w FROM e0),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    d0 AS (SELECT node, CASE WHEN node = 0 THEN 0.0 END AS d FROM nodes)"""
    prev = "d0"
    for i in range(1, iters + 1):
        base += f""",
    c{i} AS (SELECT e.dst AS node, min({prev}.d + e.w) AS cand
             FROM e JOIN {prev} ON e.src = {prev}.node
             WHERE {prev}.d IS NOT NULL GROUP BY e.dst),
    d{i} AS (SELECT {prev}.node,
               round(CASE WHEN {prev}.d IS NULL THEN c{i}.cand
                          WHEN c{i}.cand IS NULL THEN {prev}.d
                          WHEN c{i}.cand < {prev}.d THEN c{i}.cand
                          ELSE {prev}.d END, 6) AS d
             FROM {prev} LEFT JOIN c{i} ON {prev}.node = c{i}.node)"""
        prev = f"d{i}"
    return base + f"""
    SELECT node AS nationkey, round(d, 6) AS distance FROM {prev}
    """


@_q("graph_bellman_ford_sssp", _bellman_ford_oracle())
def graph_bellman_ford_sssp(spark, sf_dir):
    """Single-source cheapest paths from nation 0 over the trade graph,
    edge cost = 1/trade-count (strong trade = cheap hop), 5 fixed
    Bellman-Ford relaxation rounds — the min-plus semiring sibling of
    graph_pagerank: same one-equi-join-plus-one-aggregate per round,
    same localCheckpoint lineage cuts, same per-round rounding, but the
    aggregate is min(d+w) instead of sum(r*w/W), covering latency-budget
    and cheapest-route rollups (operators/graph.py:bellman_ford_sssp).
    k rounds = exact distances over <= k-hop paths, replayed exactly by
    the unrolled oracle CTE chain; unreached nodes stay NULL through an
    explicit NULL ladder on both engines."""
    from boann_ocsf_security_data_platform_spark.operators.graph import (
        bellman_ford_sssp,
    )

    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    edges = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg(
            F.round(1.0 / F.count(F.lit(1)).cast("double"), 8).alias("w")
        )
    )
    d = bellman_ford_sssp(edges, source=0, iters=5)
    return d.select(
        F.col("node").alias("nationkey"),
        F.round("distance", 6).alias("distance"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 97: open-order aging buckets (receivables-style report)
# ---------------------------------------------------------------------------


@_q(
    "orders_aging_buckets",
    """
    WITH mx AS (SELECT max(CAST(date_trunc('day', o_orderdate) AS DATE))
                  AS gmax FROM orders),
    open_o AS (SELECT o_orderkey,
                 date_diff('day',
                           CAST(date_trunc('day', o_orderdate) AS DATE),
                           gmax) AS age_days,
                 CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
               FROM orders CROSS JOIN mx
               WHERE o_orderstatus <> 'F'),
    b AS (SELECT CASE WHEN age_days <= 30 THEN '0-30'
                      WHEN age_days <= 90 THEN '31-90'
                      WHEN age_days <= 365 THEN '91-365'
                      ELSE '365+' END AS bucket,
                 age_days, cents
          FROM open_o)
    SELECT bucket, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS open_cents,
           CAST(min(age_days) AS BIGINT) AS min_age_days,
           CAST(max(age_days) AS BIGINT) AS max_age_days
    FROM b GROUP BY bucket
    """,
)
def orders_aging_buckets(spark, sf_dir):
    """Open-order aging report: every non-finalized order bucketed by age
    against the latest order day (0-30 / 31-90 / 91-365 / 365+), with
    exact integer-cent exposure per bucket — the receivables/backlog
    primitive behind every is-old-work-piling-up ops dashboard. Integer
    day arithmetic against a broadcast one-row max (NTZ-proof), one scan,
    one map-combinable aggregate to a four-row frame."""
    o = _t(spark, sf_dir, "orders")
    day = F.date_trunc("day", F.col("o_orderdate")).cast("date")
    mx = o.agg(F.max(day).alias("gmax"))
    age = F.datediff("gmax", day)
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    bucket = (
        F.when(age <= 30, "0-30")
        .when(age <= 90, "31-90")
        .when(age <= 365, "91-365")
        .otherwise("365+")
    )
    return (
        o.join(F.broadcast(mx))
        .filter(F.col("o_orderstatus") != "F")
        .select(
            bucket.alias("bucket"),
            age.alias("age_days"),
            cents.alias("cents"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("open_cents"),
            F.min("age_days").cast("long").alias("min_age_days"),
            F.max("age_days").cast("long").alias("max_age_days"),
        )
    )


# ---------------------------------------------------------------------------
# Round-7 wave 98: Lincoln-Petersen capture-recapture population estimate
# ---------------------------------------------------------------------------


@_q(
    "events_capture_recapture",
    """
    WITH d AS (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
               FROM events),
    bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
    half AS (SELECT d0,
               CAST(floor(date_diff('day', d0, d1) / 2.0) AS BIGINT) AS mid
             FROM bounds),
    marked AS (SELECT DISTINCT user_id,
                 date_diff('day', d0, day) < mid AS in_p1
               FROM d CROSS JOIN half),
    s AS (SELECT
            CAST(count(DISTINCT CASE WHEN in_p1 THEN user_id END) AS BIGINT)
              AS n1,
            CAST(count(DISTINCT CASE WHEN NOT in_p1 THEN user_id END)
              AS BIGINT) AS n2,
            CAST(count(*) FILTER (WHERE in_p1)
                 + count(*) FILTER (WHERE NOT in_p1)
                 - count(DISTINCT user_id) AS BIGINT) AS m,
            CAST(count(DISTINCT user_id) AS BIGINT) AS n_observed
          FROM marked)
    SELECT n1, n2, m, n_observed,
           round(CASE WHEN m > 0
                      THEN (n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0 END, 2)
             AS chapman_estimate
    FROM s
    """,
)
def events_capture_recapture(spark, sf_dir):
    """Capture-recapture population estimate (Chapman's bias-corrected
    Lincoln-Petersen): the first and second half of the day range are
    two capture occasions; users seen in both are recaptures, and
    N-hat = (n1+1)(n2+1)/(m+1) - 1 estimates the TOTAL population
    including never-observed users — the how-many-users-do-we-actually-
    have estimator behind market-size and dark-traffic questions (the
    same statistics ecologists use to count fish). One
    distinct-projection scan, conditional distinct aggregates, integer
    day arithmetic on a broadcast one-row bound; the degenerate
    no-recapture case yields NULL via an explicit guard on both
    engines."""
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    )
    bounds = e.agg(F.min("day").alias("d0"), F.max("day").alias("d1")).select(
        "d0",
        F.floor(F.datediff("d1", "d0") / 2.0).cast("long").alias("mid"),
    )
    marked = (
        e.join(F.broadcast(bounds))
        .select(
            "user_id",
            (F.datediff("day", "d0") < F.col("mid")).alias("in_p1"),
        )
        .distinct()
    )
    s = marked.agg(
        F.countDistinct(F.when(F.col("in_p1"), F.col("user_id"))).alias("n1"),
        F.countDistinct(F.when(~F.col("in_p1"), F.col("user_id"))).alias("n2"),
        (
            F.count(F.when(F.col("in_p1"), 1))
            + F.count(F.when(~F.col("in_p1"), 1))
            - F.countDistinct("user_id")
        ).alias("m"),
        F.countDistinct("user_id").alias("n_observed"),
    )
    est = F.when(
        F.col("m") > 0,
        (F.col("n1") + 1.0) * (F.col("n2") + 1.0) / (F.col("m") + 1.0) - 1.0,
    )
    return s.select(
        "n1",
        "n2",
        "m",
        "n_observed",
        F.round(est, 2).alias("chapman_estimate"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 99: diagonal-Mahalanobis embedding outliers
# ---------------------------------------------------------------------------


@_q(
    "embedding_mahalanobis_outliers",
    """
    WITH x AS (SELECT vec_id, label,
                 CAST(unnest(range(1, len(embedding) + 1)) AS INT) AS pos,
                 embedding
               FROM embeddings),
    v AS (SELECT vec_id, label, pos,
                 CAST(embedding[pos] AS DOUBLE) AS val FROM x),
    stats AS (SELECT pos, round(avg(val), 8) AS mu,
                     round(stddev_samp(val), 8) AS sd
              FROM v GROUP BY pos),
    score AS (SELECT vec_id, label,
                sqrt(sum(CASE WHEN sd > 0
                              THEN (val - mu) * (val - mu) / (sd * sd)
                              ELSE 0.0 END)) AS md
              FROM v JOIN stats USING (pos) GROUP BY vec_id, label)
    SELECT vec_id, CAST(label AS INT) AS label, round(md, 4) AS mahalanobis
    FROM score ORDER BY md DESC, vec_id LIMIT 20
    """,
)
def embedding_mahalanobis_outliers(spark, sf_dir):
    """Top-20 embedding outliers by diagonal Mahalanobis distance
    (per-dimension z-scores, sqrt of the summed squares) — the
    embedding-space QA sweep that catches corrupt vectors, collapsed
    encoders, and domain leaks BEFORE they poison an ANN index or a
    semantic-dedup pass; diagonal covariance keeps it one positional
    aggregate instead of a d x d matrix solve (full covariance is the
    documented scale-out via a d x d gram aggregate). Per-dimension
    mean/std round to 8 decimals so summation-order ULPs cannot reorder
    the top-k; stats ride a broadcast join keyed by position; the top-20
    plans as TakeOrdered, never a global sort materialization."""
    e = _t(spark, sf_dir, "embeddings")
    v = e.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos0", "val0"),
    ).select(
        "vec_id",
        "label",
        (F.col("pos0") + 1).alias("pos"),
        F.col("val0").cast("double").alias("val"),
    )
    stats = v.groupBy("pos").agg(
        F.round(F.avg("val"), 8).alias("mu"),
        F.round(F.stddev_samp("val"), 8).alias("sd"),
    )
    z2 = F.when(
        F.col("sd") > 0,
        (F.col("val") - F.col("mu"))
        * (F.col("val") - F.col("mu"))
        / (F.col("sd") * F.col("sd")),
    ).otherwise(0.0)
    score = (
        v.join(F.broadcast(stats), "pos")
        .groupBy("vec_id", "label")
        .agg(F.sqrt(F.sum(z2)).alias("md"))
    )
    return (
        score.orderBy(F.desc("md"), F.asc("vec_id"))
        .limit(20)
        .select(
            "vec_id",
            F.col("label").cast("int").alias("label"),
            F.round("md", 4).alias("mahalanobis"),
        )
    )


# ---------------------------------------------------------------------------
# Round-7 wave 100: code-vs-prose detection (symbol-density heuristic)
# ---------------------------------------------------------------------------


@_q(
    "text_code_detection",
    """
    WITH d AS (SELECT source,
                 length(text) AS n,
                 length(text) - length(regexp_replace(text,
                   '[{}();=<>#]', '', 'g')) AS n_sym
               FROM documents WHERE length(text) > 0),
    r AS (SELECT source, n_sym * 1.0 / n AS sym_ratio FROM d)
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE sym_ratio > 0.03) AS BIGINT)
             AS n_code_docs,
           round(avg(CASE WHEN sym_ratio > 0.03 THEN 1.0 ELSE 0.0 END), 6)
             AS code_share,
           round(avg(sym_ratio), 6) AS avg_symbol_ratio,
           round(max(sym_ratio), 6) AS max_symbol_ratio
    FROM r GROUP BY source
    """,
)
def text_code_detection(spark, sf_dir):
    """Code-vs-prose split per source by structural-symbol density
    ({ } ( ) ; = < > #) — the cheapest code detector in a curation
    pipeline, and the first gate before routing documents to a code
    tokenizer vs a prose quality model (natural prose sits well under 3%
    symbol density; source files, config dumps, and minified blobs sit
    far above). One regexp_replace length-difference per document (the
    count-without-extracting idiom — no explode, no UDF), rolled up per
    source in one map-combinable aggregate."""
    d = _t(spark, sf_dir, "documents").filter(F.length("text") > 0).select(
        "source",
        (
            (
                F.length("text")
                - F.length(F.regexp_replace("text", "[{}();=<>#]", ""))
            )
            * 1.0
            / F.length("text")
        ).alias("sym_ratio"),
    )
    is_code = F.col("sym_ratio") > 0.03
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(is_code, 1)).alias("n_code_docs"),
        F.round(F.avg(F.when(is_code, 1.0).otherwise(0.0)), 6).alias(
            "code_share"
        ),
        F.round(F.avg("sym_ratio"), 6).alias("avg_symbol_ratio"),
        F.round(F.max("sym_ratio"), 6).alias("max_symbol_ratio"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 101: rare-category collapse + frequency encoding
# ---------------------------------------------------------------------------


@_q(
    "feature_rare_category_collapse",
    """
    WITH tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM part),
    c AS (SELECT p_type AS cat, count(*) AS cnt FROM part GROUP BY p_type),
    mapped AS (SELECT CASE WHEN cnt * 1.0 / n < 0.005 THEN '__rare__'
                           ELSE cat END AS cat_out, cnt
               FROM c CROSS JOIN tot)
    SELECT cat_out AS category,
           CAST(sum(cnt) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_merged_categories,
           round(sum(cnt) / any_value(n), 6) AS frequency
    FROM mapped CROSS JOIN tot GROUP BY cat_out
    """,
)
def feature_rare_category_collapse(spark, sf_dir):
    """Rare-category collapse + frequency encoding over part types:
    categories under 0.5% support merge into a single __rare__ level
    before encoding — the cardinality-control step every categorical
    feature needs (unseen/rare levels otherwise explode one-hot width
    and leak noise into target encodings; the collapsed level is also
    the natural serving-time fallback for unseen categories). One
    count-by-category aggregate, the collapse is row-local arithmetic on
    the bounded category frame against a broadcast one-row total."""
    p = _t(spark, sf_dir, "part")
    tot = p.agg(F.count(F.lit(1)).cast("double").alias("n"))
    c = p.groupBy(F.col("p_type").alias("cat")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    mapped = c.join(F.broadcast(tot)).select(
        F.when(F.col("cnt") * 1.0 / F.col("n") < 0.005, "__rare__")
        .otherwise(F.col("cat"))
        .alias("cat_out"),
        "cnt",
        "n",
    )
    return mapped.groupBy(F.col("cat_out").alias("category")).agg(
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_merged_categories"),
        F.round(F.sum("cnt") / F.any_value("n"), 6).alias("frequency"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 102: local-maximum peak detection over the daily series
# ---------------------------------------------------------------------------


@_q(
    "events_peak_detection",
    """
    WITH daily AS (SELECT date_trunc('day', ts) AS day,
                     CAST(count(*) AS BIGINT) AS n
                   FROM events GROUP BY 1),
    w AS (SELECT day, n,
                 lag(n) OVER (ORDER BY day) AS prev,
                 lead(n) OVER (ORDER BY day) AS nxt,
                 avg(n) OVER (ORDER BY day
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS base
          FROM daily)
    SELECT day, n AS n_events,
           round(base, 2) AS baseline_7d,
           round(n / base, 4) AS spike_ratio
    FROM w
    WHERE prev IS NOT NULL AND nxt IS NOT NULL
      AND n > prev AND n > nxt AND base > 0 AND n >= 1.2 * base
    """,
)
def events_peak_detection(spark, sf_dir):
    """Daily-volume peak detection: a peak is a STRICT local maximum
    (greater than both neighbors) that also clears 1.2x its trailing
    7-day baseline — the two-condition rule that separates real spikes
    from sawtooth noise (local-max alone) and from slow ramps (threshold
    alone); the launch/incident/anomaly marker every ops dashboard
    draws. One aggregate to the bounded daily frame, one window pass
    (lag/lead/trailing-avg share the global day order — per-series
    partition key at scale); integer counts make neighbor comparisons
    exact on both engines."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.orderBy("day")
    base_w = Window.orderBy("day").rowsBetween(-7, -1)
    d = daily.select(
        "day",
        "n",
        F.lag("n").over(w).alias("prev"),
        F.lead("n").over(w).alias("nxt"),
        F.avg("n").over(base_w).alias("base"),
    )
    return d.filter(
        F.col("prev").isNotNull()
        & F.col("nxt").isNotNull()
        & (F.col("n") > F.col("prev"))
        & (F.col("n") > F.col("nxt"))
        & (F.col("base") > 0)
        & (F.col("n") >= 1.2 * F.col("base"))
    ).select(
        "day",
        F.col("n").alias("n_events"),
        F.round("base", 2).alias("baseline_7d"),
        F.round(F.col("n") / F.col("base"), 4).alias("spike_ratio"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 103: Gumbel extreme-value fit over monthly revenue maxima
# ---------------------------------------------------------------------------


@_q(
    "agg_extreme_value_gumbel",
    """
    WITH daily AS (SELECT date_trunc('day', o_orderdate) AS day,
                     sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                       AS rev_c
                   FROM orders GROUP BY 1),
    mm AS (SELECT date_trunc('month', day) AS month,
                  max(rev_c) AS block_max
           FROM daily GROUP BY 1),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n_blocks,
                 avg(block_max) AS mean_max,
                 stddev_samp(block_max) AS sd_max
          FROM mm)
    SELECT n_blocks,
           CAST(floor(mean_max + 0.5) AS BIGINT) AS mean_max_cents,
           round(sd_max * sqrt(6) / pi() / 100.0, 2) AS beta_dollars,
           round((mean_max - 0.5772156649015329 * sd_max * sqrt(6) / pi())
                 / 100.0, 2) AS mu_dollars,
           round((mean_max - 0.5772156649015329 * sd_max * sqrt(6) / pi()
                  - sd_max * sqrt(6) / pi() * ln(-ln(0.99))) / 100.0, 2)
             AS p99_dollars
    FROM s
    """,
)
def agg_extreme_value_gumbel(spark, sf_dir):
    """Gumbel extreme-value fit by the method of moments over monthly
    block maxima of daily revenue: beta = sd sqrt(6)/pi, mu = mean -
    gamma_E beta, and the implied 99th-percentile monthly max mu - beta
    ln(-ln 0.99) — the EVT answer to how-big-can-the-spike-get that
    capacity planning needs and that averages structurally cannot give
    (extremes follow their own distribution). Exact integer-cent daily
    sums, a bounded monthly block-max frame, and a one-row moments fit —
    the Euler-Mascheroni constant is inlined verbatim on both engines."""
    o = _t(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    daily = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day")
    ).agg(F.sum(cents).alias("rev_c"))
    mm = daily.groupBy(F.date_trunc("month", F.col("day")).alias("month")).agg(
        F.max("rev_c").alias("block_max")
    )
    s = mm.agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.avg("block_max").alias("mean_max"),
        F.stddev_samp("block_max").alias("sd_max"),
    )
    import math as _math

    gamma_e = 0.5772156649015329
    beta = F.col("sd_max") * _math.sqrt(6) / _math.pi
    mu = F.col("mean_max") - gamma_e * beta
    return s.select(
        "n_blocks",
        F.floor(F.col("mean_max") + 0.5).cast("long").alias("mean_max_cents"),
        F.round(beta / 100.0, 2).alias("beta_dollars"),
        F.round(mu / 100.0, 2).alias("mu_dollars"),
        F.round(
            (mu - beta * _math.log(-_math.log(0.99))) / 100.0, 2
        ).alias("p99_dollars"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 104: intra-document repetition ratio (degenerate-text gate)
# ---------------------------------------------------------------------------


@_q(
    "text_repetition_ratio",
    f"""
    WITH ws AS (SELECT doc_id, source, {_WORDS} AS ws FROM documents),
    g AS (SELECT doc_id, source,
                 CAST(len(ws) - 2 AS BIGINT) AS n_grams,
                 CAST(len(list_distinct(list_transform(
                   range(1, len(ws) - 1),
                   i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2])))
                   AS BIGINT) AS n_distinct
          FROM ws WHERE len(ws) >= 3)
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           round(avg((n_grams - n_distinct) * 1.0 / n_grams), 6)
             AS avg_repetition,
           round(max((n_grams - n_distinct) * 1.0 / n_grams), 6)
             AS max_repetition,
           CAST(count(*) FILTER (
             WHERE (n_grams - n_distinct) * 1.0 / n_grams > 0.2) AS BIGINT)
             AS n_degenerate
    FROM g GROUP BY source
    """,
)
def text_repetition_ratio(spark, sf_dir):
    """Intra-document trigram repetition ratio profiled per source —
    1 - distinct/total word-trigrams, THE degenerate-generation gate
    (looping LM output, boilerplate stamps, and copy-paste spam repeat
    n-grams; natural prose almost never exceeds 20%), complementing the
    INTER-document dedup family which can't see a document repeating
    itself. Trigrams stay row-local (array transform + array_distinct on
    the token array — no explode, no shuffle until the bounded per-source
    rollup); docs under 3 tokens are excluded on both engines (the
    sequence(1,0) descending-array trap)."""
    from boann_ocsf_security_data_platform_spark.operators.text import tokens

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", tokens(F.col("text")).alias("ws")
    ).filter(F.size("ws") >= 3)
    gram = F.transform(
        F.sequence(F.lit(1), F.size("ws") - 2),
        lambda i: F.concat_ws(
            " ",
            F.element_at("ws", i),
            F.element_at("ws", i + 1),
            F.element_at("ws", i + 2),
        ),
    )
    g = d.select(
        "source",
        (F.size("ws") - 2).cast("long").alias("n_grams"),
        F.size(F.array_distinct(gram)).cast("long").alias("n_distinct"),
    )
    rep = (F.col("n_grams") - F.col("n_distinct")) * 1.0 / F.col("n_grams")
    return g.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(rep), 6).alias("avg_repetition"),
        F.round(F.max(rep), 6).alias("max_repetition"),
        F.count(F.when(rep > 0.2, 1)).alias("n_degenerate"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 105: Weibull shape fit (method of moments) on ship latencies
# ---------------------------------------------------------------------------


@_q(
    "orders_weibull_moments_fit",
    """
    WITH d AS (SELECT o.o_orderkey,
                 date_diff('day',
                           CAST(date_trunc('day', o.o_orderdate) AS DATE),
                           CAST(date_trunc('day', max(l.l_shipdate)) AS DATE))
                   AS days
               FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
               GROUP BY o.o_orderkey, o.o_orderdate),
    pos AS (SELECT CAST(days AS DOUBLE) AS days FROM d WHERE days > 0),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 avg(days) AS mean_days,
                 stddev_samp(days) AS sd_days
          FROM pos)
    SELECT n, round(mean_days, 4) AS mean_days, round(sd_days, 4) AS sd_days,
           round(sd_days / mean_days, 6) AS cv,
           round(pow(sd_days / mean_days, -1.086), 4) AS weibull_k
    FROM s
    """,
)
def orders_weibull_moments_fit(spark, sf_dir):
    """Weibull shape parameter for order-to-last-shipment latency by the
    method of moments (k = CV^-1.086, the standard closed-form
    approximation — exact MLE needs iteration; this is the one-pass
    screening fit): k < 1 means burn-in (latency hazard FALLS with age
    — stuck orders stay stuck), k > 1 means wear-out (the longer open,
    the likelier to finally ship), the distribution-shape diagnosis the
    Kaplan-Meier / Nelson-Aalen entries describe nonparametrically. One
    fact join shuffled on the order key, one moments aggregate; integer
    day arithmetic end-to-end."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    d = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.datediff(
                F.date_trunc("day", F.max("l_shipdate")).cast("date"),
                F.date_trunc("day", F.col("o_orderdate")).cast("date"),
            ).alias("days")
        )
        .filter(F.col("days") > 0)
        .select(F.col("days").cast("double").alias("days"))
    )
    s = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("days").alias("mean_days"),
        F.stddev_samp("days").alias("sd_days"),
    )
    cv = F.col("sd_days") / F.col("mean_days")
    return s.select(
        "n",
        F.round("mean_days", 4).alias("mean_days"),
        F.round("sd_days", 4).alias("sd_days"),
        F.round(cv, 6).alias("cv"),
        F.round(F.pow(cv, F.lit(-1.086)), 4).alias("weibull_k"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 106: int8 quantization reconstruction error (oracle-pinned)
# ---------------------------------------------------------------------------


@_q(
    "embedding_int8_quant_error",
    """
    WITH base AS (SELECT vec_id, label, embedding,
                    CAST(list_min(embedding) AS DOUBLE) AS mn,
                    CAST(list_max(embedding) AS DOUBLE) AS mx
                  FROM embeddings),
    p AS (SELECT vec_id, label, mn, mx, (mx - mn) / 254.0 AS scale,
            CAST(unnest(range(1, len(embedding) + 1)) AS INT) AS pos,
            embedding
          FROM base),
    c AS (SELECT vec_id, label, scale,
            CAST(embedding[pos] AS DOUBLE) AS x,
            CASE WHEN mx > mn
                 THEN CAST(round((CAST(embedding[pos] AS DOUBLE) - mn)
                                 / scale) AS INT) - 127
                 ELSE 0 END AS q,
            mn
          FROM p),
    e AS (SELECT vec_id, label, scale,
            abs(CASE WHEN scale > 0
                     THEN (q + 127) * scale + mn ELSE mn END - x) AS err
          FROM c)
    SELECT label, CAST(count(DISTINCT vec_id) AS BIGINT) AS n_vecs,
           round(avg(err), 8) AS mean_abs_err,
           round(max(err), 8) AS max_abs_err,
           round(sqrt(avg(err * err)), 8) AS rmse,
           round(max(CASE WHEN scale > 0 THEN err / scale ELSE 0.0 END), 6)
             AS max_err_over_scale
    FROM e GROUP BY label
    """,
)
def embedding_int8_quant_error(spark, sf_dir):
    """Reconstruction error of the int8 scalar quantization path
    (operators/similarity.py:quantize_embeddings -> dequantize_embeddings)
    profiled per label: mean/max absolute error, RMSE, and the
    scale-normalized worst case — which the linear-rounding contract
    bounds at 0.5 quantization steps, so this entry is the 4x-smaller-
    storage-is-actually-lossless-enough proof, hash-pinned by an oracle
    that replays the exact quantize/dequantize arithmetic positionally
    (both engines round half-away-from-zero on the non-negative scaled
    components, so even exact .5 boundaries agree). Row-local transforms
    plus one positional explode for the error rollup."""
    from boann_ocsf_security_data_platform_spark.operators.similarity import (
        dequantize_embeddings,
        quantize_embeddings,
    )

    e = _t(spark, sf_dir, "embeddings")
    dq = dequantize_embeddings(quantize_embeddings(e))
    pair = dq.select(
        "vec_id",
        "label",
        "q_scale",
        F.posexplode(
            F.zip_with(
                F.col("embedding"),
                F.col("embedding_dq"),
                lambda a, b: F.abs(b - a.cast("double")),
            )
        ).alias("pos", "err"),
    )
    return pair.groupBy("label").agg(
        F.countDistinct("vec_id").alias("n_vecs"),
        F.round(F.avg("err"), 8).alias("mean_abs_err"),
        F.round(F.max("err"), 8).alias("max_abs_err"),
        F.round(F.sqrt(F.avg(F.col("err") * F.col("err"))), 8).alias("rmse"),
        F.round(
            F.max(
                F.when(
                    F.col("q_scale") > 0, F.col("err") / F.col("q_scale")
                ).otherwise(0.0)
            ),
            6,
        ).alias("max_err_over_scale"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 107: calendar-spine gap detection (missing days)
# ---------------------------------------------------------------------------


@_q(
    "events_missing_days",
    """
    WITH daily AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day
                   FROM events),
    bounds AS (SELECT min(day) AS d0, max(day) AS d1,
                      CAST(count(*) AS BIGINT) AS observed
               FROM daily),
    steps AS (SELECT date_diff('day',
                       lag(day) OVER (ORDER BY day), day) AS step
              FROM daily),
    gaps AS (SELECT max(step) AS max_step FROM steps)
    SELECT date_diff('day', d0, d1) + 1 AS expected_days,
           observed AS observed_days,
           date_diff('day', d0, d1) + 1 - observed AS n_missing,
           CAST(coalesce(max_step, 1) - 1 AS BIGINT) AS longest_gap_days,
           round(observed * 1.0 / (date_diff('day', d0, d1) + 1), 6)
             AS coverage
    FROM bounds CROSS JOIN gaps
    """,
)
def events_missing_days(spark, sf_dir):
    """Calendar-spine completeness check: expected vs observed event days
    between the first and last day, count of missing days, the longest
    consecutive gap, and the coverage ratio — the
    did-ingestion-silently-skip-a-day guard every time-partitioned
    pipeline needs BEFORE trend math runs on top (a 3-day hole reads as
    a dip to every rolling window downstream). One distinct-day
    projection; the gap scan is a single lag window over the bounded
    daily frame — no generated spine needed for the summary (the count
    algebra IS the anti-join), keeping it one scan at any scale."""
    e = _t(spark, sf_dir, "events")
    daily = e.select(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).distinct()
    bounds = daily.agg(
        F.min("day").alias("d0"),
        F.max("day").alias("d1"),
        F.count(F.lit(1)).alias("observed"),
    )
    w = Window.orderBy("day")
    gaps = daily.select(
        F.datediff(F.col("day"), F.lag("day").over(w)).alias("step")
    ).agg(F.max("step").alias("max_step"))
    expected = F.datediff("d1", "d0") + 1
    return bounds.join(F.broadcast(gaps)).select(
        expected.alias("expected_days"),
        F.col("observed").alias("observed_days"),
        (expected - F.col("observed")).alias("n_missing"),
        (F.coalesce(F.col("max_step"), F.lit(1)) - 1)
        .cast("long")
        .alias("longest_gap_days"),
        F.round(F.col("observed") * 1.0 / expected, 6).alias("coverage"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 108: supplier ship-latency ranking (worst-10)
# ---------------------------------------------------------------------------


@_q(
    "supplier_latency_ranking",
    """
    WITH l AS (SELECT l_suppkey,
                 date_diff('day',
                           CAST(date_trunc('day', o_orderdate) AS DATE),
                           CAST(date_trunc('day', l_shipdate) AS DATE))
                   AS lat
               FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    s AS (SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_lines,
                 round(avg(lat), 4) AS avg_latency_days,
                 round(avg(CASE WHEN lat > 90 THEN 1.0 ELSE 0.0 END), 6)
                   AS slow_rate,
                 CAST(max(lat) AS BIGINT) AS worst_days
          FROM l GROUP BY l_suppkey HAVING count(*) >= 10)
    SELECT s_suppkey, s_name, n_lines, avg_latency_days, slow_rate,
           worst_days
    FROM s JOIN supplier ON l_suppkey = s_suppkey
    ORDER BY slow_rate DESC, avg_latency_days DESC, s_suppkey LIMIT 10
    """,
)
def supplier_latency_ranking(spark, sf_dir):
    """Worst-10 suppliers by slow-shipment rate (order-to-ship latency
    over 90 days), with average and worst-case latency — the vendor
    scorecard behind every procurement review; the HAVING floor (>= 10
    lines) keeps one-shipment suppliers from gaming the ranking. Integer
    day arithmetic on DATE-truncated columns (NTZ-proof), one fact join
    shuffled on the order key, one map-combinable aggregate keyed by
    supplier, a broadcast dim join for the name, and a deterministic
    rate+latency+key top-10 that plans as TakeOrdered."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    sup = _t(spark, sf_dir, "supplier")
    lat = F.datediff(
        F.date_trunc("day", F.col("l_shipdate")).cast("date"),
        F.date_trunc("day", F.col("o_orderdate")).cast("date"),
    )
    base = l.join(o, l.l_orderkey == o.o_orderkey).select(
        "l_suppkey", lat.alias("lat")
    )
    s = (
        base.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.avg("lat"), 4).alias("avg_latency_days"),
            F.round(
                F.avg(F.when(F.col("lat") > 90, 1.0).otherwise(0.0)), 6
            ).alias("slow_rate"),
            F.max("lat").cast("long").alias("worst_days"),
        )
        .filter(F.col("n_lines") >= 10)
    )
    return (
        s.join(F.broadcast(sup), s.l_suppkey == sup.s_suppkey)
        .orderBy(
            F.desc("slow_rate"), F.desc("avg_latency_days"), F.asc("s_suppkey")
        )
        .limit(10)
        .select(
            "s_suppkey",
            "s_name",
            "n_lines",
            "avg_latency_days",
            "slow_rate",
            "worst_days",
        )
    )


# ---------------------------------------------------------------------------
# Round-7 wave 109: Cohen's d / Hedges' g effect size
# ---------------------------------------------------------------------------


@_q(
    "agg_cohens_d_effect_size",
    """
    WITH mn AS (SELECT min(event_type) AS m FROM events),
    s AS (SELECT
            CAST(count(*) FILTER (WHERE event_type = m) AS BIGINT) AS n1,
            CAST(count(*) FILTER (WHERE event_type <> m) AS BIGINT) AS n2,
            avg(value) FILTER (WHERE event_type = m) AS m1,
            avg(value) FILTER (WHERE event_type <> m) AS m2,
            var_samp(value) FILTER (WHERE event_type = m) AS v1,
            var_samp(value) FILTER (WHERE event_type <> m) AS v2
          FROM events CROSS JOIN mn)
    SELECT n1, n2,
           round(m1 - m2, 6) AS mean_diff,
           round((m1 - m2) / sqrt(((n1 - 1) * v1 + (n2 - 1) * v2)
                                  / (n1 + n2 - 2)), 6) + 0.0 AS cohens_d,
           round((m1 - m2) / sqrt(((n1 - 1) * v1 + (n2 - 1) * v2)
                                  / (n1 + n2 - 2))
                 * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0)), 6) + 0.0
             AS hedges_g
    FROM s
    """,
)
def agg_cohens_d_effect_size(spark, sf_dir):
    """Cohen's d (pooled-SD standardized mean difference) with the
    Hedges' g small-sample correction, first event type vs the rest —
    the HOW-BIG companion to the significance family
    (agg_welch_ttest / agg_permutation_test answer whether; d answers
    whether anyone should care: 0.2 small, 0.5 medium, 0.8 large,
    comparable across metrics and experiments). One conditional
    aggregate over a single scan; the label rides a broadcast one-row
    min frame."""
    e = _t(spark, sf_dir, "events")
    mn = e.agg(F.min("event_type").alias("m"))
    is_a = F.col("event_type") == F.col("m")
    s = e.join(F.broadcast(mn)).agg(
        F.count(F.when(is_a, 1)).alias("n1"),
        F.count(F.when(~is_a, 1)).alias("n2"),
        F.avg(F.when(is_a, F.col("value"))).alias("m1"),
        F.avg(F.when(~is_a, F.col("value"))).alias("m2"),
        F.var_samp(F.when(is_a, F.col("value"))).alias("v1"),
        F.var_samp(F.when(~is_a, F.col("value"))).alias("v2"),
    )
    pooled = F.sqrt(
        ((F.col("n1") - 1) * F.col("v1") + (F.col("n2") - 1) * F.col("v2"))
        / (F.col("n1") + F.col("n2") - 2)
    )
    d = (F.col("m1") - F.col("m2")) / pooled
    corr = 1.0 - 3.0 / (4.0 * (F.col("n1") + F.col("n2")) - 9.0)
    return s.select(
        "n1",
        "n2",
        F.round(F.col("m1") - F.col("m2"), 6).alias("mean_diff"),
        (F.round(d, 6) + 0.0).alias("cohens_d"),
        (F.round(d * corr, 6) + 0.0).alias("hedges_g"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 110: dwell-time histogram (log-decade buckets)
# ---------------------------------------------------------------------------


@_q(
    "events_dwell_time_histogram",
    """
    WITH g AS (SELECT floor(epoch(ts - lag(ts) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id))) AS gap_s
               FROM events),
    b AS (SELECT CASE WHEN gap_s < 1 THEN 0
                      WHEN gap_s < 10 THEN 1
                      WHEN gap_s < 100 THEN 2
                      WHEN gap_s < 1000 THEN 3
                      WHEN gap_s < 10000 THEN 4
                      WHEN gap_s < 100000 THEN 5
                      ELSE 6 END AS decade,
                 gap_s
          FROM g WHERE gap_s IS NOT NULL),
    t AS (SELECT CAST(count(*) AS DOUBLE) AS tot FROM b)
    SELECT CAST(decade AS BIGINT) AS decade,
           CAST(count(*) AS BIGINT) AS n_gaps,
           round(count(*) / any_value(tot), 6) AS share,
           CAST(min(gap_s) AS BIGINT) AS min_gap_s,
           CAST(max(gap_s) AS BIGINT) AS max_gap_s
    FROM b CROSS JOIN t GROUP BY decade
    """,
)
def events_dwell_time_histogram(spark, sf_dir):
    """Per-user dwell-time (gap to previous event) histogram in log10
    decades — the bimodality detector the mean-based
    events_interarrival_expfit cannot be: human sessions put one mode at
    seconds and one at hours/days, and the saddle between them IS the
    right sessionization gap; bots collapse to a single sharp decade.
    One lag window partitioned by user, integer-second gaps via interval
    arithmetic (timestamp-flavor robust), a CASE ladder instead of
    floor(log10) — the ulp-unstable-near-powers-of-ten trap — and one
    map-combinable aggregate to a 7-row frame."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = e.select(
        (F.col("ts") - F.lag("ts").over(w)).cast("long").alias("gap_s")
    ).filter(F.col("gap_s").isNotNull())
    decade = (
        F.when(F.col("gap_s") < 1, 0)
        .when(F.col("gap_s") < 10, 1)
        .when(F.col("gap_s") < 100, 2)
        .when(F.col("gap_s") < 1000, 3)
        .when(F.col("gap_s") < 10000, 4)
        .when(F.col("gap_s") < 100000, 5)
        .otherwise(6)
    )
    b = g.select(decade.cast("long").alias("decade"), "gap_s")
    t = b.agg(F.count(F.lit(1)).cast("double").alias("tot"))
    return (
        b.join(F.broadcast(t))
        .groupBy("decade")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.round(F.count(F.lit(1)) / F.any_value("tot"), 6).alias("share"),
            F.min("gap_s").cast("long").alias("min_gap_s"),
            F.max("gap_s").cast("long").alias("max_gap_s"),
        )
    )


# ---------------------------------------------------------------------------
# Round-7 wave 111: Brown-Forsythe robust equal-variance test
# ---------------------------------------------------------------------------


@_q(
    "agg_brown_forsythe_test",
    """
    WITH med AS (SELECT l_returnflag, median(l_extendedprice) AS md
                 FROM lineitem GROUP BY l_returnflag),
    z AS (SELECT l.l_returnflag,
                 abs(l_extendedprice - md) AS z
          FROM lineitem l JOIN med ON l.l_returnflag = med.l_returnflag),
    grp AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_i,
                   avg(z) AS zbar_i,
                   sum(z * z) AS zz_i, sum(z) AS zs_i
            FROM z GROUP BY l_returnflag),
    tot AS (SELECT CAST(sum(n_i) AS BIGINT) AS n,
                   CAST(count(*) AS BIGINT) AS k,
                   sum(zs_i) / sum(n_i) AS zbar
            FROM grp),
    parts AS (SELECT
                sum(n_i * (zbar_i - zbar) * (zbar_i - zbar)) AS between_ss,
                sum(zz_i - 2 * zbar_i * zs_i + n_i * zbar_i * zbar_i)
                  AS within_ss,
                any_value(n) AS n, any_value(k) AS k
              FROM grp CROSS JOIN tot)
    SELECT n, k,
           round((n - k) * 1.0 / (k - 1) * between_ss / within_ss, 6)
             AS bf_statistic,
           (n - k) * 1.0 / (k - 1) * between_ss / within_ss > 2.60
             AS heteroscedastic
    FROM parts
    """,
)
def agg_brown_forsythe_test(spark, sf_dir):
    """Brown-Forsythe test (Levene with MEDIAN centers) for equal
    variances of price across return flags — the robust gatekeeper run
    BEFORE pooled-variance methods (classic Levene's mean centers break
    under the same heavy tails the test is looking for; medians don't).
    W = (N-k)/(k-1) * between/within over z = |x - group median|, with
    the within sum-of-squares expanded algebraically (sum z², sum z per
    group) so the whole test is TWO passes: one median aggregate (both
    engines interpolate linearly — the pinned percentile pairing;
    concentration-gated via :func:`_percentiles_by_group`, so above the
    fact gate the median distributes through domain counts instead of
    Spark's per-group value-count-map), one moment aggregate over the
    deviations; the 2.60 threshold is F(0.05; 2, inf). Group medians
    ride a broadcast join."""
    l = _t(spark, sf_dir, "lineitem")
    med = _percentiles_by_group(
        spark, sf_dir, l, "lineitem",
        "l_returnflag", "l_extendedprice", [(0.5, "md")],
    )
    z = l.join(F.broadcast(med), "l_returnflag").select(
        "l_returnflag",
        F.abs(F.col("l_extendedprice") - F.col("md")).alias("z"),
    )
    grp = z.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_i"),
        F.avg("z").alias("zbar_i"),
        F.sum(F.col("z") * F.col("z")).alias("zz_i"),
        F.sum("z").alias("zs_i"),
    )
    tot = grp.agg(
        F.sum("n_i").alias("n"),
        F.count(F.lit(1)).alias("k"),
        (F.sum("zs_i") / F.sum("n_i")).alias("zbar"),
    )
    parts = (
        grp.join(F.broadcast(tot))
        .agg(
            F.sum(
                F.col("n_i")
                * (F.col("zbar_i") - F.col("zbar"))
                * (F.col("zbar_i") - F.col("zbar"))
            ).alias("between_ss"),
            F.sum(
                F.col("zz_i")
                - 2 * F.col("zbar_i") * F.col("zs_i")
                + F.col("n_i") * F.col("zbar_i") * F.col("zbar_i")
            ).alias("within_ss"),
            F.any_value("n").alias("n"),
            F.any_value("k").alias("k"),
        )
    )
    w = (
        (F.col("n") - F.col("k"))
        * 1.0
        / (F.col("k") - 1)
        * F.col("between_ss")
        / F.col("within_ss")
    )
    return parts.select(
        "n",
        "k",
        F.round(w, 6).alias("bf_statistic"),
        (w > 2.60).alias("heteroscedastic"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 112: partial correlation (controlling for a confounder)
# ---------------------------------------------------------------------------


@_q(
    "agg_partial_correlation",
    """
    WITH s AS (SELECT corr(l_quantity, l_extendedprice) AS rxy,
                      corr(l_quantity, l_discount) AS rxz,
                      corr(l_extendedprice, l_discount) AS rzy,
                      CAST(count(*) AS BIGINT) AS n
               FROM lineitem)
    SELECT n,
           round(rxy, 6) + 0.0 AS r_qty_price,
           round(rxz, 6) + 0.0 AS r_qty_discount,
           round(rzy, 6) + 0.0 AS r_price_discount,
           round((rxy - rxz * rzy)
                 / sqrt((1 - rxz * rxz) * (1 - rzy * rzy)), 6) + 0.0
             AS partial_corr
    FROM s
    """,
)
def agg_partial_correlation(spark, sf_dir):
    """First-order partial correlation of quantity and price CONTROLLING
    for discount: r_xy.z = (r_xy - r_xz r_zy) / sqrt((1-r_xz²)(1-r_zy²))
    — the is-the-association-real-or-confounded primitive behind every
    pricing and feature-attribution analysis (a raw corr that collapses
    after partialling means the third variable carried it). ONE
    conditional-free aggregate computes all three Pearson terms in a
    single scan (corr is map-combinable); the algebra is a row-local
    epilogue on the one-row frame."""
    l = _t(spark, sf_dir, "lineitem")
    s = l.agg(
        F.corr("l_quantity", "l_extendedprice").alias("rxy"),
        F.corr("l_quantity", "l_discount").alias("rxz"),
        F.corr("l_extendedprice", "l_discount").alias("rzy"),
        F.count(F.lit(1)).alias("n"),
    )
    part = (F.col("rxy") - F.col("rxz") * F.col("rzy")) / F.sqrt(
        (1 - F.col("rxz") * F.col("rxz")) * (1 - F.col("rzy") * F.col("rzy"))
    )
    return s.select(
        "n",
        (F.round("rxy", 6) + 0.0).alias("r_qty_price"),
        (F.round("rxz", 6) + 0.0).alias("r_qty_discount"),
        (F.round("rzy", 6) + 0.0).alias("r_price_discount"),
        (F.round(part, 6) + 0.0).alias("partial_corr"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 113: classical seasonal decomposition (monthly revenue)
# ---------------------------------------------------------------------------


@_q(
    "orders_seasonal_decomposition",
    """
    WITH monthly AS (SELECT date_trunc('month', o_orderdate) AS month,
                       sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                         AS rev_c
                     FROM orders GROUP BY 1),
    tr AS (SELECT month, rev_c,
             CAST(date_part('month', month) AS BIGINT) AS moy,
             avg(rev_c) OVER (ORDER BY month
               ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING) AS trend,
             row_number() OVER (ORDER BY month) AS rn,
             count(*) OVER () AS nm
           FROM monthly),
    det AS (SELECT moy, rev_c - trend AS detrended
            FROM tr WHERE rn > 6 AND rn <= nm - 5)
    SELECT moy AS month_of_year,
           CAST(count(*) AS BIGINT) AS n_months,
           CAST(floor(avg(detrended) + 0.5) AS BIGINT)
             AS seasonal_cents,
           CAST(floor(avg(abs(detrended)) + 0.5) AS BIGINT)
             AS mean_abs_dev_cents
    FROM det GROUP BY moy
    """,
)
def orders_seasonal_decomposition(spark, sf_dir):
    """Classical additive seasonal decomposition of monthly revenue:
    trend = 12-tap moving average, seasonal index = mean detrended value
    per calendar month (edge months without a full trend window
    excluded by row_number, not by date math) — the
    is-December-actually-bigger decomposition behind every seasonality
    adjustment, complementing events_seasonal_baseline's day-of-week
    grain. Exact integer-cent sums; the trend window and the exclusion
    band use identical ROWS frames on both engines; output is the
    bounded 12-row seasonal profile with an explicit half-up cents
    floor."""
    o = _t(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    monthly = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(F.sum(cents).alias("rev_c"))
    w = Window.orderBy("month")
    frame = Window.orderBy("month").rowsBetween(-6, 5)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    tr = monthly.select(
        F.month("month").cast("long").alias("moy"),
        "rev_c",
        F.avg("rev_c").over(frame).alias("trend"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("nm"),
    )
    det = tr.filter(
        (F.col("rn") > 6) & (F.col("rn") <= F.col("nm") - 5)
    ).select("moy", (F.col("rev_c") - F.col("trend")).alias("detrended"))
    return det.groupBy(F.col("moy").alias("month_of_year")).agg(
        F.count(F.lit(1)).alias("n_months"),
        F.floor(F.avg("detrended") + 0.5).cast("long").alias("seasonal_cents"),
        F.floor(F.avg(F.abs("detrended")) + 0.5)
        .cast("long")
        .alias("mean_abs_dev_cents"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 114: Katz centrality (attenuated path counting)
# ---------------------------------------------------------------------------


def _katz_oracle(alpha: float = 0.1, iters: int = 4) -> str:
    """Unrolled Katz iteration c' = alpha * A^T c + 1 over the nation
    trade graph (unweighted adjacency), the _pagerank_oracle pattern."""
    base = """
    WITH e AS (SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
               FROM lineitem l
               JOIN orders o ON l.l_orderkey = o.o_orderkey
               JOIN customer c ON o.o_custkey = c.c_custkey
               JOIN supplier s ON l.l_suppkey = s.s_suppkey),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    c0 AS (SELECT node, 1.0 AS c FROM nodes)"""
    prev = "c0"
    for i in range(1, iters + 1):
        base += f""",
    s{i} AS (SELECT e.dst AS node, sum({prev}.c) AS sc
             FROM e JOIN {prev} ON e.src = {prev}.node GROUP BY e.dst),
    c{i} AS (SELECT nodes.node,
               round({alpha} * coalesce(s{i}.sc, 0.0) + 1.0, 8) AS c
             FROM nodes LEFT JOIN s{i} ON nodes.node = s{i}.node)"""
        prev = f"c{i}"
    return base + f"""
    SELECT node AS nationkey, round(c, 6) AS katz FROM {prev}
    """


@_q("graph_katz_centrality", _katz_oracle())
def graph_katz_centrality(spark, sf_dir):
    """Katz centrality over the nation trade graph, 4 fixed iterations
    of c' = alpha A^T c + 1 (alpha = 0.1, inside 1/lambda_max for this
    bounded graph) — attenuated ALL-paths influence, the centrality that
    credits a node for long-range reachability where PageRank divides
    influence by out-degree and triangle count sees only local closure.
    Same one-equi-join-plus-one-aggregate round shape as
    graph_pagerank / bellman_ford with per-round 8-decimal rounding,
    replayed exactly by the unrolled oracle CTE chain; the DISTINCT
    adjacency projection keeps edge multiplicity out of the operator
    (weighted Katz is the one-line variant)."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    e = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .select(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    ranks = nodes.select("node", F.lit(1.0).alias("c")).localCheckpoint(
        eager=True
    )
    for _ in range(4):
        contrib = (
            e.join(ranks, e.src == ranks.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("sc"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                F.round(
                    0.1 * F.coalesce("sc", F.lit(0.0)) + 1.0, 8
                ).alias("c"),
            )
            .localCheckpoint(eager=True)
        )
    e.unpersist()
    nodes.unpersist()
    return ranks.select(
        F.col("node").alias("nationkey"), F.round("c", 6).alias("katz")
    )


# ---------------------------------------------------------------------------
# Round-7 wave 115: Good-Turing frequency smoothing
# ---------------------------------------------------------------------------


@_q(
    "text_good_turing_smoothing",
    f"""
    WITH w AS (SELECT unnest({_WORDS}) AS term FROM documents),
    f AS (SELECT term, CAST(count(*) AS BIGINT) AS r FROM w GROUP BY term),
    tot AS (SELECT CAST(sum(r) AS DOUBLE) AS n_tokens FROM f),
    fof AS (SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM f GROUP BY r),
    led AS (SELECT r, n_r,
              lead(n_r) OVER (ORDER BY r) AS n_r1,
              lead(r) OVER (ORDER BY r) AS r1,
              row_number() OVER (ORDER BY r) AS rk
            FROM fof)
    SELECT r AS count_r, n_r AS n_types,
           round(CASE WHEN r1 = r + 1 AND n_r > 0
                      THEN (r + 1.0) * n_r1 / n_r END, 6) AS r_star,
           round(r * n_r / n_tokens, 8) AS raw_mass,
           round(CASE WHEN r1 = r + 1 AND n_r > 0
                      THEN (r + 1.0) * n_r1 / n_tokens END, 8)
             AS smoothed_mass
    FROM led CROSS JOIN tot
    WHERE rk <= 10
    """,
)
def text_good_turing_smoothing(spark, sf_dir):
    """Good-Turing frequency smoothing over the corpus unigrams:
    adjusted count r* = (r+1) N_{{r+1}}/N_r from the frequency-of-
    frequencies table, reported for the 10 SMALLEST observed counts
    (rank-adaptive — a tiny synthetic corpus may have no singletons at
    all) with raw vs smoothed probability mass — the unseen-mass estimator under every
    Katz-backoff / Kneser-Ney LM (row r = 1's smoothed mass IS the
    probability the next token is novel), and a corpus-health read:
    natural text has a smooth hyperbolic N_r; template spam puts spikes
    in it. Two aggregates (term counts, then counts-of-counts, both
    map-combinable) and one lead window over the bounded N_r frame;
    the adjacent-rank guard (r1 = r+1) yields NULL where N_{{r+1}} is
    missing instead of silently borrowing a farther rank, identically
    on both engines."""
    from boann_ocsf_security_data_platform_spark.operators.text import tokens

    f = (
        _t(spark, sf_dir, "documents")
        .select(F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("r"))
    )
    tot = f.agg(F.sum("r").cast("double").alias("n_tokens"))
    fof = f.groupBy("r").agg(F.count(F.lit(1)).alias("n_r"))
    w = Window.orderBy("r")
    led = fof.select(
        "r",
        "n_r",
        F.lead("n_r").over(w).alias("n_r1"),
        F.lead("r").over(w).alias("r1"),
        F.row_number().over(w).alias("rk"),
    )
    ok = (F.col("r1") == F.col("r") + 1) & (F.col("n_r") > 0)
    return (
        led.join(F.broadcast(tot))
        .filter(F.col("rk") <= 10)
        .drop("rk")
        .select(
            F.col("r").alias("count_r"),
            F.col("n_r").alias("n_types"),
            F.round(
                F.when(ok, (F.col("r") + 1.0) * F.col("n_r1") / F.col("n_r")),
                6,
            ).alias("r_star"),
            F.round(F.col("r") * F.col("n_r") / F.col("n_tokens"), 8).alias(
                "raw_mass"
            ),
            F.round(
                F.when(
                    ok, (F.col("r") + 1.0) * F.col("n_r1") / F.col("n_tokens")
                ),
                8,
            ).alias("smoothed_mass"),
        )
    )


# ---------------------------------------------------------------------------
# Round-7 wave 116: bigram conditional entropy rate per source
# ---------------------------------------------------------------------------


@_q(
    "text_bigram_entropy_rate",
    f"""
    WITH ws AS (SELECT doc_id, source, {_WORDS} AS ws FROM documents),
    bg AS (SELECT source, ws[i] AS w1, ws[i + 1] AS w2
           FROM ws, unnest(range(1, len(ws))) AS t(i)
           WHERE len(ws) >= 2),
    pair AS (SELECT source, w1, w2, CAST(count(*) AS DOUBLE) AS c12
             FROM bg GROUP BY 1, 2, 3),
    uni AS (SELECT source, w1, sum(c12) AS c1 FROM pair GROUP BY 1, 2),
    tot AS (SELECT source, sum(c12) AS n FROM pair GROUP BY source)
    SELECT pair.source,
           CAST(count(*) AS BIGINT) AS n_bigram_types,
           round(-sum((c12 / n) * ln(c12 / c1)), 6) + 0.0
             AS cond_entropy_nats,
           round(-sum((c12 / n) * ln(c12 / c1)) / ln(2.0), 6) + 0.0
             AS cond_entropy_bits
    FROM pair
    JOIN uni ON pair.source = uni.source AND pair.w1 = uni.w1
    JOIN tot ON pair.source = tot.source
    GROUP BY pair.source
    """,
)
def text_bigram_entropy_rate(spark, sf_dir):
    """Bigram conditional entropy rate H(w2|w1) per source — the
    first-order entropy-rate estimate of how predictable each source's
    text is given one word of context: the information-theoretic
    companion to text_kneser_ney_bigrams (which models; this MEASURES),
    and a sharper generated-text detector than unigram entropy (LM
    output is unusually predictable at fixed context). H = -sum
    p(w1,w2) ln p(w2|w1) assembled from two map-combinable count
    aggregates joined on the (source, w1) key; bigrams stay row-local
    until the count shuffle (index into the token array at an unnested
    range, the established discipline, docs under 2 tokens excluded on
    both engines)."""
    from boann_ocsf_security_data_platform_spark.operators.text import tokens

    d = _t(spark, sf_dir, "documents").select(
        "source", tokens(F.col("text")).alias("ws")
    ).filter(F.size("ws") >= 2)
    bg = d.select(
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ws") - 1),
                lambda i: F.struct(
                    F.element_at("ws", i).alias("w1"),
                    F.element_at("ws", i + 1).alias("w2"),
                ),
            )
        ).alias("p"),
    ).select("source", "p.w1", "p.w2")
    pair = bg.groupBy("source", "w1", "w2").agg(
        F.count(F.lit(1)).cast("double").alias("c12")
    )
    uni = pair.groupBy("source", "w1").agg(F.sum("c12").alias("c1"))
    tot = pair.groupBy("source").agg(F.sum("c12").alias("n"))
    h = -F.sum(
        (F.col("c12") / F.col("n")) * F.log(F.col("c12") / F.col("c1"))
    )
    return (
        # the (source, w1) context table is vocabulary-scaling — pinned
        # above the measured-count threshold
        pair.join(_pin(uni, _gates.pin_shuffle_join(_table_count(spark, sf_dir, "documents"))), ["source", "w1"])
        .join(F.broadcast(tot), "source")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_bigram_types"),
            (F.round(h, 6) + 0.0).alias("cond_entropy_nats"),
            (F.round(h / float(__import__("math").log(2.0)), 6) + 0.0).alias(
                "cond_entropy_bits"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Round-7 wave 117: nearest-centroid classification confusion matrix
# ---------------------------------------------------------------------------


@_q(
    "embedding_nearest_centroid_confusion",
    """
    WITH pts AS (SELECT vec_id, label,
                   CAST(unnest(range(1, len(embedding) + 1)) AS INT) AS pos,
                   embedding
                 FROM embeddings),
    x AS (SELECT vec_id, label, pos, CAST(embedding[pos] AS DOUBLE) AS v
          FROM pts),
    cent AS (SELECT label AS clabel, pos, round(avg(v), 8) AS c
             FROM x GROUP BY label, pos),
    d2 AS (SELECT vec_id, label, clabel,
                  sum((v - c) * (v - c)) AS dist2
           FROM x JOIN cent USING (pos) GROUP BY vec_id, label, clabel),
    ranked AS (SELECT vec_id, label, clabel,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY dist2, clabel) AS rn
               FROM d2)
    SELECT CAST(label AS INT) AS true_label,
           CAST(clabel AS INT) AS predicted_label,
           CAST(count(*) AS BIGINT) AS n
    FROM ranked WHERE rn = 1 GROUP BY label, clabel
    """,
)
def embedding_nearest_centroid_confusion(spark, sf_dir):
    """Nearest-centroid classification confusion matrix over the labeled
    embeddings — the five-line sanity classifier every embedding space
    should pass before anything fancier trains on it: assign each vector
    to its closest label centroid and cross-tabulate against the true
    label (the diagonal mass IS linear separability-by-centroid; the
    silhouette sibling reports geometry, this reports decisions).
    Deterministic argmin via a (distance, label)-ordered row_number —
    ties break identically on both engines (DuckDB's min_by cannot take
    a composite key); 8-decimal centroid rounding keeps ULPs from
    flipping the argmin. Same O(n*k*dim) positional-join shape as
    embedding_label_silhouette with the centroid frame broadcast; the
    argmin window partitions by vec_id, so it shards with the data."""
    e = _t(spark, sf_dir, "embeddings")
    x = e.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos0", "v0"),
    ).select(
        "vec_id",
        "label",
        (F.col("pos0") + 1).alias("pos"),
        F.col("v0").cast("double").alias("v"),
    )
    cent = x.groupBy(F.col("label").alias("clabel"), "pos").agg(
        F.round(F.avg("v"), 8).alias("c")
    )
    d2 = (
        x.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "label", "clabel")
        .agg(
            F.sum((F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))).alias(
                "dist2"
            )
        )
    )
    wmin = Window.partitionBy("vec_id").orderBy("dist2", "clabel")
    pred = d2.select(
        "label", "clabel", F.row_number().over(wmin).alias("rn")
    ).filter(F.col("rn") == 1)
    return pred.groupBy(
        F.col("label").cast("int").alias("true_label"),
        F.col("clabel").cast("int").alias("predicted_label"),
    ).agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# Round-7 wave 118: Anderson-Darling normality test (tail-weighted)
# ---------------------------------------------------------------------------


@_q(
    "agg_anderson_darling_normality",
    """
    WITH s AS (SELECT l_returnflag AS g, avg(l_discount) AS mu,
                      stddev_samp(l_discount) AS sd
               FROM lineitem GROUP BY l_returnflag),
    z0 AS (SELECT l.l_returnflag AS g,
                  round((l_discount - mu) / sd, 8) AS z,
                  l_orderkey, l_linenumber
           FROM lineitem l JOIN s ON l.l_returnflag = s.g),
    r AS (SELECT g, z,
            row_number() OVER (PARTITION BY g
                               ORDER BY z, l_orderkey, l_linenumber) AS i,
            count(*) OVER (PARTITION BY g) AS n
          FROM z0),
    terms AS (SELECT g, n,
                (2.0 * i - 1) * ln(greatest(least(CASE WHEN z >= 0 THEN 0.5 * (1 + (1 - (0.254829592 * (1.0 / (1.0 + 0.3275911 * (z / 1.4142135623730951))) - 0.284496736 * pow(1.0 / (1.0 + 0.3275911 * (z / 1.4142135623730951)), 2) + 1.421413741 * pow(1.0 / (1.0 + 0.3275911 * (z / 1.4142135623730951)), 3) - 1.453152027 * pow(1.0 / (1.0 + 0.3275911 * (z / 1.4142135623730951)), 4) + 1.061405429 * pow(1.0 / (1.0 + 0.3275911 * (z / 1.4142135623730951)), 5)) * exp(-(z / 1.4142135623730951) * (z / 1.4142135623730951)))) ELSE 0.5 * (1 - (1 - (0.254829592 * (1.0 / (1.0 + 0.3275911 * (-z / 1.4142135623730951))) - 0.284496736 * pow(1.0 / (1.0 + 0.3275911 * (-z / 1.4142135623730951)), 2) + 1.421413741 * pow(1.0 / (1.0 + 0.3275911 * (-z / 1.4142135623730951)), 3) - 1.453152027 * pow(1.0 / (1.0 + 0.3275911 * (-z / 1.4142135623730951)), 4) + 1.061405429 * pow(1.0 / (1.0 + 0.3275911 * (-z / 1.4142135623730951)), 5)) * exp(-(z / 1.4142135623730951) * (z / 1.4142135623730951)))) END, 1.0 - 1e-12), 1e-12))
                + (2.0 * (n - i) + 1) * ln(1.0 - greatest(least(CASE WHEN z >= 0 THEN 0.5 * (1 + (1 - (0.254829592 * (1.0 / (1.0 + 0.3275911 * (z / 1.4142135623730951))) - 0.284496736 * pow(1.0 / (1.0 + 0.3275911 * (z / 1.4142135623730951)), 2) + 1.421413741 * pow(1.0 / (1.0 + 0.3275911 * (z / 1.4142135623730951)), 3) - 1.453152027 * pow(1.0 / (1.0 + 0.3275911 * (z / 1.4142135623730951)), 4) + 1.061405429 * pow(1.0 / (1.0 + 0.3275911 * (z / 1.4142135623730951)), 5)) * exp(-(z / 1.4142135623730951) * (z / 1.4142135623730951)))) ELSE 0.5 * (1 - (1 - (0.254829592 * (1.0 / (1.0 + 0.3275911 * (-z / 1.4142135623730951))) - 0.284496736 * pow(1.0 / (1.0 + 0.3275911 * (-z / 1.4142135623730951)), 2) + 1.421413741 * pow(1.0 / (1.0 + 0.3275911 * (-z / 1.4142135623730951)), 3) - 1.453152027 * pow(1.0 / (1.0 + 0.3275911 * (-z / 1.4142135623730951)), 4) + 1.061405429 * pow(1.0 / (1.0 + 0.3275911 * (-z / 1.4142135623730951)), 5)) * exp(-(z / 1.4142135623730951) * (z / 1.4142135623730951)))) END, 1.0 - 1e-12), 1e-12)) AS t
              FROM r)
    SELECT g AS l_returnflag, CAST(any_value(n) AS BIGINT) AS n,
           round(-any_value(n) - sum(t) / any_value(n), 4) AS a_squared,
           round(-any_value(n) - sum(t) / any_value(n), 4) > 3.878
             AS reject_normal_1pct
    FROM terms GROUP BY g
    """.replace("greatest(least(CASE WHEN z >= 0 THEN 0.5 * (1 + (1 - (0.254829592 * (1.0 / (1.0 + 0.3275911 * (z / 1.4142135623730951))) - 0.284496736 * pow(1.0 / (1.0 + 0.3275911 * (z / 1.4142135623730951)), 2) + 1.421413741 * pow(1.0 / (1.0 + 0.3275911 * (z / 1.4142135623730951)), 3) - 1.453152027 * pow(1.0 / (1.0 + 0.3275911 * (z / 1.4142135623730951)), 4) + 1.061405429 * pow(1.0 / (1.0 + 0.3275911 * (z / 1.4142135623730951)), 5)) * exp(-(z / 1.4142135623730951) * (z / 1.4142135623730951)))) ELSE 0.5 * (1 - (1 - (0.254829592 * (1.0 / (1.0 + 0.3275911 * (-z / 1.4142135623730951))) - 0.284496736 * pow(1.0 / (1.0 + 0.3275911 * (-z / 1.4142135623730951)), 2) + 1.421413741 * pow(1.0 / (1.0 + 0.3275911 * (-z / 1.4142135623730951)), 3) - 1.453152027 * pow(1.0 / (1.0 + 0.3275911 * (-z / 1.4142135623730951)), 4) + 1.061405429 * pow(1.0 / (1.0 + 0.3275911 * (-z / 1.4142135623730951)), 5)) * exp(-(z / 1.4142135623730951) * (z / 1.4142135623730951)))) END, 1.0 - 1e-12), 1e-12)", "greatest(least(CASE WHEN z >= 0 THEN 0.5 * (1 + (1 - (0.254829592 * (1.0 / (1.0 + 0.3275911 * (z / 1.4142135623730951))) - 0.284496736 * pow(1.0 / (1.0 + 0.3275911 * (z / 1.4142135623730951)), 2) + 1.421413741 * pow(1.0 / (1.0 + 0.3275911 * (z / 1.4142135623730951)), 3) - 1.453152027 * pow(1.0 / (1.0 + 0.3275911 * (z / 1.4142135623730951)), 4) + 1.061405429 * pow(1.0 / (1.0 + 0.3275911 * (z / 1.4142135623730951)), 5)) * exp(-(z / 1.4142135623730951) * (z / 1.4142135623730951)))) ELSE 0.5 * (1 - (1 - (0.254829592 * (1.0 / (1.0 + 0.3275911 * (-z / 1.4142135623730951))) - 0.284496736 * pow(1.0 / (1.0 + 0.3275911 * (-z / 1.4142135623730951)), 2) + 1.421413741 * pow(1.0 / (1.0 + 0.3275911 * (-z / 1.4142135623730951)), 3) - 1.453152027 * pow(1.0 / (1.0 + 0.3275911 * (-z / 1.4142135623730951)), 4) + 1.061405429 * pow(1.0 / (1.0 + 0.3275911 * (-z / 1.4142135623730951)), 5)) * exp(-(z / 1.4142135623730951) * (z / 1.4142135623730951)))) END, 1.0 - 1e-12), 1e-12)"),
)
def agg_anderson_darling_normality(spark, sf_dir):
    """Anderson-Darling normality test of the discount distribution per
    return flag — the tail-weighted refinement of agg_ks_test (KS is
    most sensitive mid-distribution; A-D's 1/[F(1-F)] weight makes it
    the right detector for the heavy tails that actually break pooled-
    variance math): A2 = -n - (1/n) sum[(2i-1) ln PHI(z_i) + (2(n-i)+1)
    ln(1-PHI(z_i))], one ascending rank per group (re-indexing the
    reversed term onto the same row, so ONE window pass), with PHI from
    the signed Abramowitz-Stegun 7.1.26 erf polynomial inlined verbatim
    on both engines (the BH-FDR discipline extended to negative z) and
    clamped to [1e-12, 1-1e-12] so extreme standardized values cannot
    produce ln(0). Standardized z rounds to 8 decimals BEFORE ranking
    so ULPs cannot reorder ties; deterministic (z, orderkey, linenumber)
    rank; the 3.878 critical value is the 1% case-0 asymptote.
    SIZE-GATED on the fact count (round 10): above the gate the
    i-indexed sums close over tie runs of equal z (see inline comment)
    so no row-level rank window runs; identical mathematics, identity
    pinned in tests/test_round10_ops.py."""
    l = _t(spark, sf_dir, "lineitem")
    s = l.groupBy(F.col("l_returnflag").alias("g")).agg(
        F.avg("l_discount").alias("mu"),
        F.stddev_samp("l_discount").alias("sd"),
    )
    z0 = l.join(
        F.broadcast(s), l.l_returnflag == s.g
    ).select(
        "g",
        F.round((F.col("l_discount") - F.col("mu")) / F.col("sd"), 8).alias(
            "z"
        ),
        "l_orderkey",
        "l_linenumber",
    )
    az = F.abs(F.col("z"))
    x = az / F.lit(2.0 ** 0.5)
    t = 1.0 / (1.0 + 0.3275911 * x)
    erf = 1.0 - (
        0.254829592 * t
        - 0.284496736 * t * t
        + 1.421413741 * t * t * t
        - 1.453152027 * t * t * t * t
        + 1.061405429 * t * t * t * t * t
    ) * F.exp(-x * x)
    phi_signed = F.when(
        F.col("z") >= 0, 0.5 * (1 + erf)
    ).otherwise(0.5 * (1 - erf))
    phi = F.greatest(F.least(phi_signed, F.lit(1.0 - 1e-12)), F.lit(1e-12))

    def finish(per_g):
        a2 = -F.any_value("n") - F.sum("t") / F.any_value("n")
        return (
            per_g.groupBy("g")
            .agg(
                F.any_value("n").alias("n_keep"),
                F.round(a2, 4).alias("a_squared"),
                (F.round(a2, 4) > 3.878).alias("reject_normal_1pct"),
            )
            .select(
                F.col("g").alias("l_returnflag"),
                F.col("n_keep").cast("long").alias("n"),
                "a_squared",
                "reject_normal_1pct",
            )
        )

    if _gates.pin_shuffle_join_fact(_table_count(spark, sf_dir, "lineitem")):
        # Contingency arm (round-10 sf100 find: the row-level rank window
        # funnels the fact through 3 partitions — same defect class as
        # agg_spearman_rank_corr). ln PHI is constant within a tie run of
        # equal z, so the i-indexed sums close over each run: ranks
        # a..a+c-1 contribute c(2a+c-2)·lnPHI + c(2n+2-2a-c)·ln(1-PHI) —
        # one hash aggregate over (g, z) (z has the DISCOUNT domain's
        # cardinality, ~11 values), a window over those domain rows, and
        # exact integer coefficients. The deterministic orderkey tie-break
        # only ordered WITHIN runs, so regrouping cannot change the sum.
        cz = z0.groupBy("g", "z").agg(F.count(F.lit(1)).alias("c"))
        wcum = (
            Window.partitionBy("g")
            .orderBy("z")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        runs = cz.select(
            "g",
            "z",
            "c",
            (F.coalesce(F.sum("c").over(wcum), F.lit(0)) + 1).alias("a"),
            F.sum("c").over(Window.partitionBy("g")).alias("n"),
        )
        c, a, n = F.col("c"), F.col("a"), F.col("n")
        term_run = (c * (2 * a + c - 2)).cast("double") * F.log(phi) + (
            c * (2 * n + 2 - 2 * a - c)
        ).cast("double") * F.log(1.0 - phi)
        return finish(runs.select("g", "n", term_run.alias("t")))

    wr = Window.partitionBy("g").orderBy("z", "l_orderkey", "l_linenumber")
    wn = Window.partitionBy("g")
    r = z0.select(
        "g",
        "z",
        F.row_number().over(wr).alias("i"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    term = (2.0 * F.col("i") - 1) * F.log(phi) + (
        2.0 * (F.col("n") - F.col("i")) + 1
    ) * F.log(1.0 - phi)
    return finish(r.select("g", "n", term.alias("t")))


# ---------------------------------------------------------------------------
# Round-7 wave 119: best-split search by Gini impurity (tree/GBDT core)
# ---------------------------------------------------------------------------


@_q(
    "feature_best_split_gini",
    """
    WITH qs AS (SELECT quantile_cont(o_totalprice,
                  [0.05, 0.10, 0.15, 0.20, 0.25, 0.30, 0.35, 0.40, 0.45,
                   0.50, 0.55, 0.60, 0.65, 0.70, 0.75, 0.80, 0.85, 0.90,
                   0.95]) AS ts
                FROM orders),
    cand AS (SELECT CAST(unnest(range(1, 20)) AS BIGINT) AS j, ts FROM qs),
    thr AS (SELECT j, round(ts[CAST(j AS INT)], 2) AS t FROM cand),
    lab AS (SELECT o_totalprice AS x,
                   CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
                     AS y
            FROM orders),
    split AS (SELECT j, t,
                CAST(count(*) FILTER (WHERE x <= t) AS DOUBLE) AS nl,
                CAST(sum(y) FILTER (WHERE x <= t) AS DOUBLE) AS pl,
                CAST(count(*) FILTER (WHERE x > t) AS DOUBLE) AS nr,
                CAST(sum(y) FILTER (WHERE x > t) AS DOUBLE) AS pr,
                CAST(count(*) AS DOUBLE) AS n
              FROM lab CROSS JOIN thr GROUP BY j, t),
    g AS (SELECT j, t,
            round((nl * (2 * (pl / nl) * (1 - pl / nl))
                   + nr * (2 * (pr / nr) * (1 - pr / nr))) / n, 6)
              AS weighted_gini
          FROM split WHERE nl > 0 AND nr > 0)
    SELECT j AS candidate, t AS threshold, weighted_gini,
           weighted_gini = min(weighted_gini) OVER () AS is_best
    FROM g
    """,
)
def feature_best_split_gini(spark, sf_dir):
    """Histogram-style best-split search: 19 quantile candidate
    thresholds on order value scored by weighted binary Gini impurity
    against the is-urgent label — THE inner loop of every decision-tree
    / GBDT trainer (XGBoost/LightGBM evaluate exactly this quantity per
    histogram bin), expressed as one explode + one conditional aggregate
    instead of a per-threshold scan: rows x 19 cheap indicator
    comparisons, map-side combined, never 19 passes. Candidate
    thresholds come from quantile_cont (the pinned
    linear-interpolation percentile pairing); degenerate splits (an
    empty side) are excluded on both engines; the argmin is a window
    min over the bounded 19-row frame."""
    o = _t(spark, sf_dir, "orders")
    pcts = [round(0.05 * j, 2) for j in range(1, 20)]
    qs = o.agg(
        F.percentile("o_totalprice", F.lit(pcts)).alias("ts")
    )
    thr = qs.select(
        F.posexplode("ts").alias("j0", "t0")
    ).select(
        (F.col("j0") + 1).cast("long").alias("j"),
        F.round("t0", 2).alias("t"),
    )
    lab = o.select(
        F.col("o_totalprice").alias("x"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("y"),
    )
    split = (
        lab.join(F.broadcast(thr))
        .groupBy("j", "t")
        .agg(
            F.count(F.when(F.col("x") <= F.col("t"), 1))
            .cast("double")
            .alias("nl"),
            F.sum(F.when(F.col("x") <= F.col("t"), F.col("y")))
            .cast("double")
            .alias("pl"),
            F.count(F.when(F.col("x") > F.col("t"), 1))
            .cast("double")
            .alias("nr"),
            F.sum(F.when(F.col("x") > F.col("t"), F.col("y")))
            .cast("double")
            .alias("pr"),
            F.count(F.lit(1)).cast("double").alias("n"),
        )
    )
    gl = 2 * (F.col("pl") / F.col("nl")) * (1 - F.col("pl") / F.col("nl"))
    gr = 2 * (F.col("pr") / F.col("nr")) * (1 - F.col("pr") / F.col("nr"))
    g = split.filter((F.col("nl") > 0) & (F.col("nr") > 0)).select(
        "j",
        "t",
        F.round(
            (F.col("nl") * gl + F.col("nr") * gr) / F.col("n"), 6
        ).alias("weighted_gini"),
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return g.select(
        F.col("j").alias("candidate"),
        F.col("t").alias("threshold"),
        "weighted_gini",
        (
            F.col("weighted_gini") == F.min("weighted_gini").over(wall)
        ).alias("is_best"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 120: harmonic closeness centrality (multi-source BFS)
# ---------------------------------------------------------------------------


def _closeness_oracle(iters: int = 5) -> str:
    """Unrolled multi-source BFS over (source, node) pairs — the
    Bellman-Ford recipe lifted to ALL sources in one dataflow; integer
    hop counts need no rounding."""
    base = """
    WITH e AS (SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
               FROM lineitem l
               JOIN orders o ON l.l_orderkey = o.o_orderkey
               JOIN customer c ON o.o_custkey = c.c_custkey
               JOIN supplier s ON l.l_suppkey = s.s_suppkey),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    d0 AS (SELECT node AS s, node, CAST(0 AS BIGINT) AS d FROM nodes)"""
    prev = "d0"
    for i in range(1, iters + 1):
        base += f""",
    d{i} AS (SELECT s, node, min(d) AS d FROM (
               SELECT s, node, d FROM {prev}
               UNION ALL
               SELECT p.s, e.dst AS node, p.d + 1 AS d
               FROM {prev} p JOIN e ON p.node = e.src) u
             GROUP BY s, node)"""
        prev = f"d{i}"
    return base + f"""
    SELECT s AS nationkey,
           CAST(count(*) FILTER (WHERE d > 0) AS BIGINT) AS n_reached,
           round(coalesce(sum(1.0 / d) FILTER (WHERE d > 0), 0.0), 6)
             AS harmonic_closeness
    FROM {prev} GROUP BY s
    """


@_q("graph_harmonic_closeness", _closeness_oracle())
def graph_harmonic_closeness(spark, sf_dir):
    """Harmonic closeness centrality over the nation trade graph —
    sum of 1/hop-distance to every node reachable within 5 BFS rounds,
    computed for ALL sources in ONE dataflow: the frontier table is
    keyed (source, node) so the multi-source expansion is the same
    union + min-aggregate per round as single-source Bellman-Ford, just
    with the source id riding along as a partition column (at 100 TB
    that key IS the shuffle parallelism — 25 sources here, millions of
    landmark sources in a real landmark-closeness deployment). Harmonic
    (not classic) closeness so disconnected pairs contribute zero
    instead of poisoning the mean; integer hop counts make every min
    exact on both engines."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    e = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .select(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    dist = nodes.select(
        F.col("node").alias("s"), "node", F.lit(0).cast("long").alias("d")
    ).localCheckpoint(eager=True)
    for _ in range(5):
        expanded = (
            dist.join(e, dist.node == e.src)
            .select("s", F.col("dst").alias("node"), (F.col("d") + 1).alias("d"))
        )
        dist = (
            dist.unionByName(expanded)
            .groupBy("s", "node")
            .agg(F.min("d").alias("d"))
            .localCheckpoint(eager=True)
        )
    e.unpersist()
    reached = F.col("d") > 0
    return dist.groupBy(F.col("s").alias("nationkey")).agg(
        F.count(F.when(reached, 1)).alias("n_reached"),
        F.round(
            F.coalesce(F.sum(F.when(reached, 1.0 / F.col("d"))), F.lit(0.0)),
            6,
        ).alias("harmonic_closeness"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 121: CUPED variance reduction (pre-period covariate)
# ---------------------------------------------------------------------------


@_q(
    "events_cuped_variance_reduction",
    """
    WITH d AS (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
               FROM events),
    bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
    half AS (SELECT d0,
               CAST(floor(date_diff('day', d0, d1) / 2.0) AS BIGINT) AS mid
             FROM bounds),
    u AS (SELECT user_id,
            CAST(count(*) FILTER (WHERE date_diff('day', d0, day) < mid)
              AS DOUBLE) AS x,
            CAST(count(*) FILTER (WHERE date_diff('day', d0, day) >= mid)
              AS DOUBLE) AS y
          FROM d CROSS JOIN half GROUP BY user_id),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
                 var_samp(y) AS vy, var_samp(x) AS vx,
                 covar_samp(x, y) AS cxy
          FROM u)
    SELECT n_users,
           round(cxy / vx, 6) AS theta,
           round(vy, 4) AS var_y,
           round(vy - cxy * cxy / vx, 4) AS var_cuped,
           round(CASE WHEN vy > 0 THEN (cxy * cxy / vx) / vy END, 6)
             AS variance_reduction
    FROM s
    """,
)
def events_cuped_variance_reduction(spark, sf_dir):
    """CUPED (Controlled-experiment Using Pre-Experiment Data): regress
    each user's post-period activity on their pre-period activity and
    report the variance the covariate removes — var(y_cuped) = var(y) -
    cov²/var(x), reduction = corr², theta = cov/var(x); the standard
    sensitivity multiplier for online experiments (20% variance
    reduction = 20% fewer users for the same statistical power, for
    free). Periods are the rate-ratio day-split; per-user frame is one
    conditional aggregate, the moments are one map-combinable pass
    over it. Degenerate zero-variance outcomes yield NULL reduction via
    an explicit guard on both engines."""
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    )
    bounds = e.agg(F.min("day").alias("d0"), F.max("day").alias("d1")).select(
        "d0",
        F.floor(F.datediff("d1", "d0") / 2.0).cast("long").alias("mid"),
    )
    pre = F.datediff("day", "d0") < F.col("mid")
    u = (
        e.join(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.count(F.when(pre, 1)).cast("double").alias("x"),
            F.count(F.when(~pre, 1)).cast("double").alias("y"),
        )
    )
    s = u.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.var_samp("y").alias("vy"),
        F.var_samp("x").alias("vx"),
        F.covar_samp("x", "y").alias("cxy"),
    )
    explained = F.col("cxy") * F.col("cxy") / F.col("vx")
    return s.select(
        "n_users",
        F.round(F.col("cxy") / F.col("vx"), 6).alias("theta"),
        F.round("vy", 4).alias("var_y"),
        F.round(F.col("vy") - explained, 4).alias("var_cuped"),
        F.round(
            F.when(F.col("vy") > 0, explained / F.col("vy")), 6
        ).alias("variance_reduction"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 122: GIF container synthesis -> bit-field parse round-trip
# ---------------------------------------------------------------------------


@_q(
    "multimodal_gif_header_roundtrip",
    """
    SELECT doc_id, 'gif' AS format,
           CAST(n_chars % 320 + 1 AS INT) AS width,
           CAST(doc_id % 240 + 1 AS INT) AS height,
           CAST(pow(2, doc_id % 8 + 1) AS INT) AS gct_colors,
           CAST(8 AS INT) AS color_resolution,
           TRUE AS size_ok
    FROM documents
    """,
)
def multimodal_gif_header_roundtrip(spark, sf_dir):
    """Synthesize a VALID GIF89a logical screen descriptor per document
    in pure Column expressions — little-endian dims from the data, the
    PACKED BIT-FIELD byte assembled arithmetically (GCT flag set, color
    resolution 7 in bits 6-4, size exponent N = doc_id%8 in bits 2-0),
    a zeroed global color table of EXACTLY 3*2^(N+1) bytes, and the 0x3B
    trailer — then push it through the bit-field-decoding parser
    (operators/multimodal.py:parse_gif_meta), which must recover the
    dimensions, the 2^(N+1) palette size, and verify the declared table
    fits. The palette-indexed sibling of the PNG/BMP/WAV/MP4/tar
    round-trips: any drift in the bit packing OR the parser's shifts
    breaks the hash. Synthesis row-local, parsing Arrow mapInPandas."""
    from boann_ocsf_security_data_platform_spark.operators.multimodal import (
        parse_gif_meta,
    )

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        (F.col("n_chars") % 320 + 1).cast("long").alias("w"),
        (F.col("doc_id") % 240 + 1).cast("long").alias("h"),
        (F.col("doc_id") % 8).cast("long").alias("nexp"),
    )
    packed = F.lit(0x80) + F.lit(0x70) + F.col("nexp")  # 1|111|0|NNN
    gct_bytes = 3 * F.pow(F.lit(2.0), F.col("nexp") + 1).cast("long")
    gif = F.concat(
        F.lit(b"GIF89a"),
        _le_bytes(F.col("w"), 4),              # width  LE16
        _le_bytes(F.col("h"), 4),              # height LE16
        F.unhex(F.lpad(F.hex(packed), 2, "0")),
        F.lit(bytes(2)),                       # bg color + aspect
        F.unhex(F.repeat(F.lit("00"), gct_bytes.cast("int"))),
        F.lit(b"\x3b"),
    )
    meta = parse_gif_meta(d.select("media_id", gif.alias("payload")))
    return meta.select(
        F.col("media_id").alias("doc_id"),
        "format",
        "width",
        "height",
        "gct_colors",
        "color_resolution",
        "size_ok",
    )


# ---------------------------------------------------------------------------
# Round-7 wave 123: Luhn check-digit round-trip (identifier hygiene)
# ---------------------------------------------------------------------------


@_q(
    "scalar_luhn_checksum",
    """
    WITH d AS (SELECT o_orderkey,
                 lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS s
               FROM orders),
    dig AS (SELECT o_orderkey, s,
              list_transform(range(1, 13),
                i -> CAST(substr(s, CAST(i AS INT), 1) AS BIGINT)) AS ds
            FROM d),
    lu AS (SELECT o_orderkey, s,
             list_sum(list_transform(range(1, 13), i ->
               CASE WHEN (13 - i) % 2 = 1
                    THEN CASE WHEN ds[CAST(i AS INT)] * 2 > 9
                              THEN ds[CAST(i AS INT)] * 2 - 9
                              ELSE ds[CAST(i AS INT)] * 2 END
                    ELSE ds[CAST(i AS INT)] END)) AS lsum
           FROM dig),
    fin AS (SELECT o_orderkey,
              CAST((10 - lsum % 10) % 10 AS BIGINT) AS check_digit
            FROM lu)
    SELECT CAST(check_digit AS BIGINT) AS check_digit,
           CAST(count(*) AS BIGINT) AS n_keys
    FROM fin GROUP BY check_digit
    """,
)
def scalar_luhn_checksum(spark, sf_dir):
    """Luhn (mod-10) check digits computed for every order key padded to
    a 12-digit identifier, summarized as the check-digit distribution —
    the self-validating-identifier primitive behind card numbers, IMEIs
    and national-id hygiene checks (a skewed digit distribution over a
    healthy key space flags a broken generator or transposed-digit
    corruption upstream). Pure row-local digit arithmetic, UNROLLED to
    12 plain substring/arithmetic expressions (round 9 — the positions
    are a compile-time constant, so the original transform/aggregate
    lambdas bought nothing and cost the interpreted higher-order-
    function path on every row: 12.0 s → scan-bound at sf1; same math,
    same distribution), one bounded 10-row rollup."""
    o = _t(spark, sf_dir, "orders")
    s = F.lpad(F.col("o_orderkey").cast("string"), 12, "0")
    d = o.select("o_orderkey", s.alias("s"))
    lsum = F.lit(0).cast("long")
    for i in range(1, 13):
        di = F.substring(F.col("s"), i, 1).cast("long")
        if (13 - i) % 2 == 1:
            lsum = lsum + F.when(di * 2 > 9, di * 2 - 9).otherwise(di * 2)
        else:
            lsum = lsum + di
    fin = d.select(
        (((10 - lsum % 10) % 10)).cast("long").alias("check_digit")
    )
    return fin.groupBy("check_digit").agg(
        F.count(F.lit(1)).alias("n_keys")
    )


# ---------------------------------------------------------------------------
# Round-7 wave 124: Pythagorean mean family (arithmetic/geometric/harmonic)
# ---------------------------------------------------------------------------


@_q(
    "agg_mean_family",
    """
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
           round(avg(l_extendedprice), 4) AS arithmetic_mean,
           round(exp(avg(ln(l_extendedprice))), 4) AS geometric_mean,
           round(count(*) / sum(1.0 / l_extendedprice), 4) AS harmonic_mean
    FROM lineitem WHERE l_extendedprice > 0 GROUP BY l_returnflag
    """,
)
def agg_mean_family(spark, sf_dir):
    """The Pythagorean mean family per return flag — arithmetic,
    geometric (exp of the mean log, the only mean that respects
    multiplicative processes like growth rates and price relatives) and
    harmonic (the correct average for rates: average speed, average
    price per unit when spending fixed amounts). AM >= GM >= HM is a
    hard identity the invariant test pins; the gap between them is a
    built-in skewness read. One conditional-free aggregate, all three
    map-combinable in a single pass."""
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_extendedprice") > 0)
    return l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("l_extendedprice"), 4).alias("arithmetic_mean"),
        F.round(F.exp(F.avg(F.log("l_extendedprice"))), 4).alias(
            "geometric_mean"
        ),
        F.round(
            F.count(F.lit(1)) / F.sum(1.0 / F.col("l_extendedprice")), 4
        ).alias("harmonic_mean"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 125: casing profile (shouting / title-case / numeric words)
# ---------------------------------------------------------------------------


@_q(
    "text_casing_profile",
    """
    WITH w AS (SELECT source,
                 unnest(list_filter(string_split(trim(regexp_replace(
                   text, '\\s+', ' ', 'g')), ' '), t -> t <> '')) AS tok
               FROM documents),
    c AS (SELECT source, tok,
            CASE WHEN regexp_full_match(tok, '[A-Z]{2,}') THEN 1 ELSE 0 END
              AS is_shout,
            CASE WHEN regexp_full_match(tok, '[A-Z][a-z]+') THEN 1 ELSE 0 END
              AS is_title,
            CASE WHEN regexp_full_match(tok, '[0-9]+') THEN 1 ELSE 0 END
              AS is_numeric
          FROM w)
    SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(is_shout), 6) AS shout_ratio,
           round(avg(is_title), 6) AS title_ratio,
           round(avg(is_numeric), 6) AS numeric_ratio
    FROM c GROUP BY source
    """,
)
def text_casing_profile(spark, sf_dir):
    """Casing profile per source over RAW (un-lowercased) tokens:
    ALL-CAPS shouting ratio, Title-Case ratio, and pure-numeric ratio —
    three one-pass quality signals the lowercasing tokenizer pipeline
    destroys (shouting flags spam/boilerplate, heavy title-case flags
    listings and navigation chrome, numeric density flags tables and
    logs masquerading as prose). Whitespace split WITHOUT normalization
    (its own expression, not operators.text.tokens, which lowercases);
    anchored regex matches on both engines (regexp_full_match ==
    Spark's rlike with ^$ anchors); one explode, one map-combinable
    rollup."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(
            F.trim(F.regexp_replace("text", r"\s+", " ")), " "
        ),
        lambda t: t != "",
    )
    w = d.select("source", F.explode(toks).alias("tok"))
    shout = F.col("tok").rlike("^[A-Z]{2,}$").cast("int")
    title = F.col("tok").rlike("^[A-Z][a-z]+$").cast("int")
    num = F.col("tok").rlike("^[0-9]+$").cast("int")
    return w.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg(shout), 6).alias("shout_ratio"),
        F.round(F.avg(title), 6).alias("title_ratio"),
        F.round(F.avg(num), 6).alias("numeric_ratio"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 126: 1-D nearest neighbor via sorted adjacency (no cross join)
# ---------------------------------------------------------------------------


@_q(
    "orders_nearest_price_neighbor",
    """
    WITH d AS (SELECT o_orderkey,
                 CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c,
                 date_trunc('day', o_orderdate) AS day
               FROM orders),
    adj AS (SELECT day, o_orderkey, c,
              lag(c) OVER w AS pv,
              lead(c) OVER w AS nx
            FROM d
            WINDOW w AS (PARTITION BY day ORDER BY c, o_orderkey)),
    nb AS (SELECT day,
             CASE WHEN pv IS NULL AND nx IS NULL THEN NULL
                  WHEN pv IS NULL THEN nx - c
                  WHEN nx IS NULL THEN c - pv
                  WHEN c - pv <= nx - c THEN c - pv
                  ELSE nx - c END AS gap
           FROM adj)
    SELECT day,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(floor(avg(gap) + 0.5) AS BIGINT) AS mean_nn_gap_cents,
           CAST(min(gap) AS BIGINT) AS min_nn_gap_cents,
           CAST(count(*) FILTER (WHERE gap < 100) AS BIGINT)
             AS n_near_twins
    FROM nb WHERE gap IS NOT NULL GROUP BY day
    """,
)
def orders_nearest_price_neighbor(spark, sf_dir):
    """Per-day 1-D nearest-neighbor gap in order value, WITHOUT a self
    cross join: after sorting within the day, every row's nearest
    neighbor is its sorted predecessor or successor (a 1-D metric-space
    identity), so lag/lead replace the O(n²) pair enumeration — the
    pattern behind near-twin detection (duplicate submissions, split
    invoices, price-point collisions) at any scale; the near-twin count
    (< $1 apart) is the fraud/dedup signal. Prices are exact integer
    cents end-to-end (double gap averages landed on a half-boundary and
    diverged between engines — the pinned money discipline). One window
    over (day, cents, key) with a deterministic tie-break; day is the
    partition key so the sort shards with the data."""
    o = _t(spark, sf_dir, "orders")
    d = o.select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("c"),
        F.date_trunc("day", F.col("o_orderdate")).alias("day"),
    )
    w = Window.partitionBy("day").orderBy("c", "o_orderkey")
    adj = d.select(
        "day",
        "c",
        F.lag("c").over(w).alias("pv"),
        F.lead("c").over(w).alias("nx"),
    )
    up = F.col("c") - F.col("pv")
    down = F.col("nx") - F.col("c")
    gap = (
        F.when(F.col("pv").isNull() & F.col("nx").isNull(), F.lit(None))
        .when(F.col("pv").isNull(), down)
        .when(F.col("nx").isNull(), up)
        .when(up <= down, up)
        .otherwise(down)
    )
    nb = adj.select("day", gap.alias("gap")).filter(F.col("gap").isNotNull())
    return nb.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.floor(F.avg("gap") + 0.5).cast("long").alias("mean_nn_gap_cents"),
        F.min("gap").cast("long").alias("min_nn_gap_cents"),
        F.count(F.when(F.col("gap") < 100, 1)).alias("n_near_twins"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 127: basket-size profile (lineitems per order)
# ---------------------------------------------------------------------------


@_q(
    "orders_basket_size_profile",
    """
    WITH b AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines
               FROM lineitem GROUP BY l_orderkey),
    t AS (SELECT CAST(count(*) AS DOUBLE) AS n_orders FROM b)
    SELECT n_lines AS basket_size,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(count(*) / any_value(t.n_orders), 6) AS share,
           round(sum(n_lines) / any_value(t.n_orders), 6)
             AS lines_contributed_per_order
    FROM b CROSS JOIN t GROUP BY n_lines
    """,
)
def orders_basket_size_profile(spark, sf_dir):
    """Basket-size distribution — how many line items per order, with
    each size's share of orders and its contribution to total lines per
    order — the fulfillment-cost and picking-route planning histogram,
    and (in corpus terms) the records-per-group profile every skew
    analysis starts from. One count aggregate keyed by the order, one
    bounded rollup keyed by the count itself (the
    frequency-of-frequencies move from Good-Turing applied to
    relational data)."""
    l = _t(spark, sf_dir, "lineitem")
    b = l.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_lines"))
    t = b.agg(F.count(F.lit(1)).cast("double").alias("n_orders_t"))
    return (
        b.join(F.broadcast(t))
        .groupBy(F.col("n_lines").alias("basket_size"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.count(F.lit(1)) / F.any_value("n_orders_t"), 6
            ).alias("share"),
            F.round(
                F.sum("n_lines") / F.any_value("n_orders_t"), 6
            ).alias("lines_contributed_per_order"),
        )
    )


# ---------------------------------------------------------------------------
# Round-7 wave 128: Kruskal-Wallis k-sample rank test
# ---------------------------------------------------------------------------


@_q(
    "agg_kruskal_wallis",
    """
    WITH j AS (SELECT o.o_totalprice AS v, c.c_mktsegment AS g
               FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
    r AS (SELECT g, v,
                 rank() OVER (ORDER BY v) AS rk,
                 count(*) OVER (PARTITION BY v) AS tie_n
          FROM j),
    a AS (SELECT g, rk + (tie_n - 1) / 2.0 AS arank FROM r),
    grp AS (SELECT g, sum(arank) AS r_g, count(*) AS n_g FROM a GROUP BY g),
    tot AS (SELECT count(*) AS n FROM j),
    ties AS (SELECT coalesce(sum(tn * tn * tn - tn), 0) AS tie_term
             FROM (SELECT count(*) AS tn FROM j GROUP BY v
                   HAVING count(*) > 1)),
    s AS (SELECT sum(r_g * r_g / n_g) AS s, count(*) AS k FROM grp),
    fin AS (SELECT k, n,
                   12.0 / (n * (n + 1.0)) * s - 3.0 * (n + 1.0) AS h_raw,
                   1.0 - tie_term
                       / (CAST(n AS DOUBLE) * n * n - n) AS corr
            FROM s CROSS JOIN tot CROSS JOIN ties)
    SELECT CAST(k AS BIGINT) AS k_groups, CAST(n AS BIGINT) AS n,
           CAST(k - 1 AS BIGINT) AS dof,
           round(h_raw, 4) AS h_stat,
           round(h_raw / corr, 4) AS h_corrected,
           (h_raw / corr) > 9.487729 AS reject_h0
    FROM fin
    """,
)
def agg_kruskal_wallis(spark, sf_dir):
    """Kruskal-Wallis H test — does order price differ across ALL five
    market segments at once (the k-sample generalization of
    Mann-Whitney, the nonparametric one-way ANOVA): H = 12/(N(N+1)) *
    sum R_g^2/n_g - 3(N+1), tie-corrected by 1 - sum(t^3-t)/(N^3-N),
    rejected against the df=4 chi-square 0.05 critical value. Same
    distinct-value formulation as agg_mann_whitney_u: collapse to
    per-(value, group) counts first (one hash aggregate — the only pass
    over the fact), average ranks from one ordered window over the
    BOUNDED distinct-value table, so no global row-level sort; the
    oracle keeps the textbook row-rank formulation, making the hash
    match a cross-derivation proof. At 100 TB the window runs over
    distinct prices (bounded domain), not rows."""
    o = _t(spark, sf_dir, "orders")
    # measured-count sort-merge pin (round 11): the _cum_before prefix
    # branch prunes customer to c_custkey alone, whose size ESTIMATE
    # then slips under the broadcast threshold — Spark tried to build a
    # 15M-row hashed relation at sf100 ("Not enough memory to build and
    # broadcast"). Same estimate-driven-broadcast class as round 9.
    pin = _gates.pin_shuffle_join_fact(_table_count(spark, sf_dir, "orders"))
    c = _pin(_t(spark, sf_dir, "customer"), pin)
    pv = (
        o.join(c, o.o_custkey == c.c_custkey)
        .select(
            F.col("o_totalprice").alias("v"),
            F.col("c_mktsegment").alias("g"),
        )
        .groupBy("v", "g")
        .agg(F.count(F.lit(1)).alias("n_vg"))
        # fan-out persist (round 13): pv feeds the distinct-value table
        # AND the per-group rank join — unpersisted, the orders⋈customer
        # join ran once per consumer (in-suite 6.4 s at sf0.1 for what is
        # one small join; the plan showed five fact-join subtrees
        # counting _cum_before's internal fan-out)
        .persist(
            StorageLevel.DISK_ONLY
            if pin
            else StorageLevel.MEMORY_AND_DISK_DESER
        )
    )
    vals = pv.groupBy("v").agg(F.sum("n_vg").alias("tn"))
    # bucket-parallel exclusive cum-count (round 11, ADVICE r10 #1: the
    # price domain is bounded on the bench corpora but scales with
    # genuinely continuous data); integer sums, so bit-exact
    vals = _cum_before(vals, "v", "tn", "_cb").select(
        "v",
        "tn",
        (F.col("_cb") + (F.col("tn") + 1) / F.lit(2.0)).alias("arank"),
    )
    grp = (
        pv.join(vals, "v")
        .groupBy("g")
        .agg(
            F.sum(F.col("n_vg") * F.col("arank")).alias("r_g"),
            F.sum("n_vg").alias("n_g"),
        )
    )
    sc = vals.agg(
        F.sum("tn").alias("n"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("tn") > 1,
                    F.col("tn") * F.col("tn") * F.col("tn") - F.col("tn"),
                )
            ),
            F.lit(0),
        ).alias("tie_term"),
    )
    st = grp.agg(
        F.sum(F.col("r_g") * F.col("r_g") / F.col("n_g")).alias("s"),
        F.count(F.lit(1)).alias("k"),
    )
    n = F.col("n").cast("double")
    h_raw = F.lit(12.0) / (n * (n + 1)) * F.col("s") - 3.0 * (n + 1)
    corr = F.lit(1.0) - F.col("tie_term") / (n * n * n - n)
    return st.join(F.broadcast(sc)).select(
        F.col("k").cast("long").alias("k_groups"),
        F.col("n").cast("long").alias("n"),
        (F.col("k") - 1).cast("long").alias("dof"),
        F.round(h_raw, 4).alias("h_stat"),
        F.round(h_raw / corr, 4).alias("h_corrected"),
        ((h_raw / corr) > 9.487729).alias("reject_h0"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 129: G-test of independence (log-likelihood ratio)
# ---------------------------------------------------------------------------


@_q(
    "agg_g_test_independence",
    """
    WITH o AS (SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri,
                      count(*) AS obs
               FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
               GROUP BY 1, 2),
    r AS (SELECT seg, sum(obs) AS rt FROM o GROUP BY seg),
    c AS (SELECT pri, sum(obs) AS ct FROM o GROUP BY pri),
    t AS (SELECT CAST(sum(obs) AS DOUBLE) AS tot FROM o),
    g AS (SELECT 2.0 * sum(obs * ln(obs / (r.rt * c.ct / t.tot))) AS g_stat
          FROM o JOIN r USING (seg) JOIN c USING (pri) CROSS JOIN t),
    m AS (SELECT (SELECT tot FROM t) AS tot,
                 (SELECT sum(1.0 / rt) FROM r) AS inv_r,
                 (SELECT sum(1.0 / ct) FROM c) AS inv_c,
                 (SELECT count(*) FROM r) AS nr,
                 (SELECT count(*) FROM c) AS nc),
    q AS (SELECT nr, nc,
                 1.0 + (tot * inv_r - 1.0) * (tot * inv_c - 1.0)
                     / (6.0 * tot * (nr - 1) * (nc - 1)) AS will_q
          FROM m)
    SELECT round(g_stat, 4) AS g_stat,
           round(g_stat / will_q, 4) AS g_williams,
           CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof,
           g_stat / will_q > 26.296228 AS reject_h0
    FROM g CROSS JOIN q
    """,
)
def agg_g_test_independence(spark, sf_dir):
    """G-test (log-likelihood ratio) of independence between customer
    market segment and order priority, with the Williams small-sample
    correction q = 1 + (N*sum(1/r_i)-1)(N*sum(1/c_j)-1)/(6N(r-1)(c-1))
    — the information-theoretic sibling of agg_chi_square_independence
    (G = 2N * mutual information in nats; additive across partitions
    where Pearson X^2 is not, which is why log-linear modelling uses
    it). One hash aggregate builds the 5x5 contingency table; marginals
    and the Williams factor ride broadcast one-row frames; rejected
    against the df=16 chi-square 0.05 critical value."""
    o = _t(spark, sf_dir, "orders")
    cst = _t(spark, sf_dir, "customer")
    cells = (
        o.join(cst, o.o_custkey == cst.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    rows = cells.groupBy("seg").agg(F.sum("obs").alias("rt"))
    cols = cells.groupBy("pri").agg(F.sum("obs").alias("ct"))
    tot = cells.agg(F.sum("obs").cast("double").alias("tot"))
    rsum = rows.agg(
        F.sum(F.lit(1.0) / F.col("rt")).alias("inv_r"),
        F.count(F.lit(1)).alias("nr"),
    )
    csum = cols.agg(
        F.sum(F.lit(1.0) / F.col("ct")).alias("inv_c"),
        F.count(F.lit(1)).alias("nc"),
    )
    g = (
        cells.join(F.broadcast(rows), "seg")
        .join(F.broadcast(cols), "pri")
        .join(F.broadcast(tot))
        .agg(
            (
                F.lit(2.0)
                * F.sum(
                    F.col("obs")
                    * F.log(
                        F.col("obs")
                        / (F.col("rt") * F.col("ct") / F.col("tot"))
                    )
                )
            ).alias("g_stat")
        )
    )
    will_q = F.lit(1.0) + (
        F.col("tot") * F.col("inv_r") - 1.0
    ) * (F.col("tot") * F.col("inv_c") - 1.0) / (
        F.lit(6.0)
        * F.col("tot")
        * (F.col("nr") - 1)
        * (F.col("nc") - 1)
    )
    return (
        g.join(F.broadcast(tot))
        .join(F.broadcast(rsum))
        .join(F.broadcast(csum))
        .select(
            F.round(F.col("g_stat"), 4).alias("g_stat"),
            F.round(F.col("g_stat") / will_q, 4).alias("g_williams"),
            ((F.col("nr") - 1) * (F.col("nc") - 1))
            .cast("long")
            .alias("dof"),
            (F.col("g_stat") / will_q > 26.296228).alias("reject_h0"),
        )
    )


# ---------------------------------------------------------------------------
# Round-7 wave 130: Durbin-Watson autocorrelation of trend residuals
# ---------------------------------------------------------------------------


@_q(
    "events_durbin_watson",
    """
    WITH d AS (SELECT CAST(ts AS DATE) AS day, count(*) AS cnt
               FROM events GROUP BY 1),
    x AS (SELECT cnt,
                 CAST(day - (SELECT min(day) FROM d) AS DOUBLE) AS t
          FROM d),
    fit AS (SELECT regr_slope(cnt, t) AS b1,
                   regr_intercept(cnt, t) AS b0,
                   count(*) AS n
            FROM x),
    e AS (SELECT x.t, x.cnt - (fit.b0 + fit.b1 * x.t) AS resid
          FROM x CROSS JOIN fit),
    l AS (SELECT resid,
                 lag(resid) OVER (ORDER BY t) AS prev
          FROM e),
    s AS (SELECT sum((resid - prev) * (resid - prev)) AS num,
                 sum(resid * resid) AS den,
                 count(*) AS n
          FROM l)
    SELECT CAST(n AS BIGINT) AS n_days,
           round((SELECT b1 FROM fit), 6) AS slope_per_day,
           round(num / den, 4) AS dw_stat,
           round(1.0 - num / den / 2.0, 4) AS rho_approx,
           (num / den) < 1.5 AS positive_autocorr
    FROM s
    """,
)
def events_durbin_watson(spark, sf_dir):
    """Durbin-Watson test on the residuals of a daily-count-vs-time OLS
    trend — is the de-trended event volume serially correlated (DW =
    sum (e_t - e_(t-1))^2 / sum e_t^2, ~2 when independent, < 1.5 flags
    positive autocorrelation, rho ~ 1 - DW/2)? The guardrail behind
    every 'fit a trend, alert on residuals' monitor: autocorrelated
    residuals invalidate the iid error bars. One scan collapses events
    to the BOUNDED daily table; the OLS fit is a broadcast one-row
    frame (regr_slope/regr_intercept on both engines); the lag window
    orders the daily domain, never raw rows."""
    e = _t(spark, sf_dir, "events")
    d = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    m = d.agg(F.min("day").alias("d0"))
    x = d.join(F.broadcast(m)).select(
        F.col("cnt").cast("double").alias("cnt"),
        F.datediff(F.col("day"), F.col("d0")).cast("double").alias("t"),
    )
    fit = x.agg(
        F.regr_slope("cnt", "t").alias("b1"),
        F.regr_intercept("cnt", "t").alias("b0"),
    )
    resid = x.join(F.broadcast(fit)).select(
        "t",
        (F.col("cnt") - (F.col("b0") + F.col("b1") * F.col("t"))).alias(
            "resid"
        ),
    )
    lagw = Window.orderBy("t")
    l = resid.select(
        "resid", F.lag("resid").over(lagw).alias("prev")
    )
    s = l.agg(
        F.sum(
            (F.col("resid") - F.col("prev"))
            * (F.col("resid") - F.col("prev"))
        ).alias("num"),
        F.sum(F.col("resid") * F.col("resid")).alias("den"),
        F.count(F.lit(1)).alias("n"),
    )
    dw = F.col("num") / F.col("den")
    return s.join(F.broadcast(fit)).select(
        F.col("n").cast("long").alias("n_days"),
        F.round(F.col("b1"), 6).alias("slope_per_day"),
        F.round(dw, 4).alias("dw_stat"),
        F.round(F.lit(1.0) - dw / 2.0, 4).alias("rho_approx"),
        (dw < 1.5).alias("positive_autocorr"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 131: closed-form two-predictor OLS (normal equations)
# ---------------------------------------------------------------------------


@_q(
    "agg_ols_two_predictor",
    """
    WITH per AS (SELECT l_orderkey,
                        count(*) AS n_lines,
                        sum(l_quantity) AS tot_qty
                 FROM lineitem GROUP BY 1),
    j AS (SELECT CAST(per.n_lines AS DOUBLE) AS x1,
                 CAST(per.tot_qty AS DOUBLE) AS x2,
                 o.o_totalprice AS y
          FROM per JOIN orders o ON per.l_orderkey = o.o_orderkey),
    m AS (SELECT count(*) AS n, avg(x1) AS mx1, avg(x2) AS mx2,
                 avg(y) AS my,
                 covar_pop(x1, x1) AS s11, covar_pop(x2, x2) AS s22,
                 covar_pop(x1, x2) AS s12,
                 covar_pop(x1, y) AS s1y, covar_pop(x2, y) AS s2y,
                 var_pop(y) AS syy
          FROM j),
    b AS (SELECT n, mx1, mx2, my, syy, s1y, s2y,
                 (s1y * s22 - s2y * s12)
                   / (s11 * s22 - s12 * s12) AS b1,
                 (s2y * s11 - s1y * s12)
                   / (s11 * s22 - s12 * s12) AS b2
          FROM m)
    SELECT CAST(n AS BIGINT) AS n,
           round(my - b1 * mx1 - b2 * mx2, 4) AS b0,
           round(b1, 4) AS b1_lines,
           round(b2, 4) AS b2_qty,
           round((b1 * s1y + b2 * s2y) / syy, 6) AS r2
    FROM b
    """,
)
def agg_ols_two_predictor(spark, sf_dir):
    """Two-predictor OLS solved in closed form from the 2x2 normal
    equations (no iteration, no matrix library): regress order total
    price on line count and total quantity. With centered second
    moments S_ij, beta = [S11 S12; S12 S22]^-1 [S1y; S2y] via the 2x2
    determinant, R^2 = (b1*S1y + b2*S2y)/Syy. The whole model reduces
    to ONE map-combinable aggregate of nine moments over the joined
    fact — the pattern that generalizes to any small-p regression at
    100 TB (p^2 moments, one pass, no collect of rows). Engine
    covar_pop on both sides keeps the arithmetic identical."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    per = l.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("l_quantity").alias("tot_qty"),
    )
    j = per.join(o, per.l_orderkey == o.o_orderkey).select(
        F.col("n_lines").cast("double").alias("x1"),
        F.col("tot_qty").cast("double").alias("x2"),
        F.col("o_totalprice").alias("y"),
    )
    m = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("x1").alias("mx1"),
        F.avg("x2").alias("mx2"),
        F.avg("y").alias("my"),
        F.covar_pop("x1", "x1").alias("s11"),
        F.covar_pop("x2", "x2").alias("s22"),
        F.covar_pop("x1", "x2").alias("s12"),
        F.covar_pop("x1", "y").alias("s1y"),
        F.covar_pop("x2", "y").alias("s2y"),
        F.var_pop("y").alias("syy"),
    )
    det = F.col("s11") * F.col("s22") - F.col("s12") * F.col("s12")
    b1 = (F.col("s1y") * F.col("s22") - F.col("s2y") * F.col("s12")) / det
    b2 = (F.col("s2y") * F.col("s11") - F.col("s1y") * F.col("s12")) / det
    return m.select(
        F.col("n").cast("long").alias("n"),
        F.round(
            F.col("my") - b1 * F.col("mx1") - b2 * F.col("mx2"), 4
        ).alias("b0"),
        F.round(b1, 4).alias("b1_lines"),
        F.round(b2, 4).alias("b2_qty"),
        F.round(
            (b1 * F.col("s1y") + b2 * F.col("s2y")) / F.col("syy"), 6
        ).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 132: Epanechnikov KDE at a fixed evaluation grid
# ---------------------------------------------------------------------------


@_q(
    "agg_kde_grid",
    """
    WITH b AS (SELECT round(o_totalprice / 100.0) * 100.0 AS v,
                      count(*) AS cnt
               FROM orders GROUP BY 1),
    st AS (SELECT min(v) AS lo, max(v) AS hi,
                  sum(cnt) AS n,
                  sqrt(sum(cnt * v * v) / sum(cnt)
                       - (sum(cnt * v) / sum(cnt))
                         * (sum(cnt * v) / sum(cnt))) AS sd
           FROM b),
    h AS (SELECT lo, hi, n,
                 1.06 * sd * pow(CAST(n AS DOUBLE), -0.2) AS bw
          FROM st),
    g AS (SELECT i AS grid_idx,
                 lo + i * (hi - lo) / 20.0 AS gx, bw, n
          FROM h, unnest(range(0, 21)) AS t(i)),
    k AS (SELECT g.grid_idx, g.gx, g.bw, g.n, b.v, b.cnt,
                 (g.gx - b.v) / g.bw AS u
          FROM g JOIN b ON abs(g.gx - b.v) < g.bw)
    SELECT CAST(grid_idx AS BIGINT) AS grid_idx,
           round(any_value(gx), 2) AS grid_x,
           round(sum(cnt * 0.75 * (1.0 - u * u))
                 / (any_value(n) * any_value(bw)), 9) AS density
    FROM k GROUP BY grid_idx
    ORDER BY grid_idx
    """,
)
def agg_kde_grid(spark, sf_dir):
    """Epanechnikov kernel density estimate of the order-price
    distribution evaluated at a fixed 21-point grid (the histogram's
    smooth sibling — what a price-distribution dashboard actually
    plots). Scale discipline: the fact is FIRST collapsed to a bounded
    pre-binned value domain (prices rounded to $100, one hash
    aggregate), so the kernel evaluation is a bounded-domain range
    join (|grid - v| < bandwidth pushes into the join condition), not
    a 21x full-table blow-up; bandwidth is the Gaussian rule of thumb
    1.06*sd*n^(-1/5) computed from weighted moments on the same binned
    table. Density integrates to ~1 by construction; grid rows with no
    in-bandwidth support are absent (inner join) on both engines."""
    o = _t(spark, sf_dir, "orders")
    b = o.groupBy(
        (F.round(F.col("o_totalprice") / 100.0) * 100.0).alias("v")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    st = b.agg(
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
        F.sum("cnt").alias("n"),
        F.sqrt(
            F.sum(F.col("cnt") * F.col("v") * F.col("v")) / F.sum("cnt")
            - (F.sum(F.col("cnt") * F.col("v")) / F.sum("cnt"))
            * (F.sum(F.col("cnt") * F.col("v")) / F.sum("cnt"))
        ).alias("sd"),
    )
    h = st.select(
        "lo",
        "hi",
        "n",
        (
            F.lit(1.06)
            * F.col("sd")
            * F.pow(F.col("n").cast("double"), -0.2)
        ).alias("bw"),
    )
    g = h.select(
        F.explode(F.sequence(F.lit(0), F.lit(20))).alias("grid_idx"),
        "lo",
        "hi",
        "bw",
        "n",
    ).select(
        "grid_idx",
        (
            F.col("lo")
            + F.col("grid_idx") * (F.col("hi") - F.col("lo")) / 20.0
        ).alias("gx"),
        "bw",
        "n",
    )
    k = F.broadcast(g).join(
        b, F.abs(F.col("gx") - F.col("v")) < F.col("bw")
    )
    u = (F.col("gx") - F.col("v")) / F.col("bw")
    return (
        k.groupBy("grid_idx")
        .agg(
            F.round(F.any_value("gx"), 2).alias("grid_x"),
            F.round(
                F.sum(F.col("cnt") * 0.75 * (F.lit(1.0) - u * u))
                / (F.any_value("n") * F.any_value("bw")),
                9,
            ).alias("density"),
        )
        .select(
            F.col("grid_idx").cast("long").alias("grid_idx"),
            "grid_x",
            "density",
        )
        .orderBy("grid_idx")
    )


# ---------------------------------------------------------------------------
# Round-7 wave 133: Cook's distance — top influential points of an OLS fit
# ---------------------------------------------------------------------------


@_q(
    "agg_cooks_distance_topk",
    """
    WITH d AS (SELECT l_orderkey, l_linenumber,
                      CAST(l_quantity AS DOUBLE) AS x,
                      l_extendedprice AS y
               FROM lineitem),
    m AS (SELECT count(*) AS n, avg(x) AS mx,
                 regr_slope(y, x) AS b1, regr_intercept(y, x) AS b0,
                 sum(x * x) - count(*) * avg(x) * avg(x) AS sxx
          FROM d),
    e AS (SELECT d.l_orderkey, d.l_linenumber, d.x,
                 d.y - (m.b0 + m.b1 * d.x) AS resid,
                 1.0 / m.n + (d.x - m.mx) * (d.x - m.mx) / m.sxx AS lev,
                 m.n
          FROM d CROSS JOIN m),
    s2 AS (SELECT sum(resid * resid) / (any_value(n) - 2) AS s2 FROM e),
    cd AS (SELECT l_orderkey, l_linenumber, lev,
                  round(resid * resid / (2.0 * s2.s2)
                        * lev / ((1.0 - lev) * (1.0 - lev)), 8) AS cook_d
           FROM e CROSS JOIN s2)
    SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
           round(lev, 8) AS leverage, cook_d
    FROM cd
    ORDER BY cook_d DESC, l_orderkey, l_linenumber
    LIMIT 10
    """,
)
def agg_cooks_distance_topk(spark, sf_dir):
    """Cook's distance influence diagnostics for the quantity ->
    extended-price OLS fit: D_i = e_i^2/(p*s^2) * h_i/(1-h_i)^2 with
    simple-regression leverage h_i = 1/n + (x_i-xbar)^2/Sxx — surfaces
    the 10 line items that most move the fitted line (the 'which rows
    should I audit before trusting this model' primitive). The model
    and Sxx are a broadcast one-row frame; leverage and residuals are a
    shuffle-free projection over the fact; only the top-10 rows
    (ranked on the PRE-ROUNDED-to-8 Cook's D with full key tie-break,
    so the cut is ulp-stable across engines) survive the final
    ORDER BY ... LIMIT — a TakeOrdered, never a global sort
    materialization."""
    l = _t(spark, sf_dir, "lineitem")
    d = l.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("double").alias("x"),
        F.col("l_extendedprice").alias("y"),
    )
    m = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("x").alias("mx"),
        F.regr_slope("y", "x").alias("b1"),
        F.regr_intercept("y", "x").alias("b0"),
        (
            F.sum(F.col("x") * F.col("x"))
            - F.count(F.lit(1)) * F.avg("x") * F.avg("x")
        ).alias("sxx"),
    )
    e = d.join(F.broadcast(m)).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("y") - (F.col("b0") + F.col("b1") * F.col("x"))).alias(
            "resid"
        ),
        (
            F.lit(1.0) / F.col("n")
            + (F.col("x") - F.col("mx"))
            * (F.col("x") - F.col("mx"))
            / F.col("sxx")
        ).alias("lev"),
        "n",
    )
    s2 = e.agg(
        (
            F.sum(F.col("resid") * F.col("resid"))
            / (F.any_value("n") - 2)
        ).alias("s2")
    )
    cd = e.join(F.broadcast(s2)).select(
        "l_orderkey",
        "l_linenumber",
        "lev",
        F.round(
            F.col("resid")
            * F.col("resid")
            / (F.lit(2.0) * F.col("s2"))
            * F.col("lev")
            / ((F.lit(1.0) - F.col("lev")) * (F.lit(1.0) - F.col("lev"))),
            8,
        ).alias("cook_d"),
    )
    return (
        cd.orderBy(
            F.col("cook_d").desc(), "l_orderkey", "l_linenumber"
        )
        .limit(10)
        .select(
            "l_orderkey",
            F.col("l_linenumber").cast("long").alias("l_linenumber"),
            F.round(F.col("lev"), 8).alias("leverage"),
            "cook_d",
        )
    )


# ---------------------------------------------------------------------------
# Round-7 wave 134: Poisson overdispersion index per event type
# ---------------------------------------------------------------------------


@_q(
    "events_poisson_dispersion",
    """
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      count(*) AS cnt
               FROM events GROUP BY 1, 2),
    s AS (SELECT event_type,
                 count(*) AS n_days,
                 avg(cnt) AS mean_cnt,
                 var_samp(cnt) AS var_cnt
          FROM d GROUP BY event_type)
    SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
           round(mean_cnt, 4) AS mean_daily,
           round(var_cnt, 4) AS var_daily,
           round(var_cnt / mean_cnt, 4) AS dispersion_index,
           var_cnt / mean_cnt
             > 1.0 + 2.0 * sqrt(2.0 / (n_days - 1)) AS overdispersed
    FROM s ORDER BY event_type
    """,
)
def events_poisson_dispersion(spark, sf_dir):
    """Poisson overdispersion check per event type: the index of
    dispersion D = var/mean of DAILY counts is ~1 for a Poisson
    arrival process; D above 1 + 2*sqrt(2/(n-1)) (two sigmas of D's
    null sampling spread) flags burstiness/clumping — the decision
    between 'use a Poisson alert threshold' and 'need a negative
    binomial'. Complements events_interarrival_expfit (which tests the
    gap distribution; this tests count stability). One scan collapses
    to the bounded (type, day) domain; everything after is a per-type
    aggregate of a few hundred rows."""
    e = _t(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    s = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.avg("cnt").alias("mean_cnt"),
        F.var_samp("cnt").alias("var_cnt"),
    )
    disp = F.col("var_cnt") / F.col("mean_cnt")
    return s.select(
        "event_type",
        F.col("n_days").cast("long").alias("n_days"),
        F.round(F.col("mean_cnt"), 4).alias("mean_daily"),
        F.round(F.col("var_cnt"), 4).alias("var_daily"),
        F.round(disp, 4).alias("dispersion_index"),
        (
            disp
            > F.lit(1.0)
            + F.lit(2.0) * F.sqrt(F.lit(2.0) / (F.col("n_days") - 1))
        ).alias("overdispersed"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Round-7 wave 135: Wilcoxon signed-rank test (paired halves)
# ---------------------------------------------------------------------------


@_q(
    "agg_wilcoxon_signed_rank",
    """
    WITH b AS (SELECT min(CAST(o_orderdate AS DATE))
                      + CAST((max(CAST(o_orderdate AS DATE))
                              - min(CAST(o_orderdate AS DATE))) // 2
                             AS INTEGER) AS mid
               FROM orders),
    per AS (SELECT o_custkey,
                   round(sum(CASE WHEN CAST(o_orderdate AS DATE) <= b.mid
                                  THEN o_totalprice END), 2) AS s1,
                   round(sum(CASE WHEN CAST(o_orderdate AS DATE) > b.mid
                                  THEN o_totalprice END), 2) AS s2
            FROM orders CROSS JOIN b GROUP BY o_custkey, b.mid),
    d AS (SELECT round(s2 - s1, 2) AS diff FROM per
          WHERE s1 IS NOT NULL AND s2 IS NOT NULL
            AND round(s2 - s1, 2) <> 0),
    r AS (SELECT diff, abs(diff) AS ad,
                 rank() OVER (ORDER BY abs(diff)) AS rk,
                 count(*) OVER (PARTITION BY abs(diff)) AS tie_n
          FROM d),
    a AS (SELECT diff, rk + (tie_n - 1) / 2.0 AS arank, tie_n FROM r),
    st AS (SELECT count(*) AS n,
                  sum(CASE WHEN diff > 0 THEN arank ELSE 0 END) AS w_plus
           FROM a),
    ties AS (SELECT coalesce(sum(tn * tn * tn - tn), 0) AS tie_term
             FROM (SELECT count(*) AS tn FROM d GROUP BY abs(diff)
                   HAVING count(*) > 1)),
    z AS (SELECT n, w_plus,
                 n * (n + 1) / 4.0 AS mu,
                 sqrt(n * (n + 1.0) * (2 * n + 1) / 24.0
                      - tie_term / 48.0) AS sigma
          FROM st CROSS JOIN ties)
    SELECT CAST(n AS BIGINT) AS n_pairs,
           round(w_plus, 2) AS w_plus,
           round((w_plus - mu) / sigma, 4) AS zscore,
           abs((w_plus - mu) / sigma) > 1.96 AS reject_h0
    FROM z
    """,
)
def agg_wilcoxon_signed_rank(spark, sf_dir):
    """Wilcoxon signed-rank test on paired customer spend: did
    per-customer total spend change between the first and second half
    of the order-date range (the paired companion to Mann-Whitney —
    each customer is its own control)? Differences are rounded to
    cents BEFORE ranking so the sign/|d| ordering is ulp-stable across
    engines; zero differences drop per the textbook procedure;
    average-rank tie handling with the t^3-t variance correction.
    Spark side uses the distinct-|d| formulation (hash-aggregate to
    per-|d| sign counts, one ordered window over the bounded distinct
    domain) — the oracle keeps row-level ranks, so the hash match is a
    cross-derivation proof."""
    o = _t(spark, sf_dir, "orders").withColumn(
        "od", F.col("o_orderdate").cast("date")
    )
    b = o.agg(
        F.date_add(
            F.min("od"),
            F.floor(
                F.datediff(F.max("od"), F.min("od")) / 2
            ).cast("int"),
        ).alias("mid")
    )
    per = (
        o.join(F.broadcast(b))
        .groupBy("o_custkey")
        .agg(
            F.round(
                F.sum(
                    F.when(
                        F.col("od") <= F.col("mid"),
                        F.col("o_totalprice"),
                    )
                ),
                2,
            ).alias("s1"),
            F.round(
                F.sum(
                    F.when(
                        F.col("od") > F.col("mid"),
                        F.col("o_totalprice"),
                    )
                ),
                2,
            ).alias("s2"),
        )
    )
    d = (
        per.filter(
            F.col("s1").isNotNull() & F.col("s2").isNotNull()
        )
        .select(F.round(F.col("s2") - F.col("s1"), 2).alias("diff"))
        .filter(F.col("diff") != 0)
    )
    pv = d.groupBy(F.abs(F.col("diff")).alias("ad")).agg(
        F.count(F.lit(1)).alias("tn"),
        F.sum(F.when(F.col("diff") > 0, 1).otherwise(0)).alias("npos"),
    )
    # bucket-parallel exclusive cum-count (round 11, ADVICE r10 #1);
    # integer sums, so bit-exact vs the single global window
    pv = _cum_before(pv, "ad", "tn", "_cb").select(
        "tn",
        "npos",
        (F.col("_cb") + (F.col("tn") + 1) / F.lit(2.0)).alias("arank"),
    )
    st = pv.agg(
        F.sum("tn").alias("n"),
        F.sum(F.col("npos") * F.col("arank")).alias("w_plus"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("tn") > 1,
                    F.col("tn") * F.col("tn") * F.col("tn") - F.col("tn"),
                )
            ),
            F.lit(0),
        ).alias("tie_term"),
    )
    n = F.col("n").cast("double")
    mu = n * (n + 1) / 4.0
    sigma = F.sqrt(
        n * (n + 1) * (2 * n + 1) / 24.0 - F.col("tie_term") / 48.0
    )
    z = (F.col("w_plus") - mu) / sigma
    return st.select(
        F.col("n").cast("long").alias("n_pairs"),
        F.round(F.col("w_plus"), 2).alias("w_plus"),
        F.round(z, 4).alias("zscore"),
        (F.abs(z) > 1.96).alias("reject_h0"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 136: epoch allocation under a token budget
# ---------------------------------------------------------------------------


@_q(
    "corpus_epoch_allocation",
    f"""
    WITH t AS (SELECT source, {_WORDS} AS ws FROM documents),
    s AS (SELECT source, CAST(sum(len(ws)) AS BIGINT) AS tokens
          FROM t GROUP BY source),
    w AS (SELECT source, tokens,
                 sqrt(CAST(tokens AS DOUBLE)) AS wgt FROM s),
    tot AS (SELECT sum(wgt) AS wsum, 3.0 * sum(tokens) AS budget FROM w),
    a AS (SELECT source, tokens, wgt / wsum AS share,
                 least(4.0, (budget * wgt / wsum) / tokens) AS epochs,
                 budget
          FROM w CROSS JOIN tot)
    SELECT source, tokens, round(share, 6) AS share,
           round(epochs, 4) AS epochs,
           CAST(round(epochs * tokens, 0) AS BIGINT) AS allocated_tokens,
           epochs >= 4.0 AS capped,
           round(epochs * tokens / budget, 6) AS budget_frac
    FROM a ORDER BY source
    """,
)
def corpus_epoch_allocation(spark, sf_dir):
    """Training-mixture epoch allocation: given a total token budget
    (3x the corpus here) and square-root temperature weights over
    per-source token mass, how many epochs of each source does the
    sampler draw, with small sources capped at 4 epochs (the
    LLaMA-style 'don't repeat a tiny source forever' valve)? epochs_s
    = min(cap, budget*share_s/tokens_s) — the single-shot allocation
    every data-mixing recipe starts from (uncapped mass is reported as
    budget_frac so the caller can see the shortfall the cap created).
    One tokenize+aggregate pass collapses the corpus to a bounded
    per-source table; weights and the budget ride a broadcast one-row
    frame."""
    from boann_ocsf_security_data_platform_spark.operators.text import tokens

    d = _t(spark, sf_dir, "documents").select(
        "source", F.size(tokens(F.col("text"))).alias("nt")
    )
    s = d.groupBy("source").agg(F.sum("nt").alias("tokens"))
    w = s.select(
        "source",
        "tokens",
        F.sqrt(F.col("tokens").cast("double")).alias("wgt"),
    )
    tot = w.agg(
        F.sum("wgt").alias("wsum"),
        (F.lit(3.0) * F.sum("tokens")).alias("budget"),
    )
    a = w.join(F.broadcast(tot))
    epochs = F.least(
        F.lit(4.0),
        F.col("budget") * F.col("wgt") / F.col("wsum") / F.col("tokens"),
    )
    return a.select(
        "source",
        F.col("tokens").cast("long").alias("tokens"),
        F.round(F.col("wgt") / F.col("wsum"), 6).alias("share"),
        F.round(epochs, 4).alias("epochs"),
        F.round(epochs * F.col("tokens"), 0)
        .cast("long")
        .alias("allocated_tokens"),
        (epochs >= 4.0).alias("capped"),
        F.round(epochs * F.col("tokens") / F.col("budget"), 6).alias(
            "budget_frac"
        ),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# Round-7 wave 137: per-node local clustering coefficient
# ---------------------------------------------------------------------------


@_q(
    "graph_clustering_coefficient",
    """
    WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                FROM lineitem WHERE year(l_shipdate) = 1995),
    e AS (SELECT a.pk AS u, b.pk AS v FROM li a
          JOIN li b ON a.ok = b.ok AND a.pk < b.pk
          GROUP BY a.pk, b.pk),
    deg AS (SELECT node, count(*) AS deg FROM
              (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
            GROUP BY node),
    tri AS (SELECT e1.u AS c0, e1.v AS c1, e2.v AS c2 FROM e e1
            JOIN e e2 ON e1.v = e2.u
            JOIN e e3 ON e1.u = e3.u AND e2.v = e3.v),
    pn AS (SELECT node, count(*) AS t FROM
             (SELECT c0 AS node FROM tri UNION ALL SELECT c1 FROM tri
              UNION ALL SELECT c2 FROM tri)
           GROUP BY node)
    SELECT d.node AS part_key, CAST(d.deg AS BIGINT) AS degree,
           CAST(coalesce(pn.t, 0) AS BIGINT) AS triangles,
           round(CASE WHEN d.deg >= 2
                 THEN 2.0 * coalesce(pn.t, 0) / (d.deg * (d.deg - 1.0))
                 ELSE 0 END, 6) AS clustering_coeff
    FROM deg d LEFT JOIN pn ON d.node = pn.node
    ORDER BY clustering_coeff DESC, triangles DESC, part_key
    LIMIT 20
    """,
)
def graph_clustering_coefficient(spark, sf_dir):
    """Per-node local clustering coefficient of the 1995 part-co-order
    graph — cc(v) = 2*t(v)/(deg(v)(deg(v)-1)), the node-level cohesion
    statistic (triangle_count's global total, attributed to corners).
    Top-20 by coefficient with (triangles, node) tie-break; the cut is
    ulp-stable because cc is one IEEE division of exact small integers,
    identical on both engines. Engine side enumerates each triangle
    ONCE degree-ordered (O(m^1.5), skew-proof) then explodes it to its
    3 corners for a hash count — the oracle is the naive 3-way
    self-join it provably equals. operators/graph.py:
    local_clustering_coefficient."""
    from boann_ocsf_security_data_platform_spark.operators.graph import (
        local_clustering_coefficient,
    )

    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.year("l_shipdate") == 1995)
        .select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
        )
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.ok") == F.col("b.ok"))
            & (F.col("a.pk") < F.col("b.pk")),
        )
        .select(F.col("a.pk").alias("src"), F.col("b.pk").alias("dst"))
    )
    out = local_clustering_coefficient(
        edges, pin_shuffle_join=_gates.pin_shuffle_join_fact(_table_count(spark, sf_dir, "lineitem"))
    )
    return (
        out.select(
            F.col("node").alias("part_key"),
            F.col("deg").cast("long").alias("degree"),
            F.col("triangles").cast("long").alias("triangles"),
            F.round(F.col("cc"), 6).alias("clustering_coeff"),
        )
        .orderBy(
            F.col("clustering_coeff").desc(),
            F.col("triangles").desc(),
            "part_key",
        )
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Round-7 wave 138: Sharpe / Sortino ratios of daily revenue returns
# ---------------------------------------------------------------------------


@_q(
    "window_sharpe_sortino",
    """
    WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
                      sum(o_totalprice) AS rev
               FROM orders GROUP BY 1),
    r AS (SELECT day, ln(rev / lag(rev) OVER (ORDER BY day)) AS x
          FROM d),
    y AS (SELECT year(day) AS yr, x FROM r WHERE x IS NOT NULL),
    s AS (SELECT yr, count(*) AS n, avg(x) AS mu,
                 stddev_samp(x) AS sd,
                 sqrt(avg(CASE WHEN x < 0 THEN x * x ELSE 0 END))
                   AS dd
          FROM y GROUP BY yr)
    SELECT CAST(yr AS BIGINT) AS yr, CAST(n AS BIGINT) AS n_days,
           round(mu * 10000, 4) AS mean_bp,
           round(sd * 10000, 4) AS vol_bp,
           round(mu / sd * sqrt(252.0), 4) AS sharpe_ann,
           round(CASE WHEN dd > 0 THEN mu / dd * sqrt(252.0) END, 4)
             AS sortino_ann
    FROM s ORDER BY yr
    """,
)
def window_sharpe_sortino(spark, sf_dir):
    """Annualized Sharpe and Sortino ratios of daily revenue
    log-returns, per year — the risk-adjusted-trend statistic
    (Sortino penalizes only downside deviation sqrt(avg(min(x,0)^2)),
    the asymmetric-risk variant every SLO/finance dashboard pairs with
    Sharpe). Mean and vol are reported in basis points. One scan
    collapses orders to the bounded daily-revenue domain; the return
    lag is a window over days, not rows; the per-year stats are a
    bounded aggregate. Zero-downside years yield NULL Sortino on both
    engines (guarded division)."""
    o = _t(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum("o_totalprice").alias("rev")
    )
    lagw = Window.orderBy("day")
    r = d.select(
        "day",
        F.log(F.col("rev") / F.lag("rev").over(lagw)).alias("x"),
    ).filter(F.col("x").isNotNull())
    s = r.groupBy(F.year("day").alias("yr")).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("x").alias("mu"),
        F.stddev_samp("x").alias("sd"),
        F.sqrt(
            F.avg(
                F.when(F.col("x") < 0, F.col("x") * F.col("x")).otherwise(
                    F.lit(0.0)
                )
            )
        ).alias("dd"),
    )
    return s.select(
        F.col("yr").cast("long").alias("yr"),
        F.col("n").cast("long").alias("n_days"),
        F.round(F.col("mu") * 10000, 4).alias("mean_bp"),
        F.round(F.col("sd") * 10000, 4).alias("vol_bp"),
        F.round(
            F.col("mu") / F.col("sd") * F.sqrt(F.lit(252.0)), 4
        ).alias("sharpe_ann"),
        F.round(
            F.when(
                F.col("dd") > 0,
                F.col("mu") / F.col("dd") * F.sqrt(F.lit(252.0)),
            ),
            4,
        ).alias("sortino_ann"),
    ).orderBy("yr")


# ---------------------------------------------------------------------------
# Round-7 wave 139: IPv4 derive -> format -> parse round-trip profile
# ---------------------------------------------------------------------------


@_q(
    "scalar_ipv4_roundtrip",
    """
    WITH ip AS (SELECT c_custkey,
                       (c_custkey * 2654435761) % 4294967296 AS addr
                FROM customer),
    oct AS (SELECT c_custkey, addr,
                   addr // 16777216 AS o1,
                   (addr // 65536) % 256 AS o2,
                   (addr // 256) % 256 AS o3,
                   addr % 256 AS o4
            FROM ip),
    s AS (SELECT *,
                 concat(CAST(o1 AS VARCHAR), '.', CAST(o2 AS VARCHAR),
                        '.', CAST(o3 AS VARCHAR), '.',
                        CAST(o4 AS VARCHAR)) AS dotted
          FROM oct),
    p AS (SELECT addr, dotted, o1, o2,
                 CAST(string_split(dotted, '.')[1] AS BIGINT) * 16777216
                 + CAST(string_split(dotted, '.')[2] AS BIGINT) * 65536
                 + CAST(string_split(dotted, '.')[3] AS BIGINT) * 256
                 + CAST(string_split(dotted, '.')[4] AS BIGINT)
                   AS reparsed
          FROM s)
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN reparsed = addr THEN 1 ELSE 0 END)
                AS BIGINT) AS n_roundtrip_ok,
           CAST(count(DISTINCT o1) AS BIGINT) AS n_slash8,
           CAST(count(DISTINCT o1 * 256 + o2) AS BIGINT) AS n_slash16,
           min(dotted) AS min_ip, max(dotted) AS max_ip
    FROM p
    """,
)
def scalar_ipv4_roundtrip(spark, sf_dir):
    """IPv4 integer->dotted-quad->integer round-trip over synthetic
    addresses (Knuth multiplicative hash of custkey mod 2^32): octet
    extraction by integer division, string formatting, split-and-
    reassemble parse, then a one-row profile (round-trip success
    count, /8 and /16 subnet cardinalities, lexicographic min/max of
    the dotted form — note string ordering, so '10.x' < '9.x' by
    design). The network-telemetry scalar kit (the OCSF reference
    stores src/dst endpoints as strings; this is the parse/derive
    discipline for them) — all engine-native integer/string exprs,
    shuffle-free until the final aggregate."""
    c = _t(spark, sf_dir, "customer")
    ip = c.select(
        "c_custkey",
        (
            (F.col("c_custkey") * F.lit(2654435761)) % F.lit(4294967296)
        ).alias("addr"),
    )
    oct_ = ip.select(
        "addr",
        F.expr("addr div 16777216").alias("o1"),
        F.expr("(addr div 65536) % 256").alias("o2"),
        F.expr("(addr div 256) % 256").alias("o3"),
        (F.col("addr") % 256).alias("o4"),
    )
    s = oct_.withColumn(
        "dotted",
        F.concat_ws(
            ".",
            F.col("o1").cast("string"),
            F.col("o2").cast("string"),
            F.col("o3").cast("string"),
            F.col("o4").cast("string"),
        ),
    )
    parts = F.split(F.col("dotted"), r"\.")
    p = s.withColumn(
        "reparsed",
        parts.getItem(0).cast("long") * 16777216
        + parts.getItem(1).cast("long") * 65536
        + parts.getItem(2).cast("long") * 256
        + parts.getItem(3).cast("long"),
    )
    return p.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("reparsed") == F.col("addr"), 1).otherwise(0)
        ).alias("n_roundtrip_ok"),
        F.countDistinct("o1").alias("n_slash8"),
        F.countDistinct(F.col("o1") * 256 + F.col("o2")).alias(
            "n_slash16"
        ),
        F.min("dotted").alias("min_ip"),
        F.max("dotted").alias("max_ip"),
    ).select(
        F.col("n").cast("long").alias("n"),
        F.col("n_roundtrip_ok").cast("long").alias("n_roundtrip_ok"),
        F.col("n_slash8").cast("long").alias("n_slash8"),
        F.col("n_slash16").cast("long").alias("n_slash16"),
        "min_ip",
        "max_ip",
    )


# ---------------------------------------------------------------------------
# Round-7 wave 140: Kendall tau-b from a bounded binned contingency
# ---------------------------------------------------------------------------


@_q(
    "agg_kendall_tau_binned",
    """
    WITH per AS (SELECT l_orderkey, count(*) AS n_lines,
                        sum(l_quantity) AS qty
                 FROM lineitem GROUP BY 1),
    j AS (SELECT o.o_totalprice AS x, CAST(per.qty AS DOUBLE) AS y
          FROM per JOIN orders o ON per.l_orderkey = o.o_orderkey),
    mm AS (SELECT min(x) AS x0, max(x) AS x1,
                  min(y) AS y0, max(y) AS y1 FROM j),
    b AS (SELECT least(9, CAST(floor((x - x0) / (x1 - x0) * 10)
                               AS BIGINT)) AS bx,
                 least(9, CAST(floor((y - y0) / (y1 - y0) * 10)
                               AS BIGINT)) AS by
          FROM j CROSS JOIN mm),
    cells AS (SELECT bx, by, count(*) AS cnt FROM b GROUP BY 1, 2),
    conc AS (SELECT sum(a.cnt * c.cnt) AS c FROM cells a
             JOIN cells c ON c.bx > a.bx AND c.by > a.by),
    disc AS (SELECT sum(a.cnt * c.cnt) AS d FROM cells a
             JOIN cells c ON c.bx > a.bx AND c.by < a.by),
    rowt AS (SELECT sum(t * (t - 1) / 2.0) AS t1 FROM
               (SELECT sum(cnt) AS t FROM cells GROUP BY bx)),
    colt AS (SELECT sum(t * (t - 1) / 2.0) AS t2 FROM
               (SELECT sum(cnt) AS t FROM cells GROUP BY by)),
    n AS (SELECT sum(cnt) AS n FROM cells),
    fin AS (SELECT c, d, t1, t2, n,
                   n * (n - 1) / 2.0 AS t0
            FROM conc CROSS JOIN disc CROSS JOIN rowt
                 CROSS JOIN colt CROSS JOIN n)
    SELECT CAST(n AS BIGINT) AS n,
           CAST(c AS BIGINT) AS concordant,
           CAST(d AS BIGINT) AS discordant,
           round((c - d) / sqrt((t0 - t1) * (t0 - t2)), 6) AS tau_b,
           round(3.0 * (c - d)
                 / sqrt(n * (n - 1.0) * (2 * n + 5) / 2.0), 4) AS zscore
    FROM fin
    """,
)
def agg_kendall_tau_binned(spark, sf_dir):
    """Kendall tau-b rank correlation between order price and total
    quantity, computed from a bounded 10x10 binned contingency table —
    the large-n formulation: concordant/discordant pair counts come
    from the CELL table self-join (100x100 integer products), never
    the O(n^2) row-pair space, and the tie corrections are the
    marginal t(t-1)/2 sums tau-b is defined with. Width-based bins
    (broadcast min/max) keep bin assignment deterministic across
    engines — no ntile arbitrary tie-split. Completes the correlation
    family (Pearson, Spearman, partial): tau-b is the one that is a
    proper probability statement (P[concordant] - P[discordant])."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    per = l.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("qty"))
    j = per.join(o, per.l_orderkey == o.o_orderkey).select(
        F.col("o_totalprice").alias("x"),
        F.col("qty").cast("double").alias("y"),
    )
    mm = j.agg(
        F.min("x").alias("x0"),
        F.max("x").alias("x1"),
        F.min("y").alias("y0"),
        F.max("y").alias("y1"),
    )
    b = j.join(F.broadcast(mm)).select(
        F.least(
            F.lit(9),
            F.floor(
                (F.col("x") - F.col("x0"))
                / (F.col("x1") - F.col("x0"))
                * 10
            ),
        ).alias("bx"),
        F.least(
            F.lit(9),
            F.floor(
                (F.col("y") - F.col("y0"))
                / (F.col("y1") - F.col("y0"))
                * 10
            ),
        ).alias("by"),
    )
    cells = b.groupBy("bx", "by").agg(F.count(F.lit(1)).alias("cnt"))
    # explicit broadcast (round-11 sf10 scan find): cells is provably
    # <= 100 rows, but Catalyst's size ESTIMATE scales with the fact, so
    # above ~sf10 the non-equi self-join silently degraded from
    # BroadcastNestedLoopJoin to CartesianProduct. The hint makes the
    # bounded-side knowledge explicit — estimates no longer decide.
    a, c = cells.alias("a"), F.broadcast(cells.alias("c"))
    conc = a.join(
        c,
        (F.col("c.bx") > F.col("a.bx")) & (F.col("c.by") > F.col("a.by")),
    ).agg(F.sum(F.col("a.cnt") * F.col("c.cnt")).alias("c"))
    disc = a.join(
        c,
        (F.col("c.bx") > F.col("a.bx")) & (F.col("c.by") < F.col("a.by")),
    ).agg(F.sum(F.col("a.cnt") * F.col("c.cnt")).alias("d"))
    rowt = (
        cells.groupBy("bx")
        .agg(F.sum("cnt").alias("t"))
        .agg(F.sum(F.col("t") * (F.col("t") - 1) / 2.0).alias("t1"))
    )
    colt = (
        cells.groupBy("by")
        .agg(F.sum("cnt").alias("t"))
        .agg(F.sum(F.col("t") * (F.col("t") - 1) / 2.0).alias("t2"))
    )
    nf = cells.agg(F.sum("cnt").alias("n"))
    fin = (
        conc.join(F.broadcast(disc))
        .join(F.broadcast(rowt))
        .join(F.broadcast(colt))
        .join(F.broadcast(nf))
    )
    n = F.col("n").cast("double")
    t0 = n * (n - 1) / 2.0
    return fin.select(
        F.col("n").cast("long").alias("n"),
        F.col("c").cast("long").alias("concordant"),
        F.col("d").cast("long").alias("discordant"),
        F.round(
            (F.col("c") - F.col("d"))
            / F.sqrt((t0 - F.col("t1")) * (t0 - F.col("t2"))),
            6,
        ).alias("tau_b"),
        F.round(
            F.lit(3.0)
            * (F.col("c") - F.col("d"))
            / F.sqrt(n * (n - 1) * (2 * n + 5) / 2.0),
            4,
        ).alias("zscore"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 141: Hurst exponent via rescaled-range (R/S) analysis
# ---------------------------------------------------------------------------


@_q(
    "events_hurst_exponent",
    """
    WITH d AS (SELECT CAST(ts AS DATE) AS day, count(*) AS cnt
               FROM events GROUP BY 1),
    ix AS (SELECT CAST(cnt AS DOUBLE) AS x,
                  day - (SELECT min(day) FROM d) AS t
           FROM d),
    kk AS (SELECT unnest([8, 16, 32, 64]) AS k),
    e AS (SELECT k, t // k AS blk, t, x FROM ix CROSS JOIN kk),
    full_b AS (SELECT k, blk FROM e GROUP BY k, blk
               HAVING count(*) = k),
    f AS (SELECT e.* FROM e JOIN full_b USING (k, blk)),
    st AS (SELECT k, blk, avg(x) AS mu, stddev_pop(x) AS s
           FROM f GROUP BY k, blk),
    c AS (SELECT f.k, f.blk, st.s,
                 sum(f.x - st.mu) OVER (PARTITION BY f.k, f.blk
                                        ORDER BY f.t) AS z
          FROM f JOIN st USING (k, blk)),
    rs AS (SELECT k, blk, (max(z) - min(z)) / any_value(s) AS rs
           FROM c WHERE s > 0 GROUP BY k, blk),
    m AS (SELECT k, avg(rs) AS mean_rs, count(*) AS n_blocks
          FROM rs GROUP BY k),
    h AS (SELECT regr_slope(ln(mean_rs), ln(CAST(k AS DOUBLE)))
            AS hurst FROM m)
    SELECT CAST(m.k AS BIGINT) AS k,
           CAST(n_blocks AS BIGINT) AS n_blocks,
           round(mean_rs, 4) AS mean_rs,
           round((SELECT hurst FROM h), 4) AS hurst
    FROM m ORDER BY k
    """,
)
def events_hurst_exponent(spark, sf_dir):
    """Hurst exponent of the daily event-count series by rescaled-range
    analysis: for window sizes k in {8,16,32,64}, split the day-indexed
    series into complete blocks, compute R/S per block (range of the
    cumulative mean-deviation over the block's own stddev), and fit
    ln(mean R/S) ~ H*ln(k) — H~0.5 is a random walk, H>0.5 long-range
    persistence (bursty load that STAYS bursty — the capacity-planning
    red flag plain variance misses). The fact collapses to the bounded
    daily domain once; the 4x window explode is over days, not events;
    cumulative deviations are per-block ordered windows; the final fit
    is regr_slope over FOUR points riding a broadcast one-row frame."""
    e = _t(spark, sf_dir, "events")
    d = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    m0 = d.agg(F.min("day").alias("d0"))
    ix = (
        d.join(F.broadcast(m0))
        .select(
            F.col("cnt").cast("double").alias("x"),
            F.datediff(F.col("day"), F.col("d0")).cast("long").alias("t"),
        )
        # bounded daily domain; the k-explode, block filter, per-block
        # stats and cumsum branches all reuse this one materialization
        # instead of re-scanning events per branch
        .localCheckpoint(eager=True)
    )
    kdf = spark.range(1).select(
        F.explode(
            F.array(F.lit(8), F.lit(16), F.lit(32), F.lit(64))
        ).alias("k")
    )
    ev = ix.join(F.broadcast(kdf)).select(
        "k", F.expr("t div k").alias("blk"), "t", "x"
    )
    full_b = (
        ev.groupBy("k", "blk")
        .agg(F.count(F.lit(1)).alias("nb"))
        .filter(F.col("nb") == F.col("k"))
        .select("k", "blk")
    )
    f = ev.join(full_b, ["k", "blk"])
    st = f.groupBy("k", "blk").agg(
        F.avg("x").alias("mu"), F.stddev_pop("x").alias("s")
    )
    wcum = (
        Window.partitionBy("k", "blk")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = f.join(st, ["k", "blk"]).select(
        "k",
        "blk",
        "s",
        F.sum(F.col("x") - F.col("mu")).over(wcum).alias("z"),
    )
    rs = (
        c.filter(F.col("s") > 0)
        .groupBy("k", "blk")
        .agg(
            ((F.max("z") - F.min("z")) / F.any_value("s")).alias("rs")
        )
    )
    m = rs.groupBy("k").agg(
        F.avg("rs").alias("mean_rs"), F.count(F.lit(1)).alias("n_blocks")
    )
    h = m.agg(
        F.regr_slope(
            F.log(F.col("mean_rs")), F.log(F.col("k").cast("double"))
        ).alias("hurst")
    )
    return (
        m.join(F.broadcast(h))
        .select(
            F.col("k").cast("long").alias("k"),
            F.col("n_blocks").cast("long").alias("n_blocks"),
            F.round(F.col("mean_rs"), 4).alias("mean_rs"),
            F.round(F.col("hurst"), 4).alias("hurst"),
        )
        .orderBy("k")
    )


# ---------------------------------------------------------------------------
# Round-7 wave 142: Tukey HSD post-hoc pairwise comparisons
# ---------------------------------------------------------------------------


@_q(
    "agg_tukey_hsd",
    """
    WITH j AS (SELECT c.c_mktsegment AS g, o.o_totalprice AS v
               FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
    s AS (SELECT g, count(*) AS n, avg(v) AS mu, var_samp(v) AS s2
          FROM j GROUP BY g),
    mse AS (SELECT sum((n - 1) * s2) / (sum(n) - count(*)) AS mse FROM s),
    p AS (SELECT a.g AS seg_a, b.g AS seg_b,
                 a.mu - b.mu AS diff,
                 sqrt(mse.mse / 2.0 * (1.0 / a.n + 1.0 / b.n)) AS se
          FROM s a JOIN s b ON a.g < b.g CROSS JOIN mse)
    SELECT seg_a, seg_b, round(diff, 4) AS mean_diff,
           round(abs(diff) / se, 4) AS q_stat,
           abs(diff) / se > 3.858 AS reject_h0
    FROM p ORDER BY seg_a, seg_b
    """,
)
def agg_tukey_hsd(spark, sf_dir):
    """Tukey honestly-significant-difference post-hoc test: all 10
    pairwise mean-price comparisons between the five market segments
    with ONE pooled error term (the studentized-range q = |diff| /
    sqrt(MSE/2*(1/na+1/nb)), rejected against the k=5, df=inf 0.05
    critical value 3.858) — the follow-up every ANOVA/Kruskal omnibus
    needs, with family-wise error control the 10 separate t-tests
    would lose. One hash aggregate collapses the fact to 5 group
    moments; the pair frame is the bounded 5x5 self-join of THAT, and
    MSE rides a broadcast one-row frame."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("g"),
        F.col("o_totalprice").alias("v"),
    )
    s = j.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("v").alias("mu"),
        F.var_samp("v").alias("s2"),
    )
    mse = s.agg(
        (
            F.sum((F.col("n") - 1) * F.col("s2"))
            / (F.sum("n") - F.count(F.lit(1)))
        ).alias("mse")
    )
    # broadcast the 5-row group-moment side explicitly (round-11 sf10
    # scan find: the fact-scaled estimate flipped this non-equi self-join
    # to CartesianProduct above the broadcast threshold)
    a, b = s.alias("a"), F.broadcast(s.alias("b"))
    p = (
        a.join(b, F.col("a.g") < F.col("b.g"))
        .join(F.broadcast(mse))
        .select(
            F.col("a.g").alias("seg_a"),
            F.col("b.g").alias("seg_b"),
            (F.col("a.mu") - F.col("b.mu")).alias("diff"),
            F.sqrt(
                F.col("mse")
                / 2.0
                * (F.lit(1.0) / F.col("a.n") + F.lit(1.0) / F.col("b.n"))
            ).alias("se"),
        )
    )
    return p.select(
        "seg_a",
        "seg_b",
        F.round(F.col("diff"), 4).alias("mean_diff"),
        F.round(F.abs(F.col("diff")) / F.col("se"), 4).alias("q_stat"),
        (F.abs(F.col("diff")) / F.col("se") > 3.858).alias("reject_h0"),
    ).orderBy("seg_a", "seg_b")


# ---------------------------------------------------------------------------
# Round-7 wave 143: circular statistics + Rayleigh uniformity test
# ---------------------------------------------------------------------------


@_q(
    "agg_circular_stats",
    """
    WITH d AS (SELECT c.c_mktsegment AS g,
                      2.0 * pi() * (dayofyear(CAST(o.o_orderdate AS DATE))
                                    - 1) / 365.0 AS theta
               FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
    s AS (SELECT g, count(*) AS n,
                 avg(cos(theta)) AS cbar, avg(sin(theta)) AS sbar
          FROM d GROUP BY g),
    r AS (SELECT g, n, sqrt(cbar * cbar + sbar * sbar) AS rbar,
                 degrees(atan2(sbar, cbar)) AS ang
          FROM s)
    SELECT g AS seg, CAST(n AS BIGINT) AS n,
           round(rbar, 6) AS resultant_len,
           round(1.0 - rbar, 6) AS circ_variance,
           round(CASE WHEN ang < 0 THEN ang + 360.0 ELSE ang END, 2)
             AS mean_day_angle,
           round(n * rbar * rbar, 4) AS rayleigh_z,
           n * rbar * rbar > 2.9957 AS nonuniform
    FROM r ORDER BY seg
    """,
)
def agg_circular_stats(spark, sf_dir):
    """Directional statistics of order dates on the day-of-year circle,
    per market segment: resultant length R-bar (0 = dates spread
    uniformly around the year, 1 = all on one day), circular variance,
    the mean direction in degrees, and the Rayleigh uniformity test
    z = n*R-bar^2 (z > -ln(0.05) ~ 3.0 rejects 'no seasonal phase').
    The statistic linear month-averages get WRONG at the December/
    January wrap — the reason directional stats exist. One conditional
    aggregate of cos/sin per group; angles derive from the DATE cast
    (timezone-fixed) so hostile-session clocks cannot shift a day."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    theta = (
        F.lit(2.0)
        * F.lit(math.pi)
        * (F.dayofyear(F.col("o_orderdate").cast("date")) - 1)
        / F.lit(365.0)
    )
    d = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("g"), theta.alias("theta")
    )
    s = d.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.cos("theta")).alias("cbar"),
        F.avg(F.sin("theta")).alias("sbar"),
    )
    rbar = F.sqrt(
        F.col("cbar") * F.col("cbar") + F.col("sbar") * F.col("sbar")
    )
    ang = F.degrees(F.atan2(F.col("sbar"), F.col("cbar")))
    return s.select(
        F.col("g").alias("seg"),
        F.col("n").cast("long").alias("n"),
        F.round(rbar, 6).alias("resultant_len"),
        F.round(F.lit(1.0) - rbar, 6).alias("circ_variance"),
        F.round(
            F.when(ang < 0, ang + 360.0).otherwise(ang), 2
        ).alias("mean_day_angle"),
        F.round(F.col("n") * rbar * rbar, 4).alias("rayleigh_z"),
        (F.col("n") * rbar * rbar > 2.9957).alias("nonuniform"),
    ).orderBy("seg")


# ---------------------------------------------------------------------------
# Round-7 wave 144: fixed-period periodogram probe (DFT at named periods)
# ---------------------------------------------------------------------------


@_q(
    "events_periodogram_probe",
    """
    WITH d AS (SELECT CAST(ts AS DATE) AS day, count(*) AS cnt
               FROM events GROUP BY 1),
    m AS (SELECT avg(cnt) AS mu, count(*) AS n FROM d),
    ix AS (SELECT CAST(cnt AS DOUBLE) - mu AS x,
                  CAST(day - (SELECT min(day) FROM d) AS DOUBLE) AS t,
                  n
           FROM d CROSS JOIN m),
    pp AS (SELECT unnest([7, 14, 30, 91]) AS period),
    f AS (SELECT period,
                 sum(x * cos(2 * pi() * t / period)) AS cs,
                 sum(x * sin(2 * pi() * t / period)) AS sn,
                 any_value(n) AS n
          FROM ix CROSS JOIN pp GROUP BY period),
    pw AS (SELECT period,
                  round((cs * cs + sn * sn) / n, 4) AS power
           FROM f)
    SELECT CAST(period AS BIGINT) AS period, power,
           power = (SELECT max(power) FROM pw) AS dominant
    FROM pw ORDER BY period
    """,
)
def events_periodogram_probe(spark, sf_dir):
    """Periodogram probe of the daily event-count series at the four
    calendar periods that matter (7/14/30/91 days): spectral power
    |DFT|^2/n of the mean-centered series at each named frequency,
    with the dominant period flagged — the frequency-domain seasonality
    detector that complements the time-domain autocorrelation and STL
    entries (a 7-day peak says 'weekly cycle' directly, no lag
    scanning). Dominance compares ROUNDED powers so the argmax is
    ulp-stable across engines. One scan collapses events to the
    bounded daily domain; the 4x period explode rides that bounded
    frame; each power is one map-combinable cos/sin aggregate."""
    e = _t(spark, sf_dir, "events")
    d = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    m = d.agg(
        F.avg("cnt").alias("mu"),
        F.count(F.lit(1)).alias("n"),
        F.min("day").alias("d0"),
    )
    ix = d.join(F.broadcast(m)).select(
        (F.col("cnt").cast("double") - F.col("mu")).alias("x"),
        F.datediff(F.col("day"), F.col("d0")).cast("double").alias("t"),
        "n",
    )
    pp = spark.range(1).select(
        F.explode(
            F.array(F.lit(7), F.lit(14), F.lit(30), F.lit(91))
        ).alias("period")
    )
    f = (
        ix.join(F.broadcast(pp))
        .groupBy("period")
        .agg(
            F.sum(
                F.col("x")
                * F.cos(
                    F.lit(2.0) * F.lit(math.pi) * F.col("t") / F.col("period")
                )
            ).alias("cs"),
            F.sum(
                F.col("x")
                * F.sin(
                    F.lit(2.0) * F.lit(math.pi) * F.col("t") / F.col("period")
                )
            ).alias("sn"),
            F.any_value("n").alias("n"),
        )
    )
    pw = f.select(
        "period",
        F.round(
            (F.col("cs") * F.col("cs") + F.col("sn") * F.col("sn"))
            / F.col("n"),
            4,
        ).alias("power"),
    )
    mx = pw.agg(F.max("power").alias("maxp"))
    return (
        pw.join(F.broadcast(mx))
        .select(
            F.col("period").cast("long").alias("period"),
            "power",
            (F.col("power") == F.col("maxp")).alias("dominant"),
        )
        .orderBy("period")
    )


# ---------------------------------------------------------------------------
# Round-7 wave 145: two-proportion z-test
# ---------------------------------------------------------------------------


@_q(
    "agg_two_proportion_ztest",
    """
    WITH s AS (SELECT
                 sum(CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END)
                   AS n1,
                 sum(CASE WHEN l_discount >= 0.05
                          AND l_returnflag = 'R' THEN 1 ELSE 0 END)
                   AS x1,
                 sum(CASE WHEN l_discount < 0.05 THEN 1 ELSE 0 END)
                   AS n2,
                 sum(CASE WHEN l_discount < 0.05
                          AND l_returnflag = 'R' THEN 1 ELSE 0 END)
                   AS x2
               FROM lineitem),
    z AS (SELECT n1, x1, n2, x2,
                 CAST(x1 AS DOUBLE) / n1 AS p1,
                 CAST(x2 AS DOUBLE) / n2 AS p2,
                 CAST(x1 + x2 AS DOUBLE) / (n1 + n2) AS pp
          FROM s)
    SELECT CAST(n1 AS BIGINT) AS n_hi_disc, CAST(n2 AS BIGINT) AS n_lo_disc,
           round(p1, 6) AS p_return_hi,
           round(p2, 6) AS p_return_lo,
           round((p1 - p2)
                 / sqrt(pp * (1 - pp) * (1.0 / n1 + 1.0 / n2)), 4)
             AS zscore,
           round(p1 - p2 - 1.96 * sqrt(p1 * (1 - p1) / n1
                                       + p2 * (1 - p2) / n2), 6)
             AS ci95_lo,
           round(p1 - p2 + 1.96 * sqrt(p1 * (1 - p1) / n1
                                       + p2 * (1 - p2) / n2), 6)
             AS ci95_hi,
           abs((p1 - p2)
               / sqrt(pp * (1 - pp) * (1.0 / n1 + 1.0 / n2))) > 1.96
             AS reject_h0
    FROM z
    """,
)
def agg_two_proportion_ztest(spark, sf_dir):
    """Two-proportion z-test: does the return rate differ between
    high-discount (>= 5%) and low-discount line items? Pooled-
    proportion z statistic plus the unpooled Wald 95% CI for the
    difference — the categorical A/B primitive (conversion-rate
    deltas, error-rate deltas) that the chi-square entry answers only
    as an omnibus. The whole test is ONE conditional aggregate over a
    three-column scan; every derived quantity is scalar arithmetic on
    that one row."""
    l = _t(spark, sf_dir, "lineitem")
    hi = F.col("l_discount") >= 0.05
    s = l.agg(
        F.sum(F.when(hi, 1).otherwise(0)).alias("n1"),
        F.sum(
            F.when(hi & (F.col("l_returnflag") == "R"), 1).otherwise(0)
        ).alias("x1"),
        F.sum(F.when(~hi, 1).otherwise(0)).alias("n2"),
        F.sum(
            F.when(~hi & (F.col("l_returnflag") == "R"), 1).otherwise(0)
        ).alias("x2"),
    )
    p1 = F.col("x1").cast("double") / F.col("n1")
    p2 = F.col("x2").cast("double") / F.col("n2")
    pp = (F.col("x1") + F.col("x2")).cast("double") / (
        F.col("n1") + F.col("n2")
    )
    z = (p1 - p2) / F.sqrt(
        pp * (1 - pp) * (F.lit(1.0) / F.col("n1") + F.lit(1.0) / F.col("n2"))
    )
    w = F.sqrt(
        p1 * (1 - p1) / F.col("n1") + p2 * (1 - p2) / F.col("n2")
    )
    return s.select(
        F.col("n1").cast("long").alias("n_hi_disc"),
        F.col("n2").cast("long").alias("n_lo_disc"),
        F.round(p1, 6).alias("p_return_hi"),
        F.round(p2, 6).alias("p_return_lo"),
        F.round(z, 4).alias("zscore"),
        F.round(p1 - p2 - 1.96 * w, 6).alias("ci95_lo"),
        F.round(p1 - p2 + 1.96 * w, 6).alias("ci95_hi"),
        (F.abs(z) > 1.96).alias("reject_h0"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 146: quality x duplication interaction (odds ratio)
# ---------------------------------------------------------------------------


@_q(
    "corpus_quality_dedup_interaction",
    f"""
    WITH q AS ({_TQ_ORACLE}),
    nd AS ({_minhash_oracle()}),
    flags AS (SELECT d.doc_id,
                     d.doc_id IN (SELECT id_a FROM nd
                                  UNION SELECT id_b FROM nd) AS is_dup
              FROM documents d),
    j AS (SELECT (q.quality_score >= 0.82) AS hi_q, flags.is_dup
          FROM q JOIN flags USING (doc_id)),
    cells AS (SELECT
        sum(CASE WHEN hi_q AND is_dup THEN 1 ELSE 0 END) AS n_hd,
        sum(CASE WHEN hi_q AND NOT is_dup THEN 1 ELSE 0 END) AS n_hu,
        sum(CASE WHEN NOT hi_q AND is_dup THEN 1 ELSE 0 END) AS n_ld,
        sum(CASE WHEN NOT hi_q AND NOT is_dup THEN 1 ELSE 0 END) AS n_lu
      FROM j),
    o AS (SELECT n_hd, n_hu, n_ld, n_lu,
                 ln((n_hd + 0.5) * (n_lu + 0.5)
                    / ((n_hu + 0.5) * (n_ld + 0.5))) AS lor,
                 sqrt(1.0 / (n_hd + 0.5) + 1.0 / (n_hu + 0.5)
                      + 1.0 / (n_ld + 0.5) + 1.0 / (n_lu + 0.5)) AS se
          FROM cells)
    SELECT CAST(n_hd AS BIGINT) AS hi_q_dup,
           CAST(n_hu AS BIGINT) AS hi_q_uniq,
           CAST(n_ld AS BIGINT) AS lo_q_dup,
           CAST(n_lu AS BIGINT) AS lo_q_uniq,
           round(CASE WHEN n_hd + n_hu > 0
                 THEN CAST(n_hd AS DOUBLE) / (n_hd + n_hu) END, 6)
             AS dup_rate_hi_q,
           round(CASE WHEN n_ld + n_lu > 0
                 THEN CAST(n_ld AS DOUBLE) / (n_ld + n_lu) END, 6)
             AS dup_rate_lo_q,
           round(lor, 4) AS log_odds_ratio,
           round(lor - 1.96 * se, 4) AS ci95_lo,
           round(lor + 1.96 * se, 4) AS ci95_hi,
           (lor - 1.96 * se > 0) OR (lor + 1.96 * se < 0) AS associated
    FROM o
    """,
)
def corpus_quality_dedup_interaction(spark, sf_dir):
    """Curation-pipeline interaction diagnostic: the 2x2 contingency of
    (passes the quality filter at 0.82) x (participates in a MinHash
    near-duplicate pair), with the Haldane-corrected log odds ratio
    and its Wald 95% CI — answers 'are near-duplicates systematically
    lower quality?', which decides whether dedup-then-filter and
    filter-then-dedup give materially different corpora (independence
    => order-free). Duplicate flags come from the SAME banded-LSH pair
    pipeline the dedup family pins (no second near-dup implementation
    to drift); quality is the shared text_quality scorer; the 2x2
    collapse is one conditional aggregate and the inference is scalar
    arithmetic on that row. Division guards keep degenerate cells NULL
    on both engines (ANSI-safe)."""
    from boann_ocsf_security_data_platform_spark.operators.text import text_quality

    docs = _t(spark, sf_dir, "documents")
    # round 9: participation flags via the gated collapse-and-expand
    # helper (identical flags, replica pairs never enumerated) and a
    # sort-merge join — the flag set is corpus-scaling, never broadcast
    dup_ids = _near_dup_participants_gated(spark, sf_dir).withColumn(
        "is_dup_m", F.lit(True)
    )
    flags = docs.select("doc_id").join(
        _pin(dup_ids, _gates.pin_shuffle_join(_table_count(spark, sf_dir, "documents"))), "doc_id", "left"
    ).select(
        "doc_id", F.coalesce("is_dup_m", F.lit(False)).alias("is_dup")
    )
    q = text_quality(docs).select(
        "doc_id",
        (F.round(F.col("quality_score"), 6) >= 0.82).alias("hi_q"),
    )
    j = q.join(flags, "doc_id")
    cells = j.agg(
        F.sum(
            F.when(F.col("hi_q") & F.col("is_dup"), 1).otherwise(0)
        ).alias("n_hd"),
        F.sum(
            F.when(F.col("hi_q") & ~F.col("is_dup"), 1).otherwise(0)
        ).alias("n_hu"),
        F.sum(
            F.when(~F.col("hi_q") & F.col("is_dup"), 1).otherwise(0)
        ).alias("n_ld"),
        F.sum(
            F.when(~F.col("hi_q") & ~F.col("is_dup"), 1).otherwise(0)
        ).alias("n_lu"),
    )
    lor = F.log(
        (F.col("n_hd") + 0.5)
        * (F.col("n_lu") + 0.5)
        / ((F.col("n_hu") + 0.5) * (F.col("n_ld") + 0.5))
    )
    se = F.sqrt(
        F.lit(1.0) / (F.col("n_hd") + 0.5)
        + F.lit(1.0) / (F.col("n_hu") + 0.5)
        + F.lit(1.0) / (F.col("n_ld") + 0.5)
        + F.lit(1.0) / (F.col("n_lu") + 0.5)
    )
    return cells.select(
        F.col("n_hd").cast("long").alias("hi_q_dup"),
        F.col("n_hu").cast("long").alias("hi_q_uniq"),
        F.col("n_ld").cast("long").alias("lo_q_dup"),
        F.col("n_lu").cast("long").alias("lo_q_uniq"),
        F.round(
            F.when(
                F.col("n_hd") + F.col("n_hu") > 0,
                F.col("n_hd").cast("double")
                / (F.col("n_hd") + F.col("n_hu")),
            ),
            6,
        ).alias("dup_rate_hi_q"),
        F.round(
            F.when(
                F.col("n_ld") + F.col("n_lu") > 0,
                F.col("n_ld").cast("double")
                / (F.col("n_ld") + F.col("n_lu")),
            ),
            6,
        ).alias("dup_rate_lo_q"),
        F.round(lor, 4).alias("log_odds_ratio"),
        F.round(lor - 1.96 * se, 4).alias("ci95_lo"),
        F.round(lor + 1.96 * se, 4).alias("ci95_hi"),
        ((lor - 1.96 * se > 0) | (lor + 1.96 * se < 0)).alias(
            "associated"
        ),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 147: adjacent-pair cosine calibration histogram
# ---------------------------------------------------------------------------


@_q(
    "embedding_adjacent_cosine_histogram",
    """
    WITH e AS (SELECT vec_id, label,
                      CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    p AS (SELECT label, v,
                 lag(v) OVER (PARTITION BY label ORDER BY vec_id) AS pv
          FROM e),
    c AS (SELECT label,
                 list_dot_product(v, pv)
                 / (sqrt(list_dot_product(v, v))
                    * sqrt(list_dot_product(pv, pv))) AS cos
          FROM p WHERE pv IS NOT NULL),
    b AS (SELECT least(9, greatest(0,
                   CAST(floor((cos + 1.0) / 0.2) AS BIGINT))) AS bin,
                 cos
          FROM c)
    SELECT bin, CAST(count(*) AS BIGINT) AS n_pairs,
           round(min(cos), 6) AS min_cos,
           round(max(cos), 6) AS max_cos,
           round(avg(cos), 6) AS mean_cos
    FROM b GROUP BY bin ORDER BY bin
    """,
)
def embedding_adjacent_cosine_histogram(spark, sf_dir):
    """Similarity-threshold calibration: the distribution of cosine
    similarities between ADJACENT vectors (vec_id order, within label)
    binned into 10 buckets over [-1, 1] — the deterministic background-
    similarity sample a curator reads before choosing the semantic-
    dedup cutoff (where does the within-class similarity mass sit
    relative to the candidate threshold?). Sorted-adjacency pairing
    (one lag window per label partition) replaces any O(n^2) pair
    enumeration — the same discipline as orders_nearest_price_neighbor
    — and the dot products are the engine-wide left-to-right double
    fold (operators/similarity.py:_dot) that matches DuckDB's
    list_dot_product exactly."""
    from boann_ocsf_security_data_platform_spark.operators.similarity import (
        _dot,
        _norm,
    )

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").alias("v")
    )
    w = Window.partitionBy("label").orderBy("vec_id")
    p = e.select(
        "label", "v", F.lag("v").over(w).alias("pv")
    ).filter(F.col("pv").isNotNull())
    cos = _dot(F.col("v"), F.col("pv")) / (
        _norm(F.col("v")) * _norm(F.col("pv"))
    )
    c = p.select(cos.alias("cos"))
    b = c.select(
        F.least(
            F.lit(9),
            F.greatest(
                F.lit(0),
                F.floor((F.col("cos") + 1.0) / 0.2),
            ),
        ).alias("bin"),
        "cos",
    )
    return (
        b.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.min("cos"), 6).alias("min_cos"),
            F.round(F.max("cos"), 6).alias("max_cos"),
            F.round(F.avg("cos"), 6).alias("mean_cos"),
        )
        .select(
            F.col("bin").cast("long").alias("bin"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            "min_cos",
            "max_cos",
            "mean_cos",
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# Round-7 wave 148: mRMR greedy feature selection
# ---------------------------------------------------------------------------

_MRMR_PER = """
    per AS (SELECT o.o_orderkey AS okey,
                   CAST(l.cnt AS VARCHAR) AS f_nlines,
                   CAST(CAST(floor(l.qty / 100.0) AS BIGINT)
                        AS VARCHAR) AS f_qty,
                   CAST(month(CAST(o.o_orderdate AS DATE)) AS VARCHAR)
                     AS f_month,
                   CAST(CAST(floor(c.c_acctbal / 2000) AS BIGINT)
                        AS VARCHAR) AS f_bal,
                   o.o_orderpriority AS f_pri,
                   c.c_mktsegment AS f_seg,
                   (o.o_totalprice >= 150000) AS hi
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN (SELECT l_orderkey, count(*) AS cnt,
                         sum(l_quantity) AS qty
                  FROM lineitem GROUP BY 1) l
              ON l.l_orderkey = o.o_orderkey),
    lng AS (
      SELECT okey, 'nlines' AS feat, f_nlines AS bin, hi FROM per
      UNION ALL SELECT okey, 'qty', f_qty, hi FROM per
      UNION ALL SELECT okey, 'month', f_month, hi FROM per
      UNION ALL SELECT okey, 'bal', f_bal, hi FROM per
      UNION ALL SELECT okey, 'pri', f_pri, hi FROM per
      UNION ALL SELECT okey, 'seg', f_seg, hi FROM per)
"""


@_q(
    "feature_mrmr_selection",
    f"""
    WITH {_MRMR_PER},
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM per),
    rc AS (SELECT feat, bin, hi, count(*) AS c FROM lng GROUP BY 1, 2, 3),
    rb AS (SELECT feat, bin, sum(c) AS cb FROM rc GROUP BY 1, 2),
    rl AS (SELECT feat, hi, sum(c) AS cl FROM rc GROUP BY 1, 2),
    rel AS (SELECT rc.feat,
                   round(sum((rc.c / n.n)
                         * ln((rc.c * n.n)
                              / (rb.cb * CAST(rl.cl AS DOUBLE)))), 6)
                     AS rel
            FROM rc JOIN rb USING (feat, bin)
                 JOIN rl ON rc.feat = rl.feat AND rc.hi = rl.hi
                 CROSS JOIN n
            GROUP BY rc.feat),
    pc AS (SELECT a.feat AS fa, b.feat AS fb, a.bin AS ba, b.bin AS bb,
                  count(*) AS c
           FROM lng a JOIN lng b
             ON a.okey = b.okey AND a.feat < b.feat
           GROUP BY 1, 2, 3, 4),
    pa AS (SELECT fa, fb, ba, sum(c) AS ca FROM pc GROUP BY 1, 2, 3),
    pb AS (SELECT fa, fb, bb, sum(c) AS cb FROM pc GROUP BY 1, 2, 3),
    red AS (SELECT pc.fa, pc.fb,
                   round(sum((pc.c / n.n)
                         * ln((pc.c * n.n)
                              / (pa.ca * CAST(pb.cb AS DOUBLE)))), 6)
                     AS mi
            FROM pc JOIN pa USING (fa, fb, ba)
                 JOIN pb USING (fa, fb, bb)
                 CROSS JOIN n
            GROUP BY pc.fa, pc.fb),
    redsym AS (SELECT fa AS f1, fb AS f2, mi FROM red
               UNION ALL SELECT fb, fa, mi FROM red),
    s1 AS (SELECT feat, rel AS score FROM rel
           ORDER BY rel DESC, feat LIMIT 1),
    c2 AS (SELECT r.feat, round(r.rel - rs.mi, 6) AS score
           FROM rel r JOIN redsym rs
             ON rs.f1 = r.feat AND rs.f2 = (SELECT feat FROM s1)
           WHERE r.feat <> (SELECT feat FROM s1)),
    s2 AS (SELECT feat, score FROM c2 ORDER BY score DESC, feat LIMIT 1),
    c3 AS (SELECT r.feat, round(r.rel - avg(rs.mi), 6) AS score
           FROM rel r JOIN redsym rs ON rs.f1 = r.feat
           WHERE rs.f2 IN ((SELECT feat FROM s1), (SELECT feat FROM s2))
             AND r.feat NOT IN ((SELECT feat FROM s1),
                                (SELECT feat FROM s2))
           GROUP BY r.feat, r.rel),
    s3 AS (SELECT feat, score FROM c3 ORDER BY score DESC, feat LIMIT 1)
    SELECT * FROM (
      SELECT 1 AS pick, feat AS feature, score FROM s1
      UNION ALL SELECT 2, feat, score FROM s2
      UNION ALL SELECT 3, feat, score FROM s3)
    ORDER BY pick
    """,
)
def feature_mrmr_selection(spark, sf_dir):
    """Greedy minimum-redundancy-maximum-relevance (mRMR, Peng et al.
    2005) feature selection: from six categorical order/customer
    features predicting the high-price label, pick three — round 1 by
    relevance MI(f; y), rounds 2-3 by MI(f; y) minus the mean MI with
    the already-selected set. The standard 'which columns earn their
    storage' pass before any tabular model. ALL mutual informations
    come from bounded contingency aggregates (the 6-feature long
    format is a constant 6x explode; pairwise joints are a 15-pair
    equi-join on the order key — never O(n^2)); the greedy then runs
    over a 6+15-row ROUNDED score model (driver-side, bounded — the
    GD/IVF model-collect discipline), and every score is rounded to 6
    BEFORE each argmax so the selection path is ulp-stable and the
    oracle's unrolled CTE greedy replays it exactly."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    l = _t(spark, sf_dir, "lineitem")
    per_l = l.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("l_quantity").alias("qty")
    )
    per = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(per_l, o.o_orderkey == per_l.l_orderkey)
        .select(
            F.col("o_orderkey").alias("okey"),
            F.col("cnt").cast("string").alias("f_nlines"),
            F.floor(F.col("qty") / 100).cast("long").cast("string").alias("f_qty"),
            F.month(F.col("o_orderdate").cast("date"))
            .cast("string")
            .alias("f_month"),
            F.floor(F.col("c_acctbal") / 2000)
            .cast("long")
            .cast("string")
            .alias("f_bal"),
            F.col("o_orderpriority").alias("f_pri"),
            F.col("c_mktsegment").alias("f_seg"),
            (F.col("o_totalprice") >= 150000).alias("hi"),
        )
        # the (okey, 6 features, label) frame is consumed THREE times —
        # count, relevance collect, redundancy collect — and its lineage
        # is the one expensive scan here (orders ⋈ customer ⋈ a full
        # lineitem rollup). Pin it so the fact tables are read once —
        # DISK_ONLY, not localCheckpoint (round-10 sf100 find): this is
        # a 150M-row fact-grain frame at sf100, and memory-resident
        # blocks occupy the unified region's protected storage half, so
        # a later hash aggregate in the same session can fail
        # UNABLE_TO_ACQUIRE while the identical plan passes in a fresh
        # session. Disk blocks keep the read-once property without
        # competing with execution memory; unpersisted before return.
        .persist(StorageLevel.DISK_ONLY)
    )
    lng = per.selectExpr(
        "okey",
        "stack(6, 'nlines', f_nlines, 'qty', f_qty, 'month', f_month, "
        "'bal', f_bal, 'pri', f_pri, 'seg', f_seg) AS (feat, bin)",
        "hi",
    )
    nn = float(per.count())
    rc = lng.groupBy("feat", "bin", "hi").agg(
        F.count(F.lit(1)).alias("c")
    )
    rb = rc.groupBy("feat", "bin").agg(F.sum("c").alias("cb"))
    rl = rc.groupBy("feat", "hi").agg(F.sum("c").alias("cl"))
    rel = (
        rc.join(rb, ["feat", "bin"])
        .join(rl, ["feat", "hi"])
        .groupBy("feat")
        .agg(
            F.round(
                F.sum(
                    (F.col("c") / nn)
                    * F.log(
                        (F.col("c") * nn)
                        / (F.col("cb") * F.col("cl").cast("double"))
                    )
                ),
                6,
            ).alias("rel")
        )
    )
    # pairwise joint contingencies straight off the WIDE frame: one
    # 15-pair stack projection + a map-side-combined aggregate. Replaces
    # the original 6x-explode self-join on the order key (round 9 — the
    # join shuffled 6n rows against themselves to produce the same 15n
    # pair instances this projection emits for free); row set identical,
    # fa < fb lexicographic exactly like the old a.feat < b.feat.
    feat_cols = {
        "nlines": "f_nlines", "qty": "f_qty", "month": "f_month",
        "bal": "f_bal", "pri": "f_pri", "seg": "f_seg",
    }
    ordered = sorted(feat_cols)
    stack_args = ", ".join(
        f"'{fa}', '{fb}', {feat_cols[fa]}, {feat_cols[fb]}"
        for i, fa in enumerate(ordered)
        for fb in ordered[i + 1:]
    )
    pc = (
        per.selectExpr(f"stack(15, {stack_args}) AS (fa, fb, ba, bb)")
        .groupBy("fa", "fb", "ba", "bb")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pa = pc.groupBy("fa", "fb", "ba").agg(F.sum("c").alias("ca"))
    pb = pc.groupBy("fa", "fb", "bb").agg(F.sum("c").alias("cb"))
    red = (
        pc.join(pa, ["fa", "fb", "ba"])
        .join(pb, ["fa", "fb", "bb"])
        .groupBy("fa", "fb")
        .agg(
            F.round(
                F.sum(
                    (F.col("c") / nn)
                    * F.log(
                        (F.col("c") * nn)
                        / (F.col("ca") * F.col("cb").cast("double"))
                    )
                ),
                6,
            ).alias("mi")
        )
    )
    # bounded model state: 6 relevances + 15 pairwise MIs
    rel_m = {r.feat: r.rel for r in rel.collect()}
    mi_m = {}
    for r in red.collect():
        mi_m[(r.fa, r.fb)] = r.mi
        mi_m[(r.fb, r.fa)] = r.mi
    per.unpersist()  # both consumers have collected; free the disk blocks
    picks = []
    s1 = sorted(rel_m.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    picks.append((1, s1[0], s1[1]))
    cand2 = [
        (f, round(rel_m[f] - mi_m[(f, s1[0])], 6))
        for f in rel_m
        if f != s1[0]
    ]
    s2 = sorted(cand2, key=lambda kv: (-kv[1], kv[0]))[0]
    picks.append((2, s2[0], s2[1]))
    sel = {s1[0], s2[0]}
    cand3 = [
        (
            f,
            round(
                rel_m[f]
                - (mi_m[(f, s1[0])] + mi_m[(f, s2[0])]) / 2.0,
                6,
            ),
        )
        for f in rel_m
        if f not in sel
    ]
    s3 = sorted(cand3, key=lambda kv: (-kv[1], kv[0]))[0]
    picks.append((3, s3[0], s3[1]))
    return spark.createDataFrame(
        picks, "pick int, feature string, score double"
    )


# ---------------------------------------------------------------------------
# Round-7 wave 149: Lorenz curve decile points
# ---------------------------------------------------------------------------


@_q(
    "orders_lorenz_curve",
    """
    WITH r AS (SELECT o_custkey, round(sum(o_totalprice), 2) AS rev
               FROM orders GROUP BY 1),
    rk AS (SELECT o_custkey, rev,
                  row_number() OVER (ORDER BY rev, o_custkey) AS rn,
                  count(*) OVER () AS nc,
                  sum(rev) OVER () AS tot
           FROM r),
    d AS (SELECT least(9, ((rn - 1) * 10) // nc) AS decile,
                 rev, nc, tot
          FROM rk),
    g AS (SELECT decile, count(*) AS n_customers,
                 sum(rev) AS drev,
                 any_value(nc) AS nc, any_value(tot) AS tot
          FROM d GROUP BY decile)
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(n_customers AS BIGINT) AS n_customers,
           round(drev / tot, 6) AS revenue_share,
           round(sum(drev) OVER (ORDER BY decile) / tot, 6)
             AS cum_revenue_share,
           round(CAST(sum(n_customers) OVER (ORDER BY decile)
                      AS DOUBLE) / nc, 6) AS cum_pop_share
    FROM g ORDER BY decile
    """,
)
def orders_lorenz_curve(spark, sf_dir):
    """Lorenz curve of customer revenue concentration at decile
    resolution — the plot data behind the Gini coefficient
    (agg_gini_coefficient gives the scalar; this gives the curve a
    dashboard draws: cumulative revenue share vs cumulative customer
    share, bottom decile first). Decile assignment is rank-based with
    cents-rounded revenue and custkey tie-break, so the cut points are
    ulp-stable across engines; the curve itself is a 10-row window over
    the decile aggregate. One shuffle to per-customer revenue, one to
    the rank window — the global sort is over customers, the bounded
    entity domain, not order rows."""
    o = _t(spark, sf_dir, "orders")
    r = o.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("rev")
    )
    tots = r.agg(
        F.count(F.lit(1)).alias("nc"), F.sum("rev").alias("tot")
    )
    w = Window.orderBy("rev", "o_custkey")
    rk = r.select(
        "rev", F.row_number().over(w).alias("rn")
    ).join(F.broadcast(tots))
    d = rk.select(
        F.least(
            F.lit(9), F.expr("((rn - 1) * 10) div nc")
        ).alias("decile"),
        "rev",
        "nc",
        "tot",
    )
    g = d.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("rev").alias("drev"),
        F.any_value("nc").alias("nc"),
        F.any_value("tot").alias("tot"),
    )
    wc = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return g.select(
        F.col("decile").cast("long").alias("decile"),
        F.col("n_customers").cast("long").alias("n_customers"),
        F.round(F.col("drev") / F.col("tot"), 6).alias("revenue_share"),
        F.round(
            F.sum("drev").over(wc) / F.col("tot"), 6
        ).alias("cum_revenue_share"),
        F.round(
            F.sum("n_customers").over(wc).cast("double") / F.col("nc"),
            6,
        ).alias("cum_pop_share"),
    ).orderBy("decile")


# ---------------------------------------------------------------------------
# Round-7 wave 150: one-way ANOVA F-test (weekday seasonality)
# ---------------------------------------------------------------------------


@_q(
    "events_weekday_anova",
    """
    WITH d AS (SELECT CAST(ts AS DATE) AS day, count(*) AS cnt
               FROM events GROUP BY 1),
    g AS (SELECT dayofweek(day) AS dow, CAST(cnt AS DOUBLE) AS x FROM d),
    s AS (SELECT dow, count(*) AS n, avg(x) AS mu, var_samp(x) AS s2
          FROM g GROUP BY dow),
    tot AS (SELECT sum(n) AS n, sum(n * mu) / sum(n) AS gmu,
                   count(*) AS k FROM s),
    f AS (SELECT
            (SELECT sum(n * (mu - tot.gmu) * (mu - tot.gmu)) FROM s)
              / (k - 1) AS msb,
            (SELECT sum((n - 1) * s2) FROM s) / (n - k) AS msw,
            k, n
          FROM tot)
    SELECT CAST(k AS BIGINT) AS k_groups, CAST(n AS BIGINT) AS n_days,
           round(msb, 4) AS ms_between,
           round(msw, 4) AS ms_within,
           round(msb / msw, 4) AS f_stat,
           msb / msw > 2.099 AS reject_h0
    FROM f
    """,
)
def events_weekday_anova(spark, sf_dir):
    """One-way ANOVA F-test of daily event counts by day of week — the
    parametric omnibus 'does weekday matter' test (F = MS_between /
    MS_within over the 7 weekday groups, rejected against the
    F(6, inf) 0.05 critical value 2.099) that completes the omnibus
    family next to Kruskal-Wallis (ranks) and Brown-Forsythe
    (spreads). Weekday conventions normalized via the shared DATE cast
    (both engines number the same days once the day is fixed — the
    group F is label-invariant anyway). One scan to the bounded daily
    domain, one 7-row moment aggregate, scalar arithmetic after."""
    e = _t(spark, sf_dir, "events")
    d = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    g = d.select(
        F.dayofweek("day").alias("dow"),
        F.col("cnt").cast("double").alias("x"),
    )
    s = g.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("x").alias("mu"),
        F.var_samp("x").alias("s2"),
    )
    tot = s.agg(
        F.sum("n").alias("n"),
        (F.sum(F.col("n") * F.col("mu")) / F.sum("n")).alias("gmu"),
        F.count(F.lit(1)).alias("k"),
        F.sum(
            (F.col("n") - 1) * F.col("s2")
        ).alias("ssw"),
    )
    ssb = s.join(F.broadcast(tot.select("gmu"))).agg(
        F.sum(
            F.col("n")
            * (F.col("mu") - F.col("gmu"))
            * (F.col("mu") - F.col("gmu"))
        ).alias("ssb")
    )
    fin = ssb.join(F.broadcast(tot))
    msb = F.col("ssb") / (F.col("k") - 1)
    msw = F.col("ssw") / (F.col("n") - F.col("k"))
    return fin.select(
        F.col("k").cast("long").alias("k_groups"),
        F.col("n").cast("long").alias("n_days"),
        F.round(msb, 4).alias("ms_between"),
        F.round(msw, 4).alias("ms_within"),
        F.round(msb / msw, 4).alias("f_stat"),
        (msb / msw > 2.099).alias("reject_h0"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 151: negative binomial moment fit per event type
# ---------------------------------------------------------------------------


@_q(
    "events_negative_binomial_fit",
    """
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      count(*) AS cnt
               FROM events GROUP BY 1, 2),
    s AS (SELECT event_type, count(*) AS n_days,
                 avg(cnt) AS m, var_samp(cnt) AS v
          FROM d GROUP BY event_type)
    SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
           round(m, 4) AS mean_daily,
           round(v, 4) AS var_daily,
           round(CASE WHEN v > m THEN m * m / (v - m) END, 4)
             AS nb_r,
           round(CASE WHEN v > m THEN m / v END, 6) AS nb_p,
           v > m AS nb_applicable
    FROM s ORDER BY event_type
    """,
)
def events_negative_binomial_fit(spark, sf_dir):
    """Negative-binomial method-of-moments fit of daily counts per
    event type: r = m^2/(v-m), p = m/v — the distribution you reach
    for the moment events_poisson_dispersion flags overdispersion
    (Poisson is the v=m edge; NB adds the clumping parameter a
    capacity model needs for realistic tail quantiles). Types whose
    variance does NOT exceed the mean get NULL parameters and an
    explicit nb_applicable=false on both engines — fitting NB there
    is undefined, and the guard is the point. Bounded (type, day)
    collapse, then a per-type moment aggregate."""
    e = _t(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    s = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.avg("cnt").alias("m"),
        F.var_samp("cnt").alias("v"),
    )
    return s.select(
        "event_type",
        F.col("n_days").cast("long").alias("n_days"),
        F.round(F.col("m"), 4).alias("mean_daily"),
        F.round(F.col("v"), 4).alias("var_daily"),
        F.round(
            F.when(
                F.col("v") > F.col("m"),
                F.col("m") * F.col("m") / (F.col("v") - F.col("m")),
            ),
            4,
        ).alias("nb_r"),
        F.round(
            F.when(F.col("v") > F.col("m"), F.col("m") / F.col("v")), 6
        ).alias("nb_p"),
        (F.col("v") > F.col("m")).alias("nb_applicable"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Round-7 wave 152: lognormal fit + decile-probe goodness of fit
# ---------------------------------------------------------------------------


@_q(
    "agg_lognormal_fit_gof",
    """
    WITH b AS (SELECT round(o_totalprice / 100.0) * 100.0 AS v,
                      count(*) AS cnt
               FROM orders WHERE o_totalprice > 0 GROUP BY 1),
    st AS (SELECT sum(cnt) AS n,
                  sum(cnt * ln(v)) / sum(cnt) AS mu,
                  sqrt((sum(cnt * ln(v) * ln(v))
                        - sum(cnt * ln(v)) * sum(cnt * ln(v))
                          / sum(cnt))
                       / (sum(cnt) - 1)) AS sigma
           FROM b),
    qz AS (SELECT * FROM (VALUES
             (0.1, -1.2815515655446004), (0.2, -0.8416212335729143),
             (0.3, -0.5244005127080407), (0.4, -0.2533471031357997),
             (0.5, 0.0), (0.6, 0.2533471031357997),
             (0.7, 0.5244005127080407), (0.8, 0.8416212335729143),
             (0.9, 1.2815515655446004)) AS t(q, z)),
    probe AS (SELECT q, exp(mu + sigma * z) AS x, n
              FROM qz CROSS JOIN st),
    emp AS (SELECT p.q, p.x,
                   sum(CASE WHEN b.v <= p.x THEN b.cnt ELSE 0 END)
                     / CAST(any_value(p.n) AS DOUBLE) AS ecdf
            FROM probe p CROSS JOIN b GROUP BY p.q, p.x)
    SELECT q AS fitted_cdf, round(x, 2) AS probe_price,
           round(ecdf, 6) AS empirical_cdf,
           round(abs(ecdf - q), 6) AS abs_gap
    FROM emp ORDER BY q
    """,
)
def agg_lognormal_fit_gof(spark, sf_dir):
    """Lognormal fit of the (binned) order-price distribution with a
    decile-probe goodness of fit: fit mu/sigma as the weighted moments
    of ln(price) over the $100-binned value domain, then evaluate the
    EMPIRICAL CDF at the nine points where the FITTED CDF is exactly
    0.1..0.9 (x_q = exp(mu + sigma*z_q), z_q the standard normal
    decile constants) — |ecdf - q| per decile is the discrepancy
    profile, no erf needed anywhere because the probes are chosen on
    the fitted quantile scale. The is-it-lognormal question behind
    every heavy-tail pricing/latency model choice. Scale discipline:
    the fact collapses to the bounded binned domain FIRST (the KDE
    entry's move), so the probe evaluation is a 9 x bounded-domain
    conditional aggregate, never a 9x fact blow-up."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    b = o.groupBy(
        (F.round(F.col("o_totalprice") / 100.0) * 100.0).alias("v")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    lnv = F.log("v")
    st = b.agg(
        F.sum("cnt").alias("n"),
        (F.sum(F.col("cnt") * lnv) / F.sum("cnt")).alias("mu"),
        F.sqrt(
            (
                F.sum(F.col("cnt") * lnv * lnv)
                - F.sum(F.col("cnt") * lnv)
                * F.sum(F.col("cnt") * lnv)
                / F.sum("cnt")
            )
            / (F.sum("cnt") - 1)
        ).alias("sigma"),
    )
    zs = [
        (0.1, -1.2815515655446004),
        (0.2, -0.8416212335729143),
        (0.3, -0.5244005127080407),
        (0.4, -0.2533471031357997),
        (0.5, 0.0),
        (0.6, 0.2533471031357997),
        (0.7, 0.5244005127080407),
        (0.8, 0.8416212335729143),
        (0.9, 1.2815515655446004),
    ]
    qz = spark.createDataFrame(zs, "q double, z double")
    probe = F.broadcast(qz).join(F.broadcast(st)).select(
        "q",
        F.exp(F.col("mu") + F.col("sigma") * F.col("z")).alias("x"),
        "n",
    )
    emp = (
        F.broadcast(probe)
        .join(b)
        .groupBy("q", "x")
        .agg(
            (
                F.sum(
                    F.when(F.col("v") <= F.col("x"), F.col("cnt")).otherwise(
                        0
                    )
                )
                / F.any_value("n").cast("double")
            ).alias("ecdf")
        )
    )
    return emp.select(
        F.col("q").alias("fitted_cdf"),
        F.round(F.col("x"), 2).alias("probe_price"),
        F.round(F.col("ecdf"), 6).alias("empirical_cdf"),
        F.round(F.abs(F.col("ecdf") - F.col("q")), 6).alias("abs_gap"),
    ).orderBy("fitted_cdf")


# ---------------------------------------------------------------------------
# Round-7 wave 153: ICO multi-image container round-trip
# ---------------------------------------------------------------------------


@_q(
    "multimodal_ico_roundtrip",
    """
    WITH e AS (SELECT doc_id, n_chars,
                      CAST(doc_id % 3 + 1 AS BIGINT) AS cnt,
                      unnest(range(CAST(doc_id % 3 + 1 AS BIGINT))) AS i
               FROM documents),
    w AS (SELECT doc_id, cnt,
                 CASE WHEN (n_chars + i) % 256 = 0 THEN 256
                      ELSE (n_chars + i) % 256 END AS wd,
                 CASE WHEN (doc_id + i) % 256 = 0 THEN 256
                      ELSE (doc_id + i) % 256 END AS hd,
                 16 + 4 * i AS sz
          FROM e)
    SELECT doc_id, 'ico' AS format,
           CAST(any_value(cnt) AS INT) AS n_images,
           CAST(max(wd) AS INT) AS max_width,
           CAST(max(hd) AS INT) AS max_height,
           CAST(sum(sz) AS BIGINT) AS total_image_bytes,
           TRUE AS offsets_ok, TRUE AS size_ok
    FROM w GROUP BY doc_id
    """,
)
def multimodal_ico_roundtrip(spark, sf_dir):
    """Synthesize a VALID multi-image ICO per document in pure Column
    expressions — ICONDIR header plus a VARIABLE number (1-3, data-
    derived) of 16-byte ICONDIRENTRY records built with an array
    transform + binary fold (the first container entry whose directory
    length is itself data-dependent), widths exercising the ICO
    0-means-256 byte convention, offsets laid out contiguously by
    closed-form prefix arithmetic — then push it through the layout-
    verifying parser (operators/multimodal.py:parse_ico_meta), which
    must find every declared image contiguous and the buffer exactly
    consumed. The oracle recomputes the expected directory arithmetic
    relationally and both verification booleans must read TRUE on
    every row: any drift in the variable-length fold, the offset
    closed form, or the parser's struct walk breaks the hash.
    Synthesis is row-local; parsing is the Arrow mapInPandas stage."""
    from boann_ocsf_security_data_platform_spark.operators.multimodal import (
        parse_ico_meta,
    )

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.col("n_chars"),
        (F.col("doc_id") % 3 + 1).cast("long").alias("cnt"),
    )
    byte = lambda c: F.unhex(F.lpad(F.hex(c), 2, "0"))  # noqa: E731
    dir_end = F.lit(6) + 16 * F.col("cnt")

    def entry(i):
        w8 = (F.col("n_chars") + i) % 256
        h8 = (F.col("media_id") + i) % 256
        size = F.lit(16) + 4 * i
        offset = dir_end + 16 * i + 2 * i * (i - 1)
        return F.concat(
            byte(w8),
            byte(h8),
            F.lit(bytes(2)),              # colorCount, reserved
            _le_bytes(F.lit(1), 4),       # planes (LE16)
            _le_bytes(F.lit(32), 4),      # bitCount (LE16)
            _le_bytes(size, 8),           # bytesInRes (LE32)
            _le_bytes(offset, 8),         # imageOffset (LE32)
        )

    entries = F.aggregate(
        F.transform(F.sequence(F.lit(0), (F.col("cnt") - 1).cast("int")), entry),
        F.unhex(F.lit("")),
        lambda acc, x: F.concat(acc, x),
    )
    total_payload = 16 * F.col("cnt") + 2 * F.col("cnt") * (
        F.col("cnt") - 1
    )
    ico = F.concat(
        _le_bytes(F.lit(0), 4),           # reserved (LE16)
        _le_bytes(F.lit(1), 4),           # type = icon (LE16)
        _le_bytes(F.col("cnt"), 4),       # count (LE16)
        entries,
        F.unhex(F.repeat(F.lit("00"), total_payload.cast("int"))),
    )
    meta = parse_ico_meta(d.select("media_id", ico.alias("payload")))
    return meta.select(
        F.col("media_id").alias("doc_id"),
        "format",
        "n_images",
        "max_width",
        "max_height",
        "total_image_bytes",
        "offsets_ok",
        "size_ok",
    )


# ---------------------------------------------------------------------------
# Round-7 wave 154: near-dup cluster size histogram
# ---------------------------------------------------------------------------


@_q(
    "dedup_cluster_size_histogram",
    f"""
    WITH sizes AS (
      SELECT cluster_id, count(*) AS sz
      FROM ({_clusters_oracle()}) cl GROUP BY cluster_id)
    SELECT CAST(sz AS BIGINT) AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sz * count(*) AS BIGINT) AS n_docs
    FROM sizes GROUP BY sz ORDER BY sz
    """,
)
def dedup_cluster_size_histogram(spark, sf_dir):
    """Frequency-of-frequencies of near-duplicate cluster sizes — the
    curation observability readout that tells a pipeline owner whether
    duplication is pairwise noise (mass at size 2) or template blow-ups
    (a long tail of big clusters), which decides between keep-one
    dedup and aggressive template stripping. Composes the SAME LSH ->
    connected-components pipeline dedup_clusters pins (auto-dispatched
    min-label / large-star-small-star), then two bounded hash
    aggregates over the (node, cluster_id) output; the oracle replays
    it with the recursive-reachability CTE. Round 9: clusters come from
    _near_dup_clusters_gated (collapse-and-expand above the pairwise
    gate — identical clusters, replica pairs never enumerated)."""
    cl = _near_dup_clusters_gated(spark, sf_dir)
    sizes = cl.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("sz"))
    return (
        sizes.groupBy("sz")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            F.col("sz").cast("long").alias("cluster_size"),
            F.col("n_clusters").cast("long").alias("n_clusters"),
            (F.col("sz") * F.col("n_clusters"))
            .cast("long")
            .alias("n_docs"),
        )
        .orderBy("cluster_size")
    )


# ---------------------------------------------------------------------------
# Round-7 wave 155: ABC class migration matrix (1995 -> 1996)
# ---------------------------------------------------------------------------


@_q(
    "orders_abc_migration",
    """
    WITH r AS (SELECT o_custkey,
                      year(CAST(o_orderdate AS DATE)) AS yr,
                      sum(o_totalprice) AS rev
               FROM orders
               WHERE year(CAST(o_orderdate AS DATE)) IN (1995, 1996)
               GROUP BY 1, 2),
    k AS (SELECT o_custkey, yr, rev,
                 sum(rev) OVER (PARTITION BY yr
                   ORDER BY rev DESC, o_custkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum,
                 sum(rev) OVER (PARTITION BY yr) AS tot
          FROM r),
    c AS (SELECT o_custkey, yr,
                 CASE WHEN (cum - rev) / tot < 0.8 THEN 'A'
                      WHEN (cum - rev) / tot < 0.95 THEN 'B'
                      ELSE 'C' END AS cls
          FROM k),
    m AS (SELECT coalesce(a.cls, '-') AS cls_1995,
                 coalesce(b.cls, '-') AS cls_1996
          FROM (SELECT o_custkey, cls FROM c WHERE yr = 1995) a
          FULL OUTER JOIN
               (SELECT o_custkey, cls FROM c WHERE yr = 1996) b
            ON a.o_custkey = b.o_custkey)
    SELECT cls_1995, cls_1996, CAST(count(*) AS BIGINT) AS n_customers
    FROM m GROUP BY 1, 2 ORDER BY cls_1995, cls_1996
    """,
)
def orders_abc_migration(spark, sf_dir):
    """ABC revenue-class migration matrix between 1995 and 1996: each
    customer's Pareto class per year (A = inside the first 80% of
    cumulative revenue, B to 95%, C the tail — the agg_pareto_abc cut,
    partitioned by year) full-outer-joined with itself, '-' for years
    the customer didn't order — the churn/upsell flow a key-account
    dashboard actually shows (how many A-customers slipped to C or
    vanished?). Round-12 sf100 find: PARTITION BY yr is the rank-window
    funnel at cardinality 2 over a 30M-row (customer, year) grain — the
    same bucketed prefix-sum as agg_pareto_abc, partitioned per year,
    replaces it; per-year totals ride a broadcast 2-row aggregate."""
    o = _t(spark, sf_dir, "orders").withColumn(
        "yr", F.year(F.col("o_orderdate").cast("date"))
    )
    r = (
        o.filter(F.col("yr").isin([1995, 1996]))
        .groupBy("o_custkey", "yr")
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    tot = r.groupBy("yr").agg(F.sum("rev").alias("_tot"))
    rb = _order_buckets(r, "rev", ascending=False)
    wcum = (
        Window.partitionBy("yr", "bkt")
        .orderBy(F.col("rev").desc(), "o_custkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_pre = (
        Window.partitionBy("yr")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = (
        rb.groupBy("yr", "bkt")
        .agg(F.sum("rev").alias("_bsum"))
        .select(
            "yr",
            "bkt",
            F.coalesce(F.sum("_bsum").over(w_pre), F.lit(0.0)).alias(
                "_prev"
            ),
        )
    )
    r = rb.join(F.broadcast(prefix), ["yr", "bkt"]).join(
        F.broadcast(tot), "yr"
    )
    share = (
        F.col("_prev") + F.sum("rev").over(wcum) - F.col("rev")
    ) / F.col("_tot")
    c = r.select(
        "o_custkey",
        "yr",
        F.when(share < 0.8, "A")
        .when(share < 0.95, "B")
        .otherwise("C")
        .alias("cls"),
    )
    a = c.filter(F.col("yr") == 1995).select(
        "o_custkey", F.col("cls").alias("cls_a")
    )
    b = c.filter(F.col("yr") == 1996).select(
        F.col("o_custkey").alias("ck_b"), F.col("cls").alias("cls_b")
    )
    m = a.join(b, a.o_custkey == b.ck_b, "full_outer").select(
        F.coalesce("cls_a", F.lit("-")).alias("cls_1995"),
        F.coalesce("cls_b", F.lit("-")).alias("cls_1996"),
    )
    return (
        m.groupBy("cls_1995", "cls_1996")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .select(
            "cls_1995",
            "cls_1996",
            F.col("n_customers").cast("long").alias("n_customers"),
        )
        .orderBy("cls_1995", "cls_1996")
    )


# ---------------------------------------------------------------------------
# Round-7 wave 156: Burrows' Delta stylometric distance between sources
# ---------------------------------------------------------------------------


@_q(
    "text_burrows_delta",
    f"""
    WITH toks AS (SELECT source, unnest({_WORDS}) AS w FROM documents),
    wc AS (SELECT source, w, count(*) AS c FROM toks GROUP BY 1, 2),
    st AS (SELECT source, sum(c) AS tot FROM wc GROUP BY source),
    top AS (SELECT w FROM (SELECT w, sum(c) AS g FROM wc GROUP BY w)
            ORDER BY g DESC, w LIMIT 20),
    f AS (SELECT st.source, top.w,
                 coalesce(wc.c, 0) / CAST(st.tot AS DOUBLE) AS fr
          FROM st CROSS JOIN top
          LEFT JOIN wc ON wc.source = st.source AND wc.w = top.w),
    z AS (SELECT source, w,
                 (fr - avg(fr) OVER (PARTITION BY w))
                 / stddev_samp(fr) OVER (PARTITION BY w) AS z
          FROM f),
    d AS (SELECT a.source AS source_a, b.source AS source_b,
                 round(avg(abs(a.z - b.z)), 6) AS delta
          FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
          GROUP BY 1, 2)
    SELECT source_a, source_b, delta FROM d
    ORDER BY source_a, source_b
    """,
)
def text_burrows_delta(spark, sf_dir):
    """Burrows' Delta between every pair of sources — the classic
    stylometric distance (z-score each of the top-20 corpus-wide words
    WITHIN its word across sources, then average |z_a - z_b| per pair):
    function-word usage fingerprints a text's producer, so Delta
    clusters sources by style/generator — the provenance probe a
    mixed-crawl corpus audit runs next to vocabulary Jaccard (which
    sees WHAT is said; Delta sees HOW). One tokenize+count pass
    collapses the corpus to the bounded (source, word) domain; the
    top-20 word list, z-scores, and the pairwise matrix are all
    aggregates of that bounded frame (20 sources x 20 words)."""
    from boann_ocsf_security_data_platform_spark.operators.text import tokens

    toks = _t(spark, sf_dir, "documents").select(
        "source", F.explode(tokens(F.col("text"))).alias("w")
    )
    wc = toks.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    st = wc.groupBy("source").agg(F.sum("c").alias("tot"))
    top = (
        wc.groupBy("w")
        .agg(F.sum("c").alias("g"))
        .orderBy(F.col("g").desc(), "w")
        .limit(20)
        .select("w")
    )
    f = (
        st.join(F.broadcast(top))
        .join(wc, ["source", "w"], "left")
        .select(
            "source",
            "w",
            (
                F.coalesce(F.col("c"), F.lit(0))
                / F.col("tot").cast("double")
            ).alias("fr"),
        )
    )
    ww = Window.partitionBy("w")
    z = f.select(
        "source",
        "w",
        (
            (F.col("fr") - F.avg("fr").over(ww))
            / F.stddev_samp("fr").over(ww)
        ).alias("z"),
    )
    a, b = z.alias("a"), z.alias("b")
    return (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(
            F.round(
                F.avg(F.abs(F.col("a.z") - F.col("b.z"))), 6
            ).alias("delta")
        )
        .orderBy("source_a", "source_b")
    )


# ---------------------------------------------------------------------------
# Round-7 wave 157: ROC sweep + trapezoid AUC (quality as dup detector)
# ---------------------------------------------------------------------------


@_q(
    "corpus_quality_roc_auc",
    f"""
    WITH q AS ({_TQ_ORACLE}),
    nd AS ({_minhash_oracle()}),
    flags AS (SELECT q.doc_id, q.quality_score AS s,
                     q.doc_id IN (SELECT id_a FROM nd
                                  UNION SELECT id_b FROM nd) AS pos
              FROM q),
    tt AS (SELECT unnest([0.78, 0.80, 0.82, 0.84, 0.86]) AS t),
    pts AS (SELECT t,
              round(sum(CASE WHEN pos AND s < t THEN 1 ELSE 0 END)
                / CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END)
                       AS DOUBLE), 6) AS tpr,
              round(sum(CASE WHEN NOT pos AND s < t THEN 1 ELSE 0 END)
                / CAST(sum(CASE WHEN NOT pos THEN 1 ELSE 0 END)
                       AS DOUBLE), 6) AS fpr
            FROM flags CROSS JOIN tt GROUP BY t),
    seg AS (SELECT t, tpr, fpr,
                   coalesce(lag(tpr) OVER (ORDER BY t), 0.0) AS ptpr,
                   coalesce(lag(fpr) OVER (ORDER BY t), 0.0) AS pfpr
            FROM pts),
    auc AS (SELECT sum((fpr - pfpr) * (tpr + ptpr) / 2.0)
                   + (1.0 - max(fpr)) * (1.0 + max(tpr)) / 2.0 AS auc
            FROM seg)
    SELECT round(t, 2) AS threshold, tpr, fpr,
           round((SELECT auc FROM auc), 6) AS auc_5pt
    FROM pts ORDER BY threshold
    """,
)
def corpus_quality_roc_auc(spark, sf_dir):
    """ROC curve of the quality score as a near-duplicate detector
    (positive = participates in a MinHash near-dup pair; predict
    positive when score < threshold), swept at five fixed thresholds
    with the 5-point trapezoid AUC ((0,0) and (1,1) anchored) — the
    classifier-eval primitive (TPR/FPR/AUC) the engine needs for ANY
    scored-filter tuning, exercised on two pipelines it already pins
    (text_quality x banded LSH). AUC ~ 0.5 says quality does NOT find
    near-dups — a real measurement, not a toy: it tells the curator
    the two filters are complementary, the same independence question
    corpus_quality_dedup_interaction answers with an odds ratio. The
    sweep is one conditional aggregate over the bounded flag frame
    crossed with five literals; AUC is a 5-row window fold."""
    from boann_ocsf_security_data_platform_spark.operators.text import text_quality

    docs = _t(spark, sf_dir, "documents")
    # round 9: positive flags via the gated collapse-and-expand helper —
    # identical flags, replica pairs (copies² growth) never enumerated
    dup_ids = _near_dup_participants_gated(spark, sf_dir).withColumn(
        "pos_m", F.lit(True)
    )
    flags = (
        text_quality(docs)
        .select("doc_id", F.col("quality_score").alias("s"))
        # dup_ids is corpus-scaling (on duplication-heavy data it is MOST
        # of the corpus) — pinned above the measured-count threshold
        .join(_pin(dup_ids, _gates.pin_shuffle_join(_table_count(spark, sf_dir, "documents"))), "doc_id", "left")
        .select(
            "s", F.coalesce("pos_m", F.lit(False)).alias("pos")
        )
    )
    tt = spark.createDataFrame(
        [(0.78,), (0.80,), (0.82,), (0.84,), (0.86,)], "t double"
    )
    pts = (
        flags.join(F.broadcast(tt))
        .groupBy("t")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("pos") & (F.col("s") < F.col("t")), 1)
                    .otherwise(0)
                )
                / F.sum(F.when(F.col("pos"), 1).otherwise(0)).cast(
                    "double"
                ),
                6,
            ).alias("tpr"),
            F.round(
                F.sum(
                    F.when(
                        (~F.col("pos")) & (F.col("s") < F.col("t")), 1
                    ).otherwise(0)
                )
                / F.sum(F.when(~F.col("pos"), 1).otherwise(0)).cast(
                    "double"
                ),
                6,
            ).alias("fpr"),
        )
    )
    lagw = Window.orderBy("t")
    seg = pts.select(
        "t",
        "tpr",
        "fpr",
        F.coalesce(F.lag("tpr").over(lagw), F.lit(0.0)).alias("ptpr"),
        F.coalesce(F.lag("fpr").over(lagw), F.lit(0.0)).alias("pfpr"),
    )
    auc = seg.agg(
        (
            F.sum(
                (F.col("fpr") - F.col("pfpr"))
                * (F.col("tpr") + F.col("ptpr"))
                / 2.0
            )
            + (F.lit(1.0) - F.max("fpr"))
            * (F.lit(1.0) + F.max("tpr"))
            / 2.0
        ).alias("auc")
    )
    return (
        pts.join(F.broadcast(auc))
        .select(
            F.round(F.col("t"), 2).alias("threshold"),
            "tpr",
            "fpr",
            F.round(F.col("auc"), 6).alias("auc_5pt"),
        )
        .orderBy("threshold")
    )


# ---------------------------------------------------------------------------
# Round-7 wave 158: partial autocorrelation (Durbin-Levinson, lags 1-3)
# ---------------------------------------------------------------------------


@_q(
    "events_pacf",
    """
    WITH d AS (SELECT CAST(ts AS DATE) AS day, count(*) AS cnt
               FROM events GROUP BY 1),
    l AS (SELECT CAST(cnt AS DOUBLE) AS v,
                 lag(cnt) OVER (ORDER BY day) AS v1,
                 lag(cnt, 2) OVER (ORDER BY day) AS v2,
                 lag(cnt, 3) OVER (ORDER BY day) AS v3
          FROM d),
    r AS (SELECT corr(v, v1) AS r1, corr(v, v2) AS r2,
                 corr(v, v3) AS r3, count(*) AS n
          FROM l),
    dl AS (SELECT r1, r2, r3, n,
                  (r2 - r1 * r1) / (1.0 - r1 * r1) AS p22
           FROM r),
    dl2 AS (SELECT r1, r2, r3, n, p22,
                   r1 * (1.0 - p22) AS p21
            FROM dl),
    dl3 AS (SELECT r1, r2, r3, n, p22,
                   (r3 - p21 * r2 - p22 * r1)
                   / (1.0 - p21 * r1 - p22 * r2) AS p33
            FROM dl2)
    SELECT CAST(n AS BIGINT) AS n_days,
           round(r1, 4) AS acf1, round(r2, 4) AS acf2,
           round(r3, 4) AS acf3,
           round(r1, 4) AS pacf1, round(p22, 4) AS pacf2,
           round(p33, 4) AS pacf3,
           abs(p22) > 1.96 / sqrt(n) AS ar2_plus_evidence
    FROM dl3
    """,
)
def events_pacf(spark, sf_dir):
    """Partial autocorrelation of the daily event-count series at lags
    1-3 via the closed-form Durbin-Levinson recursion (phi_11 = r1,
    phi_22 = (r2-r1^2)/(1-r1^2), phi_33 from the level-2 coefficients)
    — THE plot that picks an AR model order: ACF says 'correlated at
    lag k', PACF says 'correlated at lag k AFTER the shorter lags are
    regressed out', and |phi_22| above the 1.96/sqrt(n) band is
    evidence the series needs more than AR(1). Complements
    events_autocorrelation (raw ACF) and events_durbin_watson
    (residual lag-1). One bounded daily collapse, three lag windows,
    then scalar recursion on a one-row frame."""
    e = _t(spark, sf_dir, "events")
    d = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.orderBy("day")
    l = d.select(
        F.col("cnt").cast("double").alias("v"),
        F.lag("cnt").over(w).alias("v1"),
        F.lag("cnt", 2).over(w).alias("v2"),
        F.lag("cnt", 3).over(w).alias("v3"),
    )
    r = l.agg(
        F.corr("v", "v1").alias("r1"),
        F.corr("v", "v2").alias("r2"),
        F.corr("v", "v3").alias("r3"),
        F.count(F.lit(1)).alias("n"),
    )
    p22 = (F.col("r2") - F.col("r1") * F.col("r1")) / (
        F.lit(1.0) - F.col("r1") * F.col("r1")
    )
    dl = r.withColumn("p22", p22).withColumn(
        "p21", F.col("r1") * (F.lit(1.0) - F.col("p22"))
    )
    p33 = (
        F.col("r3") - F.col("p21") * F.col("r2") - F.col("p22") * F.col("r1")
    ) / (
        F.lit(1.0)
        - F.col("p21") * F.col("r1")
        - F.col("p22") * F.col("r2")
    )
    return dl.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(F.col("r1"), 4).alias("acf1"),
        F.round(F.col("r2"), 4).alias("acf2"),
        F.round(F.col("r3"), 4).alias("acf3"),
        F.round(F.col("r1"), 4).alias("pacf1"),
        F.round(F.col("p22"), 4).alias("pacf2"),
        F.round(p33, 4).alias("pacf3"),
        (
            F.abs(F.col("p22"))
            > F.lit(1.96) / F.sqrt(F.col("n").cast("double"))
        ).alias("ar2_plus_evidence"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 159: burstiness-memory plane (Goh-Barabasi)
# ---------------------------------------------------------------------------


@_q(
    "events_burstiness_memory",
    """
    WITH s AS (SELECT event_type, ts,
                      lag(ts) OVER (PARTITION BY event_type
                                    ORDER BY ts, event_id) AS pts
               FROM events),
    g AS (SELECT event_type,
                 CAST(date_diff('microsecond', pts, ts) AS DOUBLE)
                   / 1000000.0 AS gap
          FROM s WHERE pts IS NOT NULL),
    m AS (SELECT event_type, count(*) AS n,
                 avg(gap) AS mu, stddev_samp(gap) AS sd
          FROM g GROUP BY event_type)
    SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
           round(mu, 2) AS mean_gap_s,
           round((sd - mu) / (sd + mu), 4) AS burstiness,
           CASE WHEN (sd - mu) / (sd + mu) > 0.1 THEN 'bursty'
                WHEN (sd - mu) / (sd + mu) < -0.1 THEN 'regular'
                ELSE 'poisson-like' END AS regime
    FROM m ORDER BY event_type
    """,
)
def events_burstiness_memory(spark, sf_dir):
    """Goh-Barabasi burstiness coefficient per event type: B =
    (sigma - mu)/(sigma + mu) of the inter-arrival gaps — B ~ 0 is a
    Poisson process, B -> 1 extreme clumping, B < 0 pacemaker-regular
    — with a three-way regime classification. The single normalized
    number that lets two streams with different rates be compared for
    burstiness directly (the CV from events_interarrival_expfit is
    unbounded; B is bounded in (-1, 1)). Gaps come from one lag window
    per type partition; the statistic is a per-type moment aggregate."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    s = e.select(
        "event_type", "ts", F.lag("ts").over(w).alias("pts")
    ).filter(F.col("pts").isNotNull())
    g = s.select(
        "event_type",
        (
            F.expr("timestampdiff(MICROSECOND, pts, ts)").cast("double")
            / 1e6
        ).alias("gap"),
    )
    m = g.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("gap").alias("mu"),
        F.stddev_samp("gap").alias("sd"),
    )
    b = (F.col("sd") - F.col("mu")) / (F.col("sd") + F.col("mu"))
    return m.select(
        "event_type",
        F.col("n").cast("long").alias("n_gaps"),
        F.round(F.col("mu"), 2).alias("mean_gap_s"),
        F.round(b, 4).alias("burstiness"),
        F.when(b > 0.1, "bursty")
        .when(b < -0.1, "regular")
        .otherwise("poisson-like")
        .alias("regime"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Round-7 wave 160: split-conformal prediction interval + coverage
# ---------------------------------------------------------------------------


@_q(
    "agg_conformal_interval",
    """
    WITH per AS (SELECT l_orderkey, sum(l_quantity) AS qty
                 FROM lineitem GROUP BY 1),
    j AS (SELECT o.o_orderkey AS okey,
                 CAST(per.qty AS DOUBLE) AS x, o.o_totalprice AS y,
                 o.o_orderkey % 2 = 0 AS is_cal
          FROM per JOIN orders o ON per.l_orderkey = o.o_orderkey),
    fit AS (SELECT regr_slope(y, x) AS b1, regr_intercept(y, x) AS b0
            FROM j WHERE NOT is_cal),
    cal AS (SELECT abs(j.y - (fit.b0 + fit.b1 * j.x)) AS score
            FROM j CROSS JOIN fit WHERE is_cal),
    qh AS (SELECT score AS qhat FROM (
             SELECT score, row_number() OVER (ORDER BY score) AS rn,
                    count(*) OVER () AS n
             FROM cal) t
           WHERE rn = CAST(ceil(0.9 * (n + 1)) AS BIGINT)),
    test AS (SELECT count(*) AS n_test,
                    sum(CASE WHEN abs(j.y - (fit.b0 + fit.b1 * j.x))
                             <= qh.qhat THEN 1 ELSE 0 END) AS covered
             FROM j CROSS JOIN fit CROSS JOIN qh WHERE NOT is_cal),
    nc AS (SELECT count(*) AS n_cal FROM cal)
    SELECT CAST(nc.n_cal AS BIGINT) AS n_cal,
           CAST(test.n_test AS BIGINT) AS n_test,
           round(qh.qhat, 2) AS qhat,
           round(CAST(covered AS DOUBLE) / n_test, 6)
             AS empirical_coverage,
           CAST(covered AS DOUBLE) / n_test >= 0.88 AS coverage_ok
    FROM test CROSS JOIN qh CROSS JOIN nc
    """,
)
def agg_conformal_interval(spark, sf_dir):
    """Split-conformal prediction interval for the quantity -> price
    OLS model: fit on the odd-key half, take the ceil(0.9(n+1))-th
    order statistic of absolute residuals on the even-key calibration
    half as the interval half-width q-hat, then measure EMPIRICAL
    coverage back on the fit half — the distribution-free uncertainty
    quantification (Vovk; popularized as conformal prediction) that
    turns ANY point model into calibrated intervals, with the finite-
    sample ~90% guarantee checked rather than assumed. The split is
    deterministic key parity; the order statistic is a row_number cut
    (exact, no percentile interpolation divergence); the model and
    q-hat ride broadcast one-row frames. Evaluation on the fit half is
    deliberate and labeled: it measures interval TIGHTNESS where the
    model is optimistic (true held-out coverage would need a 3-way
    split; the conformal guarantee itself needs only exchangeability
    of the calibration scores)."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    per = l.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("qty"))
    j = per.join(o, per.l_orderkey == o.o_orderkey).select(
        F.col("qty").cast("double").alias("x"),
        F.col("o_totalprice").alias("y"),
        (F.col("o_orderkey") % 2 == 0).alias("is_cal"),
        # fan-out persist (round 13): j feeds the OLS fit, the
        # calibration-score branch, and the coverage evaluation —
        # unpersisted, each re-ran the lineitem rollup + orders join
        # (three fact passes; DISK_ONLY above the fact gate, the q21
        # discipline)
    ).persist(
        StorageLevel.DISK_ONLY
        if _table_count(spark, sf_dir, "lineitem") > _gates.PIN_FACT_MIN_ROWS
        else StorageLevel.MEMORY_AND_DISK_DESER
    )
    fit = j.filter(~F.col("is_cal")).agg(
        F.regr_slope("y", "x").alias("b1"),
        F.regr_intercept("y", "x").alias("b0"),
    )
    cal = (
        j.filter(F.col("is_cal"))
        .join(F.broadcast(fit))
        .select(
            F.abs(
                F.col("y") - (F.col("b0") + F.col("b1") * F.col("x"))
            ).alias("score")
        )
    )
    # k-th order statistic via the bucketed cum-count, not a global
    # row_number sort (round 11: the unpartitioned window funneled the
    # 75M-row calibration half through ONE task at sf100). The
    # ceil(0.9(n+1))-th score is the distinct score whose exclusive
    # cum-count straddles k — exact under ties, bucket-parallel.
    nc = cal.agg(F.count(F.lit(1)).alias("n_cal"))
    k = F.ceil(0.9 * (F.col("n_cal") + 1)).cast("long")
    sc = _cum_before(
        cal.groupBy("score").agg(F.count(F.lit(1)).alias("tn")),
        "score",
        "tn",
        "_cb",
    )
    qh = (
        sc.join(F.broadcast(nc))
        .filter((F.col("_cb") < k) & (k <= F.col("_cb") + F.col("tn")))
        .select(F.col("score").alias("qhat"))
    )
    test = (
        j.filter(~F.col("is_cal"))
        .join(F.broadcast(fit))
        .join(F.broadcast(qh))
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(
                F.when(
                    F.abs(
                        F.col("y")
                        - (F.col("b0") + F.col("b1") * F.col("x"))
                    )
                    <= F.col("qhat"),
                    1,
                ).otherwise(0)
            ).alias("covered"),
            F.any_value("qhat").alias("qhat"),
        )
    )
    cov = F.col("covered").cast("double") / F.col("n_test")
    return test.join(F.broadcast(nc)).select(
        F.col("n_cal").cast("long").alias("n_cal"),
        F.col("n_test").cast("long").alias("n_test"),
        F.round(F.col("qhat"), 2).alias("qhat"),
        F.round(cov, 6).alias("empirical_coverage"),
        (cov >= 0.88).alias("coverage_ok"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 161: Matryoshka truncation error profile
# ---------------------------------------------------------------------------


@_q(
    "embedding_matryoshka_truncation",
    """
    WITH e AS (SELECT vec_id, label,
                      CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    p AS (SELECT label, v,
                 lag(v) OVER (PARTITION BY label ORDER BY vec_id) AS pv
          FROM e),
    pp AS (SELECT v, pv FROM p WHERE pv IS NOT NULL),
    dims AS (SELECT unnest([64, 32, 16]) AS d),
    c AS (SELECT dims.d,
                 list_dot_product(v[1:64], pv[1:64])
                 / (sqrt(list_dot_product(v[1:64], v[1:64]))
                    * sqrt(list_dot_product(pv[1:64], pv[1:64])))
                   AS cf,
                 list_dot_product(v[1:dims.d], pv[1:dims.d])
                 / (sqrt(list_dot_product(v[1:dims.d], v[1:dims.d]))
                    * sqrt(list_dot_product(pv[1:dims.d], pv[1:dims.d])))
                   AS ct
          FROM pp CROSS JOIN dims)
    SELECT CAST(d AS BIGINT) AS dim,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(avg(ct), 6) AS mean_cos,
           round(avg(abs(ct - cf)), 6) AS mean_abs_err,
           round(max(abs(ct - cf)), 6) AS max_abs_err
    FROM c GROUP BY d ORDER BY dim DESC
    """,
)
def embedding_matryoshka_truncation(spark, sf_dir):
    """Matryoshka truncation audit: how much does adjacent-pair cosine
    similarity move when embeddings are truncated to their 32- and
    16-dim prefixes (the MRL deployment question — can the ANN index
    store d/4 and re-rank at full d)? Mean and max |cos_trunc -
    cos_full| per truncation level, with the 64-dim row as the
    zero-error control the hash pins. Same sorted-adjacency pairing as
    embedding_adjacent_cosine_histogram (no O(n^2)); prefixes are
    array slices, dot products the engine-wide left-to-right double
    fold, and the 3x dims explode rides the bounded pair frame."""
    from boann_ocsf_security_data_platform_spark.operators.similarity import (
        _dot,
        _norm,
    )

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").alias("v")
    )
    w = Window.partitionBy("label").orderBy("vec_id")
    pp = e.select(
        "v", F.lag("v").over(w).alias("pv")
    ).filter(F.col("pv").isNotNull())
    dims = spark.createDataFrame([(64,), (32,), (16,)], "d int")

    def cos_at(a, b, d):
        sa, sb = F.slice(a, 1, d), F.slice(b, 1, d)
        return _dot(sa, sb) / (_norm(sa) * _norm(sb))

    c = pp.join(F.broadcast(dims)).select(
        "d",
        cos_at(F.col("v"), F.col("pv"), F.lit(64)).alias("cf"),
        cos_at(F.col("v"), F.col("pv"), F.col("d")).alias("ct"),
    )
    return (
        c.groupBy("d")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg("ct"), 6).alias("mean_cos"),
            F.round(
                F.avg(F.abs(F.col("ct") - F.col("cf"))), 6
            ).alias("mean_abs_err"),
            F.round(
                F.max(F.abs(F.col("ct") - F.col("cf"))), 6
            ).alias("max_abs_err"),
        )
        .select(
            F.col("d").cast("long").alias("dim"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            "mean_cos",
            "mean_abs_err",
            "max_abs_err",
        )
        .orderBy(F.col("dim").desc())
    )


# ---------------------------------------------------------------------------
# Round-7 wave 162: haversine nearest-warehouse assignment
# ---------------------------------------------------------------------------


@_q(
    "scalar_haversine_assignment",
    """
    WITH c AS (SELECT c_custkey,
                 radians((c_custkey * 37 % 18000) / 100.0 - 90.0) AS lat,
                 radians((c_custkey * 73 % 36000) / 100.0 - 180.0) AS lon
               FROM customer),
    w AS (SELECT * FROM (VALUES
            (1, radians(40.7128), radians(-74.0060)),
            (2, radians(51.5074), radians(-0.1278)),
            (3, radians(35.6762), radians(139.6503)),
            (4, radians(-33.8688), radians(151.2093)),
            (5, radians(1.3521), radians(103.8198)))
          AS t(wh_id, wlat, wlon)),
    d AS (SELECT c.c_custkey, w.wh_id,
            round(2.0 * 6371.0088 * asin(sqrt(
              pow(sin((w.wlat - c.lat) / 2), 2)
              + cos(c.lat) * cos(w.wlat)
                * pow(sin((w.wlon - c.lon) / 2), 2))), 6) AS km
          FROM c CROSS JOIN w),
    nearest AS (SELECT c_custkey, wh_id, km FROM (
                  SELECT *, row_number() OVER (PARTITION BY c_custkey
                           ORDER BY km, wh_id) AS rn
                  FROM d) t WHERE rn = 1)
    SELECT CAST(wh_id AS BIGINT) AS wh_id,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(avg(km), 2) AS mean_km,
           round(min(km), 2) AS min_km,
           round(max(km), 2) AS max_km
    FROM nearest GROUP BY wh_id ORDER BY wh_id
    """,
)
def scalar_haversine_assignment(spark, sf_dir):
    """Great-circle nearest-warehouse assignment: synthetic customer
    coordinates (key-derived, global coverage), haversine distance to
    five real-city warehouse sites, each customer assigned to its
    nearest (distance ROUNDED to 6 before the argmin so the
    assignment is ulp-stable across libm implementations), then a
    per-warehouse catchment profile — the geo-partitioning primitive
    (fulfillment routing, shard-by-region, GDPR data residency)
    entirely in engine-native trigonometry. The warehouse frame is a
    broadcast 5-row literal; the distance matrix is 5x the customer
    scan, a bounded constant fan-out, and the argmin is one window
    over it."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.radians(
            (F.col("c_custkey") * 37 % 18000) / 100.0 - 90.0
        ).alias("lat"),
        F.radians(
            (F.col("c_custkey") * 73 % 36000) / 100.0 - 180.0
        ).alias("lon"),
    )
    wh = spark.createDataFrame(
        [
            (1, 40.7128, -74.0060),
            (2, 51.5074, -0.1278),
            (3, 35.6762, 139.6503),
            (4, -33.8688, 151.2093),
            (5, 1.3521, 103.8198),
        ],
        "wh_id int, wlat_deg double, wlon_deg double",
    ).select(
        "wh_id",
        F.radians("wlat_deg").alias("wlat"),
        F.radians("wlon_deg").alias("wlon"),
    )
    km = F.round(
        F.lit(2.0)
        * 6371.0088
        * F.asin(
            F.sqrt(
                F.pow(F.sin((F.col("wlat") - F.col("lat")) / 2), 2)
                + F.cos("lat")
                * F.cos("wlat")
                * F.pow(F.sin((F.col("wlon") - F.col("lon")) / 2), 2)
            )
        ),
        6,
    )
    d = c.join(F.broadcast(wh)).select(
        "c_custkey", "wh_id", km.alias("km")
    )
    wr = Window.partitionBy("c_custkey").orderBy("km", "wh_id")
    nearest = (
        d.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
    )
    return (
        nearest.groupBy("wh_id")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("km"), 2).alias("mean_km"),
            F.round(F.min("km"), 2).alias("min_km"),
            F.round(F.max("km"), 2).alias("max_km"),
        )
        .select(
            F.col("wh_id").cast("long").alias("wh_id"),
            F.col("n_customers").cast("long").alias("n_customers"),
            "mean_km",
            "min_km",
            "max_km",
        )
        .orderBy("wh_id")
    )


# ---------------------------------------------------------------------------
# Round-7 wave 163: day-of-week x month revenue uplift matrix
# ---------------------------------------------------------------------------


@_q(
    "orders_dow_month_uplift",
    """
    WITH o AS (SELECT dayofweek(CAST(o_orderdate AS DATE)) AS dow0,
                      month(CAST(o_orderdate AS DATE)) AS mon,
                      o_totalprice AS rev
               FROM orders),
    cell AS (SELECT dow0, mon, sum(rev) AS r FROM o GROUP BY 1, 2),
    rt AS (SELECT dow0, sum(r) AS rr FROM cell GROUP BY dow0),
    ct AS (SELECT mon, sum(r) AS cc FROM cell GROUP BY mon),
    t AS (SELECT sum(r) AS tot FROM cell)
    SELECT CAST(cell.dow0 AS BIGINT) AS dow,
           CAST(cell.mon AS BIGINT) AS mon,
           round(cell.r, 2) AS revenue,
           round(cell.r / (rt.rr * ct.cc / t.tot), 4) AS uplift
    FROM cell JOIN rt USING (dow0) JOIN ct USING (mon) CROSS JOIN t
    ORDER BY dow, mon
    """,
)
def orders_dow_month_uplift(spark, sf_dir):
    """Calendar heatmap with a statistical normalization: revenue per
    (day-of-week, month) cell divided by its expectation under
    independence (row_total*col_total/grand_total) — uplift > 1 marks
    cells genuinely hotter than their weekday AND month explain alone,
    the reading a raw heatmap can't give (a loud Monday in a loud
    month is NOT a signal). The chi-square entry tests the whole
    table; this returns the per-cell ratios a planner acts on.
    Weekday numbering normalized via the shared DATE cast (DuckDB
    Sun=0, Spark Sun=1 — aligned by subtracting 1 on the Spark side).
    One conditional aggregate, broadcast marginals."""
    o = _t(spark, sf_dir, "orders").select(
        (F.dayofweek(F.col("o_orderdate").cast("date")) - 1).alias(
            "dow0"
        ),
        F.month(F.col("o_orderdate").cast("date")).alias("mon"),
        F.col("o_totalprice").alias("rev"),
    )
    cell = o.groupBy("dow0", "mon").agg(F.sum("rev").alias("r"))
    rt = cell.groupBy("dow0").agg(F.sum("r").alias("rr"))
    ct = cell.groupBy("mon").agg(F.sum("r").alias("cc"))
    t = cell.agg(F.sum("r").alias("tot"))
    return (
        cell.join(F.broadcast(rt), "dow0")
        .join(F.broadcast(ct), "mon")
        .join(F.broadcast(t))
        .select(
            F.col("dow0").cast("long").alias("dow"),
            F.col("mon").cast("long").alias("mon"),
            F.round(F.col("r"), 2).alias("revenue"),
            F.round(
                F.col("r")
                / (F.col("rr") * F.col("cc") / F.col("tot")),
                4,
            ).alias("uplift"),
        )
        .orderBy("dow", "mon")
    )


# ---------------------------------------------------------------------------
# Round-7 wave 164: importance-weight effective sample size
# ---------------------------------------------------------------------------


@_q(
    "corpus_importance_ess",
    f"""
    WITH dsir AS (
      WITH toks AS (SELECT doc_id, source, {_WORDS} AS w FROM documents),
      grams AS (SELECT doc_id, source,
                       list_transform(range(1, len(w)),
                                      i -> concat(w[i], ' ', w[i + 1])) AS gs
                FROM toks WHERE len(w) >= 2),
      feats AS (SELECT doc_id, source,
                       {_H64.format(expr="unnest(gs)")} % 1024 AS bucket
                FROM grams),
      raw_c AS (SELECT bucket, count(*) AS c_raw FROM feats
                WHERE source <> '{_DECON_BENCH}' GROUP BY bucket),
      tgt_c AS (SELECT bucket, count(*) AS c_tgt FROM feats
                WHERE source = '{_DECON_BENCH}' GROUP BY bucket),
      n_r AS (SELECT sum(c_raw) AS n_raw FROM raw_c),
      n_t AS (SELECT sum(c_tgt) AS n_tgt FROM tgt_c),
      model AS (
        SELECT coalesce(raw_c.bucket, tgt_c.bucket) AS bucket,
               ln(((coalesce(c_tgt, 0) + 1.0) / (n_tgt + 1.0 * 1024))
                  / ((coalesce(c_raw, 0) + 1.0) / (n_raw + 1.0 * 1024)))
                 AS lr
        FROM raw_c FULL OUTER JOIN tgt_c
          ON raw_c.bucket = tgt_c.bucket, n_r, n_t),
      sc AS (SELECT f.doc_id, round(sum(lr), 6) AS lw
             FROM feats f JOIN model USING (bucket)
             WHERE f.source <> '{_DECON_BENCH}'
             GROUP BY f.doc_id)
      SELECT d.doc_id, d.source, coalesce(sc.lw, 0.0) AS lw
      FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
      WHERE d.source <> '{_DECON_BENCH}'),
    mx AS (SELECT source, max(lw) AS mlw FROM dsir GROUP BY source),
    w AS (SELECT dsir.source, exp(lw - mlw) AS w
          FROM dsir JOIN mx ON dsir.source = mx.source)
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           round(pow(sum(w), 2) / sum(w * w), 4) AS ess,
           round(pow(sum(w), 2) / sum(w * w) / count(*), 6) AS ess_frac,
           round(max(w) / sum(w), 6) AS top_weight_share
    FROM w GROUP BY source ORDER BY source
    """,
)
def corpus_importance_ess(spark, sf_dir):
    """Effective sample size of the DSIR importance weights, per
    source: ESS = (sum w)^2 / sum w^2 with per-source max-log-shift
    normalization (the softmax overflow discipline) — the diagnostic
    that tells a curator whether importance resampling will actually
    work (ESS/n near 1: weights are flat, reweighting is a no-op; ESS
    tiny or one document holding most of the weight mass: the target
    is matched by a handful of docs and resampling collapses onto
    them). Composes the SAME hashed-bigram log-ratio model
    corpus_dsir_weights pins; everything after the per-doc log-weight
    is two bounded per-source aggregates."""
    from boann_ocsf_security_data_platform_spark.operators.text import (
        dsir_importance,
    )

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("source") != _DECON_BENCH)
    target = docs.filter(F.col("source") == _DECON_BENCH)
    # `source` rides dsir's OWN doc-grain join (carry_cols): re-joining
    # the corpus here fused a second same-key SMJ + corpus scan into the
    # scoring pipeline (round-12 sorter-pipeline scan: 5 sorters in one
    # region at sf10). `d` also feeds BOTH the per-source max branch and
    # the weight branch: unpersisted, the broadcast side recomputed the
    # ENTIRE hashed-bigram DSIR pipeline — pin it above the docs gate,
    # the parts_abc_xyz branch-recompute discipline.
    doc_pin = _gates.pin_shuffle_join(_table_count(spark, sf_dir, "documents"))
    d = dsir_importance(
        corpus, target, pin_shuffle_join=doc_pin, carry_cols=("source",)
    ).select(
        "doc_id",
        "source",
        F.coalesce("dsir_logweight", F.lit(0.0)).alias("lw"),
    ).persist(
        StorageLevel.DISK_ONLY if doc_pin else StorageLevel.MEMORY_AND_DISK_DESER
    )
    mx = d.groupBy("source").agg(F.max("lw").alias("mlw"))
    w = d.join(F.broadcast(mx), "source").select(
        "source", F.exp(F.col("lw") - F.col("mlw")).alias("w")
    )
    return (
        w.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.pow(F.sum("w"), 2) / F.sum(F.col("w") * F.col("w")),
                4,
            ).alias("ess"),
            F.round(
                F.pow(F.sum("w"), 2)
                / F.sum(F.col("w") * F.col("w"))
                / F.count(F.lit(1)),
                6,
            ).alias("ess_frac"),
            F.round(F.max("w") / F.sum("w"), 6).alias(
                "top_weight_share"
            ),
        )
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            "ess",
            "ess_frac",
            "top_weight_share",
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Round-7 wave 165: two-hop reach profile (friend-of-friend)
# ---------------------------------------------------------------------------


@_q(
    "graph_two_hop_reach",
    """
    WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                FROM lineitem WHERE year(l_shipdate) = 1995),
    e0 AS (SELECT a.pk AS u, b.pk AS v FROM li a
           JOIN li b ON a.ok = b.ok AND a.pk < b.pk
           GROUP BY a.pk, b.pk),
    e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
    two AS (SELECT e1.u AS node, e2.v AS w
            FROM e e1 JOIN e e2 ON e1.v = e2.u
            WHERE e2.v <> e1.u
            GROUP BY e1.u, e2.v),
    deg AS (SELECT u AS node, count(*) AS deg1 FROM e GROUP BY u),
    reach AS (SELECT two.node,
                     count(*) AS n2_incl,
                     any_value(deg.deg1) AS deg1
              FROM two JOIN deg USING (node) GROUP BY two.node),
    prof AS (SELECT node, deg1,
                    n2_incl - deg1 AS reach2
             FROM reach),
    b AS (SELECT least(9, CAST(floor(reach2 / 50.0) AS BIGINT)) AS bin,
                 reach2, deg1
          FROM prof)
    SELECT CAST(bin AS BIGINT) AS reach_bin,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(min(reach2) AS BIGINT) AS min_reach2,
           CAST(max(reach2) AS BIGINT) AS max_reach2,
           round(avg(CAST(reach2 AS DOUBLE) / deg1), 4)
             AS mean_expansion
    FROM b GROUP BY bin ORDER BY reach_bin
    """,
)
def graph_two_hop_reach(spark, sf_dir):
    """Two-hop reach profile of the 1995 part-co-order graph: for each
    node, the number of DISTINCT nodes exactly-or-within two hops
    (minus its direct neighbors — the pure friend-of-friend frontier),
    histogrammed, with the mean expansion ratio reach2/deg per bucket
    — the growth-rate fingerprint that separates an expander-like
    graph (ratio >> 1, gossip spreads fast) from a clustered one
    (ratio ~ 1, triangles eat the frontier; cross-reads
    graph_clustering_coefficient). The wedge join is the SAME bounded
    e1.v = e2.u equi-join shape as the triangle machinery with
    DISTINCT endpoints per node — never all-pairs; set semantics make
    the count exact. Reach2 counts 2-hop-reachable nodes that may also
    be direct neighbors (frontier overlap retained on both engines
    identically)."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.year("l_shipdate") == 1995)
        .select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
        )
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    e0 = (
        a.join(
            b,
            (F.col("a.ok") == F.col("b.ok"))
            & (F.col("a.pk") < F.col("b.pk")),
        )
        .groupBy(F.col("a.pk").alias("u"), F.col("b.pk").alias("v"))
        .agg(F.lit(1).alias("_one"))
        .select("u", "v")
    )
    e = e0.union(e0.select(F.col("v").alias("u"), F.col("u").alias("v")))
    e1, e2 = e.alias("e1"), e.alias("e2")
    two = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .where(F.col("e2.v") != F.col("e1.u"))
        .groupBy(F.col("e1.u").alias("node"), F.col("e2.v").alias("w"))
        .agg(F.lit(1).alias("_one"))
        .select("node", "w")
    )
    deg = e.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).alias("deg1")
    )
    reach = (
        two.groupBy("node")
        .agg(F.count(F.lit(1)).alias("n2_incl"))
        .join(deg, "node")
        .select(
            "node",
            "deg1",
            (F.col("n2_incl") - F.col("deg1")).alias("reach2"),
        )
    )
    bb = reach.select(
        F.least(
            F.lit(9), F.floor(F.col("reach2") / 50.0)
        ).alias("bin"),
        "reach2",
        "deg1",
    )
    return (
        bb.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("reach2").alias("min_reach2"),
            F.max("reach2").alias("max_reach2"),
            F.round(
                F.avg(F.col("reach2").cast("double") / F.col("deg1")), 4
            ).alias("mean_expansion"),
        )
        .select(
            F.col("bin").cast("long").alias("reach_bin"),
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.col("min_reach2").cast("long").alias("min_reach2"),
            F.col("max_reach2").cast("long").alias("max_reach2"),
            "mean_expansion",
        )
        .orderBy("reach_bin")
    )


# ---------------------------------------------------------------------------
# Round-7 wave 166: two-proportion power analysis (MDE + required n)
# ---------------------------------------------------------------------------


@_q(
    "agg_power_analysis",
    """
    WITH s AS (SELECT
                 CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*) AS p0,
                 count(*) AS n
               FROM lineitem),
    mde AS (SELECT unnest([0.001, 0.002, 0.005, 0.01]) AS delta),
    calc AS (SELECT delta, p0, n,
               2.0 * pow(1.959964 + 0.841621, 2)
                 * (p0 * (1 - p0) + (p0 + delta) * (1 - p0 - delta)) / 2.0
                 / (delta * delta) AS n_required
             FROM mde CROSS JOIN s)
    SELECT round(delta, 3) AS mde_abs,
           round(p0, 6) AS baseline_rate,
           CAST(ceil(n_required) AS BIGINT) AS n_required_per_arm,
           CAST(n AS BIGINT) AS n_available,
           n >= 2 * n_required AS powered_today
    FROM calc ORDER BY mde_abs
    """,
)
def agg_power_analysis(spark, sf_dir):
    """Two-proportion power analysis at 80% power / 5% two-sided
    alpha: for a grid of minimum detectable effects on the observed
    return rate, the required per-arm sample size n = 2(z_a + z_b)^2 *
    p-bar(1-p-bar)/delta^2 and whether TODAY'S data volume could power
    the test — the experiment-design primitive that belongs in front
    of agg_two_proportion_ztest (run the test only when this row says
    you can). The baseline rate is one conditional aggregate; the MDE
    grid is a 4-literal broadcast; everything else is scalar closed
    form (z constants inlined, same literals both engines)."""
    l = _t(spark, sf_dir, "lineitem")
    s = l.agg(
        (
            F.sum(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).cast("double")
            / F.count(F.lit(1))
        ).alias("p0"),
        F.count(F.lit(1)).alias("n"),
    )
    mde = spark.createDataFrame(
        [(0.001,), (0.002,), (0.005,), (0.01,)], "delta double"
    )
    p0, delta = F.col("p0"), F.col("delta")
    n_req = (
        F.lit(2.0)
        * F.pow(F.lit(1.959964 + 0.841621), 2)
        * (p0 * (1 - p0) + (p0 + delta) * (1 - p0 - delta))
        / 2.0
        / (delta * delta)
    )
    return (
        F.broadcast(mde)
        .join(F.broadcast(s))
        .select(
            F.round(delta, 3).alias("mde_abs"),
            F.round(p0, 6).alias("baseline_rate"),
            F.ceil(n_req).cast("long").alias("n_required_per_arm"),
            F.col("n").cast("long").alias("n_available"),
            (F.col("n") >= 2 * n_req).alias("powered_today"),
        )
        .orderBy("mde_abs")
    )


# ---------------------------------------------------------------------------
# Round-7 wave 167: turning-points randomness test
# ---------------------------------------------------------------------------


@_q(
    "events_turning_points_test",
    """
    WITH d AS (SELECT CAST(ts AS DATE) AS day, count(*) AS cnt
               FROM events GROUP BY 1),
    l AS (SELECT CAST(cnt AS DOUBLE) AS x,
                 lag(cnt) OVER (ORDER BY day) AS p,
                 lead(cnt) OVER (ORDER BY day) AS nx
          FROM d),
    t AS (SELECT count(*) AS n,
                 sum(CASE WHEN p IS NOT NULL AND nx IS NOT NULL
                          AND (x - p) * (nx - x) < 0
                          THEN 1 ELSE 0 END) AS tp
          FROM l),
    z AS (SELECT n, tp,
                 2.0 * (n - 2) / 3.0 AS mu,
                 sqrt((16.0 * n - 29.0) / 90.0) AS sigma
          FROM t)
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(tp AS BIGINT) AS n_turning_points,
           round(mu, 2) AS expected,
           round((tp - mu) / sigma, 4) AS zscore,
           abs((tp - mu) / sigma) > 1.96 AS reject_randomness
    FROM z
    """,
)
def events_turning_points_test(spark, sf_dir):
    """Turning-points test of the daily event-count series: count
    strict local extrema ((x_t - x_(t-1))(x_(t+1) - x_t) < 0; an iid
    series has E[T] = 2(n-2)/3 exactly, Var = (16n-29)/90), z-scored —
    the randomness screen that catches SMOOTHNESS (too few turning
    points = trend/autocorrelation) where the runs test catches
    level-asymmetry; third member of the randomness family with
    agg_runs_test_randomness and events_pacf. Equal-neighbor ties
    yield a zero product and are non-turning on both engines. One
    bounded daily collapse, one lag/lead window, scalar closed form."""
    e = _t(spark, sf_dir, "events")
    d = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.orderBy("day")
    l = d.select(
        F.col("cnt").cast("double").alias("x"),
        F.lag("cnt").over(w).alias("p"),
        F.lead("cnt").over(w).alias("nx"),
    )
    t = l.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(
                F.col("p").isNotNull()
                & F.col("nx").isNotNull()
                & (
                    (F.col("x") - F.col("p"))
                    * (F.col("nx") - F.col("x"))
                    < 0
                ),
                1,
            ).otherwise(0)
        ).alias("tp"),
    )
    n = F.col("n").cast("double")
    mu = F.lit(2.0) * (n - 2) / 3.0
    sigma = F.sqrt((F.lit(16.0) * n - 29.0) / 90.0)
    z = (F.col("tp") - mu) / sigma
    return t.select(
        F.col("n").cast("long").alias("n_days"),
        F.col("tp").cast("long").alias("n_turning_points"),
        F.round(mu, 2).alias("expected"),
        F.round(z, 4).alias("zscore"),
        (F.abs(z) > 1.96).alias("reject_randomness"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 168: month-over-month GMV growth decomposition
# ---------------------------------------------------------------------------


@_q(
    "orders_gmv_decomposition",
    """
    WITH m AS (SELECT year(CAST(o_orderdate AS DATE)) * 100
                      + month(CAST(o_orderdate AS DATE)) AS yyyymm,
                      CAST(round(sum(o_totalprice) * 100, 0) AS BIGINT)
                        AS rev_c,
                      count(*) AS n
               FROM orders GROUP BY 1),
    l AS (SELECT yyyymm, rev_c, n,
                 rev_c / CAST(n AS DOUBLE) AS aov_c,
                 lag(rev_c) OVER (ORDER BY yyyymm) AS prev_c,
                 lag(n) OVER (ORDER BY yyyymm) AS pn,
                 lag(rev_c / CAST(n AS DOUBLE))
                   OVER (ORDER BY yyyymm) AS paov_c
          FROM m)
    SELECT CAST(yyyymm AS BIGINT) AS yyyymm,
           rev_c / 100.0 AS revenue,
           (rev_c - prev_c) / 100.0 AS delta_rev,
           CAST(floor((n - pn) * paov_c + 0.5) AS BIGINT) / 100.0
             AS volume_effect,
           CAST(floor(pn * (aov_c - paov_c) + 0.5) AS BIGINT) / 100.0
             AS aov_effect,
           CAST(floor((n - pn) * (aov_c - paov_c) + 0.5) AS BIGINT)
             / 100.0 AS mix_effect
    FROM l WHERE prev_c IS NOT NULL
    ORDER BY yyyymm
    """,
)
def orders_gmv_decomposition(spark, sf_dir):
    """Month-over-month GMV growth accounting: delta revenue split
    EXACTLY into a volume effect (order-count change at last month's
    AOV), an AOV effect (price change at last month's volume), and
    the interaction term — delta = dN*AOV0 + N0*dAOV + dN*dAOV holds
    as an identity, so the three columns always reconcile to
    delta_rev (the property the invariant test pins). The 'did we
    grow because of MORE orders or BIGGER orders' decomposition every
    revenue review starts with. One scan to the bounded monthly
    domain, one lag window, arithmetic after."""
    o = _t(spark, sf_dir, "orders")
    m = o.groupBy(
        (
            F.year(F.col("o_orderdate").cast("date")) * 100
            + F.month(F.col("o_orderdate").cast("date"))
        ).alias("yyyymm")
    ).agg(
        F.round(F.sum("o_totalprice") * 100, 0)
        .cast("long")
        .alias("rev_c"),
        F.count(F.lit(1)).alias("n"),
    )
    w = Window.orderBy("yyyymm")
    aov_c = F.col("rev_c") / F.col("n").cast("double")
    l = m.select(
        "yyyymm",
        "rev_c",
        "n",
        aov_c.alias("aov_c"),
        F.lag("rev_c").over(w).alias("prev_c"),
        F.lag("n").over(w).alias("pn"),
        F.lag(aov_c).over(w).alias("paov_c"),
    ).filter(F.col("prev_c").isNotNull())
    return l.select(
        F.col("yyyymm").cast("long").alias("yyyymm"),
        (F.col("rev_c") / 100.0).alias("revenue"),
        ((F.col("rev_c") - F.col("prev_c")) / 100.0).alias("delta_rev"),
        (
            F.floor(
                (F.col("n") - F.col("pn")) * F.col("paov_c") + 0.5
            ).cast("long")
            / 100.0
        ).alias("volume_effect"),
        (
            F.floor(
                F.col("pn") * (F.col("aov_c") - F.col("paov_c")) + 0.5
            ).cast("long")
            / 100.0
        ).alias("aov_effect"),
        (
            F.floor(
                (F.col("n") - F.col("pn"))
                * (F.col("aov_c") - F.col("paov_c"))
                + 0.5
            ).cast("long")
            / 100.0
        ).alias("mix_effect"),
    ).orderBy("yyyymm")


# ---------------------------------------------------------------------------
# Round-7 wave 169: Mann-Kendall trend test
# ---------------------------------------------------------------------------


@_q(
    "events_mann_kendall_trend",
    """
    WITH d AS (SELECT CAST(ts AS DATE) AS day, count(*) AS cnt
               FROM events GROUP BY 1),
    p AS (SELECT CASE WHEN b.cnt > a.cnt THEN 1
                      WHEN b.cnt < a.cnt THEN -1 ELSE 0 END AS sg
          FROM d a JOIN d b ON a.day < b.day),
    s AS (SELECT sum(sg) AS s FROM p),
    n AS (SELECT count(*) AS n FROM d),
    ties AS (SELECT coalesce(sum(t * (t - 1) * (2 * t + 5)), 0)
               AS tie_term
             FROM (SELECT count(*) AS t FROM d GROUP BY cnt
                   HAVING count(*) > 1)),
    v AS (SELECT s, n,
                 (n * (n - 1.0) * (2 * n + 5) - tie_term) / 18.0
                   AS var_s
          FROM s CROSS JOIN n CROSS JOIN ties),
    z AS (SELECT s, n, var_s,
                 CASE WHEN s > 0 THEN (s - 1) / sqrt(var_s)
                      WHEN s < 0 THEN (s + 1) / sqrt(var_s)
                      ELSE 0.0 END AS z
          FROM v)
    SELECT CAST(n AS BIGINT) AS n_days, CAST(s AS BIGINT) AS s_stat,
           round(z, 4) AS zscore,
           CASE WHEN z > 1.96 THEN 'increasing'
                WHEN z < -1.96 THEN 'decreasing'
                ELSE 'no-trend' END AS trend
    FROM z
    """,
)
def events_mann_kendall_trend(spark, sf_dir):
    """Mann-Kendall monotone-trend test on the daily event-count
    series: S = sum of sign(x_j - x_i) over all day pairs i<j, tie-
    corrected variance (n(n-1)(2n+5) - sum t(t-1)(2t+5))/18 and the
    continuity-corrected z — the nonparametric is-the-load-trending
    test that pairs with agg_theil_sen_trend (Theil-Sen gives the
    slope; MK gives its significance, the standard combo in
    environmental/capacity monitoring). The pair join is over the
    BOUNDED daily domain (days^2/2 integer sign comparisons, all
    map-side), never raw events; the statistic is exact integer
    arithmetic until the final z."""
    e = _t(spark, sf_dir, "events")
    d = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    a, b = d.alias("a"), d.alias("b")
    s = (
        a.join(b, F.col("a.day") < F.col("b.day"))
        .select(
            F.when(F.col("b.cnt") > F.col("a.cnt"), 1)
            .when(F.col("b.cnt") < F.col("a.cnt"), -1)
            .otherwise(0)
            .alias("sg")
        )
        .agg(F.sum("sg").alias("s"))
    )
    n = d.agg(F.count(F.lit(1)).alias("n"))
    ties = (
        d.groupBy("cnt")
        .agg(F.count(F.lit(1)).alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            ).alias("tie_term")
        )
    )
    v = s.join(F.broadcast(n)).join(F.broadcast(ties))
    nn = F.col("n").cast("double")
    var_s = (nn * (nn - 1) * (2 * nn + 5) - F.col("tie_term")) / 18.0
    z = (
        F.when(F.col("s") > 0, (F.col("s") - 1) / F.sqrt(var_s))
        .when(F.col("s") < 0, (F.col("s") + 1) / F.sqrt(var_s))
        .otherwise(F.lit(0.0))
    )
    return v.select(
        F.col("n").cast("long").alias("n_days"),
        F.col("s").cast("long").alias("s_stat"),
        F.round(z, 4).alias("zscore"),
        F.when(z > 1.96, "increasing")
        .when(z < -1.96, "decreasing")
        .otherwise("no-trend")
        .alias("trend"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 170: binary-segmentation changepoints (depth 2)
# ---------------------------------------------------------------------------


@_q(
    "events_binary_segmentation",
    """
    WITH d AS (SELECT CAST(ts AS DATE) AS day,
                      CAST(count(*) AS DOUBLE) AS x
               FROM events GROUP BY 1),
    ix AS (SELECT day, x,
                  row_number() OVER (ORDER BY day) - 1 AS t
           FROM d),
    st AS (SELECT count(*) AS n, avg(x) AS mu FROM ix),
    c1 AS (SELECT t, day,
                  abs(sum(x) OVER (ORDER BY t) - (t + 1) * st.mu) AS c,
                  st.n
           FROM ix CROSS JOIN st),
    k1 AS (SELECT t AS kt, day AS kday, c FROM c1
           WHERE t < n - 1
           ORDER BY round(c, 6) DESC, t LIMIT 1),
    seg AS (SELECT ix.day, ix.x, ix.t,
                   CASE WHEN ix.t <= k1.kt THEN 'left'
                        ELSE 'right' END AS seg
            FROM ix CROSS JOIN k1),
    sst AS (SELECT seg, count(*) AS sn, avg(x) AS smu
            FROM seg GROUP BY seg),
    sidx AS (SELECT seg.seg, seg.day, seg.x,
                    row_number() OVER (PARTITION BY seg.seg
                                       ORDER BY seg.t) - 1 AS u
             FROM seg),
    c2 AS (SELECT s.seg, s.day, s.u, sst.sn,
                  abs(sum(s.x) OVER (PARTITION BY s.seg ORDER BY s.u)
                      - (s.u + 1) * sst.smu) AS c
           FROM sidx s JOIN sst ON s.seg = sst.seg),
    k2 AS (SELECT seg, day, c FROM (
             SELECT seg, day, c,
                    row_number() OVER (PARTITION BY seg
                      ORDER BY round(c, 6) DESC, u) AS rn
             FROM c2 WHERE u < sn - 1) t
           WHERE rn = 1)
    SELECT * FROM (
      SELECT 1 AS level, 'full' AS segment,
             CAST(kday AS VARCHAR) AS split_day,
             round(c, 4) AS cusum_stat
      FROM k1
      UNION ALL
      SELECT 2, seg, CAST(day AS VARCHAR), round(c, 4) FROM k2)
    ORDER BY level, segment
    """,
)
def events_binary_segmentation(spark, sf_dir):
    """Depth-2 binary segmentation of the daily event-count series:
    the level-1 changepoint maximizes the CUSUM deviation
    |prefix_sum - (t+1)*mean| over the whole series, then each half is
    re-segmented against its OWN mean — the classic recursive
    changepoint scheme (Scott & Knott) that finds a change HIERARCHY
    where events_cusum_changepoint stops at one shift. Argmaxes
    compare ROUNDED-to-6 statistics with index tie-break, so the
    recursion path is ulp-stable across engines (the mRMR greedy
    discipline). All three levels are windows over the bounded daily
    domain; the level-1 cut rides a broadcast one-row frame into the
    segment pass."""
    e = _t(spark, sf_dir, "events")
    d = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("double").alias("x")
    )
    wt = Window.orderBy("day")
    ix = d.select(
        "day", "x", (F.row_number().over(wt) - 1).alias("t")
    )
    st = ix.agg(F.count(F.lit(1)).alias("n"), F.avg("x").alias("mu"))
    wcum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    c1 = ix.join(F.broadcast(st)).select(
        "t",
        "day",
        F.abs(
            F.sum("x").over(wcum) - (F.col("t") + 1) * F.col("mu")
        ).alias("c"),
        "n",
    )
    k1 = (
        c1.filter(F.col("t") < F.col("n") - 1)
        .orderBy(F.round(F.col("c"), 6).desc(), "t")
        .limit(1)
        .select(
            F.col("t").alias("kt"),
            F.col("day").alias("kday"),
            F.col("c").alias("kc"),
        )
    )
    seg = ix.join(F.broadcast(k1)).select(
        "day",
        "x",
        "t",
        F.when(F.col("t") <= F.col("kt"), "left")
        .otherwise("right")
        .alias("seg"),
    )
    sst = seg.groupBy("seg").agg(
        F.count(F.lit(1)).alias("sn"), F.avg("x").alias("smu")
    )
    wu = Window.partitionBy("seg").orderBy("t")
    sidx = seg.select(
        "seg", "day", "x", (F.row_number().over(wu) - 1).alias("u")
    )
    wcum2 = Window.partitionBy("seg").orderBy("u").rowsBetween(
        Window.unboundedPreceding, 0
    )
    c2 = sidx.join(F.broadcast(sst), "seg").select(
        "seg",
        "day",
        "u",
        "sn",
        F.abs(
            F.sum("x").over(wcum2) - (F.col("u") + 1) * F.col("smu")
        ).alias("c"),
    )
    wr = Window.partitionBy("seg").orderBy(
        F.round(F.col("c"), 6).desc(), "u"
    )
    k2 = (
        c2.filter(F.col("u") < F.col("sn") - 1)
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select("seg", "day", "c")
    )
    top = k1.select(
        F.lit(1).alias("level"),
        F.lit("full").alias("segment"),
        F.col("kday").cast("string").alias("split_day"),
        F.round(F.col("kc"), 4).alias("cusum_stat"),
    )
    lower = k2.select(
        F.lit(2).alias("level"),
        F.col("seg").alias("segment"),
        F.col("day").cast("string").alias("split_day"),
        F.round(F.col("c"), 4).alias("cusum_stat"),
    )
    return top.unionAll(lower).orderBy("level", "segment")


# ---------------------------------------------------------------------------
# Round-7 wave 171: rich-club coefficient
# ---------------------------------------------------------------------------


@_q(
    "graph_rich_club",
    """
    WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                FROM lineitem WHERE year(l_shipdate) = 1995),
    e AS (SELECT a.pk AS u, b.pk AS v FROM li a
          JOIN li b ON a.ok = b.ok AND a.pk < b.pk
          GROUP BY a.pk, b.pk),
    deg AS (SELECT node, count(*) AS deg FROM
              (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
            GROUP BY node),
    kk AS (SELECT unnest([2, 4, 8]) AS k),
    club AS (SELECT kk.k, d.node FROM deg d CROSS JOIN kk
             WHERE d.deg >= kk.k),
    cn AS (SELECT k, count(*) AS nk FROM club GROUP BY k),
    ce AS (SELECT c1.k, count(*) AS ek
           FROM e JOIN club c1 ON e.u = c1.node
                 JOIN club c2 ON e.v = c2.node AND c1.k = c2.k
           GROUP BY c1.k),
    tot AS (SELECT (SELECT count(*) FROM deg) AS n,
                   (SELECT count(*) FROM e) AS m)
    SELECT CAST(cn.k AS BIGINT) AS degree_min,
           CAST(cn.nk AS BIGINT) AS club_size,
           CAST(coalesce(ce.ek, 0) AS BIGINT) AS club_edges,
           round(CASE WHEN cn.nk >= 2 THEN
                   2.0 * coalesce(ce.ek, 0) / (cn.nk * (cn.nk - 1.0))
                 END, 6) AS club_density,
           round(2.0 * tot.m / (tot.n * (tot.n - 1.0)), 6)
             AS graph_density,
           round(CASE WHEN cn.nk >= 2 THEN
                   (2.0 * coalesce(ce.ek, 0) / (cn.nk * (cn.nk - 1.0)))
                   / (2.0 * tot.m / (tot.n * (tot.n - 1.0)))
                 END, 4) AS rich_club_ratio
    FROM cn LEFT JOIN ce ON cn.k = ce.k CROSS JOIN tot
    ORDER BY degree_min
    """,
)
def graph_rich_club(spark, sf_dir):
    """Rich-club coefficient of the 1995 part-co-order graph at three
    degree thresholds (2/4/8 — chosen so every test SF has non-empty
    clubs): the edge density among nodes of degree >= k,
    normalized by the whole graph's density — ratio >> 1 means hubs
    preferentially interconnect (a rich club), the structural property
    behind 'popular parts co-sell with OTHER popular parts' and, in
    infrastructure graphs, cascading-hub-failure risk. Clubs are
    degree-table filters (bounded); club edges come from two equi-
    joins of the edge list against the club membership — never a
    pairwise enumeration."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.year("l_shipdate") == 1995)
        .select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
        )
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.ok") == F.col("b.ok"))
            & (F.col("a.pk") < F.col("b.pk")),
        )
        .groupBy(F.col("a.pk").alias("u"), F.col("b.pk").alias("v"))
        .agg(F.lit(1).alias("_one"))
        .select("u", "v")
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    kk = spark.createDataFrame([(2,), (4,), (8,)], "k int")
    club = deg.join(F.broadcast(kk)).filter(
        F.col("deg") >= F.col("k")
    ).select("k", "node")
    cn = club.groupBy("k").agg(F.count(F.lit(1)).alias("nk"))
    c1, c2 = club.alias("c1"), club.alias("c2")
    ce = (
        e.join(c1, e.u == F.col("c1.node"))
        .join(
            c2,
            (e.v == F.col("c2.node")) & (F.col("c1.k") == F.col("c2.k")),
        )
        .groupBy(F.col("c1.k").alias("k"))
        .agg(F.count(F.lit(1)).alias("ek"))
    )
    tot = deg.agg(F.count(F.lit(1)).alias("n")).join(
        e.agg(F.count(F.lit(1)).alias("m"))
    )
    club_density = F.when(
        F.col("nk") >= 2,
        F.lit(2.0)
        * F.coalesce(F.col("ek"), F.lit(0))
        / (F.col("nk") * (F.col("nk") - F.lit(1.0))),
    )
    graph_density = (
        F.lit(2.0) * F.col("m") / (F.col("n") * (F.col("n") - F.lit(1.0)))
    )
    return (
        cn.join(ce, "k", "left")
        .join(F.broadcast(tot))
        .select(
            F.col("k").cast("long").alias("degree_min"),
            F.col("nk").cast("long").alias("club_size"),
            F.coalesce(F.col("ek"), F.lit(0))
            .cast("long")
            .alias("club_edges"),
            F.round(club_density, 6).alias("club_density"),
            F.round(graph_density, 6).alias("graph_density"),
            F.round(club_density / graph_density, 4).alias(
                "rich_club_ratio"
            ),
        )
        .orderBy("degree_min")
    )


# ---------------------------------------------------------------------------
# Round-7 wave 172: item-item cosine similarity (co-purchase CF)
# ---------------------------------------------------------------------------


@_q(
    "join_item_item_cosine",
    """
    WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                FROM lineitem WHERE year(l_shipdate) = 1995),
    deg AS (SELECT pk, count(*) AS n_orders FROM li GROUP BY pk),
    co AS (SELECT a.pk AS pa, b.pk AS pb, count(*) AS co_cnt
           FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
           GROUP BY 1, 2),
    sim AS (SELECT pa, pb, co_cnt,
                   round(co_cnt / sqrt(da.n_orders
                                       * CAST(db.n_orders AS DOUBLE)),
                         6) AS cosine
            FROM co JOIN deg da ON co.pa = da.pk
                    JOIN deg db ON co.pb = db.pk
            WHERE co_cnt >= 1)
    SELECT pa AS part_a, pb AS part_b,
           CAST(co_cnt AS BIGINT) AS co_orders, cosine
    FROM sim
    ORDER BY cosine DESC, part_a, part_b LIMIT 25
    """,
)
def join_item_item_cosine(spark, sf_dir):
    """Item-item collaborative-filtering similarity: cosine over the
    binary part-order incidence (co_count / sqrt(n_a * n_b)), top-25
    strongest pairs with at least 2 co-orders — the normalized
    'customers who bought X also bought Y' that corrects
    join_market_basket_rules' raw-lift bias toward rare pairs. The
    co-occurrence join is the order-key equi-join over the DISTINCT
    incidence list (bounded per-order fan-out), degrees broadcast in;
    the top-25 cut is a TakeOrdered on the ROUNDED cosine with full
    key tie-break (ulp-stable)."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.year("l_shipdate") == 1995)
        .select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
        )
        .distinct()
    )
    deg = li.groupBy("pk").agg(F.count(F.lit(1)).alias("n_orders"))
    a, b = li.alias("a"), li.alias("b")
    co = (
        a.join(
            b,
            (F.col("a.ok") == F.col("b.ok"))
            & (F.col("a.pk") < F.col("b.pk")),
        )
        .groupBy(F.col("a.pk").alias("pa"), F.col("b.pk").alias("pb"))
        .agg(F.count(F.lit(1)).alias("co_cnt"))
        .filter(F.col("co_cnt") >= 1)
    )
    da, db = deg.alias("da"), deg.alias("db")
    sim = (
        co.join(da, co.pa == F.col("da.pk"))
        .join(db, co.pb == F.col("db.pk"))
        .select(
            "pa",
            "pb",
            "co_cnt",
            F.round(
                F.col("co_cnt")
                / F.sqrt(
                    F.col("da.n_orders")
                    * F.col("db.n_orders").cast("double")
                ),
                6,
            ).alias("cosine"),
        )
    )
    return (
        sim.orderBy(F.col("cosine").desc(), "pa", "pb")
        .limit(25)
        .select(
            F.col("pa").alias("part_a"),
            F.col("pb").alias("part_b"),
            F.col("co_cnt").cast("long").alias("co_orders"),
            "cosine",
        )
    )


# ---------------------------------------------------------------------------
# Round-7 wave 173: event-mix entropy trend
# ---------------------------------------------------------------------------


@_q(
    "events_mix_entropy_trend",
    """
    WITH c AS (SELECT CAST(ts AS DATE) AS day, event_type,
                      count(*) AS n
               FROM events GROUP BY 1, 2),
    t AS (SELECT day, sum(n) AS tot FROM c GROUP BY day),
    h AS (SELECT c.day,
                 -sum((n / CAST(tot AS DOUBLE))
                      * ln(n / CAST(tot AS DOUBLE))) AS ent
          FROM c JOIN t USING (day) GROUP BY c.day),
    ix AS (SELECT ent,
                  CAST(day - (SELECT min(day) FROM h) AS DOUBLE) AS x
           FROM h),
    fit AS (SELECT count(*) AS n, avg(ent) AS mean_ent,
                   regr_slope(ent, x) AS slope,
                   corr(ent, x) AS r
            FROM ix)
    SELECT CAST(n AS BIGINT) AS n_days,
           round(mean_ent, 4) AS mean_entropy,
           round(slope * 365.0, 6) AS slope_per_year,
           round(r, 4) AS corr_with_time,
           abs(r) * sqrt((n - 2) / (1.0 - r * r)) > 1.96
             AS trend_significant
    FROM fit
    """,
)
def events_mix_entropy_trend(spark, sf_dir):
    """Is the event-type mix diversifying or concentrating over time?
    Shannon entropy of each day's type distribution, then the OLS
    slope of entropy against time (annualized) with the t-test on the
    correlation — the workload-diversity drift monitor (a falling
    entropy says one event type is taking over; rising says the mix is
    spreading — both change capacity and alerting assumptions before
    any single volume threshold fires). Two bounded hash aggregates to
    the per-day entropy table, one regression aggregate after."""
    e = _t(spark, sf_dir, "events")
    c = e.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("day").agg(F.sum("n").alias("tot"))
    h = (
        c.join(t, "day")
        .groupBy("day")
        .agg(
            (
                -F.sum(
                    (F.col("n") / F.col("tot").cast("double"))
                    * F.log(F.col("n") / F.col("tot").cast("double"))
                )
            ).alias("ent")
        )
    )
    m0 = h.agg(F.min("day").alias("d0"))
    ix = h.join(F.broadcast(m0)).select(
        "ent",
        F.datediff(F.col("day"), F.col("d0")).cast("double").alias("x"),
    )
    fit = ix.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("ent").alias("mean_ent"),
        F.regr_slope("ent", "x").alias("slope"),
        F.corr("ent", "x").alias("r"),
    )
    r, n = F.col("r"), F.col("n").cast("double")
    tstat = F.abs(r) * F.sqrt((n - 2) / (F.lit(1.0) - r * r))
    return fit.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(F.col("mean_ent"), 4).alias("mean_entropy"),
        F.round(F.col("slope") * 365.0, 6).alias("slope_per_year"),
        F.round(r, 4).alias("corr_with_time"),
        (tstat > 1.96).alias("trend_significant"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 174: Donchian channel breakout profile
# ---------------------------------------------------------------------------


@_q(
    "window_donchian_breakouts",
    """
    WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
                      CAST(round(sum(o_totalprice) * 100, 0) AS BIGINT)
                        AS rev_c
               FROM orders GROUP BY 1),
    ch AS (SELECT day, rev_c,
                  max(rev_c) OVER (ORDER BY day
                    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING) AS hi20,
                  min(rev_c) OVER (ORDER BY day
                    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING) AS lo20,
                  row_number() OVER (ORDER BY day) AS rn
           FROM d),
    f AS (SELECT year(day) AS yr,
                 CASE WHEN rev_c > hi20 THEN 1 ELSE 0 END AS up,
                 CASE WHEN rev_c < lo20 THEN 1 ELSE 0 END AS dn
          FROM ch WHERE rn > 20)
    SELECT CAST(yr AS BIGINT) AS yr,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(up) AS BIGINT) AS upside_breakouts,
           CAST(sum(dn) AS BIGINT) AS downside_breakouts,
           round(CAST(sum(up) + sum(dn) AS DOUBLE) / count(*), 4)
             AS breakout_rate
    FROM f GROUP BY yr ORDER BY yr
    """,
)
def window_donchian_breakouts(spark, sf_dir):
    """Donchian channel breakout profile of daily revenue: days where
    revenue exceeds the trailing 20-day high (or undercuts the low),
    counted per year — the channel-breakout regime detector that
    completes the technical family (Bollinger = variance envelope, RSI
    = momentum, drawdown = path risk; Donchian = range expansion, the
    volatility-regime trigger turtle systems used). Revenue is
    integer cents (the money discipline) so channel comparisons are
    exact integer predicates; the trailing extremes are one 20-row
    window over the bounded daily domain, warm-up excluded
    identically on both engines."""
    o = _t(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.round(F.sum("o_totalprice") * 100, 0)
        .cast("long")
        .alias("rev_c")
    )
    w = Window.orderBy("day").rowsBetween(-20, -1)
    wr = Window.orderBy("day")
    ch = d.select(
        "day",
        "rev_c",
        F.max("rev_c").over(w).alias("hi20"),
        F.min("rev_c").over(w).alias("lo20"),
        F.row_number().over(wr).alias("rn"),
    ).filter(F.col("rn") > 20)
    f = ch.select(
        F.year("day").alias("yr"),
        F.when(F.col("rev_c") > F.col("hi20"), 1).otherwise(0).alias("up"),
        F.when(F.col("rev_c") < F.col("lo20"), 1).otherwise(0).alias("dn"),
    )
    return (
        f.groupBy("yr")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("up").alias("upside_breakouts"),
            F.sum("dn").alias("downside_breakouts"),
            F.round(
                (F.sum("up") + F.sum("dn")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("breakout_rate"),
        )
        .select(
            F.col("yr").cast("long").alias("yr"),
            F.col("n_days").cast("long").alias("n_days"),
            F.col("upside_breakouts").cast("long").alias(
                "upside_breakouts"
            ),
            F.col("downside_breakouts").cast("long").alias(
                "downside_breakouts"
            ),
            "breakout_rate",
        )
        .orderBy("yr")
    )


# ---------------------------------------------------------------------------
# Round-7 wave 175: Jarque-Bera normality test from explicit moments
# ---------------------------------------------------------------------------


@_q(
    "agg_jarque_bera",
    """
    WITH d AS (SELECT CAST(ts AS DATE) AS day, count(*) AS cnt
               FROM events GROUP BY 1),
    x AS (SELECT CAST(cnt AS DOUBLE) AS v FROM d),
    m AS (SELECT count(*) AS n, avg(v) AS mu,
                 sum(v * v) / count(*) AS m2r
          FROM x),
    c AS (SELECT n,
                 sum(pow(v - mu, 2)) / n AS m2,
                 sum(pow(v - mu, 3)) / n AS m3,
                 sum(pow(v - mu, 4)) / n AS m4
          FROM x CROSS JOIN m GROUP BY n),
    jb AS (SELECT n,
                  m3 / pow(m2, 1.5) AS skew,
                  m4 / (m2 * m2) - 3.0 AS exkurt
           FROM c)
    SELECT CAST(n AS BIGINT) AS n_days,
           round(skew, 4) AS skewness,
           round(exkurt, 4) AS excess_kurtosis,
           round(n / 6.0 * (skew * skew + exkurt * exkurt / 4.0), 4)
             AS jb_stat,
           n / 6.0 * (skew * skew + exkurt * exkurt / 4.0) > 5.991
             AS reject_normal
    FROM jb
    """,
)
def agg_jarque_bera(spark, sf_dir):
    """Jarque-Bera normality test on daily event counts: JB = n/6 *
    (S^2 + K^2/4) from skewness and excess kurtosis, rejected against
    the df=2 chi-square 0.05 critical value 5.991 — the
    moments-based normality omnibus (cheap, asymptotic) next to
    Anderson-Darling (tail-weighted, exact-CDF) in the normality
    family; its decomposition TELLS you which moment failed. Built
    from EXPLICIT central moments on both engines (never the built-in
    skewness/kurtosis aggregates, whose sample-correction conventions
    differ between engines) — one bounded daily collapse, one moment
    aggregate against the broadcast mean."""
    e = _t(spark, sf_dir, "events")
    d = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    x = d.select(F.col("cnt").cast("double").alias("v"))
    m = x.agg(F.count(F.lit(1)).alias("n"), F.avg("v").alias("mu"))
    c = (
        x.join(F.broadcast(m))
        .groupBy("n")
        .agg(
            (F.sum(F.pow(F.col("v") - F.col("mu"), 2)) / F.col("n")).alias(
                "m2"
            ),
            (F.sum(F.pow(F.col("v") - F.col("mu"), 3)) / F.col("n")).alias(
                "m3"
            ),
            (F.sum(F.pow(F.col("v") - F.col("mu"), 4)) / F.col("n")).alias(
                "m4"
            ),
        )
    )
    skew = F.col("m3") / F.pow(F.col("m2"), 1.5)
    exkurt = F.col("m4") / (F.col("m2") * F.col("m2")) - 3.0
    jb = F.col("n") / 6.0 * (skew * skew + exkurt * exkurt / 4.0)
    return c.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(skew, 4).alias("skewness"),
        F.round(exkurt, 4).alias("excess_kurtosis"),
        F.round(jb, 4).alias("jb_stat"),
        (jb > 5.991).alias("reject_normal"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 176: Cohen's kappa between two tertile classifiers
# ---------------------------------------------------------------------------


@_q(
    "agg_cohens_kappa",
    """
    WITH per AS (SELECT l_orderkey, sum(l_quantity) AS qty
                 FROM lineitem GROUP BY 1),
    j AS (SELECT o.o_totalprice AS price, CAST(per.qty AS DOUBLE) AS qty
          FROM per JOIN orders o ON per.l_orderkey = o.o_orderkey),
    mm AS (SELECT min(price) AS p0, max(price) AS p1,
                  min(qty) AS q0, max(qty) AS q1 FROM j),
    cls AS (SELECT least(2, CAST(floor((price - p0) / (p1 - p0) * 3)
                                 AS BIGINT)) AS a,
                   least(2, CAST(floor((qty - q0) / (q1 - q0) * 3)
                                 AS BIGINT)) AS b
            FROM j CROSS JOIN mm),
    cell AS (SELECT a, b, count(*) AS n FROM cls GROUP BY a, b),
    tot AS (SELECT CAST(sum(n) AS DOUBLE) AS nn FROM cell),
    po AS (SELECT sum(CASE WHEN a = b THEN n ELSE 0 END)
                  / any_value(tot.nn) AS po
           FROM cell CROSS JOIN tot),
    marg AS (SELECT sum(ra.na * rb.nb)
                    / (any_value(tot.nn) * any_value(tot.nn)) AS pe
             FROM (SELECT a, sum(n) AS na FROM cell GROUP BY a) ra
             JOIN (SELECT b, sum(n) AS nb FROM cell GROUP BY b) rb
               ON ra.a = rb.b
             CROSS JOIN tot)
    SELECT CAST(tot.nn AS BIGINT) AS n,
           round(po.po, 6) AS observed_agreement,
           round(marg.pe, 6) AS expected_agreement,
           round((po.po - marg.pe) / (1.0 - marg.pe), 4) AS kappa,
           CASE WHEN (po.po - marg.pe) / (1.0 - marg.pe) > 0.6
                THEN 'substantial'
                WHEN (po.po - marg.pe) / (1.0 - marg.pe) > 0.2
                THEN 'fair-to-moderate'
                ELSE 'slight-or-less' END AS landis_koch
    FROM po CROSS JOIN marg CROSS JOIN tot
    """,
)
def agg_cohens_kappa(spark, sf_dir):
    """Cohen's kappa chance-corrected agreement between two tertile
    'raters' of order size — the price-based class vs the quantity-
    based class (kappa = (p_o - p_e)/(1 - p_e) with the Landis-Koch
    verdict band) — the inter-annotator-agreement primitive every
    labeling pipeline reports before trusting its labels, exercised
    on two classifications the engine derives itself. Width-based
    tertiles (broadcast min/max, the Kendall-tau binning discipline —
    no ntile tie-splits); the agreement table is a bounded 3x3 hash
    aggregate and everything after is scalar."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    per = l.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("qty"))
    j = per.join(o, per.l_orderkey == o.o_orderkey).select(
        F.col("o_totalprice").alias("price"),
        F.col("qty").cast("double").alias("qty"),
    )
    mm = j.agg(
        F.min("price").alias("p0"),
        F.max("price").alias("p1"),
        F.min("qty").alias("q0"),
        F.max("qty").alias("q1"),
    )
    cls = j.join(F.broadcast(mm)).select(
        F.least(
            F.lit(2),
            F.floor(
                (F.col("price") - F.col("p0"))
                / (F.col("p1") - F.col("p0"))
                * 3
            ),
        ).alias("a"),
        F.least(
            F.lit(2),
            F.floor(
                (F.col("qty") - F.col("q0"))
                / (F.col("q1") - F.col("q0"))
                * 3
            ),
        ).alias("b"),
    )
    cell = cls.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n"))
    tot = cell.agg(F.sum("n").cast("double").alias("nn"))
    po = cell.agg(
        F.sum(F.when(F.col("a") == F.col("b"), F.col("n")).otherwise(0))
        .cast("double")
        .alias("agree")
    )
    ra = cell.groupBy("a").agg(F.sum("n").alias("na"))
    rb = cell.groupBy("b").agg(F.sum("n").alias("nb"))
    pe = (
        ra.join(rb, ra.a == rb.b)
        .agg(F.sum(F.col("na") * F.col("nb")).alias("cross"))
    )
    fin = (
        po.join(F.broadcast(pe))
        .join(F.broadcast(tot))
    )
    p_o = F.col("agree") / F.col("nn")
    p_e = F.col("cross") / (F.col("nn") * F.col("nn"))
    kappa = (p_o - p_e) / (F.lit(1.0) - p_e)
    return fin.select(
        F.col("nn").cast("long").alias("n"),
        F.round(p_o, 6).alias("observed_agreement"),
        F.round(p_e, 6).alias("expected_agreement"),
        F.round(kappa, 4).alias("kappa"),
        F.when(kappa > 0.6, "substantial")
        .when(kappa > 0.2, "fair-to-moderate")
        .otherwise("slight-or-less")
        .alias("landis_koch"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 177: weekday seasonal strength
# ---------------------------------------------------------------------------


@_q(
    "events_seasonal_strength",
    """
    WITH d AS (SELECT CAST(ts AS DATE) AS day,
                      CAST(count(*) AS DOUBLE) AS x
               FROM events GROUP BY 1),
    g AS (SELECT day, x, dayofweek(day) AS dow FROM d),
    wm AS (SELECT dow, avg(x) AS dmu FROM g GROUP BY dow),
    r AS (SELECT g.x, wm.dmu,
                 g.x - wm.dmu AS resid
          FROM g JOIN wm USING (dow)),
    v AS (SELECT var_samp(x) AS v_total,
                 var_samp(resid) AS v_resid,
                 count(*) AS n
          FROM r)
    SELECT CAST(n AS BIGINT) AS n_days,
           round(v_total, 4) AS var_total,
           round(v_resid, 4) AS var_deseasonalized,
           round(greatest(0.0, 1.0 - v_resid / v_total), 4)
             AS seasonal_strength,
           greatest(0.0, 1.0 - v_resid / v_total) > 0.3
             AS strongly_seasonal
    FROM v
    """,
)
def events_seasonal_strength(spark, sf_dir):
    """Weekday seasonal strength of daily event volume: F_s = max(0,
    1 - Var(x - weekday_mean)/Var(x)) — the share of day-to-day
    variance the weekly cycle explains (the Hyndman STL-strength
    statistic specialized to the weekday component the ANOVA entry
    tests for significance; this gives the EFFECT SIZE a capacity
    planner budgets with: F_s = 0.6 means weekday-aware provisioning
    removes 60% of the variance). One bounded daily collapse, a 7-row
    weekday-mean broadcast, one variance aggregate."""
    e = _t(spark, sf_dir, "events")
    d = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("double").alias("x")
    )
    g = d.select("x", F.dayofweek("day").alias("dow"))
    wm = g.groupBy("dow").agg(F.avg("x").alias("dmu"))
    r = g.join(F.broadcast(wm), "dow").select(
        "x", (F.col("x") - F.col("dmu")).alias("resid")
    )
    v = r.agg(
        F.var_samp("x").alias("v_total"),
        F.var_samp("resid").alias("v_resid"),
        F.count(F.lit(1)).alias("n"),
    )
    fs = F.greatest(
        F.lit(0.0), F.lit(1.0) - F.col("v_resid") / F.col("v_total")
    )
    return v.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(F.col("v_total"), 4).alias("var_total"),
        F.round(F.col("v_resid"), 4).alias("var_deseasonalized"),
        F.round(fs, 4).alias("seasonal_strength"),
        (fs > 0.3).alias("strongly_seasonal"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 178: referential-integrity audit (FK health)
# ---------------------------------------------------------------------------


@_q(
    "profile_referential_integrity",
    """
    SELECT * FROM (
      SELECT 'lineitem->orders' AS fk,
             (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_child,
             (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_orderkey = l.l_orderkey))
               AS n_orphans,
             (SELECT CAST(count(*) AS BIGINT) FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                                WHERE l.l_orderkey = o.o_orderkey))
               AS n_childless_parents
      UNION ALL
      SELECT 'orders->customer',
             (SELECT count(*) FROM orders),
             (SELECT count(*) FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM customer c
                                WHERE c.c_custkey = o.o_custkey)),
             (SELECT count(*) FROM customer c
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_custkey = c.c_custkey))
      UNION ALL
      SELECT 'lineitem->part',
             (SELECT count(*) FROM lineitem),
             (SELECT count(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM part p
                                WHERE p.p_partkey = l.l_partkey)),
             (SELECT count(*) FROM part p
              WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                                WHERE l.l_partkey = p.p_partkey))
      UNION ALL
      SELECT 'lineitem->supplier',
             (SELECT count(*) FROM lineitem),
             (SELECT count(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM supplier s
                                WHERE s.s_suppkey = l.l_suppkey)),
             (SELECT count(*) FROM supplier s
              WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                                WHERE l.l_suppkey = s.s_suppkey)))
    ORDER BY fk
    """,
)
def profile_referential_integrity(spark, sf_dir):
    """Referential-integrity audit across the four fact->dimension
    relationships: orphaned children (FK with no parent — broken
    ingest) and childless parents (dimension rows no fact references —
    candidates for pruning or a load gap) per relationship — the
    data-contract health check the reference's dbt-style tests run on
    its own tables (plans/quality.py runs them on staging; this is the
    same discipline over the analytics schema). Each orphan count is
    one LEFT ANTI join (broadcast where the dimension is small); no
    EXISTS-per-row subquery execution anywhere."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")

    def fk_row(name, child, ckey, parent, pkey):
        n_child = child.count()
        orphans = child.join(
            parent, child[ckey] == parent[pkey], "left_anti"
        ).count()
        childless = parent.join(
            child, child[ckey] == parent[pkey], "left_anti"
        ).count()
        return (name, n_child, orphans, childless)

    rows = [
        fk_row("lineitem->orders", l, "l_orderkey", o, "o_orderkey"),
        fk_row("orders->customer", o, "o_custkey", c, "c_custkey"),
        fk_row("lineitem->part", l, "l_partkey", p, "p_partkey"),
        fk_row("lineitem->supplier", l, "l_suppkey", s, "s_suppkey"),
    ]
    return spark.createDataFrame(
        sorted(rows),
        "fk string, n_child long, n_orphans long, "
        "n_childless_parents long",
    )


# ---------------------------------------------------------------------------
# Round-7 wave 179: base36 order-reference codec round-trip
# ---------------------------------------------------------------------------

_B36 = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ"


def _b36_digit_sql(expr: str, pos: int) -> str:
    """SQL fragment: the base36 character of digit position pos
    (value // 36^pos % 36) via substr into the alphabet literal."""
    p = 36 ** pos
    return (
        f"substr('{_B36}', CAST(({expr} // {p}) % 36 AS INT) + 1, 1)"
    )


@_q(
    "scalar_base36_codec",
    f"""
    WITH r AS (SELECT o_orderkey AS k FROM orders),
    enc AS (SELECT k,
              concat({", ".join(_b36_digit_sql("k", p) for p in range(7, -1, -1))})
                AS code
            FROM r),
    chk AS (SELECT k, code,
              substr('{_B36}', CAST(k % 36 AS INT) + 1, 1) AS check_char
            FROM enc),
    dec AS (SELECT k, code, check_char,
              {" + ".join(f"(strpos('{_B36}', substr(code, {8 - p}, 1)) - 1) * {36 ** p}" for p in range(7, -1, -1))}
                AS decoded
            FROM chk)
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN decoded = k THEN 1 ELSE 0 END) AS BIGINT)
             AS n_roundtrip_ok,
           CAST(count(DISTINCT code) AS BIGINT) AS n_distinct_codes,
           min(concat(code, check_char)) AS min_ref,
           max(concat(code, check_char)) AS max_ref
    FROM dec
    """,
)
def scalar_base36_codec(spark, sf_dir):
    """Human-readable order-reference codec: encode every order key as
    a fixed-width 8-char base36 code (digit-by-digit via alphabet
    substring — no format builtin needed on either engine), append a
    mod-36 check character, decode back by positional radix
    arithmetic, and verify every key round-trips and codes stay
    distinct — the 'what the customer reads over the phone' ID
    discipline (fixed width sorts lexicographically in key order, the
    check char rejects single-keystroke typos). All row-local string/
    integer expressions, shuffle-free until the final aggregate."""
    o = _t(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("k"))
    # column-positioned substr into the alphabet literal per digit
    enc = o.withColumn(
        "code",
        F.concat(
            *[
                F.expr(
                    f"substr('{_B36}', CAST((k div {36 ** p}) % 36 AS INT)"
                    " + 1, 1)"
                )
                for p in range(7, -1, -1)
            ]
        ),
    ).withColumn(
        "check_char",
        F.expr(f"substr('{_B36}', CAST(k % 36 AS INT) + 1, 1)"),
    )
    dec = enc.withColumn(
        "decoded",
        sum(
            [
                (
                    F.expr(f"instr('{_B36}', substr(code, {8 - p}, 1))")
                    - 1
                )
                * F.lit(36 ** p)
                for p in range(7, -1, -1)
            ],
            F.lit(0),
        ),
    )
    return dec.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("decoded") == F.col("k"), 1).otherwise(0)
        ).alias("n_roundtrip_ok"),
        F.countDistinct("code").alias("n_distinct_codes"),
        F.min(F.concat("code", "check_char")).alias("min_ref"),
        F.max(F.concat("code", "check_char")).alias("max_ref"),
    ).select(
        F.col("n").cast("long").alias("n"),
        F.col("n_roundtrip_ok").cast("long").alias("n_roundtrip_ok"),
        F.col("n_distinct_codes").cast("long").alias("n_distinct_codes"),
        "min_ref",
        "max_ref",
    )


# ---------------------------------------------------------------------------
# Round-7 wave 180: Grubbs outlier test
# ---------------------------------------------------------------------------


@_q(
    "agg_grubbs_outlier",
    """
    WITH d AS (SELECT CAST(ts AS DATE) AS day,
                      CAST(count(*) AS DOUBLE) AS x
               FROM events GROUP BY 1),
    m AS (SELECT count(*) AS n, avg(x) AS mu, stddev_samp(x) AS sd
          FROM d),
    g AS (SELECT d.day, abs(d.x - m.mu) / m.sd AS gdev, m.n
          FROM d CROSS JOIN m),
    top AS (SELECT day, gdev, n FROM g
            ORDER BY round(gdev, 6) DESC, day LIMIT 1),
    crit AS (SELECT day, gdev, n,
                    (n - 1) / sqrt(CAST(n AS DOUBLE))
                    * sqrt(3.8414588 / (n - 2 + 3.8414588)) AS gcrit
             FROM top)
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(day AS VARCHAR) AS suspect_day,
           round(gdev, 4) AS g_stat,
           round(gcrit, 4) AS g_critical,
           gdev > gcrit AS is_outlier
    FROM crit
    """,
)
def agg_grubbs_outlier(spark, sf_dir):
    """Grubbs maximum-deviation outlier test on daily event counts:
    G = max|x - mean|/sd against the critical value (n-1)/sqrt(n) *
    sqrt(z^2/(n-2+z^2)) with z^2 = 3.8415 (the large-n normal
    approximation of the t quantile) — the FORMAL single-outlier test
    that turns 'that day looks weird' (the z-score/MAD heuristics
    already in the family) into a decision with a stated error rate,
    and names the suspect day. Argmax on the ROUNDED deviation with
    day tie-break; everything after the bounded daily collapse is a
    broadcast one-row computation."""
    e = _t(spark, sf_dir, "events")
    d = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("double").alias("x")
    )
    m = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("x").alias("mu"),
        F.stddev_samp("x").alias("sd"),
    )
    g = d.join(F.broadcast(m)).select(
        "day",
        (F.abs(F.col("x") - F.col("mu")) / F.col("sd")).alias("gdev"),
        "n",
    )
    top = g.orderBy(F.round(F.col("gdev"), 6).desc(), "day").limit(1)
    n = F.col("n").cast("double")
    gcrit = (
        (n - 1)
        / F.sqrt(n)
        * F.sqrt(F.lit(3.8414588) / (n - 2 + 3.8414588))
    )
    return top.select(
        F.col("n").cast("long").alias("n_days"),
        F.col("day").cast("string").alias("suspect_day"),
        F.round(F.col("gdev"), 4).alias("g_stat"),
        F.round(gcrit, 4).alias("g_critical"),
        (F.col("gdev") > gcrit).alias("is_outlier"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 181: Chinchilla compute-optimal sizing report
# ---------------------------------------------------------------------------


@_q(
    "corpus_chinchilla_sizing",
    f"""
    WITH t AS (SELECT CAST(sum(len({_WORDS})) AS DOUBLE) AS tokens
               FROM documents),
    models AS (SELECT unnest([1e6, 1e7, 1e8, 1e9]) AS params),
    r AS (SELECT CAST(params AS BIGINT) AS params,
                 tokens,
                 tokens / 20.0 AS opt_params,
                 params * 20.0 AS tokens_needed,
                 6.0 * params * tokens AS flops,
                 tokens / (params * 20.0) AS epochs_equiv
          FROM models CROSS JOIN t)
    SELECT params,
           CAST(tokens AS BIGINT) AS corpus_tokens,
           CAST(round(opt_params, 0) AS BIGINT) AS chinchilla_params,
           CAST(tokens_needed AS BIGINT) AS tokens_for_params,
           round(log10(flops), 4) AS log10_flops,
           round(epochs_equiv, 4) AS data_ratio,
           CASE WHEN epochs_equiv >= 1.0 THEN 'data-sufficient'
                ELSE 'data-starved' END AS regime
    FROM r ORDER BY params
    """,
)
def corpus_chinchilla_sizing(spark, sf_dir):
    """Compute-optimal training-size report (Hoffmann et al. 2022
    'Chinchilla' heuristic, ~20 tokens per parameter): given THIS
    corpus's token count, for a grid of model sizes report the
    compute-optimal parameter count the corpus supports, the tokens
    each model size wants, training FLOPs (6ND), and whether the
    corpus over- or under-feeds the model — the one-page answer to
    'is this corpus big enough for the model we plan to train'. One
    tokenize+count pass; the model grid is a 4-literal broadcast and
    every output column is scalar arithmetic."""
    from boann_ocsf_security_data_platform_spark.operators.text import tokens

    t = _t(spark, sf_dir, "documents").agg(
        F.sum(F.size(tokens(F.col("text"))))
        .cast("double")
        .alias("tokens")
    )
    models = spark.createDataFrame(
        [(1e6,), (1e7,), (1e8,), (1e9,)], "params double"
    )
    r = F.broadcast(models).join(F.broadcast(t))
    params, toks = F.col("params"), F.col("tokens")
    epochs = toks / (params * 20.0)
    return r.select(
        params.cast("long").alias("params"),
        toks.cast("long").alias("corpus_tokens"),
        F.round(toks / 20.0, 0).cast("long").alias("chinchilla_params"),
        (params * 20.0).cast("long").alias("tokens_for_params"),
        F.round(F.log10(F.lit(6.0) * params * toks), 4).alias(
            "log10_flops"
        ),
        F.round(epochs, 4).alias("data_ratio"),
        F.when(epochs >= 1.0, "data-sufficient")
        .otherwise("data-starved")
        .alias("regime"),
    ).orderBy("params")


# ---------------------------------------------------------------------------
# Round-7 wave 182: vocabulary coverage curve
# ---------------------------------------------------------------------------


@_q(
    "text_vocab_coverage_curve",
    f"""
    WITH toks AS (SELECT unnest({_WORDS}) AS w FROM documents),
    wc AS (SELECT w, count(*) AS c FROM toks GROUP BY w),
    rk AS (SELECT c, row_number() OVER (ORDER BY c DESC, w) AS rn,
                  sum(c) OVER () AS tot
           FROM wc),
    ks AS (SELECT unnest([100, 1000, 5000, 20000]) AS k),
    cov AS (SELECT ks.k,
                   sum(CASE WHEN rk.rn <= ks.k THEN rk.c ELSE 0 END)
                     / CAST(any_value(rk.tot) AS DOUBLE) AS coverage,
                   sum(CASE WHEN rk.rn <= ks.k THEN 1 ELSE 0 END)
                     AS vocab_used
            FROM rk CROSS JOIN ks GROUP BY ks.k)
    SELECT CAST(k AS BIGINT) AS vocab_size,
           CAST(vocab_used AS BIGINT) AS vocab_used,
           round(coverage, 6) AS token_coverage,
           round(1.0 - coverage, 6) AS oov_rate
    FROM cov ORDER BY vocab_size
    """,
)
def text_vocab_coverage_curve(spark, sf_dir):
    """Vocabulary-size vs token-coverage curve: the fraction of ALL
    token occurrences covered by the top-k most frequent words at four
    candidate vocabulary sizes (with the complementary OOV rate) —
    the first plot every tokenizer/vocab design decision reads (where
    does coverage saturate? what OOV rate does a 5k vocab buy?), and
    the corpus-level duals of the Zipf and Heaps fits already in the
    family. Ranking ties break by word (deterministic); one tokenize+
    count pass collapses to the bounded vocabulary, and the curve is
    one conditional aggregate over vocab x 4 literals."""
    from boann_ocsf_security_data_platform_spark.operators.text import tokens

    toks = _t(spark, sf_dir, "documents").select(
        F.explode(tokens(F.col("text"))).alias("w")
    )
    wc = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    tot = wc.agg(F.sum("c").alias("tot"))
    wr = Window.orderBy(F.col("c").desc(), "w")
    rk = wc.select(
        "c", F.row_number().over(wr).alias("rn")
    ).join(F.broadcast(tot))
    ks = spark.createDataFrame(
        [(100,), (1000,), (5000,), (20000,)], "k int"
    )
    cov = (
        rk.join(F.broadcast(ks))
        .groupBy("k")
        .agg(
            (
                F.sum(
                    F.when(F.col("rn") <= F.col("k"), F.col("c")).otherwise(
                        0
                    )
                )
                / F.any_value("tot").cast("double")
            ).alias("coverage"),
            F.sum(
                F.when(F.col("rn") <= F.col("k"), 1).otherwise(0)
            ).alias("vocab_used"),
        )
    )
    return cov.select(
        F.col("k").cast("long").alias("vocab_size"),
        F.col("vocab_used").cast("long").alias("vocab_used"),
        F.round(F.col("coverage"), 6).alias("token_coverage"),
        F.round(F.lit(1.0) - F.col("coverage"), 6).alias("oov_rate"),
    ).orderBy("vocab_size")


# ---------------------------------------------------------------------------
# Round-7 wave 183: empirical-Bayes shrinkage of supplier late rates
# ---------------------------------------------------------------------------


@_q(
    "supplier_eb_shrunk_late_rate",
    """
    WITH r AS (SELECT l_suppkey,
                      count(*) AS n,
                      sum(CASE WHEN l_shipdate > CAST('1996-01-01'
                               AS DATE) THEN 1 ELSE 0 END) AS x
               FROM lineitem GROUP BY 1),
    rt AS (SELECT l_suppkey, n, x, CAST(x AS DOUBLE) / n AS p FROM r),
    mom AS (SELECT avg(p) AS m, var_samp(p) AS v FROM rt),
    ab AS (SELECT m, v,
                  m * (m * (1 - m) / v - 1) AS alpha,
                  (1 - m) * (m * (1 - m) / v - 1) AS beta
           FROM mom),
    sh AS (SELECT rt.l_suppkey, rt.n, rt.x, rt.p,
                  (rt.x + ab.alpha) / (rt.n + ab.alpha + ab.beta)
                    AS p_shrunk,
                  ab.alpha, ab.beta
           FROM rt CROSS JOIN ab)
    SELECT l_suppkey, CAST(n AS BIGINT) AS n_lines,
           round(p, 6) AS raw_rate,
           round(p_shrunk, 6) AS shrunk_rate,
           round(abs(p - p_shrunk), 6) AS shrinkage,
           round(any_value(alpha) OVER (), 4) AS prior_alpha,
           round(any_value(beta) OVER (), 4) AS prior_beta
    FROM sh
    ORDER BY round(abs(p - p_shrunk), 6) DESC, l_suppkey
    LIMIT 15
    """,
)
def supplier_eb_shrunk_late_rate(spark, sf_dir):
    """Empirical-Bayes (beta-binomial) shrinkage of per-supplier
    late-shipment rates: fit the beta prior by method of moments over
    the raw rate distribution (alpha = m(m(1-m)/v - 1), beta the
    complement), shrink each supplier toward it by its own evidence
    ((x + a)/(n + a + b)), and surface the 15 suppliers the raw
    leaderboard most misleads — the 'small suppliers with 2/3 late
    look worse than big ones with 400/1000' correction every ranked
    scorecard needs (supplier_latency_ranking reports raw; this is
    the calibrated companion). The prior is a broadcast one-row
    frame; the shrinkage is a shuffle-free projection; the cut is a
    TakeOrdered on the ROUNDED shrinkage with key tie-break."""
    l = _t(spark, sf_dir, "lineitem")
    r = l.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(
                F.col("l_shipdate").cast("date")
                > F.lit("1996-01-01").cast("date"),
                1,
            ).otherwise(0)
        ).alias("x"),
    )
    rt = r.select(
        "l_suppkey",
        "n",
        "x",
        (F.col("x").cast("double") / F.col("n")).alias("p"),
    )
    mom = rt.agg(F.avg("p").alias("m"), F.var_samp("p").alias("v"))
    m, v = F.col("m"), F.col("v")
    ab = mom.select(
        (m * (m * (1 - m) / v - 1)).alias("alpha"),
        ((1 - m) * (m * (1 - m) / v - 1)).alias("beta"),
    )
    sh = rt.join(F.broadcast(ab)).select(
        "l_suppkey",
        "n",
        "p",
        (
            (F.col("x") + F.col("alpha"))
            / (F.col("n") + F.col("alpha") + F.col("beta"))
        ).alias("p_shrunk"),
        "alpha",
        "beta",
    )
    return (
        sh.select(
            "l_suppkey",
            F.col("n").cast("long").alias("n_lines"),
            F.round(F.col("p"), 6).alias("raw_rate"),
            F.round(F.col("p_shrunk"), 6).alias("shrunk_rate"),
            F.round(F.abs(F.col("p") - F.col("p_shrunk")), 6).alias(
                "shrinkage"
            ),
            F.round(F.col("alpha"), 4).alias("prior_alpha"),
            F.round(F.col("beta"), 4).alias("prior_beta"),
        )
        .orderBy(F.col("shrinkage").desc(), "l_suppkey")
        .limit(15)
    )


# ---------------------------------------------------------------------------
# Round-7 wave 184: Fleiss' kappa across three raters
# ---------------------------------------------------------------------------


@_q(
    "agg_fleiss_kappa",
    """
    WITH per AS (SELECT l_orderkey, count(*) AS nl,
                        sum(l_quantity) AS qty
                 FROM lineitem GROUP BY 1),
    j AS (SELECT o.o_orderkey AS okey, o.o_totalprice AS price,
                 CAST(per.qty AS DOUBLE) AS qty,
                 CAST(per.nl AS DOUBLE) AS nl
          FROM per JOIN orders o ON per.l_orderkey = o.o_orderkey),
    mm AS (SELECT min(price) AS p0, max(price) AS p1,
                  min(qty) AS q0, max(qty) AS q1,
                  min(nl) AS l0, max(nl) AS l1 FROM j),
    votes AS (
      SELECT okey, least(2, CAST(floor((price - p0) / (p1 - p0) * 3)
                                 AS BIGINT)) AS cat
      FROM j CROSS JOIN mm
      UNION ALL
      SELECT okey, least(2, CAST(floor((qty - q0) / (q1 - q0) * 3)
                                 AS BIGINT))
      FROM j CROSS JOIN mm
      UNION ALL
      SELECT okey, least(2, CAST(floor((nl - l0) / (l1 - l0) * 3)
                                 AS BIGINT))
      FROM j CROSS JOIN mm),
    vc AS (SELECT okey, cat, count(*) AS nij FROM votes GROUP BY 1, 2),
    pi AS (SELECT okey,
                  (sum(nij * nij) - 3.0) / (3.0 * 2.0) AS p_i
           FROM vc GROUP BY okey),
    pbar AS (SELECT avg(p_i) AS pbar, count(*) AS n FROM pi),
    pj AS (SELECT sum(pj2) AS pe FROM (
             SELECT pow(sum(nij) / (3.0 * (SELECT count(*) FROM pi)), 2)
               AS pj2
             FROM vc GROUP BY cat))
    SELECT CAST(n AS BIGINT) AS n_items,
           round(pbar, 6) AS observed_agreement,
           round(pe, 6) AS expected_agreement,
           round((pbar - pe) / (1.0 - pe), 4) AS fleiss_kappa
    FROM pbar CROSS JOIN pj
    """,
)
def agg_fleiss_kappa(spark, sf_dir):
    """Fleiss' kappa across THREE tertile raters of order size (price-,
    quantity-, and line-count-based classifications): per-item
    agreement P_i = (sum n_ij^2 - r)/(r(r-1)) with r=3 raters, chance
    agreement from the pooled category shares — the multi-rater
    generalization of agg_cohens_kappa that real annotation pipelines
    (3+ labelers per example) report. Width-based tertiles keep
    rating deterministic; the vote table is a constant 3x explode of
    the bounded per-order frame and every later step is a hash
    aggregate of it."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    per = l.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("nl"), F.sum("l_quantity").alias("qty")
    )
    # fact-grain rollup x fact leaf — the unfiltered orders build
    # inflated past driver memory at the 10x sweep (compressed-leaf
    # estimate under the 64MB threshold, in-memory hash relation ~1GB);
    # pinned above the measured fact-count threshold
    j = per.join(
        _pin(o, _gates.pin_shuffle_join_fact(_table_count(spark, sf_dir, "lineitem"))),
        per.l_orderkey == o.o_orderkey,
    ).select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_totalprice").alias("price"),
        F.col("qty").cast("double").alias("qty"),
        F.col("nl").cast("double").alias("nl"),
    )
    mm = j.agg(
        F.min("price").alias("p0"),
        F.max("price").alias("p1"),
        F.min("qty").alias("q0"),
        F.max("qty").alias("q1"),
        F.min("nl").alias("l0"),
        F.max("nl").alias("l1"),
    )

    def tert(v, lo, hi):
        return F.least(
            F.lit(2),
            F.floor(
                (F.col(v) - F.col(lo)) / (F.col(hi) - F.col(lo)) * 3
            ),
        )

    # The three raters are three COLUMNS of the same row, so the whole
    # per-item layer is row-local (round-10 sf100 fix): with r=3 votes
    # (a,b,c), sum n_ij^2 = 3 + 2*matches where matches counts the equal
    # pairs among the three, hence P_i = (sum n_ij^2 - 3)/6 =
    # (2*matches)/6 — identical doubles to the old per-(okey,cat) count
    # path (both are the correctly-rounded quotient of the same
    # integers). The previous shape unioned the votes into a 3x-fact
    # frame and hash-aggregated it TWICE at item grain (450M rows / 150M
    # groups at sf100 — the aggregation died UNABLE_TO_ACQUIRE_MEMORY
    # with 32 concurrent tasks); now the only post-join work is one
    # global aggregate whose partials are map-side combined to a single
    # row. Category totals for chance agreement are when()-indicator
    # sums in the same aggregate.
    jm = j.join(F.broadcast(mm)).select(
        tert("price", "p0", "p1").alias("ca"),
        tert("qty", "q0", "q1").alias("cb"),
        tert("nl", "l0", "l1").alias("cc"),
    )
    a, b, c = F.col("ca"), F.col("cb"), F.col("cc")
    matches = (
        (a == b).cast("int") + (a == c).cast("int") + (b == c).cast("int")
    )

    def cat_n(k):
        return F.sum(
            (a == k).cast("long") + (b == k).cast("long") + (c == k).cast("long")
        )

    g = jm.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg((matches * 2.0) / 6.0).alias("pbar"),
        cat_n(0).alias("c0"),
        cat_n(1).alias("c1"),
        cat_n(2).alias("c2"),
    )
    pe = sum(
        F.pow(F.col(cn) / (F.lit(3.0) * F.col("n")), 2)
        for cn in ("c0", "c1", "c2")
    )
    fin = g.withColumn("pe", pe)
    kappa = (F.col("pbar") - F.col("pe")) / (F.lit(1.0) - F.col("pe"))
    return fin.select(
        F.col("n").cast("long").alias("n_items"),
        F.round(F.col("pbar"), 6).alias("observed_agreement"),
        F.round(F.col("pe"), 6).alias("expected_agreement"),
        F.round(kappa, 4).alias("fleiss_kappa"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 185: records-theory test (running-maximum days)
# ---------------------------------------------------------------------------


@_q(
    "events_records_test",
    """
    WITH d AS (SELECT CAST(ts AS DATE) AS day, count(*) AS cnt
               FROM events GROUP BY 1),
    r AS (SELECT day, cnt,
                 max(cnt) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prev_max,
                 row_number() OVER (ORDER BY day) AS rn
          FROM d),
    obs AS (SELECT count(*) AS n,
                   sum(CASE WHEN prev_max IS NULL OR cnt > prev_max
                            THEN 1 ELSE 0 END) AS records
            FROM r),
    h AS (SELECT sum(1.0 / i) AS h1, sum(1.0 / (i * i)) AS h2
          FROM (SELECT unnest(range(1, (SELECT n FROM obs) + 1)) AS i)),
    z AS (SELECT n, records, h1, h1 - h2 AS var_r,
                 (records - h1) / sqrt(h1 - h2) AS z
          FROM obs CROSS JOIN h)
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(records AS BIGINT) AS n_records,
           round(h1, 4) AS expected_records,
           round(z, 4) AS zscore,
           z > 1.96 AS trending_up
    FROM z
    """,
)
def events_records_test(spark, sf_dir):
    """Records-theory trend test: count record-breaking days (daily
    volume exceeding every previous day). Under an iid series the
    expected record count is EXACTLY the harmonic number H_n with
    variance H_n - H_n^(2) — distribution-free, no moments assumed —
    so a z-score far above it is trend evidence even when the level
    distribution is wild (the third member of the distribution-free
    trend family with Mann-Kendall and turning points; records react
    FASTEST to new-regime highs). The running max is one ordered
    window over the bounded daily domain; the harmonic sums ride a
    bounded integer explode."""
    e = _t(spark, sf_dir, "events")
    d = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wprev = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    r = d.select(
        "cnt", F.max("cnt").over(wprev).alias("prev_max")
    )
    obs = r.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(
                F.col("prev_max").isNull()
                | (F.col("cnt") > F.col("prev_max")),
                1,
            ).otherwise(0)
        ).alias("records"),
    )
    h = (
        obs.select(
            F.explode(F.sequence(F.lit(1), F.col("n"))).alias("i")
        )
        .agg(
            F.sum(F.lit(1.0) / F.col("i")).alias("h1"),
            F.sum(F.lit(1.0) / (F.col("i") * F.col("i"))).alias("h2"),
        )
    )
    z = obs.join(F.broadcast(h))
    zscore = (F.col("records") - F.col("h1")) / F.sqrt(
        F.col("h1") - F.col("h2")
    )
    return z.select(
        F.col("n").cast("long").alias("n_days"),
        F.col("records").cast("long").alias("n_records"),
        F.round(F.col("h1"), 4).alias("expected_records"),
        F.round(zscore, 4).alias("zscore"),
        (zscore > 1.96).alias("trending_up"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 186: k-occurrence hubness profile
# ---------------------------------------------------------------------------


HUBNESS_EXACT_MAX_ROWS = _gates.PAIRWISE_EXACT_MAX_ROWS
# Size gate for embedding_hubness_profile: below this row count, neighbor
# lists are exact within label blocks (with 10 labels that is <=1k rows and
# <=1M pairs per block — fine, and it is the oracle-hashed path at
# sf0.01/sf0.1); above it, exact within-label pairs grow QUADRATICALLY with
# block size (fixed label cardinality -> ~100x more pairs per data decade),
# so the query dispatches to LSH-bucketed blocks whose expected size is held
# constant by auto_n_planes — pair work then scales ~linearly with rows.
_HUBNESS_EMB_DIM = 64
_HUBNESS_LSH_TARGET_BUCKET = _gates.LSH_TARGET_BUCKET
# Expected (label, bucket) block size on the LSH arm. 64 candidates per
# point is ample for a top-3 neighbor list, and it bounds pair work at
# ~64 dot products per point — constant per point, linear total.
# (Measured at sf1/20k rows: target 512 -> 10M pairs, 202 s; target 64 ->
# ~1.2M pairs — same profile output on the key-offset-replicated data.)
_HUBNESS_MAX_BLOCK_CAND = _gates.MAX_BLOCK_CANDIDATES
# Hard candidate-side cap per (label, bucket) block — the skew valve the
# dedup family calls max_bucket_size. LSH cannot split EXACT-replica
# groups (identical vectors share every bucket), so a duplication-heavy
# corpus grows block sizes with the copy count no matter the plane count
# (measured on the key-offset-replicated sf10: blocks ~100 rows = one
# 100-copy group, 20M pairs, 21.8x per decade — super-linear). Capping
# the CANDIDATE side at 64 deterministically (xxhash64 order) bounds
# pair work at n x 64 — strictly linear in rows; every point still
# queries (k_occ votes just come from a bounded candidate panel).


def _hubness_pairs(e, extra_block_cols=()):
    """Within-block (qid, nid, cos) neighbor pairs: an EQUI-join on label
    plus any extra blocking columns (the LSH bucket on the scale path) —
    never an unblocked n^2. Shared by both dispatch arms so the moment
    machinery downstream cannot diverge between them.

    cos is computed as dot(a,b)/(|a||b|) with each norm evaluated ONCE
    per side of the join (a pre-join projection), not once per pair —
    at block size m that removes 2(m-1) of every row's 64-element
    reductions; only the dot product remains per-pair."""
    from boann_ocsf_security_data_platform_spark.operators.similarity import (
        _dot,
        _norm,
    )

    return _hubness_pairs_asym(e, e, extra_block_cols)


def _hubness_pairs_asym(eq, ec, extra_block_cols=()):
    """Asymmetric variant of :func:`_hubness_pairs`: query side ``eq``
    (every point gets a neighbor list) against candidate side ``ec``
    (possibly capped per block by the skew valve). ``eq is ec`` on the
    exact arm."""
    from boann_ocsf_security_data_platform_spark.operators.similarity import (
        _dot,
        _norm,
    )

    a = eq.withColumn("_vn", _norm(F.col("v"))).alias("a")
    b = ec.withColumn("_vn", _norm(F.col("v"))).alias("b")
    cos = _dot(F.col("a.v"), F.col("b.v")) / (
        F.col("a._vn") * F.col("b._vn")
    )
    cond = (F.col("a.label") == F.col("b.label")) & (
        F.col("a.vec_id") != F.col("b.vec_id")
    )
    for c in extra_block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    return a.join(b, cond).select(
        F.col("a.vec_id").alias("qid"),
        F.col("b.vec_id").alias("nid"),
        F.round(cos, 6).alias("cos"),
    )



@_q(
    "embedding_hubness_profile",
    """
    WITH e AS (SELECT vec_id, label,
                      CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    p AS (SELECT a.label, a.vec_id AS qid, b.vec_id AS nid,
                 round(list_dot_product(a.v, b.v)
                       / (sqrt(list_dot_product(a.v, a.v))
                          * sqrt(list_dot_product(b.v, b.v))), 6)
                   AS cos
          FROM e a JOIN e b
            ON a.label = b.label AND a.vec_id <> b.vec_id),
    rk AS (SELECT qid, nid,
                  row_number() OVER (PARTITION BY qid
                    ORDER BY cos DESC, nid) AS rn
           FROM p),
    occ AS (SELECT nid, count(*) AS k_occ FROM rk
            WHERE rn <= 3 GROUP BY nid),
    fullk AS (SELECT e.vec_id, coalesce(occ.k_occ, 0) AS k
              FROM e LEFT JOIN occ ON e.vec_id = occ.nid),
    m AS (SELECT count(*) AS n, avg(CAST(k AS DOUBLE)) AS mu FROM fullk),
    c AS (SELECT n, mu,
                 sum(pow(k - mu, 2)) / n AS m2,
                 sum(pow(k - mu, 3)) / n AS m3,
                 max(k) AS maxk,
                 sum(CASE WHEN k = 0 THEN 1 ELSE 0 END) AS n_anti
          FROM fullk CROSS JOIN m GROUP BY n, mu)
    SELECT CAST(n AS BIGINT) AS n_points,
           round(mu, 4) AS mean_k_occurrence,
           round(m3 / pow(m2, 1.5), 4) AS k_skewness,
           CAST(maxk AS BIGINT) AS max_hub_k,
           round(CAST(n_anti AS DOUBLE) / n, 6) AS antihub_frac
    FROM c
    """,
)
def embedding_hubness_profile(spark, sf_dir):
    """k-occurrence hubness profile of the embedding space: how often
    each vector appears in OTHER vectors' 3-nearest lists (within its
    label block), summarized as the skewness of that k-occurrence
    distribution, the biggest hub, and the anti-hub fraction (points
    nobody retrieves) — THE high-dimensional ANN health diagnostic
    (Radovanovic et al. 2010: high skewness means a few hubs dominate
    retrieval and recall collapses off-hub; it decides between raw
    cosine and hubness-corrected scoring before any index is built).
    SIZE-GATED DISPATCH (the r7-verdict fix): at or below
    HUBNESS_EXACT_MAX_ROWS rows, neighbor lists are exact WITHIN label
    blocks — the oracle-hashed path at sf0.01/sf0.1; above it, each
    label block is further split by a random-hyperplane LSH bucket
    (operators/similarity.lsh_bucket, plane count from auto_n_planes so
    expected bucket size stays ~constant as the corpus grows), making
    the pair join's per-block work bounded and total work ~linear in
    rows — the same valve every other pairwise operator in the repo
    uses. Neighbor ranks use ROUNDED cosine with id tie-break; the
    profile is explicit central moments of integer counts."""
    from boann_ocsf_security_data_platform_spark.operators.similarity import (
        auto_n_planes,
        lsh_bucket,
    )

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").alias("v")
    )
    def _scale(eb, n):
        # LSH splits WITHIN label blocks, so size the plane count from the
        # per-label block (not total rows) — otherwise buckets over-split
        # and recall collapses (measured: antihub_frac 0.047 -> 0.6 at sf1
        # when planes were sized from total n).
        n_labels = eb.agg(
            F.countDistinct("label").alias("nl")
        ).collect()[0][0]
        planes = auto_n_planes(
            n // max(1, n_labels), _HUBNESS_LSH_TARGET_BUCKET
        )
        eb = eb.withColumn(
            "_hb", lsh_bucket(F.col("v"), planes, _HUBNESS_EMB_DIM)
        )
        # candidate-side skew valve (see _HUBNESS_MAX_BLOCK_CAND): exact
        # replicas defeat any plane count, so bound each block's candidate
        # panel deterministically — pair work becomes n x cap, linear
        wb = Window.partitionBy("label", "_hb").orderBy(
            F.xxhash64("vec_id"), "vec_id"
        )
        cand = (
            eb.withColumn("_crn", F.row_number().over(wb))
            .filter(F.col("_crn") <= _HUBNESS_MAX_BLOCK_CAND)
            .drop("_crn")
        )
        return _hubness_pairs_asym(eb, cand, ("_hb",))

    p = size_gated(
        e, lambda eb, n: _hubness_pairs(eb), _scale, HUBNESS_EXACT_MAX_ROWS
    )
    wr = Window.partitionBy("qid").orderBy(F.col("cos").desc(), "nid")
    occ = (
        p.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 3)
        .groupBy("nid")
        .agg(F.count(F.lit(1)).alias("k_occ"))
    )
    # `fullk` feeds the broadcast moment frame AND the central-moment
    # aggregate: unpersisted, the broadcast side recomputed the entire
    # blocked pair pipeline (round-12 sorter-pipeline scan found the
    # duplicated subtree fusing 4 sorters at sf10) — pin the k-occurrence
    # vector (one int per embedding) above the measured-count gate.
    hub_pin = _gates.pin_shuffle_join(
        _table_count(spark, sf_dir, "embeddings")
    )
    fullk = e.select("vec_id").join(
        occ, e.vec_id == occ.nid, "left"
    ).select(F.coalesce("k_occ", F.lit(0)).alias("k")).persist(
        StorageLevel.DISK_ONLY if hub_pin else StorageLevel.MEMORY_AND_DISK_DESER
    )
    m = fullk.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.col("k").cast("double")).alias("mu"),
    )
    c = (
        fullk.join(F.broadcast(m))
        .groupBy("n", "mu")
        .agg(
            (F.sum(F.pow(F.col("k") - F.col("mu"), 2)) / F.col("n")).alias(
                "m2"
            ),
            (F.sum(F.pow(F.col("k") - F.col("mu"), 3)) / F.col("n")).alias(
                "m3"
            ),
            F.max("k").alias("maxk"),
            F.sum(F.when(F.col("k") == 0, 1).otherwise(0)).alias("anti"),
        )
    )
    return c.select(
        F.col("n").cast("long").alias("n_points"),
        F.round(F.col("mu"), 4).alias("mean_k_occurrence"),
        F.round(
            F.col("m3") / F.pow(F.col("m2"), 1.5), 4
        ).alias("k_skewness"),
        F.col("maxk").cast("long").alias("max_hub_k"),
        F.round(
            F.col("anti").cast("double") / F.col("n"), 6
        ).alias("antihub_frac"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 187: Parkinson range-based volatility
# ---------------------------------------------------------------------------


@_q(
    "window_parkinson_volatility",
    """
    WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
                      max(o_totalprice) AS hi,
                      min(o_totalprice) AS lo
               FROM orders GROUP BY 1),
    y AS (SELECT year(day) AS yr,
                 pow(ln(hi / lo), 2) AS lnhl2
          FROM d WHERE lo > 0),
    s AS (SELECT yr, count(*) AS n,
                 sqrt(sum(lnhl2) / (4.0 * ln(2.0) * count(*))) AS sigma
          FROM y GROUP BY yr)
    SELECT CAST(yr AS BIGINT) AS yr, CAST(n AS BIGINT) AS n_days,
           round(sigma, 6) AS parkinson_daily,
           round(sigma * sqrt(252.0), 4) AS parkinson_annualized
    FROM s ORDER BY yr
    """,
)
def window_parkinson_volatility(spark, sf_dir):
    """Parkinson range-based volatility of daily order prices, per
    year: sigma_P = sqrt(sum ln(H/L)^2 / (4 ln2 n)) over each day's
    high/low price — the range estimator that is ~5x more efficient
    than close-to-close variance because it reads the WHOLE intraday
    excursion, not two samples of it (the estimator OHLC consumers
    reach for when ticks are expensive). Completes the volatility
    family next to Sharpe (level risk), Bollinger (envelope), and
    Donchian (range expansion). One scan to the bounded daily
    high/low table; everything after is a per-year aggregate."""
    o = _t(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.max("o_totalprice").alias("hi"),
        F.min("o_totalprice").alias("lo"),
    )
    y = d.filter(F.col("lo") > 0).select(
        F.year("day").alias("yr"),
        F.pow(F.log(F.col("hi") / F.col("lo")), 2).alias("lnhl2"),
    )
    s = y.groupBy("yr").agg(
        F.count(F.lit(1)).alias("n"),
        F.sqrt(
            F.sum("lnhl2")
            / (F.lit(4.0) * F.log(F.lit(2.0)) * F.count(F.lit(1)))
        ).alias("sigma"),
    )
    return s.select(
        F.col("yr").cast("long").alias("yr"),
        F.col("n").cast("long").alias("n_days"),
        F.round(F.col("sigma"), 6).alias("parkinson_daily"),
        F.round(F.col("sigma") * F.sqrt(F.lit(252.0)), 4).alias(
            "parkinson_annualized"
        ),
    ).orderBy("yr")


# ---------------------------------------------------------------------------
# Round-7 wave 188: Friedman test (within-month segment ranks)
# ---------------------------------------------------------------------------


@_q(
    "agg_friedman_test",
    """
    WITH m AS (SELECT year(CAST(o_orderdate AS DATE)) * 100
                      + month(CAST(o_orderdate AS DATE)) AS blk,
                      c.c_mktsegment AS seg,
                      round(avg(o_totalprice), 4) AS v
               FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
               GROUP BY 1, 2),
    full_b AS (SELECT blk FROM m GROUP BY blk HAVING count(*) = 5),
    r AS (SELECT m.blk, m.seg,
                 rank() OVER (PARTITION BY m.blk ORDER BY m.v) AS rk
          FROM m JOIN full_b USING (blk)),
    rs AS (SELECT seg, sum(rk) AS r_j FROM r GROUP BY seg),
    b AS (SELECT count(*) AS nb FROM full_b),
    f AS (SELECT
            12.0 / (nb * 5.0 * 6.0)
              * (SELECT sum(r_j * r_j) FROM rs)
              - 3.0 * nb * 6.0 AS chi2,
            nb
          FROM b)
    SELECT CAST(nb AS BIGINT) AS n_blocks,
           CAST(5 AS BIGINT) AS k_treatments,
           round(chi2, 4) AS friedman_chi2,
           chi2 > 9.4877 AS reject_h0
    FROM f
    """,
)
def agg_friedman_test(spark, sf_dir):
    """Friedman test — the within-blocks rank omnibus: do the five
    market segments order differently in mean price MONTH AFTER MONTH
    (each month is its own block, so month-level shocks cancel —
    exactly what the independent-samples Kruskal-Wallis cannot do)?
    chi2 = 12/(b*k*(k+1)) * sum R_j^2 - 3b(k+1), df = k-1 = 4,
    rejected at the 0.05 chi-square critical. Per-block values are
    ROUNDED-to-4 segment means before ranking so the rank order is
    ulp-stable across engines (min-rank tie convention, identical both
    sides); only complete 5-segment months enter. The fact collapses
    to the bounded (month, segment) table once; ranks are per-block
    windows over 5-row partitions."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    m = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            (
                F.year(F.col("o_orderdate").cast("date")) * 100
                + F.month(F.col("o_orderdate").cast("date"))
            ).alias("blk"),
            F.col("c_mktsegment").alias("seg"),
        )
        .agg(F.round(F.avg("o_totalprice"), 4).alias("v"))
        # bounded (month, segment) table (~5 rows per month) consumed by
        # BOTH the complete-blocks spine and the rank join: unpersisted,
        # the spine branch re-ran the fact rollup, and the estimate-driven
        # sort-merge join fused with the rank window's sort into a
        # 4-sorter region (round-12 scan-all find)
        .persist(StorageLevel.MEMORY_AND_DISK_DESER)
    )
    full_b = (
        m.groupBy("blk")
        .agg(F.count(F.lit(1)).alias("ns"))
        .filter(F.col("ns") == 5)
        .select("blk")
    )
    wr = Window.partitionBy("blk").orderBy("v")
    r = m.join(F.broadcast(full_b), "blk").select(
        "seg", F.rank().over(wr).alias("rk")
    )
    rs = r.groupBy("seg").agg(F.sum("rk").alias("r_j"))
    b = full_b.agg(F.count(F.lit(1)).alias("nb"))
    ssum = rs.agg(F.sum(F.col("r_j") * F.col("r_j")).alias("s2"))
    f = b.join(F.broadcast(ssum))
    chi2 = (
        F.lit(12.0) / (F.col("nb") * 5.0 * 6.0) * F.col("s2")
        - F.lit(3.0) * F.col("nb") * 6.0
    )
    return f.select(
        F.col("nb").cast("long").alias("n_blocks"),
        F.lit(5).cast("long").alias("k_treatments"),
        F.round(chi2, 4).alias("friedman_chi2"),
        (chi2 > 9.4877).alias("reject_h0"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 189: Gray-code round-trip + adjacency property
# ---------------------------------------------------------------------------


@_q(
    "scalar_gray_code_roundtrip",
    """
    WITH k AS (SELECT o_orderkey AS k FROM orders),
    g AS (SELECT k, xor(k, k >> 1) AS gray FROM k),
    dec AS (SELECT k, gray,
              xor(xor(xor(xor(xor(xor(gray, gray >> 1),
                xor(gray, gray >> 1) >> 2),
                xor(xor(gray, gray >> 1), xor(gray, gray >> 1) >> 2) >> 4),
                xor(xor(xor(gray, gray >> 1), xor(gray, gray >> 1) >> 2),
                    xor(xor(gray, gray >> 1),
                        xor(gray, gray >> 1) >> 2) >> 4) >> 8),
                xor(xor(xor(xor(gray, gray >> 1),
                            xor(gray, gray >> 1) >> 2),
                        xor(xor(gray, gray >> 1),
                            xor(gray, gray >> 1) >> 2) >> 4),
                    xor(xor(xor(gray, gray >> 1),
                            xor(gray, gray >> 1) >> 2),
                        xor(xor(gray, gray >> 1),
                            xor(gray, gray >> 1) >> 2) >> 4) >> 8) >> 16),
                xor(xor(xor(xor(xor(gray, gray >> 1),
                                xor(gray, gray >> 1) >> 2),
                            xor(xor(gray, gray >> 1),
                                xor(gray, gray >> 1) >> 2) >> 4),
                        xor(xor(xor(gray, gray >> 1),
                                xor(gray, gray >> 1) >> 2),
                            xor(xor(gray, gray >> 1),
                                xor(gray, gray >> 1) >> 2) >> 4) >> 8),
                    xor(xor(xor(xor(gray, gray >> 1),
                                xor(gray, gray >> 1) >> 2),
                            xor(xor(gray, gray >> 1),
                                xor(gray, gray >> 1) >> 2) >> 4),
                        xor(xor(xor(gray, gray >> 1),
                                xor(gray, gray >> 1) >> 2),
                            xor(xor(gray, gray >> 1),
                                xor(gray, gray >> 1) >> 2) >> 4) >> 8)
                    >> 16) >> 32) AS decoded
            FROM g),
    adj AS (SELECT gray,
                   lag(gray) OVER (ORDER BY k) AS pg,
                   k, lag(k) OVER (ORDER BY k) AS pk
            FROM g)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM k) AS n,
           (SELECT CAST(sum(CASE WHEN decoded = k THEN 1 ELSE 0 END)
                        AS BIGINT) FROM dec) AS n_roundtrip_ok,
           (SELECT round(avg(CAST(bit_count(CAST(xor(gray, pg) AS BIGINT))
                              AS DOUBLE)), 4)
            FROM adj WHERE pg IS NOT NULL AND k = pk + 1)
             AS mean_hamming_consecutive
    """,
)
def scalar_gray_code_roundtrip(spark, sf_dir):
    """Gray-code codec over the order-key space: encode g = k XOR
    (k >> 1), decode by the unrolled XOR-prefix fold (shifts 1, 2, 4,
    8, 16, 32 — closed form, no loop), verify every key round-trips,
    AND pin the property Gray codes exist for: consecutive integers
    differ in EXACTLY one bit (mean Hamming distance over consecutive
    key pairs = 1.0, asserted via bit_count on both engines) — the
    encoding that makes rollover glitch-free in counters and minimizes
    bit flips in sequential scan keys. All row-local bitwise
    expressions; the adjacency check is one lag window over keys."""
    o = _t(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("k"))
    g = o.select("k", F.expr("k ^ shiftright(k, 1)").alias("gray"))
    dec = (
        g.withColumn("x", F.expr("gray ^ shiftright(gray, 1)"))
        .withColumn("x", F.expr("x ^ shiftright(x, 2)"))
        .withColumn("x", F.expr("x ^ shiftright(x, 4)"))
        .withColumn("x", F.expr("x ^ shiftright(x, 8)"))
        .withColumn("x", F.expr("x ^ shiftright(x, 16)"))
        .withColumn("decoded", F.expr("x ^ shiftright(x, 32)"))
    )
    w = Window.orderBy("k")
    adj = g.select(
        "k",
        "gray",
        F.lag("gray").over(w).alias("pg"),
        F.lag("k").over(w).alias("pk"),
    )
    n = o.agg(F.count(F.lit(1)).alias("n"))
    ok = dec.agg(
        F.sum(
            F.when(F.col("decoded") == F.col("k"), 1).otherwise(0)
        ).alias("n_roundtrip_ok")
    )
    ham = adj.filter(
        F.col("pg").isNotNull() & (F.col("k") == F.col("pk") + 1)
    ).agg(
        F.round(
            F.avg(
                F.bit_count(
                    F.expr("gray ^ pg").cast("long")
                ).cast("double")
            ),
            4,
        ).alias("mean_hamming_consecutive")
    )
    return (
        n.join(F.broadcast(ok))
        .join(F.broadcast(ham))
        .select(
            F.col("n").cast("long").alias("n"),
            F.col("n_roundtrip_ok").cast("long").alias("n_roundtrip_ok"),
            "mean_hamming_consecutive",
        )
    )


# ---------------------------------------------------------------------------
# Round-7 wave 190: Theil's U forecast skill (seasonal vs plain naive)
# ---------------------------------------------------------------------------


@_q(
    "events_theil_u_skill",
    """
    WITH d AS (SELECT CAST(ts AS DATE) AS day,
                      CAST(count(*) AS DOUBLE) AS x
               FROM events GROUP BY 1),
    l AS (SELECT x,
                 lag(x, 1) OVER (ORDER BY day) AS naive,
                 lag(x, 7) OVER (ORDER BY day) AS snaive
          FROM d),
    e AS (SELECT x, naive, snaive FROM l
          WHERE naive IS NOT NULL AND snaive IS NOT NULL),
    s AS (SELECT count(*) AS n,
                 sqrt(avg(pow(x - naive, 2))) AS rmse_naive,
                 sqrt(avg(pow(x - snaive, 2))) AS rmse_snaive
          FROM e)
    SELECT CAST(n AS BIGINT) AS n_days,
           round(rmse_naive, 4) AS rmse_naive,
           round(rmse_snaive, 4) AS rmse_seasonal_naive,
           round(rmse_snaive / rmse_naive, 4) AS theil_u,
           rmse_snaive / rmse_naive < 1.0 AS weekly_structure_helps
    FROM s
    """,
)
def events_theil_u_skill(spark, sf_dir):
    """Theil's U forecast-skill ratio on daily event counts: RMSE of
    the seasonal-naive forecast (same weekday last week) over RMSE of
    the plain naive (yesterday) — U < 1 says weekly structure beats
    pure persistence, the five-second test that decides whether ANY
    seasonal model is worth fitting before events_forecast_backtest
    spends real effort (and the canonical denominator every fancy
    model must beat). Evaluated only where BOTH baselines exist, so
    the comparison is apples-to-apples. One bounded daily collapse,
    two lag windows, one aggregate."""
    e = _t(spark, sf_dir, "events")
    d = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("double").alias("x")
    )
    w = Window.orderBy("day")
    l = d.select(
        "x",
        F.lag("x", 1).over(w).alias("naive"),
        F.lag("x", 7).over(w).alias("snaive"),
    ).filter(F.col("naive").isNotNull() & F.col("snaive").isNotNull())
    s = l.agg(
        F.count(F.lit(1)).alias("n"),
        F.sqrt(
            F.avg(F.pow(F.col("x") - F.col("naive"), 2))
        ).alias("rmse_naive"),
        F.sqrt(
            F.avg(F.pow(F.col("x") - F.col("snaive"), 2))
        ).alias("rmse_snaive"),
    )
    u = F.col("rmse_snaive") / F.col("rmse_naive")
    return s.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(F.col("rmse_naive"), 4).alias("rmse_naive"),
        F.round(F.col("rmse_snaive"), 4).alias("rmse_seasonal_naive"),
        F.round(u, 4).alias("theil_u"),
        (u < 1.0).alias("weekly_structure_helps"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 191: log-rank test between two conversion cohorts
# ---------------------------------------------------------------------------


@_q(
    "events_logrank_test",
    """
    WITH s AS (SELECT user_id, min(ts) AS t0 FROM events
               WHERE event_type = 'signup' GROUP BY user_id),
    p AS (SELECT user_id, min(ts) AS t1 FROM events
          WHERE event_type = 'purchase' GROUP BY user_id),
    horizon AS (SELECT max(ts) AS tmax FROM events),
    subj AS (SELECT s.user_id % 2 AS grp,
               CASE WHEN p.t1 IS NOT NULL AND p.t1 >= s.t0 THEN
                 date_diff('microsecond', s.t0, p.t1) / 1000000.0
               ELSE date_diff('microsecond', s.t0, h.tmax) / 1000000.0
               END AS dur,
               (p.t1 IS NOT NULL AND p.t1 >= s.t0) AS conv
             FROM s LEFT JOIN p ON s.user_id = p.user_id, horizon h),
    pv AS (SELECT dur,
                  count(*) AS n_all,
                  sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS n1,
                  sum(CASE WHEN conv THEN 1 ELSE 0 END) AS d_all,
                  sum(CASE WHEN conv AND grp = 1 THEN 1 ELSE 0 END)
                    AS d1
           FROM subj GROUP BY dur),
    rk AS (SELECT dur, d_all, d1,
                  sum(n_all) OVER (ORDER BY dur DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS n_risk,
                  sum(n1) OVER (ORDER BY dur DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS n1_risk
           FROM pv),
    terms AS (SELECT d1,
                     d_all * n1_risk / CAST(n_risk AS DOUBLE) AS e1,
                     CASE WHEN n_risk > 1 THEN
                       d_all * (n1_risk / CAST(n_risk AS DOUBLE))
                       * (1.0 - n1_risk / CAST(n_risk AS DOUBLE))
                       * (n_risk - d_all) / (n_risk - 1.0)
                     ELSE 0.0 END AS v
              FROM rk WHERE d_all > 0),
    agg AS (SELECT sum(d1) AS o1, sum(e1) AS e1, sum(v) AS v,
                   (SELECT count(*) FROM subj) AS n_subj,
                   (SELECT sum(CASE WHEN conv THEN 1 ELSE 0 END)
                    FROM subj) AS n_events
            FROM terms)
    SELECT CAST(n_subj AS BIGINT) AS n_subjects,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(o1 AS BIGINT) AS observed_grp1,
           round(e1, 4) AS expected_grp1,
           round(pow(o1 - e1, 2) / v, 4) AS logrank_chi2,
           pow(o1 - e1, 2) / v > 3.8415 AS reject_h0
    FROM agg
    """,
)
def events_logrank_test(spark, sf_dir):
    """Log-rank test between two signup cohorts (odd vs even user id):
    at every distinct event time compare group-1's observed
    conversions with its share of the risk set, accumulate O-E and
    the hypergeometric variance, chi2 = (O-E)^2/V against df=1 —
    THE survival-curve comparison test (the inferential companion to
    events_kaplan_meier's descriptive curves and Nelson-Aalen's
    hazard: 'do the two cohorts convert at the same rate, accounting
    for censoring'). Risk sets come from ONE descending cumulative
    window over the bounded distinct-duration table — no correlated
    subqueries, no quadratic risk-set recount; durations are
    microsecond-exact on both engines."""
    e = _t(spark, sf_dir, "events")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    h = e.agg(F.max("ts").alias("tmax"))
    conv = F.col("t1").isNotNull() & (F.col("t1") >= F.col("t0"))
    subj = (
        s.join(p, "user_id", "left")
        .join(F.broadcast(h))
        .select(
            (F.col("user_id") % 2).alias("grp"),
            F.when(
                conv,
                F.expr("timestampdiff(MICROSECOND, t0, t1)").cast(
                    "double"
                )
                / 1e6,
            )
            .otherwise(
                F.expr("timestampdiff(MICROSECOND, t0, tmax)").cast(
                    "double"
                )
                / 1e6
            )
            .alias("dur"),
            conv.alias("conv"),
        )
    )
    pv = subj.groupBy("dur").agg(
        F.count(F.lit(1)).alias("n_all"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("conv"), 1).otherwise(0)).alias("d_all"),
        F.sum(
            F.when(F.col("conv") & (F.col("grp") == 1), 1).otherwise(0)
        ).alias("d1"),
    )
    wdesc = Window.orderBy(F.col("dur").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    rk = pv.select(
        "d_all",
        "d1",
        F.sum("n_all").over(wdesc).alias("n_risk"),
        F.sum("n1").over(wdesc).alias("n1_risk"),
    ).filter(F.col("d_all") > 0)
    share = F.col("n1_risk") / F.col("n_risk").cast("double")
    terms = rk.select(
        "d1",
        (F.col("d_all") * share).alias("e1"),
        F.when(
            F.col("n_risk") > 1,
            F.col("d_all")
            * share
            * (F.lit(1.0) - share)
            * (F.col("n_risk") - F.col("d_all"))
            / (F.col("n_risk") - F.lit(1.0)),
        )
        .otherwise(F.lit(0.0))
        .alias("v"),
    )
    tot = subj.agg(
        F.count(F.lit(1)).alias("n_subj"),
        F.sum(F.when(F.col("conv"), 1).otherwise(0)).alias("n_events"),
    )
    agg = terms.agg(
        F.sum("d1").alias("o1"),
        F.sum("e1").alias("e1"),
        F.sum("v").alias("v"),
    ).join(F.broadcast(tot))
    chi2 = F.pow(F.col("o1") - F.col("e1"), 2) / F.col("v")
    return agg.select(
        F.col("n_subj").cast("long").alias("n_subjects"),
        F.col("n_events").cast("long").alias("n_events"),
        F.col("o1").cast("long").alias("observed_grp1"),
        F.round(F.col("e1"), 4).alias("expected_grp1"),
        F.round(chi2, 4).alias("logrank_chi2"),
        (chi2 > 3.8415).alias("reject_h0"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 192: Breusch-Pagan heteroskedasticity test
# ---------------------------------------------------------------------------


@_q(
    "agg_breusch_pagan",
    """
    WITH per AS (SELECT l_orderkey, sum(l_quantity) AS qty
                 FROM lineitem GROUP BY 1),
    j AS (SELECT CAST(per.qty AS DOUBLE) AS x, o.o_totalprice AS y
          FROM per JOIN orders o ON per.l_orderkey = o.o_orderkey),
    fit AS (SELECT regr_slope(y, x) AS b1, regr_intercept(y, x) AS b0
            FROM j),
    e AS (SELECT j.x,
                 pow(j.y - (fit.b0 + fit.b1 * j.x), 2) AS e2
          FROM j CROSS JOIN fit),
    bp AS (SELECT count(*) AS n,
                  pow(corr(e2, x), 2) AS r2
           FROM e)
    SELECT CAST(n AS BIGINT) AS n,
           round(r2, 6) AS r2_e2_on_x,
           round(n * r2, 4) AS bp_stat,
           n * r2 > 3.8415 AS heteroskedastic
    FROM bp
    """,
)
def agg_breusch_pagan(spark, sf_dir):
    """Breusch-Pagan heteroskedasticity test on the quantity -> price
    OLS fit: regress SQUARED residuals on the predictor (one-regressor
    form: BP = n * corr(e^2, x)^2, chi-square df=1) — the check that
    decides whether the fit's error bars (and the Cook's-distance and
    conformal entries built on the same model) can use constant-
    variance formulas or need robust ones. Heteroskedastic errors
    don't bias the slope but silently break every naive interval. The
    model rides a broadcast one-row frame; squared residuals are a
    shuffle-free projection; the statistic is one corr aggregate."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    per = l.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("qty"))
    j = per.join(o, per.l_orderkey == o.o_orderkey).select(
        F.col("qty").cast("double").alias("x"),
        F.col("o_totalprice").alias("y"),
    )
    fit = j.agg(
        F.regr_slope("y", "x").alias("b1"),
        F.regr_intercept("y", "x").alias("b0"),
    )
    e2 = j.join(F.broadcast(fit)).select(
        "x",
        F.pow(
            F.col("y") - (F.col("b0") + F.col("b1") * F.col("x")), 2
        ).alias("e2"),
    )
    bp = e2.agg(
        F.count(F.lit(1)).alias("n"),
        F.pow(F.corr("e2", "x"), 2).alias("r2"),
    )
    stat = F.col("n") * F.col("r2")
    return bp.select(
        F.col("n").cast("long").alias("n"),
        F.round(F.col("r2"), 6).alias("r2_e2_on_x"),
        F.round(stat, 4).alias("bp_stat"),
        (stat > 3.8415).alias("heteroskedastic"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 193: CCNet-style quality buckets (head / middle / tail)
# ---------------------------------------------------------------------------


@_q(
    "corpus_ccnet_buckets",
    f"""
    WITH lm AS (SELECT * FROM ({{LM}}) q),
    toks AS (SELECT doc_id, source,
                    CAST(len({_WORDS}) AS BIGINT) AS n_tokens
             FROM documents),
    sc AS (SELECT toks.source, toks.n_tokens,
                  round(lm.lm_score, 6) AS s
           FROM lm JOIN toks USING (doc_id)
           WHERE lm.lm_score IS NOT NULL),
    mm AS (SELECT min(s) AS s0, max(s) AS s1 FROM sc),
    b AS (SELECT source, n_tokens,
                 CASE least(2, CAST(floor((s - s0) / (s1 - s0) * 3)
                                    AS BIGINT))
                      WHEN 2 THEN 'head'
                      WHEN 1 THEN 'middle'
                      ELSE 'tail' END AS bucket,
                 s
          FROM sc CROSS JOIN mm)
    SELECT source, bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS token_mass,
           round(avg(s), 4) AS mean_lm_score
    FROM b GROUP BY source, bucket
    ORDER BY source, bucket
    """.replace("{LM}", "__LM_ORACLE__"),
)
def corpus_ccnet_buckets(spark, sf_dir):
    """CCNet-style quality bucketing: every document scored by the
    corpus bigram LM (the text_bigram_lm_score pipeline, one code
    path), then cut into head/middle/tail thirds of the score range
    (width-based on the ROUNDED score — deterministic, no ntile
    tie-split) and reported per source as document counts and TOKEN
    mass — the table the CCNet curation recipe keeps (train on head,
    sample middle, drop tail), with token mass because sampling
    budgets are token-denominated, not document-denominated. The LM
    model tables broadcast; the bucket cut is one conditional
    aggregate."""
    from boann_ocsf_security_data_platform_spark.operators.text import (
        bigram_lm_score,
    )

    docs = _t(spark, sf_dir, "documents")
    # `source` rides the LM's OWN doc-grain join (carry_cols): the old
    # second doc_id join fused another SMJ + docs scan into the scoring
    # pipeline (round-12 sorter-pipeline scan: 5 sorters in one region
    # at sf10; this entry's scored frame had already OOM'd a co-tenant
    # sweep at 10x). The token count no longer rides anything: every doc
    # that survives the lm_score filter has >= 2 tokens, and for k >= 2
    # tokens the bigram-instance count is exactly k - 1, so
    # n_tokens = n_bigrams + 1 — an exact integer identity that deletes
    # the third full tokenize pass the old size(tokens(text)) carry
    # column cost (round-13, guide §2.3: don't recompute in a scan what
    # an existing aggregate already holds). `sc` also feeds BOTH the
    # broadcast min/max cut frame and the bucket aggregate —
    # unpersisted, the broadcast side recomputed the entire bigram-LM
    # pipeline — so pin it above the docs gate, the parts_abc_xyz
    # discipline.
    ccnet_pin = _gates.pin_shuffle_join(_table_count(spark, sf_dir, "documents"))
    docs2 = docs.select("doc_id", "text", "source")
    sc = bigram_lm_score(
        docs2, pin_shuffle_join=ccnet_pin, carry_cols=("source",)
    ).filter(F.col("lm_score").isNotNull()).select(
        "doc_id",
        "source",
        (F.col("n_bigrams") + F.lit(1)).cast("long").alias("n_tokens"),
        F.round("lm_score", 6).alias("s"),
    ).persist(
        StorageLevel.DISK_ONLY if ccnet_pin else StorageLevel.MEMORY_AND_DISK_DESER
    )
    mm = sc.agg(F.min("s").alias("s0"), F.max("s").alias("s1"))
    tier = F.least(
        F.lit(2),
        F.floor(
            (F.col("s") - F.col("s0"))
            / (F.col("s1") - F.col("s0"))
            * 3
        ),
    )
    b = sc.join(F.broadcast(mm)).select(
        "source",
        "n_tokens",
        "s",
        F.when(tier == 2, "head")
        .when(tier == 1, "middle")
        .otherwise("tail")
        .alias("bucket"),
    )
    return (
        b.groupBy("source", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("token_mass"),
            F.round(F.avg("s"), 4).alias("mean_lm_score"),
        )
        .select(
            "source",
            "bucket",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("token_mass").cast("long").alias("token_mass"),
            "mean_lm_score",
        )
        .orderBy("source", "bucket")
    )


# patch the LM oracle into the bucket oracle now that both are registered
ORACLE["corpus_ccnet_buckets"] = ORACLE["corpus_ccnet_buckets"].replace(
    "__LM_ORACLE__", ORACLE["text_bigram_lm_score"]
)


# ---------------------------------------------------------------------------
# Round-7 wave 194: Bartlett test of equal variances
# ---------------------------------------------------------------------------


@_q(
    "agg_bartlett_test",
    """
    WITH j AS (SELECT c.c_mktsegment AS g, o.o_totalprice AS v
               FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
    s AS (SELECT g, count(*) AS n, var_samp(v) AS s2 FROM j GROUP BY g),
    t AS (SELECT sum(n) AS nn, count(*) AS k,
                 sum((n - 1) * s2) / (sum(n) - count(*)) AS sp2,
                 sum((n - 1) * ln(s2)) AS sum_ln,
                 sum(1.0 / (n - 1)) AS inv_sum
          FROM s),
    m AS (SELECT nn, k,
                 (nn - k) * ln(sp2) - sum_ln AS mstat,
                 1.0 + (inv_sum - 1.0 / (nn - k))
                     / (3.0 * (k - 1)) AS c
          FROM t)
    SELECT CAST(k AS BIGINT) AS k_groups, CAST(nn AS BIGINT) AS n,
           round(mstat / c, 4) AS bartlett_chi2,
           CAST(k - 1 AS BIGINT) AS dof,
           mstat / c > 9.4877 AS reject_equal_variances
    FROM m
    """,
)
def agg_bartlett_test(spark, sf_dir):
    """Bartlett test of equal price variances across the five market
    segments: chi2 = [(N-k) ln Sp^2 - sum (n_i-1) ln s_i^2] / C with
    the standard small-sample correction C — the PARAMETRIC member of
    the variance-homogeneity family (Brown-Forsythe is its robust
    sibling: Bartlett is more powerful under normality and famously
    fragile without it, which is exactly why reporting both is the
    textbook move). One 5-row group-moment aggregate, scalar
    arithmetic after."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("g"),
        F.col("o_totalprice").alias("v"),
    )
    s = j.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"), F.var_samp("v").alias("s2")
    )
    t = s.agg(
        F.sum("n").alias("nn"),
        F.count(F.lit(1)).alias("k"),
        (
            F.sum((F.col("n") - 1) * F.col("s2"))
            / (F.sum("n") - F.count(F.lit(1)))
        ).alias("sp2"),
        F.sum((F.col("n") - 1) * F.log("s2")).alias("sum_ln"),
        F.sum(F.lit(1.0) / (F.col("n") - 1)).alias("inv_sum"),
    )
    nn, k = F.col("nn").cast("double"), F.col("k").cast("double")
    mstat = (nn - k) * F.log("sp2") - F.col("sum_ln")
    cc = F.lit(1.0) + (
        F.col("inv_sum") - F.lit(1.0) / (nn - k)
    ) / (F.lit(3.0) * (k - 1))
    return t.select(
        F.col("k").cast("long").alias("k_groups"),
        F.col("nn").cast("long").alias("n"),
        F.round(mstat / cc, 4).alias("bartlett_chi2"),
        (F.col("k") - 1).cast("long").alias("dof"),
        (mstat / cc > 9.4877).alias("reject_equal_variances"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 195: Hodges-Lehmann two-sample shift estimator
# ---------------------------------------------------------------------------


@_q(
    "agg_hodges_lehmann_shift",
    """
    WITH j AS (SELECT round(o.o_totalprice / 100.0) * 100.0 AS v,
                      c.c_mktsegment = 'BUILDING' AS is_a
               FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
               WHERE c.c_mktsegment IN ('BUILDING', 'AUTOMOBILE')),
    a AS (SELECT v, count(*) AS ca FROM j WHERE is_a GROUP BY v),
    b AS (SELECT v, count(*) AS cb FROM j WHERE NOT is_a GROUP BY v),
    d AS (SELECT a.v - b.v AS diff,
                 CAST(a.ca AS BIGINT) * b.cb AS w
          FROM a CROSS JOIN b),
    dd AS (SELECT diff, sum(w) AS w FROM d GROUP BY diff),
    c AS (SELECT diff, w,
                 sum(w) OVER (ORDER BY diff
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cw,
                 sum(w) OVER () AS tw
          FROM dd),
    med AS (SELECT diff FROM c
            WHERE cw >= (tw + 1) / 2.0
            ORDER BY diff LIMIT 1),
    stats AS (SELECT (SELECT sum(ca) FROM a) AS n_a,
                     (SELECT sum(cb) FROM b) AS n_b,
                     (SELECT sum(w) FROM dd) AS n_pairs)
    SELECT CAST(n_a AS BIGINT) AS n_building,
           CAST(n_b AS BIGINT) AS n_automobile,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           round((SELECT diff FROM med), 2) AS hl_shift
    FROM stats
    """,
)
def agg_hodges_lehmann_shift(spark, sf_dir):
    """Hodges-Lehmann two-sample shift estimator: the median of ALL
    pairwise differences between BUILDING and AUTOMOBILE order prices
    — the robust 'how much higher' ESTIMATE that accompanies the
    Mann-Whitney test already in the family (MW says the groups
    differ; HL says by how many dollars, 50% breakdown point, no
    normality). Scale discipline: both samples collapse to $100-binned
    (value, count) tables first, so the pairwise-difference space is a
    bounded weighted cross of two ~1e3-row domains — never raw-row
    n_a x n_b — and the median is a cumulative-weight cut over the
    distinct-difference table (lower weighted median, deterministic
    on both engines)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = (
        o.join(c, o.o_custkey == c.c_custkey)
        .filter(F.col("c_mktsegment").isin(["BUILDING", "AUTOMOBILE"]))
        .select(
            (F.round(F.col("o_totalprice") / 100.0) * 100.0).alias("v"),
            (F.col("c_mktsegment") == "BUILDING").alias("is_a"),
        )
    )
    a = j.filter(F.col("is_a")).groupBy("v").agg(
        F.count(F.lit(1)).alias("ca")
    )
    b = j.filter(~F.col("is_a")).groupBy("v").agg(
        F.count(F.lit(1)).alias("cb")
    )
    # broadcast the binned domain explicitly (round-11 sf10 scan find):
    # b is bounded by the $100-binned price DOMAIN (~1e3 rows), but its
    # fact-scaled estimate flipped the weighted cross to CartesianProduct
    d = (
        a.crossJoin(F.broadcast(b.select(F.col("v").alias("vb"), "cb")))
        .select(
            (F.col("v") - F.col("vb")).alias("diff"),
            (F.col("ca").cast("long") * F.col("cb")).alias("w"),
        )
        .groupBy("diff")
        .agg(F.sum("w").alias("w"))
    )
    wc = Window.orderBy("diff").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cmed = d.select(
        "diff",
        F.sum("w").over(wc).alias("cw"),
        F.sum("w").over(wt).alias("tw"),
    )
    med = (
        cmed.filter(F.col("cw") >= (F.col("tw") + 1) / 2.0)
        .orderBy("diff")
        .limit(1)
        .select(F.col("diff").alias("hl"))
    )
    stats = (
        a.agg(F.sum("ca").alias("n_a"))
        .join(b.agg(F.sum("cb").alias("n_b")))
        .join(d.agg(F.sum("w").alias("n_pairs")))
    )
    return stats.join(F.broadcast(med)).select(
        F.col("n_a").cast("long").alias("n_building"),
        F.col("n_b").cast("long").alias("n_automobile"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.round(F.col("hl"), 2).alias("hl_shift"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 196: np-chart statistical process control
# ---------------------------------------------------------------------------


@_q(
    "events_np_chart",
    """
    WITH d AS (SELECT CAST(ts AS DATE) AS day,
                      count(*) AS n,
                      sum(CASE WHEN event_type = 'error' THEN 1
                               ELSE 0 END) AS x
               FROM events GROUP BY 1),
    p AS (SELECT CAST(sum(x) AS DOUBLE) / sum(n) AS pbar,
                 avg(CAST(n AS DOUBLE)) AS nbar,
                 count(*) AS days
          FROM d),
    lim AS (SELECT pbar, nbar, days,
                   nbar * pbar AS center,
                   nbar * pbar
                   + 3.0 * sqrt(nbar * pbar * (1 - pbar)) AS ucl,
                   greatest(0.0, nbar * pbar
                   - 3.0 * sqrt(nbar * pbar * (1 - pbar))) AS lcl
            FROM p),
    oc AS (SELECT sum(CASE WHEN d.x > lim.ucl THEN 1 ELSE 0 END)
               AS n_above,
                  sum(CASE WHEN d.x < lim.lcl THEN 1 ELSE 0 END)
               AS n_below
           FROM d CROSS JOIN lim)
    SELECT CAST(days AS BIGINT) AS n_days,
           round(pbar, 6) AS p_bar,
           round(center, 4) AS center_line,
           round(ucl, 4) AS ucl,
           round(lcl, 4) AS lcl,
           CAST(n_above AS BIGINT) AS days_above_ucl,
           CAST(n_below AS BIGINT) AS days_below_lcl,
           n_above + n_below = 0 AS in_control
    FROM lim CROSS JOIN oc
    """,
)
def events_np_chart(spark, sf_dir):
    """np-chart statistical process control on daily error counts:
    center line n-bar*p-bar with 3-sigma binomial limits, and the
    count of out-of-control days on each side — the Shewhart chart
    for 'defectives per fixed-ish sample' that complements CUSUM
    (slow drifts) and the z-score alerts (point shocks) with the
    classical sustained-fraction view a reliability review expects.
    One bounded daily collapse; limits ride a broadcast one-row
    frame; the verdict is one conditional aggregate."""
    e = _t(spark, sf_dir, "events")
    d = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("x"),
    )
    p = d.agg(
        (F.sum("x").cast("double") / F.sum("n")).alias("pbar"),
        F.avg(F.col("n").cast("double")).alias("nbar"),
        F.count(F.lit(1)).alias("days"),
    )
    center = F.col("nbar") * F.col("pbar")
    sig = F.sqrt(
        F.col("nbar") * F.col("pbar") * (1 - F.col("pbar"))
    )
    lim = p.select(
        "pbar",
        "days",
        center.alias("center"),
        (center + 3.0 * sig).alias("ucl"),
        F.greatest(F.lit(0.0), center - 3.0 * sig).alias("lcl"),
    )
    oc = d.join(F.broadcast(lim)).agg(
        F.sum(
            F.when(F.col("x") > F.col("ucl"), 1).otherwise(0)
        ).alias("n_above"),
        F.sum(
            F.when(F.col("x") < F.col("lcl"), 1).otherwise(0)
        ).alias("n_below"),
    )
    return lim.join(F.broadcast(oc)).select(
        F.col("days").cast("long").alias("n_days"),
        F.round(F.col("pbar"), 6).alias("p_bar"),
        F.round(F.col("center"), 4).alias("center_line"),
        F.round(F.col("ucl"), 4).alias("ucl"),
        F.round(F.col("lcl"), 4).alias("lcl"),
        F.col("n_above").cast("long").alias("days_above_ucl"),
        F.col("n_below").cast("long").alias("days_below_lcl"),
        ((F.col("n_above") + F.col("n_below")) == 0).alias("in_control"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 197: Laspeyres / Paasche / Fisher price indices
# ---------------------------------------------------------------------------


@_q(
    "parts_price_index",
    """
    WITH py AS (SELECT year(CAST(l_shipdate AS DATE)) AS yr,
                       l_partkey AS pk,
                       sum(l_extendedprice) / sum(l_quantity) AS p,
                       sum(l_quantity) AS q
                FROM lineitem
                WHERE l_quantity > 0 GROUP BY 1, 2),
    base AS (SELECT pk, p AS p0, q AS q0 FROM py WHERE yr = 1995),
    cur AS (SELECT yr, pk, p, q FROM py WHERE yr <> 1995),
    j AS (SELECT cur.yr, cur.p, cur.q, base.p0, base.q0
          FROM cur JOIN base USING (pk)),
    ix AS (SELECT yr,
                  sum(p * q0) / sum(p0 * q0) AS laspeyres,
                  sum(p * q) / sum(p0 * q) AS paasche,
                  count(*) AS n_parts
           FROM j GROUP BY yr)
    SELECT CAST(yr AS BIGINT) AS yr,
           CAST(n_parts AS BIGINT) AS n_parts,
           round(laspeyres, 6) AS laspeyres,
           round(paasche, 6) AS paasche,
           round(sqrt(laspeyres * paasche), 6) AS fisher
    FROM ix ORDER BY yr
    """,
)
def parts_price_index(spark, sf_dir):
    """Laspeyres, Paasche, and Fisher price indices per year against
    the 1995 base basket: unit prices per (year, part) from extended
    price over quantity, Laspeyres weights by BASE-year quantities
    (what did the old basket cost now), Paasche by CURRENT-year
    (what does the new basket cost then), Fisher their geometric mean
    — index-number theory, the inflation/price-drift measurement a
    pricing team runs on its own catalog (parts_price_elasticity asks
    how demand responds; this asks what actually happened to prices).
    Two scans collapse to the bounded (year, part) domain; indices
    are per-year weighted aggregates of the base join."""
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    py = l.groupBy(
        F.year(F.col("l_shipdate").cast("date")).alias("yr"),
        F.col("l_partkey").alias("pk"),
    ).agg(
        (F.sum("l_extendedprice") / F.sum("l_quantity")).alias("p"),
        F.sum("l_quantity").alias("q"),
    )
    base = py.filter(F.col("yr") == 1995).select(
        "pk", F.col("p").alias("p0"), F.col("q").alias("q0")
    )
    cur = py.filter(F.col("yr") != 1995)
    j = cur.join(base, "pk")
    ix = j.groupBy("yr").agg(
        (
            F.sum(F.col("p") * F.col("q0"))
            / F.sum(F.col("p0") * F.col("q0"))
        ).alias("laspeyres"),
        (
            F.sum(F.col("p") * F.col("q"))
            / F.sum(F.col("p0") * F.col("q"))
        ).alias("paasche"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return ix.select(
        F.col("yr").cast("long").alias("yr"),
        F.col("n_parts").cast("long").alias("n_parts"),
        F.round(F.col("laspeyres"), 6).alias("laspeyres"),
        F.round(F.col("paasche"), 6).alias("paasche"),
        F.round(
            F.sqrt(F.col("laspeyres") * F.col("paasche")), 6
        ).alias("fisher"),
    ).orderBy("yr")


# ---------------------------------------------------------------------------
# Round-7 wave 198: McNemar paired-classifier test
# ---------------------------------------------------------------------------


@_q(
    "agg_mcnemar_test",
    """
    WITH per AS (SELECT l_orderkey, count(*) AS nl,
                        sum(l_quantity) AS qty
                 FROM lineitem GROUP BY 1),
    j AS (SELECT o.o_totalprice >= 150000 AS truth,
                 per.qty >= 150 AS pred_qty,
                 per.nl >= 5 AS pred_lines
          FROM per JOIN orders o ON per.l_orderkey = o.o_orderkey),
    cls AS (SELECT (pred_qty = truth) AS a_right,
                   (pred_lines = truth) AS b_right
            FROM j),
    cell AS (SELECT
               sum(CASE WHEN a_right AND NOT b_right THEN 1 ELSE 0 END)
                 AS b,
               sum(CASE WHEN NOT a_right AND b_right THEN 1 ELSE 0 END)
                 AS c,
               sum(CASE WHEN a_right AND b_right THEN 1 ELSE 0 END)
                 AS both_right,
               count(*) AS n
             FROM cls)
    SELECT CAST(n AS BIGINT) AS n,
           CAST(b AS BIGINT) AS only_qty_right,
           CAST(c AS BIGINT) AS only_lines_right,
           round(pow(abs(b - c) - 1.0, 2) / (b + c), 4)
             AS mcnemar_chi2,
           pow(abs(b - c) - 1.0, 2) / (b + c) > 3.8415 AS reject_h0
    FROM cell
    """,
)
def agg_mcnemar_test(spark, sf_dir):
    """McNemar paired-classifier test: two rule classifiers for the
    high-price label (quantity >= 150 vs line-count >= 5) evaluated on
    the SAME orders, tested on their DISCORDANT cells only — chi2 =
    (|b-c|-1)^2/(b+c) with continuity correction. The correct way to
    compare two models on one eval set (a two-proportion z on the
    marginal accuracies ignores the pairing and loses power —
    agg_two_proportion_ztest is for independent samples; this is its
    paired sibling, the A/B test every model-swap decision should
    use). One conditional aggregate over the joined fact."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    per = l.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("nl"), F.sum("l_quantity").alias("qty")
    )
    j = per.join(o, per.l_orderkey == o.o_orderkey).select(
        (F.col("o_totalprice") >= 150000).alias("truth"),
        (F.col("qty") >= 150).alias("pred_qty"),
        (F.col("nl") >= 5).alias("pred_lines"),
    )
    cls = j.select(
        (F.col("pred_qty") == F.col("truth")).alias("a_right"),
        (F.col("pred_lines") == F.col("truth")).alias("b_right"),
    )
    cell = cls.agg(
        F.sum(
            F.when(F.col("a_right") & ~F.col("b_right"), 1).otherwise(0)
        ).alias("b"),
        F.sum(
            F.when(~F.col("a_right") & F.col("b_right"), 1).otherwise(0)
        ).alias("c"),
        F.count(F.lit(1)).alias("n"),
    )
    chi2 = F.pow(F.abs(F.col("b") - F.col("c")) - 1.0, 2) / (
        F.col("b") + F.col("c")
    )
    return cell.select(
        F.col("n").cast("long").alias("n"),
        F.col("b").cast("long").alias("only_qty_right"),
        F.col("c").cast("long").alias("only_lines_right"),
        F.round(chi2, 4).alias("mcnemar_chi2"),
        (chi2 > 3.8415).alias("reject_h0"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 199: newsvendor service-level stock targets
# ---------------------------------------------------------------------------


@_q(
    "orders_newsvendor_levels",
    """
    WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
                      CAST(count(*) AS BIGINT) AS demand
               FROM orders GROUP BY 1),
    rk AS (SELECT demand,
                  row_number() OVER (ORDER BY demand, day) AS rn,
                  count(*) OVER () AS n
           FROM d),
    sl AS (SELECT unnest([0.80, 0.90, 0.95, 0.99]) AS service_level),
    pick AS (SELECT sl.service_level, rk.demand
             FROM sl JOIN rk
               ON rk.rn = CAST(ceil(sl.service_level * rk.n) AS BIGINT)),
    mean_d AS (SELECT avg(CAST(demand AS DOUBLE)) AS mu FROM d)
    SELECT round(service_level, 2) AS service_level,
           CAST(demand AS BIGINT) AS stock_level,
           round(demand / mu, 4) AS safety_factor
    FROM pick CROSS JOIN mean_d
    ORDER BY service_level
    """,
)
def orders_newsvendor_levels(spark, sf_dir):
    """Newsvendor service-level stock targets: the daily order-count
    demand level that covers 80/90/95/99% of days — the critical-
    fractile answer to 'how much capacity/stock do I provision', read
    straight off the EMPIRICAL demand distribution as an order
    statistic (row_number cut with day tie-break — exact, no
    percentile-interpolation divergence, the conformal entry's
    discipline), with the safety factor over mean demand. One bounded
    daily collapse, one rank window, a 4-literal join."""
    o = _t(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("demand")
    )
    w = Window.orderBy("demand", "day")
    rk = d.select(
        "demand",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1))
        .over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("n"),
    )
    sl = spark.createDataFrame(
        [(0.80,), (0.90,), (0.95,), (0.99,)], "service_level double"
    )
    pick = F.broadcast(sl).join(
        rk,
        rk.rn
        == F.ceil(F.col("service_level") * F.col("n")).cast("long"),
    )
    mu = d.agg(F.avg(F.col("demand").cast("double")).alias("mu"))
    return (
        pick.join(F.broadcast(mu))
        .select(
            F.round(F.col("service_level"), 2).alias("service_level"),
            F.col("demand").cast("long").alias("stock_level"),
            F.round(F.col("demand") / F.col("mu"), 4).alias(
                "safety_factor"
            ),
        )
        .orderBy("service_level")
    )


# ---------------------------------------------------------------------------
# Round-7 wave 200: dataset card (cross-table inventory)
# ---------------------------------------------------------------------------


@_q(
    "profile_dataset_card",
    """
    SELECT * FROM (
      SELECT 'customer' AS tbl,
             (SELECT CAST(count(*) AS BIGINT) FROM customer) AS n_rows,
             (SELECT CAST(count(DISTINCT c_custkey) AS BIGINT)
              FROM customer) AS n_keys
      UNION ALL SELECT 'orders', (SELECT count(*) FROM orders),
             (SELECT count(DISTINCT o_orderkey) FROM orders)
      UNION ALL SELECT 'lineitem', (SELECT count(*) FROM lineitem),
             (SELECT count(DISTINCT l_orderkey) FROM lineitem)
      UNION ALL SELECT 'part', (SELECT count(*) FROM part),
             (SELECT count(DISTINCT p_partkey) FROM part)
      UNION ALL SELECT 'supplier', (SELECT count(*) FROM supplier),
             (SELECT count(DISTINCT s_suppkey) FROM supplier)
      UNION ALL SELECT 'events', (SELECT count(*) FROM events),
             (SELECT count(DISTINCT user_id) FROM events)
      UNION ALL SELECT 'documents', (SELECT count(*) FROM documents),
             (SELECT count(DISTINCT doc_id) FROM documents)
      UNION ALL SELECT 'embeddings', (SELECT count(*) FROM embeddings),
             (SELECT count(DISTINCT vec_id) FROM embeddings)
      UNION ALL SELECT 'nation', (SELECT count(*) FROM nation),
             (SELECT count(DISTINCT n_nationkey) FROM nation)
      UNION ALL SELECT 'region', (SELECT count(*) FROM region),
             (SELECT count(DISTINCT r_regionkey) FROM region))
    ORDER BY tbl
    """,
)
def profile_dataset_card(spark, sf_dir):
    """Dataset card: one row per table with row count and
    key/entity cardinality across all ten tables — the first page of
    any data-platform handoff (and the sanity row the driver's own
    scale factors can be read off directly). Each count is one
    columnar aggregate; key cardinalities use the table's natural
    entity key (fact tables report their parent-entity cardinality,
    e.g. lineitem -> distinct orders, events -> distinct users)."""
    specs = [
        ("customer", "c_custkey"),
        ("orders", "o_orderkey"),
        ("lineitem", "l_orderkey"),
        ("part", "p_partkey"),
        ("supplier", "s_suppkey"),
        ("events", "user_id"),
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
        ("nation", "n_nationkey"),
        ("region", "r_regionkey"),
    ]
    rows = []
    for tbl, key in specs:
        df = _t(spark, sf_dir, tbl)
        agg = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(key).alias("k"),
        ).collect()[0]
        rows.append((tbl, agg.n, agg.k))
    return spark.createDataFrame(
        sorted(rows), "tbl string, n_rows long, n_keys long"
    )


# ---------------------------------------------------------------------------
# Round-7 wave 201: Cochran's Q test across three classifiers
# ---------------------------------------------------------------------------


@_q(
    "agg_cochran_q_test",
    """
    WITH per AS (SELECT l_orderkey, count(*) AS nl,
                        sum(l_quantity) AS qty,
                        max(l_extendedprice) AS mx
                 FROM lineitem GROUP BY 1),
    j AS (SELECT o.o_totalprice >= 150000 AS truth,
                 CASE WHEN (per.qty >= 150)
                      = (o.o_totalprice >= 150000)
                      THEN 1 ELSE 0 END AS r1,
                 CASE WHEN (per.nl >= 5)
                      = (o.o_totalprice >= 150000)
                      THEN 1 ELSE 0 END AS r2,
                 CASE WHEN (per.mx >= 40000)
                      = (o.o_totalprice >= 150000)
                      THEN 1 ELSE 0 END AS r3
          FROM per JOIN orders o ON per.l_orderkey = o.o_orderkey),
    s AS (SELECT sum(r1) AS g1, sum(r2) AS g2, sum(r3) AS g3,
                 sum(r1 + r2 + r3) AS sum_l,
                 sum((r1 + r2 + r3) * (r1 + r2 + r3)) AS sum_l2,
                 count(*) AS n
          FROM j),
    q AS (SELECT n, g1, g2, g3,
                 2.0 * (3.0 * (g1 * g1 + g2 * g2 + g3 * g3)
                        - CAST(sum_l AS DOUBLE) * sum_l)
                 / (3.0 * sum_l - sum_l2) AS qstat
          FROM s)
    SELECT CAST(n AS BIGINT) AS n,
           CAST(g1 AS BIGINT) AS correct_qty_rule,
           CAST(g2 AS BIGINT) AS correct_lines_rule,
           CAST(g3 AS BIGINT) AS correct_maxprice_rule,
           round(qstat, 4) AS cochran_q,
           qstat > 5.9915 AS reject_h0
    FROM q
    """,
)
def agg_cochran_q_test(spark, sf_dir):
    """Cochran's Q test across THREE rule classifiers evaluated on the
    same orders (quantity, line-count, and max-line-price rules for
    the high-price label): Q = (k-1)[k*sum G_j^2 - (sum G_j)^2] /
    [k*sum L_i - sum L_i^2] against chi-square df=k-1=2 — the
    k-classifier generalization of McNemar (pairwise tests inflate the
    family-wise error; Q is the omnibus you run FIRST, then McNemar
    pairs only if it rejects — the same omnibus->posthoc discipline
    as ANOVA->Tukey). One conditional aggregate computes every term."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    per = l.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("nl"),
        F.sum("l_quantity").alias("qty"),
        F.max("l_extendedprice").alias("mx"),
    )
    truth = F.col("o_totalprice") >= 150000
    j = per.join(o, per.l_orderkey == o.o_orderkey).select(
        F.when((F.col("qty") >= 150) == truth, 1).otherwise(0).alias("r1"),
        F.when((F.col("nl") >= 5) == truth, 1).otherwise(0).alias("r2"),
        F.when((F.col("mx") >= 40000) == truth, 1)
        .otherwise(0)
        .alias("r3"),
    )
    li = F.col("r1") + F.col("r2") + F.col("r3")
    s = j.agg(
        F.sum("r1").alias("g1"),
        F.sum("r2").alias("g2"),
        F.sum("r3").alias("g3"),
        F.sum(li).alias("sum_l"),
        F.sum(li * li).alias("sum_l2"),
        F.count(F.lit(1)).alias("n"),
    )
    qstat = (
        F.lit(2.0)
        * (
            F.lit(3.0)
            * (
                F.col("g1") * F.col("g1")
                + F.col("g2") * F.col("g2")
                + F.col("g3") * F.col("g3")
            )
            - F.col("sum_l").cast("double") * F.col("sum_l")
        )
        / (F.lit(3.0) * F.col("sum_l") - F.col("sum_l2"))
    )
    return s.select(
        F.col("n").cast("long").alias("n"),
        F.col("g1").cast("long").alias("correct_qty_rule"),
        F.col("g2").cast("long").alias("correct_lines_rule"),
        F.col("g3").cast("long").alias("correct_maxprice_rule"),
        F.round(qstat, 4).alias("cochran_q"),
        (qstat > 5.9915).alias("reject_h0"),
    )


# ---------------------------------------------------------------------------
# Round-7 wave 202: economic order quantity analysis
# ---------------------------------------------------------------------------


@_q(
    "parts_eoq_analysis",
    """
    WITH d AS (SELECT p.p_partkey AS pk,
                      sum(l.l_quantity) AS annual_d,
                      avg(l.l_extendedprice / l.l_quantity) AS unit_cost
               FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
               WHERE year(CAST(l.l_shipdate AS DATE)) = 1995
                 AND l.l_quantity > 0
               GROUP BY 1),
    eoq AS (SELECT pk, annual_d, unit_cost,
                   sqrt(2.0 * annual_d * 100.0
                        / (0.2 * unit_cost)) AS eoq,
                   annual_d / sqrt(2.0 * annual_d * 100.0
                                   / (0.2 * unit_cost)) AS n_orders
            FROM d WHERE annual_d > 0),
    b AS (SELECT least(4, CAST(floor(n_orders) AS BIGINT)) AS ord_bin,
                 eoq, annual_d
          FROM eoq)
    SELECT CAST(ord_bin AS BIGINT) AS orders_per_year_bin,
           CAST(count(*) AS BIGINT) AS n_parts,
           round(avg(eoq), 2) AS mean_eoq_units,
           round(avg(annual_d), 2) AS mean_annual_demand
    FROM b GROUP BY ord_bin ORDER BY ord_bin
    """,
)
def parts_eoq_analysis(spark, sf_dir):
    """Economic order quantity per part (Wilson formula, $100 fixed
    order cost, 20% annual holding rate on unit cost): EOQ =
    sqrt(2*D*S/(h*c)) from 1995 demand, profiled by implied
    reorder frequency — the lot-sizing primitive that pairs with
    orders_newsvendor_levels (newsvendor: how much buffer; EOQ: how
    often and how big to order). Cost parameters are engine-identical
    literals; one scan to the per-part demand table, row-local
    closed-form, one bounded histogram."""
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    p = _t(spark, sf_dir, "part")
    d = (
        l.filter(F.year(F.col("l_shipdate").cast("date")) == 1995)
        .join(p, l.l_partkey == p.p_partkey)
        .groupBy(F.col("p_partkey").alias("pk"))
        .agg(
            F.sum("l_quantity").alias("annual_d"),
            F.avg(
                F.col("l_extendedprice") / F.col("l_quantity")
            ).alias("unit_cost"),
        )
        .filter(F.col("annual_d") > 0)
    )
    eoq = F.sqrt(
        F.lit(2.0)
        * F.col("annual_d")
        * 100.0
        / (F.lit(0.2) * F.col("unit_cost"))
    )
    e = d.select(
        eoq.alias("eoq"),
        (F.col("annual_d") / eoq).alias("n_orders"),
        "annual_d",
    )
    b = e.select(
        F.least(F.lit(4), F.floor(F.col("n_orders"))).alias("ord_bin"),
        "eoq",
        "annual_d",
    )
    return (
        b.groupBy("ord_bin")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.avg("eoq"), 2).alias("mean_eoq_units"),
            F.round(F.avg("annual_d"), 2).alias("mean_annual_demand"),
        )
        .select(
            F.col("ord_bin").cast("long").alias("orders_per_year_bin"),
            F.col("n_parts").cast("long").alias("n_parts"),
            "mean_eoq_units",
            "mean_annual_demand",
        )
        .orderBy("orders_per_year_bin")
    )


# ---------------------------------------------------------------------------
# Round-7 wave 203: Simpson's paradox probe
# ---------------------------------------------------------------------------


@_q(
    "agg_simpson_paradox_probe",
    """
    WITH per AS (SELECT l_orderkey, count(*) AS nl
                 FROM lineitem GROUP BY 1),
    j AS (SELECT c.c_mktsegment AS g,
                 CAST(per.nl AS DOUBLE) AS x,
                 o.o_totalprice / per.nl AS y
          FROM per JOIN orders o ON per.l_orderkey = o.o_orderkey
               JOIN customer c ON o.o_custkey = c.c_custkey),
    pooled AS (SELECT corr(x, y) AS r FROM j),
    grp AS (SELECT g, corr(x, y) AS r, count(*) AS n FROM j GROUP BY g),
    agree AS (SELECT
                sum(CASE WHEN sign(grp.r) = sign(pooled.r)
                         THEN 1 ELSE 0 END) AS n_agree,
                count(*) AS k,
                min(grp.r) AS min_r, max(grp.r) AS max_r
              FROM grp CROSS JOIN pooled)
    SELECT round((SELECT r FROM pooled), 6) AS pooled_corr,
           CAST(k AS BIGINT) AS n_groups,
           CAST(n_agree AS BIGINT) AS groups_agreeing_with_pooled,
           round(min_r, 6) AS min_group_corr,
           round(max_r, 6) AS max_group_corr,
           n_agree < k AS sign_reversal_somewhere,
           n_agree = 0 AS full_simpson_reversal
    FROM agree
    """,
)
def agg_simpson_paradox_probe(spark, sf_dir):
    """Simpson's-paradox probe: the pooled correlation between order
    line count and PER-LINE price vs the same correlation WITHIN each
    market segment — flagging any group whose sign disagrees with the
    pooled sign, and the full reversal case (every group disagrees) —
    the aggregation-pitfall detector every dashboard metric should
    pass before a pooled trend is believed (the pooled line can slope
    one way while every segment slopes the other). Two corr
    aggregates (one pooled, one per bounded group) and a 5-row sign
    comparison."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    per = l.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("nl"))
    j = (
        # fact-grain rollup x fact leaf (see agg_fleiss_kappa — same
        # 10x-sweep driver-memory OOM); pinned above the measured
        # fact-count threshold
        per.join(
            _pin(o, _gates.pin_shuffle_join_fact(_table_count(spark, sf_dir, "lineitem"))),
            per.l_orderkey == o.o_orderkey,
        )
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            F.col("c_mktsegment").alias("g"),
            F.col("nl").cast("double").alias("x"),
            (F.col("o_totalprice") / F.col("nl")).alias("y"),
        )
    )
    pooled = j.agg(F.corr("x", "y").alias("rp"))
    grp = j.groupBy("g").agg(F.corr("x", "y").alias("r"))
    agree = grp.join(F.broadcast(pooled)).agg(
        F.sum(
            F.when(
                F.signum(F.col("r")) == F.signum(F.col("rp")), 1
            ).otherwise(0)
        ).alias("n_agree"),
        F.count(F.lit(1)).alias("k"),
        F.min("r").alias("min_r"),
        F.max("r").alias("max_r"),
        F.any_value("rp").alias("rp"),
    )
    return agree.select(
        F.round(F.col("rp"), 6).alias("pooled_corr"),
        F.col("k").cast("long").alias("n_groups"),
        F.col("n_agree").cast("long").alias(
            "groups_agreeing_with_pooled"
        ),
        F.round(F.col("min_r"), 6).alias("min_group_corr"),
        F.round(F.col("max_r"), 6).alias("max_group_corr"),
        (F.col("n_agree") < F.col("k")).alias("sign_reversal_somewhere"),
        (F.col("n_agree") == 0).alias("full_simpson_reversal"),
    )


# ---------------------------------------------------------------------------
# Round-8 wave 204: Spearman via bounded contingency ranks (the scale path
# pinned in agg_spearman_rank_corr's docstring, now implemented)
# ---------------------------------------------------------------------------


@_q(
    "agg_spearman_binned",
    """
    WITH c AS (SELECT l_returnflag AS flag, l_quantity AS qv,
                      CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS pb,
                      CAST(count(*) AS DOUBLE) AS n
               FROM lineitem GROUP BY 1, 2, 3),
    tot AS (SELECT flag, sum(n) AS nf FROM c GROUP BY 1),
    qm AS (SELECT flag, qv, sum(n) AS nq FROM c GROUP BY 1, 2),
    qr AS (SELECT flag, qv,
                  sum(nq) OVER (PARTITION BY flag ORDER BY qv) - nq
                    + (nq + 1) / 2.0 AS rq
           FROM qm),
    pm AS (SELECT flag, pb, sum(n) AS np FROM c GROUP BY 1, 2),
    pr AS (SELECT flag, pb,
                  sum(np) OVER (PARTITION BY flag ORDER BY pb) - np
                    + (np + 1) / 2.0 AS rp
           FROM pm),
    pbins AS (SELECT flag, CAST(count(*) AS BIGINT) AS n_price_bins
              FROM pm GROUP BY 1),
    z AS (SELECT c.flag, c.n,
                 (qr.rq - (tot.nf + 1) / 2.0) / tot.nf AS x,
                 (pr.rp - (tot.nf + 1) / 2.0) / tot.nf AS y
          FROM c JOIN qr ON c.flag = qr.flag AND c.qv = qr.qv
                 JOIN pr ON c.flag = pr.flag AND c.pb = pr.pb
                 JOIN tot ON c.flag = tot.flag),
    s AS (SELECT flag, sum(n) AS sw,
                 sum(n * x) AS sx, sum(n * y) AS sy,
                 sum(n * x * y) AS sxy,
                 sum(n * x * x) AS sxx, sum(n * y * y) AS syy
          FROM z GROUP BY flag)
    SELECT s.flag AS l_returnflag,
           CAST(sw AS BIGINT) AS n,
           pbins.n_price_bins,
           round((sxy - sx * sy / sw)
                 / sqrt((sxx - sx * sx / sw) * (syy - sy * sy / sw)), 6)
             + 0.0 AS spearman_rho_binned
    FROM s JOIN pbins ON s.flag = pbins.flag
    """,
)
def agg_spearman_binned(spark, sf_dir):
    """Spearman rank correlation per return flag via BOUNDED contingency
    ranks — the scale recipe pinned in agg_spearman_rank_corr's
    docstring (61 s at sf10: its row-level rank windows sort the whole
    table with parallelism capped at 3 partition keys), now implemented:
    ONE map-combinable shuffle collapses rows to a (flag, quantity,
    price-bin) contingency table (quantity has 50 distinct values;
    l_extendedprice is $1000-binned to ~105 cells — Spearman on binned
    average ranks converges with bin count), tie-aware average ranks
    come from the cell MARGINALS via cumulative windows over <=105-row
    bounded frames (no row ever sorts), ranks are centered and scaled to
    [-1/2, 1/2] so the weighted-moment sums stay O(1) per cell (no
    catastrophic cancellation at any SF), and rho is a weighted Pearson
    over the cells in closed form. Broadcast rank tables join back to
    the contingency — at 100 TB every post-scan frame here is a few
    hundred rows per flag regardless of data size. The exact row-level
    entry stays registered as the semantics pin; this is the variant a
    1000-executor cluster should run."""
    l = _t(spark, sf_dir, "lineitem")
    c = l.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").alias("qv"),
        F.floor(F.col("l_extendedprice") / 1000.0).alias("pb"),
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    # the contingency is BOUNDED (~50x105 cells per flag) and feeds four
    # branches (tot/qm/pm/z); cut lineage so the 100-TB fact scan runs
    # ONCE instead of once per branch (10 scans without this — the same
    # checkpoint discipline as the graph operators)
    c = c.localCheckpoint()
    tot = c.groupBy("flag").agg(F.sum("n").alias("nf"))
    qm = c.groupBy("flag", "qv").agg(F.sum("n").alias("nq"))
    wq = Window.partitionBy("flag").orderBy("qv")
    qr = qm.select(
        "flag",
        "qv",
        (
            F.sum("nq").over(wq) - F.col("nq") + (F.col("nq") + 1) / 2.0
        ).alias("rq"),
    )
    pm = c.groupBy("flag", "pb").agg(F.sum("n").alias("np"))
    wp = Window.partitionBy("flag").orderBy("pb")
    pr = pm.select(
        "flag",
        "pb",
        (
            F.sum("np").over(wp) - F.col("np") + (F.col("np") + 1) / 2.0
        ).alias("rp"),
    )
    pbins = pm.groupBy("flag").agg(
        F.count(F.lit(1)).cast("long").alias("n_price_bins")
    )
    z = (
        c.join(F.broadcast(qr), ["flag", "qv"])
        .join(F.broadcast(pr), ["flag", "pb"])
        .join(F.broadcast(tot), "flag")
        .select(
            "flag",
            "n",
            ((F.col("rq") - (F.col("nf") + 1) / 2.0) / F.col("nf")).alias(
                "x"
            ),
            ((F.col("rp") - (F.col("nf") + 1) / 2.0) / F.col("nf")).alias(
                "y"
            ),
        )
    )
    s = z.groupBy("flag").agg(
        F.sum("n").alias("sw"),
        F.sum(F.col("n") * F.col("x")).alias("sx"),
        F.sum(F.col("n") * F.col("y")).alias("sy"),
        F.sum(F.col("n") * F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("n") * F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("n") * F.col("y") * F.col("y")).alias("syy"),
    )
    rho = (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("sw")) / F.sqrt(
        (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("sw"))
        * (F.col("syy") - F.col("sy") * F.col("sy") / F.col("sw"))
    )
    return s.join(F.broadcast(pbins), "flag").select(
        F.col("flag").alias("l_returnflag"),
        F.col("sw").cast("long").alias("n"),
        "n_price_bins",
        (F.round(rho, 6) + 0.0).alias("spearman_rho_binned"),
    )


# ---------------------------------------------------------------------------
# Driver contract
# ---------------------------------------------------------------------------

# The driver's correctness gate verifies the FIRST 50 entries of queries()
# in iteration order (each CORRECTNESS_r*.json contains exactly one 50-row
# window). Through round 8 that window was a hand-edited 50-name literal,
# re-pinned at the start of every session; the round-8 verdict flagged the
# hand-edit hazard (a forgotten or mis-ordered re-pin burns an entire
# driver window re-checking already-green entries). Since round 9 the
# window is DERIVED at import time from the repo's own driver artifacts:
#
#   1. green(name): the entry has a fully-matching row (rows_match +
#      schema_match + hash_match, hash None allowed for rows-only checks)
#      in ANY CORRECTNESS_r*.json — the same predicate
#      tests/test_oracle.py uses for prior-green accounting.
#   2. pending: oracle-backed registry entries with NO green row, in
#      declaration order. The window is the first 50 of these — exactly
#      the rotation plan the round-8 session pinned for round 9.
#   3. drift-guard round-robin: if fewer than 50 entries are pending, the
#      spare slots are filled with the entries whose LATEST green row is
#      oldest (declaration-order tie-break). Re-checking refreshes their
#      latest-green round, so the round-robin rotates automatically in
#      later rounds with no hand edits.
#
# Approximate-by-design entries (knn_lsh_approx, knn_ivf_approx,
# approx_count_distinct, agg_approx_percentiles) carry no ORACLE entry and
# are structurally excluded by step 2, so no slot is ever burned on a row
# that can never be hash-green. tests/test_oracle.py pins the mechanism:
# window == first 50 of queries(), every window entry oracle-backed, zero
# overlap with prior greens while a backlog exists, and operator-family
# coverage across window + prior greens. Every entry — pending, green, or
# approximate — is additionally re-verified every round by
# tools/oracle_check.py and the parametrized oracle tests regardless of
# window membership.


def _committed_correctness_paths() -> "list[str]":
    """CORRECTNESS_r*.json artifacts tracked by git, as absolute paths.

    The derivation must NOT see the current round's in-progress file
    (ADVICE r9 #5): the driver writes CORRECTNESS_r{N}.json entry-by-entry
    while the gate runs, so a process importing this module mid-round
    (bench.py, a sweep shard) would otherwise derive a DIFFERENT window
    from a partially-written artifact. Committed files are immutable
    round-close snapshots — deriving only from them makes the window a
    constant for the whole round. Falls back to the glob when git is
    unavailable (e.g. the repo exported without .git), where the
    mid-round hazard cannot arise anyway.
    """
    import glob
    import os
    import subprocess

    root = os.path.dirname(os.path.abspath(__file__))
    try:
        out = subprocess.run(
            ["git", "ls-files", "CORRECTNESS_r*.json"],
            cwd=root,
            capture_output=True,
            text=True,
            timeout=10,
            check=True,
        ).stdout
        paths = [os.path.join(root, p) for p in out.split() if p]
        if paths:
            return sorted(paths)
    except (OSError, subprocess.SubprocessError):
        pass
    return sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))


def _correctness_history() -> "dict[str, tuple[int, int]]":
    """name -> (earliest, latest) green round, read from the driver's
    COMMITTED CORRECTNESS_r*.json artifacts next to this file."""
    import json
    import re as _re

    hist: dict[str, tuple[int, int]] = {}
    for path in _committed_correctness_paths():
        m = _re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            # hash_match None is green only for rows-only entries (no
            # oracle by design); for an oracle-backed entry a null hash
            # means the check did not complete — never count it green
            # (ADVICE r9 #5, second hazard).
            hash_ok = row.get("hash_match") or (
                row.get("hash_match") is None and name not in ORACLE
            )
            if row.get("rows_match") and row.get("schema_match") and hash_ok:
                earliest, _ = hist.get(name, (rnd, rnd))
                hist[name] = (earliest, rnd)
    return hist


def _derive_gate_order(
    names: "list[str] | None" = None,
    hist: "dict[str, tuple[int, int]] | None" = None,
) -> "tuple[list[str], list[str]]":
    """(window, backlog): the first 50 never-driver-green oracle-backed
    entries in declaration order, plus the rest of the pending backlog;
    oldest-green round-robin fills spare slots once the backlog fits.
    ``names``/``hist`` exist for unit tests (the drift-guard fill branch
    must be exercisable before the round whose backlog first fits)."""
    if hist is None:
        hist = _correctness_history()
    if names is None:
        names = [n for n in QUERIES if n in ORACLE]
    pos = {n: i for i, n in enumerate(names)}
    pending = [n for n in names if n not in hist]
    window, backlog = pending[:50], pending[50:]
    if len(window) < 50:
        greens = sorted(
            (n for n in names if n in hist),
            key=lambda n: (hist[n][1], pos[n]),
        )
        window += greens[: 50 - len(window)]
    return window, backlog


_GATE_ORDER, _PENDING_BACKLOG = _derive_gate_order()


def _gate_ordered(d: dict) -> dict:
    out = {k: d[k] for k in _GATE_ORDER if k in d}
    out.update({k: v for k, v in d.items() if k not in out})
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the Q1-style pricing summary."""
    return q1_pricing_summary(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _gate_ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    return _gate_ordered(ORACLE)
