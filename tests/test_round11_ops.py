"""Round-11 hardening pins.

- ADVICE r10 #1: the exact-Spearman scale arm must never BROADCAST its
  rank maps — their cardinality is distinct (flag, value), data-dependent
  and near-fact-scale on genuine continuous domains (the same
  derived-table-broadcast hazard class fixed in
  graph_degree_assortativity at sf100). Round 11 pinned both rank-map
  joins to sort-merge; these tests pin the PLAN, not just the values.
"""

import __spark_entry__ as em

QS = em.queries()
SF = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_spearman_scale_arm_has_no_broadcast_join(spark, monkeypatch):
    """Forced above the fact gate, the contingency arm's two rank-map
    joins must both be SortMergeJoin — zero broadcast exchanges anywhere
    in the plan, since every broadcast candidate here is a derived table
    whose size scales with the value domain."""
    monkeypatch.setattr(em._gates, "PIN_FACT_MIN_ROWS", 0)
    plan = _executed_plan(QS["agg_spearman_rank_corr"](spark, SF))
    assert plan.count("SortMergeJoin") == 2, plan
    assert "BroadcastHashJoin" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_spearman_scale_arm_values_unchanged(spark, monkeypatch):
    """The merge pin is a plan choice only: forced-gate output must still
    byte-match the oracle-hashed row-level window arm."""
    base = sorted(
        tuple(r) for r in QS["agg_spearman_rank_corr"](spark, SF).collect()
    )
    monkeypatch.setattr(em._gates, "PIN_FACT_MIN_ROWS", 0)
    gated = sorted(
        tuple(r) for r in QS["agg_spearman_rank_corr"](spark, SF).collect()
    )
    assert gated == base and len(base) > 0


def test_q21_rollup_form_has_no_semi_anti_joins(spark):
    """Round-11 sf100 find: the EXISTS/NOT-EXISTS join form chained three
    sort-merge joins into one stage (four concurrent external sorters per
    task OOM'd the 8g heap at 600M rows). The rollup rewrite must keep
    the semi/anti joins out of the plan at every scale — values are
    covered by the DuckDB oracle, which still runs the EXISTS form."""
    plan = _executed_plan(QS["q21_waiting_suppliers"](spark, SF))
    assert "LeftSemi" not in plan, plan
    assert "LeftAnti" not in plan, plan


def test_bounded_self_joins_are_hinted_broadcast(spark):
    """Round-11 sf10 scan find: three entries non-equi-join (or cross) a
    provably bounded aggregate whose Catalyst size estimate scales with
    the FACT, so above ~sf10 the planner silently degraded them from
    BroadcastNestedLoopJoin to CartesianProduct. The bounded side now
    carries an explicit broadcast hint — pin that the hint is in the
    plan at every scale (estimates must no longer decide)."""
    for name in (
        "agg_kendall_tau_binned",
        "agg_tukey_hsd",
        "agg_hodges_lehmann_shift",
    ):
        plan = _executed_plan(QS[name](spark, SF))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" in plan, name
