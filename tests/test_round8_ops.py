"""Round-8 operator invariant tests.

- agg_spearman_binned: the bounded-contingency Spearman must agree with
  the exact row-level entry (same n per flag; rho within the binning
  tolerance — quantity ranks are EXACT on the binned path since quantity
  is already discrete, so the only divergence is the $1000 price binning)
  and rho stays in [-1, 1].
"""

import __spark_entry__ as entrymod

QS = entrymod.queries()


def test_spearman_binned_matches_exact(spark, sf_smoke):
    binned = {
        r.l_returnflag: r
        for r in QS["agg_spearman_binned"](spark, sf_smoke).collect()
    }
    exact = {
        r.l_returnflag: r
        for r in QS["agg_spearman_rank_corr"](spark, sf_smoke).collect()
    }
    assert set(binned) == set(exact)
    for flag, b in binned.items():
        e = exact[flag]
        assert b.n == e.n  # contingency never drops rows
        assert -1.0 <= b.spearman_rho_binned <= 1.0
        assert b.n_price_bins >= 1
        # binned average ranks converge on the exact rho; at the fixture's
        # ~105 price bins the residual is small
        assert abs(b.spearman_rho_binned - e.spearman_rho) < 0.05, (
            flag,
            b.spearman_rho_binned,
            e.spearman_rho,
        )


def test_fuzzy_er_scale_arm_caps_blocks(spark, sf_smoke, monkeypatch):
    """r8 scale fix for join_fuzzy_entity_resolution: above the gate the
    block key widens to two tokens and the catalog side is capped per
    block. Forcing the gate to 0 exercises the scale arm on the small
    fixture: results keep the schema/invariants (dist <= 4, rank <= 3,
    per-probe ranks dense from 1) and every probe's match panel is
    bounded."""
    monkeypatch.setattr(entrymod, "FUZZY_EXACT_MAX_ROWS", 0)
    rows = QS["join_fuzzy_entity_resolution"](spark, sf_smoke).collect()
    by_probe = {}
    for r in rows:
        assert 0 <= r.dist <= 4
        assert 1 <= r.rank <= 3
        by_probe.setdefault(r.probe_key, []).append(r.rank)
    for pk, ranks in by_probe.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), pk
