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
