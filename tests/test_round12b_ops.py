"""Round-12 never-measured-tail pins (the sf100 sweep of the cheap 212).

The decade-3 sweep's final tier timed every registry entry that had
never run at 600M-row scale. The defects it caught are all the known
rank-window-funnel class at partition cardinalities the earlier tiers
missed (5-25 instead of 1-3): a Window whose partition key has a
bounded value domain serializes the whole fact through |keys| tasks.
Each fix below re-expresses the identical statistic through the
round-11 bucket decomposition (equal values share a price bucket, rank
= lower-bucket prefix + in-bucket row_number); these tests pin (a) the
row-level identity against the literal window the oracle still runs,
and (b) the plan shape (fact windows must carry the bkt partition key).
"""

import re

import pyspark.sql.functions as F
from pyspark.sql.window import Window

import __spark_entry__ as em

QS = em.queries()
SF = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _fact_windows_carry_bkt(plan: str) -> bool:
    wins = re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", plan)
    return any("bkt" in w for w in wins)


def test_distribution_ranks_bucketed_identity(spark):
    """The bucket-decomposed ntile/percent_rank/cume_dist must equal the
    literal PARTITION BY o_orderpriority window row-for-row: the
    (price, orderkey) order is tie-free, so rank == row_number and all
    three functions are closed-form in (r, n)."""
    got = sorted(
        tuple(r) for r in QS["window_distribution_ranks"](spark, SF).collect()
    )
    o = spark.read.parquet(f"{SF}/orders.parquet")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    want = sorted(
        tuple(r)
        for r in o.select(
            "o_orderkey",
            "o_orderpriority",
            F.ntile(4).over(w).cast("long").alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cum_dist"),
        ).collect()
    )
    assert got == want and len(got) > 0


def test_distribution_ranks_no_low_cardinality_fact_window(spark):
    """Plan pin: every fact-grain window must carry the bkt partition
    key — PARTITION BY o_orderpriority alone is the cardinality-5
    funnel (five tasks sort the whole order fact, 144 s at sf100)."""
    plan = _executed_plan(QS["window_distribution_ranks"](spark, SF))
    wins = re.findall(r"Window \[[^\]]*\], \[([^\]]*)\], \[([^\]]*)\]", plan)
    assert wins, plan
    for part, order in wins:
        # fact windows carry bkt in the PARTITION spec; the only windows
        # allowed without it are the bucket-summary prefix windows,
        # which ORDER by bkt over a bounded aggregate
        assert "bkt" in part or order.startswith("bkt"), (part, order)
    assert any("bkt" in part for part, _ in wins), plan
