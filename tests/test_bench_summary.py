"""bench.py's last stdout line is the driver's ONLY bench input (parsed
from a ~2 KB tail capture). Pin the degradation path: however large the
suite grows, the final line must stay parseable and under the window with
the headline totals intact (round-4 lost a round's metric to a truncated
JSON line; r5 VERDICT item #6 asked for this test)."""

import json

from bench import compact_summary


def _synthetic(n):
    return {f"some_rather_long_query_name_number_{i:03d}": 0.123 + i * 0.001
            for i in range(n)}


def test_compact_summary_fits_at_100_queries():
    timings = _synthetic(100)
    core15 = list(timings)[:15]
    line = compact_summary(timings, core15, sf=0.1, n_runs=3,
                           isolated={k: 1.0 for k in core15[:5]})
    assert len(line) < 1800
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_suite_seconds"
    assert parsed["value"] == round(sum(timings.values()), 3)
    assert parsed["core15_seconds"] == round(
        sum(timings[q] for q in core15), 3
    )


def test_compact_summary_small_suite_keeps_full_detail():
    timings = _synthetic(10)
    core15 = list(timings)
    parsed = json.loads(
        compact_summary(timings, core15, sf=0.1, n_runs=3)
    )
    assert parsed["queries"] == timings  # no degradation needed


def test_compact_summary_survives_absurd_suite():
    """Even at 1000 queries the totals must survive (queries dropped)."""
    timings = _synthetic(1000)
    core15 = list(timings)[:15]
    line = compact_summary(timings, core15, sf=0.1, n_runs=3)
    assert len(line) < 1800
    parsed = json.loads(line)
    assert parsed["value"] == round(sum(timings.values()), 3)


def test_compact_summary_isolated_block_present_when_it_fits():
    timings = _synthetic(20)
    iso = {k: 0.5 for k in list(timings)[:5]}
    parsed = json.loads(
        compact_summary(timings, list(timings)[:15], 0.1, 3, isolated=iso)
    )
    assert parsed["isolated"] == {k: 0.5 for k in iso}


def test_compact_summary_load_field_survives_degradation():
    """r10 VERDICT item #5: the load averages must reach the driver
    artifact even when the suite is huge and per-query detail degrades."""
    load = {"before": [1.23, 0.5, 0.1], "after": [30.0, 12.0, 4.0]}
    for n in (20, 1000):
        timings = _synthetic(n)
        line = compact_summary(
            timings, list(timings)[:15], 0.1, 3, load=load
        )
        assert len(line) < 1800
        assert json.loads(line)["load"] == load
