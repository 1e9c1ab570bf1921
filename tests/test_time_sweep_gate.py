"""Budget-gate mechanics of tools/time_sweep.py (round-10 hardening):
self-expiring waivers and shard-failure handling — pure-Python, no Spark.

Round-9 verdict, What's wrong #1: a LINEAR_BY_DESIGN waiver for an entry
that currently passes is a silent hole (if the entry regresses over
budget the round-close gate never fires). ADVICE r9 #2: launch() masked
signal-killed shards (negative returncodes under max()) and merged stale
shard JSONs from earlier sweeps.
"""

import json

import tools.time_sweep as ts


def _write_shards(tag, shards):
    for i, payload in enumerate(shards):
        with open(f"/tmp/time_sweep_{tag}_{i}.json", "w") as f:
            json.dump(payload, f)


def test_clean_sweep_passes(monkeypatch, capsys):
    monkeypatch.setattr(ts, "LINEAR_BY_DESIGN", set())
    _write_shards("tsgate_a", [{"q_fast": 1.2}, {"q_ok": 29.9}])
    assert ts.aggregate_and_check("/x/tsgate_a", 2) == 0


def test_stale_waiver_fails(monkeypatch, capsys):
    """A waived entry that lands UNDER budget must fail the gate so the
    waiver gets deleted instead of rotting into a silent hole."""
    monkeypatch.setattr(ts, "LINEAR_BY_DESIGN", {"q_waived"})
    _write_shards("tsgate_b", [{"q_waived": 3.0, "q_other": 1.0}])
    assert ts.aggregate_and_check("/x/tsgate_b", 1) == 1
    out = capsys.readouterr().out
    assert "stale" in out and "q_waived" in out


def test_legit_waiver_passes(monkeypatch):
    """A waived entry genuinely over budget is the waiver's purpose —
    gate stays green."""
    monkeypatch.setattr(ts, "LINEAR_BY_DESIGN", {"q_linear"})
    _write_shards("tsgate_c", [{"q_linear": 95.0, "q_other": 1.0}])
    assert ts.aggregate_and_check("/x/tsgate_c", 1) == 0


def test_error_entry_fails(monkeypatch):
    monkeypatch.setattr(ts, "LINEAR_BY_DESIGN", set())
    _write_shards("tsgate_d", [{"q_boom": "ERR AnalysisException"}])
    assert ts.aggregate_and_check("/x/tsgate_d", 1) == 1


def test_launch_fails_on_signal_killed_shard(monkeypatch, tmp_path):
    """A shard killed by a signal returns a NEGATIVE code; max() over
    returncodes reported 0 when another shard passed. launch() must fail
    on ANY nonzero code and must delete stale shard JSONs up front so a
    crashed shard cannot be papered over by an earlier run's output."""
    stale = "/tmp/time_sweep_tsgate_e_0.json"
    with open(stale, "w") as f:
        json.dump({"q_stale": 1.0}, f)

    class _Proc:
        def __init__(self, rc):
            self.rc = rc

        def wait(self):
            return self.rc

    import subprocess

    calls = []

    def _popen(cmd):
        calls.append(cmd)
        return _Proc(-9 if len(calls) == 1 else 0)

    monkeypatch.setattr(subprocess, "Popen", _popen)
    assert ts.launch("/x/tsgate_e", 2) == 1
    assert len(calls) == 2
    # stale shard output was removed before launching
    import os

    assert not os.path.exists(stale)
