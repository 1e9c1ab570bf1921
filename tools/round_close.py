"""One-command round-close verification chain.

Runs the pinned close sequence in order and stops at the first failure:
  1. full-registry oracle sweep, default session   (sf0.01, 4 shards)
  2. full-registry oracle sweep, --hostile session (ANSI + America/New_York)
  3. physical-plan audit (every pinned plan property)
  4. full pytest suite, 6 hash-sharded processes
  5. bench.py (headline suite + isolated top-5 protocol)
  6. registry-wide sf1 timing sweep with per-entry budget (round-8
     verdict item #4: anything over time_sweep.SF1_BUDGET_SECONDS
     without a LINEAR_BY_DESIGN rationale fails the round — the gate
     that catches quadratic arms the round they land). The sf1 dataset
     is synthesized from sf0.1 on first use (tools/scale_up.py,
     key-offset replication) and reused afterwards. Skip with
     --no-sweep when iterating on an unrelated stage.

Exit code 0 iff every stage passed. Usage: python3 tools/round_close.py
[sf_dir] (default /root/testdata/sf0.01 for the sweeps).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

SF1_DIR = "/tmp/sf1"


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--no-sweep"]
    do_sweep = "--no-sweep" not in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    if do_sweep and not os.path.isdir(SF1_DIR):
        print(f"=== synthesizing {SF1_DIR} (scale_up 10x of sf0.1) ===")
        rc = subprocess.run(
            [sys.executable, "tools/scale_up.py",
             "/root/testdata/sf0.1", SF1_DIR, "10"]
        ).returncode
        if rc != 0:
            print("FAILED synthesizing sf1 dataset")
            return rc
    stages = [
        ("oracle sweep (default)",
         [sys.executable, "tools/run_oracle_parallel.py", "4", sf_dir]),
        ("oracle sweep (hostile)",
         [sys.executable, "tools/run_oracle_parallel.py", "4", sf_dir,
          "--hostile"]),
        ("plan audit", [sys.executable, "tools/plan_audit.py"]),
        ("plan scan (whole registry, no cartesian)",
         [sys.executable, "tools/plan_audit.py", "--scan-all"]),
        ("pytest suite (6 shards)",
         [sys.executable, "tools/run_tests_parallel.py", "6"]),
        ("bench", [sys.executable, "bench.py"]),
    ]
    if do_sweep:
        stages.append(
            ("sf1 time sweep (per-entry budget gate)",
             [sys.executable, "tools/time_sweep.py", SF1_DIR,
              "--launch", "4"]),
        )
    t0 = time.time()
    for name, cmd in stages:
        print(f"=== {name} ===", flush=True)
        rc = subprocess.run(cmd).returncode
        if rc != 0:
            print(f"FAILED at stage: {name} (rc={rc})")
            return rc
        if name == "bench" and not _bench_load_rule_satisfied():
            print(
                "FAILED at stage: bench (load rule unsatisfied — the capture"
                " ran on a busy box; r12 VERDICT #1: hot headline numbers"
                " are non-adjudicable, re-run when the box is idle)"
            )
            return 3
    print(f"round-close chain green ({time.time() - t0:.0f}s)")
    return 0


def _bench_load_rule_satisfied() -> bool:
    """r12 VERDICT #1: refuse to ship a headline BENCH whose load rule
    stamped ``satisfied: false`` — the round-12 captures ran at loadavg
    16-27 and the whole round's perf comparison was thrown out. Reads the
    verbose artifact bench.py just wrote; a missing artifact or missing
    rule (pre-rule bench versions) passes, an explicit false fails."""
    import json

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_runs_verbose.json",
    )
    try:
        with open(path) as f:
            verbose = json.load(f)
    except (OSError, ValueError):
        return True
    rule = ((verbose.get("load") or {}).get("rule")) or {}
    return bool(rule.get("satisfied", True))


if __name__ == "__main__":
    raise SystemExit(main())
