"""One-command round-close verification chain.

Runs the pinned close sequence in order and stops at the first failure:
  1. full-registry oracle sweep, default session   (sf0.01, 4 shards)
  2. full-registry oracle sweep, --hostile session (ANSI + America/New_York)
  3. physical-plan audit (every pinned plan property)
  4. full pytest suite, 6 hash-sharded processes
  5. bench.py (headline suite + isolated top-5 protocol)

Exit code 0 iff every stage passed. Usage: python3 tools/round_close.py
[sf_dir] (default /root/testdata/sf0.01 for the sweeps).
"""

from __future__ import annotations

import subprocess
import sys
import time


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
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
    t0 = time.time()
    for name, cmd in stages:
        print(f"=== {name} ===", flush=True)
        rc = subprocess.run(cmd).returncode
        if rc != 0:
            print(f"FAILED at stage: {name} (rc={rc})")
            return rc
    print(f"round-close chain green ({time.time() - t0:.0f}s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
