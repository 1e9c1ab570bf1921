"""Full-registry oracle sweep as N parallel shard processes (the
oracle_check --shard flag + crc32(name) slicing — same recipe as
tools/run_tests_parallel.py). ~3x wall-clock on the 32-CPU box.

Usage: python3 tools/run_oracle_parallel.py [n] [--hostile] [sf_dir]
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import time


def main() -> int:
    argv = sys.argv[1:]
    n = 4
    if argv and argv[0].isdigit():
        n = int(argv[0])
        argv = argv[1:]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    t0 = time.time()
    procs = [
        subprocess.Popen(
            [sys.executable, "tools/oracle_check.py", f"--shard={i}/{n}", *argv],
            cwd=root,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(n)
    ]
    tot_pass = tot_fail = tot_rows = 0
    rc = 0
    for i, p in enumerate(procs):
        out, _ = p.communicate()
        tail = out.strip().splitlines()[-1] if out.strip() else ""
        m = re.search(r"(\d+) matched, (\d+) failed, (\d+) rows-only", tail)
        if m:
            tot_pass += int(m.group(1))
            tot_fail += int(m.group(2))
            tot_rows += int(m.group(3))
        else:
            rc = 1
        bad = [l for l in out.splitlines() if l.lstrip().startswith("✗")]
        for l in bad:
            print(l)
        if p.returncode != 0:
            rc = 1
    print(
        f"TOTAL: {tot_pass} matched, {tot_fail} failed, {tot_rows} rows-only"
        f"  ({time.time() - t0:.0f}s, {n} shards)"
    )
    return rc if tot_fail == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
