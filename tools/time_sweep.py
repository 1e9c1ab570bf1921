"""Registry-wide timing sweep: execute EVERY registered query to a noop
sink at a given scale directory and record per-entry wall seconds.

This is the instrument that caught the round-8 scale defects the
per-wave curves missed (fuzzy-ER 74.8 s, prefix-filter 972 s, semantic
dedup 121 s, cogrouped asof 100 s, try_cast 56 s — all at sf1 while
green at sf0.1): correctness sweeps run at sf0.01 and the bench suite
covers only headline entries, so a non-headline entry can hide a
super-linear plan until data grows. Run this against a synthesized
/tmp/sf1 (tools/scale_up.py) each round after registry growth; read the
output sorted descending and dissect anything that moved above the
linear envelope of its sf0.1 time.

Usage:
  python tools/scale_up.py /root/testdata/sf0.1 /tmp/sf1 10   # once
  python tools/time_sweep.py /tmp/sf1 0 4 &    # shard 0 of 4
  python tools/time_sweep.py /tmp/sf1 1 4 &    # ... etc
  # results land in /tmp/time_sweep_<sfdirname>_<shard>.json

Single-run by design (a ranking instrument, not a benchmark — co-tenant
noise of 1.5-2x cannot hide a 10-100x defect); re-measure suspects
isolated best-of-2 before concluding anything.
"""

from __future__ import annotations

import json
import sys
import time
import zlib
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    shard_i = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    shard_n = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    from boann_ocsf_security_data_platform_spark import get_spark

    import __spark_entry__ as em

    spark = get_spark(
        app_name=f"time-sweep-{shard_i}", master="local[8]"
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, object] = {}
    for name, fn in em.queries().items():
        if zlib.crc32(name.encode()) % shard_n != shard_i:
            continue
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            out[name] = round(time.perf_counter() - t0, 2)
        except Exception as e:  # noqa: BLE001 - record, keep sweeping
            out[name] = f"ERR {type(e).__name__}"
    tag = Path(sf_dir).name
    path = f"/tmp/time_sweep_{tag}_{shard_i}.json"
    with open(path, "w") as f:
        json.dump(out, f)
    slow = sorted(
        ((v, k) for k, v in out.items() if isinstance(v, (int, float))),
        reverse=True,
    )[:10]
    print(f"shard {shard_i}/{shard_n}: {len(out)} entries -> {path}")
    for v, k in slow:
        print(f"  {v:8.2f}  {k}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
