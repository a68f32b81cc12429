"""Host parallel-CPU ceiling sweep — calibrates scaling_bench's core pair.

Measures PURE-CPU aggregate throughput (independent processes, zero shared
state, zero I/O) at 1/2/4/8/16/32 workers.  Whatever rolloff THIS shows is
the box's physical ceiling (SMT siblings, memory bandwidth, cgroup quota) —
no Spark job can scale better than embarrassingly-parallel arithmetic, so
an N→4N pair for the replay measurement must sit inside this sweep's
linear region or the measurement grades the host, not the job.

Usage: python scripts/host_ceiling.py [seconds_per_level]
Prints one JSON line: {workers: aggregate_ops_per_sec, ...,
"linear_region_max": N}.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _burn(out, sec: float) -> None:
    """Fixed-time integer/float mix, ~parquet-decode-ish arithmetic."""
    t_end = time.monotonic() + sec
    n = 0
    x = 1.0001
    while time.monotonic() < t_end:
        for _ in range(10_000):
            x = x * 1.0000001 + 0.1
            n += 1
        if x > 1e12:
            x = 1.0001
    out.put(n)


def measure(workers: int, sec: float) -> float:
    q = mp.Queue()
    procs = [mp.Process(target=_burn, args=(q, sec)) for _ in range(workers)]
    for p in procs:
        p.start()
    total = sum(q.get() for _ in procs)
    for p in procs:
        p.join()
    return total / sec


def main() -> None:
    sec = float(sys.argv[1]) if len(sys.argv) > 1 else 5.0
    levels = [1, 2, 4, 8, 16, 32]
    base = None
    out: dict[str, float] = {}
    linear_max = 1
    broken = False
    for w in levels:
        ops = measure(w, sec)
        out[str(w)] = round(ops, 0)
        if base is None:
            base = ops
        eff = ops / (base * w)
        # the linear region must be CONTIGUOUS from 1: once a level falls
        # below threshold, a later (noise-rebound) level must not extend it
        if eff >= 0.85 and not broken:
            linear_max = w
        else:
            broken = True
    out["linear_region_max"] = linear_max
    print(json.dumps(out))


if __name__ == "__main__":
    main()
