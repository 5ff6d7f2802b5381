"""Pure-CPU scaling control for the N-vs-4N pair windows.

Measures the HOST's capacity curve with zero Spark/engine involvement:
K worker processes, each pinned to its own CPU, run an identical tight
integer loop for a fixed wall window; per-process throughput at K=N
vs K=4N gives the ceiling any engine measurement on the same slices
can reach in that window.  Mirrors the worker pinning exactly
(first K CPUs, one proc per CPU).

Usage: python scripts/cpu_control.py [N] [seconds]   # default 4, 8
Prints one JSON line: per-proc Mops at N and 4N plus the efficiency
ratio (per-proc@4N / per-proc@N — 1.0 = linear).
"""

import json
import multiprocessing as mp
import os
import sys
import time


def _spin(cpu: int, seconds: float, out) -> None:
    os.sched_setaffinity(0, {cpu})
    end = time.perf_counter() + seconds
    x = 1
    ops = 0
    while time.perf_counter() < end:
        for _ in range(100_000):
            x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        ops += 100_000
    out.put(ops / seconds)


def run(k: int, seconds: float) -> float:
    q = mp.Queue()
    procs = [mp.Process(target=_spin, args=(c, seconds, q)) for c in range(k)]
    for p in procs:
        p.start()
    rates = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return sum(rates) / len(rates)  # per-proc mean ops/s


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 8.0
    per_small = run(n, seconds)
    per_big = run(4 * n, seconds)
    print(json.dumps({
        "n": n, "seconds": seconds,
        "per_proc_mops_at_N": round(per_small / 1e6, 2),
        "per_proc_mops_at_4N": round(per_big / 1e6, 2),
        "capacity_efficiency": round(per_big / per_small, 3),
    }))


if __name__ == "__main__":
    main()
