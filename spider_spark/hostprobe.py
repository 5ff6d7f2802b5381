"""Host-condition probe shared by bench.py and the scaling harness.

The sandbox host's hypervisor interference comes and goes (identical
code has measured 149s and 313s headlines at 0.2% vs ~12% steal — see
BENCH.md host-noise forensics), so every wall-clock number we publish
carries the steal reading of its window.  Best-effort by design: a
container without /proc/stat, or a kernel exposing fewer than 8 cpu
fields (no ``steal`` column), reports -1.0 instead of aborting the
measurement run.
"""

from __future__ import annotations

import multiprocessing as mp
import time


def _burn(q):
    t = time.time() + 8
    x = 0
    while time.time() < t:
        x += 1
    q.put(x)


def steal_probe(nproc: int = 28) -> float:
    """%hypervisor steal during an 8s all-core spin; -1.0 if unknown."""
    def stat():
        return [int(v) for v in open("/proc/stat").readline().split()[1:]]
    try:
        s0 = stat()
        q = mp.Queue()
        ps = [mp.Process(target=_burn, args=(q,)) for _ in range(nproc)]
        [p.start() for p in ps]
        [p.join() for p in ps]
        s1 = stat()
        d = [b - a for a, b in zip(s0, s1)]
        if len(d) <= 7 or sum(d) == 0:
            return -1.0  # kernel exposes no steal field
        return round(100 * d[7] / sum(d), 2)
    except Exception:  # /proc not readable — probe is best-effort
        return -1.0
