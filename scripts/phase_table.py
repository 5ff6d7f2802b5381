"""Per-phase N-vs-4N comparison from scaling-worker stderr logs.

The scaling workers (SPIDER_TIMING=1) stream ``## <phase>: <wall>s``
ticks per crawl round.  This parses a pair of worker stderr files into
per-round phase walls and prints the side-by-side table + per-phase
speedups — the evidence the round-3 verdict names as the fallback for
the N→4N criterion: if the whole-window efficiency is noise-poisoned,
the per-phase comparison on the same rounds identifies which engine
phase (if any) fails to scale.

Usage:
  python scripts/phase_table.py /dev/shm/spider_scale/worker_7_h3.stderr \
      /dev/shm/spider_scale/worker_28_h3.stderr
"""

import json
import re
import sys

TICK = re.compile(r"^## (.+?)(?: [kn]=\d+)?: ([0-9.]+)s", re.M)
# phase labels in round order; "select" starts a new round
PHASES = ["select", "fetch+cache", "meta(tokenize)", "admission", "commit"]


def parse(path):
    """-> list of {phase: wall} dicts, one per round (incl. warm-up)."""
    rounds = []
    cur = None
    for m in TICK.finditer(open(path).read()):
        label, wall = m.group(1), float(m.group(2))
        key = next((p for p in PHASES if label.startswith(p)), None)
        if key is None:
            continue  # store-level ticks (## write ...) are sub-phases
        if key == "select":
            cur = {}
            rounds.append(cur)
        if cur is not None:
            cur[key] = cur.get(key, 0.0) + wall
    return rounds


def main():
    small_path, big_path = sys.argv[1], sys.argv[2]
    small, big = parse(small_path), parse(big_path)
    n = min(len(small), len(big))
    if n == 0:
        print("no complete rounds in one of the logs", file=sys.stderr)
        sys.exit(1)
    out = {"rounds": [], "note": "round 0 is the warm-up (excluded from "
                                 "scaling windows); speedup = small/big"}
    for i in range(n):
        row = {"round": i, "phases": {}}
        for p in PHASES:
            a, b = small[i].get(p), big[i].get(p)
            row["phases"][p] = {
                "small_s": a, "big_s": b,
                "speedup": round(a / b, 2) if a and b else None,
            }
        row["total_small_s"] = round(sum(v for v in small[i].values()), 2)
        row["total_big_s"] = round(sum(v for v in big[i].values()), 2)
        out["rounds"].append(row)
    print(json.dumps(out, indent=1))
    # markdown table for BENCH.md
    print("\n| round | phase | N wall (s) | 4N wall (s) | speedup |")
    print("|---|---|---|---|---|")
    for row in out["rounds"]:
        for p in PHASES:
            c = row["phases"][p]
            if c["small_s"] is None and c["big_s"] is None:
                continue
            print(f"| {row['round']} | {p} | {c['small_s']} | {c['big_s']} "
                  f"| {c['speedup']} |")


if __name__ == "__main__":
    main()
