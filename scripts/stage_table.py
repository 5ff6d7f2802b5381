"""Stage-level forensics from a Spark event log (single application).

Answers the scaling-hunt question the phase table cannot: WHERE does a
`local[28]` round leave cores idle — stages with too few tasks, GC,
straggler tails, or driver-side gaps with zero running tasks.

Prints:
  - per-stage rows (tasks, wall, task-time sum, max task, GC, mean
    concurrency = task-time / wall) sorted by wall;
  - a timeline summary: total span, time with 0 running tasks (driver
    gaps), average running-task count (the measured concurrency).

Usage: python scripts/stage_table.py /dev/shm/spider_scale/eventlog/<app> [top_n]
"""

import glob
import json
import os
import sys
from collections import defaultdict


def _lines(path):
    """Yield event lines from a v1 file or a v2 rolling dir
    (zstd-compressed parts read via pyarrow)."""
    files = (sorted(glob.glob(os.path.join(path, "events_*")))
             if os.path.isdir(path) else [path])
    for f in files:
        if f.endswith(".zstd") or f.endswith(".zst"):
            import pyarrow as pa
            with pa.input_stream(f, compression="zstd") as s:
                data = s.read().decode("utf-8", "replace")
            yield from data.splitlines()
        else:
            yield from open(f)


def main():
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    stages = {}  # (stageId, attempt) -> dict
    tasks = defaultdict(list)  # stage key -> [(launch, finish, runTime, gc)]
    name_of = {}
    for line in _lines(path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerStageSubmitted":
            si = ev["Stage Info"]
            name_of[si["Stage ID"]] = si["Stage Name"].split("\n")[0]
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            key = si["Stage ID"]
            stages[key] = {
                "name": si["Stage Name"].split("\n")[0],
                "ntasks": si["Number of Tasks"],
                "sub": si.get("Submission Time"),
                "done": si.get("Completion Time"),
            }
        elif e == "SparkListenerTaskEnd":
            key = ev["Stage ID"]
            ti = ev["Task Info"]
            tm = ev.get("Task Metrics") or {}
            tasks[key].append((
                ti["Launch Time"], ti["Finish Time"],
                tm.get("Executor Run Time", 0),
                tm.get("JVM GC Time", 0),
            ))

    rows = []
    spans = []  # all task (start, end) for the timeline
    for sid, s in stages.items():
        ts = tasks.get(sid, [])
        if not ts or s["sub"] is None:
            continue
        wall = (s["done"] - s["sub"]) / 1000.0
        run_sum = sum(t[2] for t in ts) / 1000.0
        gc_sum = sum(t[3] for t in ts) / 1000.0
        max_task = max((t[1] - t[0]) for t in ts) / 1000.0
        spans.extend((t[0], t[1]) for t in ts)
        rows.append({
            "stage": sid, "name": s["name"], "tasks": len(ts),
            "wall_s": round(wall, 2), "task_sum_s": round(run_sum, 2),
            "gc_s": round(gc_sum, 2), "max_task_s": round(max_task, 2),
            "mean_conc": round(run_sum / wall, 1) if wall > 0 else None,
        })

    rows.sort(key=lambda r: -r["wall_s"])
    print(f"{'stage':>5} {'tasks':>5} {'wall_s':>7} {'sum_s':>8} "
          f"{'conc':>6} {'max_t':>6} {'gc_s':>6}  name")
    for r in rows[:top_n]:
        print(f"{r['stage']:>5} {r['tasks']:>5} {r['wall_s']:>7} "
              f"{r['task_sum_s']:>8} {r['mean_conc']:>6} "
              f"{r['max_task_s']:>6} {r['gc_s']:>6}  {r['name'][:60]}")

    if spans:
        spans.sort()
        t0, t1 = spans[0][0], max(e for _, e in spans)
        # merge task intervals -> gaps with zero running tasks
        merged = []
        cs, ce = spans[0]
        for s_, e_ in spans[1:]:
            if s_ <= ce:
                ce = max(ce, e_)
            else:
                merged.append((cs, ce))
                cs, ce = s_, e_
        merged.append((cs, ce))
        busy = sum(e - s for s, e in merged) / 1000.0
        total = (t1 - t0) / 1000.0
        task_time = sum(e - s for s, e in spans) / 1000.0
        print(f"\ntimeline: span {total:.1f}s, >=1 task running "
              f"{busy:.1f}s, ZERO-task gaps {total - busy:.1f}s "
              f"({100 * (total - busy) / total:.0f}%)")
        print(f"mean running tasks over span: {task_time / total:.1f}")
        gaps = sorted(((e1, s2) for (_, e1), (s2, _) in
                       zip(merged, merged[1:])), key=lambda g: g[0] - g[1])
        big = [(round((s2 - e1) / 1000.0, 2), round((e1 - t0) / 1000.0, 1))
               for e1, s2 in gaps if s2 - e1 > 200][:15]
        print(f"gaps >0.2s (len_s, at_s from start): {big}")


if __name__ == "__main__":
    main()
