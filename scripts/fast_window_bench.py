"""Fast-window bench watcher: poll the host's ALU control until the
fast-CPU state returns (per-proc Mops >= threshold, default 10.0, the
state the recorded 35.4s/94.0-u/s figure ran in), then run ONE
`python bench.py` and save its output next to the probe readings.

Usage: python scripts/fast_window_bench.py [out_path] [threshold]
             [poll_seconds] [max_hours]
Exits 0 after a successful bench run (or when max_hours elapses
without one); a failed or stalled bench is recorded as a
bench_exit_code line in <out_path> and the watch continues.  Every
probe reading is appended to <out_path>.probes as JSON lines.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def probe() -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "cpu_control.py"),
         "4", "6"],
        capture_output=True, text=True, timeout=300)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fast_window_bench.log"
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    poll_s = int(sys.argv[3]) if len(sys.argv) > 3 else 600
    max_hours = float(sys.argv[4]) if len(sys.argv) > 4 else 5.0
    deadline = time.time() + max_hours * 3600
    while time.time() < deadline:
        try:
            p = probe()
        except Exception as e:  # noqa: BLE001 - keep watching through blips
            p = {"error": str(e)}
        p["ts"] = round(time.time(), 1)
        with open(out_path + ".probes", "a") as f:
            f.write(json.dumps(p) + "\n")
        mops = p.get("per_proc_mops_at_N", 0.0)
        if mops >= threshold:
            with open(out_path, "w") as f:
                f.write(json.dumps({"trigger_probe": p}) + "\n")
                f.flush()
                try:
                    r = subprocess.run(
                        [sys.executable, os.path.join(REPO, "bench.py")],
                        stdout=f, stderr=subprocess.STDOUT, timeout=1800)
                    rc = r.returncode
                except subprocess.TimeoutExpired:
                    rc = -1
                f.write(json.dumps({"bench_exit_code": rc}) + "\n")
            if rc == 0:
                return
            # failed/stalled bench: keep watching for another window
        time.sleep(poll_s)


if __name__ == "__main__":
    main()
