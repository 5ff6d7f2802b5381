"""Patient N-vs-4N scaling runner: only measures in QUIET host windows.

The sandbox host's hypervisor interference comes and goes (steal probes
recorded from 0.2% to 15.5% within hours; identical rounds swing 3-6x).
`run_scaling.py` measures whenever invoked; this wrapper instead loops:
probe steal with an 8s all-core spin → if above the gate, sleep and
retry; if quiet, immediately run one back-to-back local[N]/local[4N]
worker pair (N=SPIDER_SCALE_N, default 7; round 4 uses N=4 — pure-CPU
controls show the host delivers ~4x capacity from 4->16 busy cores but
only ~3x from 7->28, so a 7/28 pair measures hypervisor capacity, not
the engine) (same corpus, same seeds, same plans, equal 2-round
measured windows, warm-up excluded) and re-probe AFTER the pair so the
window's cleanliness is bracketed on both ends.  Pairs whose bracket
stays under the gate are `clean`; the best clean pair is the reported
number, per the round-2 verdict's "equal-window, quiet-host, best-of-3"
criterion.

Usage: python scripts/patient_scaling.py [n_docs] [rounds] [budget]
Env: SPIDER_SCALE_GATE (steal %, default 2.0), SPIDER_SCALE_PAIRS
(clean pairs wanted, default 3), SPIDER_SCALE_DEADLINE_MIN (default
150), plus run_scaling.py's SPIDER_SCALE_* knobs.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spider_spark.hostprobe import steal_probe, syscall_probe  # noqa: E402
from spider_spark.session import get_spark  # noqa: E402
from spider_spark.sources.bench_corpus import build_bench_corpus  # noqa: E402

GATE = float(os.environ.get("SPIDER_SCALE_GATE", "2.0"))
# the box's other interference mode is guest-kernel stalls (sys time
# ≳ user time at 0% steal — see BENCH.md forensics); each worker now
# records per-round sys_pct, and a pair is only clean if the best
# round on BOTH sides ran below this kernel-time share
SYS_GATE = float(os.environ.get("SPIDER_SCALE_SYS_GATE", "12.0"))
# pre-gate for the SAME mode: socketpair round-trips/s/pair.
# CALIBRATED on this box: clean windows measure ~18-25k (virtio
# syscall overhead; a fixed Arrow-UDF reference job runs at full
# speed at 18.5k), stalled windows drop to ~3-13k while the same job
# runs 10-50x slow.  steal_probe alone cannot see invisible steal on
# the syscall path
SYSCALL_MIN = float(os.environ.get("SPIDER_SCALE_SYSCALL_MIN", "15000"))
PAIRS = int(os.environ.get("SPIDER_SCALE_PAIRS", "3"))
DEADLINE_MIN = float(os.environ.get("SPIDER_SCALE_DEADLINE_MIN", "150"))
N_SMALL = int(os.environ.get("SPIDER_SCALE_N", "7"))
N_BIG = 4 * N_SMALL
SCRATCH = os.environ.get("SPIDER_SCALE_TMP", "/dev/shm/spider_scale")


WORKER_TIMEOUT = int(os.environ.get("SPIDER_SCALE_WORKER_TIMEOUT", "1800"))


def run_worker(size, corpus, n_hosts, rounds, budget, n_docs, tag,
               timeout=None, milestones=None):
    """One worker run; returns its result dict, or None if the worker
    timed out (a stalled-host window — burn no more time on it) or
    died.  A None poisons the pair, which is recorded as dirty.
    `timeout` overrides WORKER_TIMEOUT (the hunter caps the 4N side
    tighter: a clean 4N run fits in ~3 min, so anything longer is a
    stalled window not worth riding out).

    `milestones` — list of (deadline_s, stderr_substring, min_count):
    with SPIDER_TIMING=1 the worker streams per-phase ``## label``
    lines; a stalled window shows up as a missing early phase long
    before the hard timeout.  Killing at the first missed milestone
    (~100-160s) instead of the hard cap (~300-360s) roughly doubles
    the candidate windows the hunter can sample per hour.  Requires
    streaming stderr to a file, so that path is only taken when
    milestones are requested."""
    # own process group: on timeout the WHOLE tree dies (the JVM is a
    # grandchild — subprocess.run's timeout would orphan it and the
    # leaked executor poisons every later measurement window)
    argv = [sys.executable,
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "_scaling_worker.py"),
            str(size), corpus, str(n_hosts), str(rounds), str(budget),
            str(n_docs)]
    stderr_path = os.path.join(SCRATCH, f"worker_{size}_{tag}.stderr")

    def _kill_tree(proc):
        import signal
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass

    if milestones:
        hard = timeout or WORKER_TIMEOUT
        with open(stderr_path, "w") as errf:
            proc = subprocess.Popen(argv, stdout=subprocess.PIPE,
                                    stderr=errf, text=True,
                                    start_new_session=True)
            t0 = time.time()
            pending = sorted(milestones)
            missed = None
            while proc.poll() is None:
                time.sleep(5)
                el = time.time() - t0
                if el > hard:
                    missed = ("hard_timeout", el)
                    break
                try:
                    tail = open(stderr_path).read()
                except OSError:
                    tail = ""
                while pending and el > pending[0][0]:
                    dl, sub, cnt = pending[0]
                    if tail.count(sub) < cnt:
                        missed = (f"milestone '{sub}'x{cnt}@{dl}s", el)
                        break
                    pending.pop(0)
                if missed:
                    break
            if missed:
                _kill_tree(proc)
                os.rename(stderr_path, stderr_path + ".timeout")
                print(json.dumps({"worker_timeout": size, "tag": tag,
                                  "missed": missed[0],
                                  "killed_at_s": round(missed[1], 1)}),
                      flush=True)
                return None
            stdout = proc.stdout.read()
    else:
        proc = subprocess.Popen(argv, stdout=subprocess.PIPE,
                                stderr=subprocess.PIPE, text=True,
                                start_new_session=True)
        try:
            stdout, stderr = proc.communicate(
                timeout=timeout or WORKER_TIMEOUT)
        except subprocess.TimeoutExpired:
            _kill_tree(proc)
            # drain whatever the dead tree left in the pipes — the
            # partial stderr shows how far a killed worker got
            try:
                stdout, stderr = proc.communicate(timeout=10)
            except Exception:
                stderr = ""
            with open(stderr_path + ".timeout", "w") as f:
                f.write(stderr or "")
            print(json.dumps({"worker_timeout": size, "tag": tag}),
                  flush=True)
            return None
        with open(stderr_path, "w") as f:
            f.write(stderr)
    lines = [l for l in stdout.splitlines() if l.startswith("{")]
    if not lines:
        try:
            print(open(stderr_path).read()[-3000:], file=sys.stderr)
        except OSError:
            pass
        return None
    return json.loads(lines[-1])


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 480_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    budget = int(sys.argv[3]) if len(sys.argv) > 3 else 50_000
    n_hosts = max(4, int(n_docs ** 0.5) // 4)

    os.makedirs(SCRATCH, exist_ok=True)
    corpus = os.path.join(
        tempfile.mkdtemp(prefix="patient_corpus_", dir=SCRATCH),
        "documents.parquet")
    spark = get_spark(app_name="patient_corpus_build")
    spark.sparkContext.setLogLevel("ERROR")
    build_bench_corpus(
        spark, n_docs, corpus,
        tokens_per_span=int(os.environ.get("SPIDER_SCALE_TOKENS", "240")),
        n_hosts=n_hosts,
        partitions=int(os.environ.get("SPIDER_SCALE_CORPUS_PARTS", "224")))
    spark.stop()

    deadline = time.time() + DEADLINE_MIN * 60
    pairs = []
    attempt = 0
    while len([p for p in pairs if p["clean"]]) < PAIRS \
            and time.time() < deadline:
        pre = steal_probe()
        pre_sc = syscall_probe()
        if pre > GATE or (0 <= pre_sc < SYSCALL_MIN):
            print(json.dumps({"wait": True, "steal_pct": pre,
                              "syscall_rts": pre_sc}), flush=True)
            time.sleep(120)
            continue
        attempt += 1
        tag = f"p{attempt}"
        # big side FIRST: it needs the shortest clean stretch (~4 min
        # vs ~9 for the small side) and observed interference windows
        # open/close on ~10-minute scales — give the scarce
        # start-of-window slot to the side that dies hardest in a stall
        # (28-way concurrency amplifies the syscall-path degradation)
        r_big = run_worker(N_BIG, corpus, n_hosts, rounds, budget,
                           n_docs, tag)
        if r_big is None:
            continue
        mid = steal_probe()
        mid_sc = syscall_probe()
        r_small = run_worker(N_SMALL, corpus, n_hosts, rounds, budget,
                             n_docs, tag)
        if r_small is None:
            continue
        post = steal_probe()
        post_sc = syscall_probe()

        def best_round_sys(r):
            # sys_pct of the round the best-round metric comes from
            if not r.get("round_cpu"):
                return -1.0
            i = r["round_secs"].index(min(r["round_secs"]))
            return r["round_cpu"][i]["sys_pct"]

        sys_small, sys_big = best_round_sys(r_small), best_round_sys(r_big)
        sc_vals = [x for x in (pre_sc, mid_sc, post_sc) if x >= 0]
        clean = (max(pre, mid, post) <= GATE
                 and (not sc_vals or min(sc_vals) >= SYSCALL_MIN)
                 and max(sys_small, sys_big) <= SYS_GATE)
        eff = (r_big["urls_per_sec"] / r_small["urls_per_sec"]) / (N_BIG / N_SMALL)
        eff_best = (r_big["best_round_urls_per_sec"]
                    / r_small["best_round_urls_per_sec"]) / (N_BIG / N_SMALL)
        pair = {
            "pair": attempt, "clean": clean,
            "steal_pre": pre, "steal_mid": mid, "steal_post": post,
            "syscall_rts": {"pre": pre_sc, "mid": mid_sc, "post": post_sc},
            "sys_pct_best_round": {"small": sys_small, "big": sys_big},
            "small": r_small, "big": r_big,
            "efficiency": round(eff, 3),
            "efficiency_best_round": round(eff_best, 3),
        }
        pairs.append(pair)
        print(json.dumps(pair), flush=True)

    if not pairs:
        print(json.dumps({"mode": "patient", "pairs_run": 0,
                          "result": "no pair completed inside the "
                                    "deadline (host never went quiet)"}),
              flush=True)
        return
    usable = [p for p in pairs if p["clean"]] or pairs
    # the equal-window best-round comparison is the defensible number:
    # kernel stalls strike individual rounds asymmetrically, and every
    # round does identical work (dense seeds keep each at full budget)
    best = max(usable, key=lambda p: p["efficiency_best_round"])
    print(json.dumps({
        "mode": "patient", "gate_pct": GATE, "sys_gate_pct": SYS_GATE,
        "n_docs": n_docs, "rounds": rounds, "budget": budget,
        "N": N_SMALL, "4N": N_BIG,
        "pairs_run": len(pairs),
        "pairs_clean": len([p for p in pairs if p["clean"]]),
        "best_pair": best["pair"],
        "urls_per_sec_N": best["small"]["urls_per_sec"],
        "urls_per_sec_4N": best["big"]["urls_per_sec"],
        "best_round_urls_per_sec_N":
            best["small"]["best_round_urls_per_sec"],
        "best_round_urls_per_sec_4N":
            best["big"]["best_round_urls_per_sec"],
        "scaling_efficiency": best["efficiency"],
        "scaling_efficiency_best_round": best["efficiency_best_round"],
    }), flush=True)


if __name__ == "__main__":
    main()
