"""N vs 4N scaling experiment (the north rule's criterion): build one
bench corpus, run the identical crawl at two parallelism levels, report
throughput at both plus scaling efficiency.

Default mode (SPIDER_SCALE_MODE=local) compares ``local[N]`` vs
``local[4N]`` executor threads in one JVM — the sandbox-sanctioned
two-cluster-size proxy (see _scaling_worker.py docstring for why
co-located executor JVMs cannot stand in for real nodes).
SPIDER_SCALE_MODE=cluster keeps the round-1 local-cluster harness.

Usage: python scripts/run_scaling.py [n_docs] [rounds] [budget]
"""

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spider_spark.hostprobe import steal_probe  # noqa: F401 (re-exported)
from spider_spark.session import get_spark
from spider_spark.sources.bench_corpus import build_bench_corpus

MODE = os.environ.get("SPIDER_SCALE_MODE", "local")
# default N=7 -> 4N=28 on the 32-core box: leaves cores for the driver
# JVM's shuffle/serialization threads so the big config isn't uniquely
# penalized by oversubscription (a single-host artifact; real executors
# get whole nodes)
N_SMALL = int(os.environ.get("SPIDER_SCALE_N", "7" if MODE == "local" else "2"))
N_BIG = 4 * N_SMALL
TRIALS = int(os.environ.get("SPIDER_SCALE_TRIALS", "2"))
SCRATCH = os.environ.get("SPIDER_SCALE_TMP", "/dev/shm/spider_scale")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    budget = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000
    n_hosts = max(4, int(n_docs ** 0.5) // 4)

    os.makedirs(SCRATCH, exist_ok=True)
    corpus = os.path.join(tempfile.mkdtemp(prefix="scaling_corpus_",
                                           dir=SCRATCH),
                          "documents.parquet")
    spark = get_spark(app_name="scaling_corpus_build")
    spark.sparkContext.setLogLevel("ERROR")
    build_bench_corpus(spark, n_docs, corpus,
                       tokens_per_span=int(os.environ.get("SPIDER_SCALE_TOKENS", "240")),
                       n_hosts=n_hosts,
                       # enough files that the fetch scan can fill 28
                       # cores even after split packing (see worker's
                       # maxPartitionBytes note)
                       partitions=int(os.environ.get(
                           "SPIDER_SCALE_CORPUS_PARTS", "224")))
    spark.stop()

    results = {}
    probes = []
    # alternate sizes across trials (not back-to-back) and keep the best
    # trial per size — single-host runs carry multi-second noise from
    # page-cache state and GC timing; best-of-T is the standard remedy.
    # A steal probe runs before every worker so each window's host
    # condition is on the record (verdict r2: gate on <1%).
    for trial in range(TRIALS):
        for size in (N_SMALL, N_BIG):
            steal = steal_probe()
            probes.append({"trial": trial, "size": size, "steal_pct": steal})
            print(json.dumps(probes[-1]), flush=True)
            out = subprocess.run(
                [sys.executable, os.path.join(os.path.dirname(__file__),
                                              "_scaling_worker.py"),
                 str(size), corpus, str(n_hosts), str(rounds), str(budget),
                 str(n_docs)],
                capture_output=True, text=True, timeout=3600,
            )
            with open(os.path.join(SCRATCH,
                                   f"worker_{size}_t{trial}.stderr"), "w") as f:
                f.write(out.stderr)
            lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
            if not lines:
                print(out.stdout[-2000:], file=sys.stderr)
                print(out.stderr[-4000:], file=sys.stderr)
                raise SystemExit(f"worker {size} produced no result")
            r = json.loads(lines[-1])
            r["steal_pct"] = steal
            print(lines[-1], flush=True)
            if size not in results or r["urls_per_sec"] > results[size]["urls_per_sec"]:
                results[size] = r

    ups_n, ups_4n = (results[N_SMALL]["urls_per_sec"],
                     results[N_BIG]["urls_per_sec"])
    eff = (ups_4n / ups_n) / (N_BIG / N_SMALL)
    bups_n = results[N_SMALL].get("best_round_urls_per_sec", ups_n)
    bups_4n = results[N_BIG].get("best_round_urls_per_sec", ups_4n)
    eff_best = (bups_4n / bups_n) / (N_BIG / N_SMALL)
    summary = {
        "mode": MODE,
        "probes": probes,
        "best_round_urls_per_sec_N": bups_n,
        "best_round_urls_per_sec_4N": bups_4n,
        "scaling_efficiency_best_round": round(eff_best, 3),
        "n_docs": n_docs, "rounds": rounds, "budget": budget,
        "N": N_SMALL, "4N": N_BIG,
        "urls_per_sec_N": ups_n, "urls_per_sec_4N": ups_4n,
        "speedup": round(ups_4n / ups_n, 3),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
