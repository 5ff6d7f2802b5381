"""spark-submit standalone-cluster scaling pair — the north rule's
literal packaging path (`--py-files` zip, real Master/Worker/executor
processes over TCP) at two cluster sizes on identical input.

The established scaling evidence (BENCH.md) runs pinned local[N]
sessions; this harness closes the remaining gap to the rule's wording
by driving the SAME job through `spark-submit` against a standalone
cluster whose single worker is affinity-pinned to N host CPUs
(`taskset` on the launcher propagates to the worker JVM and every
executor/python child it forks), with `ActiveProcessorCount` sizing
the JVMs for the slice.  Both sides run identical plans: same corpus,
same dense seed list, same shuffle partitioning.

Round 1 is warm-up (JIT, UDF worker pools) and excluded on both sides
identically; throughput is measured over rounds 2..R.  Prints one JSON
line and appends it to bench_artifacts/ when run from the repo root.

Usage: python scripts/submit_scaling.py [n_docs] [rounds] [budget]
       (defaults 60000 3 10000; sizes fixed at 4 and 16 cores)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SPARK = os.environ.get("SPARK_HOME", "/opt/spark")
SCRATCH = os.environ.get("SPIDER_SCALE_TMP", "/dev/shm/spider_submit")
MASTER = "spark://127.0.0.1:7077"


def sh(cmd, **kw):
    return subprocess.run(cmd, check=True, capture_output=True,
                          text=True, **kw)


def start_cluster(cores: int) -> None:
    env = {**os.environ, "SPARK_MASTER_HOST": "127.0.0.1",
           "SPARK_LOCAL_IP": "127.0.0.1",
           "SPARK_WORKER_CORES": str(cores),
           "SPARK_WORKER_MEMORY": f"{2 * cores}g"}
    sh([os.path.join(SPARK, "sbin", "start-master.sh"),
        "-h", "127.0.0.1", "-p", "7077"], env=env)
    # taskset on the launcher: the daemonized worker JVM and every
    # executor / python child it forks inherit the affinity mask —
    # the whole "cluster" lives on exactly `cores` host CPUs
    sh(["taskset", "-c", f"0-{cores - 1}",
        os.path.join(SPARK, "sbin", "start-worker.sh"), MASTER], env=env)
    time.sleep(8)


def stop_cluster() -> None:
    for s in ("stop-worker.sh", "stop-master.sh"):
        subprocess.run([os.path.join(SPARK, "sbin", s)],
                       capture_output=True)
    time.sleep(3)


def run_side(cores: int, corpus: str, seeds: str, rounds: int,
             budget: int, quota: int) -> dict:
    store = os.path.join(SCRATCH, f"store_{cores}")
    subprocess.run(["rm", "-rf", store])
    jvm = f"-XX:ActiveProcessorCount={cores}"
    cmd = [
        "taskset", "-c", f"0-{cores - 1}",
        os.path.join(SPARK, "bin", "spark-submit"),
        "--master", MASTER,
        "--py-files", os.path.join(REPO, "dist", "spider_spark.zip"),
        # spark-submit's 1g executor default loses cached blocks under
        # this workload (tokenize materialization + shuffle) — size the
        # one executor to the worker's memory, 2g per core
        "--conf", f"spark.executor.memory={2 * cores - 1}g",
        "--conf", "spark.driver.memory=4g",
        "--conf", "spark.sql.shuffle.partitions=64",
        "--conf", "spark.sql.files.maxPartitionBytes=16m",
        "--conf", "spark.sql.adaptive.coalescePartitions.enabled=false",
        "--conf", "spark.python.unix.domain.socket.enabled=true",
        "--conf", f"spark.executor.extraJavaOptions={jvm}",
        "--conf", f"spark.driver.extraJavaOptions={jvm}",
        os.path.join(REPO, "scripts", "submit_crawl.py"),
        "--documents", corpus, "--store", store, "--seeds", seeds,
        "--rounds", str(rounds), "--budget", str(budget),
        "--host-quota", str(quota), "--buckets", "112",
    ]
    start_cluster(cores)
    try:
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=3600, cwd=REPO)
    finally:
        stop_cluster()
    lines = [json.loads(ln) for ln in out.stdout.splitlines()
             if ln.startswith("{")]
    if out.returncode != 0 or not lines:
        raise RuntimeError(f"side {cores} failed rc={out.returncode}: "
                           f"{out.stderr[-2000:]}")
    per_round = [ln for ln in lines if "round" in ln]
    measured = per_round[1:]  # round 1 = warm-up, both sides
    fetched = sum(r["fetched"] for r in measured)
    wall = sum(r["wall_s"] for r in measured)
    return {"cores": cores, "rounds": per_round,
            "warmup_s": per_round[0]["wall_s"],
            "measured_fetched": fetched, "measured_wall_s": round(wall, 2),
            "urls_per_sec": round(fetched / wall, 2),
            "best_round_urls_per_sec": round(
                max(r["fetched"] / r["wall_s"] for r in measured), 2)}


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    budget = int(sys.argv[3]) if len(sys.argv) > 3 else 10000

    from spider_spark.sources.bench_corpus import (bench_seed_urls,
                                                   build_bench_corpus)
    from spider_spark.session import get_spark

    n_hosts = max(4, int(n_docs ** 0.5) // 4)
    quota = max(8, budget // max(4, n_hosts // 4))
    os.makedirs(SCRATCH, exist_ok=True)
    corpus = os.path.join(SCRATCH, f"corpus_{n_docs}")
    if not os.path.isdir(corpus):
        spark = get_spark(master="local[16]", shuffle_partitions=32)
        spark.sparkContext.setLogLevel("ERROR")
        build_bench_corpus(spark, n_docs, corpus, tokens_per_span=2400,
                           n_hosts=n_hosts, multilingual_pct=2)
        spark.stop()
    seeds_path = os.path.join(SCRATCH, "seeds.txt")
    with open(seeds_path, "w") as f:
        f.write("\n".join(bench_seed_urls(
            n_docs, n_hosts, n_seeds=budget * (rounds + 2))))
    sh([sys.executable,
        os.path.join(REPO, "scripts", "make_submit_artifact.py")])

    small = run_side(4, corpus, seeds_path, rounds, budget, quota)
    big = run_side(16, corpus, seeds_path, rounds, budget, quota)
    result = {
        "mode": "spark_submit_standalone", "n_docs": n_docs,
        "rounds": rounds, "budget": budget, "N_cores": 4, "4N_cores": 16,
        "small": small, "big": big,
        "efficiency": round(
            big["urls_per_sec"] / (4 * small["urls_per_sec"]), 3),
        "efficiency_best_round": round(
            big["best_round_urls_per_sec"]
            / (4 * small["best_round_urls_per_sec"]), 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
