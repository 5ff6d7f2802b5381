"""Worker: run the crawl on a prebuilt bench corpus at a given cluster
size; print one JSON line.  Invoked in a fresh process per size.

Uses Spark's local-cluster mode — real separate executor JVMs with
their own block managers and Python worker pools — so the N vs 4N
comparison measures the engine's scaling, not single-JVM lock/GC
contention (which a real cluster doesn't share).
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from spider_spark.config import CrawlConfig
from spider_spark.engine import CrawlEngine
from spider_spark.sources.bench_corpus import bench_seed_urls
from spider_spark.state.store import SnapshotStore

CORES_PER_EXECUTOR = int(os.environ.get('SPIDER_CORES_PER_EXECUTOR', '4'))
EXECUTOR_MEM_MB = 10240


def cluster_session(n_executors: int) -> SparkSession:
    total_cores = n_executors * CORES_PER_EXECUTOR
    return (
        SparkSession.builder
        .master(f"local-cluster[{n_executors},{CORES_PER_EXECUTOR},{EXECUTOR_MEM_MB}]")
        .appName(f"scaling_{n_executors}x{CORES_PER_EXECUTOR}")
        .config("spark.executor.memory", f"{EXECUTOR_MEM_MB - 1024}m")
        # executors run their own Python workers — ship the package (on
        # a real cluster this is spark-submit --py-files spider_spark.zip)
        .config("spark.executorEnv.PYTHONPATH",
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        # every executor JVM sees all host cores and would size its GC /
        # JIT / netty pools for them — cap to the executor's real share
        # so co-located JVMs don't oversubscribe the box (a single-host
        # artifact; irrelevant on a real cluster)
        .config("spark.executor.extraJavaOptions",
                f"-XX:ParallelGCThreads={CORES_PER_EXECUTOR} "
                f"-XX:ConcGCThreads=2 -XX:CICompilerCount=2 "
                f"-XX:ActiveProcessorCount={CORES_PER_EXECUTOR}")
        .config("spark.sql.shuffle.partitions", str(total_cores))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def main() -> None:
    n_executors = int(sys.argv[1])
    corpus_path = sys.argv[2]
    n_hosts = int(sys.argv[3])
    rounds = int(sys.argv[4])
    budget = int(sys.argv[5])
    n_docs = int(sys.argv[6])

    spark = cluster_session(n_executors)
    spark.sparkContext.setLogLevel("ERROR")
    cfg = CrawlConfig(
        max_parallel_working=budget,
        max_parallel_non_working=budget,
        default_host_quota=max(8, budget // max(4, n_hosts // 4)),
    )
    wd = tempfile.mkdtemp(prefix=f"scaling_{n_executors}_")
    eng = CrawlEngine(spark, SnapshotStore(os.path.join(wd, "state")),
                      corpus_path, cfg)
    # dense seed list: every round's selection can fill the budget
    eng.bootstrap(bench_seed_urls(n_docs, n_hosts,
                                  n_seeds=budget * (rounds + 2)))
    # warm-up round: JIT, UDF worker pools, shuffle service — excluded
    # from the measured window on both runs identically
    eng.run_round()
    t0 = time.time()
    fetched = eng.run(rounds)
    secs = time.time() - t0
    postings = eng.postings().count()
    print(json.dumps({
        "executors": n_executors,
        "cores_per_executor": CORES_PER_EXECUTOR,
        "rounds": rounds,
        "fetched": fetched,
        "seconds": round(secs, 2),
        "urls_per_sec": round(fetched / secs, 2),
        "postings": postings,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
