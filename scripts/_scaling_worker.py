"""Worker: run the crawl on a prebuilt bench corpus at a given
parallelism; print one JSON line.  Invoked in a fresh process per size.

Two modes (SPIDER_SCALE_MODE):

  local   — ``local[N]`` threads in ONE JVM.  The sandbox-sanctioned
            N-vs-4N proxy: a single host cannot host 4 non-interfering
            executor JVMs (each sizes GC/JIT/netty for all cores, and
            every shuffle crosses loopback TCP), so scaling is
            evidenced by running the same job at two parallelism
            levels on the same input — the executor-thread analog of
            adding cluster nodes, minus the co-location artifacts.
  cluster — ``local-cluster[N,4,...]`` real executor JVMs (the round-1
            harness; kept for the cross-JVM comparison).

Identical input, identical shuffle partitioning (sized for the LARGER
level so both runs execute the same physical plans), one warm-up round
excluded on both sides.
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
MODE = os.environ.get("SPIDER_SCALE_MODE", "local")
# fixed across both levels so both run the same physical plans.
# 112 = 16*7 = 4*28: an exact multiple of BOTH parallelism levels, so
# neither side pays a partial task wave.  At 32 partitions the big side
# ran 32 tasks in 2 waves (28+4) while the small side ran 5 full waves
# — a wave-quantization ceiling of (5/2)/4 = 0.625 efficiency BEFORE
# any host noise, which round 3's phase logs show directly (tokenize
# 26s@7 vs 55s@28).  On a real cluster the same rule is the standard
# 2-4x tasks-per-core sizing; it is not a benchmark trick.
SHUFFLE_PARTITIONS = int(os.environ.get("SPIDER_SCALE_SHUFFLE", "112"))
# frontier buckets: the commit's partitioned write runs one task wave
# sized by len(touched buckets) <= n_buckets, and per-bucket Bloom
# build/update parallelism equals the bucket count — 32 buckets caps
# every one of those at a 2-wave quantized run on 28 cores.  112 is
# wave-exact on both sides (4 waves at 28 cores, 16 at 7); the round-4
# campaign's 128 was exact only at 32 cores (4.57 ragged waves at 28).
FRONTIER_BUCKETS = int(os.environ.get("SPIDER_SCALE_BUCKETS", "112"))
# tmpfs for state + shuffle spill: the sandbox /tmp is disk-backed and
# writeback storms from snapshot commits otherwise bleed into the
# measured window of LATER rounds (observed as 2-3x phase outliers)
SCRATCH = os.environ.get("SPIDER_SCALE_TMP", "/dev/shm/spider_scale")


def _common(builder):
    os.makedirs(os.path.join(SCRATCH, "spark_local"), exist_ok=True)
    return (
        builder
        .config("spark.local.dir", os.path.join(SCRATCH, "spark_local"))
        .config("spark.sql.shuffle.partitions", str(SHUFFLE_PARTITIONS))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        # AQE partition coalescing, parallelism-first (the Spark
        # default): the coalesce floor keys off defaultParallelism, so
        # each side sizes its post-shuffle partitioning to its OWN core
        # count — exactly what a real N-executor vs 4N-executor cluster
        # does.  Round 4 measured the alternative ("identical plans":
        # parallelismFirst=false, 8m advisory) and it CAPS scaling: the
        # admission/commit shuffles coalesce to the same handful of
        # tasks at both sizes (admission scaled 1.33-1.94x of 4x, 28-core
        # host user-CPU ~54%); flipping to parallelism-first cut the
        # 28-core round 48.2s -> 42.6s (622 -> 705 u/s) in the same
        # window class with no change to the 7-core side's plans.
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
                os.environ.get("SPIDER_SCALE_PARALLELISM_FIRST", "true"))
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                os.environ.get("SPIDER_SCALE_ADVISORY_BYTES", "8m"))
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # the bench corpus is a few hundred MB of parquet: default 128MB
        # split packing gives the fetch scan ~4 tasks at ANY core count
        # (the flat 12-13s "fetch+cache" phase in round 3's logs).  16MB
        # splits give both sides enough scan tasks to fill their cores.
        .config("spark.sql.files.maxPartitionBytes",
                os.environ.get("SPIDER_SCALE_SPLIT_BYTES", "16m"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # UDS python bridge: fewer syscalls than loopback TCP, and it
        # sidesteps this guest's intermittent TCP-path degradation
        # (high-sys%-idle-cores stalls — see session.py note)
        .config("spark.python.unix.domain.socket.enabled",
                os.environ.get("SPIDER_UDS", "true"))
        # shuffle/broadcast/spill block codec: lz4 (Spark default) vs
        # zstd A/B for the DRAM-bandwidth-bound regime found in round 5
        # (fewer bytes through the shared memory system per shuffle,
        # more compute per byte)
        .config("spark.io.compression.codec",
                os.environ.get("SPIDER_IO_CODEC", "lz4"))
        .config("spark.ui.enabled", "false")
        # diagnostics: per-stage task/GC/scheduler-delay forensics for
        # the scaling hunt (parsed by scripts/stage_table.py)
        .config("spark.eventLog.enabled",
                os.environ.get("SPIDER_SCALE_EVENTLOG", "false"))
        .config("spark.eventLog.dir",
                os.environ.get("SPIDER_SCALE_EVENTLOG_DIR",
                               os.path.join(SCRATCH, "eventlog")))
        # cache working set (fetch-join spans + token arrays) must fit
        # in storage memory at budget-100k rounds; an undersized heap
        # showed up as 3-5x tokenize-phase blowups from cache eviction
        # + recompute storms, not as an OOM
        .config("spark.driver.memory",
                os.environ.get("SPIDER_SCALE_DRIVER_MEM", "56g"))
    )


def local_session(n_cores: int) -> SparkSession:
    # Faithful N-core proxy: confine the WHOLE process tree (driver
    # JVM, its GC/JIT/netty pools, every python UDF worker) to N host
    # CPUs, exactly like an N-core executor host.  Without this the
    # small side cheats: local[4] runs 4 task threads but its GC/JIT/
    # shuffle-compression threads and Arrow serialization spill onto
    # the other 28 idle host cores — measured as the 4-core side
    # "scaling" only 2.6-2.8x below a 16-core side that has no idle
    # cores to borrow.  ActiveProcessorCount makes the JVM size its
    # internal pools for N instead of 32 (32-sized pools thrashing on
    # N pinned CPUs is its own slowdown).  SPIDER_SCALE_PIN=0 opts out.
    if os.environ.get("SPIDER_SCALE_PIN", "1") == "1":
        os.sched_setaffinity(0, set(range(n_cores)))
        extra = (f"-XX:ActiveProcessorCount={n_cores} "
                 f"-XX:ParallelGCThreads={max(2, n_cores // 2)} "
                 f"-XX:CICompilerCount=2")
    else:
        extra = ""
    return _common(
        SparkSession.builder
        .master(f"local[{n_cores}]")
        .appName(f"scaling_local_{n_cores}")
        .config("spark.driver.extraJavaOptions", extra)
    ).getOrCreate()


def cluster_session(n_executors: int) -> SparkSession:
    return _common(
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
    ).getOrCreate()


def main() -> None:
    size = int(sys.argv[1])  # cores (local mode) or executors (cluster)
    corpus_path = sys.argv[2]
    n_hosts = int(sys.argv[3])
    rounds = int(sys.argv[4])
    budget = int(sys.argv[5])
    n_docs = int(sys.argv[6])

    if MODE == "local":
        spark = local_session(size)
        cores = size
    else:
        spark = cluster_session(size)
        cores = size * CORES_PER_EXECUTOR
    spark.sparkContext.setLogLevel("ERROR")
    cfg = CrawlConfig(
        max_parallel_working=budget,
        max_parallel_non_working=budget,
        default_host_quota=max(8, budget // max(4, n_hosts // 4)),
        frontier_buckets=FRONTIER_BUCKETS,
        # id-assignment range-partitioning: the sequence pass ranks a
        # few tens of thousands of candidate rows — 112 range parts is
        # a tiny-task storm whose wall is pure scheduling overhead (it
        # is an explicit repartition, so AQE cannot coalesce it).  28 =
        # one even wave big side, 4 small side; the assigned ids are
        # identical at any partition count (tests/test_admission_plan.py)
        seq_partitions=int(os.environ.get("SPIDER_SCALE_SEQ_PARTS", "28")),
    )
    os.makedirs(SCRATCH, exist_ok=True)
    wd = tempfile.mkdtemp(prefix=f"scaling_{MODE}_{size}_", dir=SCRATCH)
    eng = CrawlEngine(spark, SnapshotStore(os.path.join(wd, "state")),
                      corpus_path, cfg)
    # dense seed list: every round's selection can fill the budget
    eng.bootstrap(bench_seed_urls(n_docs, n_hosts,
                                  n_seeds=budget * (rounds + 2)))
    # warm-up round: JIT, UDF worker pools, shuffle service — excluded
    # from the measured window on both runs identically
    tw = time.time()
    eng.run_round()
    warmup_s = time.time() - tw
    # hunt mode: a stalled host window shows up immediately as a slow
    # warm-up (clean 28-core warmups run ~40s, stalled ones 200-300s).
    # Bailing here turns a wasted ~10-minute dirty attempt into ~90s,
    # so the hunter can sample many more candidate windows per hour.
    abort_s = float(os.environ.get("SPIDER_SCALE_ABORT_WARMUP_S", "0"))
    if abort_s > 0 and warmup_s > abort_s:
        print(json.dumps({"aborted": "warmup_slow", "size": size,
                          "warmup_s": round(warmup_s, 1)}))
        spark.stop()
        return
    # per-round wall times: single-host noise arrives as multi-second
    # asymmetric spikes (see BENCH.md forensics), so alongside the
    # whole-window number we report per-round throughput — the minimum
    # round is the least-interfered equal-window sample (identical
    # work per round: dense seeds keep every round at full budget).
    # Each round also records the host's user/sys CPU split: the
    # documented interference mode here is guest-KERNEL stalls (sys
    # time ≳ user time at 80% idle with ZERO steal), which the steal
    # probe cannot see — sys_frac is the per-round dirtiness marker.
    def cpu_snap():
        f = open("/proc/stat").readline().split()[1:]
        return [int(x) for x in f]

    round_secs = []
    round_cpu = []
    t0 = time.time()
    fetched = 0
    for _ in range(rounds):
        rt = time.time()
        c0 = cpu_snap()
        fetched += eng.run_round()
        c1 = cpu_snap()
        d = [b - a for a, b in zip(c0, c1)]
        tot = sum(d) or 1
        round_secs.append(round(time.time() - rt, 2))
        round_cpu.append({"user_pct": round(100 * d[0] / tot, 1),
                          "sys_pct": round(100 * d[2] / tot, 1)})
    secs = time.time() - t0
    postings = eng.postings().count()
    print(json.dumps({
        "mode": MODE,
        "size": size,
        "cores": cores,
        "warmup_s": round(warmup_s, 1),
        "rounds": rounds,
        "fetched": fetched,
        "seconds": round(secs, 2),
        "urls_per_sec": round(fetched / secs, 2),
        "round_secs": round_secs,
        "round_cpu": round_cpu,
        "best_round_urls_per_sec": round((fetched / rounds) / min(round_secs), 2),
        "postings": postings,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
