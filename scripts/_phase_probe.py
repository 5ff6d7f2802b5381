"""Diagnostic: one measured round with SPIDER_TIMING at a given core
count.  Usage: _phase_probe.py <cores> <corpus> <n_hosts> <budget> <n_docs>"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ["SPIDER_TIMING"] = "1"

from spider_spark.config import CrawlConfig
from spider_spark.engine import CrawlEngine
from spider_spark.session import get_spark
from spider_spark.sources.bench_corpus import bench_seed_urls
from spider_spark.state.store import SnapshotStore


def main():
    cores, corpus, n_hosts, budget, n_docs = (
        int(sys.argv[1]), sys.argv[2], int(sys.argv[3]),
        int(sys.argv[4]), int(sys.argv[5]),
    )
    if os.environ.get("SPIDER_PROBE_MODE") == "cluster":
        from _scaling_worker import cluster_session
        n_exec = cores // 4
        spark = cluster_session(n_exec)
    else:
        spark = get_spark(master=f"local[{cores}]", shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    cfg = CrawlConfig(max_parallel_working=budget,
                      max_parallel_non_working=budget,
                      default_host_quota=max(8, budget // max(4, n_hosts // 4)))
    wd = tempfile.mkdtemp(prefix=f"probe_{cores}_")
    eng = CrawlEngine(spark, SnapshotStore(os.path.join(wd, "state")),
                      corpus, cfg)
    eng.bootstrap(bench_seed_urls(n_docs, n_hosts, budget * 4))
    eng.run_round()  # warm-up
    print(f"### cores={cores} measured round:", file=sys.stderr)
    t0 = time.time()
    eng.run_round()
    print(f"### cores={cores} TOTAL {time.time()-t0:.1f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
