"""Worker: run the crawl on a prebuilt bench corpus at a given
parallelism; print one JSON line.  Invoked by run_scaling.py in a fresh
process per parallelism level (a SparkSession's master is fixed for the
process lifetime)."""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spider_spark.config import CrawlConfig
from spider_spark.engine import CrawlEngine
from spider_spark.session import get_spark
from spider_spark.sources.bench_corpus import bench_seed_urls
from spider_spark.state.store import SnapshotStore


def main() -> None:
    cores = int(sys.argv[1])
    corpus_path = sys.argv[2]
    n_hosts = int(sys.argv[3])
    rounds = int(sys.argv[4])
    budget = int(sys.argv[5])
    n_docs = int(sys.argv[6])

    spark = get_spark(master=f"local[{cores}]", shuffle_partitions=cores,
                      app_name=f"scaling_{cores}")
    spark.sparkContext.setLogLevel("ERROR")
    cfg = CrawlConfig(
        max_parallel_working=budget,
        max_parallel_non_working=budget,
        default_host_quota=max(8, budget // max(4, n_hosts // 4)),
    )
    wd = tempfile.mkdtemp(prefix=f"scaling_{cores}_")
    eng = CrawlEngine(spark, SnapshotStore(os.path.join(wd, "state")),
                      corpus_path, cfg)
    # dense seed list: every round's selection can fill the budget
    eng.bootstrap(bench_seed_urls(n_docs, n_hosts,
                                  n_seeds=budget * (rounds + 2)))
    # warm-up round: JIT, UDF worker pool, shuffle service — excluded
    # from the measured window on both runs identically
    eng.run_round()
    t0 = time.time()
    fetched = eng.run(rounds)
    secs = time.time() - t0
    postings = eng.postings().count()
    print(json.dumps({
        "cores": cores,
        "rounds": rounds,
        "fetched": fetched,
        "seconds": round(secs, 2),
        "urls_per_sec": round(fetched / secs, 2),
        "postings": postings,
    }))


if __name__ == "__main__":
    main()
