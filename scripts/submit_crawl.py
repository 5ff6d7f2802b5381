"""spark-submit entrypoint for the crawl engine (north-rule packaging).

Run on a cluster with the package shipped to executors as a zip:

    python scripts/make_submit_artifact.py
    spark-submit \
        --master spark://<master>:7077 \
        --py-files dist/spider_spark.zip \
        --conf spark.sql.shuffle.partitions=<4x total-cores> \
        --conf spark.python.unix.domain.socket.enabled=true \
        scripts/submit_crawl.py \
        --documents s3a://bucket/corpus/documents.parquet \
        --store     s3a://bucket/state/crawl1 \
        --seeds     seeds.txt --rounds 10 --budget 50000 \
        --buckets   2048

The session is built WITHOUT a master so spark-submit's --master /
--deploy-mode / --conf all apply; only engine-required settings that a
submitter would never tune (Arrow batching, UTC) are set here as
builder defaults.  Locally the same script runs under plain `python`
(falls back to local[all-cores]).

Emits one JSON line per round (round wall, fetched count) and a final
summary line — the same metric shape bench.py / the scaling harness
report, so cluster runs and sandbox runs are directly comparable.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

from pyspark.sql import SparkSession

# local-run convenience: on a cluster --py-files puts spider_spark on
# the path; under plain `python scripts/submit_crawl.py` the repo root
# isn't there yet
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spider_spark.config import CrawlConfig
from spider_spark.engine import CrawlEngine
from spider_spark.state.store import SnapshotStore


def build_session(app_name: str) -> SparkSession:
    return (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )


def read_seeds(path: str) -> list[str]:
    with open(path) as f:
        return [ln.strip() for ln in f if ln.strip() and not ln.startswith("#")]


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--documents", required=True,
                    help="parquet path of the interleaved-span corpus")
    ap.add_argument("--store", required=True,
                    help="snapshot-store root (frontier/postings/filters)")
    ap.add_argument("--seeds", help="seed-URL file, one per line "
                                    "(omit to resume an existing store)")
    ap.add_argument("--rounds", type=int, default=1)
    ap.add_argument("--budget", type=int, default=0,
                    help="per-round fetch budget (0 = config default)")
    ap.add_argument("--buckets", type=int, default=0,
                    help="frontier bucket count at bootstrap "
                         "(0 = config default; sizing rule: "
                         "ceil(expected_keys / 4e6), see CrawlConfig)")
    ap.add_argument("--host-quota", type=int, default=0,
                    help="per-host politeness quota per round")
    args = ap.parse_args(argv)

    spark = build_session("spider_spark_crawl")
    spark.sparkContext.setLogLevel("WARN")

    kw = {}
    if args.budget:
        kw["max_parallel_working"] = args.budget
        kw["max_parallel_non_working"] = args.budget
    if args.buckets:
        kw["frontier_buckets"] = args.buckets
    if args.host_quota:
        kw["default_host_quota"] = args.host_quota
    eng = CrawlEngine(spark, SnapshotStore(args.store), args.documents,
                      CrawlConfig(**kw))

    if args.seeds:
        eng.bootstrap(read_seeds(args.seeds))

    total = 0
    t0 = time.time()
    for i in range(args.rounds):
        rt = time.time()
        n = eng.run_round()
        total += n
        print(json.dumps({"round": i + 1, "fetched": n,
                          "wall_s": round(time.time() - rt, 2)}), flush=True)
    secs = time.time() - t0
    print(json.dumps({
        "metric": "urls_per_sec", "value": round(total / secs, 1)
        if secs else 0.0, "unit": "urls/sec", "rounds": args.rounds,
        "fetched": total, "wall_s": round(secs, 2),
    }), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
