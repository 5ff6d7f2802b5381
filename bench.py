#!/usr/bin/env python
"""Benchmark harness: headline queries + flagship crawl at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total seconds>, "unit": "sec",
   "queries": {name: seconds, ...}, "sf": ...,
   "crawl": {"urls": N, "seconds": s, "urls_per_sec": r}}

The headline number for BASELINE.md's throughput metric is
crawl.urls_per_sec (URLs fetched+indexed per second through the full
admission→schedule→fetch→parse→index→commit pipeline).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spider_spark import queries as Q
from spider_spark.flagship import run_flagship
from spider_spark.session import get_spark

HEADLINE = [
    "topk_per_host",
    "seen_antijoin",
    "robots_filter",
    "term_doc_stats",
    "tf_relevance",
    "buffer_flush_model",
    "doc_tfidf",
    "search_topk",
    "search_phrase",
    "search_snippet",
    "search_bm25",
    "tokenizer_automaton",
    "dedup_exact",
    "dedup_prefix",
    "dedup_incremental",
    "dedup_minhash",
    "decontaminate",
    "dedup_substring",
    "line_dedup",
    "ann_bruteforce",
    "quality_scores",
    "pii_scrub",
    "filter_decisions",
    "unigram_xent",
    "collocations",
    "repetition_scores",
    "token_counts",
    "dataset_split",
    "dataset_balance",
    "lang_temperature",
    "token_budget",
    "shard_assign",
    "pack_sequences",
    "vocab_coverage",
    "length_histogram",
    "length_quantiles",
    "corpus_profile",
    "event_sessions",
    "pricing_summary",
    "top_customers",
    "mime_gate",
    "media_features",
    "media_ref_dedup",
    "pagerank",
    "crawl_depth",
    "link_degrees",
    "anchor_texts",
    "hits",
    "dsir_weights",
    "semdedup",
    "kmeans_embed",
    "bpe_pairs",
    "bpe_encode",
    "minhash_portable",
    "winnow_fingerprints",
    "recrawl_schedule",
    "host_quality",
    "span_sequences",
    "opic",
    "url_traps",
    "gopher_rules",
    "varint_postings",
    "fasttext_quality",
    "tokenizer_fertility",
    "wand_blocks",
    "simhash_portable",
    "ccnet_buckets",
    "filter_funnel",
    "trustrank",
]

CRAWL_ROUNDS = int(os.environ.get("SPIDER_BENCH_ROUNDS", "4"))
CRAWL_BUDGET = int(os.environ.get("SPIDER_BENCH_BUDGET", "1024"))
# seed every host with enough docs that the 4-round crawl reaches its
# configured budget instead of measuring pure frontier-ramp latency:
# 20 hosts x 16 seeds -> rounds fetch ~320 / ~960 / 1024 / 1024 (the
# r1-r3 config, 5 hosts x 1 seed, topped out at ~90 URLs over 4 rounds
# — a fixed-overhead measurement with an idle budget)
CRAWL_SEED_HOSTS = int(os.environ.get("SPIDER_BENCH_SEED_HOSTS", "20"))
CRAWL_SEEDS_PER_HOST = int(os.environ.get("SPIDER_BENCH_SEEDS_PER_HOST", "16"))


# one canonical probe (bench + scaling harness); recorded in the output
# JSON so every wall-clock number carries its host condition
from spider_spark.hostprobe import alu_probe, steal_probe  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    steal_pre = steal_probe()
    alu_pre = alu_probe()
    spark = get_spark(app_name="spider_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # one trivial job before the timing loop so the FIRST headline
    # query doesn't absorb executor/codegen/Arrow session init (~4-5s
    # that belongs to the session, not to topk_per_host), plus one
    # trivial pandas-UDF job so the FIRST Arrow-path query doesn't
    # absorb the Python worker pool spawn (~2s that belonged to
    # robots_filter, the headline's first pandas-UDF user)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from pyspark.sql.functions import pandas_udf  # noqa: E402
    from pyspark.sql.types import LongType  # noqa: E402

    @pandas_udf(LongType())
    def _warm(s):
        return s

    spark.range(32).repartition(32).select(_warm("id")).collect()

    registry = Q.queries()
    times: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        n = registry[name](spark, sf_dir).count()
        times[name] = round(time.time() - t0, 3)
        print(f"# {name}: {times[name]}s ({n} rows)", file=sys.stderr)

    workdir = tempfile.mkdtemp(prefix="spider_bench_")
    try:
        # crawl wall at bench scale is per-job latency and inflates 3-6x
        # under host steal (BENCH.md "Reading a noisy driver window") —
        # bracket the crawl component with its own probes so the number
        # carries its condition
        crawl_steal_pre = steal_probe()
        t0 = time.time()
        eng, postings = run_flagship(
            spark, sf_dir, n_rounds=CRAWL_ROUNDS, budget=CRAWL_BUDGET,
            host_quota=max(4, CRAWL_BUDGET // 8), workdir=workdir,
            n_seed_hosts=CRAWL_SEED_HOSTS,
            seeds_per_host=CRAWL_SEEDS_PER_HOST,
        )
        crawl_secs = time.time() - t0
        urls = eng.store.read_catalog()["totals"].get("fetched", 0)
        n_postings = postings.count()
        times["crawl"] = round(crawl_secs, 3)
        crawl = {
            "rounds": CRAWL_ROUNDS,
            "urls": urls,
            "postings": n_postings,
            "seconds": round(crawl_secs, 3),
            "urls_per_sec": round(urls / crawl_secs, 2) if crawl_secs else 0.0,
            "steal_pct": {"pre": crawl_steal_pre, "post": steal_probe()},
        }
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

    out = {
        "metric": "headline_queries_plus_crawl_wall_seconds",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "crawl": crawl,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "host_steal_pct": {"pre": steal_pre, "post": steal_probe()},
        # per-proc integer Mops: >=10 fast window, 8.5-10 bandwidth-
        # ceiling band, ~6 r4-class slow clock (BENCH.md host-state
        # forensics) — lets a reader place this run's walls on the
        # recorded host-state curve without the external probe logs
        "host_alu_mops": {"pre": alu_pre, "post": alu_probe()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
