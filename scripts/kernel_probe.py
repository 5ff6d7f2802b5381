"""Kernel-scaling probe: one engine phase kernel, one core count.

Isolates the dominant crawl-round kernels from the engine's round
structure so their intrinsic N-vs-4N scaling is measurable in ~1-min
runs (the full pair costs ~25 min at the heavy config):

  tokenize — corpus scan -> explode -> repartition -> tokens_col ->
             sum(size(tokens))  (the meta phase's CPU core)
  postings — same upstream + posexplode + stop-filter + the postings
             groupBy (the commit phase's shuffle core)

Prints one JSON line with wall seconds and the window's host user/sys
split (the invisible-steal marker).  Usage:

  python scripts/kernel_probe.py <cores> <corpus> <tokenize|postings> [n_docs]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from _scaling_worker import local_session


def cpu_snap():
    f = open("/proc/stat").readline().split()[1:]
    return [int(x) for x in f]


def main():
    cores = int(sys.argv[1])
    corpus = sys.argv[2]
    kernel = sys.argv[3]
    n_docs = int(sys.argv[4]) if len(sys.argv) > 4 else 60_000

    spark = local_session(cores)
    spark.sparkContext.setLogLevel("ERROR")
    from spider_spark.operators import parse, postings

    docs = (
        spark.read.parquet(corpus)
        .filter(F.xxhash64("doc_id") % 100 < 25)  # deterministic sample
        .limit(n_docs)
        .select(F.monotonically_increasing_id().alias("id"),
                F.col("doc_id").alias("url"), "spans")
    )
    # limit() collapses to one partition — spread the cached input so
    # the measured window starts from a realistically-partitioned feed
    # (the engine's fetch join inherits the corpus scan's splits)
    docs = docs.repartition(112).cache()
    n = docs.count()  # materialize input outside the window

    t0 = time.time()
    c0 = cpu_snap()
    spans = parse.exploded_spans(docs)
    tok = parse.tokenized_spans(spans)
    if kernel == "tokenize":
        out = tok.agg(F.sum("n_tok")).collect()[0][0]
    elif kernel == "postings":
        idx = parse.indexable_tokens(parse.token_positions(tok))
        meta = parse.doc_meta(tok, docs)
        out = postings.build_postings(idx, meta).count()
    else:
        raise SystemExit(f"unknown kernel {kernel}")
    c1 = cpu_snap()
    wall = time.time() - t0
    d = [b - a for a, b in zip(c0, c1)]
    tot = sum(d) or 1
    print(json.dumps({
        "kernel": kernel, "cores": cores, "docs": n, "out": out,
        "wall_s": round(wall, 2),
        "user_pct": round(100 * d[0] / tot, 1),
        "sys_pct": round(100 * d[2] / tot, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
