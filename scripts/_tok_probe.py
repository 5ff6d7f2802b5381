"""One-off: tokenize-UDF-only scaling probe (no hybrid dispatch).
Usage: _tok_probe.py <cores> <corpus> [n_docs] [mode: udf|hybrid]"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from _scaling_worker import local_session


def cpu():
    return [int(x) for x in open("/proc/stat").readline().split()[1:]]


def main():
    cores = int(sys.argv[1])
    corpus = sys.argv[2]
    n_docs = int(sys.argv[3]) if len(sys.argv) > 3 else 30_000
    mode = sys.argv[4] if len(sys.argv) > 4 else "udf"
    spark = local_session(cores)
    spark.sparkContext.setLogLevel("ERROR")
    from spider_spark.functions.udfs import tokenize_udf, tokens_col
    docs = (spark.read.parquet(corpus)
            .filter(F.xxhash64("doc_id") % 100 < 25)
            .limit(n_docs).repartition(112).cache())
    docs.count()
    spans = docs.select(F.explode("spans").alias("s")).select(
        F.col("s.text").alias("text"), F.col("s.kind").alias("kind"))
    spans = spans.filter(
        F.col("kind").isin("title", "text") & F.col("text").isNotNull())
    if mode == "jvm2":
        # prototype: split-based ASCII twin — one compiled-regex split
        # pass over the string, then cheap non-HOF-regex per-element ops
        def jvm2(text):
            lowered = F.lower(text)
            pieces = F.split(lowered, "[^a-z0-9']+", -1)
            n = F.size(pieces)
            indexed = F.transform(
                pieces, lambda p, i: F.struct(
                    F.regexp_replace(p, "^'+", "").alias("run"),
                    (i == n - 1).alias("last"),
                ))
            kept = F.filter(
                indexed,
                lambda s: (F.length(s["run"]) > 0)
                & ((F.length(F.translate(s["run"], "0123456789'", "")) > 0)
                   | (F.length(s["run"]) >= 3)
                   | s["last"]),
            )
            return F.transform(
                kept, lambda s: F.regexp_replace(s["run"], "'+$", ""))
        fn = jvm2
    else:
        fn = tokenize_udf if mode == "udf" else tokens_col
    t0 = time.time()
    c0 = cpu()
    out = spans.select(F.size(fn(F.col("text"))).alias("n")) \
        .agg(F.sum("n")).collect()[0][0]
    c1 = cpu()
    d = [b - a for a, b in zip(c0, c1)]
    tot = sum(d) or 1
    print(json.dumps({
        "mode": mode, "cores": cores, "out": out,
        "wall_s": round(time.time() - t0, 2),
        "user_pct": round(100 * d[0] / tot, 1),
        "sys_pct": round(100 * d[2] / tot, 1)}))
    spark.stop()


if __name__ == "__main__":
    main()
