"""flagship.seed_urls contract tests.

The driver bench's crawl component seeds via seed_urls(n_hosts,
per_host); its striding decides whether a short crawl measures
throughput (spread seeds, x3 neighborhood growth each) or frontier
ramp (contiguous block, ~9 new docs/host/round) — see BENCH.md "Late
round 4".  Pin: determinism, per-host counts, spread, and that
per_host=1 degrades to the historical first-doc-per-host list.
"""

from spider_spark.flagship import seed_urls


def test_seed_urls_deterministic_and_counted(spark, sf_dir):
    a = seed_urls(spark, sf_dir, n_hosts=5, per_host=4)
    b = seed_urls(spark, sf_dir, n_hosts=5, per_host=4)
    assert a == b
    assert len(a) == 20
    hosts = {u.split("//")[1].split(".example")[0] for u in a}
    assert len(hosts) == 5


def test_seed_urls_per_host_one_is_first_doc(spark, sf_dir):
    import pyspark.sql.functions as F
    seeds = seed_urls(spark, sf_dir, n_hosts=3, per_host=1)
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    firsts = {
        f"http://{r['source']}.example/d/{r['doc_id']}"
        for r in d.groupBy("source").agg(F.min("doc_id").alias("doc_id"))
        .orderBy("source").limit(3).collect()
    }
    assert set(seeds) == firsts


def test_seed_urls_are_strided_not_contiguous(spark, sf_dir):
    import pyspark.sql.functions as F
    seeds = seed_urls(spark, sf_dir, n_hosts=1, per_host=8)
    assert len(seeds) == 8
    host = seeds[0].split("//")[1].split(".example")[0]
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ids = sorted(
        r["doc_id"] for r in
        d.filter(F.col("source") == host).select("doc_id").collect())
    picked = sorted(int(u.rsplit("/", 1)[1]) for u in seeds)
    ranks = [ids.index(p) for p in picked]
    # strided picks sit ~n/per_host apart in the host's doc order;
    # a contiguous prefix would have max rank = per_host - 1
    assert max(ranks) > len(ids) // 2
    gaps = [b - a for a, b in zip(ranks, ranks[1:])]
    assert min(gaps) >= (len(ids) // 8) // 2
