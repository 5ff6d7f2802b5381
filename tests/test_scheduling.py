"""Scheduling unit tests: skip-running exclusion hook (Spider.java:227)
and the salted-vs-unsalted ranking equivalence."""

from pyspark.sql import functions as F

from spider_spark.config import CrawlConfig
from spider_spark.operators import scheduling


def _queued(spark, n=40):
    rows = [
        (i, f"http://h{i % 4}.example/d/{i}", f"h{i % 4}.example",
         "QUEUED", 0, None, i)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "id long, url string, host string, status string, priority int, "
        "edition long, last_change long",
    )


def test_exclude_skips_running(spark):
    q = _queued(spark)
    cfg = CrawlConfig(default_host_quota=100)
    full = scheduling.select_batch(q, None, cfg, budget=10)
    first = [r.url for r in full.orderBy("rank").collect()]
    running = spark.createDataFrame([(u,) for u in first[:5]], "url string")
    out = scheduling.select_batch(q, None, cfg, budget=10, exclude=running)
    got = [r.url for r in out.orderBy("rank").collect()]
    assert set(got) & set(first[:5]) == set()
    # the next-best pages take the freed slots, same deterministic order
    assert got == first[5:] + [u for u in
                               [r.url for r in
                                scheduling.select_batch(q, None, cfg, budget=15)
                                .orderBy("rank").collect()]
                               if u not in first][:0 + 5]


def test_salted_matches_unsalted(spark):
    q = _queued(spark, n=60)
    cfg = CrawlConfig(default_host_quota=3, num_salts=4)
    a = scheduling.select_batch(q, None, cfg, budget=10, salted=True)
    b = scheduling.select_batch(q, None, cfg, budget=10, salted=False)
    assert [tuple(r) for r in a.orderBy("rank").collect()] == \
           [tuple(r) for r in b.orderBy("rank").collect()]
