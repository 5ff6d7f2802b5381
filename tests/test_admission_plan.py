"""Two-pass distributed id/seq assignment (VERDICT r1 item 3).

The default admission plan must contain NO single-partition exchange:
ids come from range-partitioned per-partition ranks plus broadcast
offsets, never a global Window.orderBy funnel.  Identity with the
single-window (and oracle) assignment is pinned by the parity suite;
here we pin the plan shape and the numeric equivalence directly.
"""

from pyspark.sql import functions as F

from spider_spark.config import CrawlConfig
from spider_spark.operators import admission


def _candidates(spark, n=500):
    rows = [
        (i % 7, i % 3, i, f"http://h{i % 11}.example/p/{i:04d}", "c", False)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, admission.CANDIDATE_SCHEMA)


def test_no_single_partition_exchange(spark):
    cfg = CrawlConfig()
    assert cfg.seq_partitions > 1  # distributed assignment is the default
    new_rows, _ = admission.admit(
        spark, _candidates(spark), None, cfg, None,
        rnd=1, seq_start=1, next_id=0,
    )
    plan = new_rows._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
    assert "rangepartitioning" in plan.lower(), plan


def test_two_pass_ids_match_single_window(spark):
    """Same candidates through both paths -> identical (id, seq) per url."""
    cleanup: list = []
    multi, _ = admission.admit(
        spark, _candidates(spark), None,
        CrawlConfig(seq_partitions=8), None,
        rnd=3, seq_start=5, next_id=17, cleanup=cleanup,
    )
    single, _ = admission.admit(
        spark, _candidates(spark), None,
        CrawlConfig(seq_partitions=1), None,
        rnd=3, seq_start=5, next_id=17, cleanup=cleanup,
    )
    key = lambda df: sorted(
        (r.url, r.id, r.last_change)
        for r in df.select("url", "id", "last_change").collect()
    )
    assert key(multi) == key(single)
    for df in cleanup:
        df.unpersist()


def test_priority_ladder_configurable(spark):
    """Request priority classes (db/Config.java:194-201): the ladder is
    configuration, not a hardcoded binary."""
    cleanup: list = []
    rows = [(0, 0, 0, "http://h.example/d/1", "c", False),
            (0, 0, 1, "http://h.example/d/2?edition=-4", "c", False)]
    cand = spark.createDataFrame(rows, admission.CANDIDATE_SCHEMA)
    cfg = CrawlConfig(edition_priority=2, default_priority=4)
    new_rows, _ = admission.admit(spark, cand, None, cfg, None,
                                  rnd=1, seq_start=0, next_id=0,
                                  cleanup=cleanup)
    pr = {r.url: r.priority for r in new_rows.collect()}
    assert pr["http://h.example/d/1"] == 4
    assert [p for u, p in pr.items() if "edition" in u] == [2]
    for df in cleanup:
        df.unpersist()
