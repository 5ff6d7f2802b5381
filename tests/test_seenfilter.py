"""Round-3 scale machinery (VERDICT r2 items 1-3, 6, 8):

  * status-pruned frontier layout — the QUEUED select path lists ONLY
    ``_pstatus=QUEUED`` leaf files (PerstRoot per-status B-trees analog)
  * sharded per-bucket Bloom table — no driver-resident bitmap, stored
    and committed atomically with the frontier, probe has no false
    negatives, engine parity is unchanged with the filter path forced on
  * cuckoo "done" table — force-requeue DELETES from it
    (delete-then-readmit flow), atomically with the same commit
  * append-segment compaction — bounded segment lists, identical reads
  * empty-seed bootstrap — empty bucketed tables read as None instead
    of crashing (ADVICE r2)
"""

import os

import pytest
from pyspark.sql import functions as F

from spider_spark.config import CrawlConfig
from spider_spark.engine import CrawlEngine
from spider_spark.operators import seenfilter
from spider_spark.state.store import SnapshotStore


def _mk_engine(spark, corpus_dir, cfg, root):
    return CrawlEngine(
        spark, SnapshotStore(root), corpus_dir + "/documents.parquet",
        cfg,
        robots=spark.read.parquet(corpus_dir + "/robots.parquet"),
        hosts=spark.read.parquet(corpus_dir + "/hosts.parquet"),
    )


@pytest.fixture(scope="module")
def filter_config(crawl_config):
    """The crawl config with the filter path forced ON (filter tables
    normally engage only past filter_min_keys frontier rows)."""
    import dataclasses
    return dataclasses.replace(crawl_config, filter_min_keys=0)


# -- status-pruned layout -------------------------------------------------


def test_queued_scan_lists_only_queued_files(spark, corpus_dir, corpus,
                                             crawl_config, tmp_path):
    eng = _mk_engine(spark, corpus_dir, crawl_config, str(tmp_path / "sp"))
    eng.bootstrap(corpus["seeds"])
    eng.run(3)
    store = eng.store
    assert store.bucket_sub("frontier") == "_pstatus"

    queued = store.read_status(spark, "frontier", "QUEUED")
    assert queued is not None
    # every file feeding the scan sits under a _pstatus=QUEUED dir
    files = [r[0] for r in queued.select(
        F.input_file_name()).distinct().collect()]
    assert files and all("_pstatus=QUEUED" in f for f in files)
    # and the pruned read equals the filtered full read
    full = store.read(spark, "frontier").filter(F.col("status") == "QUEUED")
    assert sorted(r.url for r in queued.select("url").collect()) == \
        sorted(r.url for r in full.select("url").collect())
    # non-queued statuses exist on disk, in their own leaves
    indexed = store.read_status(spark, "frontier", "INDEXED")
    assert indexed is not None and indexed.count() > 0


# -- sharded bloom + cuckoo engine path -----------------------------------


def test_filter_path_matches_plain_path(spark, corpus_dir, corpus,
                                        crawl_config, filter_config,
                                        tmp_path):
    """Force the sharded-filter machinery on a tiny corpus: frontier,
    crawl log and postings must be identical to the plain anti-join
    engine, and the filter tables must exist + commit atomically."""
    plain = _mk_engine(spark, corpus_dir, crawl_config, str(tmp_path / "a"))
    plain.bootstrap(corpus["seeds"])
    plain.run(3)

    filt = _mk_engine(spark, corpus_dir, filter_config, str(tmp_path / "b"))
    filt.bootstrap(corpus["seeds"])
    filt.run(3)

    def sig(eng):
        fr = sorted(map(tuple, eng.frontier().toPandas().fillna(-1)
                        .values.tolist()))
        log = sorted(map(tuple, eng.crawl_log().toPandas().values.tolist()))
        return fr, log

    assert sig(plain) == sig(filt)
    assert filt.store.is_bucketed("bloom")
    assert filt.store.is_bucketed("done")
    # bloom rows cover exactly the populated frontier buckets
    nb = filter_config.frontier_buckets
    fr_bks = {r["b"] for r in filt.frontier().select(
        seenfilter.bucket_of(F.col("url"), nb).alias("b")).distinct().collect()}
    bloom_bks = {r["bkt"] for r in
                 filt.store.read(spark, "bloom").select("bkt").collect()}
    assert bloom_bks == fr_bks


def test_bloom_probe_no_false_negatives_via_table(spark, corpus_dir, corpus,
                                                  filter_config, tmp_path):
    eng = _mk_engine(spark, corpus_dir, filter_config, str(tmp_path / "c"))
    eng.bootstrap(corpus["seeds"])
    eng.run(2)
    nb = filter_config.frontier_buckets
    bloom_df = eng.store.read(spark, "bloom")
    probed = seenfilter.probe_blooms(
        eng.frontier().select(F.col("url").alias("raw_url"), "url"),
        bloom_df, nb)
    # every frontier URL must probe maybe=True (no false negatives)
    assert probed.filter(~F.col("_maybe")).count() == 0


def test_cuckoo_delete_then_readmit(spark, corpus_dir, corpus,
                                    filter_config, tmp_path):
    """Force-requeue of a fetched page must DELETE it from the done
    table (the Bloom-impossible path), and the requeued page must be
    fetchable again."""
    eng = _mk_engine(spark, corpus_dir, filter_config, str(tmp_path / "d"))
    eng.bootstrap(corpus["seeds"])
    eng.run(2)
    nb = filter_config.frontier_buckets

    done_urls = lambda: {
        r.url for r in seenfilter.probe_cuckoos(
            eng.frontier().select("url"),
            eng.store.read(spark, "done"), nb
        ).filter("_in_done").collect()
    }
    fetched = {r.url for r in eng.frontier()
               .filter(F.col("status") != "QUEUED").select("url").collect()}
    assert fetched, "crawl fetched nothing"
    before = done_urls()
    assert fetched <= before  # no false negatives on the done view

    target = sorted(fetched)[0]
    n = eng.enqueue([target], force=True)
    assert n == 0  # existing page: requeued, not re-created
    row = eng.frontier().filter(F.col("url") == target).first()
    assert row["status"] == "QUEUED"
    after = done_urls()
    assert target not in after  # deleted from the done view
    assert before - after == {target}

    # readmit: the requeued page is selected and fetched again (it
    # ranks behind older QUEUED pages, so allow a few rounds)
    for _ in range(12):
        eng.run(1)
        row2 = eng.frontier().filter(F.col("url") == target).first()
        if row2["status"] != "QUEUED":
            break
    assert row2["status"] != "QUEUED"
    assert target in done_urls()  # re-added on completion


def test_resume_with_filters(spark, corpus_dir, corpus, filter_config,
                             tmp_path):
    """Kill/resume with the filter tables active stays bit-identical."""
    a = _mk_engine(spark, corpus_dir, filter_config, str(tmp_path / "e1"))
    a.bootstrap(corpus["seeds"])
    a.run(4)

    b1 = _mk_engine(spark, corpus_dir, filter_config, str(tmp_path / "e2"))
    b1.bootstrap(corpus["seeds"])
    b1.run(2)
    del b1
    b2 = _mk_engine(spark, corpus_dir, filter_config, str(tmp_path / "e2"))
    b2.run(2)

    def sig(eng):
        return sorted(map(tuple, eng.frontier().toPandas().fillna(-1)
                          .values.tolist()))
    assert sig(a) == sig(b2)


# -- compaction -----------------------------------------------------------


def test_append_compaction_bounds_segments(spark, corpus_dir, corpus,
                                           crawl_config, tmp_path):
    import dataclasses
    cfg = dataclasses.replace(crawl_config, max_append_segments=3)
    eng = _mk_engine(spark, corpus_dir, cfg, str(tmp_path / "f"))
    eng.bootstrap(corpus["seeds"])
    eng.run(2)
    before = eng.postings().toPandas()
    eng.run(3)  # crosses the 3-segment threshold at least once
    cat = eng.store.read_catalog()
    assert len(cat["appends"]["postings"]) < 5
    assert len(cat["appends"]["crawl_log"]) < 5
    assert any(s.startswith("postings/rollup-")
               for s in cat["appends"]["postings"])
    # compaction changed no data: early rows all survive
    after = eng.postings().toPandas()
    key = lambda df: sorted(
        (r["term"], r["doc_id"], r["rel"]) for r in df.to_dict("records"))
    assert set(key(before)) <= set(key(after))
    # gc removes the merged-away segment dirs, reads still work
    eng.store.gc_orphans()
    assert eng.postings().count() == len(after)


def test_rebucket_migration_parity(spark, corpus_dir, corpus,
                                   filter_config, tmp_path):
    """Bucket-count evolution (VERDICT r3 missing #3): a frontier
    bootstrapped at nb=8 migrates to nb=32 mid-crawl and the crawl
    proceeds identically to an engine that ran nb=32 from the start —
    same ids, urls, statuses, titles, and same per-round fetch sets.
    (last_change is excluded: the migration commit occupies a round
    number, shifting the round field of later stamps by design.)"""
    import dataclasses
    cfg8 = dataclasses.replace(filter_config, frontier_buckets=8)
    cfg32 = dataclasses.replace(filter_config, frontier_buckets=32)

    a = _mk_engine(spark, corpus_dir, cfg32, str(tmp_path / "rb_a"))
    a.bootstrap(corpus["seeds"])
    a.run(4)

    b = _mk_engine(spark, corpus_dir, cfg8, str(tmp_path / "rb_b"))
    b.bootstrap(corpus["seeds"])
    b.run(2)
    assert b.store.bucket_count("frontier") == 8
    b.rebucket(32)
    assert b.store.bucket_count("frontier") == 32
    assert b.store.bucket_count("bloom") == 32  # filters rebuilt
    b.run(2)

    def sig(eng):
        return sorted(
            (r["id"], r["url"], r["status"], r["title"], r["comment"])
            for r in eng.frontier().collect())
    assert sig(a) == sig(b)
    # fetch sets per crawl round align (b's log rounds shift by the
    # migration commit)
    def rounds(eng):
        log = eng.crawl_log().collect()
        by_round = {}
        for r in log:
            by_round.setdefault(r["round"], set()).add(r["url"])
        return [by_round[k] for k in sorted(by_round)]
    assert rounds(a) == rounds(b)
    # every row lives in the bucket dir its hash says (new modulus)
    import re as _re
    bucketed = (
        b.frontier()
        .withColumn("_f", F.input_file_name())
        .withColumn("_b", F.pmod(F.xxhash64("url"), F.lit(32)).cast("int"))
        .collect())
    assert bucketed
    for r in bucketed:
        assert int(_re.search(r"bucket=(\d+)", r["_f"]).group(1)) == r["_b"]


def test_snapshot_expiry_bounds_store_dirs(spark, corpus_dir, corpus,
                                           crawl_config, tmp_path):
    """The crawl loop's wired-in expiry (VERDICT r3 #2): a long run —
    ≥3× the compaction cadence — keeps the store's on-disk snapshot-dir
    count bounded instead of stranding every superseded bucket rewrite
    forever.  The keep-last-N grace window retains the most recent
    superseded dirs for concurrent readers of the previous catalog."""
    import dataclasses
    cfg = dataclasses.replace(crawl_config, max_append_segments=2,
                              gc_retain_rounds=2)
    eng = _mk_engine(spark, corpus_dir, cfg, str(tmp_path / "gc"))
    eng.bootstrap(corpus["seeds"])

    def n_dirs():
        root = eng.store.root
        return sum(
            len(os.listdir(os.path.join(root, t)))
            for t in os.listdir(root)
            if os.path.isdir(os.path.join(root, t))
        )

    counts = []
    for _ in range(8):  # 4x the 2-segment compaction cadence
        eng.run_round()
        counts.append(n_dirs())
    # bounded: the dir count stops growing once expiry engages —
    # without gc it grows by >= 2 dirs (frontier snap + postings seg)
    # every round, i.e. the last 4 rounds would add >= 8
    assert counts[-1] - counts[-5] < 8
    # absolute cap: the base working set plus what the time-travel
    # retention window pins — each retained archived catalog keeps one
    # round's superseded dirs alive for as_of readers (store.gc_orphans
    # unions live sets over the snapshot window)
    assert max(counts) < counts[0] + 14 + 6 * (cfg.gc_retain_rounds - 1)
    # the grace window holds: every dir the CURRENT catalog references
    # exists, and reads work
    cat = eng.store.read_catalog()
    live = list(cat["tables"].values())
    for segs in cat["appends"].values():
        live += segs
    for b in cat.get("buckets", {}).values():
        live += list(b["dirs"].values())
    assert all(os.path.exists(os.path.join(eng.store.root, d)) for d in live)
    assert eng.postings().count() > 0
    assert eng.frontier().count() > 0


# -- empty-seed bootstrap (ADVICE r2) -------------------------------------


def test_empty_seed_bootstrap(spark, corpus_dir, corpus, crawl_config,
                              tmp_path):
    eng = _mk_engine(spark, corpus_dir, crawl_config, str(tmp_path / "g"))
    eng.bootstrap([])
    assert eng.store.exists("frontier")
    assert eng.frontier() is None  # empty table reads as None, no crash
    assert eng.run(2) == 0  # rounds over an empty frontier are no-ops
    assert eng.enqueue(corpus["seeds"][:1], force=False) == 1
    assert eng.run(1) == 1  # and the engine recovers once seeded


def test_zero_budget_round_is_noop(spark, corpus_dir, corpus, tmp_path):
    """C1/C2 edge: max_parallel 0/0 (the reference's DEFAULT config —
    crawl disabled until configured, db/Config.java:43-44).  A round
    must fetch nothing, change nothing, and not crash."""
    cfg = CrawlConfig(max_parallel_working=0, max_parallel_non_working=0,
                      default_host_quota=3)
    eng = _mk_engine(spark, corpus_dir, cfg, str(tmp_path / "zb"))
    eng.bootstrap(corpus["seeds"])
    before = {r["status"]: r["count"] for r in
              eng.frontier().groupBy("status").count().collect()}
    assert eng.run(2) == 0
    after = {r["status"]: r["count"] for r in
             eng.frontier().groupBy("status").count().collect()}
    assert before == after
    # seeds include non-canonical twins + badlisted urls; admission
    # collapses them, but everything admitted must still be QUEUED
    assert set(before) == {"QUEUED"} and before["QUEUED"] > 0
