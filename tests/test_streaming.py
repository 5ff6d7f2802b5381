"""Structured Streaming surface tests: watermarked window agg parity
with the batch query, and the edition-stream force-requeue bridge."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from spider_spark.streaming.events import (
    EditionStream,
    politeness_gate,
    run_available_now,
    stream_event_dedup,
    stream_event_sessions,
    stream_event_windows,
    stream_enrich,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    # copy events to a dedicated dir (a file-stream source dir must
    # contain only the stream's files)
    d = str(tmp_path_factory.mktemp("events_stream"))
    spark.read.parquet(f"{sf_dir}/events.parquet").write.mode(
        "overwrite"
    ).parquet(d)
    return d


def test_stream_window_agg_matches_batch(spark, events_dir):
    result = stream_event_windows(spark, events_dir)
    q = run_available_now(result, "t_stream_agg")
    streamed = {
        (r["window_start"], r["event_type"]): (r["n"], round(r["sum_value"], 6))
        for r in spark.sql("SELECT * FROM t_stream_agg").collect()
    }
    q.stop()
    batch = {
        (r["ws"], r["event_type"]): (r["n"], round(r["sum_value"], 6))
        for r in spark.read.parquet(events_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "sum_value")
        .collect()
    }
    assert streamed == batch
    assert len(streamed) > 0


def test_stream_dedup_suppresses_cross_batch_redelivery(
        spark, sf_dir, tmp_path):
    """dropDuplicatesWithinWatermark must suppress re-deliveries of the
    same event_id arriving in a LATER micro-batch (at-least-once
    replay): two source files processed as separate batches via
    maxFilesPerTrigger=1, the second a full replay of the first plus
    fresh rows.  Watermark is wide enough that no dedup state evicts
    inside the test window, so output == batch-distinct exactly."""
    src = (spark.read.parquet(f"{sf_dir}/events.parquet")
           .dropDuplicates(["event_id"]).limit(400).cache())
    first = src.limit(300)
    fresh = src.subtract(first)
    d = str(tmp_path / "dedup_src")
    os.makedirs(d)
    first.coalesce(1).write.parquet(str(tmp_path / "a"))
    first.unionAll(fresh).coalesce(1).write.parquet(str(tmp_path / "b"))
    for i, part in enumerate(("a", "b")):
        f = [x for x in os.listdir(str(tmp_path / part))
             if x.endswith(".parquet")][0]
        shutil.copy(str(tmp_path / part / f), os.path.join(d, f"{i}_{f}"))
    result = stream_event_dedup(spark, d, watermark="3650 days",
                                max_files_per_trigger=1)
    q = (result.writeStream.format("memory").queryName("t_stream_dedup")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    n_batches = len(q.recentProgress)
    streamed = spark.sql(
        "SELECT event_id, count(*) AS c FROM t_stream_dedup GROUP BY 1"
    ).collect()
    q.stop()
    expected_ids = {r["event_id"] for r in src.select("event_id").collect()}
    assert n_batches >= 2  # the replay really arrived in a later batch
    assert {r["event_id"] for r in streamed} == expected_ids
    assert all(r["c"] == 1 for r in streamed)  # every redelivery dropped
    src.unpersist()


def test_stream_sessions_match_batch(spark, events_dir, sf_dir):
    """The session_window streaming twin must reproduce the batch
    lag+running-sum sessionization exactly (t_last = max(ts), which is
    the session_window end minus the gap)."""
    from spider_spark.queries import q_event_sessions

    result = stream_event_sessions(spark, events_dir)
    q = run_available_now(result, "t_stream_sessions")
    streamed = {
        (r["user_id"], r["t_start_epoch"], r["t_last_epoch"], r["n_events"])
        for r in spark.sql("SELECT * FROM t_stream_sessions").collect()
    }
    q.stop()
    batch = {
        (r["user_id"], r["t_start_epoch"], r["t_end_epoch"], r["n_events"])
        for r in q_event_sessions(spark, sf_dir).collect()
    }
    assert streamed == batch
    assert len(streamed) > 0


def test_politeness_gate_state_carries_across_batches(spark, tmp_path):
    """Two micro-batches (maxFilesPerTrigger=1): a host that spends its
    window quota in batch 1 must stay throttled in batch 2 (state
    carry-over), and a new event-time window must refill the bucket."""
    import time as _time

    cols = "host string, url string, t_epoch long"
    d = str(tmp_path / "cand")
    batch1 = [
        ("h1", "http://h1/a", 36000),
        ("h1", "http://h1/b", 36060),
        ("h1", "http://h1/c", 36120),  # over quota
    ]
    batch2 = [
        ("h1", "http://h1/d", 36600),  # same window: reject
        ("h1", "http://h1/e", 39900),  # new window: admit
        ("h2", "http://h2/a", 37800),  # own bucket: admit
    ]
    spark.createDataFrame(batch1, cols).coalesce(1).write.mode(
        "overwrite").parquet(d)
    _time.sleep(1.1)  # file-source ordering is by modification time
    spark.createDataFrame(batch2, cols).coalesce(1).write.mode(
        "append").parquet(d)

    stream = (
        spark.readStream.schema(cols)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    gated = politeness_gate(stream, quota=2, window_s=3600)
    q = run_available_now(gated, "t_polite", output_mode="append")
    rows = {(r["host"], r["url"]): r["slot"]
            for r in spark.sql("SELECT * FROM t_polite").collect()}
    q.stop()
    assert rows == {
        ("h1", "http://h1/a"): 1,
        ("h1", "http://h1/b"): 2,
        ("h1", "http://h1/e"): 1,
        ("h2", "http://h2/a"): 1,
    }


def test_edition_stream_forces_requeue(spark, corpus_dir, corpus, crawl_config,
                                       tmp_path):
    from spider_spark.engine import CrawlEngine
    from spider_spark.state.store import SnapshotStore

    eng = CrawlEngine(
        spark, SnapshotStore(str(tmp_path / "state")),
        corpus_dir + "/documents.parquet", crawl_config,
    )
    eng.bootstrap(corpus["seeds"])
    eng.run(1)
    done = eng.frontier().filter("status != 'QUEUED'").select("url").first()
    assert done is not None

    # stream one edition row through foreachBatch
    src_dir = str(tmp_path / "editions")
    spark.createDataFrame([(done["url"], 4)], "url string, edition long") \
        .write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema("url string, edition long").parquet(src_dir)
    q = EditionStream(eng).start(stream)
    q.awaitTermination()

    row = eng.frontier().filter(F.col("url") == done["url"]).first()
    assert row["status"] == "QUEUED"
    assert row["comment"] == "USK found edition"


def test_stream_enrich_matches_batch_join(spark, events_dir):
    # static dim: user tier; streamed enrichment must equal the batch
    # broadcast join + windowed agg over the same rows
    ev = spark.read.parquet(events_dir).filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull())
    dim = ev.select("user_id").distinct().select(
        "user_id",
        F.when(F.col("user_id") % 3 == 0, "free")
        .when(F.col("user_id") % 3 == 1, "pro")
        .otherwise("enterprise").alias("tier"))
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string").parquet(events_dir)
    q = run_available_now(stream_enrich(stream, dim), "t_enrich_q",
                          output_mode="complete")
    streamed = {
        (r["hour_epoch"], r["tier"], r["event_type"]):
            (r["n"], round(r["sum_value"], 6))
        for r in spark.table("t_enrich_q").collect()
    }
    q.stop()
    batch = {
        (r["hour_epoch"], r["tier"], r["event_type"]):
            (r["n"], round(r["sum_value"], 6))
        for r in ev.join(dim, "user_id")
        .groupBy(F.unix_timestamp(F.date_trunc("hour", "ts"))
                 .alias("hour_epoch"), "tier", "event_type")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value").cast("double"), 6).alias("sum_value"))
        .collect()
    }
    assert streamed == batch
    assert len({k[1] for k in streamed}) == 3  # all three tiers present
