"""Structured Streaming surface tests: watermarked window agg parity
with the batch query, and the edition-stream force-requeue bridge."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from spider_spark.streaming.events import (
    EditionStream,
    run_available_now,
    stream_event_windows,
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
