"""Structured Streaming operators.

The reference has NO streaming (SURVEY.md §2.G: it's an incremental
batch loop), and the crawl engine deliberately uses batch rounds for
determinism.  This module covers the streaming surface a complete
engine needs anyway:

  * file-source event stream → watermarked tumbling-window aggregation
    (the streaming twin of queries.q_event_windows)
  * foreachBatch bridge that feeds micro-batches of URL candidates into
    the crawl admission pipeline — Spider's USK-subscription push
    source (Spider.java:757-771) re-expressed as a stream of
    force-requeue candidates
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
    StructField("props", StringType()),
])


def stream_event_windows(
    spark: SparkSession,
    source_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """readStream(parquet) → watermark → tumbling window agg.  Late rows
    beyond the watermark are dropped; with Trigger.AvailableNow the
    result matches the batch q_event_windows on the same data."""
    stream = (
        spark.readStream.schema(EVENT_SCHEMA).parquet(source_dir)
    )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n", "sum_value",
        )
    )


def run_available_now(result: DataFrame, query_name: str = "events_agg"):
    """Drain everything currently available into an in-memory sink and
    stop — the deterministic test/batch-parity mode."""
    q = (
        result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


class EditionStream:
    """foreachBatch bridge: a stream of (url, edition) rows becomes
    force-requeue admissions against a CrawlEngine — the USK
    onFoundEdition push path (Spider.java:757-771, SURVEY §2 A3/B5)."""

    def __init__(self, engine):
        self.engine = engine

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        urls = [r["url"] for r in batch_df.select("url").distinct().collect()]
        if urls:
            self.engine.enqueue(urls, comment="USK found edition", force=True)

    def start(self, source: DataFrame):
        return (
            source.writeStream.foreachBatch(self.process_batch)
            .trigger(availableNow=True)
            .start()
        )
