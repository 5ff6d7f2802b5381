"""Structured Streaming operators.

The reference has NO streaming (SURVEY.md §2.G: it's an incremental
batch loop), and the crawl engine deliberately uses batch rounds for
determinism.  This module covers the streaming surface a complete
engine needs anyway:

  * file-source event stream → watermarked tumbling-window aggregation
    (the streaming twin of queries.q_event_windows)
  * gap-based sessionization via the built-in session_window — the
    streaming twin of queries.q_event_sessions (Catalyst's native
    merging-session state store; no custom state code needed)
  * a CUSTOM stateful operator via applyInPandasWithState: a per-host
    politeness token bucket over a URL-candidate stream (the north
    rule's "per-host politeness buckets" as a streaming gate) — state
    carried across micro-batches, deterministic event-time semantics
    (equal to a batch window-rank, which is its DuckDB oracle)
  * foreachBatch bridge that feeds micro-batches of URL candidates into
    the crawl admission pipeline — Spider's USK-subscription push
    source (Spider.java:757-771) re-expressed as a stream of
    force-requeue candidates
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
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


def stream_event_sessions(
    spark: SparkSession,
    source_dir: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based sessionization on a stream via the built-in
    ``session_window`` (Spark's native merging-session state store) —
    the streaming twin of queries.q_event_sessions.  The session
    window's end is last-event-ts + gap, so ``t_last_epoch`` (end − gap)
    equals the batch query's max(ts) per session."""
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(source_dir)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count("*").cast("long").alias("n_events"),
             F.unix_timestamp(F.min("ts")).alias("t_start_epoch"),
             F.unix_timestamp(F.max("ts")).alias("t_last_epoch"))
        .select("user_id", "t_start_epoch", "t_last_epoch", "n_events")
    )


def stream_event_dedup(
    spark: SparkSession,
    source_dir: str,
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming dedup-on-arrival: readStream → watermark →
    ``dropDuplicatesWithinWatermark`` on the event key.  At-least-once
    sources (fetch retries, USK re-notifications, replayed file
    batches) deliver the same event more than once; this suppresses
    re-deliveries whose event-time falls inside the watermark horizon
    while keeping the dedup state store BOUNDED — keys older than the
    watermark are evicted, unlike streaming ``dropDuplicates`` whose
    state grows without bound.  The batch-side analog is the engine's
    URL-seen gate (the reference skips already-SUCCEEDED pages,
    Spider.java:470-476); this is its event-stream twin.

    Append-mode output projected to (event_id, ts, event_type,
    value).  ``max_files_per_trigger`` bounds each micro-batch (and in
    tests forces redeliveries into LATER batches so the dedup state
    store, not same-batch aggregation, does the suppressing)."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    return (
        stream.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "ts", "event_type", "value")
    )


def stream_enrich(
    stream: DataFrame,
    dim: DataFrame,
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-static enrichment: join the event stream to a small
    static dimension (broadcast — the static side is planned as a
    broadcast build once and reused by every micro-batch, never
    re-shuffled), then tumbling 1-hour windowed aggregation per
    (tier, event_type).  This is the canonical Structured Streaming
    enrichment shape — the crawl analog is joining the fetch-result
    stream to the host-config dimension before scheduling.

    Returns the aggregated streaming frame; run with
    ``run_available_now(..., output_mode='complete')``."""
    enriched = (
        stream.withWatermark("ts", watermark)
        .join(F.broadcast(dim), "user_id")
    )
    return (
        enriched.groupBy(F.window("ts", "1 hour"), "tier", "event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("value").cast("double"), 6).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("hour_epoch"),
            "tier", "event_type", "n", "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# custom stateful operator: per-host politeness token bucket

# input: (host string, url string, t_epoch long) — epoch seconds, not
# a timestamp column, so the Arrow/pandas hop never touches timezone
# localization (naive-vs-UTC drift between Spark sessions and DuckDB)
POLITE_OUT_SCHEMA = StructType([
    StructField("host", StringType()),
    StructField("url", StringType()),
    StructField("t_epoch", LongType()),
    StructField("win", LongType()),
    StructField("slot", LongType()),
])

POLITE_STATE_SCHEMA = StructType([
    StructField("win", LongType()),
    StructField("used", LongType()),
])


def politeness_gate(
    candidates: DataFrame, quota: int = 2, window_s: int = 3600
) -> DataFrame:
    """Per-host politeness token bucket over a (host, url, t_epoch)
    URL stream — applyInPandasWithState keyed by host.  Admits at most
    ``quota`` URLs per host per event-time window of ``window_s``
    seconds; ``(win, used)`` state carries across micro-batches so a
    host that spent its budget in batch k stays throttled in batch
    k+1 (tests/test_streaming.py pins the carry-over).

    The event-time semantics are deterministic: with candidates
    processed in (t_epoch, url) order, the admitted set equals the
    batch ``row_number() OVER (PARTITION BY host, win ORDER BY
    t_epoch, url) <= quota`` — which is exactly the DuckDB oracle the
    driver checks (queries.SQL_POLITENESS_GATE)."""

    def gate(key, pdfs, state: GroupState):
        host = key[0]
        if state.exists:
            win, used = state.get
        else:
            win, used = None, 0
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["t_epoch", "url"], kind="mergesort")
        out_host, out_url, out_te, out_win, out_slot = [], [], [], [], []
        for te, url in zip(rows["t_epoch"], rows["url"]):
            te = int(te)
            w = te // window_s
            if w != win:
                win, used = w, 0
            if used < quota:
                used += 1
                out_host.append(host)
                out_url.append(url)
                out_te.append(te)
                out_win.append(w)
                out_slot.append(used)
        state.update((win if win is not None else -1, used))
        # empty-batch dtypes must match the declared schema exactly
        yield pd.DataFrame({
            "host": pd.Series(out_host, dtype="object"),
            "url": pd.Series(out_url, dtype="object"),
            "t_epoch": pd.Series(out_te, dtype="int64"),
            "win": pd.Series(out_win, dtype="int64"),
            "slot": pd.Series(out_slot, dtype="int64"),
        })

    return candidates.groupBy("host").applyInPandasWithState(
        gate, POLITE_OUT_SCHEMA, POLITE_STATE_SCHEMA,
        "append", GroupStateTimeout.NoTimeout,
    )


def run_available_now(result: DataFrame, query_name: str = "events_agg",
                      output_mode: str = "complete"):
    """Drain everything currently available into an in-memory sink and
    stop — the deterministic test/batch-parity mode.  Stateful
    operators declared append-mode (politeness_gate) must pass
    ``output_mode='append'``."""
    q = (
        result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
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
