"""Bench-corpus generator tests (sources/bench_corpus.py).

The scaling/throughput harnesses crawl THIS corpus, so its contract is
load-bearing: input_hint span shape, valid intra-corpus link targets
(the engine's "network" must resolve fetches), deterministic content,
and the round-4 ``multilingual_pct`` knob that controls which
tokenizer path the corpus exercises (at 100, every 2400-token span
contains CJK and routes to the per-codepoint automaton; throughput
runs use a small share so the ASCII fast path is the measured path).
"""

import pytest
from pyspark.sql import functions as F

from spider_spark.sources.bench_corpus import bench_seed_urls, build_bench_corpus

N_DOCS, N_HOSTS = 400, 8


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bench_corpus")
    paths = {}
    for pct in (0, 100):
        p = str(root / f"docs_pct{pct}.parquet")
        build_bench_corpus(spark, N_DOCS, p, tokens_per_span=40,
                           n_hosts=N_HOSTS, multilingual_pct=pct)
        paths[pct] = p
    return paths


def test_span_shape_matches_input_hint(spark, built):
    df = spark.read.parquet(built[100])
    assert df.count() == N_DOCS
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert fields["doc_id"] == "string"
    assert fields["spans"] == (
        "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    )
    kinds = [r["k"] for r in df.select(
        F.transform("spans", lambda s: s["kind"]).alias("k")).head(5)]
    assert all(k == ["title", "text", "text", "media", "media", "media"]
               for k in kinds)
    # offsets strictly ordered within every doc
    bad = df.filter(
        F.exists(F.zip_with(
            "spans", F.slice("spans", 2, 100),
            lambda a, b: a["offset"] >= b["offset"]), lambda x: x)
    ).count()
    assert bad == 0


def test_link_targets_resolve(spark, built):
    """Every media_ref is a doc_id of the same corpus — the fetch join
    must be able to resolve every outlink."""
    df = spark.read.parquet(built[0])
    links = df.select(F.explode(F.filter(
        "spans", lambda s: s["kind"] == F.lit("media"))).alias("s")) \
        .select(F.col("s.media_ref").alias("url"))
    unresolved = links.join(
        df.select(F.col("doc_id").alias("url")), "url", "left_anti").count()
    assert unresolved == 0


def test_multilingual_pct_controls_tokenizer_path(spark, built):
    ascii_re = r"^[\x00-\x7F]*$"
    texts = lambda p: (
        spark.read.parquet(p)
        .select(F.explode(F.filter(
            "spans", lambda s: s["kind"] == F.lit("text"))).alias("s"))
        .select(F.col("s.text").alias("t"))
    )
    non_ascii_at_0 = texts(built[0]).filter(~F.col("t").rlike(ascii_re)).count()
    non_ascii_at_100 = texts(built[100]).filter(~F.col("t").rlike(ascii_re)).count()
    total = N_DOCS * 2
    assert non_ascii_at_0 == 0
    # 40 tokens drawn from a pool with 8/39 non-ASCII entries: the odds
    # of an all-ASCII span are (31/39)^40 ~ 1e-4 — require >95%
    assert non_ascii_at_100 > total * 0.95


def test_deterministic_content(spark, built, tmp_path):
    p2 = str(tmp_path / "again.parquet")
    build_bench_corpus(spark, N_DOCS, p2, tokens_per_span=40,
                       n_hosts=N_HOSTS, multilingual_pct=0)
    a = spark.read.parquet(built[0])
    b = spark.read.parquet(p2)
    assert a.unionByName(b).distinct().count() == a.count() == N_DOCS


def test_seed_urls_are_corpus_urls(spark, built):
    seeds = bench_seed_urls(N_DOCS, N_HOSTS, n_seeds=64)
    assert len(seeds) == 64 and len(set(seeds)) == 64
    df = spark.read.parquet(built[0]).select("doc_id")
    sdf = spark.createDataFrame([(s,) for s in seeds], "doc_id string")
    assert sdf.join(df, "doc_id", "left_anti").count() == 0
