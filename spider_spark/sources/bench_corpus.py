"""Distributed synthetic bench corpus — generated INSIDE Spark.

For throughput/scaling runs the corpus must be big enough that per-round
work dominates scheduling overhead, and generation itself must scale —
so everything here is JVM-side expressions over ``spark.range`` (no
driver loop, no Python UDF): token choice via xxhash64(id, position),
hosts via a power-law bucket mapping, link targets via arithmetic.

Docs follow the interleaved input_hint shape and the flagship redirect
conventions; text is drawn from the same multilingual pool as the
pytest corpus so the tokenizer does real work (CJK segmentation,
apostrophes, digit gluing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .corpus import TOKEN_POOL, TITLE_POOL


def _url(host_idx, doc_num):
    return F.concat(
        F.lit("http://bench"), host_idx.cast("string"),
        F.lit(".example/d/"), doc_num.cast("string"),
    )


def build_bench_corpus(
    spark: SparkSession,
    n_docs: int,
    out_path: str,
    tokens_per_span: int = 120,
    n_hosts: int | None = None,
    out_degree: int = 3,
    partitions: int | None = None,
    multilingual_pct: int = 100,
) -> None:
    """Write documents.parquet with n_docs interleaved docs.

    Host assignment is power-law-ish: host = floor(sqrt(id % H²))
    maps ~2k/H of ids to host k — host 0 is cold, the top host is hot,
    exercising the salted scheduling path."""
    n_hosts = n_hosts or max(4, int(n_docs ** 0.5) // 4)
    sc_parts = partitions or spark.sparkContext.defaultParallelism
    df = spark.range(0, n_docs, numPartitions=sc_parts)

    host = F.floor(F.sqrt((F.col("id") % (n_hosts * n_hosts)).cast("double"))).cast("long")
    # per-host doc number: how many ids < id map to the same host — for
    # the sqrt mapping, id with host h has doc_num = (id // H²)·(2h+1)
    # + (id % H² − h²); both engine-side and target-side compute it
    # arithmetically, so link targets are valid urls by construction.
    hh = n_hosts * n_hosts
    doc_num = (F.col("id") / hh).cast("long") * (2 * host + 1) + (
        (F.col("id") % hh) - host * host
    )
    url = _url(host, doc_num)

    pool = F.array(*[F.lit(t) for t in TOKEN_POOL])
    ascii_pool_toks = tuple(t for t in TOKEN_POOL if t.isascii())
    ascii_pool = F.array(*[F.lit(t) for t in ascii_pool_toks])
    titles = F.array(*[F.lit(t) for t in TITLE_POOL])

    # multilingual_pct: share of TEXT SPANS drawn from the full
    # (CJK-bearing) pool; the rest draw ASCII-only tokens.  At 2400
    # tokens/span a single CJK token routes the whole span to the
    # per-codepoint automaton fallback, so the default 100 makes EVERY
    # span take the Python path — fine for parity tests, wildly
    # unrepresentative for web text (overwhelmingly ASCII, the case the
    # JVM fast path exists for).  Scaling/throughput runs set a small
    # share (e.g. 2) so the hot path is the measured path while the
    # fallback still runs every round.
    def text_expr(span_no: int):
        multi = F.pmod(
            F.xxhash64(F.col("id"), F.lit(span_no), F.lit("lang")),
            F.lit(100),
        ) < F.lit(multilingual_pct)
        def draw(p, size):
            return F.array_join(
                F.transform(
                    F.sequence(F.lit(0), F.lit(tokens_per_span - 1)),
                    lambda i: F.element_at(
                        p,
                        (F.pmod(F.xxhash64(F.col("id"), F.lit(span_no), i),
                                F.lit(size)) + 1).cast("int"),
                    ),
                ),
                " ",
            )
        return F.when(multi, draw(pool, len(TOKEN_POOL))).otherwise(
            draw(ascii_pool, len(ascii_pool_toks)))

    def link_expr(k: int):
        # target id: deterministic mix of intra-host stride and
        # cross-host jump; always a valid id in [0, n_docs)
        tgt = F.pmod(
            F.col("id") + F.lit(k) + F.pmod(F.xxhash64(F.col("id"), F.lit(100 + k)),
                                            F.lit(7)) * F.lit(k),
            F.lit(n_docs),
        )
        thost = F.floor(F.sqrt((tgt % hh).cast("double"))).cast("long")
        tnum = (tgt / hh).cast("long") * (2 * thost + 1) + ((tgt % hh) - thost * thost)
        return _url(thost, tnum)

    span = lambda kind, text, ref, off: F.struct(
        F.lit(kind).alias("kind"),
        (text if text is not None else F.lit(None).cast("string")).alias("text"),
        (ref if ref is not None else F.lit(None).cast("string")).alias("media_ref"),
        F.lit(off).cast("int").alias("offset"),
    )
    title = F.element_at(
        titles, (F.pmod(F.xxhash64("id"), F.lit(len(TITLE_POOL))) + 1).cast("int")
    )
    spans = F.array(
        span("title", title, None, 0),
        span("text", text_expr(1), None, 1),
        span("text", text_expr(2), None, 2),
        *[span("media", None, link_expr(k + 1), 3 + k) for k in range(out_degree)],
    )
    df.select(url.alias("doc_id"), spans.alias("spans")).write.mode(
        "overwrite"
    ).parquet(out_path)


def bench_seed_urls(n_docs: int, n_hosts: int, n_seeds: int = 8) -> list[str]:
    """n_seeds urls spread evenly over the id space (python mirror of
    the generator's id → (host, doc_num) arithmetic).  Throughput runs
    use a dense seed list so round 1 already fills the budget — with a
    handful of seeds the first rounds only measure frontier ramp-up."""
    import math

    hh = n_hosts * n_hosts
    step = max(1, n_docs // n_seeds)
    urls = []
    for i in range(0, n_docs, step):
        q, r = divmod(i, hh)
        h = math.isqrt(r)
        num = q * (2 * h + 1) + (r - h * h)
        urls.append(f"http://bench{h}.example/d/{num}")
    return urls[:n_seeds]
