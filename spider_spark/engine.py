"""The crawl engine — batched DataFrame rounds (SURVEY.md §3 lifecycle).

One round (≈ startSomeRequests → fetch → onSuccess/onFailure → maybeSend,
Spider.java:206-255,415-541):

  1. budget    — max_parallel(hour), hour := round % 24 (deterministic)
  2. select    — per-host politeness quota + global top-K
                 (operators.scheduling; C1-C4)
  3. fetch     — broadcast-join the ≤K selected URLs against the
                 documents table (A4; the sandbox "network")
  4. parse     — operators.parse (D1-D6), one Arrow tokenize hop
  5. postings  — operators.postings (E1-E6) → append
  6. statuses  — INDEXED / SUCCEEDED(redirect) / FAILED merges (F2-F4)
  7. admit     — outlinks + redirect targets (operators.admission, B1-B5,
                 F1) → frontier union
  8. commit    — one atomic catalog swap for all tables (F5); a crashed
                 round commits nothing and is replayed (NOT_PUSHED→QUEUED
                 analog, LibraryBuffer.java:97-102)

Every source of nondeterminism is pinned (SURVEY §7.3): ids are
admission sequence numbers, last_change is (round<<20)|seq, ranking ties
break on id, the "hour" is round%24.  Resume = re-open the store and
continue from the last committed catalog — bit-identical by
construction, verified by tests/test_resume.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import os
import sys
import time

from .config import CrawlConfig
from .functions.filters import BloomFilter
from .operators import admission, parse, postings, scheduling
from .state.store import SnapshotStore

SEQ_SHIFT = 20  # last_change = (round << 20) | seq

_TIMING = os.environ.get("SPIDER_TIMING", "") == "1"


def _tick(label: str, t0: float) -> float:
    if _TIMING:
        t = time.time()
        print(f"## {label}: {t - t0:.2f}s", file=sys.stderr)
        return t
    return t0


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        store: SnapshotStore,
        documents_path: str,
        config: CrawlConfig | None = None,
        robots: DataFrame | None = None,
        hosts: DataFrame | None = None,
        use_bloom: bool = True,
    ):
        self.spark = spark
        self.store = store
        self.documents_path = documents_path
        self.config = config or CrawlConfig()
        self.robots = robots
        self.hosts = hosts
        self.use_bloom = use_bloom
        self.bloom: BloomFilter | None = None
        self._bloom_count = 0

    # -- bloom maintenance (B4 prefilter) ---------------------------------

    def _build_bloom(self, frontier: DataFrame) -> None:
        """Distributed build: per-partition filters OR-merged on the
        driver (numpy bitmaps are tiny relative to the key set)."""
        if not self.use_bloom:
            return
        n = frontier.count()
        cap = max(4096, 4 * n)
        bpk = self.config.bloom_bits_per_key

        def part_build(rows):
            bf = BloomFilter(cap, bpk)
            for r in rows:
                bf.add(r.url)
            yield bf.bits

        bits_list = frontier.select("url").rdd.mapPartitions(part_build).collect()
        bf = BloomFilter(cap, bpk)
        for bits in bits_list:
            bf.bits |= bits
        self.bloom = bf
        self._bloom_count = n

    def _bloom_add(self, new_rows: DataFrame, n_new: int) -> None:
        if not self.use_bloom or self.bloom is None:
            return
        if (self._bloom_count + n_new) * self.config.bloom_bits_per_key > self.bloom.m:
            self.bloom = None  # force rebuild next round
            return
        # one collect of just the new url strings (bounded by the round's
        # admission count); at 10^10 scale this becomes the same
        # per-partition build + OR-merge as _build_bloom
        self.bloom.add_many(r.url for r in new_rows.select("url").collect())
        self._bloom_count += n_new

    # -- bootstrap (A1 seed source) ---------------------------------------

    def bootstrap(self, seed_urls: list[str], comment: str = "bookmark") -> None:
        """Admit the seed list as round 0 (Spider.java:605-608).  No-op
        if the store already has a frontier (resume path)."""
        if self.store.exists("frontier"):
            return
        cand = self.spark.createDataFrame(
            [(-1, 0, i, u, comment, False) for i, u in enumerate(seed_urls)],
            admission.CANDIDATE_SCHEMA,
        )
        new_rows, _ = admission.admit(
            self.spark, cand, None, self.config, self.robots,
            rnd=0, seq_start=0, next_id=0,
        )
        new_rows = new_rows.coalesce(1).cache()
        n = new_rows.count()
        self.store.commit_round(
            0, rewrites={"frontier": new_rows}, appends={},
            metrics={"next_id": n, "fetched": 0, "admitted": n},
        )
        new_rows.unpersist()

    # -- API: manual enqueue (A2) and edition force-requeue (A3/B5) -------

    def enqueue(self, urls: list[str], comment: str = "manually",
                force: bool = True) -> int:
        """Out-of-band admission (web/MainPage.java:53-70 analog).  Runs
        as its own mini-round commit."""
        cat = self.store.read_catalog()
        rnd = cat["round"]
        next_id = cat["lineage"][-1]["metrics"]["next_id"] if cat["lineage"] else 0
        frontier = self.store.read(self.spark, "frontier")
        cand = self.spark.createDataFrame(
            [(-1, 0, i, u, comment, force) for i, u in enumerate(urls)],
            admission.CANDIDATE_SCHEMA,
        )
        # the enqueue commit IS its own round (rnd+1), so its sequence
        # space starts fresh — no overlap with crawl-round sequences
        new_rows, forced = admission.admit(
            self.spark, cand, frontier, self.config, self.robots,
            rnd=rnd + 1, seq_start=0, next_id=next_id,
        )
        updated = self._apply_updates(frontier, None, forced)
        final = updated.unionByName(new_rows).cache()
        n_new = new_rows.count()
        self.store.commit_round(
            rnd + 1, rewrites={"frontier": final}, appends={},
            metrics={"next_id": next_id + n_new, "fetched": 0,
                     "admitted": n_new},
        )
        final.unpersist()
        self.bloom = None
        return n_new

    # -- status merge helper (F2-F4) --------------------------------------

    @staticmethod
    def _apply_updates(
        frontier: DataFrame,
        updates: DataFrame | None,
        forced: DataFrame | None,
    ) -> DataFrame:
        """MERGE analog: fetched-status updates and force-requeues folded
        into the frontier (Iceberg MERGE WHEN MATCHED at scale)."""
        out = frontier
        if updates is not None:
            u = updates.select(
                "url",
                F.col("status").alias("_u_status"),
                F.col("last_change").alias("_u_lc"),
                F.col("title").alias("_u_title"),
                F.col("set_title").alias("_u_set_title"),
            )
            out = (
                out.join(u, "url", "left")
                .withColumn("status", F.coalesce("_u_status", "status"))
                .withColumn("last_change", F.coalesce("_u_lc", "last_change"))
                .withColumn(
                    "title",
                    F.when(F.coalesce("_u_set_title", F.lit(False)), F.col("_u_title"))
                    .otherwise(F.col("title")),
                )
                .drop("_u_status", "_u_lc", "_u_title", "_u_set_title")
            )
        if forced is not None:
            f = forced.select(
                "url",
                F.col("comment").alias("_f_comment"),
                F.col("last_change").alias("_f_lc"),
            )
            out = (
                out.join(f, "url", "left")
                .withColumn(
                    "status",
                    F.when(F.col("_f_lc").isNotNull(), F.lit("QUEUED"))
                    .otherwise(F.col("status")),
                )
                .withColumn("last_change", F.coalesce("_f_lc", "last_change"))
                .withColumn("comment", F.coalesce("_f_comment", "comment"))
                .drop("_f_comment", "_f_lc")
            )
        return out.select(*admission.FRONTIER_COLUMNS)

    # -- one crawl round ---------------------------------------------------

    def run_round(self) -> int:
        _t = time.time()
        cat = self.store.read_catalog()
        rnd = cat["round"] + 1
        next_id = cat["lineage"][-1]["metrics"]["next_id"] if cat["lineage"] else 0

        frontier = self.store.read(self.spark, "frontier").cache()
        if self.use_bloom and self.bloom is None:
            self._build_bloom(frontier)
        _t = _tick("read+bloom", _t)

        budget = self.config.max_parallel(rnd % 24)
        queued = frontier.filter(F.col("status") == "QUEUED")
        selected = scheduling.select_batch(
            queued, self.hosts, self.config, budget
        ).cache()
        k = selected.count()
        _t = _tick(f"select k={k}", _t)

        if k == 0:
            self.store.commit_round(
                rnd, rewrites={}, appends={},
                metrics={"next_id": next_id, "fetched": 0, "admitted": 0},
            )
            selected.unpersist()
            frontier.unpersist()
            return 0

        # A4 fetch: broadcast the ≤K selected urls against the documents
        # table.  For driver-bounded K we additionally push the url list
        # into the scan as an IN filter — at 100 TB that turns the fetch
        # into row-group-pruned point reads (PushedFilters: In(doc_id))
        # instead of a full scan feeding a broadcast join.
        docs = self.spark.read.parquet(self.documents_path)
        sel = selected.select("id", "url")
        # cap: a K-literal IN expression is embedded in every derived
        # plan, so Catalyst analysis cost grows with K — only worth it
        # for small point-read rounds (at cluster scale the same effect
        # comes from runtime row-group filtering / DPP instead)
        if k <= 1024:
            url_list = [r.url for r in sel.select("url").collect()]
            docs = docs.filter(F.col("doc_id").isin(url_list))
        matched = docs.join(
            F.broadcast(sel), docs["doc_id"] == sel["url"], "inner"
        ).select(sel["id"], sel["url"], docs["spans"])

        normal, redirects = parse.split_redirects(matched)
        normal = normal.cache()
        redirects = redirects.cache()
        if _TIMING:
            normal.count()
            _t = _tick("fetch+cache", _t)

        # cache the exploded+repartitioned spans: BOTH the link-extraction
        # path (admission) and the tokenize path (postings) consume them,
        # and they materialize in different actions — uncached, the
        # fetch join + explode + repartition shuffle would run twice
        spans = parse.exploded_spans(normal).cache()
        # cache the tokenized spans: both the doc metadata aggregate and
        # the postings build consume them — uncached, the Arrow tokenize
        # hop (the round's single biggest CPU cost) would run twice
        tok = parse.tokenized_spans(spans).cache()
        meta = parse.doc_meta(tok, normal).cache()
        if _TIMING:
            tok.count()
            _t = _tick("tokenize+cache", _t)
        # materialize the parse caches before the (concurrent) commit
        # writes — two writer threads racing on an unmaterialized cache
        # would each compute the tokenize hop
        meta.count()
        if _TIMING:
            _t = _tick("meta(tokenize)", _t)
        idx = parse.indexable_tokens(parse.token_positions(tok))
        postings_delta = postings.build_postings(idx, meta)
        links = parse.outlinks(spans)
        redirect_cands = redirects.select(
            F.col("id").alias("discoverer_id"),
            F.lit(0).alias("span_offset"),
            F.lit(0).alias("ordinal"),
            F.col("target").alias("raw_url"),
            F.concat(F.lit("redirect from "), F.col("url")).alias("comment"),
            F.lit(False).alias("force"),
        )
        candidates = links.unionByName(redirect_cands)

        # statuses: INDEXED (parsed) / SUCCEEDED (redirect) / FAILED (no doc)
        outcome = (
            normal.select("url", F.lit("INDEXED").alias("_out"))
            .unionByName(redirects.select("url", F.lit("SUCCEEDED").alias("_out")))
        )
        updates = (
            selected.join(outcome, "url", "left")
            .join(meta.select("url", F.col("title").alias("_m_title")), "url", "left")
            .select(
                "url",
                F.coalesce("_out", F.lit("FAILED")).alias("status"),
                (F.lit(rnd) * F.lit(1 << SEQ_SHIFT) + F.col("rank"))
                .cast("long").alias("last_change"),
                F.col("_m_title").alias("title"),
                (F.coalesce("_out", F.lit("FAILED")) == "INDEXED").alias("set_title"),
            )
        )
        updated = self._apply_updates(frontier, updates, None)

        cleanup: list = []
        new_rows, _ = admission.admit(
            self.spark, candidates, frontier, self.config, self.robots,
            rnd=rnd, seq_start=k + 1, next_id=next_id, bloom=self.bloom,
            cleanup=cleanup,
        )
        new_rows = new_rows.cache()
        n_new = new_rows.count()
        _t = _tick(f"admission n={n_new}", _t)

        frontier_final = updated.unionByName(new_rows)
        crawl_log = selected.select(
            F.lit(rnd).alias("round"), "rank", "url"
        )

        self.store.commit_round(
            rnd,
            rewrites={"frontier": frontier_final},
            appends={"postings": postings_delta, "crawl_log": crawl_log},
            metrics={"next_id": next_id + n_new, "fetched": k,
                     "admitted": n_new},
        )
        _t = _tick("commit", _t)
        self._bloom_add(new_rows, n_new)
        _t = _tick("bloom_add", _t)
        for df in (frontier, selected, normal, redirects, spans, tok, meta,
                   new_rows, *cleanup):
            df.unpersist()
        return k

    def run(self, n_rounds: int) -> int:
        total = 0
        for _ in range(n_rounds):
            total += self.run_round()
        return total

    # -- inspection --------------------------------------------------------

    def frontier(self) -> DataFrame:
        return self.store.read(self.spark, "frontier")

    def postings(self) -> DataFrame | None:
        return self.store.read(self.spark, "postings")

    def crawl_log(self) -> DataFrame | None:
        return self.store.read(self.spark, "crawl_log")
