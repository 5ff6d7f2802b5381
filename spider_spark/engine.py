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
                 analog, LibraryBuffer.java:97-102).  The frontier is
                 BUCKETED by pmod(xxhash64(url), frontier_buckets): only
                 buckets containing this round's status updates or new
                 admissions are rewritten — commit cost scales with the
                 round's update volume, not the frontier size

Every source of nondeterminism is pinned (SURVEY §7.3): ids are
admission sequence numbers, last_change is (round<<32)|seq in 64-bit
(config.SEQ_SHIFT; a round overflowing 2^32 sequences fails loudly
rather than silently carrying into the round field), ranking ties
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

from .config import SEQ_SHIFT, CrawlConfig
from .functions.filters import BloomFilter
from .operators import admission, parse, postings, scheduling
from .state.store import SnapshotStore

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

    # -- frontier bucketing (Iceberg partition-overwrite analog) -----------

    def _n_buckets(self) -> int:
        return (self.store.bucket_count("frontier")
                or self.config.frontier_buckets)

    @staticmethod
    def _bucket_expr(nb: int):
        """Bucket id of a row's url — identical to pmod(url_hash, nb)
        since url_hash := xxhash64(url) at admission."""
        return F.pmod(F.xxhash64(F.col("url")), F.lit(nb)).cast("int")

    def _touched_buckets(self, *dfs: DataFrame) -> list[int]:
        """Distinct bucket ids across the given (small, cached) update
        sets — one tiny job; result is ≤ n_buckets ints."""
        nb = self._n_buckets()
        parts = [df.select("url") for df in dfs if df is not None]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        rows = u.select(self._bucket_expr(nb).alias("b")).distinct().collect()
        return [r.b for r in rows]

    # -- bloom maintenance (B4 prefilter) ---------------------------------
    #
    # Fully JVM+numpy path: xxhash64 pairs computed JVM-side, bitmap set
    # by whole-array numpy inside mapInArrow, partial bitmaps OR-merged
    # on the driver.  No .rdd, no per-row Python, no URL-string collect
    # anywhere.  New admissions are folded in INCREMENTALLY with the
    # same distributed pass — a full rebuild happens only when the
    # filter outgrows its capacity (sized with 4x headroom so rebuilds
    # are rare).  At 10^10 keys the OR-merge becomes a treeAggregate and
    # the filter shards per url_hash bucket; the per-batch kernel is
    # unchanged.

    def _or_into_bloom(self, df_urls: DataFrame) -> None:
        """Distributed partial-bitmap build over df_urls, OR-merged into
        self.bloom (numpy all the way down)."""
        nwords = len(self.bloom.bits)
        m, kk = self.bloom.m, self.bloom.k

        hashed = df_urls.select(
            F.xxhash64("url").alias("h1"),
            F.xxhash64("url", F.lit(1)).alias("h2"),
        )

        def build(batches):
            import numpy as np
            import pyarrow as pa
            bf = BloomFilter.__new__(BloomFilter)  # module-level import
            bf.m, bf.k = m, kk
            bf.bits = np.zeros(nwords, dtype=np.uint64)
            for batch in batches:
                h1 = batch.column("h1").to_numpy(zero_copy_only=False)
                h2 = batch.column("h2").to_numpy(zero_copy_only=False)
                bf.add_hash_arrays(h1.view(np.uint64), h2.view(np.uint64))
            yield pa.RecordBatch.from_arrays(
                [pa.array([bf.bits.tobytes()], type=pa.binary())], ["bits"])

        import numpy as np
        for r in hashed.mapInArrow(build, "bits binary").collect():
            self.bloom.bits |= np.frombuffer(r.bits, dtype=np.uint64)

    def _build_bloom(self, frontier: DataFrame, n: int) -> None:
        """Full (re)build sized for n current keys plus growth headroom.
        n comes from the catalog's next_id — no count job."""
        if not self.use_bloom:
            return
        self.bloom = BloomFilter(max(4096, 4 * n), self.config.bloom_bits_per_key)
        self._or_into_bloom(frontier.select("url"))
        self._bloom_count = n

    def _bloom_add(self, new_rows: DataFrame, n_new: int) -> None:
        if not self.use_bloom or self.bloom is None or n_new == 0:
            return
        if (self._bloom_count + n_new) * self.config.bloom_bits_per_key > self.bloom.m:
            self.bloom = None  # outgrown — rebuild (distributed) next round
            return
        self._or_into_bloom(new_rows.select("url"))
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
        cleanup: list = []
        new_rows, _ = admission.admit(
            self.spark, cand, None, self.config, self.robots,
            rnd=0, seq_start=0, next_id=0, cleanup=cleanup,
        )
        new_rows = new_rows.coalesce(1).cache()
        n = new_rows.count()
        nb = self.config.frontier_buckets
        self.store.commit_round(
            0, rewrites={}, appends={},
            bucket_updates={
                "frontier": (new_rows.withColumn("bucket", self._bucket_expr(nb)), nb)
            },
            metrics={"next_id": n, "fetched": 0, "admitted": n},
        )
        for df in (new_rows, *cleanup):
            df.unpersist()

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
        cleanup: list = []
        new_rows, forced = admission.admit(
            self.spark, cand, frontier, self.config, self.robots,
            rnd=rnd + 1, seq_start=0, next_id=next_id, cleanup=cleanup,
        )
        nb = self._n_buckets()
        new_rows = new_rows.cache()
        n_new = new_rows.count()
        if forced is not None:
            forced = forced.cache()
        if self.store.is_bucketed("frontier"):
            touched = self._touched_buckets(new_rows, forced)
            base = frontier.filter(self._bucket_expr(nb).isin(touched)) \
                if touched else frontier.limit(0)
        else:  # legacy single-dir frontier: migrate by writing all buckets
            base = frontier
        updated = self._apply_updates(base, None, forced)
        final = (
            updated.unionByName(new_rows)
            .withColumn("bucket", self._bucket_expr(nb))
            .repartition(nb, F.col("bucket"))
            .cache()
        )
        self.store.commit_round(
            rnd + 1, rewrites={}, appends={},
            bucket_updates={"frontier": (final, nb)},
            metrics={"next_id": next_id + n_new, "fetched": 0,
                     "admitted": n_new},
        )
        final.unpersist()
        new_rows.unpersist()
        for df in cleanup:
            df.unpersist()
        if forced is not None:
            forced.unpersist()
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
        into the frontier (Iceberg MERGE WHEN MATCHED at scale).  Both
        update sides are ≤K rows — broadcast explicitly rather than
        relying on AQE to notice."""
        out = frontier
        if updates is not None:
            u = F.broadcast(updates.select(
                "url",
                F.col("status").alias("_u_status"),
                F.col("last_change").alias("_u_lc"),
                F.col("title").alias("_u_title"),
                F.col("set_title").alias("_u_set_title"),
            ))
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
            f = F.broadcast(forced.select(
                "url",
                F.col("comment").alias("_f_comment"),
                F.col("last_change").alias("_f_lc"),
            ))
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
            # next_id == pages ever created == frontier row count
            self._build_bloom(frontier, next_id)
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

        # one cached pass over the fetch join; normal / redirect / unsafe
        # (B6 MIME gate) outcomes are cheap filters over it
        flagged = parse.flag_docs(matched, self.config.safe_mime_types).cache()
        normal, redirects, unsafe = parse.split_flagged(flagged)
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

        # statuses: INDEXED (parsed) / SUCCEEDED (redirect or unsafe
        # content type, B6: fetched but never indexed) / FAILED (no doc)
        outcome = (
            normal.select("url", F.lit("INDEXED").alias("_out"))
            .unionByName(redirects.select("url", F.lit("SUCCEEDED").alias("_out")))
            .unionByName(unsafe.select("url", F.lit("SUCCEEDED").alias("_out")))
        )
        updates = (
            selected.join(outcome, "url", "left")
            .join(meta.select("url", F.col("title").alias("_m_title")), "url", "left")
            .select(
                "url",
                F.coalesce("_out", F.lit("FAILED")).alias("status"),
                (F.lit(rnd).cast("long") * F.lit(1 << SEQ_SHIFT)
                 + F.col("rank").cast("long")).alias("last_change"),
                F.col("_m_title").alias("title"),
                (F.coalesce("_out", F.lit("FAILED")) == "INDEXED").alias("set_title"),
            )
        )
        cleanup: list = []
        # small rounds skip the two-pass machinery: its extra jobs
        # (range sample + stats collect) cost more than a one-partition
        # window over a few thousand candidates; the two paths assign
        # IDENTICAL ids (tests/test_admission_plan.py)
        seq_parts = self.config.seq_partitions if k > 4096 else 1
        new_rows, _ = admission.admit(
            self.spark, candidates, frontier, self.config, self.robots,
            rnd=rnd, seq_start=k + 1, next_id=next_id, bloom=self.bloom,
            cleanup=cleanup, seq_partitions=seq_parts,
        )
        new_rows = new_rows.cache()
        n_new = new_rows.count()
        if k + 1 + n_new >= (1 << SEQ_SHIFT):
            raise OverflowError(
                f"round {rnd} sequence space overflow: {k + 1 + n_new} "
                f">= 2^{SEQ_SHIFT}; widen config.SEQ_SHIFT"
            )
        _t = _tick(f"admission n={n_new}", _t)

        # bucketed frontier MERGE: only buckets holding this round's
        # status updates (⊆ selected) or new admissions are re-read,
        # merged, and rewritten — untouched buckets stay immutable
        nb = self._n_buckets()
        if self.store.is_bucketed("frontier"):
            touched = self._touched_buckets(selected, new_rows)
            base = frontier.filter(self._bucket_expr(nb).isin(touched))
        else:  # legacy single-dir frontier: migrate by writing all buckets
            base = frontier
        updated = self._apply_updates(base, updates, None)
        # repartition on bucket so each bucket dir gets ~1 file per
        # write — otherwise the admission side (≈shuffle-partition-many
        # small files) would accumulate into bucket dirs round over
        # round.  The frontier-scan side is already bucket-aligned, so
        # this shuffles only the touched buckets' rows.
        frontier_final = (
            updated.unionByName(new_rows)
            .withColumn("bucket", self._bucket_expr(nb))
            .repartition(nb, F.col("bucket"))
        )
        crawl_log = selected.select(
            F.lit(rnd).alias("round"), "rank", "url"
        )

        self.store.commit_round(
            rnd,
            rewrites={},
            appends={"postings": postings_delta, "crawl_log": crawl_log},
            bucket_updates={"frontier": (frontier_final, nb)},
            metrics={"next_id": next_id + n_new, "fetched": k,
                     "admitted": n_new},
        )
        _t = _tick("commit", _t)
        self._bloom_add(new_rows, n_new)
        _t = _tick("bloom_add", _t)
        for df in (frontier, selected, flagged, spans, tok, meta,
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

    def status_counts(self) -> DataFrame:
        """UI status summary (web/MainPage.java:122-131 analog)."""
        return scheduling.status_counts(self.frontier())

    def top_pages(self, n: int | None = None) -> DataFrame:
        """UI top-N per status in lastChange order, default
        max_shown_uris (web/MainPage.java:197-211, db/Config.java:41)."""
        return scheduling.top_n_per_status(
            self.frontier(), n or self.config.max_shown_uris)
