"""End-to-end engine vs oracle parity (SURVEY.md §5.2, §7.4).

The BASELINE correctness criteria: identical crawl ordering, identical
URL-seen set, and per-document span-sequence equality under the same
seed list + politeness budget.  The oracle defines the truth; the Spark
engine must reproduce it bit-for-bit — every frontier column (id,
status, priority, last_change, title, comment), the full crawl log, and
every posting (rel float32, sorted positions, title).
"""

import pytest

from spider_spark.engine import CrawlEngine
from spider_spark.oracle.simulator import OracleCrawler
from spider_spark.state.store import SnapshotStore

N_ROUNDS = 4


@pytest.fixture(scope="module")
def oracle(corpus, crawl_config):
    oc = OracleCrawler(
        corpus["documents"], corpus["seeds"], crawl_config,
        robots=corpus["robots"], host_quota=corpus["hosts"],
    )
    oc.run(N_ROUNDS)
    return oc


@pytest.fixture(scope="module")
def engine(spark, corpus_dir, corpus, crawl_config, tmp_path_factory):
    store = SnapshotStore(str(tmp_path_factory.mktemp("state")))
    eng = CrawlEngine(
        spark, store, corpus_dir + "/documents.parquet", crawl_config,
        robots=spark.read.parquet(corpus_dir + "/robots.parquet"),
        hosts=spark.read.parquet(corpus_dir + "/hosts.parquet"),
    )
    eng.bootstrap(corpus["seeds"])
    eng.run(N_ROUNDS)
    return eng


def test_url_seen_set_identical(engine, oracle):
    engine_urls = {r.url for r in engine.frontier().select("url").collect()}
    assert engine_urls == oracle.seen_set()


def test_frontier_state_identical(engine, oracle):
    rows = {r["url"]: r for r in engine.frontier().toPandas().to_dict("records")}
    assert len(rows) == len(oracle.state.pages)
    for url, page in oracle.state.pages.items():
        row = rows[url]
        for attr in ("id", "host", "status", "priority", "last_change", "comment"):
            assert row[attr] == getattr(page, attr), (url, attr)
        et = row["title"]
        # engine None/NaN is only acceptable when the oracle title is
        # also None; otherwise the titles must match exactly
        assert (et == page.title) or (
            (et is None or et != et) and page.title is None
        ), url


def test_crawl_order_identical(engine, oracle):
    log = [
        (r["round"], r["rank"], r["url"])
        for r in engine.crawl_log()
        .toPandas()
        .sort_values(["round", "rank"])
        .to_dict("records")
    ]
    assert log == oracle.state.crawl_log


def test_postings_identical(engine, oracle):
    ep = {
        (r["term"], r["doc_id"]): (r["rel"], tuple(r["positions"]), r["title"])
        for r in engine.postings().toPandas().to_dict("records")
    }
    op = {
        (p.term, p.doc_id): (p.rel, tuple(p.positions), p.title)
        for p in oracle.state.postings
    }
    assert set(ep) == set(op)
    for k, (orel, opos, otitle) in op.items():
        erel, epos, etitle = ep[k]
        assert epos == opos, k
        assert erel == orel, k       # float32 bit parity
        assert (etitle is None and otitle is None) or etitle == otitle, k


def test_mime_gate_succeeded_not_indexed(engine, oracle, corpus, crawl_config):
    """B6 (Spider.java:457-464): fetched pages with an unsafe declared
    content type are SUCCEEDED with NO postings, NO outlink admissions,
    NO title — identically in engine and oracle."""
    from spider_spark.oracle.simulator import declared_mime

    unsafe_urls = {
        u for u, spans in corpus["documents"].items()
        if declared_mime(spans) is not None
        and declared_mime(spans) not in crawl_config.safe_mime_types
    }
    rows = {r["url"]: r for r in engine.frontier().toPandas().to_dict("records")}
    fetched_unsafe = {
        u for u in unsafe_urls
        if u in rows and rows[u]["status"] != "QUEUED"
    }
    assert fetched_unsafe, "corpus never exercised the MIME gate"
    posting_docs = {
        r.doc_id for r in engine.postings().select("doc_id").distinct().collect()
    }
    for u in fetched_unsafe:
        assert rows[u]["status"] == "SUCCEEDED", u
        et = rows[u]["title"]
        assert et is None or et != et, u  # no title captured
        assert u not in posting_docs, u   # fetched but never indexed


def test_status_machine_sanity(engine, oracle):
    eng_counts = {
        r["status"]: r["n"]
        for r in engine.frontier().groupBy("status").count()
        .withColumnRenamed("count", "n").toPandas().to_dict("records")
    }
    assert eng_counts == oracle.status_counts()
    # redirect handling produced SUCCEEDED pages and the corpus has 404s
    assert eng_counts.get("INDEXED", 0) > 0
    assert eng_counts.get("FAILED", 0) > 0


def test_consumer_search_over_real_postings(engine, oracle):
    """The Library-side consumer path (SURVEY §2 A5/A7 downstream) run
    over the engine's OWN index: AND-intersection + phrase adjacency on
    the stored position sets, checked against a pure-Python
    recomputation over the oracle's (bit-identical) postings."""
    from spider_spark.operators import search as S

    posts = oracle.state.postings
    by_doc: dict[str, dict[int, str]] = {}
    rel: dict[str, dict[str, float]] = {}
    for p in posts:
        rel.setdefault(p.doc_id, {})[p.term] = float(p.rel)
        m = by_doc.setdefault(p.doc_id, {})
        for pos in p.positions:
            m[pos] = p.term

    # deterministically pick the most frequent adjacent (t1, t2) bigram
    from collections import Counter
    pairs = Counter()
    for m in by_doc.values():
        for pos, t in m.items():
            t2 = m.get(pos + 1)
            if t2 is not None and t2 != t:
                pairs[(t, t2)] += 1
    assert pairs, "corpus produced no adjacent term pair"
    (t1, t2), _ = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))

    expected_phrase = {}
    for doc, m in by_doc.items():
        ends = sorted(pos + 1 for pos, t in m.items()
                      if t == t1 and m.get(pos + 1) == t2)
        if ends:
            expected_phrase[doc] = (len(ends), ends[0])
    got_phrase = {
        r.doc_id: (r.n_matches, r.first_end_pos)
        for r in S.phrase_search(engine.postings(), t1, t2).collect()
    }
    assert got_phrase == expected_phrase
    assert expected_phrase  # the chosen bigram must actually match

    # AND-search: exact score + ordering vs the recomputation
    exp = sorted(
        ((round(rel[d][t1] + rel[d][t2], 6), d) for d in rel
         if t1 in rel[d] and t2 in rel[d]),
        key=lambda sd: (-sd[0], sd[1]))[:10]
    got = [(r.score, r.doc_id)
           for r in S.and_search(engine.postings(), [t1, t2], k=10).collect()]
    assert got == exp

    # duplicate query terms collapse to the distinct set instead of
    # making the intersection gate unsatisfiable (ADVICE r4)
    got_dup = [(r.score, r.doc_id)
               for r in S.and_search(engine.postings(),
                                     [t1, t2, t1, t2], k=10).collect()]
    assert got_dup == exp
