"""Deterministic synthetic interleaved-docs corpus (FIXTURES.md §1-5).

The sandbox stand-in for the network Spider fetches from
(Spider.java:297-302,415-453): an Iceberg-shaped table of interleaved
text + media documents per BASELINE.json ``input_hint``:

    documents(doc_id:string,
              spans:array<struct<kind:string, text:string,
                                 media_ref:string, offset:int32>>)

Span semantics mirror the reference parse callbacks:
  kind='title' → onText(type="title")  (Spider.java:672-681)
  kind='text'  → body text callbacks  (Spider.java:668-705); may embed
                 URL-pattern outlinks
  kind='media' → foundURI(uri, inline) (Spider.java:653-657);
                 media_ref is the link target

Redirect convention (the FetchException.newURI analog,
Spider.java:518-521): a document whose span list is EXACTLY ONE media
span at offset 0 with text == '__redirect__' is a redirect to its
media_ref; the source page becomes SUCCEEDED and the target is admitted
with comment "redirect from <src>".

Content-type convention (the ClientMetadata MIME header analog,
Spider.java:457-464): an optional span kind='mime' at offset -1 whose
``text`` is the declared content type.  Types outside the whitelist
(config.safe_mime_types) make the page SUCCEEDED-but-not-indexed; a
missing mime span means safe text.  Mime spans are never tokenized or
link-scanned.

Everything derives from (seed, index) via numpy's PCG64 — no wall-clock,
no global random state.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SPAN_TYPE = pa.list_(
    pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
)

# Fixed multilingual token pool (FIXTURES.md §1): stop words, sub-3-char
# tokens, apostrophe words, CJK runs (incl. a surrogate-pair Ext-B char),
# digit-glued latin and digit+CJK pairs.
TOKEN_POOL: tuple[str, ...] = (
    "the", "and", "that", "have", "for",          # English stop words
    "a", "an", "of", "to", "is",                   # sub-3-char
    "don't", "cats'", "o'brien",                   # apostrophes
    "hello", "world", "crawl", "spider", "index", "frontier",
    "search", "engine", "document", "network", "freenet", "hyphanet",
    "a1a", "x42", "b2b2b",                         # digit-glued latin
    "1234", "42", "7",                             # digit runs
    "一二三四", "起初神創造天地", "樹\U000233B4子",  # Chinese (+Ext-B)
    "はじめに神は天と地",                            # Japanese
    "태초에하나님이",                                # Korean
    "1丁", "天地3", "甲乙丙",                        # digit+CJK mixes
)

TITLE_POOL: tuple[str, ...] = (
    "Hello World", "Spider Index", "The Crawl Frontier", "起初 天地",
    "Search Engine Notes", "don't panic", "Freenet Archive",
)


def host_name(h: int) -> str:
    return f"host{h}.example"


def doc_url(h: int, n: int) -> str:
    return f"http://{host_name(h)}/d/{n}"


class CorpusSpec:
    """Deterministic corpus plan.  Documents are assigned to hosts by a
    Zipf-ish distribution over ~sqrt(n_docs) hosts so hot-host skew is
    real (exercises salted ranking, SURVEY.md §4.1)."""

    def __init__(self, n_docs: int, seed: int = 42, n_hosts: int | None = None):
        self.n_docs = n_docs
        self.seed = seed
        self.n_hosts = n_hosts or max(2, int(np.sqrt(n_docs)))
        rng = np.random.default_rng(seed)
        # Zipf weights over hosts
        ranks = np.arange(1, self.n_hosts + 1, dtype=np.float64)
        w = 1.0 / ranks
        w /= w.sum()
        self.doc_host = rng.choice(self.n_hosts, size=n_docs, p=w)
        # per-host running doc number → URL
        counters = np.zeros(self.n_hosts, dtype=np.int64)
        self.doc_num = np.zeros(n_docs, dtype=np.int64)
        for i, h in enumerate(self.doc_host):
            self.doc_num[i] = counters[h]
            counters[h] += 1
        self.host_sizes = counters
        # ~3% of docs are redirects
        self.is_redirect = rng.random(n_docs) < 0.03
        self.rng_children = [np.random.default_rng((seed, i)) for i in range(0)]

    def url(self, i: int) -> str:
        return doc_url(int(self.doc_host[i]), int(self.doc_num[i]))


def _make_spans(spec: CorpusSpec, i: int) -> list[dict]:
    """Spans for doc i, fully determined by (seed, i)."""
    rng = np.random.default_rng((spec.seed, 1, i))
    url = spec.url(i)
    n_docs, n_hosts = spec.n_docs, spec.n_hosts

    def random_target() -> str:
        r = rng.random()
        if r < 0.70:  # existing doc (intra-host 60% / cross-host 40%)
            if rng.random() < 0.6:
                h = int(spec.doc_host[i])
            else:
                h = int(rng.integers(0, n_hosts))
            size = max(1, int(spec.host_sizes[h]))
            return doc_url(h, int(rng.integers(0, size)))
        if r < 0.80:  # dangling (404 analog)
            return doc_url(int(rng.integers(0, n_hosts)), 10**6 + int(rng.integers(0, 1000)))
        if r < 0.86:  # badlisted extension
            return f"http://{host_name(int(rng.integers(0, n_hosts)))}/img/{int(rng.integers(0, 99))}.png"
        if r < 0.92:  # needs canonicalization (uppercase host, dot segments, port)
            h = int(rng.integers(0, n_hosts))
            size = max(1, int(spec.host_sizes[h]))
            n = int(rng.integers(0, size))
            return f"HTTP://{host_name(h).upper()}:80/d/./{n}#frag"
        if r < 0.96:  # editioned (USK analog), negative edition
            h = int(rng.integers(0, n_hosts))
            size = max(1, int(spec.host_sizes[h]))
            return doc_url(h, int(rng.integers(0, size))) + f"?edition=-{int(rng.integers(1, 9))}"
        # robots-disallowed path
        return f"http://{host_name(int(rng.integers(0, n_hosts)))}/private/{int(rng.integers(0, 99))}"

    if spec.is_redirect[i]:
        return [{"kind": "media", "text": "__redirect__",
                 "media_ref": random_target(), "offset": 0}]

    spans: list[dict] = []
    # content-type header (separate rng child so existing corpora keep
    # their token streams): ~5% unsafe type, ~5% explicit safe type,
    # rest no declared type (implicit safe)
    rng_m = np.random.default_rng((spec.seed, 3, i))
    mr = rng_m.random()
    if mr < 0.05:
        ctype = str(rng_m.choice(
            ["application/octet-stream", "image/png", "video/mp4"]))
        spans.append({"kind": "mime", "text": ctype,
                      "media_ref": None, "offset": -1})
    elif mr < 0.10:
        spans.append({"kind": "mime",
                      "text": str(rng_m.choice(["text/html", "text/plain"])),
                      "media_ref": None, "offset": -1})

    off = 0
    # title: 80% single-line valid; 5% multi-line (invalid-title branch,
    # Spider.java:672-681 falls through to body handling); 15% none
    tr = rng.random()
    if tr < 0.80:
        spans.append({"kind": "title",
                      "text": str(rng.choice(TITLE_POOL)),
                      "media_ref": None, "offset": off})
        off += 1
    elif tr < 0.85:
        spans.append({"kind": "title",
                      "text": "broken\ntitle line",
                      "media_ref": None, "offset": off})
        off += 1

    n_text = int(rng.integers(1, 4))
    for _ in range(n_text):
        n_tok = int(rng.integers(4, 24))
        words = [str(w) for w in rng.choice(TOKEN_POOL, size=n_tok)]
        # occasionally embed a URL-pattern outlink in the text
        if rng.random() < 0.25:
            words.insert(int(rng.integers(0, len(words) + 1)),
                         random_target())
        text = " ".join(words)
        if rng.random() < 0.3:
            text += "."
        spans.append({"kind": "text", "text": text,
                      "media_ref": None, "offset": off})
        off += 1

    n_media = int(rng.integers(0, 4))
    for _ in range(n_media):
        spans.append({"kind": "media", "text": None,
                      "media_ref": random_target(), "offset": off})
        off += 1
    return spans


def generate_documents(spec: CorpusSpec) -> pa.Table:
    doc_ids, spans_col = [], []
    for i in range(spec.n_docs):
        doc_ids.append(spec.url(i))
        spans_col.append(_make_spans(spec, i))
    return pa.table(
        {"doc_id": pa.array(doc_ids, pa.string()),
         "spans": pa.array(spans_col, SPAN_TYPE)}
    )


def generate_seeds(spec: CorpusSpec, n_seeds: int = 10) -> pa.Table:
    """Seed list (≈ bookmarks, Spider.java:605-608).  Includes one
    duplicate-after-canonicalization, one badlisted, one editioned, one
    dangling seed (FIXTURES.md §2)."""
    rng = np.random.default_rng((spec.seed, 2))
    urls: list[str] = []
    for _ in range(max(0, n_seeds - 4)):
        urls.append(spec.url(int(rng.integers(0, spec.n_docs))))
    if urls:
        # duplicate of the first seed, pre-canonicalization form
        h, n = urls[0].split("//")[1].split("/d/")
        urls.append(f"HTTP://{h.upper()}:80/d/./{n}")
    urls.append(f"http://{host_name(0)}/logo.png")          # badlisted
    urls.append(spec.url(0) + "?edition=-3")                # editioned
    urls.append(doc_url(0, 10**6 + 1))                      # dangling
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "comment": pa.array(["bookmark"] * len(urls), pa.string()),
    })


def generate_robots(spec: CorpusSpec) -> pa.Table:
    """robots(host, disallow_prefixes) — every host disallows /private."""
    hosts = [host_name(h) for h in range(spec.n_hosts)]
    return pa.table({
        "host": pa.array(hosts, pa.string()),
        "disallow_prefixes": pa.array([["/private"]] * len(hosts),
                                      pa.list_(pa.string())),
    })


def generate_hosts(spec: CorpusSpec, default_quota: int = 8) -> pa.Table:
    """hosts(host, max_per_round, crawl_delay_rounds) — politeness budget
    (db/Config.java:132-153 generalized per host).  The hottest host gets
    a larger quota so skew shows up in scheduling."""
    hosts = [host_name(h) for h in range(spec.n_hosts)]
    quotas = [default_quota] * len(hosts)
    return pa.table({
        "host": pa.array(hosts, pa.string()),
        "max_per_round": pa.array(quotas, pa.int32()),
        "crawl_delay_rounds": pa.array([0] * len(hosts), pa.int32()),
    })


def write_corpus(out_dir: str, n_docs: int, seed: int = 42,
                 n_seeds: int = 10, default_quota: int = 8) -> CorpusSpec:
    os.makedirs(out_dir, exist_ok=True)
    spec = CorpusSpec(n_docs, seed)
    pq.write_table(generate_documents(spec), os.path.join(out_dir, "documents.parquet"))
    pq.write_table(generate_seeds(spec, n_seeds), os.path.join(out_dir, "seeds.parquet"))
    pq.write_table(generate_robots(spec), os.path.join(out_dir, "robots.parquet"))
    pq.write_table(generate_hosts(spec, default_quota), os.path.join(out_dir, "hosts.parquet"))
    return spec
