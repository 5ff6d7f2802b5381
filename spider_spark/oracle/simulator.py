"""Single-threaded Python reference simulator — the crawl oracle.

An obviously-correct, sequential implementation of the batch-round crawl
semantics (SURVEY.md §2-3) that the Spark engine is tested against for
IDENTICAL crawl ordering, URL-seen set, frontier state, and postings
(BASELINE.json correctness criteria).

It re-expresses plugin-Spider's callback loop as deterministic rounds:

  round r:
    1. budget   — max_parallel(hour), hour := r % 24 (injected, not
                  wall-clock; ≈ db/Config.java:132-153)
    2. select   — QUEUED pages, per-host politeness quota, ranked by
                  (priority, last_change, id)  (≈ Spider.java:222-239 FIFO
                  scan; graft adds the host dimension per SURVEY §2 C3)
    3. fetch    — join against the documents table (the sandbox network)
    4. parse    — spans in offset order; title/body positions + stop-word
                  semantics exactly as Spider.java:668-705
    5. admit    — outlinks + redirect targets through the admission
                  pipeline (badlists → canonicalize → robots → dedup
                  get-or-create; ≈ Spider.java:155-201)
    6. commit   — status moves, postings delta, crawl log

Deterministic total order pins (SURVEY.md §7.3):
  * page id        — admission sequence number
  * last_change    — (round << SEQ_SHIFT) | seq (64-bit), seq = crawl rank for fetched
                     pages, then K + admission ordinal for admissions
  * admission order— candidates sorted by (discoverer_id, span_offset,
                     link_ordinal, raw_url); seeds use discoverer_id=-1,
                     span_offset=0, ordinal=seed list position
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..config import SEQ_SHIFT, CrawlConfig
from ..functions.links import extract_urls
from ..functions.tokenizer import is_stop_word, tokenize
from ..functions.urlnorm import canonicalize, extract_edition, extract_host, extract_path

INT32_MIN = -(2**31)

REDIRECT_MARK = "__redirect__"


@dataclass
class Page:
    id: int
    url: str
    host: str
    status: str          # QUEUED / NOT_PUSHED / SUCCEEDED / FAILED / INDEXED
    priority: int
    edition: int | None
    last_change: int
    title: str | None = None
    comment: str = ""


@dataclass
class Posting:
    term: str
    doc_id: str
    rel: float
    title: str | None
    positions: list[int]


@dataclass
class OracleState:
    pages: dict[str, Page] = field(default_factory=dict)
    next_id: int = 0
    crawl_log: list[tuple[int, int, str]] = field(default_factory=list)
    postings: list[Posting] = field(default_factory=list)
    round: int = 0


def is_redirect_doc(spans: list[dict]) -> bool:
    return (
        len(spans) == 1
        and spans[0]["kind"] == "media"
        and spans[0].get("text") == REDIRECT_MARK
    )


def declared_mime(spans: list[dict]) -> str | None:
    """Content type declared via a kind='mime' span (corpus convention;
    the ClientMetadata MIME header analog, Spider.java:457-464)."""
    for s in spans:
        if s["kind"] == "mime":
            return s.get("text")
    return None


def parse_document(spans: list[dict]) -> tuple[str | None, dict[str, set[int]], int, list[tuple[int, int, str]]]:
    """Parse one document's spans (offset order) exactly as the
    reference's PageCallBack (Spider.java:659-716).

    Returns (title, {term -> position set}, total_words,
             outlinks as (span_offset, ordinal, raw_url))."""
    title: str | None = None
    positions: dict[str, set[int]] = {}
    total_words = 0
    last_position = None
    outlinks: list[tuple[int, int, str]] = []

    for span in sorted(spans, key=lambda s: s["offset"]):
        kind = span["kind"]
        off = span["offset"]
        if kind == "media":
            if span.get("media_ref"):
                outlinks.append((off, 0, span["media_ref"]))
            continue
        if kind not in ("title", "text"):
            continue  # mime/header spans are never tokenized (B6)
        text = span.get("text")
        if text is None:
            continue
        # title validity rule: non-empty, single line (Spider.java:672-681)
        is_title = kind == "title" and len(text) != 0 and "\n" not in text
        if is_title:
            title = text
        if kind == "text":
            for ordinal, u in enumerate(extract_urls(text)):
                outlinks.append((off, ordinal, u))
        toks = tokenize(text, return_pairs=False)
        if last_position is None:
            last_position = 1
        for i, word in enumerate(toks):
            total_words += 1
            if not is_stop_word(word):
                pos = (INT32_MIN + i) if is_title else (last_position + i)
                positions.setdefault(word, set()).add(pos)
        if not is_title:
            last_position += len(toks)
    return title, positions, total_words, outlinks


class OracleCrawler:
    """The sequential truth.  ``documents`` is {doc_id -> spans list}."""

    def __init__(self, documents: dict[str, list[dict]],
                 seeds: list[str],
                 config: CrawlConfig | None = None,
                 robots: dict[str, list[str]] | None = None,
                 host_quota: dict[str, int] | None = None):
        self.documents = documents
        self.config = config or CrawlConfig()
        self.robots = robots or {}
        self.host_quota = host_quota or {}
        self.state = OracleState()
        # seed admission = "round 0 admissions" with no fetches
        self._admit(
            [(-1, 0, i, u, "bookmark", False) for i, u in enumerate(seeds)],
            rnd=0, seq_start=0,
        )

    # -- admission pipeline (Spider.java:155-201 + graft robots gate) ------

    def _admissible(self, raw_url: str) -> str | None:
        low = raw_url.lower()
        for ext in self.config.badlisted_extensions:
            if low.endswith(ext):
                return None
        for kw in self.config.badlisted_keywords:
            if kw.lower() in low:
                return None
        url = canonicalize(raw_url)
        if url is None:
            return None
        if self.config.respect_robots:
            host = extract_host(url)
            path = extract_path(url)
            for pref in self.robots.get(host, ()):  # graft axis B
                if path.startswith(pref):
                    return None
        return url

    def _admit(self, candidates: list[tuple[int, int, int, str, str, bool]],
               rnd: int, seq_start: int) -> None:
        """candidates: (discoverer_id, span_offset, ordinal, raw_url,
        comment, force) — sorted deterministically, then get-or-create."""
        candidates = sorted(candidates, key=lambda c: (c[0], c[1], c[2], c[3]))
        seq = seq_start
        seen_this_batch: set[str] = set()
        for disc, off, ordn, raw, comment, force in candidates:
            url = self._admissible(raw)
            if url is None:
                continue
            page = self.state.pages.get(url)
            if page is None:
                edition = extract_edition(url)
                self.state.pages[url] = Page(
                    id=self.state.next_id,
                    url=url,
                    host=extract_host(url),
                    status="QUEUED",
                    priority=(self.config.edition_priority
                              if edition is not None
                              else self.config.default_priority),
                    edition=edition,
                    last_change=(rnd << SEQ_SHIFT) | seq,
                    comment=comment,
                )
                self.state.next_id += 1
                seq += 1
            elif force and page.status != "QUEUED":
                page.status = "QUEUED"
                page.comment = comment
                page.last_change = (rnd << SEQ_SHIFT) | seq
                seq += 1
            seen_this_batch.add(url)

    # -- one crawl round ---------------------------------------------------

    def run_round(self) -> int:
        """Run one round; returns number of pages fetched."""
        self.state.round += 1
        rnd = self.state.round
        hour = rnd % 24
        budget = self.config.max_parallel(hour)

        # selection: per-host quota, then global top-K
        queued = [p for p in self.state.pages.values() if p.status == "QUEUED"]
        key = lambda p: (p.priority, p.last_change, p.id)
        by_host: dict[str, list[Page]] = {}
        for p in sorted(queued, key=key):
            by_host.setdefault(p.host, []).append(p)
        eligible: list[Page] = []
        for host, plist in by_host.items():
            q = self.host_quota.get(host, self.config.default_host_quota)
            eligible.extend(plist[:q])
        eligible.sort(key=key)
        selected = eligible[:budget]

        link_candidates: list[tuple[int, int, int, str, str, bool]] = []
        seq = 0
        for rank, page in enumerate(selected, start=1):
            self.state.crawl_log.append((rnd, rank, page.url))
            seq = rank
            spans = self.documents.get(page.url)
            if spans is None:
                page.status = "FAILED"           # fatal fetch (Spider.java:522-524)
            elif is_redirect_doc(spans):
                page.status = "SUCCEEDED"        # redirect (Spider.java:518-521)
                link_candidates.append(
                    (page.id, 0, 0, spans[0]["media_ref"],
                     f"redirect from {page.url}", False))
            elif (declared_mime(spans) is not None
                  and declared_mime(spans) not in self.config.safe_mime_types):
                # B6 MIME gate: unsafe type → SUCCEEDED, not indexed —
                # no postings, no outlinks, no title (Spider.java:457-464)
                page.status = "SUCCEEDED"
            else:
                title, positions, total_words, outlinks = parse_document(spans)
                page.title = title
                for off, ordn, raw in outlinks:
                    link_candidates.append(
                        (page.id, off, ordn, raw,
                         f"Added from {page.url}", False))
                tw = np.float32(total_words)
                for term in sorted(positions):
                    pos = positions[term]
                    self.state.postings.append(Posting(
                        term=term,
                        doc_id=page.url,
                        rel=float(np.float32(len(pos)) / tw) if total_words else 0.0,
                        title=title,
                        positions=sorted(pos),
                    ))
                # NOT_PUSHED → (postings committed this round) → INDEXED
                page.status = "INDEXED"
            page.last_change = (rnd << SEQ_SHIFT) | rank

        self._admit(link_candidates, rnd=rnd, seq_start=seq + 1)
        return len(selected)

    def run(self, n_rounds: int) -> None:
        for _ in range(n_rounds):
            self.run_round()

    # -- inspection helpers ------------------------------------------------

    def seen_set(self) -> set[str]:
        return set(self.state.pages)

    def status_counts(self) -> dict[str, int]:
        out: dict[str, int] = {}
        for p in self.state.pages.values():
            out[p.status] = out.get(p.status, 0) + 1
        return out
