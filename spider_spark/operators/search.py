"""Consumer-side search over the engine's OWN postings table — the
operation the reference delegates to the Library plugin over the
TermEntry pages Spider pushes (LibraryBuffer.java:190-211 hands the
sorted per-term entries to Library; Library intersects per-term hit
lists and relevance-ranks).  The driver-gate twins in ``queries.py``
run the same semantics over the documents table (SQL-oracle-able);
these operators run them over the real index the crawl produced —
``CrawlEngine.postings()`` rows ``(term, doc_id, rel, title,
positions, ...)``.

Scale shapes: every search first FILTERS the postings scan to the
query terms (predicate reaches the parquet scan; at 10^10 postings a
term-bucketed or term-sorted layout turns this into a point read),
so all downstream joins/aggregations run over per-term hit lists,
never the full index — the DataFrame analog of opening only the
queried terms' pages.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def and_search(postings: DataFrame, terms: Sequence[str],
               k: int = 10) -> DataFrame:
    """Ranked AND-search: docs whose postings contain ALL ``terms``,
    scored by summed per-term relevance (Spider.java:714's
    occurrences/totalWords, already folded into ``rel`` at index
    time), ordered (score desc, doc_id) top-K.

    The countDistinct == len(terms) gate is the hit-list
    intersection; TakeOrdered gives per-partition top-K + a K-row
    driver merge (no global sort).  Duplicate query terms are
    collapsed first — countDistinct can never exceed the number of
    DISTINCT terms, so comparing against len(terms) with dupes kept
    would be unsatisfiable and silently return zero rows."""
    terms = list(dict.fromkeys(terms))
    hits = (
        postings.filter(F.col("term").isin(terms))
        .groupBy("doc_id")
        .agg(F.sum("rel").alias("score"),
             F.countDistinct("term").alias("_nt"),
             F.any_value("title").alias("title"))
        .filter(F.col("_nt") == len(terms))
    )
    return (
        hits.select("doc_id", "title", F.round("score", 6).alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(k)
    )


def phrase_search(postings: DataFrame, first: str, second: str) -> DataFrame:
    """Adjacency search over the STORED position sets — the exact
    reason the reference persists per-term positions
    (TermPageEntry.java:26; stop words occupy positions, so +1 means
    textually adjacent).  Matches where some position p of ``first``
    has p+1 among ``second``'s positions; title positions (the
    INT32_MIN-offset block, parse.py token_positions) participate the
    same way since both terms' title positions share the offset.

    One equi-join on doc_id between two per-term hit lists; the
    adjacency test is JVM array arithmetic (transform +
    array_intersect) on the two position arrays — no explode, no
    per-position rows."""
    p1 = postings.filter(F.col("term") == first).select(
        "doc_id", F.col("positions").alias("_pos1"))
    p2 = postings.filter(F.col("term") == second).select(
        "doc_id", F.col("positions").alias("_pos2"), "title")
    j = p1.join(p2, "doc_id")
    matched = F.array_intersect(
        F.transform("_pos1", lambda x: x + 1), F.col("_pos2"))
    return (
        j.select("doc_id", "title", matched.alias("_m"))
        .filter(F.size("_m") > 0)
        .select("doc_id", "title",
                F.size("_m").cast("long").alias("n_matches"),
                F.array_min("_m").alias("first_end_pos"))
    )
