"""Semantic pins for the index-consumer search family (SURVEY §2 A5/D5
downstream): positional phrase search and BM25 ranked retrieval, on a
handcrafted corpus where every expected hit is known by construction.
The engine-vs-oracle value check lives in test_oracle_queries (the new
entries join the parametrized sweep automatically)."""

import pytest

from spider_spark import queries as Q


@pytest.fixture(scope="module")
def tiny_docs_dir(spark, tmp_path_factory):
    """documents.parquet with hand-picked phrase/term structure."""
    rows = [
        # two adjacent "part filter" occurrences; first starts at raw
        # position 1 (0-based) -> first_pos 2 (1-based)
        (1, "alpha part filter beta part filter"),
        # terms present but never adjacent
        (2, "part alpha filter part beta filter"),
        # stop word BEFORE the phrase still occupies a position
        (3, "the part filter"),
        # stop word BETWEEN the terms breaks adjacency
        (4, "part the filter"),
        # phrase at the very start
        (5, "part filter omega"),
        # all three BM25 query terms, repeatedly
        (6, "batch join scan batch join scan batch join scan"),
        # one query term only, diluted by length
        (7, "batch alpha beta gamma delta epsilon zeta eta theta iota"),
        # no query terms at all
        (8, "alpha beta gamma"),
    ]
    d = str(tmp_path_factory.mktemp("tiny_docs"))
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1) \
        .write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def test_phrase_adjacency(spark, tiny_docs_dir):
    got = {
        r.doc_id: (r.n_matches, r.first_pos)
        for r in Q.q_search_phrase(spark, tiny_docs_dir).collect()
    }
    assert got == {
        1: (2, 2),   # positions 1 and 4 (0-based) -> first_pos 2
        3: (1, 2),   # "the" occupies position 0
        5: (1, 1),   # phrase at start
    }
    # docs 2 (never adjacent) and 4 (stop word splits) must NOT match:
    # raw-stream adjacency, exactly like the reference's stored
    # positions (stop words occupy positions, parse.py token_positions)
    assert 2 not in got and 4 not in got


def test_phrase_sql_builder_chains_terms():
    sql = Q._phrase_sql(("one", "two", "three"))
    assert "t1.pos = m0.p0 + 1 AND t1.term = 'two'" in sql
    assert "t2.pos = m0.p0 + 2 AND t2.term = 'three'" in sql


def test_snippet_window(spark, tiny_docs_dir):
    got = {
        r.doc_id: r.snippet
        for r in Q.q_search_snippet(spark, tiny_docs_dir).collect()
    }
    # doc 1: first match at 1-based pos 2 -> window clamps to doc
    # start, extends 3 tokens past the phrase
    assert got[1] == "alpha part filter beta part filter"
    # doc 5: phrase at position 1, only trailing context available
    assert got[5] == "part filter omega"
    # doc 3: "the" is inside the leading context window
    assert got[3] == "the part filter"
    assert set(got) == {1, 3, 5}


def test_bm25_ranking(spark, tiny_docs_dir):
    rows = Q.q_search_bm25(spark, tiny_docs_dir).collect()
    scores = {r.doc_id: r.score for r in rows}
    # only docs containing >= 1 query term appear
    assert set(scores) == {6, 7}
    # doc 6 matches all three terms with tf=3 each; doc 7 matches one
    # term once in a longer doc — strictly lower score
    assert scores[6] > scores[7] > 0.0
    # deterministic: a second run reproduces bit-identical scores
    again = {r.doc_id: r.score for r in Q.q_search_bm25(spark, tiny_docs_dir).collect()}
    assert again == scores


def test_bm25_plan_broadcasts_small_sides(spark, sf_dir):
    plan = Q.q_search_bm25(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    # df table and corpus stats ride broadcast joins; only the doc-keyed
    # groupBys shuffle corpus-sized data
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
