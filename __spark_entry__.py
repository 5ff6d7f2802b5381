"""Driver contract for the spark-graft builder (PySpark target).

``entry``      — flagship end-to-end crawl (derive interleaved corpus
                 from sf0.001 documents → 3 CrawlEngine rounds →
                 postings), SURVEY.md §7.4's minimum slice at driver
                 scale.
``queries``    — one entry per operator family from SURVEY.md §2 plus
                 the training-pipeline operators (dedup / ANN / text).
``oracle_sql`` — DuckDB twins for every SQL-expressible query; the
                 handful of rows-only entries (CJK tokenizer automaton,
                 probabilistic signatures, LSH) are intentionally
                 omitted and covered by pytest golden/parity tests.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from spider_spark import queries as _q
from spider_spark.flagship import run_flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _, postings = run_flagship(spark, "/root/testdata/sf0.001",
                               n_rounds=3, budget=64)
    return postings


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
