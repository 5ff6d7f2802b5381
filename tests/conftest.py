import os
import sys

import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spider_spark.config import CrawlConfig
from spider_spark.session import get_spark
from spider_spark.sources.corpus import write_corpus


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[8]", shuffle_partitions=8, app_name="spider_spark_tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("corpus"))
    write_corpus(d, n_docs=150, seed=42)
    return d


@pytest.fixture(scope="session")
def corpus(corpus_dir):
    """Driver-side corpus views for the oracle."""
    docs = pq.read_table(corpus_dir + "/documents.parquet").to_pylist()
    seeds = [r["url"] for r in pq.read_table(corpus_dir + "/seeds.parquet").to_pylist()]
    robots = {
        r["host"]: r["disallow_prefixes"]
        for r in pq.read_table(corpus_dir + "/robots.parquet").to_pylist()
    }
    hosts = {
        r["host"]: r["max_per_round"]
        for r in pq.read_table(corpus_dir + "/hosts.parquet").to_pylist()
    }
    return {
        "documents": {r["doc_id"]: r["spans"] for r in docs},
        "seeds": seeds,
        "robots": robots,
        "hosts": hosts,
    }


@pytest.fixture(scope="session")
def crawl_config():
    return CrawlConfig(
        max_parallel_working=8,
        max_parallel_non_working=8,
        default_host_quota=3,
    )


SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
