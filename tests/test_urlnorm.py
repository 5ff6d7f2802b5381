"""URL canonicalizer spec tests (graft of Spider.java:170-179 USK rules)."""

import pandas as pd
import pytest

from spider_spark.functions.urlnorm import (
    canonicalize,
    canonicalize_parts,
    canonicalize_parts_frame,
    extract_edition,
    extract_host,
    extract_path,
)


def test_case_and_ports():
    assert canonicalize("HTTP://Example.COM/Path") == "http://example.com/Path"
    assert canonicalize("http://example.com:80/a") == "http://example.com/a"
    assert canonicalize("https://example.com:443/a") == "https://example.com/a"
    assert canonicalize("http://example.com:8080/a") == "http://example.com:8080/a"


def test_fragment_and_path():
    assert canonicalize("http://h.org/a/b#frag") == "http://h.org/a/b"
    assert canonicalize("http://h.org//a///b") == "http://h.org/a/b"
    assert canonicalize("http://h.org/a/./b/../c") == "http://h.org/a/c"
    assert canonicalize("http://h.org") == "http://h.org/"
    assert canonicalize("http://h.org/../..") == "http://h.org/"


def test_edition_usk_rule():
    # negative suggested edition → absolute value (Spider.java:171-173)
    assert canonicalize("http://h.org/site?edition=-5") == "http://h.org/site?edition=5"
    assert canonicalize("http://h.org/site?edition=7") == "http://h.org/site?edition=7"
    assert canonicalize("http://h.org/site?x=1&edition=-2") == \
        "http://h.org/site?edition=2&x=1"
    assert extract_edition("http://h.org/site?edition=-5") == 5
    assert extract_edition("http://h.org/site") is None


def test_malformed():
    assert canonicalize("not a url") is None
    assert canonicalize("ftp://h.org/x") is None
    assert canonicalize("http:///nopath") is None
    assert canonicalize("") is None
    assert canonicalize(None) is None


def test_idempotent():
    urls = [
        "HTTP://A.com:80//x/./y/../z?edition=-3#f",
        "https://b.org/q",
        "http://c.net:9999/a//b",
    ]
    for u in urls:
        c = canonicalize(u)
        assert canonicalize(c) == c


def test_host_path():
    assert extract_host("http://a.com:8080/x") == "a.com:8080"
    assert extract_host("http://A.com/x") == "a.com"
    assert extract_path("http://a.com/x/y?q=1") == "/x/y"


def test_extract_urls_col_matches_python(spark):
    """The JVM regexp twin of extract_urls (the engine's outlink scan,
    round 4: last non-tokenizer Python hop removed) is bit-identical
    to the Python kernel the oracle uses — including the Unicode-vs-
    ASCII \\s divergence (NBSP etc. must TERMINATE a URL in both) and
    trailing-punctuation stripping."""
    from pyspark.sql import functions as F

    from spider_spark.functions.links import extract_urls, extract_urls_col

    texts = [
        "see http://a.com/x and https://B.org/y?q=1.",
        "wrapped (http://c.net/z), trailing http://d.io/w!?;:",
        "nbsp http://e.com/a\xa0tail and linesep http://f.com/b x",
        "infosep http://g.com/c\x1c\x1dmore",
        "bare http:// and xhttp://h.com/k glued",
        "HTTP://UPPER.example/PATH'",
        "no urls here at all",
        "",
        None,
        "multi http://m.com/1 http://m.com/2 http://m.com/3",
        "tab\thttp://t.com/q\tend newline http://n.com/r\nnext",
        "cjk 天地http://cjk.example/字 mixed",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r["u"] for r in df.select(
        extract_urls_col(F.col("text")).alias("u")).collect()]
    want = [extract_urls(t) if t else [] for t in texts]
    assert got == want
    # pure codegen: no Python stage in the plan
    plan = df.select(extract_urls_col(F.col("text")).alias("u")) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan, plan


_PARITY_URLS = [
    "HTTP://Example.COM/Path",
    "http://example.com:80/a",
    "https://example.com:443/a",
    "http://example.com:8080/a",
    "http://h.org/a/b#frag",
    "http://h.org//a///b",
    "http://h.org/a/./b/../c",
    "http://h.org",
    "http://h.org/../..",
    "http://h.org/site?edition=-5",
    "http://h.org/site?edition=7",
    "http://h.org/site?x=1&edition=-2",
    "HTTP://A.com:80//x/./y/../z?edition=-3#f",
    "https://b.org/q",
    "http://c.net:9999/a//b",
    "not a url",
    "ftp://h.org/x",
    "http:///nopath",
    "",
    None,
]


@pytest.mark.parametrize("u", _PARITY_URLS, ids=repr)
def test_fused_parts_match_standalone_extractors(u):
    # the fused hot path must agree field-for-field with canonicalize +
    # extract_host/extract_edition applied to the canonical URL
    url, host, edition = canonicalize_parts(u)
    assert url == canonicalize(u)
    if url is None:
        assert host is None and edition is None
    else:
        assert host == extract_host(url)
        assert edition == extract_edition(url)


def test_fused_parts_malformed_port_is_none_not_exception():
    # parts.port raises lazily; the fused path must classify these as
    # malformed instead of blowing up the admission task
    for u in ("http://example.com:99999/x", "http://example.com:8o8o/"):
        assert canonicalize_parts(u) == (None, None, None)
        assert canonicalize(u) is None


def test_parts_frame_shapes_and_nulls():
    s = pd.Series(["http://a.com:8080/x?edition=-2", "junk", None])
    out = canonicalize_parts_frame(s)
    assert list(out.columns) == ["url", "host", "edition"]
    assert out.loc[0, "url"] == "http://a.com:8080/x?edition=2"
    assert out.loc[0, "host"] == "a.com:8080"
    assert out.loc[0, "edition"] == 2
    assert out.loc[1, "url"] is None and out.loc[2, "url"] is None
