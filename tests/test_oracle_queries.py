"""Local mirror of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() twin in DuckDB over the same
parquet, then compare row-count + column names + order-insensitive
values (columns aligned by sorted name, floats to 6 decimals)."""

import math
import os

import duckdb
import pytest

from spider_spark import queries as Q

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _canon(val):
    if val is None:
        return None
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        return round(val, 6)
    return val


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(Q.oracle_sql().keys()))
def test_query_matches_oracle(spark, sf_dir, name):
    qfn = Q.queries()[name]
    sdf = qfn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = _duck(sf_dir)
    cur = con.execute(Q.oracle_sql()[name])
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    con.close()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    assert _rowset(scols, srows) == _rowset(dcols, drows), f"{name}: values differ"


@pytest.mark.parametrize("name", sorted(set(Q.queries()) - set(Q.oracle_sql())))
def test_rows_only_queries_run(spark, sf_dir, name):
    df = Q.queries()[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_recrawl_schedule_plan(spark, sf_dir):
    """100-TB plan pins for recrawl_schedule: the 1-row max aggregate
    joins in as a broadcast (no shuffle of the frontier side) and the
    global top-50 is TakeOrderedAndProject, not a full sort."""
    plan = Q.queries()["recrawl_schedule"](spark, sf_dir) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "Python" not in plan


def test_filter_funnel_monotone(spark, sf_dir):
    """Funnel invariants: stage 0 counts every document, survivor
    counts never increase along the chain, and the final stage agrees
    with AND-ing the standalone gates."""
    rows = {r["stage"]: r["survivors"]
            for r in Q.queries()["filter_funnel"](spark, sf_dir).collect()}
    assert sorted(rows) == list(range(7))
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert rows[0] == n_docs
    assert all(rows[k] <= rows[k - 1] for k in range(1, 7))
    assert rows[6] > 0


def test_simhash_bands_recombine(spark, sf_dir):
    """The four 8-bit bands are a partition of the 32-bit signature."""
    df = Q.queries()["simhash_portable"](spark, sf_dir)
    bad = df.filter(
        "simhash32 != band0 + band1 * 256 + band2 * 65536 "
        "+ band3 * 16777216").count()
    assert bad == 0
    rng = df.filter("simhash32 < 0 OR simhash32 > 4294967295").count()
    assert rng == 0


def test_varint_postings_bounds(spark, sf_dir):
    """Byte-model sanity: each term's encoded size is at least one
    byte per posting plus one doc-gap+count byte pair per doc, and at
    most 5 bytes per (posting + 2·doc) — the vByte extremes."""
    rows = Q.queries()["varint_postings"](spark, sf_dir).collect()
    assert rows, "top-30 frame came back empty"
    for r in rows:
        lo = r["n_postings"] + 2 * r["df"]
        hi = 5 * (r["n_postings"] + 2 * r["df"])
        assert lo <= r["list_bytes"] <= hi, r
        assert r["df"] <= r["n_postings"]
