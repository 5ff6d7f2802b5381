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
