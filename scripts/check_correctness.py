"""Mimic the driver's correctness gate locally: run every queries()
entry on Spark AND its oracle_sql() twin on DuckDB over the same
parquet tables at sf0.01, compare row counts + sorted value hashes
(columns aligned by name, like the driver).  Prints one line per query
and a final summary."""

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from spider_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm_hash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    rows = sorted(df.astype(str).values.tolist())
    return hashlib.sha256(json.dumps(rows).encode()).hexdigest()[:16]


def main():
    spark = get_spark(master="local[8]", shuffle_partitions=8,
                      app_name="correctness_check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    fails = []
    for name, fn in queries.items():
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: SPARK ERROR {e}")
            fails.append(name)
            continue
        if name not in oracles:
            print(f"{name}: rows={len(sdf)} (no oracle)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ORACLE ERROR {e}")
            fails.append(name)
            continue
        ok_rows = len(sdf) == len(odf)
        ok_cols = sorted(sdf.columns) == sorted(odf.columns)
        ok_hash = ok_rows and ok_cols and norm_hash(sdf) == norm_hash(odf)
        status = "OK" if ok_hash else "MISMATCH"
        print(f"{name}: {status} rows={len(sdf)}/{len(odf)} cols_match={ok_cols}")
        if not ok_hash:
            fails.append(name)
    print("FAILURES:", fails if fails else "none")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
