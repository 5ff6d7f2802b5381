"""Single-query oracle check: scripts/check_one.py <query> [<query> ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.01).  Same hash method as
scripts/check_correctness.py, restricted to the named queries."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from spider_spark.session import get_spark
from scripts.check_correctness import norm_hash, SF_DIR, TABLES


def main():
    names = sys.argv[1:]
    spark = get_spark(master="local[8]", shuffle_partitions=8,
                      app_name="check_one")
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
    for name in names:
        sdf = queries[name](spark, SF_DIR).toPandas()
        if name not in oracles:
            print(f"{name}: rows={len(sdf)} (no oracle)")
            continue
        odf = con.execute(oracles[name]).fetchdf()
        hs, ho = norm_hash(sdf), norm_hash(odf)
        ok = len(sdf) == len(odf) and hs == ho
        print(f"{name}: rows {len(sdf)}/{len(odf)} hash "
              f"{'OK' if ok else 'MISMATCH ' + hs + ' vs ' + ho}")
        if not ok:
            fails.append(name)
    print("FAILURES:", fails if fails else "none")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
