#!/usr/bin/env python
"""Per-query measurement harness for optimization work (guide §1).

``bench.py`` is frozen for driver measurement; this file exists so the
round can isolate individual queries (same `.count()` methodology as the
frozen bench), time them with the noop sink (guide §1.4), and dump
``explain("formatted")`` plans without touching the frozen harness.

Usage:
  python bench_extra.py count q1 q2 ...     # bench-identical .count() timing
  python bench_extra.py noop q1 q2 ...      # noop-sink timing (full columns)
  python bench_extra.py plan q1 q2 ...      # write plans/<q>.txt explain output
  python bench_extra.py all                 # count-time every HEADLINE query

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS,
SPIDER_PLAN_DIR (default plans/r06), SPIDER_PLAN_SUFFIX (e.g. _before).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spider_spark import queries as Q
from spider_spark.session import get_spark

from bench import HEADLINE  # frozen list of headline query names


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    names = sys.argv[2:]
    if mode == "all" or not names:
        names = [n for n in HEADLINE]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="spider_spark_bench_extra")
    spark.sparkContext.setLogLevel("ERROR")

    # same warmups as bench.py so first-query numbers are comparable
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    @pandas_udf(LongType())
    def _warm(s):
        return s

    spark.range(32).repartition(32).select(_warm("id")).collect()

    registry = Q.queries()
    times: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"{mode}:{name}")
        if mode == "plan":
            plan_dir = os.environ.get("SPIDER_PLAN_DIR", "plans/r06")
            suffix = os.environ.get("SPIDER_PLAN_SUFFIX", "")
            os.makedirs(plan_dir, exist_ok=True)
            df = registry[name](spark, sf_dir)
            with open(os.path.join(plan_dir, f"{name}{suffix}.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
            print(f"# wrote {plan_dir}/{name}{suffix}.txt", file=sys.stderr)
            continue
        t0 = time.time()
        df = registry[name](spark, sf_dir)
        if mode == "noop":
            df.write.format("noop").mode("overwrite").save()
            n = -1
        else:
            n = df.count()
        times[name] = round(time.time() - t0, 3)
        print(f"# {name}: {times[name]}s ({n} rows)", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
    if times:
        print(json.dumps({"mode": mode, "sf_dir": sf_dir, "queries": times,
                          "value": round(sum(times.values()), 3)}))


if __name__ == "__main__":
    main()
