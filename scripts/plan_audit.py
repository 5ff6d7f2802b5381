"""Whole-surface plan audit: sweep every driver-contract query and
grep its physical plan for scale red flags.

Red flags (fail):
  * ``BatchEvalPython``       — row-at-a-time Python UDF (the slow
    path the repo bans; Arrow/pandas variants are sanctioned).
  * ``CartesianProduct``      — an unhinted cross join that would
    explode at scale (broadcast nested-loop joins of tiny
    broadcast sides are fine and show up as
    BroadcastNestedLoopJoin instead).

Informational (printed, not failed): per-query presence of
``ArrowEvalPython`` / ``MapInPandas`` / ``FlatMapGroupsInPandas``
(the sanctioned Python paths) so a reader can see exactly which
operators leave the JVM and audit that each has a documented reason.

Usage: python scripts/plan_audit.py [sf_dir]   (default sf0.001)
Exits non-zero if any red flag appears.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RED = ("BatchEvalPython", "CartesianProduct")
PY_PATHS = ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas",
            "FlatMapCoGroupsInPandas", "AggregateInPandas", "MapInArrow")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from spider_spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    failures: list[tuple[str, str]] = []
    for name, fn in sorted(entry.queries().items()):
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            failures.append((name, f"plan build failed: {exc}"))
            continue
        flags = [r for r in RED if r in plan]
        py = [p for p in PY_PATHS if p in plan]
        status = "FAIL " + ",".join(flags) if flags else "ok"
        print(f"{name:24s} {status:28s} python-paths: {','.join(py) or '-'}")
        for r in flags:
            failures.append((name, r))
    if failures:
        print(f"\nRED FLAGS: {failures}")
        return 1
    print("\nall plans clean")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
