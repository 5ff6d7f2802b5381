"""Snapshot-versioned table store with an atomic multi-table commit.

Stands in for an Iceberg catalog (the sandbox has no Iceberg runtime
jars; the commit semantics are what matter).  Parity target: Perst's
exclusive transactions + rollback (Spider.java:181,427,493-501,
org/garret/perst/Storage.java:114-139) → one atomic commit per round
covering every table the round touched; a failed round commits nothing
and is replayed, which is exactly the reference's NOT_PUSHED→QUEUED
crash-recovery rule (LibraryBuffer.java:97-102, db/Status.java:7-11).

Mechanics:
  * every table version is an immutable directory of parquet files
    (``<root>/<table>/snap-<round>-<n>/``)
  * a single JSON catalog file maps table → current version (rewrite
    tables) or → ordered list of segment dirs (append tables)
  * commit = write all new dirs, then ``os.replace`` the catalog —
    the one atomic step.  A crash before the replace leaves the old
    catalog intact; orphan dirs are ignored.
  * per-round lineage records (FIXTURES.md §6) ride inside the catalog
    and in an append-only ``lineage`` table for audit queries.

On a real cluster this maps 1:1 onto Iceberg: rewrite tables →
copy-on-write MERGE, append tables → snapshot append, the catalog swap →
Iceberg's atomic metadata pointer swap.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession

CATALOG = "_catalog.json"


class SnapshotStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- catalog -----------------------------------------------------------

    def _catalog_path(self) -> str:
        return os.path.join(self.root, CATALOG)

    def read_catalog(self) -> dict[str, Any]:
        p = self._catalog_path()
        if not os.path.exists(p):
            return {"round": 0, "tables": {}, "appends": {}, "lineage": []}
        with open(p) as f:
            return json.load(f)

    def _swap_catalog(self, cat: dict[str, Any]) -> None:
        tmp = self._catalog_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(cat, f, indent=1)
        os.replace(tmp, self._catalog_path())  # the atomic commit point

    @property
    def current_round(self) -> int:
        return self.read_catalog()["round"]

    # -- reads -------------------------------------------------------------

    def read(self, spark: SparkSession, table: str) -> DataFrame | None:
        cat = self.read_catalog()
        if table in cat["tables"]:
            return spark.read.parquet(os.path.join(self.root, cat["tables"][table]))
        segs = cat["appends"].get(table)
        if segs:
            return spark.read.parquet(*[os.path.join(self.root, s) for s in segs])
        return None

    def exists(self, table: str) -> bool:
        cat = self.read_catalog()
        return table in cat["tables"] or bool(cat["appends"].get(table))

    # -- round commit ------------------------------------------------------

    def commit_round(
        self,
        rnd: int,
        rewrites: dict[str, DataFrame],
        appends: dict[str, DataFrame],
        metrics: dict[str, Any] | None = None,
    ) -> None:
        """Write all round outputs, then swap the catalog atomically.

        ``rewrites`` replace a table's current version (frontier MERGE
        analog); ``appends`` add a segment (postings/crawl-log sink)."""
        cat = self.read_catalog()
        new_tables = dict(cat["tables"])
        new_appends = {k: list(v) for k, v in cat["appends"].items()}

        # the per-table writes are independent Spark jobs — run them
        # concurrently so their stages overlap (Spark's scheduler is
        # thread-safe; on a cluster this fills otherwise-idle executors
        # while e.g. the postings shuffle's tail finishes)
        jobs: list[tuple[str, str, DataFrame, bool]] = []
        for table, df in rewrites.items():
            jobs.append((table, f"{table}/snap-{rnd:06d}", df, True))
        for table, df in appends.items():
            if df is not None:
                jobs.append((table, f"{table}/seg-{rnd:06d}", df, False))

        def _write(job):
            _, rel, df, _ = job
            t0 = time.time()
            df.write.mode("overwrite").parquet(os.path.join(self.root, rel))
            if os.environ.get("SPIDER_TIMING", "") == "1":
                import sys
                print(f"## write {rel}: {time.time()-t0:.2f}s", file=sys.stderr)

        if len(jobs) > 1 and os.environ.get("SPIDER_SERIAL_COMMIT", "") != "1":
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(max_workers=len(jobs)) as pool:
                list(pool.map(_write, jobs))
        else:
            for job in jobs:
                _write(job)
        for table, rel, _, is_rewrite in jobs:
            if is_rewrite:
                new_tables[table] = rel
            else:
                new_appends.setdefault(table, []).append(rel)

        lineage = list(cat.get("lineage", []))
        lineage.append({
            "round": rnd,
            "tables": sorted(list(rewrites) + list(appends)),
            "metrics": metrics or {},
            "committed_at": time.time(),  # informational only, not semantic
        })
        self._swap_catalog({
            "round": rnd,
            "tables": new_tables,
            "appends": new_appends,
            "lineage": lineage,
        })

    # -- maintenance -------------------------------------------------------

    def gc_orphans(self) -> list[str]:
        """Remove snapshot dirs not referenced by the catalog (post-crash
        cleanup; safe because the catalog swap is the commit point)."""
        cat = self.read_catalog()
        live = set(cat["tables"].values())
        for segs in cat["appends"].values():
            live.update(segs)
        removed = []
        for table in os.listdir(self.root):
            tdir = os.path.join(self.root, table)
            if not os.path.isdir(tdir):
                continue
            for snap in os.listdir(tdir):
                rel = f"{table}/{snap}"
                if rel not in live:
                    shutil.rmtree(os.path.join(tdir, rel.split("/", 1)[1]))
                    removed.append(rel)
        return removed
