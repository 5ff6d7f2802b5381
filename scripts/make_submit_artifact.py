"""Build the spark-submit --py-files artifact for the engine.

Produces `dist/spider_spark.zip`: the `spider_spark` package, zipped
deterministically (sorted member order, zeroed timestamps) so the
artifact hash is stable across builds of the same tree — a cluster
deploy can diff artifact digests to know whether executors must be
restarted.

Usage:
    python scripts/make_submit_artifact.py [out_dir]
    spark-submit --master <cluster> --py-files dist/spider_spark.zip \
        scripts/submit_crawl.py --documents ... --store ... --seeds ...
"""

from __future__ import annotations

import hashlib
import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "spider_spark"
# fixed DOS timestamp (1980-01-01) => byte-identical zip for identical trees
_EPOCH = (1980, 1, 1, 0, 0, 0)


def build(out_dir: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"{PKG}.zip")
    members = []
    pkg_root = os.path.join(REPO, PKG)
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                members.append((os.path.relpath(full, REPO), full))
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for arcname, full in members:
            with open(full, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(arcname, date_time=_EPOCH)
            info.external_attr = 0o644 << 16
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, data)
    return out


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist")
    out = build(out_dir)
    with open(out, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()
    n = len(zipfile.ZipFile(out).namelist())
    print(f"{out}  ({n} modules, sha256 {digest[:16]}…)")


if __name__ == "__main__":
    main()
