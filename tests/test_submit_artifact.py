"""spark-submit packaging (north rule: --py-files on a multi-executor
cluster).

Pins that the zip artifact is complete (every package module), stable
(byte-identical rebuild), and actually importable the way executors
import it — via zipimport off sys.path with the source tree absent,
which is exactly what --py-files does on a worker.
"""

import hashlib
import importlib
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from make_submit_artifact import build  # noqa: E402


def _sha(p):
    with open(p, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def test_zip_complete_and_deterministic(tmp_path):
    out1 = build(str(tmp_path / "a"))
    out2 = build(str(tmp_path / "b"))
    assert _sha(out1) == _sha(out2), "artifact must be byte-stable"
    import zipfile
    members = set(zipfile.ZipFile(out1).namelist())
    for dirpath, dirnames, filenames in os.walk(os.path.join(REPO, "spider_spark")):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        for fn in filenames:
            if fn.endswith(".py"):
                rel = os.path.relpath(os.path.join(dirpath, fn), REPO)
                assert rel in members, f"missing from artifact: {rel}"


def test_zipimport_like_executor(tmp_path):
    """Import spider_spark from the zip in a subprocess whose cwd and
    sys.path exclude the repo — the executor-side situation."""
    out = build(str(tmp_path))
    code = (
        "import sys; sys.path.insert(0, %r); "
        "import spider_spark.engine, spider_spark.config, "
        "spider_spark.operators.admission, spider_spark.functions.urlnorm; "
        "assert spider_spark.engine.__file__.startswith(%r); "
        "print('ok')" % (out, out)
    )
    r = subprocess.run([sys.executable, "-c", code], cwd=str(tmp_path),
                       capture_output=True, text=True,
                       env={**os.environ, "PYTHONPATH": ""})
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip() == "ok"


def test_submit_entrypoint_parses():
    importlib.import_module("submit_crawl")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "submit_crawl.py"),
         "--help"], capture_output=True, text=True)
    assert r.returncode == 0
    assert "--py-files" in open(
        os.path.join(REPO, "scripts", "submit_crawl.py")).read()
