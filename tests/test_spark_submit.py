"""North-rule launch surface: `spark-submit --py-files <zip> jobs_main.py`.

The whole pipeline must run as a submitted job with the library
shipped to executors via --py-files (north_rule; the reference runs
as daemon python processes — SURVEY §3). This drives gen -> build ->
search through REAL spark-submit subprocesses: the package is only
visible through the zip, so an executor-side import that silently
depends on the repo checkout would fail here.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)


def _zip_package(tmp_path) -> str:
    zpath = str(tmp_path / "jse.zip")
    pkg = os.path.join(REPO, "job_searchengine_project_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def _submit(zpath: str, cwd: str, *args: str) -> str:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the ONLY package source
    env["PYSPARK_PYTHON"] = sys.executable
    out = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.sql.session.timeZone=UTC",
            "--py-files", zpath,
            os.path.join(REPO, "jobs_main.py"),
            *args,
        ],
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    # last stdout line is the job's JSON result (object or list)
    lines = [
        ln for ln in out.stdout.strip().splitlines() if ln.startswith(("{", "["))
    ]
    assert lines, out.stdout[-2000:]
    return lines[-1]


def test_spark_submit_gen_build_search(tmp_path):
    zpath = _zip_package(tmp_path)
    pages = str(tmp_path / "pages")
    index = str(tmp_path / "index")
    # scratch cwd: the submitted script must not need the repo checkout
    cwd = str(tmp_path)

    gen = json.loads(
        _submit(zpath, cwd, "gen", "--output", pages, "--n-docs", "500")
    )
    assert gen["generated"] == 500

    build = json.loads(
        _submit(zpath, cwd, "build", "--input", pages, "--output", index)
    )
    assert build["n_docs"] == 500

    hits = json.loads(
        _submit(
            zpath, cwd, "search", "--index", index, "--terms", "spark,개발자",
            "--k", "5",
        )
    )
    assert 0 < len(hits) <= 5
    assert all(h["url"] and h["score"] > 0 for h in hits)
    # rank order + the oracle agrees with an in-process engine
    scores = [h["score"] for h in hits]
    assert scores == sorted(scores, reverse=True)

    from job_searchengine_project_spark.search.engine import SearchEngine

    eng = SearchEngine(index)
    want = eng.search(["spark", "개발자"], k=5)
    assert [(h["url"], round(h["score"], 6)) for h in hits] == [
        (w.url, round(w.score, 6)) for w in want
    ]
